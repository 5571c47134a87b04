"""Lane-parallel Pallas kernel for the sequential Fiat-Shamir absorb chain.

The batch-last chain kernel (poseidon_pallas.absorb_chain) runs C=4
independent t=17 sponge chains as [t, 16, C] tensors: every state-wide
op pays t leading-dim tiles and the 128-wide lane dimension is ~97%
idle.  This kernel puts the LIMBS in sublanes (where rolls are cheap)
and the (chain, state-element) pairs in lanes:

    state X [16, 128]     sublane l = limb l
                          lane c*32 + i = state element i of chain c
                          (i < t; lanes i in t..31 stay zero)

so one elementwise op covers every state element of every chain in 2
VPU tiles (vs 34), an accumulator frame [34, 128] costs 5 tiles (vs 85
in batch-last for state-wide REDCs), and all limb-offset placement uses
sublane rolls.  Cross-element operations use lane rolls only in
log-depth group reductions/broadcasts and the per-rotation selects of
the dense rounds; the 32-lane group stride keeps chains from
contaminating each other (a 31-step doubling broadcast never reaches
the next group head).

A layout note on the earlier merged-lane experiment ((limb, chain) in
lanes, t in sublanes): it was 3x SLOWER than batch-last because every
limb-offset placement became a multi-lane-tile lane roll and every
m/p-row product needed a 16-way lane tiling - lane rolls and lane
tiling are expensive on the VPU, sublane rolls are not.

Bit-exact against spec.poseidon.permute; t <= 31, C*32 <= 128.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import fr
from .fr import BITS, MASK, N, U32

G = 128         # lane count
STRIDE = 32     # lanes per chain group
NFRAME = fr.NRED_MAT + N + 1   # 34 sublane positions in an accumulator


# ---------------------------------------------------------------------------
# Host-side constant builders.
# ---------------------------------------------------------------------------

def _limbs16(x: int):
    return [(x >> (BITS * k)) & MASK for k in range(N)]


def _lane_elems(fn, t: int, C: int) -> np.ndarray:
    """[16, 128] constant: lanes c*32+i (i<t) hold limbs of fn(i);
    spare lanes zero."""
    out = np.zeros((N, G), np.uint32)
    for c in range(C):
        for i in range(t):
            ls = _limbs16(fn(i))
            for l in range(N):
                out[l, c * STRIDE + i] = ls[l]
    return out


class ChainConsts:
    __slots__ = ("rc_full", "rc_part", "qrow", "qcol", "dplane",
                 "fplane", "prow", "rotmask", "headmask", "lane0mask",
                 "t", "C", "rf", "rp")

    def __init__(self, dp, C: int):
        from ..spec.field import P as _P
        from ..spec.poseidon_opt import partial_round_factorization

        params = dp.spec_params
        t, rf, rp = params.t, params.rf, params.rp
        assert t < STRIDE and C * STRIDE <= G
        fac = partial_round_factorization(params)
        self.t, self.C, self.rf, self.rp = t, C, rf, rp
        R = (1 << 256) % _P

        def sc(v):
            return v * fr.MAT_SCALE % _P

        self.rc_full = np.stack([
            _lane_elems(lambda i: row[i] * R % _P, t, C)
            for row in params.rc_full])                      # [rf, 16, G]
        self.rc_part = np.stack([
            _lane_elems(lambda i: c * R % _P if i == 0 else 0, t, C)
            for c in params.rc_partial])                     # [rp, 16, G]
        self.qrow = np.stack([
            _lane_elems(lambda i, r=r: sc(fac.q_rows[r][i]), t, C)
            for r in range(rp - 1)])                         # [rp-1, 16, G]
        self.qcol = np.stack([
            _lane_elems(lambda i, r=r: 0 if i == 0 else sc(fac.q_cols[r][i - 1]),
                        t, C)
            for r in range(rp - 1)])                         # [rp-1, 16, G]

        # dense rotation planes: [t(d), 16(l'), G]; lane (c,i) holds
        # limb l' of M[i, (i+d) mod t] * 2^272
        def planes(M):
            arr = np.zeros((t, N, G), np.uint32)
            for d in range(t):
                arr[d] = _lane_elems(lambda i: sc(M[i][(i + d) % t]), t, C)
            return arr

        self.dplane = planes(params.mds)
        self.fplane = planes(fac.m_final)
        self.prow = np.tile(np.asarray(fr.P_LIMBS_PY, np.uint32)[:, None],
                            (1, G))                          # [16, G]
        # rotmask[d, :, lane(c,i)] = 1 if i < t - d else 0 (select source)
        rm = np.zeros((t, N, G), np.uint32)
        for d in range(t):
            for c in range(C):
                for i in range(t):
                    if i < t - d:
                        rm[d, :, c * STRIDE + i] = 1
        self.rotmask = rm
        hm = np.zeros((1, G), np.uint32)
        for c in range(C):
            hm[0, c * STRIDE] = 1
        self.headmask = hm                                   # lane i == 0
        lm = np.zeros((N, G), np.uint32)
        for c in range(C):
            lm[:, c * STRIDE] = 1
        self.lane0mask = lm                                  # [16, G]


_cc_cache: dict = {}


def chain_consts(dp, C: int) -> ChainConsts:
    key = (id(dp), C)
    if key not in _cc_cache:
        _cc_cache[key] = ChainConsts(dp, C)
    return _cc_cache[key]


# ---------------------------------------------------------------------------
# In-kernel helpers.  Values [16, G]; frames [NFRAME, G] (sublane = limb).
# ---------------------------------------------------------------------------

_SCOPE = None  # dict of loaded constant values


class _scope:
    def __init__(self, vals):
        self.vals = vals

    def __enter__(self):
        global _SCOPE
        self._saved = _SCOPE
        _SCOPE = self.vals
        return self

    def __exit__(self, *exc):
        global _SCOPE
        _SCOPE = self._saved
        return False


def _sub_roll(x, rows: int, shift: int):
    """Place x's sublane rows at offset shift in a rows-row frame."""
    pad = jnp.zeros((rows - x.shape[0], x.shape[1]), dtype=x.dtype)
    framed = jnp.concatenate([x, pad], axis=0)
    if shift == 0:
        return framed
    return pltpu.roll(framed, shift, axis=0)


def _redc_f(T, nred: int):
    """Extended REDC on frame T [nT, G] (relaxed rows); canonical
    [16, G] out.

    Steps run PAIRED: two limbs share one frame update (the cross
    contributions lo0[1] + hi0[0] feeding step i+1 are added as [1, G]
    scalars before the frame write), so the expensive [nT, G] rolls/adds
    happen nred/2 times instead of nred.  Bit-exact with the sequential
    per-limb recurrence."""
    prow = _SCOPE["prow"]
    nT = T.shape[0]
    carry = jnp.zeros_like(T[0:1])
    i = 0
    while i < nred:
        vi0 = T[i:i + 1] + carry
        ti0 = vi0 & MASK
        m0 = (ti0 * jnp.uint32(fr.N0INV)) & MASK     # [1, G]
        prod0 = m0 * prow                            # bcast sublanes
        lo0 = prod0 & MASK
        hi0 = prod0 >> BITS
        carry = (vi0 >> BITS) + ((ti0 + lo0[0:1]) >> BITS)
        if i + 1 < nred:
            # step i's frame contribution at row i+1 is lo0[1] + hi0[0]
            vi1 = T[i + 1:i + 2] + lo0[1:2] + hi0[0:1] + carry
            ti1 = vi1 & MASK
            m1 = (ti1 * jnp.uint32(fr.N0INV)) & MASK
            prod1 = m1 * prow
            lo1 = prod1 & MASK
            hi1 = prod1 >> BITS
            carry = (vi1 >> BITS) + ((ti1 + lo1[0:1]) >> BITS)
            C = (_sub_roll(lo0, N + 2, 0) + _sub_roll(hi0 + lo1, N + 2, 1)
                 + _sub_roll(hi1, N + 2, 2))
            T = T + _sub_roll(C, nT, i)
            i += 2
        else:
            T = T + _sub_roll(lo0, nT, i) + _sub_roll(hi0, nT, i + 1)
            i += 1
    cols = [T[nred + k:nred + k + 1] for k in range(N + 1)]
    cols[0] = cols[0] + carry
    out, _ = fr._norm(cols)
    return jnp.concatenate(fr._cond_sub_p_cols(out[:N]), axis=0)


def _add_f(a, b):
    ac = [a[k:k + 1] for k in range(N)]
    bc = [b[k:k + 1] for k in range(N)]
    return jnp.concatenate(fr._add_cols(ac, bc), axis=0)


def _mul_f(a, b):
    """Montgomery product on [16, G] (Montgomery in/out).

    Both the product accumulation and the REDC run limb-PAIRED: each
    iteration combines two limbs' lo/hi rows in a small [18, G] block
    (cheap 1/2-row rolls) and pays the big [33, G] roll+add once — the
    frame traffic that dominates this kernel halves.  Bit-exact with the
    per-limb form."""
    prow = _SCOPE["prow"]
    nT = 2 * N + 1
    T = None
    for i in range(0, N, 2):
        prod0 = a[i:i + 1] * b                       # sublane bcast
        prod1 = a[i + 1:i + 2] * b
        lo0 = prod0 & MASK
        hi0 = prod0 >> BITS
        lo1 = prod1 & MASK
        hi1 = prod1 >> BITS
        C = (_sub_roll(lo0, N + 2, 0) + _sub_roll(hi0 + lo1, N + 2, 1)
             + _sub_roll(hi1, N + 2, 2))
        upd = _sub_roll(C, nT, i)
        T = upd if T is None else T + upd
    carry = jnp.zeros_like(T[0:1])
    for i in range(0, N, 2):
        vi0 = T[i:i + 1] + carry
        ti0 = vi0 & MASK
        m0 = (ti0 * jnp.uint32(fr.N0INV)) & MASK
        prod0 = m0 * prow
        lo0 = prod0 & MASK
        hi0 = prod0 >> BITS
        carry = (vi0 >> BITS) + ((ti0 + lo0[0:1]) >> BITS)
        vi1 = T[i + 1:i + 2] + lo0[1:2] + hi0[0:1] + carry
        ti1 = vi1 & MASK
        m1 = (ti1 * jnp.uint32(fr.N0INV)) & MASK
        prod1 = m1 * prow
        lo1 = prod1 & MASK
        hi1 = prod1 >> BITS
        carry = (vi1 >> BITS) + ((ti1 + lo1[0:1]) >> BITS)
        C = (_sub_roll(lo0, N + 2, 0) + _sub_roll(hi0 + lo1, N + 2, 1)
             + _sub_roll(hi1, N + 2, 2))
        T = T + _sub_roll(C, nT, i)
    cols = [T[N + k:N + k + 1] for k in range(N + 1)]
    cols[0] = cols[0] + carry
    out, _ = fr._norm(cols)
    return jnp.concatenate(fr._cond_sub_p_cols(out[:N]), axis=0)


def _pow5_f(x):
    x2 = _mul_f(x, x)
    x4 = _mul_f(x2, x2)
    return _mul_f(x4, x)


def _accum_pairs(terms):
    """Frame of sum_j cplane_j (*) s_j with limb-offset placement:
    terms = [(cplane [16, G] 2^272-scaled const limbs, s [16, G])]
    -> [NFRAME, G].

    Limbs run PAIRED and the cross-term sum over j is hoisted INSIDE the
    pair: all j contributions for limbs (lp, lp+1) combine in one small
    [18, G] frame (3 VPU tiles) and the expensive [NFRAME, G] roll+add
    (5 tiles) lands once per pair per frame — vs once per (j, limb) in
    the naive form.  Row magnitudes stay < len(terms) * 2^17 * 2, well
    inside u32 for the relaxed-REDC carry chain.  Bit-exact: the total
    frame is the same sum, just re-associated."""
    T = None
    for lp in range(0, N, 2):
        csum = None
        for cplane, s in terms:
            prod0 = cplane[lp:lp + 1] * s            # [16, G]
            prod1 = cplane[lp + 1:lp + 2] * s
            lo0 = prod0 & MASK
            hi0 = prod0 >> BITS
            lo1 = prod1 & MASK
            hi1 = prod1 >> BITS
            c = (_sub_roll(lo0, N + 2, 0) + _sub_roll(hi0 + lo1, N + 2, 1)
                 + _sub_roll(hi1, N + 2, 2))
            csum = c if csum is None else csum + c
        upd = _sub_roll(csum, NFRAME, lp)
        T = upd if T is None else T + upd
    return T


def _accum_const(cplane, s):
    return _accum_pairs([(cplane, s)])


def _group_reduce_heads(T, t: int):
    """Sum each 32-lane group's lanes 0..t-1 into its head lane.

    Uses log-doubling negative lane rolls; only head lanes are read
    afterwards.  Requires t <= 31 and zero spare lanes NOT required
    (over-group reads land on the next group's lanes, but those
    contributions only pollute non-head lanes of the result)."""
    s = T + pltpu.roll(T, G - 16, axis=1)
    s = s + pltpu.roll(s, G - 8, axis=1)
    s = s + pltpu.roll(s, G - 4, axis=1)
    s = s + pltpu.roll(s, G - 2, axis=1)
    s = s + pltpu.roll(s, G - 1, axis=1)
    # head lane now holds sum of lanes head..head+31 of T; T's lanes
    # t..31 must be zero for this to equal the group sum.
    return s


def _head_broadcast(x, headmask):
    """Zero all but head lanes, then copy each head to its whole group
    (doubling rolls; 31-lane reach never crosses the 32-lane stride)."""
    b = x * headmask
    b = b + pltpu.roll(b, 1, axis=1)
    b = b + pltpu.roll(b, 2, axis=1)
    b = b + pltpu.roll(b, 4, axis=1)
    b = b + pltpu.roll(b, 8, axis=1)
    b = b + pltpu.roll(b, 16, axis=1)
    return b


def _rotate_groups(x, d: int, t: int, rotmask):
    """Group-local rotation: out lane (c, i) = x lane (c, (i+d) mod t)."""
    if d == 0:
        return x
    a = pltpu.roll(x, G - d, axis=1)             # from lane +d
    b = pltpu.roll(x, t - d, axis=1)             # from lane +d-t
    return jnp.where(rotmask != 0, a, b)


def _permute_f(s, rf: int, rp: int, t: int):
    """Full permutation on lane-parallel state s [16, G]."""
    sc = _SCOPE
    half = rf // 2

    def dense_apply(planes, rotm, x):
        terms = [(planes[d], _rotate_groups(x, d, t, rotm[d]))
                 for d in range(t)]
        return _redc_f(_accum_pairs(terms), fr.NRED_MAT)

    def full_round(r, s):
        rc = sc["rcf"][pl.ds(r, 1)][0]               # [16, G]
        x = _pow5_f(_add_f(s, rc))
        return dense_apply(sc["dplane"], sc["rotmask"], x)

    def partial_round(r, s):
        rc = sc["rcp"][pl.ds(r, 1)][0]
        x5 = _pow5_f(_add_f(s, rc))                  # sbox everywhere...
        x = jnp.where(sc["lane0mask"] != 0, x5, s)   # ...keep lane i==0
        qr = sc["qrow"][pl.ds(r, 1)][0]
        qc = sc["qcol"][pl.ds(r, 1)][0]
        # row dot: group-reduce the lazy frame (heads valid)
        Tr = _group_reduce_heads(_accum_const(qr, x), t)
        # column update: s_i + qcol_i * x0 (x0 broadcast from heads).
        # The identity term x * 2^272 is ONE sublane roll to offset
        # NRED_MAT (2^(16*17) placed exactly; REDC reduces mod P), not
        # a 16-limb constant-plane accumulation.
        x0b = _head_broadcast(x, sc["headmask"])
        Tc = _accum_const(qc, x0b) + _sub_roll(x, NFRAME, fr.NRED_MAT)
        # frames are lane-disjoint (Tr head lanes, Tc the rest) and REDC
        # is lane-wise: select once, pay ONE REDC instead of two
        Tm = jnp.where(sc["headmask"][0:1] != 0, Tr, Tc)
        return _redc_f(Tm, fr.NRED_MAT)

    s = jax.lax.fori_loop(0, half, full_round, s)
    s = jax.lax.fori_loop(0, rp - 1, partial_round, s)
    rc = sc["rcp"][pl.ds(rp - 1, 1)][0]
    x5 = _pow5_f(_add_f(s, rc))
    s = jnp.where(sc["lane0mask"] != 0, x5, s)
    s = dense_apply(sc["fplane"], sc["rotmask"], s)
    s = jax.lax.fori_loop(half, rf, full_round, s)
    return s


# ---------------------------------------------------------------------------
# The chain kernel.
# ---------------------------------------------------------------------------

def _chain_kernel(rf, rp, t, rate, rcf_ref, rcp_ref, qrow_ref, qcol_ref,
                  dpl_ref, fpl_ref, prow_ref, rotm_ref, hm_ref,
                  l0_ref, init_ref, blocks_ref, state_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        state_ref[:] = init_ref[:]

    vals = dict(rcf=rcf_ref, rcp=rcp_ref, qrow=qrow_ref, qcol=qcol_ref,
                dplane=dpl_ref[:], fplane=fpl_ref[:],
                prow=prow_ref[:], rotmask=rotm_ref[:],
                headmask=hm_ref[:], lane0mask=l0_ref[:])
    with _scope(vals):
        s = state_ref[:]                  # [16, G]
        blk = blocks_ref[0]               # [16, G] (block already laid out)
        s = _add_f(s, blk)
        state_ref[:] = _permute_f(s, rf, rp, t)


@partial(jax.jit, static_argnums=(2, 3))
def absorb_chain_lanes(init_state, blocks, dp, interpret: bool = False):
    """init_state [16, G]; blocks [nb, 16, G] (Montgomery, lane-parallel
    layout; each block holds the rate-lane values to ADD -- capacity
    lanes must be zero).  Returns the state after nb sequential
    absorb+permute steps."""
    nb = blocks.shape[0]
    rf, rp, t = dp.rf, dp.rp, dp.t
    C = G // STRIDE
    cc = chain_consts(dp, C)
    spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_chain_kernel, rf, rp, t, dp.rate),
        grid=(nb,),
        in_specs=[
            spec(cc.rc_full.shape), spec(cc.rc_part.shape),
            spec(cc.qrow.shape), spec(cc.qcol.shape),
            spec(cc.dplane.shape), spec(cc.fplane.shape),
            spec(cc.prow.shape), spec(cc.rotmask.shape),
            spec(cc.headmask.shape), spec(cc.lane0mask.shape),
            spec((N, G)),
            pl.BlockSpec((1, N, G), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=spec((N, G)),
        out_shape=jax.ShapeDtypeStruct((N, G), U32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(cc.rc_full), jnp.asarray(cc.rc_part),
      jnp.asarray(cc.qrow), jnp.asarray(cc.qcol),
      jnp.asarray(cc.dplane), jnp.asarray(cc.fplane),
      jnp.asarray(cc.prow), jnp.asarray(cc.rotmask),
      jnp.asarray(cc.headmask), jnp.asarray(cc.lane0mask),
      init_state, blocks)
    return out


# ---------------------------------------------------------------------------
# Host packing helpers (lane c*32+i layout).
# ---------------------------------------------------------------------------

def pack_lanes(states_cols) -> np.ndarray:
    """[C][t] canonical ints -> [16, G] uint32 Montgomery lanes."""
    out = np.zeros((N, G), np.uint32)
    for c, col in enumerate(states_cols):
        limbs = fr.pack_ints(list(col), mont=True)     # [t, 16]
        for i in range(len(col)):
            out[:, c * STRIDE + i] = limbs[i]
    return out


def unpack_lanes(arr, t: int, C: int) -> list:
    a = np.asarray(arr)
    outs = []
    for c in range(C):
        limbs = np.stack([a[:, c * STRIDE + i] for i in range(t)])
        outs.append(fr.unpack_ints(limbs, mont=True))
    return outs

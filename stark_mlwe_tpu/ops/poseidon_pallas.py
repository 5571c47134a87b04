"""Fused Pallas TPU kernels for the Poseidon permutation.

The XLA-op formulation of the permutation issues a few thousand small
elementwise kernels per round (limb arithmetic); at 72 rounds that is
~0.1-1 ms of pure launch overhead per permutation regardless of batch.
These kernels fuse the WHOLE permutation (ARK -> S-box -> MDS x 72
rounds) into a single Mosaic program:

  - layout is batch-last: state tiles [t, 16, TB] keep the batch in the
    128-wide lane dimension and the 16 radix-2^16 limbs on sublanes,
  - the MDS row sums are accumulated unreduced (coefficients < 2^26) and
    Montgomery-reduced once per output element (same extended-REDC trick
    as fr.mat_apply; constants pre-scaled by 2^272),
  - rounds run under in-kernel fori_loops with round constants dynamically
    indexed from VMEM,
  - `absorb_chain` runs an entire sequential sponge chain (one rate-block
    absorb + permutation per grid step) with the state carried in VMEM
    across sequential grid iterations - the Fiat-Shamir witness-column
    hashes (fri.rs:28-35) cost one kernel launch total.

Mosaic layout rules shape the code: unit axes are never inserted next to
the tiled (last two) dimensions - limb columns are kept as keepdims
slices [..., 1, TB] and constants ship pre-expanded from the host.

Bit-exact against spec.poseidon.permute.
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

TB = 128  # lane-dim batch tile


def pallas_supported(t: int) -> bool:
    """t=129 is routed to the lane-major kernel in `poseidon_wide`: this
    module's banded MXU planes grow as 2048*t^2 bytes (68 MB at t=129)
    and its dense body register-spills ~78 MB on top (spills are
    lane-padded, so a narrower tile does not help).  t=65 stays here:
    the banded path measures ~38 us/perm vs the wide kernel's ~150."""
    return t < 129


# ---------------------------------------------------------------------------
# In-kernel field helpers, batch-last layout [..., 16, TB].
# Limb "columns" are keepdims slices [..., 1, TB]; the shape-agnostic
# column passes (_norm, _cond_sub_p_cols, _redc_cols) from fr are reused.
# ---------------------------------------------------------------------------

def _cols_bl(x):
    return [x[..., k:k + 1, :] for k in range(N)]


def _cat_bl(cols):
    return jnp.concatenate(cols, axis=-2)


def _add_bl(a, b):
    """a [..., 16, TB] + b (broadcastable) mod P."""
    a, b = jnp.broadcast_arrays(a, b)
    return _cat_bl(fr._add_cols(_cols_bl(a), _cols_bl(b)))


# [1, 16, 1] modulus limb row: passed into kernels as an input (Pallas
# kernels may not capture array constants).
P_ROW_NP = np.asarray(fr.P_LIMBS_PY, np.uint32)[None, :, None]
_PROW_REF = None  # set per kernel invocation via _set_prow


def _p_row():
    assert _PROW_REF is not None
    return _PROW_REF


def _shift_rows(x, rows: int, shift: int):
    """Place x's limb rows at offset `shift` inside a `rows`-row frame:
    zero-pad on the limb axis then (non-wrapping) circular roll."""
    lead = x.shape[:-2]
    pad = jnp.zeros(lead + (rows - x.shape[-2], x.shape[-1]), dtype=x.dtype)
    framed = jnp.concatenate([x, pad], axis=-2)
    if shift == 0:
        return framed
    return pltpu.roll(framed, shift, axis=framed.ndim - 2)


class _prow_scope:
    def __init__(self, prow_ref):
        self.prow_ref = prow_ref

    def __enter__(self):
        global _PROW_REF
        self._saved = _PROW_REF
        _PROW_REF = self.prow_ref[:]
        return self

    def __exit__(self, *exc):
        global _PROW_REF
        _PROW_REF = self._saved
        return False


def _mul_bl(a, b):
    """Montgomery product, batch-last, with roll-based accumulation.

    Limb steps run PAIRED (the poseidon_chain._mul_f structure, proven
    bit-exact there): two limbs' lo/hi rows combine in a small
    [..., 18, TB] cross-term block placed with cheap 1/2-row rolls, and
    the expensive full-frame [..., 33, TB] roll+add lands once per pair
    instead of twice per limb - the frame traffic that dominates this
    kernel halves.  In the paired REDC, step i's frame contribution at
    row i+1 (lo0[1] + hi0[0]) feeds step i+1 directly as scalar rows;
    the double-add into the already-consumed rows i..i+1 of the frame is
    harmless (they are never read again)."""
    a, b = jnp.broadcast_arrays(a, b)
    nT = 2 * N + 1
    T = None
    for i in range(0, N, 2):
        prod0 = a[..., i:i + 1, :] * b          # [..., 16, TB]
        prod1 = a[..., i + 1:i + 2, :] * b
        lo0 = prod0 & MASK
        hi0 = prod0 >> BITS
        lo1 = prod1 & MASK
        hi1 = prod1 >> BITS
        c = (_shift_rows(lo0, N + 2, 0) + _shift_rows(hi0 + lo1, N + 2, 1)
             + _shift_rows(hi1, N + 2, 2))
        upd = _shift_rows(c, nT, i)
        T = upd if T is None else T + upd
    # REDC: divide by 2^256 (paired)
    p_row = _p_row()
    carry = jnp.zeros_like(T[..., 0:1, :])
    for i in range(0, N, 2):
        vi0 = T[..., i:i + 1, :] + carry
        ti0 = vi0 & MASK
        m0 = (ti0 * jnp.uint32(fr.N0INV)) & MASK
        prod0 = m0 * p_row                      # [..., 16, TB]
        lo0 = prod0 & MASK
        hi0 = prod0 >> BITS
        carry = (vi0 >> BITS) + ((ti0 + lo0[..., 0:1, :]) >> BITS)
        vi1 = (T[..., i + 1:i + 2, :] + lo0[..., 1:2, :]
               + hi0[..., 0:1, :] + carry)
        ti1 = vi1 & MASK
        m1 = (ti1 * jnp.uint32(fr.N0INV)) & MASK
        prod1 = m1 * p_row
        lo1 = prod1 & MASK
        hi1 = prod1 >> BITS
        carry = (vi1 >> BITS) + ((ti1 + lo1[..., 0:1, :]) >> BITS)
        c = (_shift_rows(lo0, N + 2, 0) + _shift_rows(hi0 + lo1, N + 2, 1)
             + _shift_rows(hi1, N + 2, 2))
        T = T + _shift_rows(c, nT, i)
    cols = [T[..., N + k:N + k + 1, :] for k in range(N + 1)]
    cols[0] = cols[0] + carry
    out, _ = fr._norm(cols)
    return _cat_bl(fr._cond_sub_p_cols(out[:N]))


def _pow5_bl(x):
    x2 = _mul_bl(x, x)
    x4 = _mul_bl(x2, x2)
    return _mul_bl(x4, x)


def _redc_frame(T, nred):
    """Roll-based extended REDC on a relaxed accumulator frame
    T [..., nT, TB] (each row < 2^26): divides by 2^(16*nred) mod P and
    returns canonical [..., 16, TB].

    Steps run PAIRED like _mul_bl's REDC: the cross contributions
    lo0[1] + hi0[0] feed step i+1 as scalar rows, so the full-frame
    roll+add happens nred/2 times.  Carries stay in u32: vi1 <
    2^26 + 2^17 + carry."""
    nT = T.shape[-2]
    p_row = _p_row()
    carry = jnp.zeros_like(T[..., 0:1, :])
    i = 0
    while i < nred:
        vi0 = T[..., i:i + 1, :] + carry
        ti0 = vi0 & MASK
        m0 = (ti0 * jnp.uint32(fr.N0INV)) & MASK
        prod0 = m0 * p_row                      # [..., 16, TB]
        lo0 = prod0 & MASK
        hi0 = prod0 >> BITS
        carry = (vi0 >> BITS) + ((ti0 + lo0[..., 0:1, :]) >> BITS)
        if i + 1 < nred:
            vi1 = (T[..., i + 1:i + 2, :] + lo0[..., 1:2, :]
                   + hi0[..., 0:1, :] + carry)
            ti1 = vi1 & MASK
            m1 = (ti1 * jnp.uint32(fr.N0INV)) & MASK
            prod1 = m1 * p_row
            lo1 = prod1 & MASK
            hi1 = prod1 >> BITS
            carry = (vi1 >> BITS) + ((ti1 + lo1[..., 0:1, :]) >> BITS)
            c = (_shift_rows(lo0, N + 2, 0)
                 + _shift_rows(hi0 + lo1, N + 2, 1)
                 + _shift_rows(hi1, N + 2, 2))
            T = T + _shift_rows(c, nT, i)
            i += 2
        else:
            T = T + _shift_rows(lo0, nT, i) + _shift_rows(hi0, nT, i + 1)
            i += 1
    cols = [T[..., nred + k:nred + k + 1, :] for k in range(N + 1)]
    cols[0] = cols[0] + carry
    out, _ = fr._norm(cols)
    return _cat_bl(fr._cond_sub_p_cols(out[:N]))


# ---------------------------------------------------------------------------
# MXU MDS: the t x t constant-matrix multiply over 16-limb field elements
# is ONE linear map from the 544 input byte-digits to the 1088 output
# radix-2^8 coefficients.  Nibble-decomposed int8 matmuls keep every
# partial sum exact in int32 (products <= 15*15, <= 544 terms, recombined
# with 16^(p+q) <= 256 -> < 2^26), and the systolic array does in ~0.8 us
# what costs the VPU hundreds of issue slots.
# ---------------------------------------------------------------------------

def mxu_mds_planes(params_mds, t: int):
    """Host-side constant builder: (W_lo, W_hi) int8 [t*64, t*32].

    W8[(i,k'),(j,m)] = byte_{k'-d(m)} (M[i,j] * 2^272 mod P) with the input
    row convention m<16 -> byte0 of limb m (digit 2m), m>=16 -> byte1 of
    limb m-16 (digit 2(m-16)+1), matching the in-kernel digit layout.
    """
    from ..spec.field import P as _P

    B = np.zeros((t, t, 32), np.int16)
    for i in range(t):
        for j in range(t):
            v = params_mds[i][j] * fr.MAT_SCALE % _P
            for b in range(32):
                B[i, j, b] = (v >> (8 * b)) & 0xFF
    d_of_m = np.array([2 * m if m < 16 else 2 * (m - 16) + 1
                       for m in range(32)])
    l1 = np.arange(64)[:, None] - d_of_m[None, :]   # [64, 32]
    valid = (l1 >= 0) & (l1 < 32)
    l1c = np.clip(l1, 0, 31)
    W8 = np.zeros((t * 64, t * 32), np.int16)
    for i in range(t):
        for j in range(t):
            W8[i * 64:(i + 1) * 64, j * 32:(j + 1) * 32] = \
                np.where(valid, B[i, j][l1c], 0)
    return ((W8 & 0xF).astype(np.int8), (W8 >> 4).astype(np.int8))


def _mat_bl_mxu(wlo_ref, whi_ref, s):
    """MDS apply on the MXU: s [t, 16, TB] -> [t, 16, TB]."""
    t = s.shape[0]
    tb = s.shape[-1]
    lo_b = (s & 0xFF).astype(jnp.int32)
    hi_b = (s >> 8).astype(jnp.int32)
    sflat = jnp.concatenate([lo_b, hi_b], axis=-2).reshape(t * 32, tb)
    s_lo = (sflat & 0xF).astype(jnp.int8)
    s_hi = (sflat >> 4).astype(jnp.int8)

    def dot(w, v):
        return jax.lax.dot_general(w, v, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    wlo = wlo_ref[:]
    whi = whi_ref[:]
    t8 = (dot(wlo, s_lo) + ((dot(wlo, s_hi) + dot(whi, s_lo)) << 4)
          + (dot(whi, s_hi) << 8))
    t8 = t8.reshape(t, 64, tb)

    # radix 2^8 -> 2^16 with one carry fold; feed the roll-based REDC.
    # [t, 64, tb] -> even/odd byte rows via a reshape (64 = 32 pairs).
    nT = fr.NRED_MAT + N + 1
    pairs = t8.reshape(t, 32, 2, tb)
    ev = pairs[:, :, 0, :]
    od = pairs[:, :, 1, :]
    val = (ev + ((od & 0xFF) << 8)).astype(U32)       # [t, 32, tb]
    car = (od >> 8).astype(U32)
    T = _shift_rows(val, nT, 0) + _shift_rows(car, nT, 1)
    return _redc_frame(T, fr.NRED_MAT)


# ---------------------------------------------------------------------------
# Sparse partial rounds (spec.poseidon_opt factorization): each of the
# first rp-1 partial rounds applies the sparse matrix
#   Q_r = [[q00, w^T], [Mhat^-1 v, I]]
# (a t-term row dot for lane 0 + a 2-term column update for lanes 1..t-1)
# instead of the dense t x t MDS; one dense M_final lands after the last
# partial S-box.  ~3t multiplies per round instead of t^2, bit-exact.
# ---------------------------------------------------------------------------

def _row_dot_bl(qrow, s):
    """Lane-0 row dot: qrow [16, t, 1, 1] (limb-major 2^272-scaled constant
    limbs; trailing unit dims keep Mosaic's replicated layout so the
    broadcast against the tiled state is legal), s [t, 16, TB] ->
    [1, 16, TB] = REDC(sum_j qrow[j] * s[j])."""
    nT = fr.NRED_MAT + N + 1

    def lohi(l):
        prod = qrow[l] * s                        # [t,1,1]*[t,16,TB]
        # sums over j: <= t terms of < 2^16 -> < 2^21, int32-safe
        lo = (prod & MASK).astype(jnp.int32).sum(
            axis=0, keepdims=True).astype(U32)
        hi = (prod >> BITS).astype(jnp.int32).sum(
            axis=0, keepdims=True).astype(U32)
        return lo, hi

    T = None
    for l in range(0, N, 2):
        lo0, hi0 = lohi(l)
        lo1, hi1 = lohi(l + 1)
        c = (_shift_rows(lo0, N + 2, 0) + _shift_rows(hi0 + lo1, N + 2, 1)
             + _shift_rows(hi1, N + 2, 2))
        upd = _shift_rows(c, nT, l)
        T = upd if T is None else T + upd
    return _redc_frame(T, fr.NRED_MAT)


def _col_update_bl(qcol, s_rest, x0):
    """Column update: out_i = s_i + qcol[i] * x0 for lanes 1..t-1.

    qcol [16, t-1, 1, 1] is limb-major 2^272-scaled constant limbs;
    s_rest [t-1, 16, TB], x0 [1, 16, TB].  The identity term
    s_rest * 2^272 is ONE sublane roll to offset NRED_MAT (2^(16*17)
    placed exactly; the REDC reduces mod P), not a 16-limb
    constant multiply."""
    nT = fr.NRED_MAT + N + 1

    def lohi(l):
        pq = qcol[l] * x0                         # [t-1,1,1]*[1,16,TB]
        return pq & MASK, pq >> BITS

    T = _shift_rows(s_rest, nT, fr.NRED_MAT)
    for l in range(0, N, 2):
        lo0, hi0 = lohi(l)                        # rows < 2^16
        lo1, hi1 = lohi(l + 1)
        c = (_shift_rows(lo0, N + 2, 0) + _shift_rows(hi0 + lo1, N + 2, 1)
             + _shift_rows(hi1, N + 2, 2))
        T = T + _shift_rows(c, nT, l)
    return _redc_frame(T, fr.NRED_MAT)


def _permute_body(s, wlo_ref, whi_ref, mflo_ref, mfhi_ref, rcf_ref, rcp_ref,
                  qrow_ref, qcol_ref, rf, rp):
    """The full permutation on a state value s [t, 16, TB].

    Round-constant arrays stay Refs (dynamic VMEM loads inside the
    fori_loops).  rcf_ref: [rf, t, 16, 1]; rcp_ref: [rp, 1, 16, 1];
    qrow_ref: [rp-1, 16, t, 1, 1]; qcol_ref: [rp-1, 16, t-1, 1, 1].
    Full-round MDS runs on the MXU (nibble int8 matmul planes); partial
    rounds apply the sparse Q_r factors on the VPU (spec.poseidon_opt)
    -- bit-exact, ~3t muls per round vs t^2.  The one dense M_final
    after the last partial S-box uses its own MXU planes (small at the
    sparse widths t <= 33; t=129, where a second plane set would blow
    VMEM, is routed off Pallas entirely -- see pallas_supported).
    """
    half = rf // 2

    def full_round(r, s):
        rc = rcf_ref[pl.ds(r, 1)][0]              # [t, 16, 1]
        x = _add_bl(s, rc)
        x = _pow5_bl(x)
        return _mat_bl_mxu(wlo_ref, whi_ref, x)

    def partial_sparse(r, s):
        rc = rcp_ref[pl.ds(r, 1)][0]              # [1, 16, 1]
        x0 = _pow5_bl(_add_bl(s[0:1], rc))
        qrow = qrow_ref[pl.ds(r, 1)][0]           # [16, t, 1, 1]
        qcol = qcol_ref[pl.ds(r, 1)][0]           # [16, t-1, 1, 1]
        s_rest = s[1:]
        new0 = _row_dot_bl(qrow, jnp.concatenate([x0, s_rest], axis=0))
        rest = _col_update_bl(qcol, s_rest, x0)
        return jnp.concatenate([new0, rest], axis=0)

    s = jax.lax.fori_loop(0, half, full_round, s)
    s = jax.lax.fori_loop(0, rp - 1, partial_sparse, s)
    rc = rcp_ref[pl.ds(rp - 1, 1)][0]
    x0 = _pow5_bl(_add_bl(s[0:1], rc))
    s = jnp.concatenate([x0, s[1:]], axis=0)
    s = _mat_bl_mxu(mflo_ref, mfhi_ref, s)
    s = jax.lax.fori_loop(half, rf, full_round, s)
    return s


def _use_sparse(t: int) -> bool:
    """Sparse partial-round factors for the small widths only: the
    [..., 1, 1]-layout constants lane-pad 128x in VMEM, so at t >= 65
    (alt-schedule arities 64/128) qrow+qcol+afinal would exceed the
    128 MB VMEM budget; those widths use the dense-MXU body."""
    return t <= 33


def _permute_body_dense(s, wlo_ref, whi_ref, rcf_ref, rcp_ref, rf, rp):
    """Dense-MDS permutation body (every round on the MXU planes)."""
    half = rf // 2

    def full_round(r, s):
        rc = rcf_ref[pl.ds(r, 1)][0]
        x = _add_bl(s, rc)
        x = _pow5_bl(x)
        return _mat_bl_mxu(wlo_ref, whi_ref, x)

    def partial_round(r, s):
        rc = rcp_ref[pl.ds(r, 1)][0]
        x0 = _pow5_bl(_add_bl(s[0:1], rc))
        s = jnp.concatenate([x0, s[1:]], axis=0)
        return _mat_bl_mxu(wlo_ref, whi_ref, s)

    s = jax.lax.fori_loop(0, half, full_round, s)
    s = jax.lax.fori_loop(0, rp, partial_round, s)
    s = jax.lax.fori_loop(half, rf, full_round, s)
    return s


_mxu_cache: dict = {}


def _const_args(dp):
    key = id(dp)
    if key not in _mxu_cache:
        from ..spec.field import P as _P

        t, rp = dp.t, dp.rp
        wlo, whi = mxu_mds_planes(dp.spec_params.mds, dp.t)
        rcf = np.asarray(dp.rc_full)[..., None]
        rcp = np.asarray(dp.rc_part)[:, None, :, None]
        if not _use_sparse(t):
            _mxu_cache[key] = (wlo, whi, rcf, rcp)
        else:
            from ..spec.poseidon_opt import partial_round_factorization
            fac = partial_round_factorization(dp.spec_params)

            def scaled_limbs(vals):
                a = np.zeros((len(vals), N), np.uint32)
                for i, v in enumerate(vals):
                    x = v * fr.MAT_SCALE % _P
                    for k in range(N):
                        a[i, k] = (x >> (BITS * k)) & MASK
                return a

            # limb-major [rp-1, 16, t(,t-1), 1, 1]: only leading dims are
            # ever sliced in-kernel, keeping the trailing unit dims'
            # replicated layout (Mosaic cannot broadcast a sublane-sliced
            # vector).
            qrow = np.stack([scaled_limbs(r).T for r in fac.q_rows])
            qcol = np.stack([scaled_limbs(c).T for c in fac.q_cols])
            mflo, mfhi = mxu_mds_planes(fac.m_final, t)
            _mxu_cache[key] = (
                wlo, whi, mflo, mfhi, rcf, rcp,
                qrow[..., None, None], qcol[..., None, None])
    return tuple(jnp.asarray(a) for a in _mxu_cache[key])


# ---------------------------------------------------------------------------
# Batched permutation kernel.
# ---------------------------------------------------------------------------

def _const_specs(t, rf, rp):
    """BlockSpecs for the constant arrays from _const_args."""
    full = pl.BlockSpec((t * 64, t * 32), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    rc_specs = [
        pl.BlockSpec((rf, t, N, 1), lambda i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rp, 1, N, 1), lambda i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if not _use_sparse(t):
        return [full, full] + rc_specs
    return [
        full, full, full, full,
    ] + rc_specs + [
        pl.BlockSpec((rp - 1, N, t, 1, 1), lambda i: (0, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rp - 1, N, t - 1, 1, 1), lambda i: (0, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _permute_kernel(rf, rp, wlo_ref, whi_ref, mflo_ref, mfhi_ref, rcf_ref,
                    rcp_ref, qrow_ref, qcol_ref, prow_ref,
                    x_ref, o_ref):
    with _prow_scope(prow_ref):
        o_ref[:] = _permute_body(x_ref[:], wlo_ref, whi_ref, mflo_ref,
                                 mfhi_ref, rcf_ref, rcp_ref, qrow_ref,
                                 qcol_ref, rf, rp)


def _permute_kernel_dense(rf, rp, wlo_ref, whi_ref, rcf_ref, rcp_ref,
                          prow_ref, x_ref, o_ref):
    with _prow_scope(prow_ref):
        o_ref[:] = _permute_body_dense(x_ref[:], wlo_ref, whi_ref,
                                       rcf_ref, rcp_ref, rf, rp)


@partial(jax.jit, static_argnums=(1, 2))
def _permute_tiles(x, dp, interpret):
    """x: [t, 16, B] with B a multiple of TB."""
    t, _, B = x.shape
    rf, rp = dp.rf, dp.rp
    grid = (B // TB,)
    kern = (partial(_permute_kernel, rf, rp) if _use_sparse(t)
            else partial(_permute_kernel_dense, rf, rp))
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=_const_specs(t, rf, rp) + [
            pl.BlockSpec((1, N, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, N, TB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, N, TB), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, N, B), U32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*_const_args(dp), jnp.asarray(P_ROW_NP), x)
    return out


def permute(states, dp, interpret: bool = False):
    """Batched permutation: states [B, t, 16] Montgomery -> same.

    Drop-in replacement for ops.poseidon.permute's 2-D batch form.
    """
    B, t, _ = states.shape
    x = jnp.moveaxis(states, 0, -1)  # [t, 16, B]
    Bp = -(-B // TB) * TB
    if Bp != B:
        x = jnp.concatenate(
            [x, jnp.zeros((t, N, Bp - B), dtype=U32)], axis=-1)
    out = _permute_tiles(x, dp, interpret)
    return jnp.moveaxis(out[..., :B], -1, 0)


# ---------------------------------------------------------------------------
# Whole-sponge absorb chain kernel: C independent chains, nb sequential
# rate-blocks each.  One kernel launch for the entire chain; the state is
# carried in the (constant-indexed) output block across grid steps.
# ---------------------------------------------------------------------------

def _absorb_kernel(rf, rp, rate, wlo_ref, whi_ref, mflo_ref, mfhi_ref,
                   rcf_ref, rcp_ref, qrow_ref, qcol_ref,
                   prow_ref, init_ref, blocks_ref, state_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        state_ref[:] = init_ref[:]

    with _prow_scope(prow_ref):
        s = state_ref[:]                  # [t, 16, C]
        blk = blocks_ref[0]               # [rate, 16, C]
        absorbed = _add_bl(s[:rate], blk)
        s = jnp.concatenate([absorbed, s[rate:]], axis=0)
        state_ref[:] = _permute_body(s, wlo_ref, whi_ref, mflo_ref, mfhi_ref,
                                     rcf_ref, rcp_ref, qrow_ref, qcol_ref,
                                     rf, rp)


def _absorb_kernel_dense(rf, rp, rate, wlo_ref, whi_ref, rcf_ref, rcp_ref,
                         prow_ref, init_ref, blocks_ref, state_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        state_ref[:] = init_ref[:]

    with _prow_scope(prow_ref):
        s = state_ref[:]
        blk = blocks_ref[0]
        absorbed = _add_bl(s[:rate], blk)
        s = jnp.concatenate([absorbed, s[rate:]], axis=0)
        state_ref[:] = _permute_body_dense(s, wlo_ref, whi_ref,
                                           rcf_ref, rcp_ref, rf, rp)


@partial(jax.jit, static_argnums=(2, 3))
def absorb_chain(init_state, blocks, dp, interpret: bool = False):
    """init_state: [t, 16, C]; blocks: [nb, rate, 16, C] (Montgomery).

    Returns the state after nb sequential (absorb block, permute) steps -
    the transcript bulk-absorption loop (transcript/src/lib.rs:79-88) as
    ONE kernel launch.
    """
    t, _, C = init_state.shape
    nb, rate = blocks.shape[0], blocks.shape[1]
    rf, rp = dp.rf, dp.rp
    kern = (partial(_absorb_kernel, rf, rp, rate) if _use_sparse(t)
            else partial(_absorb_kernel_dense, rf, rp, rate))
    out = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=_const_specs(t, rf, rp) + [
            pl.BlockSpec((1, N, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, N, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rate, N, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, N, C), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, N, C), U32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*_const_args(dp), jnp.asarray(P_ROW_NP), init_state, blocks)
    return out

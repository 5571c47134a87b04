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
  - the ENTIRE partial-round block is evaluated in its exact affine form
    (spec.poseidon_opt.partial_round_affine): every multiply becomes a
    constant int8 nibble matmul on the MXU against a running digit
    buffer, leaving only the rp sequential one-element S-boxes on the
    VPU — ~5x fewer VPU ops than the sparse-factor round-by-round path,
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

def mxu_planes(mat, R: int, C: int):
    """Host-side constant builder: (W_lo, W_hi) int8 [R*64, C*32] for an
    arbitrary R x C field-constant matrix (entries pre-scaled by 2^272
    for the extended REDC).

    W8[(i,k'),(j,m)] = byte_{k'-d(m)} (M[i,j] * 2^272 mod P) with the input
    row convention m<16 -> byte0 of limb m (digit 2m), m>=16 -> byte1 of
    limb m-16 (digit 2(m-16)+1), matching the in-kernel digit layout.
    """
    from ..spec.field import P as _P

    B = np.zeros((R, C, 32), np.int16)
    for i in range(R):
        for j in range(C):
            v = mat[i][j] * fr.MAT_SCALE % _P
            for b in range(32):
                B[i, j, b] = (v >> (8 * b)) & 0xFF
    d_of_m = np.array([2 * m if m < 16 else 2 * (m - 16) + 1
                       for m in range(32)])
    l1 = np.arange(64)[:, None] - d_of_m[None, :]   # [64, 32]
    valid = (l1 >= 0) & (l1 < 32)
    l1c = np.clip(l1, 0, 31)
    W8 = np.zeros((R * 64, C * 32), np.int16)
    for i in range(R):
        for j in range(C):
            W8[i * 64:(i + 1) * 64, j * 32:(j + 1) * 32] = \
                np.where(valid, B[i, j][l1c], 0)
    return ((W8 & 0xF).astype(np.int8), (W8 >> 4).astype(np.int8))


def mxu_mds_planes(params_mds, t: int):
    return mxu_planes(params_mds, t, t)


def _to_digits_bl(s):
    """[rows, 16, TB] u32 canonical limbs -> [rows*32, 2*TB] int8 nibble
    digits in the mxu_planes input-row convention: low nibbles in lanes
    [:TB], high nibbles in lanes [TB:]."""
    rows, _, tb = s.shape
    lo_b = (s & 0xFF).astype(jnp.int32)
    hi_b = (s >> 8).astype(jnp.int32)
    sflat = jnp.concatenate([lo_b, hi_b], axis=-2).reshape(rows * 32, tb)
    return jnp.concatenate([(sflat & 0xF).astype(jnp.int8),
                            (sflat >> 4).astype(jnp.int8)], axis=-1)


def _dot_planes(w_cat, u_cat):
    """All four nibble-plane combinations in ONE int8 MXU matmul:
    w_cat [2R, K] (W_lo rows stacked over W_hi rows), u_cat [K, 2*TB]
    (lo-nibble lanes then hi-nibble lanes) -> exact int32 radix-2^8
    coefficient sums [R, TB] recombined from the four quadrants.
    Bounds: each quadrant <= 15*15*K, so t8 < 225*K*289 -- int32-safe up
    to K ~ 2^14 input digit rows (largest use: K=(t+rp)*32)."""
    q = jax.lax.dot_general(w_cat, u_cat, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    R = q.shape[0] // 2
    tb = q.shape[1] // 2
    return (q[:R, :tb] + ((q[:R, tb:] + q[R:, :tb]) << 4)
            + (q[R:, tb:] << 8))


def _t8_to_fr(t8, rows: int):
    """Radix-2^8 coefficient sums [rows*64, TB] -> canonical field limbs
    [rows, 16, TB]: fold byte pairs to 2^16 digits and extended-REDC by
    2^272 (the mxu_planes constant scale)."""
    tb = t8.shape[-1]
    nT = fr.NRED_MAT + N + 1
    pairs = t8.reshape(rows, 32, 2, tb)
    ev = pairs[:, :, 0, :]
    od = pairs[:, :, 1, :]
    val = (ev + ((od & 0xFF) << 8)).astype(U32)       # [rows, 32, tb]
    car = (od >> 8).astype(U32)
    T = _shift_rows(val, nT, 0) + _shift_rows(car, nT, 1)
    return _redc_frame(T, fr.NRED_MAT)


def _mat_bl_mxu(w_ref, s):
    """MDS apply on the MXU: s [t, 16, TB] -> [t, 16, TB].
    w_ref: [2*t*64, t*32] concatenated nibble planes."""
    t = s.shape[0]
    return _t8_to_fr(_dot_planes(w_ref[:], _to_digits_bl(s)), t)


# ---------------------------------------------------------------------------
# Affine partial-round block (spec.poseidon_opt.partial_round_affine):
# the whole rp-round block is an exact affine function of the block input
# s and the rp sequential S-box outputs y,
#
#     w_r = [W | V][r] . [s; y_{<r}]        (V strictly lower triangular)
#     y_r = sbox5(w_r + rc_partial[r])
#     out = [A_s | A_y] . [s; y]
#
# so every partial-round MULTIPLY becomes a constant int8 nibble matmul
# on the MXU against a running digit buffer U = [digits(s); digits(y_0);
# ...], leaving only the rp sequential one-element S-boxes (and one tiny
# extended REDC per round) on the VPU.  Unwritten y rows of U are read
# before being written, but always against structurally-zero plane
# columns (V's upper triangle), so their garbage contributes exactly 0.
# ---------------------------------------------------------------------------

def _permute_body(s, mds_ref, wv_ref, a_ref, rcf_ref, rcp_ref, u_ref,
                  rf, rp):
    """The full permutation on a state value s [t, 16, TB].

    Full-round MDS runs on the MXU (concatenated nibble planes mds_ref);
    the partial block runs in the affine form above with per-round plane
    slices wv_ref [rp*128, (t+rp)*32] (round r's W_lo rows at r*128,
    W_hi rows at r*128+64) and a_ref = [A_s | A_y] planes
    [2*t*64, (t+rp)*32].  rcf_ref: [rf, t, 16, 1]; rcp_ref:
    [rp, 1, 16, 1].  u_ref is [(t+rp)*32, 2*TB] int8 VMEM scratch (the
    running digit buffer, lo nibbles in lanes [:TB], hi in [TB:]).
    """
    t = s.shape[0]
    half = rf // 2

    def full_round(r, s):
        rc = rcf_ref[pl.ds(r, 1)][0]              # [t, 16, 1]
        x = _add_bl(s, rc)
        x = _pow5_bl(x)
        return _mat_bl_mxu(mds_ref, x)

    s = jax.lax.fori_loop(0, half, full_round, s)

    u_ref[0:t * 32] = _to_digits_bl(s)

    def partial_affine(r, carry):
        wv = wv_ref[pl.ds(r * 128, 128)]          # [128, (t+rp)*32]
        w = _t8_to_fr(_dot_planes(wv, u_ref[:]), 1)
        rc = rcp_ref[pl.ds(r, 1)][0]              # [1, 16, 1]
        y = _pow5_bl(_add_bl(w, rc))
        u_ref[pl.ds(t * 32 + r * 32, 32)] = _to_digits_bl(y)
        return carry

    jax.lax.fori_loop(0, rp, partial_affine, jnp.int32(0))

    s = _t8_to_fr(_dot_planes(a_ref[:], u_ref[:]), t)
    s = jax.lax.fori_loop(half, rf, full_round, s)
    return s


def _use_affine(t: int) -> bool:
    """Affine partial-round block for the small widths: the wv + a nibble
    planes total ~30-46 MB of VMEM at t <= 33.  At t=65 (rp=76) they
    would need ~100 MB on top of the dense MDS planes, so that width
    keeps the dense-MXU body."""
    return t <= 33


def _permute_body_dense(s, mds_ref, rcf_ref, rcp_ref, rf, rp):
    """Dense-MDS permutation body (every round on the MXU planes)."""
    half = rf // 2

    def full_round(r, s):
        rc = rcf_ref[pl.ds(r, 1)][0]
        x = _add_bl(s, rc)
        x = _pow5_bl(x)
        return _mat_bl_mxu(mds_ref, x)

    def partial_round(r, s):
        rc = rcp_ref[pl.ds(r, 1)][0]
        x0 = _pow5_bl(_add_bl(s[0:1], rc))
        s = jnp.concatenate([x0, s[1:]], axis=0)
        return _mat_bl_mxu(mds_ref, s)

    s = jax.lax.fori_loop(0, half, full_round, s)
    s = jax.lax.fori_loop(0, rp, partial_round, s)
    s = jax.lax.fori_loop(half, rf, full_round, s)
    return s


_mxu_cache: dict = {}


def _const_args(dp):
    key = id(dp)
    if key not in _mxu_cache:
        t, rp = dp.t, dp.rp
        wlo, whi = mxu_mds_planes(dp.spec_params.mds, dp.t)
        mds_cat = np.concatenate([wlo, whi], axis=0)
        rcf = np.asarray(dp.rc_full)[..., None]
        rcp = np.asarray(dp.rc_part)[:, None, :, None]
        if not _use_affine(t):
            _mxu_cache[key] = (mds_cat, rcf, rcp)
        else:
            from ..spec.poseidon_opt import partial_round_affine
            aff = partial_round_affine(dp.spec_params)
            wv = [list(aff.w_s[r]) + list(aff.v[r]) for r in range(rp)]
            a_ = [list(aff.a_s[i]) + list(aff.a_y[i]) for i in range(t)]
            K = (t + rp) * 32
            wvlo, wvhi = mxu_planes(wv, rp, t + rp)
            # round-interleaved: round r's W_lo rows at r*128, W_hi rows
            # at r*128 + 64, so the kernel slices ONE contiguous
            # [128, K] block per round.
            wv_cat = np.concatenate([wvlo.reshape(rp, 64, K),
                                     wvhi.reshape(rp, 64, K)],
                                    axis=1).reshape(rp * 128, K)
            alo, ahi = mxu_planes(a_, t, t + rp)
            a_cat = np.concatenate([alo, ahi], axis=0)
            _mxu_cache[key] = (mds_cat, wv_cat, a_cat, rcf, rcp)
    return tuple(jnp.asarray(a) for a in _mxu_cache[key])


# ---------------------------------------------------------------------------
# Batched permutation kernel.
# ---------------------------------------------------------------------------

def _const_specs(t, rf, rp):
    """BlockSpecs for the constant arrays from _const_args."""
    mds = pl.BlockSpec((2 * t * 64, t * 32), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    rc_specs = [
        pl.BlockSpec((rf, t, N, 1), lambda i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rp, 1, N, 1), lambda i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if not _use_affine(t):
        return [mds] + rc_specs
    return [
        mds,
        pl.BlockSpec((rp * 128, (t + rp) * 32), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * t * 64, (t + rp) * 32), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ] + rc_specs


def _u_scratch(t, rp, lanes):
    """Digit-buffer scratch for the affine body: U = [digits(s);
    digits(y_0..y_{rp-1})] as int8 nibble digits (lo/hi in lane halves)."""
    return [pltpu.VMEM(((t + rp) * 32, 2 * lanes), jnp.int8)]


def _permute_kernel(rf, rp, mds_ref, wv_ref, a_ref, rcf_ref, rcp_ref,
                    prow_ref, x_ref, o_ref, u_ref):
    with _prow_scope(prow_ref):
        o_ref[:] = _permute_body(x_ref[:], mds_ref, wv_ref, a_ref,
                                 rcf_ref, rcp_ref, u_ref, rf, rp)


def _permute_kernel_dense(rf, rp, mds_ref, rcf_ref, rcp_ref,
                          prow_ref, x_ref, o_ref):
    with _prow_scope(prow_ref):
        o_ref[:] = _permute_body_dense(x_ref[:], mds_ref,
                                       rcf_ref, rcp_ref, rf, rp)


@partial(jax.jit, static_argnums=(1, 2, 3))
def _permute_tiles(x, dp, interpret, tb):
    """x: [t, 16, B] with B a multiple of tb."""
    t, _, B = x.shape
    rf, rp = dp.rf, dp.rp
    grid = (B // tb,)
    affine = _use_affine(t)
    kern = (partial(_permute_kernel, rf, rp) if affine
            else partial(_permute_kernel_dense, rf, rp))
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=_const_specs(t, rf, rp) + [
            pl.BlockSpec((1, N, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, N, tb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, N, tb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, N, B), U32),
        scratch_shapes=_u_scratch(t, rp, tb) if affine else [],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*_const_args(dp), jnp.asarray(P_ROW_NP), x)
    return out


def _tile_for(B: int) -> int:
    """Lane tile: 2 VREG-widths for big batches (+15% throughput from
    amortized per-op overheads; 512 pathologically slows the Mosaic
    compile), 1 for small ones (less padding waste)."""
    return 2 * TB if B >= 2 * TB else TB


def permute(states, dp, interpret: bool = False):
    """Batched permutation: states [B, t, 16] Montgomery -> same.

    Drop-in replacement for ops.poseidon.permute's 2-D batch form.
    """
    B, t, _ = states.shape
    tb = _tile_for(B)
    x = jnp.moveaxis(states, 0, -1)  # [t, 16, B]
    Bp = -(-B // tb) * tb
    if Bp != B:
        x = jnp.concatenate(
            [x, jnp.zeros((t, N, Bp - B), dtype=U32)], axis=-1)
    out = _permute_tiles(x, dp, interpret, tb)
    return jnp.moveaxis(out[..., :B], -1, 0)


# ---------------------------------------------------------------------------
# Whole-sponge absorb chain kernel: C independent chains, nb sequential
# rate-blocks each.  One kernel launch for the entire chain; the state is
# carried in the (constant-indexed) output block across grid steps.
# ---------------------------------------------------------------------------

def _absorb_kernel(rf, rp, rate, mds_ref, wv_ref, a_ref, rcf_ref, rcp_ref,
                   prow_ref, init_ref, blocks_ref, state_ref, u_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        state_ref[:] = init_ref[:]

    with _prow_scope(prow_ref):
        s = state_ref[:]                  # [t, 16, C]
        blk = blocks_ref[0]               # [rate, 16, C]
        absorbed = _add_bl(s[:rate], blk)
        s = jnp.concatenate([absorbed, s[rate:]], axis=0)
        state_ref[:] = _permute_body(s, mds_ref, wv_ref, a_ref,
                                     rcf_ref, rcp_ref, u_ref, rf, rp)


def _absorb_kernel_dense(rf, rp, rate, mds_ref, rcf_ref, rcp_ref,
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
        state_ref[:] = _permute_body_dense(s, mds_ref,
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
    affine = _use_affine(t)
    kern = (partial(_absorb_kernel, rf, rp, rate) if affine
            else partial(_absorb_kernel_dense, rf, rp, rate))
    scratch = _u_scratch(t, rp, C) if affine else []
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
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*_const_args(dp), jnp.asarray(P_ROW_NP), init_state, blocks)
    return out

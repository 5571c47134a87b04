"""Fused Pallas Poseidon for the WIDE widths t in {65, 129} (Merkle
arities 64/128, poseidon/src/lib.rs:120-146).

The batch-last kernel in `poseidon_pallas` bakes the byte-digit shift
structure of the MDS matmul into a banded weight matrix [t*64, t*32]
whose footprint grows as 2048*t^2 bytes - 17 MB at t=65 and 68 MB at
t=129, which (plus lane-padded spills) blows VMEM.  This module uses a
LANE-MAJOR layout instead - state tiles [B, 16, L] with the batch in the
leading dim, the 16 radix-2^16 limbs on sublanes, and the t state
elements lane-padded to L in {128, 256} - which makes the compact MDS
formulation legal:

  - weights are [L, 32*L] int8 nibble planes, W[j, b*L + i] =
    nibble(byte_b(M[i][j] * 2^272 mod P)): 2048*L bytes per plane
    (0.5-2 MB) instead of 2048*t^2,
  - one MXU dot per (state-byte-row, weight-nibble) pair contracts over
    the t lanes; the byte-shift alignment that the banded matrix paid
    ~2x memory for is done AFTER the matmul by accumulating the 32
    b-blocks into two parity frames (even/odd radix-2^8 positions) with
    cheap sublane rolls - no strided slicing, no relayouts,
  - the parity frames recombine to radix-2^16 rows and ride the same
    extended-REDC tail as the batch-last kernel,
  - the field helpers (_mul_bl/_add_bl/_redc_frame) are shape-agnostic
    over [..., 16, lanes] and are reused verbatim from poseidon_pallas.

Frame rows here reach ~2^30 (32 b-blocks x 16.6M nibble-recombined
entries) - above the 2^26 the batch-last kernel keeps, still safe: the
REDC step arithmetic stays strictly below 2^31 (step growth is
<= 2^17 per row over 17 steps).

Bit-exact against spec.poseidon.permute (tests/test_ops_poseidon.py runs
all widths through this route on the TPU driver).
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
from .poseidon_pallas import (P_ROW_NP, _add_bl, _mul_bl, _pow5_bl,
                              _prow_scope, _redc_frame, _shift_rows)

BT = 8  # leading-dim batch tile (MXU M = BT*16 = 128)


def wide_supported(t: int) -> bool:
    return t in (65, 129)


def _lanes(t: int) -> int:
    return -(-t // 128) * 128


# ---------------------------------------------------------------------------
# Constants.
# ---------------------------------------------------------------------------

def wide_mds_planes(params_mds, t: int):
    """(W_lo, W_hi) int8 [L, 32*L]: W[j, b*L + i] = byte_b of
    M[i][j] * 2^272 mod P, split into nibbles."""
    from ..spec.field import P as _P

    L = _lanes(t)
    W8 = np.zeros((L, 32 * L), np.int16)
    for i in range(t):
        for j in range(t):
            v = params_mds[i][j] * fr.MAT_SCALE % _P
            for b in range(32):
                W8[j, b * L + i] = (v >> (8 * b)) & 0xFF
    return ((W8 & 0xF).astype(np.int8), (W8 >> 4).astype(np.int8))


_const_cache: dict = {}


def _wide_consts(dp):
    key = id(dp)
    if key not in _const_cache:
        t, L = dp.t, _lanes(dp.t)
        wlo, whi = wide_mds_planes(dp.spec_params.mds, t)
        # rc_full [rf, t, 16] -> lane-major [rf, 16, L]
        rcf = np.zeros((dp.rf, N, L), np.uint32)
        rcf[:, :, :t] = np.swapaxes(np.asarray(dp.rc_full), 1, 2)
        # rc_part [rp, 16] -> lane 0 only
        rcp = np.zeros((dp.rp, N, L), np.uint32)
        rcp[:, :, 0] = np.asarray(dp.rc_part)
        _const_cache[key] = (wlo, whi, rcf, rcp)
    return tuple(jnp.asarray(a) for a in _const_cache[key])


# ---------------------------------------------------------------------------
# MDS on the MXU, lane-major.
# ---------------------------------------------------------------------------

def _mm(v, w):
    """[B*16, L] int8 @ [L, 32L] int8 -> int32."""
    return jax.lax.dot_general(v, w, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


def _mat_wide(wlo_ref, whi_ref, s):
    """MDS apply: s [B, 16, L] canonical limbs -> [B, 16, L]."""
    B, _, L = s.shape
    wlo = wlo_ref[:]
    whi = whi_ref[:]

    def group(x8):
        """x8 [B, 16, L] byte rows -> nibble-recombined [B, 16, 32L]."""
        xl = (x8 & 0xF).astype(jnp.int8).reshape(B * N, L)
        xh = (x8 >> 4).astype(jnp.int8).reshape(B * N, L)
        y = (_mm(xl, wlo) + ((_mm(xh, wlo) + _mm(xl, whi)) << 4)
             + (_mm(xh, whi) << 8))
        return y.reshape(B, N, 32 * L)

    tL = group(s & 0xFF)       # digit value 2k at row k
    tH = group(s >> 8)         # digit value 2k+1 at row k
    # b-block accumulation into even/odd radix-2^8 parity frames:
    # c = b + dv; even c land in FE at row c/2, odd in FO at (c-1)/2.
    nF = 33
    FE = FO = None
    for b in range(32):
        yl = tL[:, :, b * L:(b + 1) * L]
        yh = tH[:, :, b * L:(b + 1) * L]
        if b % 2 == 0:
            m = b // 2
            fe = _shift_rows(yl, nF, m)       # c = 2k + b
            fo = _shift_rows(yh, nF, m)       # c = 2k+1 + b
        else:
            m = (b - 1) // 2
            fo = _shift_rows(yl, nF, m)       # c = 2k + b (odd)
            fe = _shift_rows(yh, nF, m + 1)   # c = 2(k+m+1)
        FE = fe if FE is None else FE + fe
        FO = fo if FO is None else FO + fo
    FE = FE.astype(U32)
    FO = FO.astype(U32)
    # radix 2^8 parity rows -> 2^16 rows + carry row; extended REDC.
    nT = fr.NRED_MAT + N + 1
    v16 = FE + ((FO & 0xFF) << 8)
    car = FO >> 8
    T = _shift_rows(v16, nT, 0) + _shift_rows(car, nT, 1)
    return _redc_frame(T, fr.NRED_MAT)


# ---------------------------------------------------------------------------
# Permutation body (dense MDS every round; S-box on lane 0 only in the
# partial rounds, computed on the [B, 16, 1] lane slice).
# ---------------------------------------------------------------------------

def _lane0_mask(B, L):
    return jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2) == 0


def _permute_body_wide(s, wlo_ref, whi_ref, rcf_ref, rcp_ref, rf, rp):
    B, _, L = s.shape
    half = rf // 2
    l0 = _lane0_mask(B, L)

    def full_round(r, s):
        rc = rcf_ref[pl.ds(r, 1)][0]          # [16, L]
        x = _add_bl(s, rc[None])
        x = _pow5_bl(x)
        return _mat_wide(wlo_ref, whi_ref, x)

    def partial_round(r, s):
        rc = rcp_ref[pl.ds(r, 1)][0]          # [16, L], lane 0 only
        x = _add_bl(s, rc[None])
        x0 = _pow5_bl(x[:, :, 0:1])           # [B, 16, 1]
        x = jnp.where(l0, jnp.broadcast_to(x0, x.shape), x)
        return _mat_wide(wlo_ref, whi_ref, x)

    s = jax.lax.fori_loop(0, half, full_round, s)
    s = jax.lax.fori_loop(0, rp, partial_round, s)
    s = jax.lax.fori_loop(half, rf, full_round, s)
    return s


def _permute_kernel_wide(rf, rp, wlo_ref, whi_ref, rcf_ref, rcp_ref,
                         prow_ref, x_ref, o_ref):
    with _prow_scope(prow_ref):
        o_ref[:] = _permute_body_wide(x_ref[:], wlo_ref, whi_ref,
                                      rcf_ref, rcp_ref, rf, rp)


@partial(jax.jit, static_argnums=(1, 2))
def _permute_tiles_wide(x, dp, interpret):
    """x: [B, 16, L] with B a multiple of BT."""
    B, _, L = x.shape
    t, rf, rp = dp.t, dp.rf, dp.rp
    grid = (B // BT,)
    out = pl.pallas_call(
        partial(_permute_kernel_wide, rf, rp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, 32 * L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 32 * L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rf, N, L), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rp, N, L), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, N, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BT, N, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, L), U32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*_wide_consts(dp), jnp.asarray(P_ROW_NP), x)
    return out


def permute(states, dp, interpret: bool = False):
    """Batched permutation: states [B, t, 16] Montgomery -> same.

    Drop-in replacement for ops.poseidon.permute's 3-D batch form at the
    wide widths."""
    B, t, _ = states.shape
    L = _lanes(t)
    x = jnp.swapaxes(states, 1, 2)           # [B, 16, t]
    Bp = -(-B // BT) * BT
    pads = [(0, Bp - B), (0, 0), (0, L - t)]
    if Bp != B or L != t:
        x = jnp.pad(x, pads)
    out = _permute_tiles_wide(x, dp, interpret)
    return jnp.swapaxes(out[:B, :, :t], 1, 2)

"""Fused Pallas radix-2 NTT: all butterfly stages of a transform in one
kernel launch, VMEM-resident between stages.

The XLA formulation in `ops.ntt` materializes the full [n, 16] vector to
HBM after every one of the log2(n) stages (reshape/concat graphs), which
at n = 2^20 costs ~0.28 s.  This kernel runs BATCHED size-L transforms
(L <= 1024) with the batch in the lane dimension - tiles [L, 16, TB] like
the Poseidon batch-last kernels, reusing their shape-agnostic Montgomery
column helpers - and composes large transforms with the four-step
decomposition (ops.ntt.ntt_four_step semantics):

    n = n1*n2:  size-n1 column transforms (one batched kernel launch,
    with the w^(i2*j1) twiddle scale FUSED into the kernel epilogue),
    XLA transpose, size-n2 row transforms (second launch).

The step-2 twiddle table is built on device (vmapped geometric series),
cached per (n, inverse); the inverse transform folds the 1/n scale into
the same epilogue.  Stage-1 butterflies skip the multiply (twiddle = 1).

Bit-exact against ops.ntt.ntt (tests/test_ntt.py cross-checks the two
routes and the golden O(n^2) evaluation).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..spec.field import P, get_root_of_unity
from . import fr
from .fr import N, U32
from .poseidon_pallas import (P_ROW_NP, _add_bl, _cat_bl, _cols_bl, _mul_bl,
                              _prow_scope)

TB = 128
L_MAX = 1024           # transform length per kernel (VMEM-bound)
N_MIN = 1 << 12        # below this the XLA path wins (launch overhead)
# Four-step supports n1, n2 <= L_MAX (2^20), but the n1=1024-tile body
# register-spills ~132 MB past VMEM on current v5e toolchains (measured
# 2026-08: libtpu AOT "Ran out of memory in memory space vmem"), so the
# route caps at 2^18; ops/ntt.py self-heals to the jitted XLA butterflies
# above it (and on any future toolchain where this kernel fails).
N_MAX = 1 << 18


def _sub_bl(a, b):
    a, b = jnp.broadcast_arrays(a, b)
    return _cat_bl(fr._sub_cols(_cols_bl(a), _cols_bl(b)))


def pallas_ntt_supported(n: int) -> bool:
    return N_MIN <= n <= N_MAX


# ---------------------------------------------------------------------------
# Constants.
# ---------------------------------------------------------------------------

def _bit_reverse_perm(n: int) -> np.ndarray:
    logn = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int32)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(logn):
        rev |= ((idx >> b) & 1) << (logn - 1 - b)
    return rev


@lru_cache(maxsize=None)
def _stage_table(L: int, omega_L: int) -> np.ndarray:
    """[L, 16, 1] Montgomery twiddles, stage tables concatenated: rows
    [h, 2h) hold w_g^j (j < h) for the stage with group size g = 2h,
    w_g = omega_L^(L/g).  Row 0 unused."""
    out = np.zeros((L, N, 1), np.uint32)
    g = 2
    while g <= L:
        h = g // 2
        w = pow(omega_L, L // g, P)
        vals = [pow(w, j, P) for j in range(h)]
        out[h:2 * h, :, 0] = fr.pack_ints(vals, mont=True)
        g *= 2
    return out


@lru_cache(maxsize=None)
def _four_step_consts(n: int, inverse: bool):
    """(n1, n2, rev1, rev2, wt1, wt2, ep) with ep the [n1, 16, n2]
    batch-last step-2 twiddle (times 1/n when inverse)."""
    assert pallas_ntt_supported(n)
    k = n.bit_length() - 1
    n1 = min(L_MAX, 1 << ((k + 1) // 2))
    n2 = n // n1
    assert n2 <= L_MAX
    omega = get_root_of_unity(n)
    if inverse:
        omega = pow(omega, P - 2, P)
    w1 = pow(omega, n2, P)        # root of the size-n1 subgroup
    w2 = pow(omega, n1, P)        # root of the size-n2 subgroup
    # Concrete-value guard: these are lru_cached, and the first call may
    # come from inside a jit/vmap trace — caching tracers poisons later
    # traces (see ops/ntt._plan).
    with jax.ensure_compile_time_eval():
        rev1 = jnp.asarray(_bit_reverse_perm(n1))
        rev2 = jnp.asarray(_bit_reverse_perm(n2))
        wt1 = jnp.asarray(_stage_table(n1, w1))
        wt2 = jnp.asarray(_stage_table(n2, w2))
        # ep[j1, :, i2] = limbs(omega^(i2*j1) [* 1/n]) - device-built rows
        # of geometric series (host pows at n=2^20 would be ~1M bigints).
        scale = pow(n, P - 2, P) if inverse else 1
        w_m = jnp.asarray(fr.pack_int(omega, mont=True))
        bases = fr.powers(w_m, n2)                    # [n2, 16]: omega^i2
        rows = jax.vmap(lambda b: fr.powers(b, n1))(bases)  # [n2, n1, 16]
        if scale != 1:
            s_m = jnp.asarray(fr.pack_int(scale, mont=True))
            rows = fr.mont_mul(rows, s_m[None, None, :])
        ep = jnp.swapaxes(rows, 0, 1)                 # [n1, n2, 16]
        ep = jnp.moveaxis(ep, 1, -1)                  # [n1, 16, n2]
    return n1, n2, rev1, rev2, wt1, wt2, ep


# ---------------------------------------------------------------------------
# Batched-transform kernel.
# ---------------------------------------------------------------------------

def _ntt_kernel(nstages, has_ep, wt_ref, prow_ref, *rest):
    if has_ep:
        ep_ref, x_ref, o_ref = rest
    else:
        x_ref, o_ref = rest
    with _prow_scope(prow_ref):
        x = x_ref[:]                                  # [L, 16, TB]
        L = x.shape[0]
        for s in range(1, nstages + 1):
            g = 1 << s
            h = g >> 1
            y = x.reshape(L // g, g, N, TB)
            e = y[:, :h]
            o = y[:, h:]
            if s > 1:
                tw = wt_ref[h:2 * h]                  # [h, 16, 1]
                o = _mul_bl(o, tw[None])
            x = jnp.concatenate([_add_bl(e, o), _sub_bl(e, o)], axis=1)
            x = x.reshape(L, N, TB)
        if has_ep:
            x = _mul_bl(x, ep_ref[:])
        o_ref[:] = x


@partial(jax.jit, static_argnums=(3,))
def _ntt_tiles(x, wt, ep, interpret):
    """x [L, 16, B] bit-reversed input, B multiple of TB; ep [L, 16, B]
    epilogue multiplier or None."""
    L, _, B = x.shape
    nstages = L.bit_length() - 1
    grid = (B // TB,)
    has_ep = ep is not None
    specs = [
        pl.BlockSpec((L, N, 1), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N, 1), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [wt, jnp.asarray(P_ROW_NP)]
    if has_ep:
        specs.append(pl.BlockSpec((L, N, TB), lambda i: (0, 0, i),
                                  memory_space=pltpu.VMEM))
        args.append(ep)
    specs.append(pl.BlockSpec((L, N, TB), lambda i: (0, 0, i),
                              memory_space=pltpu.VMEM))
    args.append(x)
    return pl.pallas_call(
        partial(_ntt_kernel, nstages, has_ep),
        grid=grid,
        in_specs=specs,
        out_specs=pl.BlockSpec((L, N, TB), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, N, B), U32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def _batched(xb, rev, wt, ep=None, interpret=False):
    """xb [L, 16, B] in-order transforms down axis 0 -> same shape."""
    L, _, B = xb.shape
    xb = jnp.take(xb, rev, axis=0)
    Bp = -(-B // TB) * TB
    pad = Bp - B
    if pad:
        xb = jnp.concatenate(
            [xb, jnp.zeros((L, N, pad), dtype=U32)], axis=-1)
        if ep is not None:
            ep = jnp.concatenate(
                [ep, jnp.zeros((L, N, pad), dtype=U32)], axis=-1)
    out = _ntt_tiles(xb, wt, ep, interpret)
    return out[..., :B] if pad else out


def ntt(x, inverse: bool = False, interpret: bool = False):
    """Four-step Pallas NTT of x [n, 16] Montgomery, in-order in/out.
    Bit-exact with ops.ntt.ntt (including the 1/n scale when inverse)."""
    n = int(x.shape[0])
    n1, n2, rev1, rev2, wt1, wt2, ep = _four_step_consts(n, inverse)
    # columns: i = i1*n2 + i2 -> transform over i1 for each i2
    cols = x.reshape(n1, n2, N)                       # [i1, i2, 16]
    xb = jnp.moveaxis(cols, 1, -1)                    # [n1, 16, n2]
    y = _batched(xb, rev1, wt1, ep, interpret)        # [j1, 16, i2]
    # rows: transform over i2 for each j1
    rb = jnp.swapaxes(y, 0, 2)                        # [i2, 16, j1]
    r = _batched(rb, rev2, wt2, None, interpret)      # [j2, 16, j1]
    # X[j1 + n1*j2]
    out = jnp.moveaxis(r, -1, 1)                      # [j2, j1, 16]
    return out.reshape(n, N)

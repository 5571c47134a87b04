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
L_TILE = 512           # max transform length per kernel launch: the
#                        1024-tile body register-spills ~132 MB past VMEM
#                        on current v5e toolchains (measured 2026-08:
#                        libtpu AOT "Ran out of memory in vmem")
N_MIN = 1 << 12        # below this the XLA path wins (launch overhead)
# Large transforms recurse: n = m1*m2 four-steps until the transform
# length fits one L_TILE kernel (2^22 = 512 x (128 x 64) -> 3 launches).
N_MAX = 1 << 22


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


def _split(M: int):
    """m1 (tile length) x m2 (column count) for the four-step of size M.
    Prefers m2 a multiple of TB so the kernel reads the step-1 twiddle
    table with a modular block index (no materialized broadcast)."""
    k = M.bit_length() - 1
    m1 = min(L_TILE, 1 << ((k + 1) // 2))
    m2 = M // m1
    while m2 < TB and m1 > 2:
        m1 //= 2
        m2 *= 2
    return m1, m2


@lru_cache(maxsize=None)
def _tile_consts(L: int, inverse: bool):
    """(bit-reversal, stage twiddle table) for a size-L tile transform.
    Concrete-value guard: lru_cached, and the first call may come from
    inside a jit/vmap trace — caching tracers poisons later traces (see
    ops/ntt._plan)."""
    omega = get_root_of_unity(L)
    if inverse:
        omega = pow(omega, P - 2, P)
    with jax.ensure_compile_time_eval():
        rev = jnp.asarray(_bit_reverse_perm(L))
        wt = jnp.asarray(_stage_table(L, omega))
    return rev, wt


@lru_cache(maxsize=None)
def _step_ep(M: int, m1: int, m2: int, inverse: bool, scaled: bool):
    """ep[j1, :, i2] = limbs(omega_M^(i2*j1) [* 1/M when scaled inverse])
    — device-built rows of geometric series (host pows at M=2^22 would be
    ~4M bigints)."""
    omega = get_root_of_unity(M)
    if inverse:
        omega = pow(omega, P - 2, P)
    scale = pow(M, P - 2, P) if (inverse and scaled) else 1
    with jax.ensure_compile_time_eval():
        w_m = jnp.asarray(fr.pack_int(omega, mont=True))
        bases = fr.powers(w_m, m2)                    # [m2, 16]: omega^i2
        rows = jax.vmap(lambda b: fr.powers(b, m1))(bases)  # [m2, m1, 16]
        if scale != 1:
            s_m = jnp.asarray(fr.pack_int(scale, mont=True))
            rows = fr.mont_mul(rows, s_m[None, None, :])
        ep = jnp.transpose(rows, (1, 2, 0))           # [m1, 16, m2]
    return ep


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
    """x [L, 16, B] bit-reversed input, B multiple of TB; ep an epilogue
    multiplier of shape [L, 16, B] or, PERIODIC, [L, 16, ep_cols] with
    ep_cols | B and ep_cols a multiple of TB (lanes ordered (outer,
    i2): each TB block re-reads twiddle block i % (ep_cols/TB))."""
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
        ep_cols = ep.shape[-1]
        if ep_cols == B:
            ep_map = lambda i: (0, 0, i)
        else:
            assert ep_cols % TB == 0 and B % ep_cols == 0, (ep_cols, B)
            period = ep_cols // TB
            ep_map = lambda i: (0, 0, i % period)
        specs.append(pl.BlockSpec((L, N, TB), ep_map,
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
        if ep is not None and ep.shape[-1] == B:
            ep = jnp.concatenate(
                [ep, jnp.zeros((L, N, pad), dtype=U32)], axis=-1)
    out = _ntt_tiles(xb, wt, ep, interpret)
    return out[..., :B] if pad else out


def _transform_any(xb, inverse: bool, interpret: bool,
                   scale_top: bool = False):
    """Batched in-order size-M NTTs down axis 0: xb [M, 16, B] -> same.

    M <= L_TILE runs as one kernel launch; larger M recurses through the
    four-step (columns -> fused twiddle epilogue -> rows), so n = 2^22 is
    512 x (128 x 64) = 3 launches with every butterfly VMEM-resident.
    scale_top folds the inverse transform's 1/M into the step-1 epilogue
    (applied exactly once, at the outermost level)."""
    M, _, B = (int(d) for d in xb.shape)
    if M <= L_TILE:
        rev, wt = _tile_consts(M, inverse)
        ep = None
        if scale_top and inverse:
            s = pow(M, P - 2, P)
            with jax.ensure_compile_time_eval():
                row = jnp.asarray(fr.pack_int(s, mont=True))
            ep = jnp.broadcast_to(row[None, :, None], (M, N, B))
        return _batched(xb, rev, wt, ep, interpret)
    m1, m2 = _split(M)
    ep = _step_ep(M, m1, m2, inverse, scale_top and inverse)
    if m2 % TB:
        # a TB lane block would straddle outer-batch boundaries (the i2
        # pattern repeats faster than a block): materialize the broadcast
        ep = jnp.broadcast_to(ep[:, :, None, :],
                              (m1, N, B, m2)).reshape(m1, N, B * m2)
    # columns: i = i1*m2 + i2 -> transform over i1 for each (b, i2)
    cols = xb.reshape(m1, m2, N, B)
    colb = jnp.transpose(cols, (0, 2, 3, 1)).reshape(m1, N, B * m2)
    rev1, wt1 = _tile_consts(m1, inverse)
    y = _batched(colb, rev1, wt1, ep, interpret)      # [j1, 16, (b, i2)]
    # rows: transform over i2 (size m2) for each (b, j1)
    y = y.reshape(m1, N, B, m2)
    rowb = jnp.transpose(y, (3, 1, 0, 2)).reshape(m2, N, m1 * B)
    r = _transform_any(rowb, inverse, interpret)      # [j2, 16, (j1, b)]
    # X[j1 + m1*j2] per b
    r = r.reshape(m2, N, m1, B)
    return jnp.transpose(r, (0, 2, 1, 3)).reshape(M, N, B)


def ntt(x, inverse: bool = False, interpret: bool = False):
    """Recursive four-step Pallas NTT of x [n, 16] Montgomery, in-order
    in/out.  Bit-exact with ops.ntt.ntt (incl. the 1/n inverse scale)."""
    n = int(x.shape[0])
    out = _transform_any(x[:, :, None], inverse, interpret, scale_top=True)
    return out[:, :, 0]

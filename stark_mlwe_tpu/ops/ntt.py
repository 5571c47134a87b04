"""Radix-2 NTT / iNTT / LDE over Fr on device.

The reference never executes an FFT in its proving path (its `fft` crate
is a stale BLS12-381 wrapper, /root/reference/crates/fft/src/lib.rs:1-32;
DEEP-ALI works directly on evaluation vectors).  The TPU framework
implements a real low-degree-extension stage as SURVEY.md section 7.0
requires: radix-2 Cooley-Tukey over the Pallas-Fr 2-adic subgroup
(two-adicity 32, crates/field/src/lib.rs:157-161), with

  - a host-precomputed bit-reversal gather (one jnp.take),
  - per-stage twiddle tables in Montgomery form, cached per size,
  - butterflies as fused batched add/sub/mont_mul columns,
  - `lde`: iNTT -> zero-pad -> (optional coset scale) -> NTT at blowup.

Semantics: ntt(c)[j] = sum_i c_i omega^(ij) with omega = get_root_of_unity(n)
(ark-ff FftField convention, field/src/lib.rs:46).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from ..spec.field import P, get_root_of_unity
from . import fr


def _bit_reverse_perm(n: int) -> np.ndarray:
    logn = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int32)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(logn):
        rev |= ((idx >> b) & 1) << (logn - 1 - b)
    return rev


@lru_cache(maxsize=None)
def _plan(n: int, inverse: bool):
    """(bit-reversal indices, per-stage twiddle device arrays [half,16]).

    Built under ensure_compile_time_eval so the cached arrays are always
    CONCRETE: the first call may happen inside a vmap/shard_map trace
    (e.g. parallel.build_ntt_sharded's step), and caching a tracer there
    poisons every later trace (UnexpectedTracerError)."""
    assert n & (n - 1) == 0 and n > 1
    omega = get_root_of_unity(n)
    if inverse:
        omega = pow(omega, P - 2, P)
    with jax.ensure_compile_time_eval():
        rev = jnp.asarray(_bit_reverse_perm(n))
        tws = []
        L = 2
        while L <= n:
            half = L // 2
            w = pow(omega, n // L, P)
            tws.append(jnp.asarray(fr.pack_ints(
                [pow(w, j, P) for j in range(half)], mont=True)))
            L *= 2
    return rev, tuple(tws)


def _butterflies(x, tws):
    n = x.shape[0]
    L = 2
    for tw in tws:
        half = L // 2
        y = x.reshape(n // L, L, fr.N)
        e = y[:, :half, :]
        o = fr.mont_mul(y[:, half:, :], tw[None, :, :])
        x = jnp.concatenate([fr.add(e, o), fr.sub(e, o)], axis=1)
        x = x.reshape(n, fr.N)
        L *= 2
    return x


# Per-size health of the fused Pallas route: some toolchains spill the
# n1=1024 tile kernel out of VMEM (seen at n=2^20 on v5e libtpu 2026-08);
# the first eager call probes with a blocking execute.  Failures are
# classified by CAUSE, not by resource-exhausted phrasing: compile /
# lowering failures (Mosaic, VMEM limits — however worded) pin the size
# to the XLA butterfly path for the process lifetime, while transient
# axon-tunnel errors (remote_compile / HTTP 5xx) are retried on later
# calls up to a bounded count before pinning.
_pallas_size_ok: dict = {}
_pallas_transient_fails: dict = {}
_PALLAS_TRANSIENT_RETRIES = 3


def _pallas_route(x, n: int, inverse: bool):
    from . import ntt_pallas

    ok = _pallas_size_ok.get(n)
    if ok is False:
        return None
    if ok:
        return ntt_pallas.ntt(x, inverse)
    if isinstance(x, jax.core.Tracer):
        return None  # probing needs an eager call; stay on the XLA path
    try:
        out = jax.block_until_ready(ntt_pallas.ntt(x, inverse))
        _pallas_size_ok[n] = True
        return out
    except Exception as exc:
        import sys
        msg = str(exc).lower()
        tunnel = ("remote_compile" in msg or "http" in msg
                  or "unavailable" in msg or "deadline" in msg)
        if tunnel:
            cnt = _pallas_transient_fails.get(n, 0) + 1
            _pallas_transient_fails[n] = cnt
            if cnt >= _PALLAS_TRANSIENT_RETRIES:
                _pallas_size_ok[n] = False
            verdict = ("pinned to" if cnt >= _PALLAS_TRANSIENT_RETRIES
                       else f"retry {cnt}/{_PALLAS_TRANSIENT_RETRIES}, "
                            "falling back once to")
        else:
            # compile/lowering-shaped (Mosaic, VMEM spill — including ones
            # phrased as RESOURCE_EXHAUSTED): re-probing would redo a
            # multi-minute remote compile just to fail again.
            _pallas_size_ok[n] = False
            verdict = "pinned to"
        print(f"# ntt: pallas route n={n} failed "
              f"({type(exc).__name__}); {verdict} XLA path", file=sys.stderr)
        return None


@lru_cache(maxsize=None)
def _xla_ntt_jit(n: int, inverse: bool):
    """Whole-transform jit of the XLA butterfly path: one fused program
    instead of ~log2(n) eagerly dispatched stage graphs (the eager route
    measured ~200-400 ms of dispatch overhead at every size)."""
    rev, tws = _plan(n, inverse)
    if inverse:
        n_inv = pow(n % P, P - 2, P)
        with jax.ensure_compile_time_eval():
            scale = jnp.asarray(fr.pack_int(n_inv, mont=True))[None, :]

    def fn(x):
        x = jnp.take(x, rev, axis=0)
        x = _butterflies(x, tws)
        if inverse:
            return fr.mont_mul(x, scale)
        return x

    return jax.jit(fn)


def ntt(x, inverse: bool = False, use_pallas: bool | None = None):
    """In-order radix-2 NTT of x: [n, 16] Montgomery.  With inverse=True
    computes the inverse transform including the 1/n scale.

    On TPU, sizes in [2^12, 2^22] dispatch to the fused recursive
    four-step Pallas kernel (ops/ntt_pallas.py: all butterfly stages
    VMEM-resident, 2-3 launches) with a self-healing fallback to the
    jitted XLA butterflies; `use_pallas` forces the route for
    cross-checking."""
    n = int(x.shape[0])
    if n == 1:
        return x
    if use_pallas is not False:
        from . import poseidon as dpos
        if ((use_pallas or dpos._pallas_enabled())
                and n >= 2 and (n & (n - 1)) == 0):
            from . import ntt_pallas
            if ntt_pallas.pallas_ntt_supported(n):
                if use_pallas:  # forced: no fallback (kernel cross-checks)
                    return ntt_pallas.ntt(x, inverse)
                out = _pallas_route(x, n, inverse)
                if out is not None:
                    return out
    if isinstance(x, jax.core.Tracer):
        # inside an outer trace (vmap/shard_map four-step): inline the ops
        rev, tws = _plan(n, inverse)
        x = jnp.take(x, rev, axis=0)
        x = _butterflies(x, tws)
        if inverse:
            n_inv = pow(n % P, P - 2, P)
            x = fr.mont_mul(
                x, jnp.asarray(fr.pack_int(n_inv, mont=True))[None, :])
        return x
    return _xla_ntt_jit(n, inverse)(x)


def intt(x):
    return ntt(x, inverse=True)


# ---------------------------------------------------------------------------
# Chunked-I/O wrappers: the transform runs as ONE jit (Pallas route when
# supported), but client-visible inputs/outputs stay <= chunk-sized
# buffers.  The axon remote wedges on eager in/out buffers >= 32 MiB
# while XLA-INTERNAL intermediates of any size are fine, so 2^20..2^22
# transforms must cross the client boundary in pieces.
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _ntt_chunked_jit(n: int, S: int, inverse: bool, pallas: bool):
    def fn(chs):
        x = jnp.concatenate(chs, axis=0)
        if pallas:
            from . import ntt_pallas
            y = ntt_pallas.ntt(x, inverse)
        else:
            rev, tws = _plan(n, inverse)
            y = jnp.take(x, rev, axis=0)
            y = _butterflies(y, tws)
            if inverse:
                n_inv = pow(n % P, P - 2, P)
                y = fr.mont_mul(
                    y, jnp.asarray(fr.pack_int(n_inv, mont=True))[None, :])
        return tuple(y[i * S:(i + 1) * S] for i in range(n // S))

    return jax.jit(fn)


def ntt_chunked(chunks, inverse: bool = False,
                use_pallas: bool | None = None):
    """NTT of the logical concatenation of `chunks` (equal [S,16] rows),
    returned as same-shape chunks.  Bit-exact with `ntt`."""
    S = int(chunks[0].shape[0])
    n = sum(int(c.shape[0]) for c in chunks)
    assert n % S == 0
    if use_pallas is None:
        from . import poseidon as dpos
        from . import ntt_pallas
        use_pallas = (dpos._pallas_enabled()
                      and ntt_pallas.pallas_ntt_supported(n))
    return list(_ntt_chunked_jit(n, S, inverse, bool(use_pallas))(
        tuple(chunks)))


@lru_cache(maxsize=None)
def _lde_chunked_jit(n: int, S: int, blowup: int, coset_shift,
                     pallas: bool):
    def fn(chs):
        x = jnp.concatenate(chs, axis=0)
        if pallas:
            from . import ntt_pallas
            coeffs = ntt_pallas.ntt(x, True)
        else:
            rev, tws = _plan(n, True)
            coeffs = _butterflies(jnp.take(x, rev, axis=0), tws)
            n_inv = pow(n % P, P - 2, P)
            coeffs = fr.mont_mul(
                coeffs, jnp.asarray(fr.pack_int(n_inv, mont=True))[None, :])
        if coset_shift is not None:
            sh = fr.powers(jnp.asarray(fr.pack_int(coset_shift, mont=True)),
                           n)
            coeffs = fr.mont_mul(coeffs, sh)
        m = n * blowup
        if blowup > 1:
            coeffs = jnp.concatenate(
                [coeffs, jnp.zeros(((blowup - 1) * n, fr.N), dtype=fr.U32)],
                axis=0)
        if pallas:
            from . import ntt_pallas
            y = ntt_pallas.ntt(coeffs, False)
        else:
            rev, tws = _plan(m, False)
            y = _butterflies(jnp.take(coeffs, rev, axis=0), tws)
        return tuple(y[i * S:(i + 1) * S] for i in range(m // S))

    return jax.jit(fn)


def lde_chunked(chunks, blowup: int, coset_shift: int | None = None,
                use_pallas: bool | None = None):
    """`lde` with chunked in/out (output has n*blowup/S chunks)."""
    S = int(chunks[0].shape[0])
    n = sum(int(c.shape[0]) for c in chunks)
    if use_pallas is None:
        from . import poseidon as dpos
        from . import ntt_pallas
        use_pallas = (dpos._pallas_enabled()
                      and ntt_pallas.pallas_ntt_supported(n)
                      and ntt_pallas.pallas_ntt_supported(n * blowup))
    return list(_lde_chunked_jit(n, S, blowup, coset_shift,
                                 bool(use_pallas))(tuple(chunks)))


def lde(values, blowup: int, coset_shift: int | None = None):
    """Low-degree extension: evaluations on H (size n) -> evaluations on a
    (coset of a) domain of size n*blowup.

    coset_shift g rescales coefficients by g^i so the output is p(g*x) on
    the larger subgroup, i.e. evaluations on the coset gK.
    """
    n = int(values.shape[0])
    assert blowup >= 1 and blowup & (blowup - 1) == 0
    coeffs = intt(values)
    if coset_shift is not None:
        sh = fr.powers(jnp.asarray(fr.pack_int(coset_shift, mont=True)), n)
        coeffs = fr.mont_mul(coeffs, sh)
    if blowup > 1:
        coeffs = jnp.concatenate(
            [coeffs, jnp.zeros(((blowup - 1) * n, fr.N), dtype=fr.U32)],
            axis=0)
    return ntt(coeffs)


# ---------------------------------------------------------------------------
# Four-step decomposition (the multi-chip layout: NTT of n = n1*n2 as
# column transforms -> twiddle scale -> transpose -> row transforms).
# Used by parallel.ntt_sharded with all_to_all transposes over ICI.
# ---------------------------------------------------------------------------

def ntt_four_step(x, n1: int, n2: int):
    """Single-chip reference of the four-step NTT: x [n1*n2, 16] in order.

    X[j1 + n1*j2] = sum_i x[i] w^(i*(j1+n1*j2)) decomposed with
    i = i1*n2 + i2:  inner NTTs of the n2 columns (size n1), twiddle by
    w^(i2*j1), then NTTs of the n1 rows (size n2).
    """
    n = n1 * n2
    assert int(x.shape[0]) == n
    omega = get_root_of_unity(n)
    # columns: fix i2, transform over i1 (stride n2)
    cols = x.reshape(n1, n2, fr.N)
    cols = jnp.swapaxes(cols, 0, 1)               # [n2, n1, 16]
    cols = jax.vmap(lambda v: ntt(v))(cols)       # size-n1 transforms
    # twiddle: factor w^(i2*j1), i2 row index, j1 output of column NTT
    tw = [pow(omega, (i2 * j1), P) for i2 in range(n2) for j1 in range(n1)]
    tw_dev = jnp.asarray(fr.pack_ints(tw, mont=True)).reshape(n2, n1, fr.N)
    cols = fr.mont_mul(cols, tw_dev)
    # rows: transpose to [n1, n2], transform size n2
    rows = jnp.swapaxes(cols, 0, 1)               # [n1, n2, 16]
    rows = jax.vmap(lambda v: ntt(v))(rows)
    # output element (j1, j2) lives at rows[j1 transposed]: X[j1 + n1*j2]
    out = jnp.swapaxes(rows, 0, 1).reshape(n, fr.N)
    return out

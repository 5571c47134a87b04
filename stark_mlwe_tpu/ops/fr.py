"""Pallas-curve scalar field Fr on TPU: 16x16-bit limb vectors in uint32.

Device-side arithmetic for the field the reference uses everywhere
(`ark_pallas::Fr`, /root/reference/crates/field/src/lib.rs:13).  This is a
TPU-first design, not a port: elements are length-16 little-endian limb
vectors of 16-bit digits held in uint32 lanes, so every 16x16->32-bit
partial product is exact in the TPU's native 32-bit integer units, and all
hot loops are batched elementwise VPU work that XLA fuses.

Representation
  - canonical limbs: value in [0, P), limbs[k] = (x >> 16k) & 0xffff
  - Montgomery form: x_hat = x * 2^256 mod P (same radix ark-ff uses for
    4x64 limbs, so host<->device conversion is exact and cheap)

Internally every routine manipulates a *list* of u32 limb columns (one
array per radix-2^16 digit) instead of a stacked trailing axis: that keeps
the XLA graph pure elementwise adds/muls/shifts with no
dynamic-update-slice chains, which both compiles ~100x faster and fuses
better.  Public entry points take/return stacked [..., 16] arrays.

Key kernels
  - mont_mul:  product-scan Montgomery multiply.  Phase 1 accumulates the
    512-bit schoolbook product as 32 relaxed radix-2^16 coefficients
    (lo/hi split keeps every accumulator < 2^26); phase 2 is a 16-step
    REDC with lazily normalized limbs.  No 64-bit arithmetic anywhere.
  - mat_apply: fused linear-map-then-reduce for constant matrices
    (Poseidon MDS):  T = sum_j A[i,j] * s[j] is accumulated *before*
    reduction (coefficients < 2^26), then ONE extended REDC dividing by
    2^272 (17 steps) reduces the whole row sum.  Matrix constants must be
    pre-scaled by 2^272 (see `mat_scale`) so Montgomery form is preserved.
    This replaces t Montgomery reductions + t modular adds per output
    element with a single reduction - the core trick that makes Poseidon's
    t x t MDS cheap on the VPU.
  - batch_inv: Montgomery's trick via two `lax.associative_scan` prefix
    products + one Fermat inversion (the reference does per-element
    inversion in its hot path, deep_ali/src/lib.rs:40,100 - we must not).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..spec.field import P

U32 = jnp.uint32
N = 16            # limbs per element
BITS = 16         # bits per limb
MASK = 0xFFFF

R_MONT = (1 << 256) % P
R2_MONT = (R_MONT * R_MONT) % P
R_INV = pow(R_MONT, P - 2, P)
# -P^{-1} mod 2^16 (P's low limb is 1, so this is 0xFFFF; computed anyway).
N0INV = (-pow(P, -1, 1 << BITS)) % (1 << BITS)

# Extended-REDC radix for fused matrix-apply reduction: divides by 2^272.
NRED_MAT = N + 1
MAT_SCALE = pow(2, BITS * NRED_MAT, P)


def _limbs_of(x: int) -> list:
    return [(x >> (BITS * k)) & MASK for k in range(N)]


P_LIMBS_PY = _limbs_of(P)
P_LIMBS = jnp.array(P_LIMBS_PY, dtype=U32)
ONE = jnp.array(_limbs_of(1), dtype=U32)                 # canonical 1
MONT_ONE = jnp.array(_limbs_of(R_MONT), dtype=U32)       # Montgomery 1
R2 = jnp.array(_limbs_of(R2_MONT), dtype=U32)


# ---------------------------------------------------------------------------
# Host <-> device packing.
# ---------------------------------------------------------------------------

def pack_ints(xs, mont: bool = False) -> np.ndarray:
    """Canonical ints -> [n, 16] uint32 limbs (optionally Montgomery form).

    The Montgomery scale (x * 2^256 mod P per element) runs in the native
    C++ kernel for large batches — the per-element Python modmul was
    ~2 us/value and dominated witness packing at k >= 16."""
    if mont and len(xs) >= 1024:
        from .. import native
        if native.available():
            lib = native._get_lib()
            buf = b"".join(int(x % P).to_bytes(32, "little") for x in xs)
            arr = np.frombuffer(buf, dtype=np.uint64).copy()
            lib.fr_to_mont_batch(native._u64p(arr), len(xs),
                                 native._u64p(native._R2_LIMBS))
            a = np.frombuffer(arr.tobytes(), dtype="<u2").reshape(len(xs), N)
            return a.astype(np.uint32)
    if mont:
        xs = [x * R_MONT % P for x in xs]
    buf = b"".join(int(x % P).to_bytes(32, "little") for x in xs)
    a = np.frombuffer(buf, dtype="<u2").reshape(len(xs), N)
    return a.astype(np.uint32)


def unpack_ints(arr, mont: bool = False) -> list:
    """[..., 16] limbs -> flat list of canonical ints."""
    a = np.asarray(arr).reshape(-1, N).astype("<u2")
    buf = a.tobytes()
    out = [int.from_bytes(buf[32 * i:32 * i + 32], "little")
           for i in range(a.shape[0])]
    if mont:
        out = [x * R_INV % P for x in out]
    return out


def pack_int(x: int, mont: bool = False) -> np.ndarray:
    return pack_ints([x], mont=mont)[0]


def pack_u64s(vals) -> np.ndarray:
    """u64 value array -> [n, 16] canonical limbs (no reduction needed)."""
    v = np.asarray(vals, dtype=np.uint64).reshape(-1)
    out = np.zeros((v.shape[0], N), np.uint32)
    for k in range(4):
        out[:, k] = ((v >> np.uint64(BITS * k))
                     & np.uint64(MASK)).astype(np.uint32)
    return out


# ---------------------------------------------------------------------------
# Limb-column helpers (internal representation: list of u32 arrays).
# ---------------------------------------------------------------------------

def _cols(a):
    """Stacked [..., 16] -> list of 16 limb columns."""
    return [a[..., k] for k in range(N)]


def _stacked(cols):
    return jnp.stack(cols, axis=-1)


def _norm(cols):
    """Carry-propagate relaxed columns; returns (normalized columns, carry)."""
    out = []
    c = None
    for v in cols:
        s = v if c is None else v + c
        out.append(s & MASK)
        c = s >> BITS
    return out, c


def _cond_sub_p_cols(cols):
    """cols normalized, value in [0, 2P) -> canonical columns."""
    borrow = None
    d = []
    for k in range(N):
        s = cols[k] + jnp.uint32(0x10000 - P_LIMBS_PY[k])
        if borrow is not None:
            s = s - borrow
        d.append(s & MASK)
        borrow = 1 - (s >> BITS)
    ge = borrow == 0
    return [jnp.where(ge, d[k], cols[k]) for k in range(N)]


def cond_sub_p(r):
    return _stacked(_cond_sub_p_cols(_cols(r)))


def _add_cols(ac, bc):
    s = [ac[k] + bc[k] for k in range(N)]
    out, _ = _norm(s)
    return _cond_sub_p_cols(out)


def _sub_cols(ac, bc):
    s = [ac[k] + jnp.uint32(P_LIMBS_PY[k]) for k in range(N)]
    t, _ = _norm(s)
    borrow = None
    out = []
    for k in range(N):
        v = t[k] + jnp.uint32(0x10000) - bc[k]
        if borrow is not None:
            v = v - borrow
        out.append(v & MASK)
        borrow = 1 - (v >> BITS)
    return _cond_sub_p_cols(out)


def _redc_cols(T, nred):
    """REDC on a relaxed accumulator column list (each entry < 2^26):
    divides by 2^(16*nred) mod P; returns canonical columns."""
    for i in range(nred):
        c = T[i] >> BITS
        ti = T[i] & MASK
        T[i + 1] = T[i + 1] + c
        m = (ti * jnp.uint32(N0INV)) & MASK
        for k in range(N):
            pk = P_LIMBS_PY[k]
            if pk == 0:
                continue
            prod = m * jnp.uint32(pk)
            lo = prod & MASK
            hi = prod >> BITS
            if k == 0:
                c0 = (ti + lo) >> BITS
                T[i + 1] = T[i + 1] + c0
            else:
                T[i + k] = T[i + k] + lo
            T[i + k + 1] = T[i + k + 1] + hi
    out, _ = _norm(T[nred:nred + N + 1])
    # top limb is provably zero (result < 2P < 2^256)
    return _cond_sub_p_cols(out[:N])


def _zeros_like_bcast(shape_arrs, n):
    shape = jnp.broadcast_shapes(*[a.shape for a in shape_arrs])
    z = jnp.zeros(shape, dtype=U32)
    return [z] * n


def _mul_cols(ac, b_stacked):
    """Phase-1 product scan: ac (columns) x b (stacked [..., 16])."""
    nT = 2 * N + 1
    T = [None] * nT
    for i in range(N):
        prod = ac[i][..., None] * b_stacked
        lo = prod & MASK
        hi = prod >> BITS
        for k in range(N):
            lok = lo[..., k]
            hik = hi[..., k]
            T[i + k] = lok if T[i + k] is None else T[i + k] + lok
            T[i + k + 1] = hik if T[i + k + 1] is None else T[i + k + 1] + hik
    if T[nT - 1] is None:  # unreachable, but keep the list dense
        T[nT - 1] = jnp.zeros_like(T[0])
    return T


# ---------------------------------------------------------------------------
# Public modular ops (stacked [..., 16] in and out).
# ---------------------------------------------------------------------------

@jax.jit
def add(a, b):
    """Canonical modular addition."""
    a, b = jnp.broadcast_arrays(a, b)
    return _stacked(_add_cols(_cols(a), _cols(b)))


@jax.jit
def sub(a, b):
    """Canonical modular subtraction: a + P - b."""
    a, b = jnp.broadcast_arrays(a, b)
    return _stacked(_sub_cols(_cols(a), _cols(b)))


@jax.jit
def neg(a):
    return sub(jnp.zeros_like(a), a)


# ---------------------------------------------------------------------------
# Graph-compact (lax.scan) variants.
#
# The fully unrolled limb graphs above are what XLA:TPU fuses best, but on
# CPU (the virtual-mesh test/dryrun platform) they blow up compile time:
# every mont_mul instantiation is ~2.5k HLO ops and the sharded prove step
# reaches ~200k ops (tens of minutes of XLA:CPU compile per topology).
# The scan forms below express the same arithmetic as 16/17-step loops
# with ~30-op bodies - bit-identical results, ~20x smaller graphs.
# Dispatch is per-backend at trace time.
# ---------------------------------------------------------------------------

P_ROW = jnp.array(P_LIMBS_PY, dtype=U32)


# Import-time only: the choice is frozen into every jit trace cache, so a
# post-import toggle of the env var would silently have no effect.
_COMPACT_MODE = __import__("os").environ.get("STARK_MLWE_COMPACT_GRAPH",
                                             "auto")


def _compact() -> bool:
    if _COMPACT_MODE in ("0", "1"):
        return _COMPACT_MODE == "1"
    try:
        return jax.default_backend() != "tpu"
    except Exception:
        return False


def _pad_last(x, total: int, lead: int = 0):
    """Place x's last-axis entries at offset `lead` in a `total`-wide axis."""
    z = lambda k: jnp.zeros(x.shape[:-1] + (k,), dtype=x.dtype)
    parts = ([z(lead)] if lead else []) + [x]
    tail = total - lead - x.shape[-1]
    if tail:
        parts.append(z(tail))
    return jnp.concatenate(parts, axis=-1)


def _mont_mul_compact(a, b):
    """CIOS Montgomery multiply as a 16-step lax.scan (radix 2^16).

    Relaxed [..., 18] accumulator; per step: add a_i*b and m*P at offsets
    0/1, resolve the low limb, shift down.  Entry bound: <= 16 steps x
    ~2^18 < 2^23; products a_i*b < 2^32 exact in uint32.
    """
    a, b = jnp.broadcast_arrays(a, b)
    nT = N + 2
    a_limbs = jnp.moveaxis(a, -1, 0)                    # [16, ...]

    def step(T, ai):
        prod = ai[..., None] * b                        # [..., 16]
        T = (T + _pad_last(prod & MASK, nT)
             + _pad_last(prod >> BITS, nT, 1))
        m = (T[..., 0] * jnp.uint32(N0INV)) & MASK
        mp = m[..., None] * P_ROW
        T = (T + _pad_last(mp & MASK, nT)
             + _pad_last(mp >> BITS, nT, 1))
        carry = T[..., 0] >> BITS
        T = jnp.concatenate(
            [(T[..., 1] + carry)[..., None], T[..., 2:],
             jnp.zeros_like(T[..., :1])], axis=-1)
        return T, None

    T0 = jnp.zeros(a.shape[:-1] + (nT,), dtype=U32)
    T, _ = jax.lax.scan(step, T0, a_limbs)
    out, _ = _norm([T[..., k] for k in range(N + 1)])
    return _stacked(_cond_sub_p_cols(out[:N]))


def _redc_scan(T, nred: int):
    """Extended REDC (divide by 2^(16*nred)) as a lax.scan.

    T: [..., nT] relaxed accumulator (entries < 2^26); returns canonical
    [..., 16].  Same per-step algebra as _redc_cols.
    """
    nT = T.shape[-1]

    def step(T, _):
        m = (T[..., 0] * jnp.uint32(N0INV)) & MASK
        mp = m[..., None] * P_ROW
        T = (T + _pad_last(mp & MASK, nT)
             + _pad_last(mp >> BITS, nT, 1))
        carry = T[..., 0] >> BITS
        T = jnp.concatenate(
            [(T[..., 1] + carry)[..., None], T[..., 2:],
             jnp.zeros_like(T[..., :1])], axis=-1)
        return T, None

    T, _ = jax.lax.scan(step, T, None, length=nred)
    out, _ = _norm([T[..., k] for k in range(N + 1)])
    return _stacked(_cond_sub_p_cols(out[:N]))


def _mat_apply_compact(A, s):
    """mat_apply as a Horner scan over the 16 constant limb planes plus a
    17-step REDC scan.  A: [to, ti, 16] pre-scaled (mat_scale); bound:
    row sums <= ti*2^16 < 2^24, Horner accumulation < 2^26."""
    nT = NRED_MAT + N + 1
    As = jnp.moveaxis(A, 2, 0)[::-1]                    # [16, to, ti] desc

    def phase(T, Al):
        prod = Al[:, :, None] * s[..., None, :, :]      # [..., to, ti, 16]
        lo = (prod & MASK).sum(axis=-2, dtype=U32)      # [..., to, 16]
        hi = (prod >> BITS).sum(axis=-2, dtype=U32)
        upd = _pad_last(lo, nT) + _pad_last(hi, nT, 1)
        T = jnp.concatenate(
            [jnp.zeros_like(T[..., :1]), T[..., :-1]], axis=-1)
        return T + upd, None

    to = A.shape[0]
    T0 = jnp.zeros(s.shape[:-2] + (to, nT), dtype=U32)
    T, _ = jax.lax.scan(phase, T0, As)
    return _redc_scan(T, NRED_MAT)


@jax.jit
def mont_mul(a, b):
    """Montgomery product  a * b * 2^-256 mod P  (canonical limbs out)."""
    if _compact():
        return _mont_mul_compact(a, b)
    a, b = jnp.broadcast_arrays(a, b)
    T = _mul_cols(_cols(a), b)
    return _stacked(_redc_cols(T, N))


@jax.jit
def mont_sqr(a):
    return mont_mul(a, a)


@jax.jit
def pow5(a):
    """x^5 via 2 squarings + 1 multiply (Poseidon S-box exponent)."""
    a2 = mont_mul(a, a)
    a4 = mont_mul(a2, a2)
    return mont_mul(a4, a)


# ---------------------------------------------------------------------------
# Fused constant-matrix apply (Poseidon MDS rides this).
# ---------------------------------------------------------------------------

def mat_scale(rows) -> np.ndarray:
    """Pre-scale a canonical constant matrix for `mat_apply`.

    Entries are stored as  M * 2^272 mod P  so that the 17-step REDC in
    `mat_apply` returns Montgomery-form results for Montgomery-form inputs.
    rows: nested list [to][ti] of canonical ints -> [to, ti, 16] uint32.
    """
    to = len(rows)
    flat = [v * MAT_SCALE % P for row in rows for v in row]
    return pack_ints(flat).reshape(to, len(rows[0]), N)


@jax.jit
def mat_apply(A, s):
    """out[..., i, :] = sum_j A[i, j] * s[..., j, :]  (mod P, Montgomery).

    A: [to, ti, 16] constants pre-scaled with `mat_scale`.
    s: [..., ti, 16] Montgomery-form elements.
    The row sum is accumulated unreduced (coefficients < 2^26) and reduced
    once with an extended 17-step REDC - one reduction per output element
    instead of ti.
    """
    if _compact():
        return _mat_apply_compact(A, s)
    nT = NRED_MAT + N + 1
    T = [None] * nT
    for l in range(N):
        # [..., to, ti, 16] = A[i,j,l] * s[..., j, :]
        prod = A[:, :, l][:, :, None] * s[..., None, :, :]
        lo = (prod & MASK).sum(axis=-2, dtype=U32)
        hi = (prod >> BITS).sum(axis=-2, dtype=U32)
        for k in range(N):
            lok = lo[..., k]
            hik = hi[..., k]
            T[l + k] = lok if T[l + k] is None else T[l + k] + lok
            T[l + k + 1] = (hik if T[l + k + 1] is None
                            else T[l + k + 1] + hik)
    z = jnp.zeros_like(T[0])
    T = [z if t is None else t for t in T]
    return _stacked(_redc_cols(T, NRED_MAT))


# ---------------------------------------------------------------------------
# Exponentiation / inversion.
# ---------------------------------------------------------------------------

_INV_EXP_BITS = jnp.array([(P - 2) >> i & 1 for i in range(255)], dtype=U32)


@jax.jit
def inv(x):
    """Fermat inversion x^(P-2) via a fori_loop square-and-multiply.

    Montgomery in, Montgomery out.  O(1) graph size; used once per
    `batch_inv`, so the 255 sequential steps are off the hot path.
    """
    res0 = jnp.broadcast_to(MONT_ONE, x.shape)

    def body(i, carry):
        res, base = carry
        bit = _INV_EXP_BITS[i]
        mul = mont_mul(res, base)
        res = jnp.where(bit == 1, mul, res)
        base = mont_mul(base, base)
        return res, base

    res, _ = jax.lax.fori_loop(0, 255, body, (res0, x))
    return res


@jax.jit
def batch_inv(x):
    """Elementwise inverse of x: [n, 16] (all nonzero), Montgomery form.

    Montgomery's trick: out[i] = prefix_ex[i] * suffix_ex[i] * inv(total).
    On TPU the prefix/suffix products are log-depth associative scans; on
    CPU (virtual-mesh tests) sequential lax.scans keep the graph ~200x
    smaller (the associative form instantiates the 2.5k-op mont_mul ~40x).
    """
    if _compact():
        def fwd(c, xi):
            nc = mont_mul(c, xi)
            return nc, c                       # exclusive prefix

        total, pp_ex = jax.lax.scan(fwd, MONT_ONE, x)
        total_inv = inv(total)

        def bwd(c, args):
            xi, pi = args
            out = mont_mul(c, pi)
            return mont_mul(c, xi), out

        _, out_rev = jax.lax.scan(bwd, total_inv, (x[::-1], pp_ex[::-1]))
        return out_rev[::-1]
    pp = jax.lax.associative_scan(mont_mul, x, axis=0)
    sp = jax.lax.associative_scan(mont_mul, x, axis=0, reverse=True)
    total_inv = inv(pp[-1])
    ones = jnp.broadcast_to(MONT_ONE, (1, N))
    pp_ex = jnp.concatenate([ones, pp[:-1]], axis=0)
    sp_ex = jnp.concatenate([sp[1:], ones], axis=0)
    return mont_mul(mont_mul(pp_ex, sp_ex), total_inv[None, :])


@partial(jax.jit, static_argnums=1)
def powers(base, n: int):
    """[1, base, ..., base^(n-1)] in Montgomery form; base: [16] Montgomery."""
    if _compact():
        def step(c, _):
            return mont_mul(c, base), c

        _, out = jax.lax.scan(step, MONT_ONE, None, length=n)
        return out
    arr = jnp.concatenate(
        [MONT_ONE[None, :], jnp.broadcast_to(base, (n - 1, N))], axis=0)
    return jax.lax.associative_scan(mont_mul, arr, axis=0)


@jax.jit
def reduce_add(x):
    """Modular sum over axis 0 of x: [n, 16] -> [16] (halving tree)."""
    n = x.shape[0]
    m = 1
    while m < n:
        m *= 2
    if m != n:
        pad = jnp.zeros((m - n, N), dtype=U32)
        x = jnp.concatenate([x, pad], axis=0)
    while m > 1:
        m //= 2
        x = add(x[:m], x[m:])
    return x[0]


@jax.jit
def to_mont(x):
    """Canonical limbs -> Montgomery limbs."""
    return mont_mul(x, jnp.broadcast_to(R2, x.shape))


@jax.jit
def from_mont(x):
    """Montgomery limbs -> canonical limbs."""
    return mont_mul(x, jnp.broadcast_to(ONE, x.shape))

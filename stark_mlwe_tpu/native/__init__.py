"""ctypes loader for the native host-side Poseidon kernel.

Compiles `poseidon.cpp` on first use (g++ -O3 -shared).  All values cross
the boundary as Montgomery 4x64 u64 limbs; parameter packs are cached per
spec `PoseidonParams` object.  Falls back gracefully (available() False)
if no compiler is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from ..spec.field import P
from ..spec.poseidon import PoseidonParams

_R = (1 << 256) % P
_R_INV = pow(_R, P - 2, P)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "poseidon.cpp")
_SO = os.path.join(_DIR, "libposeidon.so")
_IFMA_SRC = os.path.join(_DIR, "poseidon_ifma.cpp")
_IFMA_SO = os.path.join(_DIR, "libposeidon_ifma.so")

_lib = None
_load_failed = False
_ifma_lib = None
_ifma_failed = False


def _build():
    subprocess.run(
        ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
         "-o", _SO, _SRC],
        check=True, capture_output=True)


def _build_ifma():
    # explicit ISA flags: the .so must COMPILE even on hosts where
    # -march=native lacks AVX-512; ifma_cpu_supported() gates execution.
    subprocess.run(
        ["g++", "-O3", "-march=native", "-mavx512f", "-mavx512vl",
         "-mavx512dq", "-mavx512ifma", "-shared", "-fPIC",
         "-o", _IFMA_SO, _IFMA_SRC],
        check=True, capture_output=True)


def _get_ifma():
    """The AVX-512 IFMA engine, or None (unsupported CPU / no compiler).

    STARK_NO_IFMA=1 disables it (falls back to the scalar kernel)."""
    global _ifma_lib, _ifma_failed
    if _ifma_lib is not None or _ifma_failed:
        return _ifma_lib
    if os.environ.get("STARK_NO_IFMA"):
        _ifma_failed = True
        return None
    try:
        if (not os.path.exists(_IFMA_SO)
                or os.path.getmtime(_IFMA_SO) < os.path.getmtime(_IFMA_SRC)):
            _build_ifma()
        lib = ctypes.CDLL(_IFMA_SO)
        lib.ifma_cpu_supported.restype = ctypes.c_int
        if not lib.ifma_cpu_supported():
            _ifma_failed = True
            return None
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.ifma_permute_batch.argtypes = [
            u64p, ctypes.c_long, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u64p, u64p, u64p, u64p, u64p, u64p]
        lib.ifma_hash_ds_batch.argtypes = [
            u64p, ctypes.c_long, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, u64p, u64p, u64p, u64p, u64p, u64p, u64p]
        lib.ifma_absorb_chains.argtypes = [
            u64p, u64p, ctypes.c_long, ctypes.c_long, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u64p, u64p, u64p, u64p, u64p, u64p]
        lib.ifma_absorb_chains.restype = ctypes.c_int
        _ifma_lib = lib
    except Exception:
        _ifma_failed = True
    return _ifma_lib


def ifma_available() -> bool:
    return _get_ifma() is not None


def _get_lib():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.poseidon_permute_batch_opt.argtypes = [
            u64p, ctypes.c_long, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u64p, u64p, u64p, u64p, u64p, u64p]
        lib.poseidon_hash_ds_dynamic_batch_opt.argtypes = [
            u64p, ctypes.c_long, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, u64p, u64p, u64p, u64p, u64p, u64p, u64p, u64p]
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.poseidon_absorb_chains_opt.argtypes = [
            u64p, u64p, ctypes.c_long, ctypes.c_long, i32p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, u64p, u64p, u64p,
            u64p, u64p, u64p]
        lib.poseidon_factorize.argtypes = [
            u64p, ctypes.c_int, ctypes.c_int, u64p, u64p, u64p, u64p]
        lib.poseidon_factorize.restype = ctypes.c_int
        lib.fr_to_mont_batch.argtypes = [u64p, ctypes.c_long, u64p]
        lib.fr_from_mont_batch.argtypes = [u64p, ctypes.c_long]
        lib.fr_phi_batch.argtypes = [u64p, u64p, u64p, u64p, u64p,
                                     ctypes.c_long]
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def available() -> bool:
    return _get_lib() is not None


def _mont_limbs(x: int) -> list:
    v = x * _R % P
    return [(v >> (64 * i)) & 0xFFFFFFFFFFFFFFFF for i in range(4)]


def _from_mont_limbs(arr) -> int:
    v = int(arr[0]) | int(arr[1]) << 64 | int(arr[2]) << 128 \
        | int(arr[3]) << 192
    return v * _R_INV % P


_MONT_ONE = np.array(_mont_limbs(1), dtype=np.uint64)

_R2 = pow(2, 512, P)
_R2_LIMBS = np.array([( _R2 >> (64 * i)) & 0xFFFFFFFFFFFFFFFF
                      for i in range(4)], dtype=np.uint64)


def _ints_to_mont_buf(values, lib) -> np.ndarray:
    """Canonical ints -> Montgomery 4x64 limb buffer.  The bigint work is
    one `to_bytes` per value (~0.1 us); the modmul by R^2 runs in C++
    (the old per-value Python `x*R % P` was ~2 us/value and dominated
    small native batches)."""
    b = b"".join(v.to_bytes(32, "little") for v in values)
    buf = np.frombuffer(b, dtype=np.uint64).copy()
    lib.fr_to_mont_batch(_u64p(buf), len(values), _u64p(_R2_LIMBS))
    return buf


def _mont_buf_to_ints(buf, lib) -> list:
    """Montgomery 4x64 limb buffer -> canonical ints (in-place demont)."""
    lib.fr_from_mont_batch(_u64p(buf), len(buf) // 4)
    b = buf.tobytes()
    return [int.from_bytes(b[32 * i:32 * i + 32], "little")
            for i in range(len(buf) // 4)]

_params_cache: dict = {}


_MDS_SCALE_320 = pow(2, 320, P)


def _mds320_limbs(x: int) -> list:
    v = x * _MDS_SCALE_320 % P
    return [(v >> (64 * i)) & 0xFFFFFFFFFFFFFFFF for i in range(4)]


def factorize_mds(mds, t: int, rp: int):
    """Partial-round factorization computed in C++ (Montgomery mod-p
    Gauss-Jordan; ~ms for t=17, ~15 s for t=129).  Returns
    (q_rows, q_cols, m_final) as canonical int lists, or None if the
    native library is unavailable or a submatrix was singular."""
    lib = _get_lib()
    if lib is None or rp < 2:
        return None
    m = np.array([l for row in mds for v in row for l in _mont_limbs(v)],
                 dtype=np.uint64)
    qrow = np.zeros((rp - 1) * t * 4, dtype=np.uint64)
    qcol = np.zeros((rp - 1) * (t - 1) * 4, dtype=np.uint64)
    mf = np.zeros(t * t * 4, dtype=np.uint64)
    rcode = lib.poseidon_factorize(_u64p(m), t, rp, _u64p(_MONT_ONE),
                                   _u64p(qrow), _u64p(qcol), _u64p(mf))
    if rcode != 0:
        return None

    def ints(arr, shape_outer):
        a = arr.reshape(-1, 4)
        vals = [_from_mont_limbs(a[i]) for i in range(a.shape[0])]
        per = len(vals) // shape_outer
        return [vals[i * per:(i + 1) * per] for i in range(shape_outer)]

    q_rows = ints(qrow, rp - 1)
    q_cols = ints(qcol, rp - 1)
    mf_rows = ints(mf, t)
    return q_rows, q_cols, mf_rows


def _pack_params(params: PoseidonParams):
    key = id(params)
    if key not in _params_cache:
        # MDS is pre-scaled by 2^320 for the lazy-accumulate + extended
        # REDC path in permute_one (see poseidon.cpp)
        mds = np.array([l for row in params.mds for v in row
                        for l in _mds320_limbs(v)], dtype=np.uint64)
        rcf = np.array([l for row in params.rc_full for v in row
                        for l in _mont_limbs(v)], dtype=np.uint64)
        rcp = np.array([l for v in params.rc_partial
                        for l in _mont_limbs(v)], dtype=np.uint64)
        try:
            from ..spec.poseidon_opt import partial_round_factorization
            fac = partial_round_factorization(params)
            qrow = np.array([l for row in fac.q_rows for v in row
                             for l in _mds320_limbs(v)], dtype=np.uint64)
            # qcol in PLAIN Montgomery scale: the C++ column update uses
            # one CIOS multiply per element (see poseidon.cpp OptFactors)
            qcol = np.array([l for row in fac.q_cols for v in row
                             for l in _mont_limbs(v)], dtype=np.uint64)
            mfin = np.array([l for row in fac.m_final for v in row
                             for l in _mds320_limbs(v)], dtype=np.uint64)
        except Exception:
            qrow = qcol = mfin = None
        _params_cache[key] = (mds, rcf, rcp, qrow, qcol, mfin)
    return _params_cache[key]


_M52 = (1 << 52) - 1
_S312 = pow(2, 312, P)   # lazy-dot constants: six 52-bit REDC rounds
_S260 = pow(2, 260, P)   # mont52 domain (R52 = 2^260)

_ifma_params_cache: dict = {}


def _limbs52(vals, scale) -> np.ndarray:
    out = np.empty(len(vals) * 5, dtype=np.uint64)
    i = 0
    for v in vals:
        x = v * scale % P
        for k in range(5):
            out[i] = (x >> (52 * k)) & _M52
            i += 1
    return out


def _pack_params_ifma(params: PoseidonParams):
    """5x52-limb constant pack for the IFMA engine (see poseidon_ifma.cpp
    for the scale conventions).  Requires the partial-round factorization
    (always derivable for the reference widths)."""
    key = id(params)
    if key not in _ifma_params_cache:
        from ..spec.poseidon_opt import partial_round_factorization
        fac = partial_round_factorization(params)
        mdsS = _limbs52([v for row in params.mds for v in row], _S312)
        rcf = _limbs52([v for row in params.rc_full for v in row], _S260)
        rcp = _limbs52(list(params.rc_partial), _S260)
        qrowS = _limbs52([v for row in fac.q_rows for v in row], _S312)
        qcol = _limbs52([v for row in fac.q_cols for v in row], _S260)
        mfinS = _limbs52([v for row in fac.m_final for v in row], _S312)
        _ifma_params_cache[key] = (mdsS, rcf, rcp, qrowS, qcol, mfinS)
    return _ifma_params_cache[key]


_NULL_U64P = ctypes.POINTER(ctypes.c_uint64)()


def _u64p_opt(a):
    return _NULL_U64P if a is None else a.ctypes.data_as(
        ctypes.POINTER(ctypes.c_uint64))


def _u64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def permute_ints(state, params: PoseidonParams) -> list:
    """Spec-equivalent permutation on canonical ints via the native lib."""
    return permute_ints_batch([state], params)[0]


def permute_ints_batch(states, params: PoseidonParams) -> list:
    """B independent permutations in one native call (IFMA 8-lane engine
    when the CPU supports it, scalar 4x64 otherwise)."""
    lib = _get_lib()
    assert lib is not None
    t = params.t
    buf = _ints_to_mont_buf([v for st in states for v in st], lib)
    ilib = _get_ifma()
    if ilib is not None:
        packs = _pack_params_ifma(params)
        ilib.ifma_permute_batch(
            _u64p(buf), len(states), t, params.rf, params.rp,
            *[_u64p(a) for a in packs])
    else:
        mds, rcf, rcp, qrow, qcol, mfin = _pack_params(params)
        lib.poseidon_permute_batch_opt(
            _u64p(buf), len(states), t, params.rf, params.rp,
            _u64p(mds), _u64p(rcf), _u64p(rcp),
            _u64p_opt(qrow), _u64p_opt(qcol), _u64p_opt(mfin))
    flat = _mont_buf_to_ints(buf, lib)
    return [flat[b * t:(b + 1) * t] for b in range(len(states))]


def u32limbs_to_u64(arr) -> np.ndarray:
    """[n,16] uint32 16-bit limbs -> [n,4] uint64 limbs (pure numpy).

    The limbs are 16-bit values stored one-per-u32, so the conversion is
    a narrowing view-and-repack: 16 LE u16 == 4 LE u64 (one pass; the old
    shift/or loop was ~45 ms per witness column at k=16)."""
    a = np.ascontiguousarray(np.asarray(arr, dtype=np.uint32).reshape(-1, 16))
    b = a.astype("<u2").tobytes()
    return np.frombuffer(b, dtype="<u8").reshape(-1, 4).copy()


def u64_to_u16limbs(arr) -> np.ndarray:
    """[n,4] uint64 limbs -> [n,16] uint16 16-bit limbs (pure numpy).
    uint16 is the upload form: half the h2d bytes of the u32 packing; the
    device casts back to u32 inside the consuming jit."""
    b = np.ascontiguousarray(np.asarray(arr, dtype="<u8")).tobytes()
    return np.frombuffer(b, dtype="<u2").reshape(-1, 16).copy()


def phi_batch_u16(cols_u64):
    """Host DEEP-ALI merge phi = a*s + e - t over Montgomery 4x64 columns;
    returns [n,16] uint16 limbs ready for a half-width device upload, or
    None when the native library is unavailable."""
    lib = _get_lib()
    if lib is None:
        return None
    a64, s64, e64, t64 = (np.ascontiguousarray(c, dtype=np.uint64)
                          for c in cols_u64)
    n = a64.shape[0]
    out = np.empty((n, 4), np.uint64)
    lib.fr_phi_batch(_u64p(a64), _u64p(s64), _u64p(e64), _u64p(t64),
                     _u64p(out), n)
    return u64_to_u16limbs(out)


def absorb_chains(states_ints, poss, cols_u64, params: PoseidonParams):
    """C sequential sponge absorb chains (transcript lazy-permute
    semantics).  Routes to the IFMA lane-parallel engine when C <= 8 and
    all cursors agree (the prover's witness-column case); scalar kernel
    otherwise.

    states_ints: list[C] of t-length canonical int states; poss: list[C]
    cursor positions; cols_u64: [C, n, 4] uint64 Montgomery limb columns
    (from `u32limbs_to_u64` of mont-packed data).  Returns (new state int
    lists, new positions).
    """
    lib = _get_lib()
    assert lib is not None
    C = len(states_ints)
    t = params.t
    st = np.array([l for s in states_ints for v in s
                   for l in _mont_limbs(v)], dtype=np.uint64)
    pos = np.array(list(poss), dtype=np.int32)
    cols = np.ascontiguousarray(cols_u64, dtype=np.uint64)
    n = cols.shape[1]
    ilib = _get_ifma()
    if (ilib is not None and C <= 8
            and all(p == poss[0] for p in poss)):
        packs = _pack_params_ifma(params)
        new_pos = ilib.ifma_absorb_chains(
            _u64p(st), _u64p(cols), C, n, int(poss[0]),
            t, params.rf, params.rp, *[_u64p(a) for a in packs])
        assert new_pos >= 0
        pos[:] = new_pos
    else:
        mds, rcf, rcp, qrow, qcol, mfin = _pack_params(params)
        lib.poseidon_absorb_chains_opt(
            _u64p(st), _u64p(cols), C, n,
            pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            t, params.rf, params.rp, _u64p(mds), _u64p(rcf), _u64p(rcp),
            _u64p_opt(qrow), _u64p_opt(qcol), _u64p_opt(mfin))
    out_states = [[_from_mont_limbs(st[(c * t + i) * 4:(c * t + i) * 4 + 4])
                   for i in range(t)] for c in range(C)]
    return out_states, [int(p) for p in pos]


def hash_ds_dynamic_rows(rows, params: PoseidonParams) -> list:
    """Batch of `hash_with_ds_dynamic` calls: rows is a list of equal-length
    field lists (DS preamble already prepended); returns digests.  Runs 8
    rows per instruction stream on the IFMA engine when available."""
    lib = _get_lib()
    assert lib is not None
    B = len(rows)
    nfields = len(rows[0])
    buf = _ints_to_mont_buf([v for row in rows for v in row], lib)
    out = np.zeros(B * 4, dtype=np.uint64)
    ilib = _get_ifma()
    if ilib is not None:
        packs = _pack_params_ifma(params)
        ilib.ifma_hash_ds_batch(
            _u64p(buf), B, nfields, params.t, params.rf, params.rp,
            *[_u64p(a) for a in packs], _u64p(out))
    else:
        mds, rcf, rcp, qrow, qcol, mfin = _pack_params(params)
        lib.poseidon_hash_ds_dynamic_batch_opt(
            _u64p(buf), B, nfields, params.t, params.rf, params.rp,
            _u64p(mds), _u64p(rcf), _u64p(rcp), _u64p(_MONT_ONE), _u64p(out),
            _u64p_opt(qrow), _u64p_opt(qcol), _u64p_opt(mfin))
    return _mont_buf_to_ints(out, lib)

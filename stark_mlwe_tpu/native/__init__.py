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

_lib = None
_load_failed = False


def _build():
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
        check=True, capture_output=True)


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
        lib.poseidon_permute_batch.argtypes = [
            u64p, ctypes.c_long, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u64p, u64p, u64p]
        lib.poseidon_hash_ds_dynamic_batch.argtypes = [
            u64p, ctypes.c_long, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, u64p, u64p, u64p, u64p, u64p]
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

_params_cache: dict = {}


def _pack_params(params: PoseidonParams):
    key = id(params)
    if key not in _params_cache:
        mds = np.array([l for row in params.mds for v in row
                        for l in _mont_limbs(v)], dtype=np.uint64)
        rcf = np.array([l for row in params.rc_full for v in row
                        for l in _mont_limbs(v)], dtype=np.uint64)
        rcp = np.array([l for v in params.rc_partial
                        for l in _mont_limbs(v)], dtype=np.uint64)
        _params_cache[key] = (mds, rcf, rcp)
    return _params_cache[key]


def _u64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def permute_ints(state, params: PoseidonParams) -> list:
    """Spec-equivalent permutation on canonical ints via the native lib."""
    return permute_ints_batch([state], params)[0]


def permute_ints_batch(states, params: PoseidonParams) -> list:
    """B independent permutations in one native call."""
    lib = _get_lib()
    assert lib is not None
    mds, rcf, rcp = _pack_params(params)
    t = params.t
    buf = np.array([l for st in states for v in st
                    for l in _mont_limbs(v)], dtype=np.uint64)
    lib.poseidon_permute_batch(_u64p(buf), len(states), t, params.rf,
                               params.rp, _u64p(mds), _u64p(rcf), _u64p(rcp))
    return [[_from_mont_limbs(buf[(b * t + i) * 4:(b * t + i) * 4 + 4])
             for i in range(t)] for b in range(len(states))]


def hash_ds_dynamic_rows(rows, params: PoseidonParams) -> list:
    """Batch of `hash_with_ds_dynamic` calls: rows is a list of equal-length
    field lists (DS preamble already prepended); returns digests."""
    lib = _get_lib()
    assert lib is not None
    mds, rcf, rcp = _pack_params(params)
    B = len(rows)
    nfields = len(rows[0])
    buf = np.array([l for row in rows for v in row
                    for l in _mont_limbs(v)], dtype=np.uint64)
    out = np.zeros(B * 4, dtype=np.uint64)
    lib.poseidon_hash_ds_dynamic_batch(
        _u64p(buf), B, nfields, params.t, params.rf, params.rp,
        _u64p(mds), _u64p(rcf), _u64p(rcp), _u64p(_MONT_ONE), _u64p(out))
    return [_from_mont_limbs(out[4 * i:4 * i + 4]) for i in range(B)]

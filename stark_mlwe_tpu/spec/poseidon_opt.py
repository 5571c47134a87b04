"""Optimized partial-round factorization of the Poseidon permutation.

The reference permutation (poseidon/src/lib.rs:31-68) applies the dense
t x t MDS matrix after EVERY round, including the RP partial rounds where
only lane 0 goes through the S-box.  Because the partial-round ARK adds a
constant to lane 0 only (:49-56), the linear algebra of the partial-round
block can be refactored exactly (no approximation -- identical field
values):

  Write M = P @ Q with
      P = [[1, 0], [0, Mhat]]                (dense, does not touch lane 0)
      Q = [[m00, w^T], [Mhat^-1 @ v, I]]     (sparse: 2t-1 multiplies)
  where Mhat = M[1:,1:], w = M[0,1:], v = M[1:,0].

  A partial round is M . S_r where S_r is (ARK + S-box) on lane 0 only.
  P commutes with S_r (P never reads or writes lane 0), so the chain of
  RP partial rounds telescopes to

      M_final . S_rp . Q_{rp-1} . S_{rp-1} . ... . Q_1 . S_1

  with M^(1) = M, M^(i) = P_i @ Q_i, M^(i+1) = M @ P_i, and
  M_final = M^(rp).  Each partial round now costs ~3t multiplies
  (t for the Q row-dot, 2(t-1) for the column update) instead of t^2,
  plus ONE dense matrix at the end of the block.

This module computes the factorization with exact mod-p arithmetic and
provides `permute_opt`, bit-identical to `poseidon.permute`.
"""

from __future__ import annotations

from functools import lru_cache

from .field import P
from .poseidon import PoseidonParams, _sbox5


def _mat_inv_mod_p(m):
    """Exact inverse of a square matrix mod P (Gauss-Jordan).

    Raises ZeroDivisionError if singular.
    """
    n = len(m)
    a = [list(row) + [1 if i == j else 0 for j in range(n)]
         for i, row in enumerate(m)]
    for col in range(n):
        piv = next((r for r in range(col, n) if a[r][col] % P != 0), None)
        if piv is None:
            raise ZeroDivisionError("singular matrix mod p")
        a[col], a[piv] = a[piv], a[col]
        inv = pow(a[col][col], P - 2, P)
        a[col] = [(x * inv) % P for x in a[col]]
        for r in range(n):
            if r != col and a[r][col]:
                f = a[r][col]
                a[r] = [(x - f * y) % P for x, y in zip(a[r], a[col])]
    return [row[n:] for row in a]


def _mat_mul(a, b):
    n, k, m = len(a), len(b), len(b[0])
    bt = [[b[r][c] for r in range(k)] for c in range(m)]
    return [[sum(ar[j] * bc[j] for j in range(k)) % P for bc in bt]
            for ar in a]


class PartialRoundFactors:
    """q_rows[i] (t ints) and q_cols[i] (t-1 ints) for rounds i=0..rp-2,
    plus the dense m_final applied once after the last partial S-box."""

    __slots__ = ("q_rows", "q_cols", "m_final")

    def __init__(self, q_rows, q_cols, m_final):
        self.q_rows = q_rows
        self.q_cols = q_cols
        self.m_final = m_final


_factor_cache: dict = {}

_CACHE_DIR = __import__("os").path.join(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__)),
    "_fac_cache")


def _cache_key(params: PoseidonParams) -> str:
    import hashlib
    h = hashlib.sha256()
    h.update(b"poseidon-fac-v1")
    h.update(params.t.to_bytes(4, "little"))
    h.update(params.rp.to_bytes(4, "little"))
    for row in params.mds:
        for v in row:
            h.update(int(v).to_bytes(32, "little"))
    return f"t{params.t}_rp{params.rp}_{h.hexdigest()[:16]}"


def _ints_to_u64(rows):
    import numpy as np
    out = np.zeros((len(rows), len(rows[0]), 4), dtype=np.uint64)
    for i, row in enumerate(rows):
        for j, v in enumerate(row):
            for k in range(4):
                out[i, j, k] = (int(v) >> (64 * k)) & 0xFFFFFFFFFFFFFFFF
    return out


def _u64_to_ints(arr):
    return [[int(a[0]) | int(a[1]) << 64 | int(a[2]) << 128 | int(a[3]) << 192
             for a in row] for row in arr]


def _factorize_python(params: PoseidonParams):
    t, rp, M = params.t, params.rp, params.mds
    q_rows, q_cols = [], []
    Mi = M
    for _ in range(rp - 1):
        mhat = [row[1:] for row in Mi[1:]]
        w = Mi[0][1:]
        v = [row[0] for row in Mi[1:]]
        mhat_inv = _mat_inv_mod_p(mhat)
        r = [sum(mhat_inv[i][j] * v[j] for j in range(t - 1)) % P
             for i in range(t - 1)]
        q_rows.append([Mi[0][0]] + list(w))
        q_cols.append(r)
        # M^(i+1) = M @ P_i, P_i = blockdiag(1, mhat):
        # col 0 unchanged; cols 1.. = M[:,1:] @ mhat
        right = _mat_mul([row[1:] for row in M], mhat)
        Mi = [[M[i][0]] + right[i] for i in range(t)]
    return q_rows, q_cols, Mi


def partial_round_factorization(params: PoseidonParams) -> PartialRoundFactors:
    """Factorization for `params`, from (in order): process cache, disk
    cache, the native C++ routine, pure Python."""
    import os

    import numpy as np

    key = id(params)
    if key in _factor_cache:
        return _factor_cache[key]
    assert params.rp >= 1, "factorization requires at least one partial round"
    path = os.path.join(_CACHE_DIR, _cache_key(params) + ".npz")
    if os.path.exists(path):
        try:
            z = np.load(path)
            fac = PartialRoundFactors(_u64_to_ints(z["qrow"]),
                                      _u64_to_ints(z["qcol"]),
                                      _u64_to_ints(z["mfinal"]))
            _factor_cache[key] = fac
            return fac
        except Exception:
            # corrupt cache entry (e.g. crash mid-write): recompute
            try:
                os.remove(path)
            except OSError:
                pass
    res = None
    try:
        from .. import native
        if native.available():
            res = native.factorize_mds(params.mds, params.t, params.rp)
    except Exception:
        res = None
    if res is None:
        res = _factorize_python(params)
    fac = PartialRoundFactors(*res)
    try:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        tmp = path + f".tmp.{os.getpid()}"
        np.savez(tmp, qrow=_ints_to_u64(fac.q_rows),
                 qcol=_ints_to_u64(fac.q_cols),
                 mfinal=_ints_to_u64(fac.m_final))
        # np.savez appends .npz when the target lacks it
        os.replace(tmp if tmp.endswith(".npz") else tmp + ".npz", path)
    except Exception:
        pass
    _factor_cache[key] = fac
    return fac


def _apply_q(q_row, q_col, s):
    t = len(s)
    s0 = sum(q_row[j] * s[j] for j in range(t)) % P
    return [s0] + [(s[i] + q_col[i - 1] * s[0]) % P for i in range(1, t)]


def permute_opt(state: list, params: PoseidonParams) -> list:
    """Bit-identical to spec.poseidon.permute, using the factorization."""
    t = params.t
    s = list(state)
    half = params.rf // 2
    mds = params.mds

    def mds_mul(m, v):
        return [sum(m[i][j] * v[j] for j in range(t)) % P for i in range(t)]

    fac = partial_round_factorization(params)
    for r in range(half):
        rc = params.rc_full[r]
        s = mds_mul(mds, [_sbox5((s[i] + rc[i]) % P) for i in range(t)])
    for r in range(params.rp):
        s[0] = _sbox5((s[0] + params.rc_partial[r]) % P)
        if r < params.rp - 1:
            s = _apply_q(fac.q_rows[r], fac.q_cols[r], s)
    s = mds_mul(fac.m_final, s)
    for r in range(half, params.rf):
        rc = params.rc_full[r]
        s = mds_mul(mds, [_sbox5((s[i] + rc[i]) % P) for i in range(t)])
    return s

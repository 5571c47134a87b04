"""Device field arithmetic (ops.fr) vs the pure-int golden spec."""

import random

import numpy as np
import pytest

import jax.numpy as jnp

from stark_mlwe_tpu.ops import fr
from stark_mlwe_tpu.spec.field import P

rng = random.Random(0xF1E1D)


def rand_elems(n):
    return [rng.randrange(P) for _ in range(n)]


def test_pack_unpack_roundtrip():
    xs = rand_elems(17) + [0, 1, P - 1]
    arr = fr.pack_ints(xs)
    assert arr.shape == (20, fr.N)
    assert fr.unpack_ints(arr) == xs
    arr_m = fr.pack_ints(xs, mont=True)
    assert fr.unpack_ints(arr_m, mont=True) == xs


def test_pack_ints_native_threshold():
    # pack_ints(mont=True) routes len >= 1024 to the native
    # fr_to_mont_batch fast path; both sides of the threshold must agree
    # with the scalar Python branch (including edge values 0, 1, P-1).
    xs = [0, 1, P - 1] + rand_elems(1030)
    want = np.asarray([fr._limbs_of(x * fr.R_MONT % P) for x in xs],
                      dtype=np.uint32)
    got_big = fr.pack_ints(xs, mont=True)          # >= 1024: native path
    got_small = fr.pack_ints(xs[:64], mont=True)   # < 1024: scalar path
    assert np.array_equal(got_big, want)
    assert np.array_equal(got_small, want[:64])
    assert fr.unpack_ints(got_big, mont=True) == xs


def test_to_from_mont_device():
    xs = rand_elems(9) + [0, 1, P - 1]
    canon = jnp.asarray(fr.pack_ints(xs))
    m = fr.to_mont(canon)
    assert fr.unpack_ints(m, mont=True) == xs
    back = fr.from_mont(m)
    assert fr.unpack_ints(back) == xs


def test_add_sub_neg():
    n = 64
    a = rand_elems(n)
    b = rand_elems(n)
    a[0], b[0] = P - 1, P - 1
    a[1], b[1] = 0, 0
    da = jnp.asarray(fr.pack_ints(a))
    db = jnp.asarray(fr.pack_ints(b))
    assert fr.unpack_ints(fr.add(da, db)) == [(x + y) % P for x, y in zip(a, b)]
    assert fr.unpack_ints(fr.sub(da, db)) == [(x - y) % P for x, y in zip(a, b)]
    assert fr.unpack_ints(fr.neg(da)) == [(-x) % P for x in a]


def test_mont_mul_and_pow5():
    n = 64
    a = rand_elems(n)
    b = rand_elems(n)
    a[0], b[0] = P - 1, P - 1
    a[1], b[1] = 0, 5
    da = jnp.asarray(fr.pack_ints(a, mont=True))
    db = jnp.asarray(fr.pack_ints(b, mont=True))
    got = fr.unpack_ints(fr.mont_mul(da, db), mont=True)
    assert got == [x * y % P for x, y in zip(a, b)]
    got5 = fr.unpack_ints(fr.pow5(da), mont=True)
    assert got5 == [pow(x, 5, P) for x in a]


def test_mont_mul_broadcast_const():
    xs = rand_elems(8)
    c = rand_elems(1)[0]
    dx = jnp.asarray(fr.pack_ints(xs, mont=True))
    dc = jnp.asarray(fr.pack_int(c, mont=True))
    got = fr.unpack_ints(fr.mont_mul(dc, dx), mont=True)
    assert got == [c * x % P for x in xs]


def test_mat_apply_vs_naive():
    to, ti, B = 5, 7, 3
    M = [[rng.randrange(P) for _ in range(ti)] for _ in range(to)]
    s = [[rng.randrange(P) for _ in range(ti)] for _ in range(B)]
    A = jnp.asarray(fr.mat_scale(M))
    ds = jnp.asarray(
        fr.pack_ints([v for row in s for v in row], mont=True)
    ).reshape(B, ti, fr.N)
    out = fr.mat_apply(A, ds)
    got = fr.unpack_ints(out.reshape(-1, fr.N), mont=True)
    want = [sum(M[i][j] * s[b][j] for j in range(ti)) % P
            for b in range(B) for i in range(to)]
    assert got == want


def test_mat_apply_worst_case_bounds():
    # All-ones limbs maximize accumulator growth: P-1 everywhere.
    to = ti = 17
    M = [[P - 1] * ti for _ in range(to)]
    s = [P - 1] * ti
    A = jnp.asarray(fr.mat_scale(M))
    ds = jnp.asarray(fr.pack_ints(s, mont=True)).reshape(1, ti, fr.N)
    got = fr.unpack_ints(fr.mat_apply(A, ds).reshape(-1, fr.N), mont=True)
    want = [ti * (P - 1) * (P - 1) % P] * to
    assert got == want


def test_inv_and_batch_inv():
    xs = rand_elems(33) + [1, P - 1]
    dx = jnp.asarray(fr.pack_ints(xs, mont=True))
    got = fr.unpack_ints(fr.inv(dx), mont=True)
    assert got == [pow(x, P - 2, P) for x in xs]
    got_b = fr.unpack_ints(fr.batch_inv(dx), mont=True)
    assert got_b == [pow(x, P - 2, P) for x in xs]


def test_powers_and_reduce_add():
    base = rand_elems(1)[0]
    n = 37
    db = jnp.asarray(fr.pack_int(base, mont=True))
    pw = fr.powers(db, n)
    want = [pow(base, k, P) for k in range(n)]
    assert fr.unpack_ints(pw, mont=True) == want
    s = fr.reduce_add(pw)
    assert fr.unpack_ints(s[None, :], mont=True) == [sum(want) % P]

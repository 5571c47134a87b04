"""NTT/iNTT/LDE vs direct O(n^2) evaluation from the golden field spec."""

import random

import jax.numpy as jnp

from stark_mlwe_tpu.ops import fr, ntt
from stark_mlwe_tpu.spec.field import P, get_root_of_unity

rng = random.Random(0x17EE)


def rand_elems(n):
    return [rng.randrange(P) for _ in range(n)]


def naive_ntt(coeffs, n):
    w = get_root_of_unity(n)
    return [sum(c * pow(w, i * j, P) for i, c in enumerate(coeffs)) % P
            for j in range(n)]


def dev(xs):
    return jnp.asarray(fr.pack_ints(xs, mont=True))


def test_ntt_matches_naive():
    for n in (2, 8, 64, 256):
        c = rand_elems(n)
        got = fr.unpack_ints(ntt.ntt(dev(c)), mont=True)
        assert got == naive_ntt(c, n), f"n={n}"


def test_intt_roundtrip():
    n = 128
    c = rand_elems(n)
    evals = ntt.ntt(dev(c))
    back = fr.unpack_ints(ntt.intt(evals), mont=True)
    assert back == c


def test_lde_consistency():
    """LDE values agree with evaluating the interpolant on the big domain."""
    n, blowup = 32, 4
    vals = rand_elems(n)
    big = ntt.lde(dev(vals), blowup)
    got = fr.unpack_ints(big, mont=True)
    # interpolate: coeffs via naive inverse (n small)
    w = get_root_of_unity(n)
    n_inv = pow(n, P - 2, P)
    coeffs = [n_inv * sum(vals[j] * pow(w, -i * j, P) for j in range(n)) % P
              for i in range(n)]
    W = get_root_of_unity(n * blowup)
    want = [sum(c * pow(W, i * j, P) for i, c in enumerate(coeffs)) % P
            for j in range(n * blowup)]
    assert got == want
    # the original points sit at stride `blowup`
    assert got[::blowup] == vals


def test_lde_coset():
    n, blowup, g = 16, 2, 5
    vals = rand_elems(n)
    got = fr.unpack_ints(ntt.lde(dev(vals), blowup, coset_shift=g),
                         mont=True)
    w = get_root_of_unity(n)
    n_inv = pow(n, P - 2, P)
    coeffs = [n_inv * sum(vals[j] * pow(w, -i * j, P) for j in range(n)) % P
              for i in range(n)]
    W = get_root_of_unity(n * blowup)
    want = [sum(c * pow(g, i, P) * pow(W, i * j, P)
                for i, c in enumerate(coeffs)) % P
            for j in range(n * blowup)]
    assert got == want


def test_four_step_matches_flat():
    n1, n2 = 16, 8
    c = rand_elems(n1 * n2)
    flat = fr.unpack_ints(ntt.ntt(dev(c)), mont=True)
    four = fr.unpack_ints(ntt.ntt_four_step(dev(c), n1, n2), mont=True)
    assert four == flat


def test_four_step_matches_flat_2e16():
    """Four-step at production scale (n = 2^16 = 256 x 256), checked
    against the flat radix-2 transform (device-to-device, both paths
    independently verified against the naive transform at small n)."""
    n1 = n2 = 256
    c = rand_elems(n1 * n2)
    flat = ntt.ntt(dev(c))
    four = ntt.ntt_four_step(dev(c), n1, n2)
    import numpy as np
    assert np.array_equal(np.asarray(flat), np.asarray(four))


def test_ntt_2e16_roundtrip():
    n = 1 << 16
    c = rand_elems(n)
    x = dev(c)
    back = ntt.intt(ntt.ntt(x))
    import numpy as np
    assert np.array_equal(np.asarray(back), np.asarray(x))


def test_pallas_route_matches_xla_2e13():
    """Fused four-step Pallas kernel vs the XLA stage-by-stage route
    (ops/ntt_pallas.py); both in-order, forward and inverse.  On CPU the
    Pallas path runs in interpret-free XLA lowering via use_pallas=True
    only when supported; skip if the backend cannot lower it."""
    import jax

    n = 1 << 13
    c = rand_elems(n)
    x = dev(c)
    want = ntt.ntt(x, use_pallas=False)
    if jax.default_backend() != "tpu":
        import pytest
        pytest.skip("pallas NTT kernel route is TPU-only")
    got = ntt.ntt(x, use_pallas=True)
    import numpy as np
    assert np.array_equal(np.asarray(got), np.asarray(want))
    gi = ntt.ntt(got, inverse=True, use_pallas=True)
    assert np.array_equal(np.asarray(gi), np.asarray(x))


def test_pallas_ntt_interpret_matches_xla():
    """Fused four-step Pallas NTT in interpret mode vs the XLA route at
    the smallest supported size (n = 2^12: two 64-point kernel stages);
    covers the paired-limb _mul_bl epilogue path on any backend."""
    from stark_mlwe_tpu.ops import ntt_pallas

    n = 1 << 12
    c = rand_elems(n)
    x = dev(c)
    for inverse in (False, True):
        want = ntt.ntt(x, inverse=inverse, use_pallas=False)
        got = ntt_pallas.ntt(x, inverse=inverse, interpret=True)
        import numpy as np
        assert np.array_equal(np.asarray(got), np.asarray(want)), inverse


def test_ntt_chunked_matches_single():
    """Chunked-I/O wrapper (ops.ntt.ntt_chunked / lde_chunked) vs the
    single-array transforms: same values, split boundaries only."""
    import numpy as np

    import jax.numpy as jnp

    n, S = 1 << 13, 1 << 11
    c = rand_elems(n)
    x = dev(c)
    chunks = [x[i * S:(i + 1) * S] for i in range(n // S)]
    for inverse in (False, True):
        want = ntt.ntt(x, inverse=inverse, use_pallas=False)
        got = jnp.concatenate(
            ntt.ntt_chunked(chunks, inverse=inverse, use_pallas=False),
            axis=0)
        assert np.array_equal(np.asarray(got), np.asarray(want)), inverse
    want = ntt.lde(x, 2)
    got = jnp.concatenate(ntt.lde_chunked(chunks, 2, use_pallas=False),
                          axis=0)
    assert np.array_equal(np.asarray(got), np.asarray(want))

"""Partial-round factorization (spec/poseidon_opt.py): bit-exactness of
the optimized permutation against the golden spec, for the pure-Python,
native C++, and disk-cached paths."""

import random

import pytest

from stark_mlwe_tpu.spec import poseidon as spos
from stark_mlwe_tpu.spec.field import P
from stark_mlwe_tpu.spec.poseidon import generate_params_t17
from stark_mlwe_tpu.spec.poseidon_opt import (_factorize_python,
                                              partial_round_affine,
                                              partial_round_factorization,
                                              permute_affine, permute_opt)


@pytest.mark.parametrize("t", [9, 17, 33])
def test_permute_opt_bit_exact(t):
    params = spos.params_for_width(t)
    rng = random.Random(1000 + t)
    for _ in range(3):
        st = [rng.randrange(P) for _ in range(t)]
        assert permute_opt(st, params) == spos.permute(st, params)


@pytest.mark.parametrize("t", [9, 17, 33, 65])
def test_permute_affine_bit_exact(t):
    """The affine partial-round form (W/V/A_s/A_y) is exact: identical
    outputs to the golden permutation at every width."""
    params = spos.params_for_width(t)
    rng = random.Random(2000 + t)
    for _ in range(2):
        st = [rng.randrange(P) for _ in range(t)]
        assert permute_affine(st, params) == spos.permute(st, params)


def test_partial_affine_shapes():
    params = spos.params_for_width(17)
    aff = partial_round_affine(params)
    rp, t = params.rp, params.t
    assert len(aff.w_s) == rp and all(len(r) == t for r in aff.w_s)
    assert len(aff.v) == rp
    # strictly lower triangular
    for r in range(rp):
        assert all(aff.v[r][c] == 0 for c in range(r, rp))
    assert all(aff.a_s[i][0] == 0 for i in range(t))
    assert len(aff.a_y) == t and all(len(r) == rp for r in aff.a_y)


def test_permute_opt_both_t17_seeds():
    rng = random.Random(7)
    for seed in (b"POSEIDON-T17-X5-SEED", b"POSEIDON-T17-X5-TRANSCRIPT"):
        params = generate_params_t17(seed)
        st = [rng.randrange(P) for _ in range(17)]
        assert permute_opt(st, params) == spos.permute(st, params)


def test_native_factorize_matches_python():
    from stark_mlwe_tpu import native
    if not native.available():
        pytest.skip("native lib unavailable")
    params = spos.params_for_width(9)
    res = native.factorize_mds(params.mds, params.t, params.rp)
    assert res is not None
    qr, qc, mf = res
    pq, pc, pm = _factorize_python(params)
    assert qr == pq and qc == pc and mf == pm


def test_native_permute_uses_factorization():
    from stark_mlwe_tpu import native
    if not native.available():
        pytest.skip("native lib unavailable")
    rng = random.Random(11)
    for t in (9, 17):
        params = spos.params_for_width(t)
        st = [rng.randrange(P) for _ in range(t)]
        assert native.permute_ints(st, params) == spos.permute(st, params)


def test_factorization_disk_cache_roundtrip(tmp_path, monkeypatch):
    import stark_mlwe_tpu.spec.poseidon_opt as po
    params = spos.params_for_width(9)
    fresh = _factorize_python(params)
    monkeypatch.setattr(po, "_CACHE_DIR", str(tmp_path))
    po._factor_cache.pop(id(params), None)
    fac1 = po.partial_round_factorization(params)   # computes + writes
    po._factor_cache.pop(id(params), None)
    fac2 = po.partial_round_factorization(params)   # reads from disk
    assert fac1.q_rows == fac2.q_rows == fresh[0]
    assert fac1.q_cols == fac2.q_cols == fresh[1]
    assert fac1.m_final == fac2.m_final == fresh[2]

"""Partial-round factorization (spec/poseidon_opt.py): bit-exactness of
the optimized permutation against the golden spec, for the pure-Python,
native C++, and disk-cached paths."""

import random

import pytest

from stark_mlwe_tpu.spec import poseidon as spos
from stark_mlwe_tpu.spec.field import P
from stark_mlwe_tpu.spec.poseidon import generate_params_t17
from stark_mlwe_tpu.spec.poseidon_opt import (_factorize_python,
                                              partial_round_factorization,
                                              permute_opt)


@pytest.mark.parametrize("t", [9, 17, 33])
def test_permute_opt_bit_exact(t):
    params = spos.params_for_width(t)
    rng = random.Random(1000 + t)
    for _ in range(3):
        st = [rng.randrange(P) for _ in range(t)]
        assert permute_opt(st, params) == spos.permute(st, params)


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

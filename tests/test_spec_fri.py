"""Spec FRI end-to-end tests at small k (the reference exercises FRI via its
end_to_end bench with DeepAliRealBuilder + verify assert)."""

import pytest

from stark_mlwe_tpu.spec import fri
from stark_mlwe_tpu.spec.field import P
from stark_mlwe_tpu.spec.rng import StdRng


def rand_vec(n, seed):
    rng = StdRng.seed_from_u64(seed)
    return [rng.ark_fr_rand() for _ in range(n)]


def test_fold_layer_definition():
    f = [1, 2, 3, 4, 5, 6, 7, 8]
    z = 10
    out = fri.fri_fold_layer(f, z, 4)
    assert out[0] == (1 + 2 * 10 + 3 * 100 + 4 * 1000) % P
    assert out[1] == (5 + 6 * 10 + 7 * 100 + 8 * 1000) % P
    s = fri.compute_s_layer(f, z, 4)
    assert s == [out[0]] * 4 + [out[1]] * 4


def test_pick_arity():
    assert fri.pick_arity_for_layer(65536, 16) == 16
    assert fri.pick_arity_for_layer(256, 8) == 8
    assert fri.pick_arity_for_layer(32, 1) == 2
    assert fri.pick_arity_for_layer(4096, 128) == 128
    assert fri.pick_arity_for_layer(96, 64) == 32
    assert fri.pick_arity_for_layer(1, 1) == 1


def test_sample_z_outside_domain_and_deterministic():
    z1 = fri.fri_sample_z_ell(0xDEEF_BAAD, 0, 256)
    z2 = fri.fri_sample_z_ell(0xDEEF_BAAD, 0, 256)
    assert z1 == z2
    assert z1 != 0 and pow(z1, 256, P) != 1
    assert fri.fri_sample_z_ell(0xDEEF_BAAD, 1, 256) != z1


def test_query_index_in_range():
    seed = fri.fs_seed_from_roots([1, 2, 3])
    for ell in range(3):
        for q in range(8):
            i = fri.derive_query_index(seed, ell, q, 64)
            assert 0 <= i < 64


@pytest.mark.parametrize("k,schedule", [(6, [4, 4]), (8, [16, 4]),
                                        (7, [2, 2, 2])])
def test_deep_fri_prove_verify_roundtrip(k, schedule):
    n0 = 1 << k
    a = rand_vec(n0, 1)
    s = rand_vec(n0, 2)
    e = rand_vec(n0, 3)
    t = rand_vec(n0, 4)
    params = fri.DeepFriParams(schedule=schedule, r=4, seed_z=0xDEEF_BAAD)
    proof = fri.deep_fri_prove(fri.DeepAliRealBuilder(), a, s, e, t, n0,
                               params)
    assert fri.deep_fri_verify(params, proof)
    assert fri.deep_fri_proof_size_bytes(proof) > 0


def test_mock_builder_roundtrip_and_determinism():
    n0 = 64
    a = rand_vec(n0, 11)
    s = rand_vec(n0, 12)
    e = rand_vec(n0, 13)
    t = rand_vec(n0, 14)
    params = fri.DeepFriParams(schedule=[4, 4], r=3, seed_z=7)
    mock = fri.DeepAliMock()
    p1 = fri.deep_fri_prove(mock, a, s, e, t, n0, params)
    p2 = fri.deep_fri_prove(mock, a, s, e, t, n0, params)
    assert p1.roots == p2.roots
    assert fri.deep_fri_verify(params, p1)


def test_tampered_proof_rejected():
    n0 = 64
    a = rand_vec(n0, 21)
    s = rand_vec(n0, 22)
    e = rand_vec(n0, 23)
    t = rand_vec(n0, 24)
    params = fri.DeepFriParams(schedule=[4, 4], r=3, seed_z=9)
    proof = fri.deep_fri_prove(fri.DeepAliRealBuilder(), a, s, e, t, n0,
                               params)
    assert fri.deep_fri_verify(params, proof)

    # tamper a payload field
    proof.queries[0].per_layer_payloads[0].f_i = \
        (proof.queries[0].per_layer_payloads[0].f_i + 1) % P
    assert not fri.deep_fri_verify(params, proof)


def test_tampered_root_rejected():
    n0 = 64
    a = rand_vec(n0, 31)
    s = rand_vec(n0, 32)
    e = rand_vec(n0, 33)
    t = rand_vec(n0, 34)
    params = fri.DeepFriParams(schedule=[4, 4], r=3, seed_z=10)
    proof = fri.deep_fri_prove(fri.DeepAliRealBuilder(), a, s, e, t, n0,
                               params)
    proof.roots[1] = (proof.roots[1] + 1) % P
    assert not fri.deep_fri_verify(params, proof)


def test_hashed_leaf_mode_boundary():
    """Schedule [8] at n0=64 -> layer0 arity 8 (hashed), final layer n=8
    arity 2 (pairs)."""
    n0 = 64
    a = rand_vec(n0, 41)
    s = rand_vec(n0, 42)
    e = rand_vec(n0, 43)
    t = rand_vec(n0, 44)
    params = fri.DeepFriParams(schedule=[8], r=2, seed_z=5)
    proof = fri.deep_fri_prove(fri.DeepAliRealBuilder(), a, s, e, t, n0,
                               params)
    assert proof.layer_batches.layers[0].hashed_leaves
    assert fri.deep_fri_verify(params, proof)

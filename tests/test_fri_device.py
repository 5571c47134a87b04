"""Device FRI/DEEP-ALI stack vs golden spec, including full-proof equality."""

import random

import jax.numpy as jnp

from stark_mlwe_tpu.fri import (DeviceDeepAliMock, DeviceDeepAliRealBuilder,
                                deep_fri_prove, deep_fri_verify,
                                fold_layer_dev, fri_build_transcript_dev)
from stark_mlwe_tpu.fri import deep_ali as dali
from stark_mlwe_tpu.fri import fs
from stark_mlwe_tpu.ops import fr
from stark_mlwe_tpu.spec import deep_ali as sdali
from stark_mlwe_tpu.spec import fri as sfri
from stark_mlwe_tpu.spec.field import P, get_root_of_unity
from stark_mlwe_tpu.spec.fri import DeepFriParams, FriDomain

rng = random.Random(0x5eed)


def rand_elems(n):
    return [rng.randrange(P) for _ in range(n)]


def dev(xs):
    return jnp.asarray(fr.pack_ints(xs, mont=True))


def test_one_block_tagged_hash_matches_spec():
    rows = [[rng.randrange(P) for _ in range(3)] for _ in range(5)]
    got = fs.one_block_tagged_hash_batch(b"FRI/index", rows)
    want = [sfri.tr_hash_fields_tagged(b"FRI/index", r) for r in rows]
    assert got == want


def test_hash_leaf_pairs_matches_spec():
    pairs = [(rng.randrange(P), rng.randrange(P)) for _ in range(7)]
    got = fs.hash_leaf_pairs_ints(pairs)
    want = [sfri.hash_leaf_pair(f, s) for f, s in pairs]
    assert got == want


def test_tagged_hash_vecs_matches_spec():
    for n in (5, 12, 13, 28, 44):
        vecs = [rand_elems(n) for _ in range(2)]
        tags = [b"ALI/A", b"ALI/S"]
        stacked = jnp.stack([dev(v) for v in vecs], axis=0)
        got = fs.tagged_hash_vecs(tags, stacked)
        want = [sfri.tr_hash_fields_tagged(t, v)
                for t, v in zip(tags, vecs)]
        assert got == want, f"n={n}"


def test_merge_evals_matches_spec():
    n = 64
    omega = get_root_of_unity(n)
    a, s, e, t = (rand_elems(n) for _ in range(4))
    z, beta = sdali.sample_z_beta_from_seed(42, n)
    want_f0, _, want_c = sdali.deep_ali_merge_evals(a, s, e, t, omega, z)
    f0, _, c_star = dali.merge_evals_device(
        dev(a), dev(s), dev(e), dev(t), omega, z)
    assert fr.unpack_ints(f0, mont=True) == want_f0
    assert c_star == want_c
    # blinded
    r_eval = rand_elems(n)
    want_f0b, _, want_cb = sdali.deep_ali_merge_evals_blinded(
        a, s, e, t, r_eval, beta, omega, z)
    f0b, _, cb = dali.merge_evals_device(
        dev(a), dev(s), dev(e), dev(t), omega, z,
        r_eval=dev(r_eval), beta=beta)
    assert fr.unpack_ints(f0b, mont=True) == want_f0b
    assert cb == want_cb


def test_fold_layer_matches_spec():
    n, m = 64, 16
    f = rand_elems(n)
    z = rng.randrange(1, P)
    want = sfri.fri_fold_layer(f, z, m)
    got = fr.unpack_ints(fold_layer_dev(dev(f), z, m), mont=True)
    assert got == want


def _proofs_equal(p1, p2):
    assert p1.roots == p2.roots
    assert p1.n0 == p2.n0 and p1.omega0 == p2.omega0
    assert len(p1.queries) == len(p2.queries)
    for q1, q2 in zip(p1.queries, p2.queries):
        assert q1.final_index == q2.final_index
        assert q1.final_pair == q2.final_pair
        for r1, r2 in zip(q1.per_layer_refs, q2.per_layer_refs):
            assert (r1.i, r1.child_pos, r1.parent_index, r1.parent_pos) == \
                   (r2.i, r2.child_pos, r2.parent_index, r2.parent_pos)
        for a1, a2 in zip(q1.per_layer_payloads, q2.per_layer_payloads):
            assert (a1.f_i, a1.s_i, a1.f_parent_b, a1.s_parent_b) == \
                   (a2.f_i, a2.s_i, a2.f_parent_b, a2.s_parent_b)
    for lb1, lb2 in zip(p1.layer_batches.layers, p2.layer_batches.layers):
        assert lb1.hashed_leaves == lb2.hashed_leaves
        assert lb1.child_indices == lb2.child_indices
        assert lb1.parent_indices == lb2.parent_indices
        for mp1, mp2 in ((lb1.child_proof, lb2.child_proof),
                         (lb1.parent_proof, lb2.parent_proof)):
            assert mp1.indices == mp2.indices
            assert mp1.siblings == mp2.siblings
            assert mp1.group_sizes == mp2.group_sizes
            assert mp1.arity == mp2.arity
    fp1, fp2 = p1.layer_batches.final_proof, p2.layer_batches.final_proof
    assert fp1.indices == fp2.indices and fp1.siblings == fp2.siblings


def test_e2e_device_proof_equals_spec_proof():
    """Full prove at n0=128, schedule [16,4]: exercises hashed-leaf arity-16
    commits, pair-leaf arity-4 commits and the arity-2 final tree."""
    k = 7
    n0 = 1 << k
    a, s, e, t = (rand_elems(n0) for _ in range(4))
    params = DeepFriParams(schedule=[16, 4], r=8, seed_z=0xDEEF_BAAD)

    spec_proof = sfri.deep_fri_prove(
        sfri.DeepAliRealBuilder(), a, s, e, t, n0, params)
    dev_proof = deep_fri_prove(
        DeviceDeepAliRealBuilder(), a, s, e, t, n0, params)
    _proofs_equal(dev_proof, spec_proof)

    assert sfri.deep_fri_verify(params, dev_proof)
    assert deep_fri_verify(params, dev_proof)
    assert deep_fri_verify(params, spec_proof)

    # tamper rejection
    bad = spec_proof.queries[0].per_layer_payloads[0]
    orig = bad.f_i
    bad.f_i = (bad.f_i + 1) % P
    assert not deep_fri_verify(params, spec_proof)
    bad.f_i = orig


def test_e2e_64ary_proof_equals_spec():
    """64-ary schedule (t=65 sponges in the tree interiors, hashed-leaf
    rule at arity 64 — fri.rs:275, poseidon/src/lib.rs:120-146)."""
    n0 = 512
    a, s, e, t = (rand_elems(n0) for _ in range(4))
    params = DeepFriParams(schedule=[64], r=6, seed_z=0xDEEF_BAAD)
    spec_proof = sfri.deep_fri_prove(
        sfri.DeepAliRealBuilder(), a, s, e, t, n0, params)
    dev_proof = deep_fri_prove(
        DeviceDeepAliRealBuilder(), a, s, e, t, n0, params)
    _proofs_equal(dev_proof, spec_proof)
    assert deep_fri_verify(params, dev_proof)


def test_e2e_128ary_proof_equals_spec():
    """128-ary schedule (t=129 sponges — the lane-major wide Pallas
    kernel on TPU — with both full 128-child and partial tail groups)."""
    n0 = 1024
    a, s, e, t = (rand_elems(n0) for _ in range(4))
    params = DeepFriParams(schedule=[128], r=6, seed_z=0xDEEF_BAAD)
    spec_proof = sfri.deep_fri_prove(
        sfri.DeepAliRealBuilder(), a, s, e, t, n0, params)
    dev_proof = deep_fri_prove(
        DeviceDeepAliRealBuilder(), a, s, e, t, n0, params)
    _proofs_equal(dev_proof, spec_proof)
    assert deep_fri_verify(params, dev_proof)


def test_e2e_mock_builder_matches_spec():
    n0 = 64
    a, s, e, t = (rand_elems(n0) for _ in range(4))
    params = DeepFriParams(schedule=[4, 4], r=4, seed_z=1234)
    spec_proof = sfri.deep_fri_prove(sfri.DeepAliMock(), a, s, e, t,
                                     n0, params)
    dev_proof = deep_fri_prove(DeviceDeepAliMock(), a, s, e, t, n0, params)
    _proofs_equal(dev_proof, spec_proof)
    assert deep_fri_verify(params, dev_proof)


def test_e2e_chunked_layer0_proof_equals_spec(monkeypatch):
    """n0 > STARK_CHUNK_ROWS routes layer 0 through the chunked
    fold/commit path (per-chunk device buffers with GLOBAL DS positions;
    the axon remote wedges on single >= 32 MiB buffers, so k >= 19 rides
    this): proof bytes must be identical to the golden spec prover's."""
    monkeypatch.setenv("STARK_CHUNK_ROWS", "64")
    n0 = 1 << 9
    a, s, e, t = (rand_elems(n0) for _ in range(4))
    params = DeepFriParams(schedule=[16, 4], r=8, seed_z=0xDEEF_BAAD)

    spec_proof = sfri.deep_fri_prove(
        sfri.DeepAliRealBuilder(), a, s, e, t, n0, params)
    dev_proof = deep_fri_prove(
        DeviceDeepAliRealBuilder(), a, s, e, t, n0, params)
    _proofs_equal(dev_proof, spec_proof)
    assert deep_fri_verify(params, dev_proof)
    assert sfri.deep_fri_verify(params, dev_proof)


def test_e2e_chunked_32ary_proof_equals_spec(monkeypatch):
    """Chunked layer-0 with a 32-ary first fold (t=33 sponges,
    hash_level_chunk at arity 32) stays byte-identical to the spec."""
    monkeypatch.setenv("STARK_CHUNK_ROWS", "128")
    n0 = 1 << 9
    a, s, e, t = (rand_elems(n0) for _ in range(4))
    params = DeepFriParams(schedule=[32, 4], r=6, seed_z=0xDEEF_BAAD)

    spec_proof = sfri.deep_fri_prove(
        sfri.DeepAliRealBuilder(), a, s, e, t, n0, params)
    dev_proof = deep_fri_prove(
        DeviceDeepAliRealBuilder(), a, s, e, t, n0, params)
    _proofs_equal(dev_proof, spec_proof)
    assert deep_fri_verify(params, dev_proof)

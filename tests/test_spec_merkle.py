"""Spec-model Merkle tests: roundtrips + DS-hygiene negatives
(mirrors reference merkle/src/lib.rs:907-1183 test strategy)."""

import pytest

from stark_mlwe_tpu.spec import merkle
from stark_mlwe_tpu.spec.field import P
from stark_mlwe_tpu.spec.rng import StdRng


def rand_leaves(n, seed=123):
    rng = StdRng.seed_from_u64(seed)
    return [rng.ark_fr_rand() for _ in range(n)]


def test_legacy_multiproof_roundtrip_non_pow2():
    leaves = rand_leaves(55)
    params = merkle.default_params()
    tree = merkle.MerkleTree.new_legacy(leaves, 77, params)
    idx = [0, 1, 7, 16, 54, 33]
    proof = tree.open_many(idx)
    vals = [leaves[i] for i in sorted(set(idx))]
    assert merkle.verify_many(tree.root(), sorted(set(idx)), vals, proof,
                              77, params)
    # wrong ds_tag fails
    assert not merkle.verify_many(tree.root(), sorted(set(idx)), vals, proof,
                                  78, params)


@pytest.mark.parametrize("arity,n", [(16, 64), (8, 40), (2, 9)])
def test_ds_multiproof_roundtrip(arity, n):
    leaves = rand_leaves(n, seed=arity * 1000 + n)
    cfg = merkle.MerkleChannelCfg.new(arity, tree_label=5)
    tree = merkle.MerkleTree.new(leaves, cfg)
    idx = [0, n - 1, n // 2]
    proof = tree.open_many(idx)
    vals = [leaves[i] for i in sorted(set(idx))]
    assert merkle.verify_many_ds(tree.root(), sorted(set(idx)), vals, proof,
                                 5, cfg.params)
    # tamper value
    bad = list(vals)
    bad[0] = (bad[0] + 1) % P
    assert not merkle.verify_many_ds(tree.root(), sorted(set(idx)), bad,
                                     proof, 5, cfg.params)


def test_ds_hygiene_tree_label_and_arity():
    leaves = rand_leaves(32)
    t1 = merkle.MerkleTree.new(leaves, merkle.MerkleChannelCfg.new(16, 1))
    t2 = merkle.MerkleTree.new(leaves, merkle.MerkleChannelCfg.new(16, 2))
    t3 = merkle.MerkleTree.new(leaves, merkle.MerkleChannelCfg.new(8, 1))
    assert t1.root() != t2.root()
    assert t1.root() != t3.root()
    # child shuffle changes root
    shuffled = list(leaves)
    shuffled[0], shuffled[1] = shuffled[1], shuffled[0]
    t4 = merkle.MerkleTree.new(shuffled, merkle.MerkleChannelCfg.new(16, 1))
    assert t4.root() != t1.root()


def test_padding_distinguishes_trailing_zero_leaf():
    leaves = rand_leaves(17)
    cfg = merkle.MerkleChannelCfg.new(16, 0)
    t1 = merkle.MerkleTree.new(leaves, cfg)
    t2 = merkle.MerkleTree.new(leaves + [0], cfg)
    assert t1.root() != t2.root()


@pytest.mark.parametrize("arity", [16, 8])
def test_pairs_roundtrip_and_tamper(arity):
    n = 33
    f_vals = rand_leaves(n, seed=1)
    cp_vals = rand_leaves(n, seed=2)
    prover = merkle.MerkleProver(merkle.MerkleChannelCfg.new(arity, 9))
    root, tree = prover.commit_pairs(f_vals, cp_vals)
    idx = [3, 17, 32]
    pairs, proof = prover.open_pairs(tree, f_vals, cp_vals, idx)
    assert prover.verify_pairs(root, sorted(set(idx)), pairs, proof)
    bad = list(pairs)
    bad[1] = ((bad[1][0] + 1) % P, bad[1][1])
    assert not prover.verify_pairs(root, sorted(set(idx)), bad, proof)


def test_legacy_pairs_facade():
    n = 20
    f_vals = rand_leaves(n, seed=3)
    cp_vals = rand_leaves(n, seed=4)
    prover = merkle.LegacyMerkleProver(55, merkle.default_params())
    root, tree = prover.commit_pairs(f_vals, cp_vals)
    pairs, proof = prover.open_pairs(tree, f_vals, cp_vals, [0, 19])
    assert prover.verify_pairs(root, [0, 19], pairs, proof)


def test_single_column_facade():
    leaves = rand_leaves(64, seed=8)
    prover = merkle.MerkleProver(merkle.MerkleChannelCfg.new(16, 123))
    root, tree = prover.commit_single(leaves)
    idx = [0, 15, 16, 31, 47, 63]
    proof = prover.open_single(tree, idx)
    vals = [leaves[i] for i in idx]
    assert prover.verify_single(root, idx, vals, proof)

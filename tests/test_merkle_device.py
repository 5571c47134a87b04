"""Device Merkle engine vs golden spec: roots, multiproofs, verifiers."""

import random

import pytest

import jax.numpy as jnp

from stark_mlwe_tpu import merkle as dmk
from stark_mlwe_tpu.ops import fr
from stark_mlwe_tpu.spec import merkle as smk
from stark_mlwe_tpu.spec.field import P

rng = random.Random(0xABCDE)


def rand_elems(n):
    return [rng.randrange(P) for _ in range(n)]


def dev_mont(xs):
    return jnp.asarray(fr.pack_ints(xs, mont=True))


@pytest.mark.parametrize("n,arity", [(55, 16), (64, 16), (16, 8), (33, 8)])
def test_tree_matches_spec(n, arity):
    leaves = rand_elems(n)
    cfg = smk.MerkleChannelCfg.new(arity, tree_label=7)
    want = smk.MerkleTree.new(leaves, cfg)
    tree = dmk.build_tree(dev_mont(leaves), cfg)
    assert tree.root() == want.root()
    assert tree.height() == want.height()
    # full level equality
    for lvl in range(len(want.levels)):
        got = fr.unpack_ints(fr.from_mont(tree.levels_dev[lvl]))
        assert got == want.levels[lvl]


def test_open_many_matches_spec():
    n, arity = 55, 16
    leaves = rand_elems(n)
    cfg = smk.MerkleChannelCfg.new(arity, tree_label=3)
    want_tree = smk.MerkleTree.new(leaves, cfg)
    tree = dmk.build_tree(dev_mont(leaves), cfg)
    idx = [0, 3, 17, 54, 17]
    wp = want_tree.open_many(idx)
    gp = tree.open_many(idx)
    assert gp.indices == wp.indices
    assert gp.siblings == wp.siblings
    assert gp.group_sizes == wp.group_sizes
    assert gp.arity == wp.arity
    # spec verifier accepts the device proof
    vals = [leaves[i] for i in sorted(set(idx))]
    assert smk.verify_many_ds(tree.root(), sorted(set(idx)), vals, gp,
                              cfg.tree_label, cfg.params)
    # device verifier accepts it too and rejects tampering
    assert dmk.verify_many_ds(tree.root(), sorted(set(idx)), vals, gp,
                              cfg.tree_label, cfg.params)
    bad = list(vals)
    bad[0] = (bad[0] + 1) % P
    assert not dmk.verify_many_ds(tree.root(), sorted(set(idx)), bad, gp,
                                  cfg.tree_label, cfg.params)


def test_pairs_tree_and_verify():
    n, arity = 40, 8
    f_vals = rand_elems(n)
    cp_vals = rand_elems(n)
    cfg = smk.MerkleChannelCfg.new(arity, tree_label=11)
    want = smk.MerkleTree.new_pairs(f_vals, cp_vals, cfg)
    tree = dmk.build_tree_pairs(dev_mont(f_vals), dev_mont(cp_vals), cfg)
    assert tree.root() == want.root()
    idx = [1, 8, 39]
    proof = tree.open_many(idx)
    pairs = [(f_vals[i], cp_vals[i]) for i in idx]
    assert smk.verify_pairs_ds(tree.root(), idx, pairs, proof,
                               cfg.tree_label, cfg.params)
    assert dmk.verify_pairs_ds(tree.root(), idx, pairs, proof,
                               cfg.tree_label, cfg.params)
    bad = [(f, (cp + 1) % P) for f, cp in pairs]
    assert not dmk.verify_pairs_ds(tree.root(), idx, bad, proof,
                                   cfg.tree_label, cfg.params)


def test_legacy_tree_and_verify():
    n = 55
    leaves = rand_elems(n)
    ds_tag = rng.randrange(P)
    params = smk.default_params()
    want = smk.MerkleTree.new_legacy(leaves, ds_tag, params)
    tree = dmk.build_tree_legacy(dev_mont(leaves), ds_tag, params)
    assert tree.root() == want.root()
    idx = [2, 16, 54]
    proof = tree.open_many(idx)
    vals = [leaves[i] for i in idx]
    assert smk.verify_many(tree.root(), idx, vals, proof, ds_tag, params)
    assert dmk.verify_many_legacy(tree.root(), idx, vals, proof, ds_tag,
                                  params)


def test_legacy_pairs():
    n = 20
    f_vals, cp_vals = rand_elems(n), rand_elems(n)
    ds_tag = rng.randrange(P)
    params = smk.default_params()
    want = smk.MerkleTree.new_pairs_legacy(f_vals, cp_vals, ds_tag, params)
    prover = dmk.LegacyMerkleProver(ds_tag, params)
    root, tree = prover.commit_pairs(f_vals, cp_vals)
    assert root == want.root()
    pairs, proof = prover.open_pairs(tree, f_vals, cp_vals, [0, 7, 19])
    assert prover.verify_pairs(root, [0, 7, 19], pairs, proof)

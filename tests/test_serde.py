"""Tree / multiproof canonical serde roundtrips (merkle/src/lib.rs:10-54,
114-143 parity: committed state is persistable and serves opens/verifies
after a load)."""

import random

import jax.numpy as jnp

from stark_mlwe_tpu import merkle as dmk
from stark_mlwe_tpu import serde
from stark_mlwe_tpu.ops import fr
from stark_mlwe_tpu.spec.field import P
from stark_mlwe_tpu.spec.merkle import (MerkleChannelCfg, MerkleTree,
                                        verify_many_ds)

rng = random.Random(0x5EDE)


def rand_elems(n):
    return [rng.randrange(P) for _ in range(n)]


def test_spec_tree_roundtrip_serves_opens():
    cfg = MerkleChannelCfg.new(16, tree_label=7)
    leaves = rand_elems(55)  # non-power-of-two on purpose (merkle:913)
    tree = MerkleTree.new(leaves, cfg)
    buf = serde.serialize_tree(tree)
    tree2 = serde.deserialize_tree(buf, cfg=cfg)
    assert tree2.root() == tree.root()
    assert tree2.levels == tree.levels
    idx = [0, 3, 17, 54]
    proof = tree2.open_many(idx)
    vals = [leaves[i] for i in idx]
    assert verify_many_ds(tree.root(), idx, vals, proof,
                          cfg.tree_label, cfg.params)
    # serde is canonical: same tree -> same bytes
    assert serde.serialize_tree(tree2) == buf


def test_device_tree_roundtrip_matches_spec_tree():
    cfg = MerkleChannelCfg.new(4, tree_label=3)
    leaves = rand_elems(64)
    dtree = dmk.build_tree(
        jnp.asarray(fr.pack_ints(leaves, mont=True)), cfg)
    buf = serde.serialize_tree(dtree)
    tree2 = serde.deserialize_tree(buf, cfg=cfg)
    assert tree2.root() == dtree.root()
    spec_tree = MerkleTree.new(leaves, cfg)
    assert serde.serialize_tree(spec_tree) == buf


def test_merkle_proof_roundtrip():
    cfg = MerkleChannelCfg.new(8, tree_label=0)
    leaves = rand_elems(64)
    tree = MerkleTree.new(leaves, cfg)
    idx = [1, 9, 33]
    proof = tree.open_many(idx)
    buf = serde.serialize_merkle_proof(proof)
    p2 = serde.deserialize_merkle_proof(buf)
    assert (p2.indices, p2.siblings, p2.group_sizes, p2.arity) == \
        (proof.indices, proof.siblings, proof.group_sizes, proof.arity)
    vals = [leaves[i] for i in idx]
    assert verify_many_ds(tree.root(), idx, vals, p2,
                          cfg.tree_label, cfg.params)

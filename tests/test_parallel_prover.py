"""Sharded full prover == single-chip prover, byte-for-byte.

The VERDICT-critical property: `deep_fri_prove` run SPMD over a 1-D mesh
produces proofs BYTE-IDENTICAL to the single-chip prover at any device
count (1, 2 and 8 are exercised by default).  Shapes are kept tiny: the
sharded steps are separate XLA:CPU compiles per (topology, shape) and the
graphs, while scan-compact, are not free.

Coverage matrix:
  - schedule [4,4] @ n0=64: sharded PAIR-LEAF commits (arity 4,
    LEAF_LEVEL_DS rows) + replicated tail layers,
  - schedule [16] @ n0=128: sharded HASHED-LEAF commits (arity 16,
    fri.rs:275 rule), partial tail groups, sharded final layer.
"""

import numpy as np
import pytest

import jax

from stark_mlwe_tpu import parallel as par
from stark_mlwe_tpu.parallel import prover as spv
from stark_mlwe_tpu.spec.fri import DeepFriParams
from stark_mlwe_tpu.stark import MlweWitness, prove, serialize_proof, verify

CASES = [
    # (n_dev, k, schedule)  n0 = 1 << k
    (1, 6, [4, 4]),
    (8, 6, [4, 4]),
    (2, 7, [16]),
    (8, 7, [16]),
    # realistic shape: the paper schedule at k=12 exercises hashed-leaf
    # arity-16 sharded subtrees with MULTIPLE local levels (512->32->2),
    # the gathered frontier + partial tail groups, and the replicated
    # deep tail all at once (VERDICT r4 item 7; fri.rs:601-641).
    (8, 12, [16, 16, 8]),
]

_single_cache = {}


def _single_chip_proof(k, schedule, r):
    key = (k, tuple(schedule), r)
    if key not in _single_cache:
        w = MlweWitness.random(k=k, seed=0xBEEF + k)
        params = DeepFriParams(schedule=list(schedule), r=r, seed_z=0xD00D)
        proof = prove(w, params)
        assert verify(params, proof)
        _single_cache[key] = (w, params, serialize_proof(proof))
    return _single_cache[key]


@pytest.mark.parametrize("n_dev,k,schedule", CASES)
def test_sharded_prove_bytes_identical(n_dev, k, schedule):
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough devices")
    w, params, want_bytes = _single_chip_proof(k, schedule, r=4)
    mesh = par.make_mesh(n_dev)
    proof = spv.prove_sharded(w, params, mesh=mesh)
    assert serialize_proof(proof) == want_bytes
    assert verify(params, proof)

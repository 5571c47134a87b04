"""End-to-end MLWE STARK: witness generation, prove/verify, wire format.

The reference's de-facto application layer is its end_to_end bench
(crates/channel/benches/end_to_end.rs) driving DEEP-ALI + m-ary FRI on the
MLWE relation a*s + e = t over H.  This module gives that a first-class
API:

  - `MlweWitness.random` draws a,s,e via StdRng/F::rand and sets
    t = a*s + e pointwise on H (a *satisfying* instance; the reference
    bench uses all-random columns - `MlweWitness.random_unstructured`
    mirrors that),
  - `prove` / `verify` wrap the device DEEP-ALI+FRI pipeline,
  - `serialize_proof` / `deserialize_proof` give a canonical byte wire
    format for DeepFriProof (the reference bincode-serializes only the
    sum-check proofs; FBytes-style 32-byte LE field encoding and u64-LE
    indices, channel/src/lib.rs:894-1021 conventions).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import jax.numpy as jnp

from ..fri import DeviceDeepAliRealBuilder, deep_fri_prove, deep_fri_verify
from ..ops import fr
from ..spec.field import P, fr_from_bytes, fr_to_bytes
from ..spec.fri import (DeepFriParams, DeepFriProof, FriLayerBatches,
                        FriQueryPayload, LayerBatchProof, LayerOpenPayload,
                        LayerQueryRef, MerkleProof,
                        deep_fri_proof_size_bytes)
from ..spec.rng import StdRng


@dataclass
class MlweWitness:
    a: list
    s: list
    e: list
    t: list

    @classmethod
    def random(cls, k: int, seed: int) -> "MlweWitness":
        """Satisfying instance: t = a*s + e on H."""
        n0 = 1 << k
        rng = StdRng.seed_from_u64(seed)
        a = [rng.ark_fr_rand() for _ in range(n0)]
        s = [rng.ark_fr_rand() for _ in range(n0)]
        e = [rng.ark_fr_rand() for _ in range(n0)]
        t = [(a[i] * s[i] + e[i]) % P for i in range(n0)]
        return cls(a, s, e, t)

    @classmethod
    def random_unstructured(cls, k: int, seed: int) -> "MlweWitness":
        """All four columns random (the reference bench's inputs,
        end_to_end.rs:249-253)."""
        n0 = 1 << k
        rng = StdRng.seed_from_u64(seed)
        cols = [[rng.ark_fr_rand() for _ in range(n0)] for _ in range(4)]
        return cls(*cols)

    def to_device(self):
        return tuple(jnp.asarray(fr.pack_ints(c, mont=True))
                     for c in (self.a, self.s, self.e, self.t))

    def to_host_limbs(self):
        """Numpy Montgomery limb columns: device-uploadable AND directly
        consumable by the native FS absorb chains."""
        return tuple(fr.pack_ints(c, mont=True)
                     for c in (self.a, self.s, self.e, self.t))


def prove(witness: MlweWitness, params: DeepFriParams,
          blinding_r=None) -> DeepFriProof:
    builder = DeviceDeepAliRealBuilder(
        r_eval_opt=blinding_r, use_blinding=blinding_r is not None)
    a, s, e, t = witness.to_host_limbs()
    n0 = len(witness.a)
    return deep_fri_prove(builder, a, s, e, t, n0, params)


def verify(params: DeepFriParams, proof: DeepFriProof) -> bool:
    return deep_fri_verify(params, proof)


# ---------------------------------------------------------------------------
# Canonical wire format for DeepFriProof.
# ---------------------------------------------------------------------------

def _w_u64(out, v):
    out.append(struct.pack("<Q", v))


def _w_fr(out, v):
    out.append(fr_to_bytes(v))


def _w_vec(out, xs, wfn):
    _w_u64(out, len(xs))
    for x in xs:
        wfn(out, x)


def _w_merkle_proof(out, mp: MerkleProof):
    _w_u64(out, mp.arity)
    _w_vec(out, mp.indices, _w_u64)
    _w_u64(out, len(mp.siblings))
    for lvl in mp.siblings:
        _w_vec(out, lvl, _w_fr)
    _w_u64(out, len(mp.group_sizes))
    for lvl in mp.group_sizes:
        _w_vec(out, lvl, _w_u64)


def serialize_proof(p: DeepFriProof) -> bytes:
    out = []
    _w_u64(out, p.n0)
    _w_fr(out, p.omega0)
    _w_vec(out, p.roots, _w_fr)
    _w_u64(out, len(p.layer_batches.layers))
    for lb in p.layer_batches.layers:
        _w_u64(out, 1 if lb.hashed_leaves else 0)
        _w_vec(out, lb.child_indices, _w_u64)
        _w_merkle_proof(out, lb.child_proof)
        _w_vec(out, lb.parent_indices, _w_u64)
        _w_merkle_proof(out, lb.parent_proof)
    _w_merkle_proof(out, p.layer_batches.final_proof)
    _w_u64(out, len(p.queries))
    for q in p.queries:
        _w_u64(out, len(q.per_layer_refs))
        for r in q.per_layer_refs:
            for v in (r.i, r.child_pos, r.parent_index, r.parent_pos):
                _w_u64(out, v)
        _w_u64(out, len(q.per_layer_payloads))
        for pay in q.per_layer_payloads:
            for v in (pay.f_i, pay.s_i, pay.f_parent_b, pay.s_parent_b):
                _w_fr(out, v)
        _w_u64(out, q.final_index)
        _w_fr(out, q.final_pair[0])
        _w_fr(out, q.final_pair[1])
    return b"".join(out)


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.off = 0

    def u64(self) -> int:
        v = struct.unpack_from("<Q", self.buf, self.off)[0]
        self.off += 8
        return v

    def fr_(self) -> int:
        v = fr_from_bytes(self.buf[self.off:self.off + 32])
        self.off += 32
        return v

    def vec(self, fn):
        return [fn() for _ in range(self.u64())]


def deserialize_proof(buf: bytes) -> DeepFriProof:
    r = _Reader(buf)
    n0 = r.u64()
    omega0 = r.fr_()
    roots = r.vec(r.fr_)

    def merkle_proof():
        arity = r.u64()
        indices = r.vec(r.u64)
        siblings = [r.vec(r.fr_) for _ in range(r.u64())]
        group_sizes = [r.vec(r.u64) for _ in range(r.u64())]
        return MerkleProof(indices, siblings, group_sizes, arity)

    layers = []
    for _ in range(r.u64()):
        hashed = r.u64() == 1
        child_indices = r.vec(r.u64)
        child_proof = merkle_proof()
        parent_indices = r.vec(r.u64)
        parent_proof = merkle_proof()
        layers.append(LayerBatchProof(hashed, child_indices, child_proof,
                                      parent_indices, parent_proof))
    final_proof = merkle_proof()

    queries = []
    for _ in range(r.u64()):
        refs = [LayerQueryRef(r.u64(), r.u64(), r.u64(), r.u64())
                for _ in range(r.u64())]
        pays = [LayerOpenPayload(r.fr_(), r.fr_(), r.fr_(), r.fr_())
                for _ in range(r.u64())]
        final_index = r.u64()
        final_pair = (r.fr_(), r.fr_())
        queries.append(FriQueryPayload(refs, pays, final_index, final_pair))

    assert r.off == len(buf), "trailing bytes in proof"
    return DeepFriProof(roots, FriLayerBatches(layers, final_proof),
                        queries, n0, omega0)


__all__ = ["MlweWitness", "prove", "verify", "serialize_proof",
           "deserialize_proof", "DeepFriParams", "DeepFriProof",
           "deep_fri_proof_size_bytes"]

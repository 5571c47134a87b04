"""Device/native-accelerated Fiat-Shamir transcript hashing.

The reference drives FS through a Poseidon sponge transcript
(/root/reference/crates/transcript/src/lib.rs) and hashes *entire witness
columns* into it (`tr_hash_fields_tagged`, deep_ali/src/fri.rs:28-35).
The sponge chain is inherently sequential, but each absorb step is a
batched device permutation, and *independent* tagged hashes (the four
ALI/{A,S,E,T} column hashes, the per-(layer,query) index seeds, the
per-leaf pair hashes) batch across the leading axis.

Routing: large batches (whole FRI layers of leaf hashes) run on the TPU;
small batches (query-index seeds, verifier-side leaf recomputation) run
in the native C++ kernel to avoid host<->device round-trip latency.

Everything is bit-exact against `spec.transcript.Transcript`: prefix
states are replayed host-side with the golden model, bulk absorption runs
on device, and the final challenge squeeze is finished host-side.

Caches hold only host (numpy/int) data so they are safe to populate from
inside jit/shard_map traces.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from .. import native
from ..ops import fr
from ..ops import poseidon as dpos
from ..spec.field import P
from ..spec.transcript import (DS_ABSORB_BYTES, DS_CHALLENGE, RATE, T,
                               Transcript, bytes_to_field_words,
                               default_params, domain_tag_to_field)

# Below this many rows, host-native hashing beats a device dispatch.
NATIVE_BATCH_CUTOFF = 1024


def _dp():
    return dpos.device_params(default_params())


@lru_cache(maxsize=None)
def transcript_prefix(label: bytes, tag: bytes):
    """(state ints tuple, pos) after Transcript(label).absorb_bytes(tag)."""
    tr = Transcript(label)
    tr.absorb_bytes(tag)
    return tuple(tr.state), tr.pos


def resume_transcript(state_ints, pos: int):
    """Rebuild a (fast) transcript from raw sponge state (host finish)."""
    from ..transcript import resume_fast
    return resume_fast(state_ints, pos)


# ---------------------------------------------------------------------------
# One-block tagged hashes, batched over rows.
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _one_block_consts(label: bytes, tag: bytes, k: int, out_label: bytes):
    """Constant sponge state (ints + packed numpy Montgomery limbs) for a
    tagged hash whose row fields + challenge preamble fit in one block."""
    state, p0 = transcript_prefix(label, tag)
    state = list(state)
    assert all(state[i] == 0 for i in range(p0, RATE)), "prefix crossed block"
    suffix = [domain_tag_to_field(DS_CHALLENGE),
              domain_tag_to_field(DS_ABSORB_BYTES)]
    suffix += bytes_to_field_words(out_label)
    assert p0 + k + len(suffix) <= RATE, "tagged hash does not fit one block"
    for i, v in enumerate(suffix):
        state[p0 + k + i] = v
    packed = fr.pack_ints(state, mont=True).reshape(T, fr.N)
    return tuple(state), packed, p0


def _one_block_hash_native(state_ints, p0, rows, params):
    """Native path: build the B sponge states and permute once in C++."""
    B = len(rows)
    states = []
    for row in rows:
        st = list(state_ints)
        for i, v in enumerate(row):
            st[p0 + i] = (st[p0 + i] + v) % P
        states.append(st)
    return [s[0] for s in native.permute_ints_batch(states, params)]


def one_block_tagged_hash_batch(tag: bytes, rows, label: bytes = b"FRI/FS",
                                out_label: bytes = b"out"):
    """Batched `tr_hash_fields_tagged(tag, row)` (fri.rs:28-35) for short
    rows of equal length.  rows: list[list[int]] -> list[int]."""
    g = len(rows)
    k = len(rows[0])
    state_ints, packed, p0 = _one_block_consts(label, tag, k, out_label)
    rows = [[v % P for v in row] for row in rows]
    if native.available() and g <= NATIVE_BATCH_CUTOFF:
        return _one_block_hash_native(state_ints, p0, rows,
                                      default_params())
    gp = 1
    while gp < g:
        gp *= 2
    rows = rows + [rows[0]] * (gp - g)
    cs = jnp.asarray(packed)
    flat = [v for row in rows for v in row]
    vals = jnp.asarray(fr.pack_ints(flat, mont=True)).reshape(gp, k, fr.N)
    state = jnp.concatenate([
        jnp.broadcast_to(cs[:p0], (gp, p0, fr.N)),
        vals,
        jnp.broadcast_to(cs[p0 + k:], (gp, T - p0 - k, fr.N)),
    ], axis=1)
    out = dpos.permute(state, _dp())[:, 0, :]
    return fr.unpack_ints(out, mont=True)[:g]


# ---------------------------------------------------------------------------
# Batched FRI leaf-pair hash (fri.rs:38-44): Poseidon(f, s) via a fresh
# one-shot transcript -> exactly one permutation per leaf.
# ---------------------------------------------------------------------------

def _leaf_consts():
    state_ints, packed, p0 = _one_block_consts(
        b"FRI/leaf/poseidon", b"FRI/leaf", 2, b"leaf")
    assert p0 == 4
    return state_ints, packed


def hash_leaf_pairs_dev(f_mont, s_mont):
    """[n,16] x 2 Montgomery -> [n,16] Montgomery leaf digests (device)."""
    _, packed = _leaf_consts()
    cs = jnp.asarray(packed)
    n = f_mont.shape[0]
    state = jnp.concatenate([
        jnp.broadcast_to(cs[:4], (n, 4, fr.N)),
        f_mont[:, None, :],
        s_mont[:, None, :],
        jnp.broadcast_to(cs[6:], (n, T - 6, fr.N)),
    ], axis=1)
    return dpos.permute(state, _dp())[:, 0, :]


def hash_leaf_pairs_ints(pairs) -> list:
    """Host-int convenience; native for small batches, device above."""
    g = len(pairs)
    state_ints, packed = _leaf_consts()
    if native.available() and g <= NATIVE_BATCH_CUTOFF:
        return _one_block_hash_native(state_ints, 4, [list(p) for p in pairs],
                                      default_params())
    gp = 1
    while gp < g:
        gp *= 2
    padded = list(pairs) + [pairs[0]] * (gp - g)
    f = jnp.asarray(fr.pack_ints([p[0] for p in padded], mont=True))
    s = jnp.asarray(fr.pack_ints([p[1] for p in padded], mont=True))
    return fr.unpack_ints(hash_leaf_pairs_dev(f, s), mont=True)[:g]


# ---------------------------------------------------------------------------
# Long-vector tagged hashes (the ALI/{A,S,E,T} witness-column hashes).
# ---------------------------------------------------------------------------

def tagged_hash_cols_native(tags, cols_np, label: bytes = b"FRI/FS",
                            out_label: bytes = b"out") -> list:
    """Native-threaded sequential absorb chains for host-resident columns.

    cols_np: list of [n,16] uint32 Montgomery limb arrays (the same packing
    uploaded to the device) - converted to 4x64 limbs with pure numpy, so
    no per-element bigint work.  The sponge chain is inherently sequential
    (one permutation per rate block); C++ runs the C chains across OpenMP
    threads at ~0.5 ms/permutation each.
    """
    prefixes = [transcript_prefix(label, t) for t in tags]
    states = [list(st) for st, _ in prefixes]
    poss = [p for _, p in prefixes]
    cols64 = np.stack([native.u32limbs_to_u64(c) for c in cols_np], axis=0)
    new_states, new_pos = native.absorb_chains(states, poss, cols64,
                                               default_params())
    return [resume_transcript(s, p).challenge(out_label)
            for s, p in zip(new_states, new_pos)]


def tagged_hash_vecs(tags, vecs_mont, label: bytes = b"FRI/FS",
                     out_label: bytes = b"out") -> list:
    """Batched `tr_hash_fields_tagged(tag_b, vec_b)` over B independent
    (tag, column) pairs of equal length.  vecs_mont: [B, n, 16]."""
    B, n = int(vecs_mont.shape[0]), int(vecs_mont.shape[1])
    assert len(tags) == B
    prefixes = [transcript_prefix(label, t) for t in tags]
    p0 = prefixes[0][1]
    assert all(p == p0 for _, p in prefixes)
    state = jnp.asarray(fr.pack_ints(
        [v for st, _ in prefixes for v in st], mont=True)).reshape(B, T, fr.N)

    dp = _dp()
    pos = p0
    off = 0
    head = min(n, RATE - pos)
    if head:
        piece = fr.add(state[:, pos:pos + head, :], vecs_mont[:, :head, :])
        state = jnp.concatenate(
            [state[:, :pos, :], piece, state[:, pos + head:, :]], axis=1)
        pos += head
        off += head
        if pos == RATE:
            state = dpos.permute(state, dp)
            pos = 0
    nb = (n - off) // RATE
    if nb:
        blocks = vecs_mont[:, off:off + nb * RATE, :].reshape(
            B, nb, RATE, fr.N)
        blocks = jnp.moveaxis(blocks, 1, 0)
        if dpos._pallas_enabled() and T < 32 and B * 32 <= 128:
            # whole sequential chain as ONE fused lane-parallel kernel
            # launch (ops/poseidon_chain.py): limbs in sublanes, the
            # (chain, state-element) pairs across the 128 lanes.
            from ..ops import poseidon_chain as pch

            def to_lanes(x, rows):
                # [B, rows, 16] -> [16, 128] (lane c*32 + i)
                pad = jnp.zeros((B, 32 - rows, fr.N), dtype=fr.U32)
                padded = jnp.concatenate([x, pad], axis=1)
                return jnp.moveaxis(padded, 2, 0).reshape(fr.N, B * 32)

            def pad_lanes(x):
                if x.shape[-1] == 128:
                    return x
                z = jnp.zeros(x.shape[:-1] + (128 - x.shape[-1],),
                              dtype=fr.U32)
                return jnp.concatenate([x, z], axis=-1)

            st_l = pad_lanes(to_lanes(state, T))
            blk_l = pad_lanes(jax.vmap(lambda b: to_lanes(b, RATE))(blocks))
            st_l = pch.absorb_chain_lanes(st_l, blk_l, dp)
            back = st_l[:, :B * 32].reshape(fr.N, B, 32)
            state = jnp.moveaxis(back, 0, 2)[:, :T, :]
        elif dpos._pallas_enabled():
            from ..ops import poseidon_pallas as pp
            st_bl = jnp.moveaxis(state, 0, -1)          # [t, 16, B]
            blk_bl = jnp.moveaxis(blocks, 1, -1)        # [nb, rate, 16, B]
            st_bl = pp.absorb_chain(st_bl, blk_bl, dp)
            state = jnp.moveaxis(st_bl, -1, 0)
        else:
            state = dpos.absorb_blocks(state, blocks, dp)
        off += nb * RATE
    tail = n - off
    if tail:
        piece = fr.add(state[:, :tail, :], vecs_mont[:, off:, :])
        state = jnp.concatenate([piece, state[:, tail:, :]], axis=1)
        pos = tail

    states = fr.unpack_ints(fr.from_mont(state.reshape(-1, fr.N)))
    out = []
    for b in range(B):
        tr = resume_transcript(states[b * T:(b + 1) * T], pos)
        out.append(tr.challenge(out_label))
    return out

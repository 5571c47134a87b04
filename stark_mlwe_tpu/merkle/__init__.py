"""Batched m-ary Poseidon Merkle tree engine on TPU.

Device counterpart of /root/reference/crates/merkle/src/lib.rs, bit-exact
against `stark_mlwe_tpu.spec.merkle`:

  - tree build is level-by-level batched sponge hashing on device: each
    level is ONE (or two, with a partial tail group) fused
    reshape->Poseidon call over all parents (merkle/src/lib.rs:147-193
    semantics, incl. the DsLabel 4-field preamble :57-74,:166-178),
  - pair-leaf trees hash (f, cp) with the LEAF_LEVEL_DS sentinel
    (:378-445), legacy t=17 trees chunk by RATE with the tag in the
    capacity lane (:196-223,:448-483),
  - union-of-paths multiproofs (:246-315) are assembled host-side from
    gathered device nodes (tiny), producing spec `MerkleProof` objects,
  - verifiers mirror the spec frontier reconstruction (:487-773) but
    batch each level's parent hashes into one device call, padded to
    power-of-two group counts so XLA shapes are reused across proofs.

Digests live on device in Montgomery form; host ints are materialized
only for proof assembly and transcript absorption.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import fr
from ..ops import poseidon as dpos
from ..spec.merkle import (LEAF_LEVEL_DS, MerkleChannelCfg, MerkleProof,
                           default_params)
from ..spec.poseidon import PoseidonParams, width_for_arity


# ---------------------------------------------------------------------------
# DS label rows.
# ---------------------------------------------------------------------------

def ds_rows_mont(arity: int, level: int, positions, tree_label: int):
    """[g, 4, 16] Montgomery DS preambles (DsLabel::to_fields order).

    Host-side numpy (safe to call from inside traced contexts); the three
    constant columns are packed once and tiled.
    """
    pos = np.asarray(positions, dtype=np.uint64).reshape(-1)
    g = pos.shape[0]
    consts = fr.pack_ints([arity, level, tree_label], mont=True)
    pos_limbs = fr.pack_ints([int(p) for p in pos], mont=True)
    out = np.empty((g, 4, fr.N), dtype=np.uint32)
    out[:, 0, :] = consts[0]
    out[:, 1, :] = consts[1]
    out[:, 2, :] = pos_limbs
    out[:, 3, :] = consts[2]
    return out


@partial(jax.jit, static_argnums=(2,))
def _hash_level_ds(ds_rows, chunks, dp):
    return dpos.sponge_hash_ds_dynamic(ds_rows, chunks, dp)


from functools import lru_cache


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _ds_rows_iota(arity: int, level: int, g: int, tree_label: int,
                  start: int = 0):
    """[g, 4, 16] Montgomery DS preambles computed ON DEVICE from an iota.

    The only non-constant column is the position; building it from
    `jnp.arange` + `fr.to_mont` keeps the program constants O(1), so a
    tree build inside an outer jit (fri._transcript_builder, the MF round
    chain) no longer bakes an O(n) table into the program — that table
    was what hung the remote XLA compile above n0=2^18.  Eager large
    builds also skip the tens-of-MB host build + upload per call."""
    consts = fr.pack_ints([arity, level, tree_label], mont=True)
    i = jnp.arange(start, start + g, dtype=fr.U32)
    zero = jnp.zeros_like(i)
    pos = jnp.stack([i & jnp.uint32(0xFFFF), i >> jnp.uint32(16)]
                    + [zero] * (fr.N - 2), axis=-1)
    pos_m = fr.to_mont(pos)
    c = jnp.asarray(consts)
    row = lambda j: jnp.broadcast_to(c[j][None, :], (g, fr.N))
    return jnp.stack([row(0), row(1), pos_m, row(2)], axis=1)


@lru_cache(maxsize=None)
def _ds_rows_dev_cached(arity: int, level: int, g: int, tree_label: int):
    """Device-resident DS preamble cache for EAGER small builds (skips the
    per-call host->device re-upload).  Never returned into a trace — a
    cached concrete array would become a program constant there; traced
    callers go through `_ds_rows_iota` instead."""
    return jnp.asarray(ds_rows_mont(arity, level,
                                    np.arange(g, dtype=np.uint64),
                                    tree_label))


# Above this, even eager builds use the on-device iota construction (the
# numpy build + upload costs more than computing 2 limbs + to_mont there).
_DS_IOTA_MIN_G = 1 << 14


def _ds_rows_for(arity: int, level: int, g: int, tree_label: int,
                 traced: bool):
    if traced or g >= _DS_IOTA_MIN_G:
        return _ds_rows_iota(arity, level, g, tree_label)
    return _ds_rows_dev_cached(arity, level, g, tree_label)


@lru_cache(maxsize=None)
def _ds_rows_dev(arity: int, level: int, g: int, tree_label: int):
    """DS preamble for positions 0..g-1 (identical for every prove at the
    same shape - cached to skip the per-call numpy build).  Cached as
    HOST numpy, never jnp: tree builds run inside outer jit traces
    (fri._transcript_builder), and a cached traced constant would leak
    out of its trace."""
    return ds_rows_mont(arity, level, np.arange(g, dtype=np.uint64),
                        tree_label)


@lru_cache(maxsize=None)
def _ds_row_dev(arity: int, level: int, position: int, tree_label: int):
    return ds_rows_mont(arity, level, np.array([position], np.uint64),
                        tree_label)


@partial(jax.jit, static_argnums=(2,))
def _hash_level_legacy(chunks, ds_tag_mont, dp):
    return dpos.sponge_hash_ds_legacy(chunks, ds_tag_mont, dp)


# ---------------------------------------------------------------------------
# Tree object (duck-types the spec MerkleTree for open_many/root).
# ---------------------------------------------------------------------------

class DeviceMerkleTree:
    """Per-level device digest arrays ([n_l, 16] Montgomery limbs)."""

    def __init__(self, levels_dev, arity, cfg=None, ds_tag=0, params=None):
        self.levels_dev = levels_dev
        self.arity = arity
        self.cfg = cfg
        self.ds_tag = ds_tag
        self.params = params
        self._levels_host = [None] * len(levels_dev)

    def level_ints(self, level: int) -> list:
        """Whole level as canonical ints (one bulk transfer, cached) -
        proof assembly then needs zero further device round trips."""
        if self._levels_host[level] is None:
            self._levels_host[level] = fr.unpack_ints(
                fr.from_mont(self.levels_dev[level]))
        return self._levels_host[level]

    def root(self) -> int:
        return self.level_ints(len(self.levels_dev) - 1)[0]

    def height(self) -> int:
        return len(self.levels_dev) - 1

    def num_leaves(self) -> int:
        return int(self.levels_dev[0].shape[0])

    def node_ints(self, level: int, indices) -> list:
        lvl = self.level_ints(level)
        return [lvl[i] for i in indices]

    def open_plan(self, indices):
        """Pure index planning of a union-of-paths multiproof
        (merkle/src/lib.rs:246-315): (requested, sibling indices per level,
        group sizes per level).  No value fetches."""
        assert len(indices) > 0, "open_many: empty indices"
        arity = self.arity
        cur = sorted(set(int(i) for i in indices))
        n0 = self.num_leaves()
        assert all(0 <= i < n0 for i in cur)

        sib_indices_per_level = []
        group_sizes_per_level = []
        for level in range(self.height()):
            n_level = int(self.levels_dev[level].shape[0])
            groups: dict = {}
            for i in cur:
                groups.setdefault(i // arity, []).append(i % arity)

            sib_indices = []
            level_group_sizes = []
            for parent_idx in sorted(groups):
                opened = set(groups[parent_idx])
                base = parent_idx * arity
                child_count = min(base + arity, n_level) - base
                level_group_sizes.append(child_count)
                for cpos in range(child_count):
                    if cpos not in opened:
                        sib_indices.append(base + cpos)
            sib_indices_per_level.append(sib_indices)
            group_sizes_per_level.append(level_group_sizes)
            cur = sorted(set(i // arity for i in cur))

        return (sorted(set(int(i) for i in indices)),
                sib_indices_per_level, group_sizes_per_level)

    def open_from_plan(self, plan, sibling_values_per_level) -> MerkleProof:
        req, _, group_sizes = plan
        return MerkleProof(req, sibling_values_per_level, group_sizes,
                           self.arity)

    def open_many(self, indices) -> MerkleProof:
        """Union-of-paths multiproof with values fetched from the cached
        host levels."""
        plan = self.open_plan(indices)
        _, sib_idx, _ = plan
        values = [self.node_ints(level, idxs)
                  for level, idxs in enumerate(sib_idx)]
        return self.open_from_plan(plan, values)

    open_many_single = open_many


# ---------------------------------------------------------------------------
# Builders.
# ---------------------------------------------------------------------------

def build_levels_from(cur, cfg: MerkleChannelCfg, level_start: int):
    """Hash levels upward from an arbitrary tree level: `cur` holds the
    nodes of level `level_start` (global positions 0..); returns the list
    of device level arrays from `cur` to the root."""
    dp = dpos.device_params(cfg.params)
    arity = cfg.arity
    traced = isinstance(cur, jax.core.Tracer)
    levels = [cur]
    level = level_start
    while cur.shape[0] > 1:
        n = int(cur.shape[0])
        full = n // arity
        outs = []
        if full:
            ds = _ds_rows_for(arity, level, full, cfg.tree_label, traced)
            chunks = cur[:full * arity].reshape(full, arity, fr.N)
            outs.append(_hash_level_ds(ds, chunks, dp))
        if n % arity:
            ds = _ds_row_dev(arity, level, full, cfg.tree_label)
            chunk = cur[full * arity:].reshape(1, n - full * arity, fr.N)
            outs.append(_hash_level_ds(ds, chunk, dp))
        cur = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
        levels.append(cur)
        level += 1
    return levels


def hash_level_chunk(node_chunk, cfg: MerkleChannelCfg, level: int,
                     parent_start: int):
    """One level's parent hashes for a CHUNK of `arity`-aligned nodes
    whose first parent has global position `parent_start` (the chunked
    layer-0 commit path: single buffers >= 32 MiB wedge the axon remote,
    so huge leaf levels hash chunk by chunk)."""
    dp = dpos.device_params(cfg.params)
    arity = cfg.arity
    n = int(node_chunk.shape[0])
    assert n % arity == 0
    g = n // arity
    ds = _ds_rows_iota(arity, level, g, cfg.tree_label, parent_start)
    return _hash_level_ds(ds, node_chunk.reshape(g, arity, fr.N), dp)


def build_tree(leaves_mont, cfg: MerkleChannelCfg) -> DeviceMerkleTree:
    """Single-column DS-aware tree (merkle/src/lib.rs:147-193)."""
    assert width_for_arity(cfg.arity) == cfg.params.t
    levels = build_levels_from(leaves_mont, cfg, 0)
    return DeviceMerkleTree(levels, cfg.arity, cfg=cfg)


def hash_pair_leaves(f_mont, cp_mont, cfg: MerkleChannelCfg):
    """Leaf digests H(ds(arity, LEAF_LEVEL, idx, label) || [f, cp])
    (merkle/src/lib.rs:378-388), batched."""
    n = int(f_mont.shape[0])
    dp = dpos.device_params(cfg.params)
    ds = _ds_rows_for(cfg.arity, LEAF_LEVEL_DS, n, cfg.tree_label,
                      isinstance(f_mont, jax.core.Tracer))
    inputs = jnp.stack([f_mont, cp_mont], axis=1)
    return _hash_level_ds(ds, inputs, dp)


def build_tree_pairs(f_mont, cp_mont, cfg: MerkleChannelCfg):
    return build_tree(hash_pair_leaves(f_mont, cp_mont, cfg), cfg)


def build_tree_legacy(leaves_mont, ds_tag: int,
                      params: PoseidonParams) -> DeviceMerkleTree:
    """Legacy t=17 tree, chunked by RATE, tag in capacity
    (merkle/src/lib.rs:196-223)."""
    dp = dpos.device_params(params)
    rate = params.rate
    tag_m = jnp.asarray(fr.pack_int(ds_tag, mont=True))
    levels = [leaves_mont]
    cur = leaves_mont
    while cur.shape[0] > 1:
        n = int(cur.shape[0])
        full = n // rate
        outs = []
        if full:
            chunks = cur[:full * rate].reshape(full, rate, fr.N)
            outs.append(_hash_level_legacy(chunks, tag_m, dp))
        if n % rate:
            chunk = cur[full * rate:].reshape(1, n - full * rate, fr.N)
            outs.append(_hash_level_legacy(chunk, tag_m, dp))
        cur = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
        levels.append(cur)
    return DeviceMerkleTree(levels, rate, ds_tag=ds_tag, params=params)


def build_tree_pairs_legacy(f_mont, cp_mont, ds_tag: int,
                            params: PoseidonParams) -> DeviceMerkleTree:
    dp = dpos.device_params(params)
    tag_m = jnp.asarray(fr.pack_int(ds_tag, mont=True))
    inputs = jnp.stack([f_mont, cp_mont], axis=1)
    leaves = _hash_level_legacy(inputs, tag_m, dp)
    return build_tree_legacy(leaves, ds_tag, params)


# ---------------------------------------------------------------------------
# Fast verifiers: spec frontier reconstruction with batched device hashing.
# ---------------------------------------------------------------------------

def _next_pow2(x: int) -> int:
    m = 1
    while m < x:
        m *= 2
    return m


_NATIVE_CUTOFF = 1024


def _native_cutoff(t: int) -> int:
    """Rows below this hash on the host (no device round trip).  The
    AVX-512 IFMA engine runs 8 rows per instruction stream (~24us/perm at
    t=17, ~520us at t=129 — 15-20x the scalar kernel), so its cutoff is
    raised until the device's sync+launch latency wins again."""
    from .. import native
    if native.ifma_available():
        return 8192 if t <= 33 else (2048 if t <= 65 else 1024)
    return _NATIVE_CUTOFF


def _hash_groups_ds(entries, arity, level, tree_label, params):
    """entries: list[(parent_idx, children_ints)] with equal child counts.
    Returns canonical digests.  Small batches run in the native C++
    kernel (no device round trip); large ones batch on device."""
    from .. import native
    if native.available() and len(entries) <= _native_cutoff(params.t):
        rows = [[arity, level, pidx, tree_label] + list(children)
                for pidx, children in entries]
        return native.hash_ds_dynamic_rows(rows, params)
    g = len(entries)
    gp = _next_pow2(g)
    cc = len(entries[0][1])
    rows = [e[1] for e in entries] + [entries[0][1]] * (gp - g)
    pos = [e[0] for e in entries] + [entries[0][0]] * (gp - g)
    dp = dpos.device_params(params)
    flat = [v for row in rows for v in row]
    inputs = jnp.asarray(fr.pack_ints(flat, mont=True)).reshape(gp, cc, fr.N)
    ds = ds_rows_mont(arity, level, np.array(pos, np.uint64), tree_label)
    out = _hash_level_ds(ds, inputs, dp)
    return fr.unpack_ints(out, mont=True)[:g]


def _hash_groups_legacy(entries, ds_tag, params):
    g = len(entries)
    gp = _next_pow2(g)
    cc = len(entries[0][1])
    rows = [e[1] for e in entries] + [entries[0][1]] * (gp - g)
    dp = dpos.device_params(params)
    tag_m = jnp.asarray(fr.pack_int(ds_tag, mont=True))
    flat = [v for row in rows for v in row]
    inputs = jnp.asarray(fr.pack_ints(flat, mont=True)).reshape(gp, cc, fr.N)
    out = _hash_level_legacy(inputs, tag_m, dp)
    return fr.unpack_ints(out, mont=True)[:g]


def _reconstruct_fast(root, indices, values, proof: MerkleProof,
                      hash_level_groups) -> bool:
    """Union-of-paths frontier walk (mirrors spec merkle._reconstruct,
    merkle/src/lib.rs:487-701) with `hash_level_groups(level, groups)`
    batching all parent hashes of one level; groups is
    list[(parent_idx, children_ints)]."""
    if not indices or len(indices) != len(values):
        return False
    req = sorted(set(indices))
    if proof.indices != req:
        return False
    if len(proof.siblings) != len(proof.group_sizes):
        return False
    arity = proof.arity

    val_map = dict(zip(indices, values))
    cur_indices = req
    cur_values = [val_map[i] for i in req]

    for level, (level_siblings, level_group_sizes) in enumerate(
            zip(proof.siblings, proof.group_sizes)):
        groups: dict = {}
        for idx, val in zip(cur_indices, cur_values):
            groups.setdefault(idx // arity, []).append((idx % arity, val))
        if len(groups) != len(level_group_sizes):
            return False

        assembled = []
        off = 0
        for (parent_idx, opened), child_count in zip(
                sorted(groups.items()), level_group_sizes):
            if child_count == 0 or child_count > arity:
                return False
            opened = sorted(opened)
            opened_iter = iter(opened)
            pending = next(opened_iter, None)
            children = []
            for cpos in range(child_count):
                if pending is not None and pending[0] == cpos:
                    children.append(pending[1])
                    pending = next(opened_iter, None)
                else:
                    if off >= len(level_siblings):
                        return False
                    children.append(level_siblings[off])
                    off += 1
            assembled.append((parent_idx, children))
        if off != len(level_siblings):
            return False

        # batch hashes by child_count (at most one partial tail group size)
        by_cc: dict = {}
        for gi, (pidx, children) in enumerate(assembled):
            by_cc.setdefault(len(children), []).append((gi, pidx, children))
        digests = [None] * len(assembled)
        for cc, items in by_cc.items():
            outs = hash_level_groups(
                level, [(pidx, children) for _, pidx, children in items])
            for (gi, _, _), dig in zip(items, outs):
                digests[gi] = dig

        cur_indices = [p for p, _ in assembled]
        cur_values = digests

    return len(cur_values) == 1 and cur_values[0] == root


def verify_many_ds(root, indices, values, proof, tree_label: int,
                   params: PoseidonParams) -> bool:
    """Device-accelerated verify_many_ds (merkle/src/lib.rs:587-701)."""
    if width_for_arity(proof.arity) != params.t:
        return False
    return _reconstruct_fast(
        root, indices, values, proof,
        lambda level, groups: _hash_groups_ds(
            groups, proof.arity, level, tree_label, params))


def verify_many_legacy(root, indices, values, proof, ds_tag: int,
                       params: PoseidonParams) -> bool:
    """Device-accelerated legacy verify_many (merkle/src/lib.rs:487-584)."""
    return _reconstruct_fast(
        root, indices, values, proof,
        lambda level, groups: _hash_groups_legacy(groups, ds_tag, params))


def verify_pairs_ds(root, indices, pairs, proof, tree_label: int,
                    params: PoseidonParams) -> bool:
    """Device-accelerated verify_pairs_ds (merkle/src/lib.rs:723-773)."""
    if len(indices) != len(pairs) or not indices:
        return False
    if width_for_arity(proof.arity) != params.t:
        return False
    pair_map = dict(zip(indices, pairs))
    req = sorted(set(indices))
    ordered = [pair_map[i] for i in req]
    g = len(req)
    from .. import native
    if native.available() and g <= _native_cutoff(params.t):
        rows = [[proof.arity, LEAF_LEVEL_DS, i, tree_label, f, cp]
                for i, (f, cp) in zip(req, ordered)]
        leaves = native.hash_ds_dynamic_rows(rows, params)
    else:
        gp = _next_pow2(g)
        flat = []
        for f, cp in ordered + [ordered[0]] * (gp - g):
            flat.extend((f, cp))
        arr = jnp.asarray(fr.pack_ints(flat, mont=True)).reshape(gp, 2, fr.N)
        dp = dpos.device_params(params)
        pos = np.array(req + [req[0]] * (gp - g), np.uint64)
        ds = jnp.asarray(
            ds_rows_mont(proof.arity, LEAF_LEVEL_DS, pos, tree_label))
        leaves = fr.unpack_ints(_hash_level_ds(ds, arr, dp), mont=True)[:g]
    return verify_many_ds(root, req, leaves, proof, tree_label, params)


def verify_pairs_legacy(root, indices, pairs, proof, ds_tag: int,
                        params: PoseidonParams) -> bool:
    """Device-accelerated verify_pairs legacy (merkle/src/lib.rs:704-720)."""
    if len(indices) != len(pairs) or not indices:
        return False
    entries = [(0, [f, cp]) for f, cp in pairs]
    leaves = _hash_groups_legacy(entries, ds_tag, params)
    return verify_many_legacy(root, indices, leaves, proof, ds_tag, params)


# ---------------------------------------------------------------------------
# Facades mirroring merkle/src/lib.rs:777-905.
# ---------------------------------------------------------------------------

class MerkleProver:
    """Device-backed ergonomic facade (merkle/src/lib.rs:777-855).

    commit_* take host int lists or prepacked Montgomery device arrays.
    """

    def __init__(self, cfg: MerkleChannelCfg):
        self.cfg = cfg

    def _mont(self, xs):
        if isinstance(xs, (list, tuple)):
            return jnp.asarray(fr.pack_ints(list(xs), mont=True))
        return xs

    def commit_single(self, leaves):
        tree = build_tree(self._mont(leaves), self.cfg)
        return tree.root(), tree

    def open_single(self, tree, indices):
        return tree.open_many(indices)

    def verify_single(self, root, indices, leaves, proof) -> bool:
        return verify_many_ds(root, indices, leaves, proof,
                              self.cfg.tree_label, self.cfg.params)

    def commit_pairs(self, f_vals, cp_vals):
        tree = build_tree_pairs(self._mont(f_vals), self._mont(cp_vals),
                                self.cfg)
        return tree.root(), tree

    def open_pairs(self, tree, f_vals, cp_vals, indices):
        uniq = sorted(set(indices))
        pairs = [(f_vals[i], cp_vals[i]) for i in uniq]
        return pairs, tree.open_many(uniq)

    def verify_pairs(self, root, indices, pairs, proof) -> bool:
        return verify_pairs_ds(root, indices, pairs, proof,
                               self.cfg.tree_label, self.cfg.params)


class LegacyMerkleProver:
    """Device-backed legacy facade (merkle/src/lib.rs:857-905)."""

    def __init__(self, ds_tag: int, params: PoseidonParams | None = None):
        self.ds_tag = ds_tag
        self.params = params if params is not None else default_params()

    def _mont(self, xs):
        if isinstance(xs, (list, tuple)):
            return jnp.asarray(fr.pack_ints(list(xs), mont=True))
        return xs

    def commit_pairs(self, f_vals, cp_vals):
        tree = build_tree_pairs_legacy(self._mont(f_vals),
                                       self._mont(cp_vals),
                                       self.ds_tag, self.params)
        return tree.root(), tree

    def open_pairs(self, tree, f_vals, cp_vals, indices):
        uniq = sorted(set(indices))
        pairs = [(f_vals[i], cp_vals[i]) for i in uniq]
        return pairs, tree.open_many(uniq)

    def verify_pairs(self, root, indices, pairs, proof) -> bool:
        return verify_pairs_legacy(root, indices, pairs, proof, self.ds_tag,
                                   self.params)

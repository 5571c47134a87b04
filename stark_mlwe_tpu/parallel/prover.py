"""Fully sharded `deep_fri_prove` over a JAX device mesh.

Extends the one-step demo in `parallel/__init__.py` to the ENTIRE prove
path of /root/reference/crates/deep_ali/src/fri.rs:601-641, SPMD over a
1-D mesh:

  - DEEP-ALI merge (fri.rs:536-569): each shard computes its omega-power
    window from a replicated [D,16] offset table + a local prefix scan,
    then f0 = (a*s + e - t) * inv(w - z) locally — zero collectives,
  - every FRI layer (fri.rs:231-312): m-ary folds and s-layer broadcasts
    are shard-local (contiguous shards are multiples of m), layer commits
    hash per-shard subtrees locally, `all_gather` the tiny frontier, and
    finish the top of the tree replicated — one shard_map per layer,
  - layers too small to shard (the deep tail of the schedule) fall back
    to the replicated single-chip code path,
  - Fiat–Shamir control flow (z_ell sampling, roots seed, query indices)
    is host-replicated golden-spec code — the reference's symmetric
    channel discipline (channel/src/lib.rs:24-116) under SPMD,
  - query opening (fri.rs:355-466) reuses `fri_prove_queries_dev`
    unchanged: the tree levels are global jax.Arrays sharded over the
    mesh, so the ONE batched gather reads each index from whichever
    shard owns it (XLA inserts the cross-shard collectives).

Because every hash input is position-based and shards are contiguous,
proofs are BYTE-IDENTICAL to the single-chip prover at any device count
(tests/test_parallel_prover.py asserts this at 1, 2 and 8 devices).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

from ..merkle import DeviceMerkleTree, ds_rows_mont
from ..ops import fr
from ..ops import poseidon as dpos
from ..spec.field import P, get_root_of_unity
from ..spec.fri import (DeepFriParams, DeepFriProof, FriDomain,
                        FriLayerCommitment, FriProverState,
                        FriQueryPayload, LayerOpenPayload, MerkleChannelCfg,
                        ali_sample_z_beta_fs, fri_sample_z_ell,
                        fs_seed_from_roots, layer_sizes_from_schedule,
                        pick_arity_for_layer, use_hashed_leaves)
from ..spec.merkle import LEAF_LEVEL_DS
from . import _tree_level_plan

_AXIS = "shard"


def _repl(mesh):
    return NamedSharding(mesh, PS())


def _shardspec(mesh):
    return NamedSharding(mesh, PS(_AXIS))


# ---------------------------------------------------------------------------
# Sharded DEEP-ALI merge (fri.rs:536-569 compute part).
# ---------------------------------------------------------------------------

_merge_cache: dict = {}


def _build_merge_step(mesh: Mesh, n: int):
    """f0 = (a*s + e - t) * inv(w - z), sharded; w from an offset table."""
    key = (id(mesh), n)
    if key in _merge_cache:
        return _merge_cache[key]
    D = mesh.devices.size
    local = n // D

    def step(a, s, e, t, omega_m, off_pows, z_m):
        d = jax.lax.axis_index(_AXIS)
        base = jax.lax.dynamic_index_in_dim(off_pows, d, axis=0,
                                            keepdims=False)
        w_loc = fr.mont_mul(base[None, :], fr.powers(omega_m, local))
        phi = fr.sub(fr.add(fr.mont_mul(a, s), e), t)
        invs = fr.batch_inv(fr.sub(w_loc, z_m[None, :]))
        return fr.mont_mul(phi, invs)

    sh, rp = PS(_AXIS), PS()
    fn = jax.jit(shard_map(step, mesh=mesh,
                           in_specs=(sh, sh, sh, sh, rp, rp, rp),
                           out_specs=sh, check_vma=False))
    _merge_cache[key] = fn
    return fn


def merge_f0_sharded(mesh: Mesh, a, s, e, t, omega: int, z: int):
    n = int(a.shape[0])
    D = mesh.devices.size
    assert n % D == 0
    local = n // D
    step = _build_merge_step(mesh, n)
    omega_m = jnp.asarray(fr.pack_int(omega, mont=True))
    off = fr.pack_ints([pow(omega, d * local, P) for d in range(D)],
                       mont=True)
    z_m = jnp.asarray(fr.pack_int(z, mont=True))
    return step(a, s, e, t, omega_m, jnp.asarray(off), z_m)


# ---------------------------------------------------------------------------
# Sharded layer step: fold + s-layer + commit (one shard_map per layer).
# ---------------------------------------------------------------------------

_layer_cache: dict = {}


def _build_layer_step(mesh: Mesh, n: int, m: int, arity: int, hashed: bool):
    """Jitted shard_map: f_ell (sharded) -> (f_next, s_ell, tree levels).

    m == 1 means "final layer": no fold, s is zeros (fri.rs:264-268).
    DS tables are inputs so one compiled step serves every tree_label:
      ds_leaf: [n,(4),16] sharded (pair-leaf mode only, else unused),
      ds_locals: sharded per local level, ds_tails: replicated.
    """
    from ..fri import fs as ffs

    key = (id(mesh), n, m, arity, hashed)
    if key in _layer_cache:
        return _layer_cache[key]

    D = mesh.devices.size
    local = n // D
    assert local % m == 0 if m > 1 else True
    local_sizes, tail_sizes = _tree_level_plan(n, arity, D)
    n_local_lv = len(local_sizes)
    n_tail_lv = len(tail_sizes)
    dp = dpos.device_params(MerkleChannelCfg.new(arity, tree_label=0).params)

    def step(f, fold_A, ds_leaf, ds_locals, ds_tails):
        if m > 1:
            nb = f.shape[0] // m
            f_next = fr.mat_apply(fold_A, f.reshape(nb, m, fr.N))[:, 0, :]
            s = jnp.broadcast_to(f_next[:, None, :],
                                 (nb, m, fr.N)).reshape(nb * m, fr.N)
        else:
            f_next = f[:0]
            s = jnp.zeros_like(f)
        if hashed:
            leaves = ffs.hash_leaf_pairs_dev(f, s)
        else:
            pairs = jnp.stack([f, s], axis=1)
            leaves = dpos.sponge_hash_ds_dynamic(ds_leaf, pairs, dp)
        levels = [leaves]
        cur = leaves
        for ds in ds_locals:
            cur = dpos.sponge_hash_ds_dynamic(
                ds, cur.reshape(-1, arity, fr.N), dp)
            levels.append(cur)
        cur = jax.lax.all_gather(cur, _AXIS, tiled=True)
        tails = []
        for ds in ds_tails:
            g_cur = cur.shape[0]
            full = g_cur // arity
            outs = []
            if full:
                outs.append(dpos.sponge_hash_ds_dynamic(
                    ds[:full], cur[:full * arity].reshape(full, arity, fr.N),
                    dp))
            if g_cur % arity:
                outs.append(dpos.sponge_hash_ds_dynamic(
                    ds[full:],
                    cur[full * arity:].reshape(1, g_cur - full * arity,
                                               fr.N), dp))
            cur = outs[0] if len(outs) == 1 else jnp.concatenate(outs, 0)
            tails.append(cur)
        return f_next, s, levels, tails

    sh, rp = PS(_AXIS), PS()
    fn = jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(sh, rp, sh, tuple(sh for _ in range(n_local_lv)),
                  tuple(rp for _ in range(n_tail_lv))),
        out_specs=(sh, sh, [sh] * (1 + n_local_lv), [rp] * n_tail_lv),
        check_vma=False))
    _layer_cache[key] = (fn, local_sizes, tail_sizes)
    return _layer_cache[key]


def _layer_ds_tables(n: int, arity: int, tree_label: int, D: int,
                     local_sizes, tail_sizes, hashed: bool):
    """(ds_leaf, ds_locals, ds_tails) with GLOBAL positions."""
    if hashed:
        ds_leaf = np.zeros((n, 4, fr.N), dtype=np.uint32)  # unused
    else:
        ds_leaf = ds_rows_mont(arity, LEAF_LEVEL_DS,
                               np.arange(n, dtype=np.uint64), tree_label)
    ds_locals = []
    level, g = 0, n
    for _ in local_sizes:
        g //= arity
        ds_locals.append(ds_rows_mont(arity, level,
                                      np.arange(g, dtype=np.uint64),
                                      tree_label))
        level += 1
    ds_tails = []
    for g_next in tail_sizes:
        ds_tails.append(ds_rows_mont(arity, level,
                                     np.arange(g_next, dtype=np.uint64),
                                     tree_label))
        level += 1
    return ds_leaf, ds_locals, ds_tails


def commit_and_fold_sharded(mesh: Mesh, ell: int, n: int, m: int, f_dev,
                            z: int | None):
    """One FRI layer on the mesh.  Returns (commitment, f_next or None)."""
    from ..fri import HostFieldView

    arity = pick_arity_for_layer(n, m)
    hashed = use_hashed_leaves(arity)
    cfg = MerkleChannelCfg.new(arity, tree_label=ell)
    D = mesh.devices.size
    (step, local_sizes, tail_sizes) = _build_layer_step(mesh, n, m, arity,
                                                        hashed)
    ds_leaf, ds_locals, ds_tails = _layer_ds_tables(
        n, arity, ell, D, local_sizes, tail_sizes, hashed)
    if m > 1:
        zrow = [[pow(z, tt, P) for tt in range(m)]]
        fold_A = jnp.asarray(fr.mat_scale(zrow))
    else:
        fold_A = jnp.zeros((1, 1, fr.N), dtype=fr.U32)
    f_next, s_dev, levels, tails = step(
        f_dev, fold_A, jnp.asarray(ds_leaf),
        tuple(jnp.asarray(d) for d in ds_locals),
        tuple(jnp.asarray(d) for d in ds_tails))
    tree = DeviceMerkleTree(list(levels) + list(tails), arity, cfg=cfg)
    com = FriLayerCommitment(n, m, None, HostFieldView(f_dev),
                             HostFieldView(s_dev), hashed, tree, cfg)
    return com, (f_next if m > 1 else None)


def _can_shard(n: int, m: int, D: int) -> bool:
    return n % D == 0 and (n // D) % max(m, 1) == 0 and n // D >= 1


# ---------------------------------------------------------------------------
# Full transcript build + prove (fri.rs:231-312, 601-641) on the mesh.
# ---------------------------------------------------------------------------

def fri_build_transcript_sharded(mesh: Mesh, f0_dev, domain0: FriDomain,
                                 schedule, seed_z: int) -> FriProverState:
    from ..fri import commit_layer_device, fold_layer_dev, s_layer_dev
    from ..fri import _roots_readback

    L = len(schedule)
    sizes = layer_sizes_from_schedule(domain0.size, schedule)
    z_layers = [fri_sample_z_ell(seed_z, ell, sizes[ell])
                for ell in range(L)]
    omega_layers = [get_root_of_unity(sizes[ell]) for ell in range(L)]

    layers = []
    cur = f0_dev
    sharded = True
    for ell in range(L + 1):
        n = sizes[ell]
        m = schedule[ell] if ell < L else 1
        if sharded and not _can_shard(n, m, mesh.devices.size):
            # deep tail: gather once, stay replicated (tiny layers)
            cur = jax.device_put(cur, _repl(mesh))
            sharded = False
        if sharded:
            com, f_next = commit_and_fold_sharded(
                mesh, ell, n, m, cur, z_layers[ell] if ell < L else None)
            layers.append(com)
            if f_next is not None:
                cur = f_next
        else:
            if ell < L:
                f_next = fold_layer_dev(cur, z_layers[ell], m)
                s_dev = s_layer_dev(cur, f_next, m)
            else:
                f_next, s_dev = None, jnp.zeros_like(cur)
            layers.append(_commit_replicated(ell, n, m, cur, s_dev))
            if f_next is not None:
                cur = f_next

    _roots_readback(layers)
    return FriProverState([lay.f for lay in layers],
                          [lay.s for lay in layers],
                          list(schedule), layers, omega_layers, z_layers)


def _commit_replicated(ell, n, m, f_dev, s_dev):
    from ..fri import HostFieldView, fs as ffs
    from .. import merkle as dmk

    arity = pick_arity_for_layer(n, m)
    hashed = use_hashed_leaves(arity)
    cfg = MerkleChannelCfg.new(arity, tree_label=ell)
    if hashed:
        leaves = ffs.hash_leaf_pairs_dev(f_dev, s_dev)
        tree = dmk.build_tree(leaves, cfg)
    else:
        tree = dmk.build_tree_pairs(f_dev, s_dev, cfg)
    return FriLayerCommitment(n, m, None, HostFieldView(f_dev),
                              HostFieldView(s_dev), hashed, tree, cfg)


def sharded_deep_fri_prove(mesh: Mesh, a_np, s_np, e_np, t_np, n0: int,
                           params: DeepFriParams,
                           ds_tag: bytes = b"ALI/DEEP") -> DeepFriProof:
    """Full `deep_fri_prove` (fri.rs:601-641) with every O(n) stage SPMD
    over `mesh`.  Witness columns arrive as host numpy Montgomery limb
    arrays ([n,16] uint32, `MlweWitness.to_host_limbs` packing); the FS
    column hashes run host-side exactly as the single-chip prover's.
    Output proof is byte-identical to `fri.deep_fri_prove`'s.
    """
    from ..fri import fri_prove_queries_dev, fs as ffs

    domain0 = FriDomain.new_radix2(n0)

    # --- (z, beta) FS derivation: identical to the single-chip builder --
    tags = [b"ALI/A", b"ALI/S", b"ALI/E", b"ALI/T"]
    from .. import native
    cols = [a_np, s_np, e_np, t_np]
    if native.available() and not dpos._pallas_enabled():
        ha, hs, he, ht = ffs.tagged_hash_cols_native(tags, cols)
    else:
        stacked = jnp.stack([jnp.asarray(c) for c in cols], axis=0)
        ha, hs, he, ht = ffs.tagged_hash_vecs(tags, stacked)
    seed_f = ffs.one_block_tagged_hash_batch(
        b"ALI/seed", [[ha, hs, he, ht, n0 % P]])[0]
    z, _beta = ali_sample_z_beta_fs(ds_tag, n0, seed_f)

    # --- shard witness + merge -----------------------------------------
    sh = _shardspec(mesh)
    da, ds_, de, dt_ = (jax.device_put(jnp.asarray(c), sh) for c in cols)
    f0 = merge_f0_sharded(mesh, da, ds_, de, dt_, domain0.omega, z)

    # --- layers + commits ----------------------------------------------
    st = fri_build_transcript_sharded(mesh, f0, domain0, params.schedule,
                                      params.seed_z)
    roots = [lay.root for lay in st.layers]
    roots_seed = fs_seed_from_roots(roots)
    refs_only, roots2, batches = fri_prove_queries_dev(st, params.r,
                                                       roots_seed)
    assert roots == roots2

    queries = []
    L = len(params.schedule)
    for q in range(params.r):
        payloads = []
        for ell in range(L):
            ref = refs_only[q].per_layer_refs[ell]
            payloads.append(LayerOpenPayload(
                st.layers[ell].f[ref.i],
                st.layers[ell].s[ref.i],
                st.layers[ell + 1].f[ref.parent_index],
                st.layers[ell + 1].s[ref.parent_index],
            ))
        queries.append(FriQueryPayload(
            refs_only[q].per_layer_refs, payloads,
            refs_only[q].final_index, refs_only[q].final_pair))

    return DeepFriProof(roots, batches, queries, n0, domain0.omega)


def prove_sharded(witness, params: DeepFriParams,
                  mesh: Mesh | None = None) -> DeepFriProof:
    """`stark.prove` on a mesh (all devices by default)."""
    from . import make_mesh

    if mesh is None:
        mesh = make_mesh()
    a, s, e, t = witness.to_host_limbs()
    return sharded_deep_fri_prove(mesh, a, s, e, t, len(witness.a), params)

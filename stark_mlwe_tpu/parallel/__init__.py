"""SPMD sharding of the proving pipeline over a JAX device mesh.

The reference is single-threaded Rust; its parallelism axes are the data
layouts the math exposes (SURVEY.md section 2 checklist).  Here those are
first-class:

  - the evaluation vector over H is sharded contiguously over a 1-D mesh
    ('shard'); DEEP-ALI's Phi merge and the f0 quotient are pure local
    elementwise work,
  - the barycentric Lagrange sum is a local modular reduction + an
    `all_gather` of D partial sums (D tiny) finished replicated,
  - Poseidon/Merkle leaf+subtree hashing is local per shard (contiguous
    blocks never split an arity group), the small frontier is
    `all_gather`ed and the top of the tree is finished replicated - every
    device derives the identical root, which is the reference's symmetric
    channel discipline (channel/src/lib.rs:24-116) transplanted to SPMD,
  - m-ary FRI folds are local (shard size is a multiple of the fold m).

Because hashing is position-based and shards are contiguous, proofs are
bit-identical at any device count.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as PS

from ..merkle import ds_rows_mont
from ..ops import fr
from ..ops import poseidon as dpos
from ..spec.field import P
from ..spec.poseidon import params_for_arity


# Multi-host entry point; lives in `stark_mlwe_tpu.distributed` (a module
# with no device-touching imports, so it can run BEFORE backend init —
# importing this package creates device constants).  Re-exported here for
# API continuity; multi-process launchers must import the thin module
# first (see scripts/distributed_smoke.py).
from ..distributed import initialize_distributed  # noqa: F401


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _tree_level_plan(n: int, arity: int, n_shards: int):
    """Static plan: local level sizes while divisible, then replicated tail.

    Returns (local_sizes, tail_sizes): local_sizes[i] is the per-shard node
    count hashed locally at level i; tail runs replicated after the gather.
    """
    local = n // n_shards
    local_sizes = []
    level_local = local
    while level_local % arity == 0 and level_local // arity >= 1:
        level_local //= arity
        local_sizes.append(level_local)
    tail_sizes = []
    g = level_local * n_shards
    while g > 1:
        g = -(-g // arity)
        tail_sizes.append(g)
    return local_sizes, tail_sizes


def build_sharded_prove_step(mesh: Mesh, n: int, m: int, arity: int,
                             tree_label: int = 0, axis: str = "shard"):
    """Jitted SPMD step over `mesh`: DEEP-ALI merge + hashed-leaf commit of
    (f0, s0) + m-ary fold, with the collectives described above.

    Returns (step_fn, ds_locals, ds_tail) where step_fn(a, s, e, t, w,
    z_m, scale_m, fold_A, *ds_locals) -> (root_limbs, phi_z, f1_local).
    DS tables are passed in sharded so positions stay global.
    """
    from ..fri import fs as ffs  # deferred: avoids import cycle

    D = mesh.devices.size
    assert n % D == 0 and (n // D) % m == 0 and (n // D) % arity == 0
    params = params_for_arity(arity)
    dp = dpos.device_params(params)

    local_sizes, tail_sizes = _tree_level_plan(n, arity, D)

    # Sharded DS tables for local levels (global parent positions).
    ds_locals = []
    level = 0
    g = n
    for _ in local_sizes:
        g //= arity
        ds_locals.append(ds_rows_mont(arity, level,
                                      np.arange(g, dtype=np.uint64),
                                      tree_label))
        level += 1
    # Replicated DS tables for the tail levels.
    ds_tail = []
    for g_next in tail_sizes:
        ds_tail.append(ds_rows_mont(arity, level,
                                    np.arange(g_next, dtype=np.uint64),
                                    tree_label))
        level += 1

    def step(a, s, e, t, w, z_m, scale_m, fold_A, *ds_loc):
        # --- DEEP-ALI merge (local elementwise + gathered Lagrange sum) ---
        phi = fr.sub(fr.add(fr.mont_mul(a, s), e), t)
        invs = fr.batch_inv(fr.sub(w, z_m))
        f0 = fr.mont_mul(phi, invs)
        terms = fr.mont_mul(fr.mont_mul(phi, w), invs)
        part = fr.reduce_add(terms)
        parts = jax.lax.all_gather(part, axis, tiled=False)
        phi_z = fr.mont_mul(scale_m, fr.neg(fr.reduce_add(parts)))

        # --- fold + s-layer (local: shard is a multiple of m) -------------
        nb = f0.shape[0] // m
        f1 = fr.mat_apply(fold_A, f0.reshape(nb, m, fr.N))[:, 0, :]
        s0 = jnp.broadcast_to(f1[:, None, :],
                              (nb, m, fr.N)).reshape(nb * m, fr.N)

        # --- hashed-leaf commit (fri.rs:38-44 + merkle levels) ------------
        cur = ffs.hash_leaf_pairs_dev(f0, s0)
        for ds in ds_loc:
            cur = dpos.sponge_hash_ds_dynamic(
                ds, cur.reshape(-1, arity, fr.N), dp)
        cur = jax.lax.all_gather(cur, axis, tiled=True)
        for ds in ds_tail:
            g_cur = cur.shape[0]
            full = g_cur // arity
            outs = []
            if full:
                outs.append(dpos.sponge_hash_ds_dynamic(
                    ds[:full], cur[:full * arity].reshape(full, arity, fr.N),
                    dp))
            if g_cur % arity:
                outs.append(dpos.sponge_hash_ds_dynamic(
                    ds[full:], cur[full * arity:].reshape(
                        1, g_cur - full * arity, fr.N), dp))
            cur = outs[0] if len(outs) == 1 else jnp.concatenate(outs, 0)
        root = cur[0]
        return root, phi_z, f1

    shard = PS(axis)
    repl = PS()
    in_specs = (shard, shard, shard, shard, shard, repl, repl, repl) \
        + tuple(shard for _ in ds_locals)
    out_specs = (repl, repl, shard)
    fn = shard_map(step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    return jax.jit(fn), ds_locals, ds_tail


# ---------------------------------------------------------------------------
# Four-step NTT over the mesh: column transforms -> twiddle -> all_to_all
# transpose over ICI -> row transforms (the TP analogue, SURVEY.md section 2
# item 4).  Bit-exact with ops.ntt.ntt at any device count.
# ---------------------------------------------------------------------------

def build_ntt_sharded(mesh: Mesh, n1: int, n2: int, axis: str = "shard"):
    """Jitted SPMD NTT of size n = n1*n2; input/output sharded on axis 0.

    Input x: [n, 16] Montgomery, in index order i = i1*n2 + i2; output in
    index order k = j1 + n1*j2 (both contiguously sharded).
    Requires n1 % D == 0 and n2 % D == 0.
    """
    from ..ops import ntt as dntt
    from ..spec.field import P as _P, get_root_of_unity

    D = mesh.devices.size
    assert n1 % D == 0 and n2 % D == 0
    n = n1 * n2
    omega = get_root_of_unity(n)
    # full twiddle table w^(i2*j1), laid out [n2, n1]: sharded over i2 rows
    tw = [pow(omega, i2 * j1, _P)
          for i2 in range(n2) for j1 in range(n1)]
    tw_dev = fr.pack_ints(tw, mont=True).reshape(n2, n1, fr.N)

    def step(x, tw_local):
        # x: local [n/D, 16] = rows [n1/D, n2, 16] (i1 local, i2 full)
        rows = x.reshape(n1 // D, n2, fr.N)
        # ---- transpose to column shards via all_to_all ---------------
        blk = rows.reshape(n1 // D, D, n2 // D, fr.N)
        blk = jax.lax.all_to_all(blk, axis, split_axis=1, concat_axis=0,
                                 tiled=True)
        cols_i1 = blk.reshape(n1, n2 // D, fr.N)  # [i1 full, i2 local]
        cols = jnp.swapaxes(cols_i1, 0, 1)        # [n2/D, n1, 16]
        cols = jax.vmap(dntt.ntt)(cols)           # size-n1 transforms -> j1
        cols = fr.mont_mul(cols, tw_local)        # twiddle w^(i2*j1)
        # ---- transpose back to j1 shards ------------------------------
        blk = jnp.swapaxes(cols, 0, 1)            # [n1, n2/D, 16]
        blk = blk.reshape(D, n1 // D, n2 // D, fr.N)
        blk = jax.lax.all_to_all(blk, axis, split_axis=0, concat_axis=2,
                                 tiled=True)
        rows_j1 = blk.reshape(n1 // D, n2, fr.N)  # [j1 local, i2 full]
        rows2 = jax.vmap(dntt.ntt)(rows_j1)       # size-n2 transforms -> j2
        # ---- redistribute to contiguous k = j1 + n1*j2 -----------------
        out = rows2.reshape(n1 // D, D, n2 // D, fr.N)
        out = jax.lax.all_to_all(out, axis, split_axis=1, concat_axis=0,
                                 tiled=True)
        out = out.reshape(n1, n2 // D, fr.N)      # [j1 full, j2 local]
        out = jnp.swapaxes(out, 0, 1)             # [n2/D, n1, 16]
        return out.reshape(n2 // D * n1, fr.N)

    shard = PS(axis)
    fn = shard_map(step, mesh=mesh, in_specs=(shard, shard),
                   out_specs=shard, check_vma=False)
    return jax.jit(fn), tw_dev

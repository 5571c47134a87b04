"""Device DEEP-ALI + m-ary FRI prover/verifier.

Mirrors /root/reference/crates/deep_ali/src/fri.rs end to end (golden spec
in `spec.fri`), with the hot path on device:

  - folds are ONE fused `fr.mat_apply` with the z-power row vector
    (a [n/m, m] x [m] contraction with a single Montgomery reduction per
    output; fri.rs:85-102),
  - s-layers are broadcast reshapes (fri.rs:123-143),
  - hashed-leaf commits batch one transcript permutation per leaf
    (fri.rs:38-44) and the Merkle levels hash on device,
  - Fiat-Shamir control flow (z_l sampling, roots seed, query indices)
    stays host-side and bit-exact (tiny), reusing the golden spec -
    including `fri_prove_queries` and the proof structures, which operate
    on the device trees through duck typing,
  - the verifier mirrors spec.fri.deep_fri_verify with batched device
    hashing for leaf digests and Merkle path reconstruction.

Proofs are bit-identical to the spec prover's output.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .. import merkle as dmk
from ..ops import fr
from ..spec.field import P, fr_to_bytes, get_root_of_unity
from ..spec.fri import (DeepFriParams, DeepFriProof, FriDomain,
                        FriLayerBatches, FriLayerCommitment, FriProverState,
                        FriQueryPayload, LayerOpenPayload, MerkleChannelCfg,
                        ali_sample_z_beta_fs, deep_fri_proof_size_bytes,
                        fri_prove_queries, fri_sample_z_ell,
                        fs_seed_from_roots, layer_sizes_from_schedule,
                        pick_arity_for_layer, use_hashed_leaves)
from ..spec.rng import StdRng
from . import deep_ali as dali
from . import fs


class ChunkedRows:
    """A logically-[n, 16] Montgomery array held as a list of row chunks,
    each its own device buffer.

    The axon remote wedges on single device buffers >= 32 MiB (see
    CLAUDE.md); at k >= 19 the layer-0 vectors (f0, s0, leaf digests)
    cross that, so they live as <= 2^18-row chunks.  Only duck-typed
    surface the prover touches is provided: `.shape`, per-chunk access,
    and gather support in GatherBatch.
    """

    def __init__(self, chunks):
        self.chunks = list(chunks)
        self.S = int(self.chunks[0].shape[0])
        assert all(int(c.shape[0]) == self.S for c in self.chunks[:-1])
        n = sum(int(c.shape[0]) for c in self.chunks)
        self.shape = (n, fr.N)


def chunk_rows() -> int:
    """Rows per device chunk for huge layer-0 arrays (env override for
    tests)."""
    import os
    return int(os.environ.get("STARK_CHUNK_ROWS", str(1 << 18)))


class HostFieldView:
    """Lazy canonical-int view of a device Montgomery array [n,16].

    Individual entries can be primed sparsely (from a batched gather);
    full materialization is the fallback.
    """

    def __init__(self, dev, ints=None):
        self.dev = dev
        self._ints = ints
        self._sparse: dict = {}

    def prime(self, idx_to_int: dict):
        self._sparse.update(idx_to_int)

    def _mat(self):
        if self._ints is None:
            if isinstance(self.dev, ChunkedRows):
                out = []
                for c in self.dev.chunks:
                    out.extend(fr.unpack_ints(fr.from_mont(c)))
                self._ints = out
            else:
                self._ints = fr.unpack_ints(fr.from_mont(self.dev))
        return self._ints

    def __getitem__(self, i):
        if self._ints is None and i in self._sparse:
            return self._sparse[i]
        return self._mat()[i]

    def __len__(self):
        return int(self.dev.shape[0])

    def __iter__(self):
        return iter(self._mat())


class GatherBatch:
    """Accumulates (array, indices) gathers and resolves them in ONE
    device->host round trip (a remote-attached TPU pays ~50 ms per sync).
    Index lists are padded to powers of two for shape reuse.  ChunkedRows
    arrays split into per-chunk physical gathers transparently."""

    def __init__(self):
        self._phys = []      # (array, [row indices])
        self._logical = []   # ("p", phys_ix) | ("c", count, [(pix, [out positions])])

    def add(self, arr, indices) -> int:
        """Queue a gather; returns a handle."""
        idxs = [int(i) for i in indices]
        if isinstance(arr, ChunkedRows):
            per: dict = {}
            for j, i in enumerate(idxs):
                per.setdefault(i // arr.S, []).append((j, i % arr.S))
            subs = []
            for c in sorted(per):
                items = per[c]
                pix = len(self._phys)
                self._phys.append((arr.chunks[c], [i for _, i in items]))
                subs.append((pix, [j for j, _ in items]))
            self._logical.append(("c", len(idxs), subs))
        else:
            self._logical.append(("p", len(self._phys)))
            self._phys.append((arr, idxs))
        return len(self._logical) - 1

    def run(self):
        """Resolves all gathers; returns list of int lists per handle.

        The takes + concat + domain conversion run as ONE jitted call
        (pytree-cached by array shapes): each eager dispatch on a
        remote-attached device costs ~ms, and a query pass queues ~30."""
        arrs, idx_devs, lens = [], [], []
        for arr, idxs in self._phys:
            g = max(len(idxs), 1)
            gp = 1
            while gp < g:
                gp *= 2
            padded = (idxs + [0] * (gp - len(idxs))) if idxs else [0]
            arrs.append(arr)
            idx_devs.append(jnp.asarray(padded, jnp.int32))
            lens.append(gp)
        bundle = _gather_bundle(tuple(arrs), tuple(idx_devs))
        ints = fr.unpack_ints(bundle)
        phys_res = []
        off = 0
        for gp, (_, idxs) in zip(lens, self._phys):
            phys_res.append(ints[off:off + len(idxs)])
            off += gp
        out = []
        for ent in self._logical:
            if ent[0] == "p":
                out.append(phys_res[ent[1]])
            else:
                vals = [None] * ent[1]
                for pix, pos in ent[2]:
                    for j, v in zip(pos, phys_res[pix]):
                        vals[j] = v
                out.append(vals)
        return out


@jax.jit
def _gather_bundle(arrs, idx_devs):
    return fr.from_mont(jnp.concatenate(
        [jnp.take(a, i, axis=0) for a, i in zip(arrs, idx_devs)], axis=0))


# ---------------------------------------------------------------------------
# Device folds.
# ---------------------------------------------------------------------------

from functools import lru_cache


@lru_cache(maxsize=256)
def _fold_matrix_dev(z: int, m: int):
    """Device-resident z-power contraction row (constant per (z, m) -
    z_ell depends only on (seed_z, ell, n_ell), fri.rs:59-82).

    Bounded: z is a fresh Fiat-Shamir challenge per proof per layer, so
    in a long-running prover hits only occur when the exact transcript
    is re-proven (bench reruns); an unbounded cache would grow without
    limit holding host lists + device arrays."""
    return jnp.asarray(fr.mat_scale([[pow(z, t, P) for t in range(m)]]))


def fold_layer_dev(f_dev, z: int, m: int):
    """m-ary fold f'(b) = sum_t f[b*m+t] z^t (fri.rs:85-102) as one fused
    constant-row contraction."""
    n = int(f_dev.shape[0])
    assert m >= 2 and n % m == 0
    A = _fold_matrix_dev(z, m)
    out = fr.mat_apply(A, f_dev.reshape(n // m, m, fr.N))
    return out[:, 0, :]


def s_layer_dev(f_dev, folded_dev, m: int):
    """Broadcast each parent value to its m children (fri.rs:123-143)."""
    nb = int(folded_dev.shape[0])
    return jnp.broadcast_to(folded_dev[:, None, :],
                            (nb, m, fr.N)).reshape(nb * m, fr.N)


# ---------------------------------------------------------------------------
# Layer commits (fri.rs:269-301) on device.
# ---------------------------------------------------------------------------

def commit_layer_device(ell: int, n: int, m_ell: int, f_dev, s_dev,
                        defer_root: bool = False):
    arity = pick_arity_for_layer(n, m_ell)
    hashed = use_hashed_leaves(arity)
    cfg = MerkleChannelCfg.new(arity, tree_label=ell)
    if hashed:
        leaves = fs.hash_leaf_pairs_dev(f_dev, s_dev)
        tree = dmk.build_tree(leaves, cfg)
    else:
        tree = dmk.build_tree_pairs(f_dev, s_dev, cfg)
    root = None if defer_root else tree.root()
    return FriLayerCommitment(n, m_ell, root,
                              HostFieldView(f_dev), HostFieldView(s_dev),
                              hashed, tree, cfg)


@lru_cache(maxsize=64)
def _transcript_builder(n0: int, schedule: tuple):
    """ONE jitted program for the whole fold + s-layer + commit pipeline
    of a (n0, schedule) shape: the z_l fold challenges depend only on
    (seed_z, l, n_l) (fri.rs:59-82), so they enter as traced fold-matrix
    inputs and everything else (arities, hashed-leaf mode, DS rows, tree
    level plans) is static.  Collapses ~10 dispatches per layer into one
    call - eager dispatch on a remote-attached device costs ~ms each."""
    L = len(schedule)
    sizes = layer_sizes_from_schedule(n0, list(schedule))
    metas = []
    for ell in range(L + 1):
        m_ell = schedule[ell] if ell < L else 1
        arity = pick_arity_for_layer(sizes[ell], m_ell)
        metas.append((arity, use_hashed_leaves(arity),
                      MerkleChannelCfg.new(arity, tree_label=ell)))

    def fn(f0, fold_mats):
        f_layers = [f0]
        cur = f0
        for ell, m in enumerate(schedule):
            n = int(cur.shape[0])
            cur = fr.mat_apply(fold_mats[ell],
                               cur.reshape(n // m, m, fr.N))[:, 0, :]
            f_layers.append(cur)
        s_layers = [s_layer_dev(f_layers[ell], f_layers[ell + 1],
                                schedule[ell]) for ell in range(L)]
        s_layers.append(jnp.zeros_like(f_layers[L]))
        levels_all = []
        for ell in range(L + 1):
            arity, hashed, cfg = metas[ell]
            if hashed:
                leaves = fs.hash_leaf_pairs_dev(f_layers[ell], s_layers[ell])
                tree = dmk.build_tree(leaves, cfg)
            else:
                tree = dmk.build_tree_pairs(f_layers[ell], s_layers[ell],
                                            cfg)
            levels_all.append(tuple(tree.levels_dev))
        return tuple(f_layers), tuple(s_layers), tuple(levels_all)

    return jax.jit(fn)


def _commit_layer0_chunked(f0: ChunkedRows, n0: int, m0: int, z0: int):
    """Layer-0 fold + s-layer + commit with every device buffer one
    chunk wide (<= chunk_rows() rows): per-chunk folds concatenate into
    the (single-buffer) f1, s/leaf/level-1 hashing runs chunk by chunk
    with GLOBAL DS positions, and levels >= 1 continue on the normal
    single-array path.  Proof bytes are identical to the single-array
    prover (all hashing is position-based).  Returns (commitment, f1)."""
    from ..spec.merkle import LEAF_LEVEL_DS
    from ..ops import poseidon as dpos

    S = f0.S
    arity0 = pick_arity_for_layer(n0, m0)
    hashed0 = use_hashed_leaves(arity0)
    cfg0 = MerkleChannelCfg.new(arity0, tree_label=0)
    assert S % m0 == 0 and S % arity0 == 0
    f1 = jnp.concatenate([fold_layer_dev(ch, z0, m0) for ch in f0.chunks],
                         axis=0)
    Sm, Sa = S // m0, S // arity0
    dp0 = dpos.device_params(cfg0.params)
    s_chunks, leaf_chunks, lvl1_parts = [], [], []
    for c, ch in enumerate(f0.chunks):
        f1_win = f1[c * Sm:(c + 1) * Sm]
        s_c = jnp.broadcast_to(f1_win[:, None, :],
                               (Sm, m0, fr.N)).reshape(S, fr.N)
        s_chunks.append(s_c)
        if hashed0:
            leaf_c = fs.hash_leaf_pairs_dev(ch, s_c)
        else:
            ds = dmk._ds_rows_iota(arity0, LEAF_LEVEL_DS, S,
                                   cfg0.tree_label, c * S)
            leaf_c = dmk._hash_level_ds(
                ds, jnp.stack([ch, s_c], axis=1), dp0)
        leaf_chunks.append(leaf_c)
        lvl1_parts.append(dmk.hash_level_chunk(leaf_c, cfg0, 0, c * Sa))
    lvl1 = jnp.concatenate(lvl1_parts, axis=0)
    levels = [ChunkedRows(leaf_chunks)] + dmk.build_levels_from(lvl1, cfg0,
                                                               1)
    tree = dmk.DeviceMerkleTree(levels, arity0, cfg=cfg0)
    com = FriLayerCommitment(n0, m0, None, HostFieldView(f0),
                             HostFieldView(ChunkedRows(s_chunks)),
                             hashed0, tree, cfg0)
    return com, f1


def fri_build_transcript_dev(f0_dev, domain0: FriDomain, schedule,
                             seed_z: int) -> FriProverState:
    """fri.rs:231-312 with device folds/commits; FS sampling on host."""
    L = len(schedule)
    z_layers, omega_layers = [], []
    cur_size = domain0.size
    for ell, m in enumerate(schedule):
        z_layers.append(fri_sample_z_ell(seed_z, ell, cur_size))
        omega_layers.append(get_root_of_unity(cur_size))
        cur_size //= m

    if isinstance(f0_dev, ChunkedRows):
        lay0, f1 = _commit_layer0_chunked(f0_dev, domain0.size,
                                          schedule[0], z_layers[0])
        f_layers = [f0_dev, f1]
        cur = f1
        for ell in range(1, L):
            cur = fold_layer_dev(cur, z_layers[ell], schedule[ell])
            f_layers.append(cur)
        s_layers = [lay0.s.dev] + [
            s_layer_dev(f_layers[ell], f_layers[ell + 1], schedule[ell])
            for ell in range(1, L)]
        s_layers.append(jnp.zeros_like(f_layers[L]))
        layers = [lay0]
        for ell in range(1, L + 1):
            m_ell = schedule[ell] if ell < L else 1
            layers.append(commit_layer_device(
                ell, int(f_layers[ell].shape[0]), m_ell,
                f_layers[ell], s_layers[ell], defer_root=True))
        from ..utils import phase_timer
        with phase_timer("fri/roots_readback"):
            _roots_readback(layers)
        return FriProverState([lay.f for lay in layers],
                              [lay.s for lay in layers],
                              list(schedule), layers, omega_layers,
                              z_layers)

    # The one-jit pipeline used to embed per-level DS rows as O(n)
    # program constants, which hung the remote XLA compile above 2^18;
    # merkle._ds_rows_iota now computes them in-trace from an iota, so
    # the program size is O(depth) and the pipeline compiles at any n0.
    # The env cap remains as an escape hatch to the eager per-layer path.
    import os
    max_n0 = int(os.environ.get("STARK_MEGAJIT_MAX_N0", str(1 << 22)))
    if domain0.size <= max_n0:
        builder = _transcript_builder(domain0.size, tuple(schedule))
        fold_mats = tuple(_fold_matrix_dev(z, m)
                          for z, m in zip(z_layers, schedule))
        f_layers, s_layers, levels_all = builder(f0_dev, fold_mats)

        layers = []
        for ell in range(L + 1):
            m_ell = schedule[ell] if ell < L else 1
            arity = pick_arity_for_layer(int(f_layers[ell].shape[0]), m_ell)
            hashed = use_hashed_leaves(arity)
            cfg = MerkleChannelCfg.new(arity, tree_label=ell)
            tree = dmk.DeviceMerkleTree(list(levels_all[ell]), arity,
                                        cfg=cfg)
            layers.append(FriLayerCommitment(
                int(f_layers[ell].shape[0]), m_ell, None,
                HostFieldView(f_layers[ell]), HostFieldView(s_layers[ell]),
                hashed, tree, cfg))
    else:
        f_layers = [f0_dev]
        cur = f0_dev
        for ell, m in enumerate(schedule):
            cur = fold_layer_dev(cur, z_layers[ell], m)
            f_layers.append(cur)
        s_layers = [s_layer_dev(f_layers[ell], f_layers[ell + 1],
                                schedule[ell]) for ell in range(L)]
        s_layers.append(jnp.zeros_like(f_layers[L]))
        layers = []
        for ell in range(L + 1):
            m_ell = schedule[ell] if ell < L else 1
            layers.append(commit_layer_device(
                ell, int(f_layers[ell].shape[0]), m_ell,
                f_layers[ell], s_layers[ell], defer_root=True))

    from ..utils import phase_timer
    with phase_timer("fri/roots_readback"):
        _roots_readback(layers)
    return FriProverState([lay.f for lay in layers],
                          [lay.s for lay in layers],
                          list(schedule), layers, omega_layers, z_layers)


def _roots_readback(layers):
    """One small sync: just the L+1 root digests (needed for the FS
    roots_seed before query derivation).  Everything else proof assembly
    needs is fetched later in ONE batched gather."""
    bundle = fr.from_mont(jnp.concatenate(
        [lay.tree.levels_dev[-1] for lay in layers], axis=0))
    ints = fr.unpack_ints(bundle)
    for i, lay in enumerate(layers):
        lay.tree._levels_host[-1] = [ints[i]]
        lay.root = ints[i]


# ---------------------------------------------------------------------------
# DEEP-ALI builders (fri.rs:475-570) with device compute.
# ---------------------------------------------------------------------------

def _as_mont_dev(x):
    if isinstance(x, (list, tuple)):
        return jnp.asarray(fr.pack_ints(list(x), mont=True))
    return jnp.asarray(x)


def _host_mont_cols(xs):
    """Host numpy Montgomery limb views of the witness columns, or None.

    Witness columns arrive either as int lists (packed here) or as numpy
    mont-limb arrays (the packing the caller also uploads); device arrays
    return None - the device absorb path is used then.
    """
    out = []
    for x in xs:
        if isinstance(x, (list, tuple)):
            out.append(fr.pack_ints(list(x), mont=True))
        elif isinstance(x, np.ndarray):
            out.append(x)
        else:
            return None
    return out


class DeviceDeepAliRealBuilder:
    """fri.rs:498-570: FS-derives (z, beta) from the hash of the witness
    columns, then merges on device."""

    def __init__(self, r_eval_opt=None, use_blinding=False,
                 ds_tag=b"ALI/DEEP"):
        self.r_eval_opt = r_eval_opt
        self.use_blinding = use_blinding
        self.ds_tag = ds_tag

    def build_f0(self, a, s, e, t, n0: int, domain: FriDomain):
        from .. import native
        from ..utils import phase_timer

        host_cols = _host_mont_cols((a, s, e, t))
        tags = [b"ALI/A", b"ALI/S", b"ALI/E", b"ALI/T"]
        from ..ops import poseidon as dpos
        # The sponge chain is latency-bound (one permutation per rate
        # block, strictly sequential).  The host IFMA engine runs the
        # 4 column chains in duplicated-lane mode (two MDS rows / two
        # q-columns / two S-boxes per vector, poseidon_ifma.cpp) at
        # ~92us/block vs ~210us/block for the TPU lane-parallel
        # kernel, and saves the digest readback sync.
        # STARK_CHAIN=tpu|native overrides.
        import os
        pref = os.environ.get("STARK_CHAIN", "auto")
        use_native = (host_cols is not None and native.available()
                      and (pref == "native"
                           or (pref == "auto"
                               and (native.ifma_available()
                                    or not dpos._pallas_enabled()))))
        if use_native and pref != "tpu":
            # The absorb chain is ~50% of prove wall-time at k>=16 and is
            # inherently sequential; overlap it with everything that has
            # no (z, beta) dependence: the device witness upload, the
            # phi = a*s + e - t merge, and the omega power table.  The
            # ctypes call releases the GIL, and the main thread mostly
            # blocks on tunnel I/O, so the IFMA chain keeps the core.
            import threading
            res: dict = {}
            th = threading.Thread(
                target=lambda: res.update(
                    h=fs.tagged_hash_cols_native(tags, host_cols)))
            S = chunk_rows()
            with phase_timer("ali/column_hashes+overlap"):
                th.start()
                phi16 = (None if self.use_blinding
                         else native.phi_batch_u16(
                             [native.u32limbs_to_u64(c)
                              for c in host_cols]))
                chunked = (phi16 is not None and n0 > S and n0 % S == 0)
                if chunked:
                    # huge n0: per-chunk uploads + omega windows (single
                    # >= 32 MiB buffers wedge the axon remote)
                    pows = dali.omega_powers(domain.omega, S)
                    phi_chunks, w_chunks = [], []
                    for c in range(n0 // S):
                        base = jnp.asarray(fr.pack_int(
                            pow(domain.omega, c * S, P), mont=True))
                        w_chunks.append(fr.mont_mul(base[None, :], pows))
                        phi_chunks.append(
                            jnp.asarray(phi16[c * S:(c + 1) * S]))
                    r_dev = None
                elif phi16 is not None:
                    # host-merged phi: ONE half-width column upload
                    # instead of four full-width witness columns (the
                    # ~50 MB/s h2d tunnel made the uploads the bulk of
                    # this window at k >= 17)
                    phi0 = jnp.asarray(phi16)
                    w = dali.omega_powers(domain.omega, n0)
                    r_dev = None
                else:
                    a_d, s_d, e_d, t_d = (jnp.asarray(c)
                                          for c in host_cols)
                    phi0 = dali.phi_kernel(a_d, s_d, e_d, t_d)
                    w = dali.omega_powers(domain.omega, n0)
                    r_dev = (_as_mont_dev(self.r_eval_opt)
                             if (self.use_blinding
                                 and self.r_eval_opt is not None)
                             else None)
                th.join()
            ha, hs, he, ht = res["h"]
            seed_f = fs.one_block_tagged_hash_batch(
                b"ALI/seed", [[ha, hs, he, ht, n0 % P]])[0]
            z, beta = ali_sample_z_beta_fs(self.ds_tag, n0, seed_f)
            if chunked:
                z_m = jnp.asarray(fr.pack_int(z, mont=True))
                return ChunkedRows([dali._f0_quotient(p, w_c, z_m)
                                    for p, w_c in zip(phi_chunks,
                                                      w_chunks)])
            return dali.f0_from_phi(
                phi0, w, z, beta=beta,
                r_eval=r_dev if self.use_blinding else None)

        if host_cols is not None:
            a, s, e, t = (jnp.asarray(c) for c in host_cols)
        else:
            a, s, e, t = map(_as_mont_dev, (a, s, e, t))
        with phase_timer("ali/column_hashes"):
            stacked = jnp.stack([a, s, e, t], axis=0)
            ha, hs, he, ht = fs.tagged_hash_vecs(tags, stacked)
        seed_f = fs.one_block_tagged_hash_batch(
            b"ALI/seed", [[ha, hs, he, ht, n0 % P]])[0]
        z, beta = ali_sample_z_beta_fs(self.ds_tag, n0, seed_f)
        r_dev = (_as_mont_dev(self.r_eval_opt)
                 if (self.use_blinding and self.r_eval_opt is not None)
                 else None)
        if self.use_blinding:
            f0, _, _ = dali.merge_evals_device(a, s, e, t, domain.omega, z,
                                               r_eval=r_dev, beta=beta,
                                               with_c_star=False)
        else:
            f0, _, _ = dali.merge_evals_device(a, s, e, t, domain.omega, z,
                                               with_c_star=False)
        return f0


class DeviceDeepAliMock:
    """fri.rs:480-495: deterministic pseudo-random f0 (device packing)."""

    def build_f0(self, a, s, e, t, n0: int, domain: FriDomain):
        a, s, e, t = map(_as_mont_dev, (a, s, e, t))
        stacked = jnp.stack([a, s, e, t], axis=0)
        ha, hs, he, ht = fs.tagged_hash_vecs(
            [b"ALI/a", b"ALI/s", b"ALI/e", b"ALI/t"], stacked)
        seed_f = fs.one_block_tagged_hash_batch(
            b"ALI/mock/seed", [[ha, hs, he, ht, n0 % P]])[0]
        rng = StdRng.from_seed(fr_to_bytes(seed_f))
        vals = [rng.gen_u64() % P for _ in range(n0)]
        return jnp.asarray(fr.pack_ints(vals, mont=True))


# ---------------------------------------------------------------------------
# Query-index derivation (fri.rs:355-466) with batched seed hashing.
# ---------------------------------------------------------------------------

def _index_from_seed(seed_f: int, n_pow2: int) -> int:
    rng = StdRng.from_seed(fr_to_bytes(seed_f))
    return rng.gen_u64() & (n_pow2 - 1)


def derive_query_indices_batched(roots_seed: int, schedule, r: int, sizes):
    """All (layer, query) indices with the per-(l,q) seed hashes, the
    ChaCha12 first-u64 draws AND the rare reseed fallbacks batched into
    single device/vector calls.  Bit-exact with
    spec.fri.derive_query_index (fri.rs:374-382)."""
    from ..spec.rng import chacha_first_u64_batch

    L = len(schedule)
    pairs = [(ell, q) for ell in range(L) for q in range(r)]
    seeds = fs.one_block_tagged_hash_batch(
        b"FRI/index", [[roots_seed, ell % P, q % P] for ell, q in pairs])
    draws = chacha_first_u64_batch([fr_to_bytes(s) for s in seeds])
    out = {}
    retry = []
    for (ell, q), seed, u in zip(pairs, seeds, draws):
        n = sizes[ell]
        n_pow2 = 1 << (n - 1).bit_length() if n > 1 else 1
        i0 = u & (n_pow2 - 1)
        if i0 < n:
            out[(ell, q)] = i0
        else:
            retry.append(((ell, q), seed, n, n_pow2))
    if retry:
        reseeds = fs.one_block_tagged_hash_batch(
            b"FRI/index", [[seed, 1] for _, seed, _, _ in retry])
        redraws = chacha_first_u64_batch([fr_to_bytes(s) for s in reseeds])
        for ((ell, q), _, n, n_pow2), u2 in zip(retry, redraws):
            i2 = u2 & (n_pow2 - 1)
            out[(ell, q)] = i2 if i2 < n else i2 & (n - 1)
    return out


def fri_prove_queries_dev(st: FriProverState, r: int, roots_seed: int):
    """fri.rs:355-466 with batched index derivation and ALL value fetches
    (Merkle path siblings, f/s payload entries, the final pair) resolved
    in ONE device->host gather; proof assembly is identical to
    spec.fri.fri_prove_queries."""
    from ..spec.fri import LayerBatchProof, LayerQueryRef

    L = len(st.schedule)
    sizes = [lay.n for lay in st.layers]
    idx_map = derive_query_indices_batched(roots_seed, st.schedule, r, sizes)

    child_buckets = [[] for _ in range(L)]
    parent_buckets = [[] for _ in range(L)]
    refs_per_query = []
    for q in range(r):
        per_layer = []
        for ell in range(L):
            layer = st.layers[ell]
            i = idx_map[(ell, q)]
            b = i // layer.m
            child_buckets[ell].append(i)
            parent_buckets[ell].append(b)
            per_layer.append(LayerQueryRef(i, 0, b, 0))
        refs_per_query.append(per_layer)

    # ---- plan everything, then fetch in one batch --------------------
    batch = GatherBatch()
    plans = []           # (ell, which, plan, [sibling handles per level])
    for ell in range(L):
        child_idx = sorted(set(child_buckets[ell]))
        parent_idx = sorted(set(parent_buckets[ell]))
        for which, tree, idxs in (
                ("child", st.layers[ell].tree, child_idx),
                ("parent", st.layers[ell + 1].tree, parent_idx)):
            plan = tree.open_plan(idxs)
            handles = [batch.add(tree.levels_dev[lvl], sib)
                       for lvl, sib in enumerate(plan[1])]
            plans.append((ell, which, tree, plan, handles, idxs))
    final_tree = st.layers[L].tree
    final_plan = final_tree.open_plan([0])
    final_handles = [batch.add(final_tree.levels_dev[lvl], sib)
                     for lvl, sib in enumerate(final_plan[1])]

    # payload values: f/s at child indices, f/s at parent indices,
    # plus the final layer's (f[0], s[0])
    fs_handles = {}
    for ell in range(L):
        child_idx = sorted(set(child_buckets[ell]))
        parent_idx = sorted(set(parent_buckets[ell]))
        fs_handles[(ell, "cf")] = (child_idx,
                                   batch.add(st.layers[ell].f.dev, child_idx))
        fs_handles[(ell, "cs")] = (child_idx,
                                   batch.add(st.layers[ell].s.dev, child_idx))
        fs_handles[(ell, "pf")] = (parent_idx,
                                   batch.add(st.layers[ell + 1].f.dev,
                                             parent_idx))
        fs_handles[(ell, "ps")] = (parent_idx,
                                   batch.add(st.layers[ell + 1].s.dev,
                                             parent_idx))
    h_lastf = batch.add(st.layers[L].f.dev, [0])
    h_lasts = batch.add(st.layers[L].s.dev, [0])

    resolved = batch.run()

    # prime the layer views so payload assembly needs no further syncs
    for (ell, key), (idxs, h) in fs_handles.items():
        view = {"cf": st.layers[ell].f, "cs": st.layers[ell].s,
                "pf": st.layers[ell + 1].f,
                "ps": st.layers[ell + 1].s}[key]
        view.prime(dict(zip(idxs, resolved[h])))
    st.layers[L].f.prime({0: resolved[h_lastf][0]})
    st.layers[L].s.prime({0: resolved[h_lasts][0]})

    proofs = {}
    for ell, which, tree, plan, handles, idxs in plans:
        values = [resolved[h] for h in handles]
        proofs[(ell, which)] = (idxs, tree.open_from_plan(plan, values))
    final_proof = final_tree.open_from_plan(
        final_plan, [resolved[h] for h in final_handles])

    last = st.layers[L]
    out_refs = []
    for q in range(r):
        out_refs.append(FriQueryPayload(
            refs_per_query[q], [], 0, (last.f[0], last.s[0])))

    layer_batches = []
    for ell in range(L):
        child_idx, child_proof = proofs[(ell, "child")]
        parent_idx, parent_proof = proofs[(ell, "parent")]
        for q in range(r):
            ref = out_refs[q].per_layer_refs[ell]
            ref.child_pos = child_idx.index(ref.i)
            ref.parent_pos = parent_idx.index(ref.parent_index)
        layer_batches.append(LayerBatchProof(
            st.layers[ell].hashed_leaves, child_idx, child_proof,
            parent_idx, parent_proof))

    roots = [lay.root for lay in st.layers]
    return out_refs, roots, FriLayerBatches(layer_batches, final_proof)


# ---------------------------------------------------------------------------
# End-to-end prove (fri.rs:601-641).
# ---------------------------------------------------------------------------

def deep_fri_prove(builder, a, s, e, t, n0: int,
                   params: DeepFriParams) -> DeepFriProof:
    from ..utils import phase_timer

    domain0 = FriDomain.new_radix2(n0)
    with phase_timer("fri/build_f0"):
        f0 = builder.build_f0(a, s, e, t, n0, domain0)

    with phase_timer("fri/fold+commit"):
        st = fri_build_transcript_dev(f0, domain0, params.schedule,
                                      params.seed_z)
    roots = [lay.root for lay in st.layers]
    roots_seed = fs_seed_from_roots(roots)
    with phase_timer("fri/queries"):
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


# ---------------------------------------------------------------------------
# Verify (fri.rs:643-762) with batched device hashing.
# ---------------------------------------------------------------------------

def deep_fri_verify(params: DeepFriParams, proof: DeepFriProof) -> bool:
    L = len(params.schedule)
    if len(proof.roots) != L + 1:
        return False
    if len(proof.layer_batches.layers) != L:
        return False
    if len(proof.queries) != params.r:
        return False

    sizes = layer_sizes_from_schedule(proof.n0, params.schedule)

    child_maps = [{} for _ in range(L)]
    parent_maps = [{} for _ in range(L)]
    for q in range(params.r):
        qp = proof.queries[q]
        if len(qp.per_layer_refs) != L or len(qp.per_layer_payloads) != L:
            return False
        for ell in range(L):
            ref = qp.per_layer_refs[ell]
            pay = qp.per_layer_payloads[ell]
            child_maps[ell].setdefault(ref.i, (pay.f_i, pay.s_i))
            parent_maps[ell].setdefault(ref.parent_index,
                                        (pay.f_parent_b, pay.s_parent_b))

    def verify_batch(root, indices, val_map, proof_mp, n, req_m, label):
        arity = pick_arity_for_layer(n, req_m)
        hashed = use_hashed_leaves(arity)
        cfg = MerkleChannelCfg.new(arity, tree_label=label)
        try:
            entries = [val_map[i] for i in indices]
        except KeyError:
            return False
        if hashed:
            leaves = fs.hash_leaf_pairs_ints(entries)
            return dmk.verify_many_ds(root, indices, leaves, proof_mp,
                                      cfg.tree_label, cfg.params)
        return dmk.verify_pairs_ds(root, indices, entries, proof_mp,
                                   cfg.tree_label, cfg.params)

    for ell in range(L):
        lb = proof.layer_batches.layers[ell]
        if not verify_batch(proof.roots[ell], lb.child_indices,
                            child_maps[ell], lb.child_proof,
                            sizes[ell], params.schedule[ell], ell):
            return False
        req_parent = params.schedule[ell + 1] if ell + 1 < L else 1
        if not verify_batch(proof.roots[ell + 1], lb.parent_indices,
                            parent_maps[ell], lb.parent_proof,
                            sizes[ell + 1], req_parent, ell + 1):
            return False

    # Local fold checks: s_i == f_parent[i/m] (fri.rs:169-176, :724-738).
    for q in range(params.r):
        qp = proof.queries[q]
        for ell in range(L):
            ref = qp.per_layer_refs[ell]
            pay = qp.per_layer_payloads[ell]
            m = params.schedule[ell]
            b = ref.i // m
            if b >= sizes[ell] // m:
                return False
            if pay.s_i != pay.f_parent_b:
                return False

    # Final layer: opening at index 0 (fri.rs:741-759).
    final_idx = proof.queries[0].final_index
    if final_idx != 0:
        return False
    ar_last = pick_arity_for_layer(sizes[L], 1)
    cfg_last = MerkleChannelCfg.new(ar_last, tree_label=L)
    fpair = proof.queries[0].final_pair
    if use_hashed_leaves(ar_last):
        leaf_h = fs.hash_leaf_pairs_ints([fpair])[0]
        return dmk.verify_many_ds(proof.roots[L], [0], [leaf_h],
                                  proof.layer_batches.final_proof,
                                  cfg_last.tree_label, cfg_last.params)
    return dmk.verify_pairs_ds(proof.roots[L], [0], [fpair],
                               proof.layer_batches.final_proof,
                               cfg_last.tree_label, cfg_last.params)

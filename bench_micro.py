#!/usr/bin/env python
"""Component micro-benchmarks (reference parity: poseidon.rs, merkle.rs,
protocol.rs bench surfaces + the NTT/LDE stage).

Prints one JSON line per metric:
  poseidon_perms_per_s      batched t=17 permutation throughput (1 chip)
  merkle_build_s            arity-16 DS tree of 2^16 leaves
  merkle_open_verify_ms     q=64 union-of-paths open + verify
  ntt_elems_per_s           radix-2 NTT of 2^20 elements
  mle_commit_k{12,14,16}_s  MLE commit (arity-16 tree), protocol.rs parity
  mle_open_verify_k*_q*_ms  MLE open+verify at q in {64,128}

Env: MICRO_SIZE (default full).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


_OUT = os.environ.get("MICRO_OUT", "microbench.json")
_LINES: list = []


def emit(metric, value, unit, vs=None):
    line = json.dumps({"metric": metric, "value": round(value, 6),
                       "unit": unit, "vs_baseline": vs})
    print(line, flush=True)
    _LINES.append(line)
    if _OUT:  # incremental: partial runs persist
        with open(_OUT, "w") as f:
            f.write("\n".join(_LINES) + "\n")


def sync(x):
    """Force completion via a dependent host readback.

    `block_until_ready` on the axon TPU tunnel returns before the device
    queue drains (measured: a t=129 Pallas batch 'completes' in 0.03 ms
    by block_until_ready but takes 178 ms to a host readback), so every
    timed region must end in a transfer."""
    return np.asarray(jnp.ravel(x)[:1])


def main():
    from stark_mlwe_tpu import merkle as dmk
    from stark_mlwe_tpu.ops import fr, ntt
    from stark_mlwe_tpu.ops import poseidon as dpos
    from stark_mlwe_tpu.spec.merkle import MerkleChannelCfg
    from stark_mlwe_tpu.spec.poseidon import params_for_width

    rng = np.random.default_rng(0)

    def rand_mont(n):
        return jnp.asarray(fr.pack_ints(
            [int(x) for x in rng.integers(0, 1 << 62, size=n)], mont=True))

    # --- poseidon permutation throughput -------------------------------
    params = params_for_width(17)
    dp = dpos.device_params(params)
    B = 1 << 16
    states = rand_mont(B * 17).reshape(B, 17, fr.N)
    out = dpos.permute(states, dp)
    sync(out)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = dpos.permute(out, dp)  # chained: forces real execution
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    emit("poseidon_t17_perms_per_s", B / dt, "perms/s")
    from stark_mlwe_tpu.utils import roofline
    rates = roofline.poseidon_rates(params, B / dt)
    emit("poseidon_t17_field_muls_per_s", rates["field_muls_per_s"],
         "muls/s")
    emit("poseidon_t17_equiv_int16_macs_per_s",
         rates["equiv_int16_macs_per_s"], "macs/s")

    # --- merkle build + open/verify -------------------------------------
    n = 1 << 16
    leaves = rand_mont(n)
    cfg = MerkleChannelCfg.new(16, tree_label=0)
    tree = dmk.build_tree(leaves, cfg)
    tree.root()
    t0 = time.perf_counter()
    tree = dmk.build_tree(leaves, cfg)
    root = tree.root()
    build_s = time.perf_counter() - t0
    emit("merkle_build_2e16_s", build_s, "s")

    q = 64
    idx = sorted(int(i) for i in
                 rng.choice(n, size=q, replace=False))
    proof = tree.open_many(idx)
    vals = tree.node_ints(0, idx)
    assert dmk.verify_many_ds(root, idx, vals, proof, 0, cfg.params)
    t0 = time.perf_counter()
    proof = tree.open_many(idx)
    ok = dmk.verify_many_ds(root, idx, vals, proof, 0, cfg.params)
    ov_ms = (time.perf_counter() - t0) * 1e3
    assert ok
    emit("merkle_open_verify_q64_ms", ov_ms, "ms")

    # --- NTT throughput (chunked I/O: the axon remote wedges on client
    # buffers >= 32 MiB, so 2^20+ transforms cross the boundary in
    # <= 2^18-row pieces; the transform itself is ONE jit) -------------
    S = 1 << 18

    def rand_chunks(n):
        if n <= S:
            return [rand_mont(n)]
        return [rand_mont(S) for _ in range(n // S)]

    for logm in (20, 22):
        m = 1 << logm
        xs = rand_chunks(m)
        ys = ntt.ntt_chunked(xs)
        sync(ys[-1])
        t0 = time.perf_counter()
        ys = ntt.ntt_chunked(xs)
        sync(ys[-1])
        dt = time.perf_counter() - t0
        emit(f"ntt_2e{logm}_elems_per_s", m / dt, "elems/s")
        emit(f"ntt_2e{logm}_s", dt, "s")
        emit(f"ntt_2e{logm}_field_muls_per_s",
             roofline.ntt_rates(m, dt)["field_muls_per_s"], "muls/s")

    # --- LDE blowup 4 on 2^20 (output 2^22; BASELINE config 2) ----------
    xs4 = rand_chunks(1 << 20)
    ys = ntt.lde_chunked(xs4, 4)
    sync(ys[-1])
    t0 = time.perf_counter()
    ys = ntt.lde_chunked(xs4, 4)
    sync(ys[-1])
    dt = time.perf_counter() - t0
    emit("lde_2e20_blowup4_s", dt, "s")
    emit("lde_2e20_blowup4_out_elems_per_s", (1 << 22) / dt, "elems/s")

    # --- MLE commit + open (protocol.rs:39-64 parity) --------------------
    from stark_mlwe_tpu.channel import DeviceMerkleCommitment

    for kk in (12, 14, 16):
        nv = 1 << kk
        vals = rand_mont(nv)
        scheme = DeviceMerkleCommitment(tree_label=0x11E)
        root, tree = scheme.commit(vals)  # warm shapes
        t0 = time.perf_counter()
        root, tree = scheme.commit(vals)
        root_val = root
        commit_s = time.perf_counter() - t0
        emit(f"mle_commit_k{kk}_s", commit_s, "s")
        for q in (64, 128):
            idx = sorted(int(i) for i in
                         rng.choice(nv, size=q, replace=False))
            proof = scheme.open(idx, tree)
            vals_ints = tree.node_ints(0, idx)
            assert scheme.verify(root_val, idx, vals_ints, proof)
            t0 = time.perf_counter()
            proof = scheme.open(idx, tree)
            ok = scheme.verify(root_val, idx, vals_ints, proof)
            ov_ms = (time.perf_counter() - t0) * 1e3
            assert ok
            emit(f"mle_open_verify_k{kk}_q{q}_ms", ov_ms, "ms")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-phase wall-time breakdown of `deep_fri_prove` across k values.

Answers VERDICT r4 item 2 (the k=17 superlinear step): records the
`utils.phase_timer` accumulator per (label, k) prove, after warmup, and
prints a phase x k table plus a CSV artifact (docs/PHASES.csv).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_phases.py 16 17 18
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from stark_mlwe_tpu.bench import (SEED_Z, R_QUERIES, gen_witness,  # noqa: E402
                                  witness_seed_for)
from stark_mlwe_tpu.fri import DeviceDeepAliRealBuilder, deep_fri_prove  # noqa: E402
from stark_mlwe_tpu.ops import fr  # noqa: E402
from stark_mlwe_tpu.spec.fri import DeepFriParams  # noqa: E402
from stark_mlwe_tpu.utils import profiling  # noqa: E402


def main():
    ks = [int(x) for x in sys.argv[1:]] or [16, 17, 18]
    label = os.environ.get("PROF_LABEL", "paper")
    schedule = {"paper": [16, 16, 8]}.get(label)
    if schedule is None:
        from stark_mlwe_tpu.bench import PRESETS
        schedule = dict(PRESETS)[label]
    rows = {}
    for k in ks:
        seed = witness_seed_for(label, k)
        a, s, e, t = gen_witness(k, seed)
        t_pack0 = time.perf_counter()
        cols = [fr.pack_ints(c, mont=True) for c in (a, s, e, t)]
        pack_s = time.perf_counter() - t_pack0
        params = DeepFriParams(schedule=list(schedule), r=R_QUERIES,
                               seed_z=SEED_Z)
        builder = DeviceDeepAliRealBuilder()
        deep_fri_prove(builder, *cols, 1 << k, params)  # warmup/compile
        profiling.reset_phases()
        t0 = time.perf_counter()
        deep_fri_prove(builder, *cols, 1 << k, params)
        total = time.perf_counter() - t0
        rep = profiling.phase_report()
        rep["witness_pack (excluded)"] = {"calls": 1, "total_s": pack_s}
        rep["TOTAL prove"] = {"calls": 1, "total_s": total}
        rows[k] = rep
        print(f"# k={k} prove={total:.3f}s", file=sys.stderr, flush=True)

    phases = sorted({p for r in rows.values() for p in r})
    print("phase," + ",".join(f"k{k}" for k in ks))
    lines = ["phase," + ",".join(f"k{k}" for k in ks)]
    for p in phases:
        vals = [rows[k].get(p, {}).get("total_s", 0.0) for k in ks]
        line = f"{p}," + ",".join(f"{v:.4f}" for v in vals)
        print(line)
        lines.append(line)
    out = os.environ.get("PROF_CSV", "docs/PHASES.csv")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()

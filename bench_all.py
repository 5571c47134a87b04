#!/usr/bin/env python
"""Full benchmark sweep mirroring the reference's end_to_end driver.

Writes `benchmarkdata.csv` with the reference CSV schema
(end_to_end.rs:41-59): one row per (schedule label, k) with prove/verify
timings, proof sizes and %-deltas vs the "paper" schedule.  The plain and
MF sum-check NIZK rows (a different column schema) go to a separate
artifact `benchmarkdata_nizk.csv`.

Env: BENCH_KS="11,12,16" to restrict k values; BENCH_K_HI to raise the
k ceiling past the reference grid (default 19); BENCH_LABELS to restrict
schedules; BENCH_NIZK=0 to skip the sum-check track.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from stark_mlwe_tpu.bench import (CSV_HEADER, PRESETS, csv_line,  # noqa: E402
                                  ks_for_schedule, run_mf_fri,
                                  run_mf_nizk, run_plain_nizk)


def main():
    ks_filter = None
    if os.environ.get("BENCH_KS"):
        ks_filter = {int(x) for x in os.environ["BENCH_KS"].split(",")}
    labels_filter = None
    if os.environ.get("BENCH_LABELS"):
        labels_filter = set(os.environ["BENCH_LABELS"].split(","))

    print(f"# platform={jax.default_backend()}", file=sys.stderr)
    paper_baseline = {}
    out_path = os.environ.get("BENCH_CSV", "benchmarkdata.csv")
    append = os.environ.get("BENCH_APPEND", "0") not in ("", "0")
    if append and os.path.exists(out_path):
        # staged sweeps: reuse recorded paper rows as the delta baseline
        with open(out_path) as f:
            for line in f:
                p = line.strip().split(",")
                if len(p) >= 8 and p[0] == "csv" and p[1] == "paper":
                    paper_baseline[int(p[2])] = {
                        "proof_bytes": int(p[4]), "prove_s": float(p[5]),
                        "verify_ms": float(p[6]), "eps": float(p[7])}
    print(CSV_HEADER)
    fresh = not (append and os.path.exists(out_path))
    with open(out_path, "w" if fresh else "a") as f:
        # incremental: partial sweeps persist
        if fresh:
            f.write(CSV_HEADER + "\n")
        f.flush()
        for label, schedule in PRESETS:
            if labels_filter and label not in labels_filter:
                continue
            k_hi = int(os.environ.get("BENCH_K_HI", "19"))
            for k in ks_for_schedule(schedule, k_hi=k_hi):
                if ks_filter and k not in ks_filter:
                    continue
                res = run_mf_fri(label, k)
                eps = (1 << k) / res["prove_s"]
                base = paper_baseline.get(k)
                if label == "paper":
                    paper_baseline[k] = {
                        "proof_bytes": res["proof_bytes"],
                        "prove_s": res["prove_s"],
                        "verify_ms": res["verify_ms"], "eps": eps}
                    base = None
                line = csv_line(label, k, schedule, res["proof_bytes"],
                                res["prove_s"], res["verify_ms"], base)
                print(line, flush=True)
                f.write(line + "\n")
                f.flush()

    if os.environ.get("BENCH_NIZK", "1") != "0":
        # Sum-check NIZK rows (end_to_end.rs:130-172, protocol.rs:176-273)
        # in their own artifact (their schema differs from CSV_HEADER, so
        # mixing them into benchmarkdata.csv would break column parsers).
        nizk_path = os.environ.get(
            "BENCH_NIZK_CSV",
            os.path.splitext(out_path)[0] + "_nizk.csv")
        fresh = not (append and os.path.exists(nizk_path))
        with open(nizk_path, "w" if fresh else "a") as f:
            if fresh:
                f.write("nizk,variant,k,proof_bytes,prove_s,verify_ms\n")
            for k in sorted(ks_filter or {12, 14, 16}):
                r = run_plain_nizk(k)
                line = (f"nizk,plain,{k},{r['proof_bytes']},"
                        f"{r['prove_s']:.6f},{r['verify_ms']:.3f}")
                print(line, flush=True)
                f.write(line + "\n")
                f.flush()
            for k in sorted(ks_filter or {12, 14, 16}):
                r = run_mf_nizk(k)
                line = (f"nizk,mf,{k},{r['proof_bytes']},"
                        f"{r['prove_s']:.6f},{r['verify_ms']:.3f}")
                print(line, flush=True)
                f.write(line + "\n")
                f.flush()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Headline benchmark: DEEP-ALI + m-ary FRI prove, paper schedule [16,16,8].

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Baseline: the reference's recorded criterion estimate for
e2e_mf_fri/prove-paper at the same k (BASELINE.md; k=16 -> 56.456 s on one
CPU thread).  vs_baseline is the speedup factor (baseline / ours).

Env knobs: BENCH_K (default 16), BENCH_VERIFY=0 to skip verify timing.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# Reference criterion means (seconds), e2e_mf_fri/prove-paper/<k>.
BASELINE_PROVE_S = {
    11: 1.834, 12: 3.570, 13: 7.102, 14: 14.188,
    15: 28.153, 16: 56.456, 17: 112.844, 18: 225.628,
}


def _arm_watchdog():
    """The axon remote has been observed to wedge indefinitely on a
    stuck request (CLAUDE.md landmine); abort with a diagnostic instead
    of hanging the caller forever.  BENCH_WATCHDOG_S=0 disables."""
    import signal

    budget = int(os.environ.get("BENCH_WATCHDOG_S", "2700"))
    if budget <= 0:
        return

    def _timeout(signum, frame):
        print("# bench watchdog: no result within "
              f"{budget}s (axon remote likely wedged); aborting",
              file=sys.stderr, flush=True)
        os._exit(3)

    signal.signal(signal.SIGALRM, _timeout)
    signal.alarm(budget)


def main():
    _arm_watchdog()
    k = int(os.environ.get("BENCH_K", "16"))
    check_verify = os.environ.get("BENCH_VERIFY", "1") != "0"

    from stark_mlwe_tpu.bench import run_mf_fri

    t0 = time.time()
    print(f"# platform={jax.default_backend()} devices={jax.device_count()} "
          f"k={k} schedule=[16,16,8] r=32", file=sys.stderr)
    res = run_mf_fri("paper", k, warmup=True, check_verify=check_verify)
    print(f"# prove_s={res['prove_s']:.3f} verify_ms={res['verify_ms']:.1f} "
          f"proof_bytes={res['proof_bytes']} total_wall={time.time()-t0:.1f}s",
          file=sys.stderr)

    base = BASELINE_PROVE_S.get(k)
    vs = (base / res["prove_s"]) if base else None
    print(json.dumps({
        "metric": f"deep_fri_prove_paper_k{k}",
        "value": round(res["prove_s"], 4),
        "unit": "s",
        "vs_baseline": round(vs, 3) if vs else None,
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # pragma: no cover
        if os.environ.get("STARK_MLWE_NO_PALLAS", "0") not in ("", "0"):
            raise
        # Self-heal: re-exec once on the XLA fallback path so a Pallas
        # lowering regression on new hardware/toolchains degrades the
        # number instead of zeroing the run.
        print(f"# bench failed ({type(exc).__name__}: {exc}); retrying "
              f"with STARK_MLWE_NO_PALLAS=1", file=sys.stderr)
        env = dict(os.environ, STARK_MLWE_NO_PALLAS="1")
        os.execve(sys.executable, [sys.executable] + sys.argv, env)

#!/bin/bash
# One TPU work session: the round's remaining device benchmarks in
# priority order.  Each step runs under timeout; a wedged step aborts
# the rest (the axon remote serializes requests, so continuing past a
# wedge is pointless).  Append-mode CSVs make every completed step
# durable on its own.
export PYTHONPATH=/root/.axon_site:/root/repo
export BENCH_WITNESS_CACHE=/root/repo/.wit_cache
export PYTHONUNBUFFERED=1
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*"; }

probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
print('probe ok', float(np.asarray((jnp.ones((8,8))@jnp.ones((8,8)))[0,0])))"
}

log "probe"
probe || { log "TPU unavailable"; exit 1; }

log "step 1: paper k=19 (closes the reference grid; chunked layer 0)"
BENCH_APPEND=1 BENCH_LABELS=paper BENCH_KS=19 BENCH_K_HI=22 BENCH_NIZK=0 \
  timeout 2700 python bench_all.py || exit 2

log "step 2: paper ladder k=20..22 (north star)"
BENCH_APPEND=1 BENCH_LABELS=paper BENCH_KS=20,21,22 BENCH_K_HI=22 \
  BENCH_NIZK=0 timeout 10800 python bench_all.py || exit 3

log "step 3: full preset x k grid (eager route amortizes compiles)"
STARK_MEGAJIT_MAX_N0=0 BENCH_APPEND=1 BENCH_NIZK=0 BENCH_K_HI=19 \
  BENCH_KS=11,12,13,14,15,17,18,19 \
  BENCH_LABELS=mod16,uni32x3,uni64x2x8,hi64_32_8,hi32_32_16,uni128,uni128x2,hi128_64,hi128_32,hi128_16,hi128_64_8,hi128_32_8 \
  timeout 18000 python bench_all.py || exit 4

log "step 4: phase profile k=16/17/18 (refresh docs/PHASES.csv)"
timeout 3600 python scripts/profile_phases.py 16 17 18 || exit 5

log "step 5: component microbench (chunked big-NTT rows)"
timeout 5400 python bench_micro.py || exit 6

log "ALL DONE"

#!/bin/bash
# Post-restart round-5 session: the box restart wiped every compile
# cache, so this session re-warms the flagship compiles (now persisted
# in-repo, .jax_cache/) and re-records the rows most affected by the
# round-5 prover improvements.  Append-mode CSVs keep each completed
# step durable on its own.
export PYTHONPATH=/root/.axon_site:/root/repo
export BENCH_WITNESS_CACHE=/root/repo/.wit_cache
export PYTHONUNBUFFERED=1
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*"; }

log "step 1: re-record paper k=16 (round-5 prover; mega-jit now cached)"
BENCH_APPEND=1 BENCH_LABELS=paper BENCH_KS=16 BENCH_NIZK=0 \
  timeout 3600 python bench_all.py || exit 2

log "step 2: NIZK k=16 (plain + MF with the query-gather assembly)"
BENCH_APPEND=1 BENCH_LABELS=none BENCH_KS=16 BENCH_NIZK=1 \
  timeout 3600 python bench_all.py || exit 3

log "step 3: NIZK k=12,14 MF re-record on the gather threshold"
BENCH_APPEND=1 BENCH_LABELS=none BENCH_KS=12,14 BENCH_NIZK=1 \
  timeout 3600 python bench_all.py || exit 4

log "ALL DONE"

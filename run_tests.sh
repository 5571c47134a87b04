#!/bin/bash
# Test driver: spec/harness/sharding tests on the virtual CPU mesh,
# device-kernel-heavy tests against the real TPU when present (much
# faster XLA compiles; identical results - every test compares against
# the pure-Python golden model).
set -u
fail=0

CPU_FILES="tests/test_spec_field.py tests/test_spec_poseidon.py \
tests/test_poseidon_opt.py \
tests/test_spec_merkle.py tests/test_spec_mle_deepali.py \
tests/test_spec_fri.py tests/test_spec_channel.py \
tests/test_bench_harness.py tests/test_poly_utils.py \
tests/test_spec_kat.py tests/test_serde.py tests/test_native_ifma.py \
tests/test_parallel.py tests/test_parallel_prover.py"

DEV_FILES="tests/test_ops_fr.py tests/test_ops_poseidon.py \
tests/test_ntt.py tests/test_merkle_device.py tests/test_channel_device.py \
tests/test_fri_device.py tests/test_stark_e2e.py tests/test_pallas_kernels.py"

plat=cpu
if python -c "import jax,sys; sys.exit(0 if jax.default_backend()=='tpu' else 1)" 2>/dev/null; then
  plat=tpu
fi

echo "== spec/sharding tests (cpu mesh)"
python -m pytest $CPU_FILES -q || fail=1

echo "== device tests (platform: $plat)"
STARK_TESTS_PLATFORM=$plat python -m pytest $DEV_FILES -q || fail=1

echo "== multi-host backend (2-process gloo) smoke"
python scripts/distributed_smoke.py || fail=1

exit $fail

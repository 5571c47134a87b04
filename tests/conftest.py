"""Test configuration.

Default platform is an 8-virtual-device CPU mesh (sharding tests need it,
and it works on any machine).  Device-heavy kernel tests compile much
faster against the real TPU backend; select it with
STARK_TESTS_PLATFORM=tpu (used by the repo's test driver for the
kernel-heavy files).  These env vars must be set before the first
`import jax` in the process.
"""

import os

_platform = os.environ.get("STARK_TESTS_PLATFORM", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if (_platform == "cpu"
        and "xla_cpu_parallel_codegen_split_count" not in _flags):
    # XLA:CPU's parallel LLVM codegen has segfaulted sporadically inside
    # backend_compile after ~50+ large compiles in one process (observed
    # three times at different tests in full-suite runs on this image);
    # serialising codegen removes the raced path.  CPU-only: irrelevant
    # for the TPU backend.
    _flags += " --xla_cpu_parallel_codegen_split_count=1"
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

if _platform == "cpu":
    # The axon sitecustomize re-forces JAX_PLATFORMS=axon; the config
    # update below is authoritative.
    jax.config.update("jax_platforms", "cpu")
else:
    # Persistent compilation cache, TPU only: XLA:CPU AOT cache entries
    # on this fleet reload with machine-feature mismatches ("could lead
    # to SIGILL") and have produced hard aborts; the CPU-path graphs are
    # kept scan-compact instead (ops/fr.py _compact) so cold compiles
    # are cheap.
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/repo/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

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
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: the limb-arithmetic graphs are sizeable and
# identical across test runs.
import jax  # noqa: E402

if _platform == "cpu":
    # The axon sitecustomize re-forces JAX_PLATFORMS=axon; the config
    # update below is authoritative.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.cache/stark_mlwe_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

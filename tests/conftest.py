"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding correctness is tested
on host-platform virtual devices.  These env vars must be set before the
first `import jax` anywhere in the test process.
"""

import os

# Force CPU even when the environment preselects a TPU platform (axon):
# tests validate sharding on 8 virtual host devices.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: the limb-arithmetic graphs are sizeable and
# identical across test runs.
import jax  # noqa: E402

# The axon sitecustomize re-forces JAX_PLATFORMS=axon; the config update
# below is authoritative and restores the 8-device virtual CPU platform.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/stark_mlwe_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

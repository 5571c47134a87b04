"""Probe: does Mosaic support lane-axis slicing+broadcast and lane rolls?

Tests the building blocks for a limbs-in-lanes chain kernel layout
[t, C, 16]: (a) slice one lane and broadcast-multiply, (b) lane-axis
roll on a padded frame.
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stark_mlwe_jax_cache")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def k_bcast(x_ref, o_ref):
    x = x_ref[:]                      # [17, 4, 16]
    a = x[..., 3:4]                   # lane slice [17, 4, 1]
    o_ref[:] = a * x                  # lane broadcast

def k_roll(x_ref, o_ref):
    x = x_ref[:]                      # [17, 4, 16]
    pad = jnp.zeros((17, 4, 18), jnp.uint32)
    f = jnp.concatenate([x, pad], axis=-1)     # [17, 4, 34]
    f = pltpu.roll(f, 5, axis=2)
    o_ref[:] = f[..., :16]

def run(kern, name):
    x = jnp.asarray(np.arange(17*4*16, dtype=np.uint32).reshape(17, 4, 16) % 65536)
    try:
        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((17, 4, 16), jnp.uint32),
        )(x)
        out.block_until_ready()
        print(f"{name}: OK")
        return np.asarray(out)
    except Exception as e:
        print(f"{name}: FAIL - {str(e)[:200]}")
        return None

if __name__ == "__main__":
    print("backend:", jax.default_backend())
    o1 = run(k_bcast, "lane-slice broadcast mul")
    if o1 is not None:
        x = np.arange(17*4*16, dtype=np.uint32).reshape(17, 4, 16) % 65536
        want = x[..., 3:4] * x
        print("  correct:", np.array_equal(o1, want & 0xFFFFFFFF))
    o2 = run(k_roll, "lane-axis frame roll")
    if o2 is not None:
        x = np.arange(17*4*16, dtype=np.uint32).reshape(17, 4, 16) % 65536
        f = np.concatenate([x, np.zeros((17,4,18), np.uint32)], axis=-1)
        f = np.roll(f, 5, axis=2)
        print("  correct:", np.array_equal(o2, f[..., :16]))

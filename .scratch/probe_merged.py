"""Probe merged-layout primitives for the chain-v2 kernel:
  - in-kernel reshape [t,16,C] -> [t,16*C] (collapse sublane,lane -> lane)
  - sublane-axis reduction sum over t
  - lane roll by l*C on a [t, 34*C] frame
  - tile a [t, C] slice 16x across lanes via concat
  - sublane broadcast [1, X] -> [t, X]
"""
import sys; sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/stark_mlwe_jax_cache")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, C = 17, 4

def k_all(x_ref, o1_ref, o2_ref, o3_ref, o4_ref, o5_ref):
    x = x_ref[:]                              # [T, 16, C]
    m = x.reshape(T, 16 * C)                  # collapse
    o1_ref[:] = m
    o2_ref[:] = jnp.sum(m.astype(jnp.int32), axis=0, keepdims=True).astype(jnp.uint32)
    fr = jnp.concatenate([m, jnp.zeros((T, 18 * C), jnp.uint32)], axis=-1)
    o3_ref[:] = pltpu.roll(fr, 5 * C, axis=1)
    sl = m[:, 3 * C:4 * C]                    # [T, C]
    o4_ref[:] = jnp.concatenate([sl] * 16, axis=-1)
    row = m[0:1]                              # [1, 16C]
    o5_ref[:] = jnp.broadcast_to(row, (T, 16 * C)) + m

def run():
    rng = np.random.RandomState(0)
    x = rng.randint(0, 65536, size=(T, 16, C)).astype(np.uint32)
    outs = pl.pallas_call(
        k_all,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_shape=[
            jax.ShapeDtypeStruct((T, 16 * C), jnp.uint32),
            jax.ShapeDtypeStruct((1, 16 * C), jnp.uint32),
            jax.ShapeDtypeStruct((T, 34 * C), jnp.uint32),
            jax.ShapeDtypeStruct((T, 16 * C), jnp.uint32),
            jax.ShapeDtypeStruct((T, 16 * C), jnp.uint32),
        ],
    )(jnp.asarray(x))
    m = x.reshape(T, 16 * C)
    assert np.array_equal(np.asarray(outs[0]), m); print("reshape OK")
    assert np.array_equal(np.asarray(outs[1]), m.sum(0, dtype=np.uint32)[None]); print("sublane reduce OK")
    fr = np.concatenate([m, np.zeros((T, 18 * C), np.uint32)], axis=1)
    assert np.array_equal(np.asarray(outs[2]), np.roll(fr, 5 * C, axis=1)); print("lane roll OK")
    assert np.array_equal(np.asarray(outs[3]), np.tile(m[:, 3*C:4*C], (1, 16))); print("tile OK")
    assert np.array_equal(np.asarray(outs[4]), m[0:1] + m); print("sublane bcast OK")

if __name__ == "__main__":
    print("backend:", jax.default_backend())
    run()
    print("ALL PRIMITIVES OK")

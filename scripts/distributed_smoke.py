#!/usr/bin/env python
"""2-process `jax.distributed` smoke test for `parallel.initialize_distributed`.

Proves the multi-host entry point (SURVEY.md section 2 backend spec)
actually initializes, that `make_mesh()` spans devices of BOTH processes,
that a shard_map collective crosses the process boundary, and that the
replicated Fiat-Shamir discipline holds across processes (identical
transcript bytes in -> identical challenge out, checked with a real
cross-process broadcast).

Run (parent mode, spawns the two children):
    python scripts/distributed_smoke.py
Child mode (internal):
    python scripts/distributed_smoke.py child <coordinator> <nproc> <pid>
"""

import os
import subprocess
import sys


def child(coordinator: str, nproc: int, pid: int) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ.setdefault("JAX_CPU_COLLECTIVES_IMPLEMENTATION", "gloo")

    # distributed init must precede ANY backend-touching import (the main
    # package builds device constants at import time), so go through the
    # thin side-effect-free module first.  The axon sitecustomize
    # re-forces JAX_PLATFORMS=axon at interpreter startup; the config
    # update below is authoritative (same dance as tests/conftest.py).
    import jax
    jax.config.update("jax_platforms", "cpu")
    from stark_mlwe_tpu.distributed import initialize_distributed
    initialize_distributed("127.0.0.1:" + coordinator, nproc, pid)
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as PS

    from stark_mlwe_tpu import parallel as par
    assert par.initialize_distributed is initialize_distributed
    assert jax.process_count() == nproc, jax.process_count()
    D = jax.device_count()
    assert D == 2 * nproc, D  # 2 local virtual devices per process

    # Replicated-FS discipline: every process replays the identical
    # transcript host-side and must derive the identical challenge.
    from stark_mlwe_tpu.spec.transcript import Transcript
    tr = Transcript(b"DIST/SMOKE")
    tr.absorb_bytes(b"witness-bytes")
    ch = tr.challenge(b"c") % (1 << 31)

    from jax.experimental import multihost_utils
    got = int(multihost_utils.broadcast_one_to_all(jnp.int32(ch)))
    assert got == ch, f"FS challenge diverged across processes: {got} != {ch}"

    # A collective over the GLOBAL mesh (devices of both processes).
    mesh = par.make_mesh()
    total = jax.jit(shard_map(
        lambda: jax.lax.psum(jnp.ones((1,), jnp.float32), "shard"),
        mesh=mesh, in_specs=(), out_specs=PS(), check_vma=False))()
    assert float(total[0]) == float(D), total
    print(f"child {pid}: process_count={nproc} global_devices={D} "
          f"fs_challenge_agreed psum_ok", flush=True)


def parent() -> int:
    import socket
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = str(s.getsockname()[1])
    s.close()
    nproc = 2
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "child", port,
         str(nproc), str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(nproc)]
    rc = 0
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=300)
        sys.stdout.write(out.decode())
        rc |= p.returncode
    print("distributed smoke:", "OK" if rc == 0 else f"FAILED rc={rc}")
    return rc


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
    else:
        sys.exit(parent())

"""Multi-host backend entry point (SURVEY.md section 2 backend spec).

Kept in its own module with NO heavy imports: `jax.distributed.initialize`
must run before anything initializes the XLA backend, and importing the
main package creates device constants (ops/fr.py module-level tables).
Import this module FIRST in a multi-process launcher:

    from stark_mlwe_tpu.distributed import initialize_distributed
    initialize_distributed("10.0.0.1:1234", num_processes, process_id)
    from stark_mlwe_tpu import parallel as par   # now safe
    mesh = par.make_mesh()                       # spans all hosts

Collectives over that mesh then ride ICI within a slice and DCN across
hosts.  The host-replicated Fiat-Shamir discipline (identical bytes in ->
identical challenges out on every process) is what makes the SPMD prover
correct across hosts; `scripts/distributed_smoke.py` proves both on a
2-process CPU cluster.
"""

from __future__ import annotations


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """`jax.distributed.initialize` so `make_mesh()` spans every global
    device.  No-op for a single process."""
    if not num_processes or num_processes == 1:
        return
    import jax
    jax.distributed.initialize(coordinator_address, num_processes,
                               process_id)

"""Multi-host runtime initialization.

TPU-native counterpart of the reference's MPI world setup (ggml_mpi_init /
ggml-mpi.c:30-45 and the mpirun launch in its docs): one SPMD program per
host, global device visibility through jax.distributed, collectives over
ICI within a slice and DCN across slices — no send/recv plumbing to write.

Usage on each host of a pod slice (or GKE/JobSet sets the env for you):

    from tpulamm.parallel.distributed import init_distributed
    init_distributed()                      # env-driven (TPU metadata)
    # or explicitly:
    init_distributed(coordinator="host0:8476", num_processes=4, process_id=i)

then build the global mesh with parallel.mesh.make_mesh over jax.devices()
(which now spans every host) and proceed exactly like single-host code —
pjit/GSPMD handles the rest.
"""

from __future__ import annotations

import jax


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> dict:
    """Initialize the multi-host JAX runtime; returns topology info.

    With no arguments, jax.distributed auto-discovers the topology from the
    TPU environment (GCE metadata / JobSet env vars)."""
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }

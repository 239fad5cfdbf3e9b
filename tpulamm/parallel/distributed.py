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


def add_distributed_args(p) -> None:
    """Multi-host flags shared by main/bench/server (the reference's
    mpirun -n N slot, ggml-mpi.c / SURVEY §5.8)."""
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="multi-host coordinator address "
                        "(jax.distributed); omit on single host")
    p.add_argument("--num-processes", type=int, default=None,
                   help="total number of host processes")
    p.add_argument("--process-id", type=int, default=None,
                   help="this host's process index")


def init_from_args(args) -> dict | None:
    """Initialize the multi-host runtime when any --coordinator/--num-
    processes/--process-id flag was given (None = single host, no-op).

    MUST run before the first jax backend use — on TPU pods with
    auto-discovery, pass --coordinator '' to trigger env-driven init.

    Multi-controller contract (why the Engine works unchanged): every
    process runs the same host program over the same inputs, so the
    Engine's host-side numpy mirrors (cell_pos, n_past, request feeding)
    stay bit-identical across processes by determinism; device arrays are
    globally sharded by the ('dp','tp') mesh over jax.devices() (global
    under jax.distributed), and host pulls (logits, decode rows) are
    replicated outputs, which every process can device_get locally.
    Serving entry points must therefore feed every process the same
    request stream (one frontend process broadcasting, or a shared
    queue) — the server keeps HTTP on process 0 and asserts
    process_count == 1 until a broadcast transport is wired."""
    coord = getattr(args, "coordinator", None)
    nproc = getattr(args, "num_processes", None)
    ppid = getattr(args, "process_id", None)
    if coord is None and nproc is None and ppid is None:
        return None
    info = init_distributed(coordinator=coord or None,
                            num_processes=nproc, process_id=ppid)
    import sys
    print(f"distributed: process {info['process_index']}/"
          f"{info['process_count']}, {info['local_devices']} local / "
          f"{info['global_devices']} global devices", file=sys.stderr)
    return info

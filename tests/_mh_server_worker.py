"""Subprocess worker for tests/test_multihost_server.py (not a test).

argv: coord_port pid model http_port bcast_port [opts]

opts: comma list — "lookup" enables --lookup-decoding,
"hb=<seconds>" sets the worker-loss heartbeat deadline.

Both processes initialize jax.distributed (2 procs x 4 CPU devices) and
call server.serve with IDENTICAL engine args and the broadcast channel:
process 0 runs the HTTP frontend + scheduler and mirrors every engine
call; process 1 applies the call stream (server.multihost.worker_loop)
and exits 0 when the channel closes.
"""

import sys


def main() -> int:
    coord, pid, model, http_port, bport = sys.argv[1:6]
    opts = sys.argv[6].split(",") if len(sys.argv) > 6 else []
    lookup = "lookup" in opts
    heartbeat = 5.0
    for o in opts:
        if o.startswith("hb="):
            heartbeat = float(o[3:])
    from tpulamm.parallel.distributed import init_distributed
    info = init_distributed(coordinator=f"localhost:{coord}",
                            num_processes=2, process_id=int(pid))
    assert info["global_devices"] == 8, info
    import os
    import signal
    import threading
    import time

    from tpulamm.server.server import serve
    started = threading.Event()
    if int(pid) == 0:
        # graceful teardown ordering: the jax coordination service lives
        # on THIS process, and its client agents hard-kill any process
        # that outlives it — so on SIGTERM, stop the workers over the
        # broadcast channel FIRST, give them a beat to exit, then die.
        def on_term(sig, frm):
            def stop():
                sched = getattr(started, "sched", None)
                if sched is not None:
                    sched.running = False
                    eng = sched.engine
                    if hasattr(eng, "shutdown_workers"):
                        eng.shutdown_workers()
                time.sleep(2.0)
                os._exit(0)
            threading.Thread(target=stop, daemon=True).start()
        signal.signal(signal.SIGTERM, on_term)
    serve(model, host="127.0.0.1", port=int(http_port), n_slots=2,
          n_ctx=128, tp=8, broadcast=("127.0.0.1", int(bport)),
          started=started, lookup_decoding=lookup, heartbeat=heartbeat)
    # worker path: returns on the stop frame / channel EOF. Skip the
    # interpreter teardown — the coordination poller would otherwise race
    # the frontend's exit and abort this process non-zero.
    os._exit(0)


if __name__ == "__main__":
    sys.exit(main())

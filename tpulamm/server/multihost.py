"""Multi-host serving transport: one HTTP frontend, N SPMD workers.

The reference's multi-process slot is `ggml-mpi.c` (layer-pipeline over
MPI, dead at b2430 — SURVEY §5.8); the BASELINE north star instead asks
for multi-host SERVING. TPU-native design (multi-controller JAX):

- Every process builds the SAME Engine over the GLOBAL device mesh
  (jax.distributed), exactly like cli.main's multi-host path.
- Process 0 runs the full HTTP server + scheduler. Its engine is wrapped
  in `MirroredEngine`: every state-mutating / device-stepping method call
  is serialized (method name + args — token ids and slot maps, a few
  hundred bytes) to all workers over a TCP side channel BEFORE executing
  locally, under one lock, so the frame stream is exactly process 0's
  execution order.
- Worker processes run `worker_loop`: apply each received call to their
  local Engine verbatim. Each jitted step inside those methods is the
  SPMD meeting point — XLA's collectives over the global mesh require
  every process to issue the identical computation, which the mirrored
  call stream guarantees (host-side mirrors stay bit-identical because
  Engine methods are deterministic functions of their args + state).
- All host-side DECISIONS (sampling, slot assignment, grammar, stop
  strings, HTTP) live on process 0 only; whatever they decide reaches
  workers inside the next call's args. Workers hold no Sampler, no HTTP.

Request payloads never cross the channel — only engine calls do — so the
frontend's scheduler logic (timing-dependent queue pulls) cannot diverge
across hosts.

The scheduler's opt-in lookup-speculation tier drives jitted scans
directly (not through Engine methods); it is force-disabled under
multi-host. Everything else (streaming, slots, metrics, cancel, system
prompt, OpenAI API) works unchanged.
"""

from __future__ import annotations

import pickle
import socket
import struct
import threading
import time

# Engine methods whose calls must replicate on every process: anything
# that mutates engine/device state or launches a jitted step.
MIRRORED = (
    "reset_slot", "prefill", "rollback", "decode_batch",
    "decode_batch_fast", "decode_batch_sampled", "decode_one",
    "seq_cp", "seq_rm", "seq_add", "seq_div", "move_slot", "embed",
)
_STOP = "__stop__"
# connection handshake: rejects accidental/foreign connections grabbing a
# worker slot. The channel otherwise trusts the pod network — the same
# assumption jax.distributed's own (unauthenticated) coordination service
# makes; do not expose the broadcast port beyond the cluster fabric.
_MAGIC = b"tpulamm-mh1\n"


def _send_frame(sock: socket.socket, payload: bytes) -> None:
    sock.sendall(struct.pack("<I", len(payload)) + payload)


def _recv_frame(sock: socket.socket) -> bytes | None:
    hdr = b""
    while len(hdr) < 4:
        chunk = sock.recv(4 - len(hdr))
        if not chunk:
            return None
        hdr += chunk
    (n,) = struct.unpack("<I", hdr)
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(min(1 << 20, n - len(buf)))
        if not chunk:
            return None
        buf += chunk
    return bytes(buf)


class CallBroadcaster:
    """Process-0 side: accept n_workers connections, fan frames out."""

    def __init__(self, port: int, n_workers: int, host: str = "",
                 timeout: float = 120.0):
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        # bind the coordinator interface specifically, not 0.0.0.0
        srv.bind((host or "127.0.0.1", port))
        srv.listen(n_workers)
        srv.settimeout(timeout)
        self.conns = []
        while len(self.conns) < n_workers:
            conn, addr = srv.accept()
            conn.settimeout(timeout)
            hello = conn.recv(len(_MAGIC))
            if hello != _MAGIC:      # not a tpulamm worker: drop, re-wait
                conn.close()
                continue
            conn.settimeout(None)
            conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            self.conns.append(conn)
        srv.close()

    def send(self, method: str, args: tuple, kwargs: dict) -> None:
        payload = pickle.dumps((method, args, kwargs),
                               protocol=pickle.HIGHEST_PROTOCOL)
        for c in self.conns:
            _send_frame(c, payload)

    def stop(self) -> None:
        try:
            self.send(_STOP, (), {})
        except OSError:
            pass
        for c in self.conns:
            try:
                c.close()
            except OSError:
                pass


class MirroredEngine:
    """Engine proxy for process 0: broadcast-then-execute every mirrored
    method atomically (one lock orders concurrent scheduler/HTTP-thread
    calls); everything else forwards to the wrapped Engine."""

    def __init__(self, engine, tx: CallBroadcaster):
        object.__setattr__(self, "_eng", engine)
        object.__setattr__(self, "_tx", tx)
        object.__setattr__(self, "_lock", threading.Lock())
        for name in MIRRORED:
            if hasattr(engine, name):
                object.__setattr__(self, name, self._make(name))

    def _make(self, name: str):
        fn = getattr(self._eng, name)

        def call(*args, **kwargs):
            with self._lock:
                self._tx.send(name, args, kwargs)
                return fn(*args, **kwargs)
        return call

    def __getattr__(self, name):
        return getattr(object.__getattribute__(self, "_eng"), name)

    def __setattr__(self, name, value):
        setattr(object.__getattribute__(self, "_eng"), name, value)

    def shutdown_workers(self) -> None:
        self._tx.stop()


def connect_worker(host: str, port: int, attempts: int = 120,
                   delay: float = 0.5) -> socket.socket:
    """Worker side: connect to process 0's broadcaster (with retry — the
    frontend may still be loading weights)."""
    last = None
    for _ in range(attempts):
        try:
            s = socket.create_connection((host, port), timeout=10)
            s.sendall(_MAGIC)
            s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            s.settimeout(None)
            return s
        except OSError as e:
            last = e
            time.sleep(delay)
    raise ConnectionError(f"worker could not reach {host}:{port}: {last}")


def worker_loop(engine, sock: socket.socket) -> None:
    """Apply process 0's engine-call stream to the local Engine. Returns
    on a stop frame or when the frontend closes the channel (EOF)."""
    import sys
    while True:
        payload = _recv_frame(sock)
        if payload is None:
            return
        method, args, kwargs = pickle.loads(payload)
        if method == _STOP:
            return
        try:
            getattr(engine, method)(*args, **kwargs)
        except Exception as e:  # noqa: BLE001 — mirror the frontend's
            # fallback contract: some engine calls raise as part of
            # normal scheduling (e.g. decode_batch_fast's n_ctx-overflow
            # pre-validation, which the scheduler catches and routes to
            # the plain path). Those raise identically on process 0
            # BEFORE any device step, so state stays in lockstep; the
            # worker must survive them exactly like the frontend does.
            print(f"worker: {method} raised {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)

"""Subprocess worker for tests/test_multihost.py (not a test module).

Each of two processes initializes jax.distributed against a local
coordinator, sees 4 local CPU devices (8 global), builds a tp=8 mesh
Engine over the GLOBAL device list, and runs prefill + greedy decode.
Results are dumped to JSON for the parent to compare across processes
and against a single-process reference.
"""

import json
import os
import sys


def main() -> int:
    port, pid, model, outdir = sys.argv[1:5]
    import jax  # noqa: F401  (platform pinned via env by the parent)

    from tpulamm.parallel.distributed import init_distributed
    info = init_distributed(coordinator=f"localhost:{port}",
                            num_processes=2, process_id=int(pid))
    assert info["process_count"] == 2, info
    assert info["global_devices"] == 8, info

    import numpy as np

    from tpulamm.runtime.engine import Engine
    eng = Engine(model, n_ctx=64, tp=8)
    prompt = [1, 17, 42, 5]
    eng.reset_slot(0)
    logits = eng.prefill(0, prompt)
    eng.reset_slot(0)
    toks, _ = eng.generate_fast(prompt, n_predict=8, temp=0.0,
                                stop_on_eos=False)
    with open(os.path.join(outdir, f"proc{pid}.json"), "w") as f:
        json.dump({"info": info,
                   "logits_sum": float(np.asarray(logits,
                                                  np.float64).sum()),
                   "argmax": int(np.argmax(logits)),
                   "tokens": [int(t) for t in toks]}, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())

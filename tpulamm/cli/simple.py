"""simple: the minimal generation example (examples/simple/simple.cpp).

Loads a model, evaluates a prompt, greedy-decodes n tokens on-device, and
prints throughput — the "hello world" of the API surface.

    python -m tpulamm.cli.simple -m model.gguf -p "Hello my name is" -n 32
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(prog="tpulamm-simple")
    p.add_argument("-m", "--model", required=True)
    p.add_argument("-p", "--prompt", default="Hello my name is")
    p.add_argument("-n", "--n-predict", type=int, default=32)
    p.add_argument("-c", "--ctx-size", type=int, default=2048)
    args = p.parse_args(argv)
    from tpulamm.cli._common import require_file
    require_file(p, args.model)

    from tpulamm.runtime.engine import Engine
    eng = Engine(args.model, n_ctx=args.ctx_size)
    if eng.tokenizer is None:
        p.error(f"{args.model} has no tokenizer vocab")

    t0 = time.perf_counter()
    ids, text = eng.generate_fast(args.prompt, n_predict=args.n_predict,
                                  temp=0.0)
    dt = time.perf_counter() - t0
    print(args.prompt, end="")
    print(text)
    n = len(ids)
    print(f"\ndecoded {n} tokens in {dt:.2f}s, "
          f"speed: {n / dt:.2f} t/s (includes compile on first run)",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

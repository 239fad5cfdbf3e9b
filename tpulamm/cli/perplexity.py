"""Perplexity evaluation — parity with examples/perplexity/perplexity.cpp.

Same methodology as perplexity() (perplexity.cpp:445): the corpus is
tokenized once (BOS prepended per chunk), split into n_ctx-token chunks; each
chunk is evaluated and the NLL of the second half (from min(512, n_ctx/2)) is
accumulated; PPL = exp(nll / count). This is the wikitext-2 quality metric
the per-format Δppl budgets are defined on (BASELINE.md §5).
"""

from __future__ import annotations

import argparse
import math
import sys

import numpy as np


def log_softmax(logits: np.ndarray) -> np.ndarray:
    m = logits.max(axis=-1, keepdims=True)
    x = logits - m
    return x - np.log(np.exp(x).sum(axis=-1, keepdims=True))


def compute_perplexity(engine, text: str, n_ctx: int = 512,
                       progress=True) -> dict:
    tok = engine.tokenizer
    tokens = tok.encode(text, add_bos=False)
    bos = tok.vocab.bos_id

    n_chunk = len(tokens) // n_ctx
    if n_chunk < 1:
        raise ValueError(f"corpus too short: {len(tokens)} tokens < n_ctx {n_ctx}")

    first = min(512, n_ctx // 2)
    nll = 0.0
    count = 0
    for i in range(n_chunk):
        chunk = [bos] + tokens[i * n_ctx: (i + 1) * n_ctx]
        chunk = chunk[:n_ctx]
        engine.reset_slot(0)
        logits = engine.prefill(0, chunk, logits_all=True)  # (n_ctx, vocab)
        lp = log_softmax(logits[first - 1:-1].astype(np.float64))
        targets = np.asarray(chunk[first:], np.int64)
        nll += -lp[np.arange(len(targets)), targets].sum()
        count += len(targets)
        if progress:
            ppl = math.exp(nll / count)
            print(f"[{i + 1}/{n_chunk}] ppl = {ppl:.4f}", file=sys.stderr)
    return {"ppl": math.exp(nll / count), "nll": nll / count, "tokens": count}


def main(argv=None):
    p = argparse.ArgumentParser(prog="tpulamm-perplexity")
    p.add_argument("-m", "--model", required=True)
    p.add_argument("-f", "--file", required=True, help="raw text corpus")
    p.add_argument("-c", "--ctx-size", type=int, default=512)
    p.add_argument("-b", "--batch-size", type=int, default=512)
    p.add_argument("--compute-dtype", default=None)
    args = p.parse_args(argv)

    from tpulamm.runtime.engine import Engine
    engine = Engine(args.model, n_ctx=args.ctx_size + 1,
                    n_ubatch=args.batch_size,
                    compute_dtype=args.compute_dtype)
    with open(args.file, errors="replace") as f:
        text = f.read()
    res = compute_perplexity(engine, text, n_ctx=args.ctx_size)
    print(f"Final estimate: PPL = {res['ppl']:.4f}")
    print(engine.timings.report(), file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Op-by-op roofline accounting of ONE decode step (M=1).

VERDICT r3 asked for a proof, not an assertion: where do the microseconds
of a 7B decode step go, op by op, against each op's OWN streaming bound?
This tool measures, for a loaded model (post-fusion, int8-default path):

- every distinct quantized matmul of the decode step (wqkv / wo /
  wgate|up / w_down / lm head) via hoist-proof in-scan slope timing
  (bench.py method — isolated dispatch is transport-dominated and lies),
- the int8 activation-quant prologue (_quantize_acts) per distinct K,
- attention KV streaming at a given span (byte-accurate einsum replica
  of models/transformer.py:253-307 decode attention),
- the real end-to-end step (generate_fast tg) so the table closes with
  an accounted / unaccounted split.

Reference frame: decode is the memory-bound regime
(/root/reference/README.md:727); per-op bound = bytes_streamed / HBM BW.

Run on the real chip:

    python -m tpulamm.tools.decode_roofline -m tmp_bench/llama7b_q4_0.gguf
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def slope_time(make_loop, iters=(100, 1100), reps=9) -> float:
    """Seconds per iteration: median of interleaved pair-slopes.

    Decode-regime ops are 4-50 us/call; the tunnel's host jitter is in
    the ms range, so the iteration delta must be >= tens of ms — hence
    the 1000-iteration spread (20x the matmul benchmark's)."""
    n1, n2 = iters
    loop1, loop2 = make_loop(n1), make_loop(n2)
    loop1().block_until_ready()
    loop2().block_until_ready()

    def timed(loop):
        t0 = time.perf_counter()
        loop().block_until_ready()
        return time.perf_counter() - t0

    slopes = sorted(timed(loop2) - timed(loop1) for _ in range(reps))
    return slopes[len(slopes) // 2] / (n2 - n1)


def _qmm_loop_maker(qt, k):
    import jax
    import jax.numpy as jnp

    from tpulamm.ops.pallas_qmm import qmm_pallas
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, k)) * 0.3,
                    jnp.float32)

    def make_loop(iters):
        @jax.jit
        def loop():
            def body(carry, _):
                xx = x.at[0, 0].add(carry * jnp.float32(1e-20))
                out = qmm_pallas(xx, qt)
                return out.sum(), ()
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return c
        return loop
    return make_loop


def _prologue_loop_maker(k, group):
    import jax
    import jax.numpy as jnp

    from tpulamm.ops.pallas_qmm import _quantize_acts
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, k)) * 0.3,
                    jnp.float32)

    def make_loop(iters):
        @jax.jit
        def loop():
            def body(carry, _):
                xx = x.at[0, 0].add(carry * jnp.float32(1e-20))
                qx, sx, gs = _quantize_acts(xx, group)
                return (qx.astype(jnp.float32).sum() + sx.sum()
                        + gs.sum()), ()
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return c
        return loop
    return make_loop


def _attn_loop_maker(n_heads, n_kv, head_dim, span):
    """Byte-accurate replica of the decode einsum attention
    (models/transformer.py:253-307): scores einsum over the KV span,
    masked softmax, PV einsum. K/V bf16 like the default cache."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    g = n_heads // n_kv
    kc = jnp.asarray(rng.normal(size=(1, n_kv, span, head_dim)) * 0.3,
                     jnp.bfloat16)
    vc = jnp.asarray(rng.normal(size=(1, n_kv, span, head_dim)) * 0.3,
                     jnp.bfloat16)
    q = jnp.asarray(rng.normal(size=(1, 1, n_kv, g, head_dim)),
                    jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, size=(1, 1, span)), bool)

    def make_loop(iters):
        @jax.jit
        def loop():
            def body(carry, _):
                qq = (q + carry * jnp.float32(1e-20)).astype(jnp.bfloat16)
                s = jnp.einsum("bthgd,bhsd->bhgts", qq, kc,
                               preferred_element_type=jnp.float32)
                s = jnp.where(mask[:, None, None], s, -1e30)
                p = jax.nn.softmax(s, axis=-1)
                o = jnp.einsum("bhgts,bhsd->bthgd", p.astype(jnp.bfloat16),
                               vc, preferred_element_type=jnp.float32)
                return o.sum(), ()
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return c
        return loop
    return make_loop


def qbytes(qt) -> int:
    return sum(int(np.prod(p.shape)) * p.dtype.itemsize
               for p in qt.planes.values())


def main(argv=None):
    p = argparse.ArgumentParser(prog="tpulamm-decode-roofline")
    p.add_argument("-m", "--model", required=True)
    p.add_argument("--bw-gbs", type=float, default=819.0,
                   help="HBM bandwidth for the bound column (v5e: 819)")
    p.add_argument("--span", type=int, default=512,
                   help="KV span for the attention row (tg256 from an "
                        "empty prompt runs in the 512 bucket)")
    p.add_argument("--n-predict", type=int, default=256)
    p.add_argument("--json", default=None, help="dump rows here")
    args = p.parse_args(argv)

    from tpulamm.runtime.engine import Engine
    eng = Engine(args.model, n_ctx=2048)
    cfg = eng.cfg
    lyr = eng.params["layers"][0]

    rows = []

    def add(name, count, one_call_bytes, sec):
        us = sec * 1e6
        bound = one_call_bytes / (args.bw_gbs * 1e9) * 1e6
        rows.append({
            "op": name, "count": count, "mb": one_call_bytes / 1e6,
            "us": us, "bound_us": bound,
            "eff_gbs": one_call_bytes / sec / 1e9,
            "pct_of_bound": 100.0 * bound / us,
        })
        print(f"  {name}: {us:8.1f} us  bound {bound:8.1f} us  "
              f"({rows[-1]['eff_gbs']:.0f} GB/s, "
              f"{rows[-1]['pct_of_bound']:.0f}% of bound) x{count}",
              file=sys.stderr)

    # -- quantized matmuls of the decode step (post-fusion layout) --------
    n_l = cfg.n_layers
    qmm_keys = [("wqkv_fused", n_l), ("wq", n_l), ("wk", n_l), ("wv", n_l),
                ("wo", n_l), ("wgateup_fused", n_l), ("w_gate", n_l),
                ("w_up", n_l), ("w_down", n_l)]
    from tpulamm.ops.qtensor import QTensor
    for key, count in qmm_keys:
        qt = lyr.get(key)
        if not isinstance(qt, QTensor) or qt.layout != "mm":
            continue
        n, k = qt.mm_dims
        print(f"measuring {key} ({n}x{k})...", file=sys.stderr)
        sec = slope_time(_qmm_loop_maker(qt, k))
        add(f"qmm {key} {n}x{k}", count, qbytes(qt), sec)
    out_w = eng.params.get("output")
    if isinstance(out_w, QTensor) and out_w.layout == "mm":
        n, k = out_w.mm_dims
        print(f"measuring lm head ({n}x{k})...", file=sys.stderr)
        sec = slope_time(_qmm_loop_maker(out_w, k))
        add(f"qmm lm_head {n}x{k}", 1, qbytes(out_w), sec)

    # -- int8 activation-quant prologue, per distinct K -------------------
    from tpulamm.quant.repack import SPECS
    group = SPECS[lyr["w_down"].qtype].group if isinstance(
        lyr.get("w_down"), QTensor) else 32
    ks = sorted({qt.mm_dims[1] for qt in
                 [lyr.get(k) for k, _ in qmm_keys] + [out_w]
                 if isinstance(qt, QTensor) and qt.layout == "mm"})
    for k in ks:
        print(f"measuring int8 prologue K={k}...", file=sys.stderr)
        sec = slope_time(_prologue_loop_maker(k, group))
        # bytes: read 8xK f32 + write int8 codes + scales (tiny)
        add(f"prologue K={k}", 0, 8 * k * 5, sec)

    # -- attention KV streaming at the span --------------------------------
    print(f"measuring attention span={args.span}...", file=sys.stderr)
    hd = cfg.head_dim
    sec = slope_time(_attn_loop_maker(cfg.n_heads, cfg.n_kv_heads, hd,
                                      args.span))
    kv_bytes = 2 * cfg.n_kv_heads * args.span * hd * 2
    add(f"attention S={args.span}", n_l, kv_bytes, sec)

    # -- the real end-to-end step ------------------------------------------
    print("measuring full step (generate_fast)...", file=sys.stderr)
    eng.generate_fast([1], n_predict=args.n_predict, temp=0.0,
                      stop_on_eos=False)
    best = None
    for _ in range(3):
        eng.reset_slot(0)
        eng.prefill(0, [1])
        t0 = time.perf_counter()
        eng.generate_fast([1], n_predict=args.n_predict, temp=0.0,
                          stop_on_eos=False)
        dt = (time.perf_counter() - t0) / args.n_predict
        best = dt if best is None else min(best, dt)
    step_us = best * 1e6

    acc_us = sum(r["us"] * r["count"] for r in rows)
    acc_bytes = sum(r["mb"] * r["count"] for r in rows)
    bound_us = sum(r["bound_us"] * r["count"] for r in rows)

    hdr = (f"# Decode roofline: {args.model} "
           f"(BW bound {args.bw_gbs:.0f} GB/s)")
    lines = [hdr, "",
             "| op | xN | MB/call | us/call | bound us | eff GB/s | "
             "% of bound |", "|---|---|---|---|---|---|---|"]
    for r in rows:
        lines.append(
            f"| {r['op']} | {r['count']} | {r['mb']:.1f} | {r['us']:.1f} "
            f"| {r['bound_us']:.1f} | {r['eff_gbs']:.0f} "
            f"| {r['pct_of_bound']:.0f}% |")
    lines += [
        "",
        f"- full step measured: {step_us:,.0f} us/token "
        f"({1e6 / step_us:,.1f} t/s)",
        f"- sum of measured ops: {acc_us:,.0f} us "
        f"({100 * acc_us / step_us:.0f}% of step; "
        f"{acc_bytes:,.0f} MB streamed)",
        f"- sum of op bounds: {bound_us:,.0f} us "
        f"(pure-streaming ceiling {1e6 / bound_us:,.1f} t/s)",
        f"- unaccounted (norms/rope/KV-writes/sampling/scan overhead): "
        f"{step_us - acc_us:,.0f} us",
    ]
    print("\n".join(lines))
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"rows": rows, "step_us": step_us,
                       "acc_us": acc_us, "bound_us": bound_us,
                       "model": args.model, "bw_gbs": args.bw_gbs}, f,
                      indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Performance regression gate.

Runs bench.py's flagship metric (and optionally the e2e tg256) and fails
if results drop below recorded floors — the automated guard the round-1
review noted was missing (regressions like the KV-layout one were only
caught by manually re-running benches).

    python -m tpulamm.tools.perf_gate                # matmul gate only
    python -m tpulamm.tools.perf_gate -m model.gguf  # + decode gate

Floors sit 15% under the round-5 measured medians. The r5 measurement
hardening (interleaved median-of-9 pair slopes over a 400-step spread —
the old 40-step spread lived inside the tunnel's ms-scale jitter and
produced the "±15-20% band" that forced 25-40% floor margins) makes the
per-format ordering stable and physical (monotone in unpack complexity:
q4_0 > q8_0 > q4_1 > q5_0 > q5_1 > q2_k > f32), so a 15% margin now
catches regressions the old floors would have waved through.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

# r5 medians: flagship 119.3k GFLOPS, 7B-shape tg256 via --model
FLOOR_MATMUL_GFLOPS = 100_000.0
FLOOR_TG256 = 450.0

# = round-5 hardened-measurement medians x 0.85
FLOOR_FMT_GFLOPS = {
    "f32": 73_000, "q4_0": 99_000, "q4_1": 94_000, "q5_0": 85_000,
    "q5_1": 83_000, "q8_0": 96_000, "q2_k": 79_000,
}
FLOOR_FMT_TG256 = {
    "q4_0": 607.0, "q4_1": 481.0, "q5_0": 466.0, "q5_1": 429.0,
    "q8_0": 431.0, "q2_k": 330.0,
}


def main(argv=None):
    p = argparse.ArgumentParser(prog="tpulamm-perf-gate")
    p.add_argument("-m", "--model", default=None,
                   help="GGUF for the decode (tg256) gate")
    p.add_argument("--matmul-floor", type=float, default=FLOOR_MATMUL_GFLOPS)
    p.add_argument("--tg-floor", type=float, default=FLOOR_TG256)
    p.add_argument("--formats", action="store_true",
                   help="gate the flagship matmul on EVERY quant format "
                        "(FLOOR_FMT_GFLOPS)")
    p.add_argument("--e2e-pattern", default=None, metavar="PATH{fmt}",
                   help="gate per-format tg256 from models at this "
                        "pattern (FLOOR_FMT_TG256), e.g. "
                        "tmp_bench/tiny11b_{fmt}.gguf")
    args = p.parse_args(argv)

    failures = []
    if args.formats:
        from tpulamm.tools.perf_report import bench_matmul
        for q, floor in FLOOR_FMT_GFLOPS.items():
            g = bench_matmul(q)
            print(f"matmul {q}: {g:,.0f} GFLOPS (floor {floor:,.0f})")
            if g < floor:
                failures.append(f"matmul {q} {g:,.0f} < floor {floor:,.0f}")
    if args.e2e_pattern:
        from tpulamm.tools.perf_report import bench_model
        for q, floor in FLOOR_FMT_TG256.items():
            path = args.e2e_pattern.replace("{fmt}", q)
            import os as _os
            if not _os.path.isfile(path):
                failures.append(f"e2e model missing: {path}")
                continue
            r = bench_model(path)
            print(f"tg256 {q}: {r['tg256']:,.1f} tok/s (floor {floor:,.1f})")
            if r["tg256"] < floor:
                failures.append(
                    f"tg256 {q} {r['tg256']:,.1f} < floor {floor:,.1f}")
    import os
    bench = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", "..", "bench.py")
    out = subprocess.run([sys.executable, bench],
                         capture_output=True, text=True, timeout=3600)
    line = next((ln for ln in out.stdout.splitlines()
                 if ln.startswith("{")), None)
    if line is None:
        print(out.stdout, out.stderr, file=sys.stderr)
        failures.append("bench.py produced no metric")
    else:
        r = json.loads(line)
        print(f"matmul: {r['value']:,.0f} GFLOPS "
              f"(floor {args.matmul_floor:,.0f})")
        if r["value"] < args.matmul_floor:
            failures.append(
                f"matmul {r['value']:,.0f} < floor {args.matmul_floor:,.0f}")

    if args.model:
        from tpulamm.runtime.engine import Engine
        eng = Engine(args.model, n_ctx=512)
        eng.generate_fast([1], n_predict=256, temp=0.0, stop_on_eos=False)
        best = 0.0
        for _ in range(3):
            eng.reset_slot(0)
            eng.prefill(0, [1])
            t0 = time.perf_counter()
            eng.generate_fast([1], n_predict=256, temp=0.0,
                              stop_on_eos=False)
            best = max(best, 256 / (time.perf_counter() - t0))
        print(f"tg256: {best:,.1f} tok/s (floor {args.tg_floor:,.1f})")
        if best < args.tg_floor:
            failures.append(f"tg256 {best:,.1f} < floor {args.tg_floor:,.1f}")

    if failures:
        print("PERF GATE FAILED:\n  " + "\n  ".join(failures),
              file=sys.stderr)
        return 1
    print("perf gate ok")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Performance harness — parity with the reference's pytest benchmark suite
(test/test_matmult_performance.py, test/test_inference_performance.py,
test/collect_results.py): parametrized over --dtype, measures the kernel
GFLOPS and end-to-end pp/tg tokens/s, and appends JSON lines to
perf_results.jsonl for tools/collect_results.py to tabulate.

On the CPU CI mesh these numbers are tiny and only validate the harness
plumbing; on a TPU (run pytest with JAX_PLATFORMS unset) they are the real
measurements.
"""

import json
import os
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpulamm.gguf.constants import GGMLType
from tpulamm.ops.qmatmul import qmatmul
from tpulamm.ops.qtensor import QTensor

LOG_PATH = os.environ.get("TPULAMM_PERF_LOG", "perf_results.jsonl")

_DTYPE_MAP = {"f32": GGMLType.F32, "q2_k": GGMLType.Q2_K,
              "q4_0": GGMLType.Q4_0, "q4_1": GGMLType.Q4_1,
              "q5_0": GGMLType.Q5_0, "q5_1": GGMLType.Q5_1,
              "q8_0": GGMLType.Q8_0}


def _log(record: dict):
    record["device"] = jax.default_backend()
    record["ts"] = time.time()
    with open(LOG_PATH, "a") as f:
        f.write(json.dumps(record) + "\n")


def test_matmult_performance(dtype):
    """Reference methodology (la-benchmark-matmult): GFLOPS = 2*M*K*N/t on
    the 4096x11008 weight; rel-err gate 1e-2 vs f32."""
    qtype = _DTYPE_MAP[dtype]
    on_tpu = jax.default_backend() not in ("cpu",)
    N, K, M = (4096, 11008, 128) if on_tpu else (512, 1024, 16)
    rng = np.random.default_rng(0)
    w = np.abs(rng.normal(size=(N, K)) * 0.5).astype(np.float32)
    x = np.abs(rng.normal(size=(M, K)) * 0.5).astype(np.float32)
    ref_sum = float((x.astype(np.float64) @ w.astype(np.float64).T).sum())

    if qtype == GGMLType.F32:
        wd = jnp.asarray(w, jnp.bfloat16 if on_tpu else jnp.float32)
        xd = jnp.asarray(x, wd.dtype)
        fn = jax.jit(lambda a, b: (a @ b.T).astype(jnp.float32))
        out = fn(xd, wd).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(xd, wd)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / 5
    else:
        qt = QTensor.from_float(w, qtype, layout="mm")
        xd = jnp.asarray(x, jnp.bfloat16 if on_tpu else jnp.float32)
        fn = jax.jit(lambda a: qmatmul(a, qt))
        out = fn(xd).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(xd)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / 5

    got = float(np.asarray(out, np.float64).sum())
    rel = abs(got - ref_sum) / max(abs(ref_sum), 1e-9)
    tol = 1e-2 if qtype != GGMLType.Q2_K else 5e-2  # 2-bit: wider gate
    assert rel <= tol, f"sum rel err {rel:.4f}"
    gflops = 2.0 * M * K * N / dt / 1e9
    _log({"test": "matmult", "dtype": dtype, "gflops": round(gflops, 2),
          "shape": [M, K, N]})
    assert gflops > 0


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    pytest.importorskip("transformers")
    import torch
    import transformers

    from tpulamm.tools.convert_hf import convert_hf
    torch.manual_seed(0)
    m = transformers.LlamaForCausalLM(transformers.LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256))
    m.eval()
    d = tmp_path_factory.mktemp("perf")
    return m, str(d)


def test_inference_performance(dtype, tiny_model):
    """Reference methodology (test_inference_performance.py): run generation
    and scrape prompt-eval / eval tokens per second."""
    from tpulamm.cli.quantize import NAMES, quantize_file
    from tpulamm.runtime.engine import Engine
    from tpulamm.tools.convert_hf import convert_hf

    m, d = tiny_model
    base = os.path.join(d, "base.gguf")
    if not os.path.exists(base):
        convert_hf(m, base, qtype=GGMLType.F32)
    path = base
    if dtype != "f32":
        path = os.path.join(d, f"m.{dtype}.gguf")
        if not os.path.exists(path):
            quantize_file(base, path, NAMES[dtype], verbose=False)

    eng = Engine(path, n_ctx=128)
    toks = list(np.random.default_rng(0).integers(3, 500, 48))
    eng.prefill(0, toks)                       # warm compile
    eng.reset_slot(0)
    t0 = time.perf_counter()
    eng.prefill(0, toks)
    pp = len(toks) / (time.perf_counter() - t0)

    eng.generate_fast([1], n_predict=4, stop_on_eos=False)   # warm
    eng.reset_slot(0)
    eng.prefill(0, [1])
    t0 = time.perf_counter()
    eng.generate_fast([1], n_predict=16, temp=0.0, stop_on_eos=False)
    tg = 16 / (time.perf_counter() - t0)
    _log({"test": "inference", "dtype": dtype,
          "prompt_tps": round(pp, 2), "gen_tps": round(tg, 2)})
    assert pp > 0 and tg > 0


def test_batched_and_ctx_plumbing(tiny_model):
    """perf_report's --batched / --ctx-scan sections run end-to-end on a
    tiny CPU model (numbers meaningless; validates the harness)."""
    from tpulamm.tools.convert_hf import convert_hf
    from tpulamm.tools.perf_report import bench_batched, bench_ctx_scaling

    m, d = tiny_model
    path = os.path.join(d, "plumb.gguf")
    if not os.path.exists(path):
        convert_hf(m, path, qtype=GGMLType.Q8_0)
    rows = bench_batched(path, pls=(1, 2), n_pp=4, n_tg=4, n_ctx=32)
    assert [r["pl"] for r in rows] == [1, 2]
    assert all(r["agg_ts"] > 0 for r in rows)
    rows = bench_ctx_scaling(path, ctxs=(32,))
    assert rows[0]["n_ctx"] == 32 and rows[0]["tg256"] > 0

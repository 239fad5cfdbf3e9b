"""Multi-host runtime: 2-process CPU test of the jax.distributed consumer.

The reference slot this fills: ggml-mpi.c's mpirun -n N world (SURVEY
§5.8). Two host processes with 4 virtual CPU devices each initialize
jax.distributed against a local coordinator and run the SAME mesh Engine
(tp=8 over the 8 GLOBAL devices). Multi-controller correctness = both
processes compute identical results, and those match a single-process
8-device reference — which exercises exactly the property the Engine's
host-side state relies on (deterministic, replicated host mirrors).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import torch
import transformers

pytest.importorskip("transformers")

from tpulamm.gguf.constants import GGMLType  # noqa: E402
from tpulamm.tools.convert_hf import convert_hf  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    torch.manual_seed(0)
    m = transformers.LlamaForCausalLM(transformers.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=8,
        max_position_embeddings=128))
    m.eval()
    path = str(tmp_path_factory.mktemp("mh") / "m.gguf")
    convert_hf(m, path, qtype=GGMLType.F32)
    return path


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _subproc_env() -> dict:
    """CPU platform, 4 virtual devices, and CRUCIALLY no TPU-plugin
    sitecustomize on PYTHONPATH (it initializes the jax backend at import
    time, before jax.distributed.initialize can run)."""
    env = dict(os.environ)
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join([ROOT] + pp)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    return env


def test_two_process_mesh_engine(model_path, tmp_path):
    port = _free_port()
    env = _subproc_env()
    worker = os.path.join(ROOT, "tests", "_multihost_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(pid), model_path,
         str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for pid in range(2)]
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]

    res = [json.load(open(tmp_path / f"proc{i}.json")) for i in range(2)]
    # both controllers computed the identical replicated result
    assert res[0]["tokens"] == res[1]["tokens"]
    assert res[0]["argmax"] == res[1]["argmax"]
    assert abs(res[0]["logits_sum"] - res[1]["logits_sum"]) < 1e-6

    # and it matches a single-process 8-device mesh reference
    from tpulamm.runtime.engine import Engine
    ref = Engine(model_path, n_ctx=64, tp=8)
    prompt = [1, 17, 42, 5]
    ref.reset_slot(0)
    logits = ref.prefill(0, prompt)
    ref.reset_slot(0)
    toks, _ = ref.generate_fast(prompt, n_predict=8, temp=0.0,
                                stop_on_eos=False)
    assert res[0]["tokens"] == [int(t) for t in toks]
    assert res[0]["argmax"] == int(np.argmax(logits))
    np.testing.assert_allclose(res[0]["logits_sum"],
                               float(np.asarray(logits, np.float64).sum()),
                               rtol=1e-5)

"""Abort/cancel (ggml.c:18328 abort_callback, test-model-load-cancel.cpp)
and post-context-shift defrag (llama_kv_cache_defrag, llama.cpp:2535)."""

import numpy as np
import pytest

pytest.importorskip("transformers")
import torch
from transformers import LlamaConfig as HFLlamaConfig
from transformers import LlamaForCausalLM

from tpulamm.gguf.constants import GGMLType
from tpulamm.runtime.engine import AbortError, Engine
from tpulamm.runtime.sampling import SamplingParams
from tpulamm.tools.convert_hf import convert_hf_llama

from tests.test_engine import make_vocab_md, VOCAB


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    torch.manual_seed(11)
    cfg = HFLlamaConfig(
        vocab_size=VOCAB, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5,
        tie_word_embeddings=False)
    model = LlamaForCausalLM(cfg).eval()
    sd = {k: v.float().numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    convert_hf_llama(sd, model.config, path, qtype=GGMLType.Q8_0,
                     vocab=make_vocab_md())
    return path


def test_fast_path_requalifies_after_context_shift(model_path):
    """Context shift leaves holes; defrag compacts them so the on-device
    batched scan (cell i == position i) works again."""
    eng = Engine(model_path, n_ctx=32)
    eng.prefill(0, list(range(3, 25)))          # leave room for the prompt
    out = eng.generate("the cat", n_predict=12,
                       sampling=SamplingParams(temp=0.0), slot=0,
                       stop_on_eos=False)       # forces a shift
    n = int(eng.n_past[0])
    # defrag restored the invariant
    assert np.array_equal(eng.cell_pos[0, :n], np.arange(n))
    # and the fast scan accepts the slot again
    res = eng.decode_batch_fast({0: 5}, 4)
    assert len(res[0]) == 4


def test_abort_generate(model_path):
    eng = Engine(model_path, n_ctx=64)
    calls = {"n": 0}

    def abort():
        calls["n"] += 1
        return calls["n"] > 3

    eng.set_abort_callback(abort)
    ids, _ = eng.generate("the cat", n_predict=32,
                          sampling=SamplingParams(temp=0.0),
                          stop_on_eos=False)
    assert 0 < len(ids) < 32                    # partial output


def test_abort_generate_fast(model_path):
    eng = Engine(model_path, n_ctx=64)
    calls = {"n": 0}

    def abort():
        calls["n"] += 1
        return calls["n"] > 1                   # let prefill through

    eng.set_abort_callback(abort)
    ids, _ = eng.generate_fast("the cat", n_predict=32, temp=0.0,
                               stop_on_eos=False)
    assert len(ids) == 1                        # aborted before any block


def test_abort_prefill(model_path):
    eng = Engine(model_path, n_ctx=64, n_ubatch=8)
    seen = {"n": 0}

    def abort():
        seen["n"] += 1
        return seen["n"] > 1                    # allow first ubatch only

    eng.set_abort_callback(abort)
    with pytest.raises(AbortError):
        eng.prefill(0, list(range(3, 27)))


def test_model_load_cancel(model_path):
    with pytest.raises(AbortError):
        Engine(model_path, load_abort=lambda: True)


def test_server_cancel_mid_generation(model_path):
    """A cancelled request frees its slot mid-generation and the waiter
    gets a 'cancelled' finish reason."""
    import queue as queue_mod

    from tpulamm.server.server import Request, Scheduler

    eng = Engine(model_path, n_ctx=128, n_slots=2)
    sched = Scheduler(eng, 2)
    sched.engine = eng
    sched.start()
    try:
        req = Request(prompt="the cat sat", params=SamplingParams(temp=0.0),
                      n_predict=10_000, stream=False)
        sched.submit(req)
        # wait for some tokens, then cancel
        first = req.out.get(timeout=60)
        assert first[0] == "tok"
        sched.cancel(req.rid)
        reason = None
        for _ in range(10_000):
            item = req.out.get(timeout=60)
            if item[0] == "done":
                reason = item[1]
                break
        assert reason == "cancelled"
        # slot freed
        for _ in range(100):
            if all(s.req is None for s in sched.slots):
                break
        assert all(s.req is None for s in sched.slots)
        assert req.rid not in sched.requests
    finally:
        sched.running = False

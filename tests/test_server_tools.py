"""Server, quantize CLI, session save/load and perplexity integration tests.

Analogue of the reference's behave server features (examples/server/tests)
plus the quantize/perplexity tool paths, all on a tiny converted model.
"""

import json
import re
import threading
import urllib.request

import numpy as np
import pytest

pytest.importorskip("transformers")
import torch
from transformers import LlamaConfig as HFLlamaConfig
from transformers import LlamaForCausalLM

from tpulamm.gguf.constants import GGMLType
from tpulamm.runtime.engine import Engine
from tpulamm.runtime.sampling import SamplingParams
from tpulamm.tools.convert_hf import convert_hf_llama

from tests.test_engine import make_vocab_md, VOCAB


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    torch.manual_seed(3)
    cfg = HFLlamaConfig(
        vocab_size=VOCAB, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5,
        tie_word_embeddings=False)
    model = LlamaForCausalLM(cfg).eval()
    sd = {k: v.float().numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path_factory.mktemp("m") / "tiny_f16.gguf")
    convert_hf_llama(sd, model.config, path, qtype=GGMLType.F32,
                     vocab=make_vocab_md())
    return path


# ---------------------------------------------------------------------------
# quantize CLI
# ---------------------------------------------------------------------------

def test_quantize_cli(model_path, tmp_path):
    from tpulamm.cli.quantize import quantize_file
    from tpulamm.gguf.reader import GGUFReader

    out = str(tmp_path / "q4.gguf")
    quantize_file(model_path, out, GGMLType.Q4_0, verbose=False)
    r = GGUFReader(out)
    assert r.tensors["blk.0.attn_q.weight"].ggml_type == GGMLType.Q4_0
    # output.weight promoted to Q8_0 (reference promotes to q6_K)
    assert r.tensors["output.weight"].ggml_type == GGMLType.Q8_0
    assert r.tensors["blk.0.attn_norm.weight"].ggml_type == GGMLType.F32
    assert r.metadata["general.file_type"] == 2  # MOSTLY_Q4_0
    r.close()
    # quantized model still generates
    eng = Engine(out, n_ctx=64)
    ids, _ = eng.generate("the cat", n_predict=4,
                          sampling=SamplingParams(temp=0.0),
                          stop_on_eos=False)
    assert len(ids) == 4


# ---------------------------------------------------------------------------
# session save/load
# ---------------------------------------------------------------------------

def test_session_roundtrip(model_path, tmp_path):
    from tpulamm.runtime.session import load_session, save_session

    eng = Engine(model_path, n_ctx=64)
    prompt_ids = eng.tokenizer.encode("the cat sat", special=True)
    logits1 = eng.prefill(0, prompt_ids)
    path = str(tmp_path / "sess.npz")
    save_session(path, eng, tokens=prompt_ids)

    eng2 = Engine(model_path, n_ctx=64)
    saved = load_session(path, eng2)
    assert saved == prompt_ids
    # continuing from restored state == continuing from live state
    tok = int(np.argmax(logits1))
    l1 = eng.decode_one(0, tok)
    l2 = eng2.decode_one(0, tok)
    np.testing.assert_allclose(l1, l2, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# perplexity tool
# ---------------------------------------------------------------------------

def test_perplexity(model_path):
    from tpulamm.cli.perplexity import compute_perplexity

    eng = Engine(model_path, n_ctx=33)
    text = "the cat sat on the mat " * 40
    res = compute_perplexity(eng, text, n_ctx=32, progress=False)
    assert np.isfinite(res["ppl"]) and res["ppl"] > 1.0


def test_perplexity_strided(model_path):
    """--ppl-stride mode (perplexity_v2, perplexity.cpp:332-446): strided
    windows scoring the final `stride` positions each."""
    from tpulamm.cli.perplexity import compute_perplexity_v2

    eng = Engine(model_path, n_ctx=33)
    text = "the cat sat on the mat " * 40
    res = compute_perplexity_v2(eng, text, n_ctx=32, stride=8,
                                progress=False)
    assert np.isfinite(res["ppl"]) and res["ppl"] > 1.0
    # scored tokens = stride per window
    assert res["tokens"] % 8 == 0


# ---------------------------------------------------------------------------
# HTTP server with continuous batching
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def server(model_path):
    from tpulamm.server.server import serve

    started = threading.Event()
    th = threading.Thread(
        target=serve,
        args=(model_path,),
        kwargs=dict(port=0, n_slots=2, n_ctx=64, started=started),
        daemon=True)
    th.start()
    assert started.wait(timeout=300)
    httpd = started.httpd
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()


def _post(url, obj, timeout=120):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def test_server_health(server):
    with urllib.request.urlopen(server + "/health", timeout=60) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok"
    assert h["slots_idle"] == 2


def test_server_completion(server):
    res = _post(server + "/completion",
                {"prompt": "the cat", "n_predict": 4, "temperature": 0.0})
    assert res["tokens_predicted"] == 4
    assert res["stop"] is True


def test_server_openai_and_concurrency(server):
    results = {}

    def go(i):
        results[i] = _post(server + "/v1/completions",
                           {"prompt": "the cat", "max_tokens": 6,
                            "temperature": 0.0, "seed": 1})

    threads = [threading.Thread(target=go, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert results[0]["choices"][0]["text"] == results[1]["choices"][0]["text"]
    assert results[0]["usage"]["completion_tokens"] == 6


def test_server_chat_and_metrics(server):
    res = _post(server + "/v1/chat/completions",
                {"messages": [{"role": "user", "content": "hi"}],
                 "max_tokens": 3, "temperature": 0.0})
    assert res["choices"][0]["message"]["role"] == "assistant"
    with urllib.request.urlopen(server + "/metrics", timeout=60) as r:
        m = r.read().decode()
    assert "llamacpp:requests_total" in m


def test_server_tokenize_roundtrip(server):
    t = _post(server + "/tokenize", {"content": "the cat"})
    assert len(t["tokens"]) >= 2
    d = _post(server + "/detokenize", {"tokens": t["tokens"]})
    assert "cat" in d["content"]


def test_server_embeddings(server):
    # native endpoint
    r = _post(server + "/embedding", {"content": "the cat"})
    assert len(r["embedding"]) == 256
    assert np.isfinite(r["embedding"]).all()
    # OpenAI endpoint with a batch
    r = _post(server + "/v1/embeddings",
              {"input": ["the cat", "a dog"]})
    assert r["object"] == "list" and len(r["data"]) == 2
    e0 = np.asarray(r["data"][0]["embedding"])
    e1 = np.asarray(r["data"][1]["embedding"])
    assert e0.shape == (256,) and not np.allclose(e0, e1)
    # embedding requests don't break subsequent generation
    c = _post(server + "/completion",
              {"prompt": "the cat", "n_predict": 3,
               "temperature": 0.0})
    assert c["tokens_predicted"] == 3


def test_server_fast_block_path(server):
    """Greedy + no-penalty requests take the multi-token scan path and
    produce a complete, correct-length completion."""
    r = _post(server + "/completion",
              {"prompt": "the cat", "n_predict": 13, "temperature": 0.0,
               "repeat_penalty": 1.0})
    assert r["tokens_predicted"] == 13
    assert isinstance(r["content"], str)
    # same request again: deterministic content (greedy, fast path)
    r2 = _post(server + "/completion",
               {"prompt": "the cat", "n_predict": 13, "temperature": 0.0,
                "repeat_penalty": 1.0})
    assert r2["content"] == r["content"]


def _scrape_metric(server, name):
    with urllib.request.urlopen(server + "/metrics", timeout=60) as r:
        for line in r.read().decode().splitlines():
            if line.startswith(name + " "):
                return float(line.split()[-1])
    return None


def test_server_cache_prompt(server):
    """cache_prompt (server.cpp:97,1880): a repeated prompt reuses the
    slot's KV prefix — identical greedy output, cached-token metric grows —
    and a multi-turn continuation reuses prompt + generated history."""
    base = _scrape_metric(server, "llamacpp:prompt_cached_tokens_total")
    p = {"prompt": "the quick brown fox", "n_predict": 8,
         "temperature": 0.0, "repeat_penalty": 1.0, "cache_prompt": True}
    r1 = _post(server + "/completion", p)
    c1 = _scrape_metric(server, "llamacpp:prompt_cached_tokens_total")
    r2 = _post(server + "/completion", p)
    c2 = _scrape_metric(server, "llamacpp:prompt_cached_tokens_total")
    assert r2["content"] == r1["content"]          # rollback+partial prefill
    assert c2 > c1 >= base                         # second hit reused prefix
    # multi-turn: old prompt + a short continuation as the new prompt
    # prefix (kept under the n_ctx keep limit so no front-truncation)
    r3 = _post(server + "/completion",
               dict(p, prompt=p["prompt"] + r1["content"][:8]))
    c3 = _scrape_metric(server, "llamacpp:prompt_cached_tokens_total")
    assert c3 > c2
    assert isinstance(r3["content"], str) and r3["tokens_predicted"] == 8
    # an over-long prompt is front-truncated -> prefix correctly invalid
    r5 = _post(server + "/completion",
               dict(p, prompt=p["prompt"] + "z" * 200))
    assert r5["tokens_predicted"] == 8
    # cache off -> unchanged counter, same greedy output
    r4 = _post(server + "/completion", dict(p, cache_prompt=False))
    c4 = _scrape_metric(server, "llamacpp:prompt_cached_tokens_total")
    assert c4 == c3
    assert r4["content"] == r1["content"]


def test_server_infill_and_slots(model_path):
    """POST /infill (FIM prompt from the model's special tokens) and
    GET /slots (per-slot state), server.cpp endpoint parity."""
    from tpulamm.server.server import serve
    started = threading.Event()
    th = threading.Thread(
        target=serve, args=(model_path,),
        kwargs=dict(port=0, n_slots=1, n_ctx=64, started=started),
        daemon=True)
    th.start()
    assert started.wait(timeout=300)
    base = f"http://127.0.0.1:{started.httpd.server_port}"
    try:
        # model has no FIM tokens -> clean 400, server stays alive
        import urllib.error
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base + "/infill",
                  {"input_prefix": "a", "input_suffix": "b"})
        assert ei.value.code == 400
        # inject FIM token ids (synthetic model: any valid ids work)
        md = started.sched.engine.metadata
        md["tokenizer.ggml.prefix_token_id"] = 5
        md["tokenizer.ggml.suffix_token_id"] = 6
        md["tokenizer.ggml.middle_token_id"] = 7
        r = _post(base + "/infill",
                  {"input_prefix": "the quick", "input_suffix": "fox",
                   "n_predict": 6, "temperature": 0.0})
        assert r["tokens_predicted"] == 6 and isinstance(r["content"], str)
        # FIM generation stops at the model's EOT token (review finding:
        # the server only honored eos). Learn the greedy first token, make
        # it the EOT id: the same request must now stop immediately.
        rp = _post(base + "/infill",
                   {"input_prefix": "the quick", "input_suffix": "fox",
                    "n_predict": 2, "temperature": 0.0, "n_probs": 1})
        first_tok = rp["completion_probabilities"][0]["probs"][0]["id"]
        md["tokenizer.ggml.eot_token_id"] = first_tok
        r2 = _post(base + "/infill",
                   {"input_prefix": "the quick", "input_suffix": "fox",
                    "n_predict": 6, "temperature": 0.0})
        assert r2["tokens_predicted"] < 6
        del md["tokenizer.ggml.eot_token_id"]
        with urllib.request.urlopen(base + "/slots", timeout=60) as resp:
            slots = json.loads(resp.read())
        assert len(slots) == 1 and slots[0]["id"] == 0
        assert slots[0]["state"] == 0 and slots[0]["n_past"] > 0
        assert slots[0]["cache_tokens"] >= 0
    finally:
        started.sched.running = False
        started.httpd.shutdown()


def test_server_sampled_fast_path(server):
    """Greedy + penalties (the OpenAI-default shape) rides the on-device
    sampled block path and matches the per-token host loop exactly."""
    body = {"prompt": "the cat sat", "n_predict": 11, "temperature": 0.0,
            "repeat_penalty": 1.4, "frequency_penalty": 0.2,
            "repeat_last_n": 16}
    s0 = _scrape_metric(server, "llamacpp:decode_sampled_blocks_total")
    r_fast = _post(server + "/completion", body)
    s1 = _scrape_metric(server, "llamacpp:decode_sampled_blocks_total")
    assert s1 > s0                               # took the sampled path
    assert r_fast["tokens_predicted"] == 11
    # a never-matching stop string forces the per-token host loop
    r_slow = _post(server + "/completion",
                   dict(body, stop=["\x00never\x00"]))
    assert r_slow["content"] == r_fast["content"]


def test_server_system_prompt(server):
    """Shared system prompt (server.cpp:118,639-672): one prefill +
    seq_cp fan-out; every request reuses the prefix without cache_prompt,
    and output equals manually prepending the same text."""
    import time as _time

    # reference output: prepend manually, no system prompt set
    ref = _post(server + "/completion",
                {"prompt": "the mat was the cat", "n_predict": 4,
                 "temperature": 0.0})

    _post(server + "/system_prompt", {"prompt": "the mat was "})
    deadline = _time.time() + 60
    while _time.time() < deadline:     # applied when all slots idle
        with urllib.request.urlopen(server + "/props", timeout=60) as r:
            props = json.loads(r.read())
        if props["system_prompt"] == "the mat was ":
            break
        _time.sleep(0.05)
    assert props["system_prompt"] == "the mat was "

    with urllib.request.urlopen(server + "/metrics", timeout=60) as r:
        cached0 = int(float(re.search(
            r"(?m)^llamacpp:prompt_cached_tokens_total (\S+)", r.read().decode())
            .group(1)))

    def go(results, i):
        results[i] = _post(server + "/completion",
                           {"prompt": "the cat", "n_predict": 4,
                            "temperature": 0.0})

    results = {}
    threads = [threading.Thread(target=go, args=(results, i))
               for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    # both slots decode after ONE system prefill; the system prefix was
    # served from KV (cached counter grows by its token count per request)
    assert results[0]["content"] == results[1]["content"]
    assert results[0]["content"] == ref["content"]
    with urllib.request.urlopen(server + "/metrics", timeout=60) as r:
        cached1 = int(float(re.search(
            r"(?m)^llamacpp:prompt_cached_tokens_total (\S+)", r.read().decode())
            .group(1)))
    assert cached1 > cached0

    # runtime update back to empty restores plain behavior for later tests
    _post(server + "/system_prompt", {"prompt": ""})
    deadline = _time.time() + 60
    while _time.time() < deadline:
        with urllib.request.urlopen(server + "/props", timeout=60) as r:
            if json.loads(r.read())["system_prompt"] == "":
                break
        _time.sleep(0.05)

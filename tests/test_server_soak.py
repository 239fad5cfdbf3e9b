"""Mixed-load server soak: every decode path interleaved under
concurrency (plain fast blocks, sampled-chain blocks, host-loop grammar
and stop-string requests, streaming, embeddings, cache_prompt reuse,
cancellation, malformed requests) — the scheduler must drain everything,
leak no slots, and keep deterministic outputs deterministic."""

import json
import threading
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import pytest

pytest.importorskip("transformers")
import torch
from transformers import LlamaConfig as HFLlamaConfig
from transformers import LlamaForCausalLM

from tpulamm.gguf.constants import GGMLType
from tpulamm.tools.convert_hf import convert_hf_llama

from tests.test_engine import make_vocab_md, VOCAB


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    torch.manual_seed(17)
    cfg = HFLlamaConfig(
        vocab_size=VOCAB, hidden_size=192, intermediate_size=384,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5,
        tie_word_embeddings=False)
    model = LlamaForCausalLM(cfg).eval()
    sd = {k: v.float().numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path_factory.mktemp("soak") / "m.gguf")
    convert_hf_llama(sd, model.config, path, qtype=GGMLType.Q4_0,
                     vocab=make_vocab_md())
    from tpulamm.server.server import serve
    started = threading.Event()
    th = threading.Thread(target=serve, args=(path,),
                          kwargs=dict(port=0, n_slots=4, n_ctx=128,
                                      started=started), daemon=True)
    th.start()
    assert started.wait(timeout=300)
    yield (f"http://127.0.0.1:{started.httpd.server_port}", started.sched)
    started.sched.running = False
    started.httpd.shutdown()


def _post(base, path, body, timeout=180):
    req = urllib.request.Request(
        base + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def test_mixed_load_soak(server):
    base, sched = server
    results = {}
    errors = []

    def completion(tag, body):
        try:
            results[tag] = _post(base, "/completion", body)[1]
        except urllib.error.HTTPError as e:
            results[tag] = ("http", e.code)
        except Exception as e:  # noqa: BLE001
            errors.append((tag, repr(e)))

    def chat_schema(tag):
        body = {"messages": [{"role": "user", "content": "j"}],
                "max_tokens": 20, "temperature": 0.0,
                "response_format": {
                    "type": "json_schema",
                    "json_schema": {"schema": {
                        "type": "object",
                        "properties": {"v": {"type": "integer"}},
                        "required": ["v"]}}}}
        try:
            results[tag] = _post(base, "/v1/chat/completions", body)[1]
        except Exception as e:  # noqa: BLE001
            errors.append((tag, repr(e)))

    def stream(tag):
        body = {"prompt": "the cat", "n_predict": 10, "stream": True,
                "temperature": 0.7, "seed": 9}
        req = urllib.request.Request(
            base + "/v1/completions", data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        try:
            chunks = 0
            with urllib.request.urlopen(req, timeout=180) as r:
                for line in r:
                    if line.startswith(b"data: ") \
                            and b"[DONE]" not in line:
                        chunks += 1
            results[tag] = chunks
        except Exception as e:  # noqa: BLE001
            errors.append((tag, repr(e)))

    def embed(tag):
        try:
            results[tag] = _post(base, "/embedding",
                                 {"content": "soak"})[1]
        except Exception as e:  # noqa: BLE001
            errors.append((tag, repr(e)))

    def cancel(tag):
        body = {"prompt": "the", "n_predict": 4096, "temperature": 0.0,
                "rid": "soak-cancel", "stream": True}
        req = urllib.request.Request(
            base + "/completion", data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=180) as r:
                r.read(64)                      # a few chunks
                _post(base, "/cancel", {"rid": "soak-cancel"})
                try:
                    r.read()
                except Exception:               # noqa: BLE001
                    pass
            results[tag] = "cancelled"
        except Exception as e:  # noqa: BLE001
            errors.append((tag, repr(e)))

    jobs = []
    with ThreadPoolExecutor(max_workers=12) as ex:
        for rep in range(3):
            jobs.append(ex.submit(completion, f"plain{rep}",
                                  {"prompt": "the cat", "n_predict": 12,
                                   "temperature": 0.0,
                                   "repeat_penalty": 1.0}))
            jobs.append(ex.submit(completion, f"penalized{rep}",
                                  {"prompt": "a dog", "n_predict": 12,
                                   "temperature": 0.0,
                                   "repeat_penalty": 1.3,
                                   "frequency_penalty": 0.2}))
            jobs.append(ex.submit(completion, f"stoch{rep}",
                                  {"prompt": "one two", "n_predict": 10,
                                   "temperature": 0.9, "seed": rep}))
            jobs.append(ex.submit(completion, f"stopstr{rep}",
                                  {"prompt": "x y", "n_predict": 10,
                                   "temperature": 0.0,
                                   "stop": ["\x00nomatch"]}))
            jobs.append(ex.submit(completion, f"cached{rep}",
                                  {"prompt": "same prompt every time",
                                   "n_predict": 8, "temperature": 0.0,
                                   "cache_prompt": True}))
            jobs.append(ex.submit(chat_schema, f"schema{rep}"))
            jobs.append(ex.submit(stream, f"stream{rep}"))
            jobs.append(ex.submit(embed, f"embed{rep}"))
        jobs.append(ex.submit(cancel, "cancel"))
        jobs.append(ex.submit(completion, "badgrammar",
                              {"prompt": "x", "n_predict": 4,
                               "grammar": "root := broken"}))
        for j in jobs:
            j.result(timeout=300)

    assert not errors, errors
    # deterministic paths stayed deterministic under interleaving
    assert results["plain0"]["content"] == results["plain1"]["content"] \
        == results["plain2"]["content"]
    assert results["penalized0"]["content"] \
        == results["penalized1"]["content"] \
        == results["penalized2"]["content"]
    # penalties changed the greedy continuation (they engage)
    assert results["penalized0"]["content"]
    for rep in range(3):
        assert results[f"stopstr{rep}"]["tokens_predicted"] == 10
        assert results[f"cached{rep}"]["tokens_predicted"] == 8
        assert results[f"stream{rep}"] >= 10
        assert len(results[f"embed{rep}"]["embedding"]) == 192
        if results[f"schema{rep}"]["choices"][0]["finish_reason"] == "stop":
            doc = json.loads(
                results[f"schema{rep}"]["choices"][0]["message"]["content"])
            assert isinstance(doc["v"], int)
    assert results["badgrammar"] == ("http", 400)
    assert results["cancel"] == "cancelled"

    # no slot leaked; scheduler drains to fully idle
    import time
    for _ in range(100):
        if all(s.req is None for s in sched.slots):
            break
        time.sleep(0.1)
    assert all(s.req is None for s in sched.slots)
    st, h = _post(base, "/completion",
                  {"prompt": "after", "n_predict": 3, "temperature": 0.0})
    assert h["tokens_predicted"] == 3      # server still fully functional

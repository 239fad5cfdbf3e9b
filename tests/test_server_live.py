"""Live HTTP server integration tests (reference examples/server/tests
*.feature style): boot server.py on a real port, drive completions,
concurrency, streaming, embeddings, metrics, cancellation."""

import json
import threading
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
    torch.manual_seed(5)
    cfg = HFLlamaConfig(
        vocab_size=VOCAB, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5,
        tie_word_embeddings=False)
    model = LlamaForCausalLM(cfg).eval()
    sd = {k: v.float().numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path_factory.mktemp("srv") / "tiny.gguf")
    convert_hf_llama(sd, model.config, path, qtype=GGMLType.Q8_0,
                     vocab=make_vocab_md())

    from tpulamm.server.server import serve
    started = threading.Event()
    t = threading.Thread(target=serve,
                         args=(path,),
                         kwargs=dict(host="127.0.0.1", port=0, n_slots=2,
                                     n_ctx=128, started=started),
                         daemon=True)
    t.start()
    assert started.wait(timeout=300), "server failed to start"
    httpd = started.httpd
    yield f"http://127.0.0.1:{httpd.server_port}"
    started.sched.running = False
    httpd.shutdown()


def _post(base, path, body, timeout=120):
    req = urllib.request.Request(
        base + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, r.read()


def _get(base, path, timeout=30):
    with urllib.request.urlopen(base + path, timeout=timeout) as r:
        return r.status, r.read()


def test_health_props_models(server):
    st, body = _get(server, "/health")
    assert st == 200 and json.loads(body)["status"] == "ok"
    st, body = _get(server, "/props")
    assert json.loads(body)["total_slots"] == 2
    st, body = _get(server, "/v1/models")
    assert json.loads(body)["data"][0]["object"] == "model"


def test_completion_and_usage(server):
    st, body = _post(server, "/completion",
                     {"prompt": "the cat", "n_predict": 8,
                      "temperature": 0.0})
    obj = json.loads(body)
    assert st == 200 and obj["stop"] is True
    assert obj["tokens_predicted"] > 0


def test_openai_chat_completion(server):
    st, body = _post(server, "/v1/chat/completions",
                     {"messages": [{"role": "user", "content": "hi"}],
                      "max_tokens": 6, "temperature": 0.0})
    obj = json.loads(body)
    assert obj["object"] == "chat.completion"
    assert obj["choices"][0]["message"]["role"] == "assistant"
    assert obj["usage"]["completion_tokens"] > 0


def test_streaming_sse(server):
    req = urllib.request.Request(
        server + "/v1/completions",
        data=json.dumps({"prompt": "the cat", "max_tokens": 6,
                         "stream": True, "temperature": 0.0}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        payload = r.read().decode()
    events = [ln[6:] for ln in payload.splitlines()
              if ln.startswith("data: ")]
    assert events[-1] == "[DONE]"
    assert len(events) >= 2                     # >=1 chunk + DONE


def test_concurrent_requests_share_slots(server):
    def one(i):
        return _post(server, "/completion",
                     {"prompt": f"the cat {i}", "n_predict": 6,
                      "temperature": 0.0})[0]

    with ThreadPoolExecutor(4) as ex:
        codes = list(ex.map(one, range(4)))
    assert codes == [200] * 4
    # all slots drained afterwards
    st, body = _get(server, "/health")
    assert json.loads(body)["slots_idle"] == 2


def test_embeddings_endpoint(server):
    st, body = _post(server, "/v1/embeddings",
                     {"input": ["the cat", "the mat"]})
    obj = json.loads(body)
    assert len(obj["data"]) == 2
    assert len(obj["data"][0]["embedding"]) == 256


def test_tokenize_roundtrip(server):
    st, body = _post(server, "/tokenize", {"content": "the cat"})
    toks = json.loads(body)["tokens"]
    st, body = _post(server, "/detokenize", {"tokens": toks})
    assert "the cat" in json.loads(body)["content"]


def test_metrics_scrape_and_fast_path_counter(server):
    _post(server, "/completion",
          {"prompt": "the cat", "n_predict": 4, "temperature": 0.0,
           "repeat_penalty": 1.0})
    st, body = _get(server, "/metrics")
    text = body.decode()
    assert "llamacpp:prompt_tokens_total" in text
    assert "llamacpp:decode_fast_blocks_total" in text
    assert "llamacpp:decode_slow_steps_total" in text
    counts = {ln.split()[0]: float(ln.split()[1])
              for ln in text.splitlines() if ln and not ln.startswith("#")}
    assert counts["llamacpp:tokens_predicted_total"] > 0


def test_cancel_endpoint(server):
    rid = "cancel-me-1"

    def run():
        try:
            return _post(server, "/completion",
                         {"prompt": "the cat", "n_predict": 100_000,
                          "temperature": 0.0, "rid": rid}, timeout=300)
        except Exception as e:                  # pragma: no cover
            return None, str(e)

    with ThreadPoolExecutor(1) as ex:
        fut = ex.submit(run)
        import time
        ok = False
        for _ in range(600):
            try:
                st, body = _post(server, "/cancel", {"rid": rid})
            except urllib.error.HTTPError:
                time.sleep(0.1)          # not yet registered -> 404
                continue
            if json.loads(body).get("cancelled"):
                ok = True
                break
            time.sleep(0.1)
        assert ok, "request never became cancellable"
        st, body = fut.result(timeout=120)
    assert st == 200                            # partial response returned
    # slot must be free again
    st, body = _get(server, "/health")
    assert json.loads(body)["slots_idle"] == 2


def test_server_tensor_parallel(tmp_path_factory):
    """The HTTP server serving a tp=2-sharded engine on the virtual mesh."""
    torch.manual_seed(6)
    cfg = HFLlamaConfig(
        vocab_size=VOCAB, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5,
        tie_word_embeddings=False)
    model = LlamaForCausalLM(cfg).eval()
    sd = {k: v.float().numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path_factory.mktemp("srv_tp") / "tiny.gguf")
    convert_hf_llama(sd, model.config, path, qtype=GGMLType.Q8_0,
                     vocab=make_vocab_md())

    from tpulamm.server.server import serve
    started = threading.Event()
    t = threading.Thread(target=serve, args=(path,),
                         kwargs=dict(host="127.0.0.1", port=0, n_slots=2,
                                     n_ctx=64, started=started, tp=2),
                         daemon=True)
    t.start()
    assert started.wait(timeout=300)
    base = f"http://127.0.0.1:{started.httpd.server_port}"
    try:
        st, body = _post(base, "/completion",
                         {"prompt": "the cat", "n_predict": 6,
                          "temperature": 0.0})
        obj = json.loads(body)
        assert st == 200 and obj["tokens_predicted"] > 0
        # penalties-default requests ride the sampled fast path under tp
        st, body = _post(base, "/completion",
                         {"prompt": "a dog", "n_predict": 6,
                          "temperature": 0.0, "repeat_penalty": 1.3})
        obj2 = json.loads(body)
        assert st == 200 and obj2["tokens_predicted"] == 6
        with urllib.request.urlopen(base + "/metrics", timeout=60) as r:
            m = r.read().decode()
        line = [x for x in m.splitlines()
                if x.startswith("llamacpp:decode_sampled_blocks_total ")][0]
        assert float(line.split()[-1]) > 0
    finally:
        started.sched.running = False
        started.httpd.shutdown()


def test_n_probs_and_openai_logprobs(server):
    """server.cpp n_probs / OpenAI logprobs payloads (slow path)."""
    st, body = _post(server, "/completion",
                     {"prompt": "the cat", "n_predict": 4,
                      "temperature": 0.0, "n_probs": 3})
    obj = json.loads(body)
    cps = obj["completion_probabilities"]
    assert len(cps) == 4
    assert len(cps[0]["probs"]) == 3
    assert 0.0 <= cps[0]["probs"][0]["prob"] <= 1.0
    # greedy: the sampled token must be the top-1
    assert abs(cps[0]["sampled_prob"] - cps[0]["probs"][0]["prob"]) < 1e-9

    st, body = _post(server, "/v1/completions",
                     {"prompt": "the cat", "max_tokens": 3,
                      "temperature": 0.0, "logprobs": 2})
    ch = json.loads(body)["choices"][0]
    lp = ch["logprobs"]
    assert len(lp["tokens"]) == 3
    assert len(lp["top_logprobs"][0]) == 2
    assert all(v <= 0.0 for v in lp["token_logprobs"])


def test_malformed_grammar_fails_request_not_server(server):
    """A bad request must 400 and leave the scheduler alive for others
    (it used to kill the scheduler thread and hang every client)."""
    try:
        st, body = _post(server, "/completion",
                         {"prompt": "hi", "n_predict": 2,
                          "grammar": "root = "})
    except urllib.error.HTTPError as e:
        st, body = e.code, e.read()
    assert st == 400
    assert "error" in json.loads(body)
    # the server still serves the next request
    st, body = _post(server, "/completion",
                     {"prompt": "the cat", "n_predict": 4,
                      "temperature": 0.0})
    assert st == 200 and json.loads(body)["tokens_predicted"] > 0


def test_stop_param_and_infinite_n_predict(server):
    st, body = _post(server, "/completion",
                     {"prompt": "the cat", "n_predict": 6,
                      "temperature": 0.0, "stop": ["\x00never"]})
    assert st == 200 and json.loads(body)["tokens_predicted"] > 0
    # n_predict -1 = until eos/stop; bounded here via a stop string that
    # matches anything the random model emits quickly is not reliable —
    # instead cancel it
    rid = "inf-1"
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(1) as ex:
        fut = ex.submit(lambda: _post(server, "/completion",
                                      {"prompt": "the", "n_predict": -1,
                                       "temperature": 0.0, "rid": rid},
                                      timeout=300))
        import time
        for _ in range(600):
            try:
                st2, b2 = _post(server, "/cancel", {"rid": rid})
                if json.loads(b2).get("cancelled"):
                    break
            except urllib.error.HTTPError:
                pass
            time.sleep(0.1)
        st3, _ = fut.result(timeout=120)
    assert st3 == 200


def test_stop_sequence_cross_piece_trim(server):
    """A stop string spanning token-piece boundaries must be held back,
    matched, and trimmed (server.cpp holdback semantics)."""
    st, body = _post(server, "/completion",
                     {"prompt": "the cat", "n_predict": 10,
                      "temperature": 0.0})
    full = json.loads(body)["content"]
    if len(full) < 6:
        pytest.skip("model output too short to build a spanning stop")
    # pick a mid-output substring as the stop sequence
    stop = full[2:6]
    st, body = _post(server, "/completion",
                     {"prompt": "the cat", "n_predict": 10,
                      "temperature": 0.0, "stop": [stop]})
    obj = json.loads(body)
    assert obj["content"] == full[:2], (obj["content"], full, stop)
    assert stop not in obj["content"]


def test_response_format_json_object(server):
    st, body = _post(server, "/v1/chat/completions",
                     {"messages": [{"role": "user", "content": "json"}],
                      "max_tokens": 48, "temperature": 0.0,
                      "response_format": {"type": "json_object"}})
    obj = json.loads(body)
    assert st == 200
    text = obj["choices"][0]["message"]["content"]
    if obj["choices"][0]["finish_reason"] == "stop":
        json.loads(text)            # complete -> must be valid JSON
    else:
        assert text.lstrip()[:1] in '{["-0123456789tfn'


def test_response_format_json_schema(server):
    schema = {"type": "object",
              "properties": {"ok": {"type": "boolean"}},
              "required": ["ok"]}
    st, body = _post(server, "/v1/chat/completions",
                     {"messages": [{"role": "user", "content": "j"}],
                      "max_tokens": 32, "temperature": 0.0,
                      "response_format": {
                          "type": "json_schema",
                          "json_schema": {"schema": schema}}})
    obj = json.loads(body)
    assert st == 200
    text = obj["choices"][0]["message"]["content"]
    if obj["choices"][0]["finish_reason"] == "stop":
        doc = json.loads(text)
        assert isinstance(doc.get("ok"), bool)
    else:
        assert text.startswith("{")
    # malformed schema -> 400 on the request, server stays alive
    st2 = None
    try:
        st2, _ = _post(server, "/completion",
                       {"prompt": "x", "n_predict": 4,
                        "json_schema": {"type": "frobnicate"}})
    except urllib.error.HTTPError as e:
        st2 = e.code
    assert st2 == 400
    st3, _ = _get(server, "/health")
    assert st3 == 200


def test_server_lookup_decoding(tmp_path_factory):
    """Opt-in single-slot prompt-lookup speculation: greedy output is
    byte-identical to a plain server; the spec metrics move; concurrent
    requests bypass the spec tier cleanly."""
    torch.manual_seed(8)
    cfg = HFLlamaConfig(
        vocab_size=VOCAB, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5,
        tie_word_embeddings=False)
    model = LlamaForCausalLM(cfg).eval()
    sd = {k: v.float().numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path_factory.mktemp("srv_lu") / "tiny.gguf")
    convert_hf_llama(sd, model.config, path, qtype=GGMLType.Q8_0,
                     vocab=make_vocab_md())

    from tpulamm.server.server import serve

    def boot(lookup):
        started = threading.Event()
        th = threading.Thread(
            target=serve, args=(path,),
            kwargs=dict(port=0, n_slots=2, n_ctx=128, started=started,
                        lookup_decoding=lookup), daemon=True)
        th.start()
        assert started.wait(timeout=300)
        return started

    body = {"prompt": "the cat sat on the mat, the cat sat on",
            "n_predict": 24, "temperature": 0.0, "repeat_penalty": 1.0}
    plain_srv = boot(False)
    try:
        st, b = _post(f"http://127.0.0.1:{plain_srv.httpd.server_port}",
                      "/completion", body)
        ref = json.loads(b)["content"]
    finally:
        plain_srv.sched.running = False
        plain_srv.httpd.shutdown()

    lu = boot(True)
    base = f"http://127.0.0.1:{lu.httpd.server_port}"
    try:
        st, b = _post(base, "/completion", body)
        obj = json.loads(b)
        assert obj["content"] == ref                 # greedy-exact
        assert lu.sched.metrics.spec_blocks > 0
        assert lu.sched.metrics.spec_drafted > 0
        # concurrent pair: spec tier steps aside, both complete
        outs = {}

        def go(n):
            _, bb = _post(base, "/completion", dict(body, n_predict=8))
            outs[n] = json.loads(bb)["tokens_predicted"]
        ts = [threading.Thread(target=go, args=(n,)) for n in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=300)
        assert outs[0] == 8 and outs[1] == 8
        # follow-up single request still exact after mixed traffic
        st, b = _post(base, "/completion", body)
        assert json.loads(b)["content"] == ref
    finally:
        lu.sched.running = False
        lu.httpd.shutdown()


def test_server_lookup_decoding_multislot(tmp_path_factory):
    """Multi-slot speculative serving: 2+ concurrent greedy requests run
    the batched (B, 1+k) compound-verify lookup loop; outputs stay
    byte-identical to a plain server per request."""
    torch.manual_seed(9)
    cfg = HFLlamaConfig(
        vocab_size=VOCAB, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5,
        tie_word_embeddings=False)
    model = LlamaForCausalLM(cfg).eval()
    sd = {k: v.float().numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path_factory.mktemp("srv_lum") / "tiny.gguf")
    convert_hf_llama(sd, model.config, path, qtype=GGMLType.Q8_0,
                     vocab=make_vocab_md())

    from tpulamm.server.server import serve

    def boot(lookup):
        started = threading.Event()
        th = threading.Thread(
            target=serve, args=(path,),
            kwargs=dict(port=0, n_slots=4, n_ctx=128, started=started,
                        lookup_decoding=lookup), daemon=True)
        th.start()
        assert started.wait(timeout=300)
        return started

    bodies = [{"prompt": "the cat sat on the mat, the cat sat on",
               "n_predict": 20, "temperature": 0.0, "repeat_penalty": 1.0},
              {"prompt": "a dog ran to a dog ran to",
               "n_predict": 14, "temperature": 0.0, "repeat_penalty": 1.0}]

    def fetch(base, results):
        def go(n):
            _, bb = _post(base, "/completion", bodies[n])
            results[n] = json.loads(bb)
        ts = [threading.Thread(target=go, args=(n,))
              for n in range(len(bodies))]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=300)

    plain_srv = boot(False)
    try:
        ref = {}
        fetch(f"http://127.0.0.1:{plain_srv.httpd.server_port}", ref)
    finally:
        plain_srv.sched.running = False
        plain_srv.httpd.shutdown()

    lu = boot(True)
    try:
        base = f"http://127.0.0.1:{lu.httpd.server_port}"
        # warm both slots so the pair lands concurrently
        _post(base, "/completion", dict(bodies[0], n_predict=4))
        got = {}
        fetch(base, got)
        for n in range(len(bodies)):
            assert got[n]["content"] == ref[n]["content"], n
            assert got[n]["tokens_predicted"] == \
                ref[n]["tokens_predicted"], n
        assert lu.sched.metrics.spec_blocks > 0
    finally:
        lu.sched.running = False
        lu.httpd.shutdown()


def test_server_lookup_decoding_sampled(tmp_path_factory):
    """Sampled speculative serving (temperature verify with exact
    acceptance): temp>0 requests take the batched lookup tier. With a
    near-zero temperature the sampled verify walk must reproduce the
    greedy reference exactly (any acceptance/correction off-by-one would
    corrupt it); with temp=0.8 the path must still be taken and complete."""
    torch.manual_seed(9)
    cfg = HFLlamaConfig(
        vocab_size=VOCAB, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5,
        tie_word_embeddings=False)
    model = LlamaForCausalLM(cfg).eval()
    sd = {k: v.float().numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path_factory.mktemp("srv_lus") / "tiny.gguf")
    convert_hf_llama(sd, model.config, path, qtype=GGMLType.Q8_0,
                     vocab=make_vocab_md())

    from tpulamm.server.server import serve
    started = threading.Event()
    th = threading.Thread(
        target=serve, args=(path,),
        kwargs=dict(port=0, n_slots=4, n_ctx=128, started=started,
                    lookup_decoding=True), daemon=True)
    th.start()
    assert started.wait(timeout=300)
    base = f"http://127.0.0.1:{started.httpd.server_port}"
    try:
        body = {"prompt": "the cat sat on the mat, the cat sat on",
                "n_predict": 16, "repeat_penalty": 1.0, "top_k": 40,
                "top_p": 1.0, "min_p": 0.0}
        # greedy reference
        _, bb = _post(base, "/completion", dict(body, temperature=0.0))
        ref = json.loads(bb)
        # near-zero temperature through the SAMPLED verify path: the
        # softmax is effectively one-hot, so output must equal greedy
        spec0 = started.sched.metrics.spec_blocks
        _, bb = _post(base, "/completion", dict(body, temperature=1e-4))
        got = json.loads(bb)
        assert got["content"] == ref["content"]
        assert started.sched.metrics.spec_blocks > spec0
        # a real temperature still takes the tier and completes
        spec1 = started.sched.metrics.spec_blocks
        _, bb = _post(base, "/completion", dict(body, temperature=0.8))
        got = json.loads(bb)
        assert got["tokens_predicted"] > 0
        assert started.sched.metrics.spec_blocks > spec1
    finally:
        started.sched.running = False
        started.httpd.shutdown()


def test_server_draft_model_tier(tmp_path_factory):
    """--model-draft serving tier (speculative.cpp fused into serving):
    greedy output is byte-identical to a plain server; near-zero
    temperature through the STOCHASTIC verify reproduces greedy exactly
    (the acceptance rule's temp->0 limit); self-draft at temp 0.8 accepts
    ~always (p == q: the sharpest detector of a mis-wired p/q ratio)."""
    torch.manual_seed(11)
    cfg = HFLlamaConfig(
        vocab_size=VOCAB, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5,
        tie_word_embeddings=False)
    model = LlamaForCausalLM(cfg).eval()
    with torch.no_grad():
        model.lm_head.weight *= 3.0      # sharpen: cross-shape tie noise
    sd = {k: v.float().numpy() for k, v in model.state_dict().items()}
    path = str(tmp_path_factory.mktemp("srv_dft") / "tiny.gguf")
    convert_hf_llama(sd, model.config, path, qtype=GGMLType.Q8_0,
                     vocab=make_vocab_md())

    from tpulamm.server.server import serve

    def boot(draft):
        started = threading.Event()
        th = threading.Thread(
            target=serve, args=(path,),
            kwargs=dict(port=0, n_slots=2, n_ctx=128, started=started,
                        model_draft=draft), daemon=True)
        th.start()
        assert started.wait(timeout=300)
        return started

    body = {"prompt": "the cat sat on the mat", "n_predict": 24,
            "temperature": 0.0, "repeat_penalty": 1.0, "top_k": 40,
            "top_p": 1.0, "min_p": 0.0}
    plain_srv = boot(None)
    try:
        st, b = _post(f"http://127.0.0.1:{plain_srv.httpd.server_port}",
                      "/completion", body)
        ref = json.loads(b)["content"]
    finally:
        plain_srv.sched.running = False
        plain_srv.httpd.shutdown()

    srv = boot(path)                      # self-draft
    base = f"http://127.0.0.1:{srv.httpd.server_port}"
    try:
        st, b = _post(base, "/completion", body)
        assert json.loads(b)["content"] == ref       # greedy-exact
        m = srv.sched.metrics
        assert m.spec_draft_blocks > 0 and m.spec_drafted > 0
        # near-zero temp through the stochastic verify == greedy
        _, b = _post(base, "/completion", dict(body, temperature=1e-4))
        assert json.loads(b)["content"] == ref
        # self-draft at temp 0.8: stochastic acceptance must be ~1
        # (p == q). Token-match would sit near sum p^2 << 1.
        d0, a0 = m.spec_drafted, m.spec_accepted
        _, b = _post(base, "/completion",
                     dict(body, temperature=0.8, seed=5))
        assert json.loads(b)["tokens_predicted"] > 0
        drafted = m.spec_drafted - d0
        accepted = m.spec_accepted - a0
        assert drafted > 0
        assert accepted / drafted > 0.9, (accepted, drafted)
    finally:
        srv.sched.running = False
        srv.httpd.shutdown()

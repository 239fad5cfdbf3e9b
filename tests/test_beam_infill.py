"""Beam search, FIM prompt assembly, prompt-cache prefix reuse,
server grammar param.
"""

import json
import urllib.request

import numpy as np
import pytest

pytest.importorskip("transformers")
import torch  # noqa: E402
import transformers  # noqa: E402

from tpulamm.gguf.constants import GGMLType  # noqa: E402
from tpulamm.runtime.beam import beam_search  # noqa: E402
from tpulamm.runtime.engine import Engine  # noqa: E402
from tpulamm.runtime.sampling import SamplingParams  # noqa: E402
from tpulamm.tools.convert_hf import convert_hf  # noqa: E402

from tests.test_engine import make_vocab_md  # noqa: E402


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    torch.manual_seed(5)
    m = transformers.LlamaForCausalLM(transformers.LlamaConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128))
    m.eval()
    path = str(tmp_path_factory.mktemp("beam") / "m.gguf")
    convert_hf(m, path, qtype=GGMLType.F32, vocab=make_vocab_md())
    return path


def _seq_logprob(engine, prompt, seq):
    """Cumulative logprob of seq given prompt under the model."""
    engine.reset_slot(0)
    logits = engine.prefill(0, list(prompt) + list(seq), logits_all=True)
    lp = 0.0
    x = logits.astype(np.float64)
    x = x - x.max(-1, keepdims=True)
    x = x - np.log(np.exp(x).sum(-1, keepdims=True))
    n0 = len(prompt)
    for i, t in enumerate(seq):
        lp += x[n0 - 1 + i, t]
    return lp


def test_beam1_equals_greedy(model_path):
    eng = Engine(model_path, n_ctx=64, n_slots=1)
    greedy, _ = eng.generate([1, 9, 33], n_predict=8,
                             sampling=SamplingParams(temp=0.0, penalty_repeat=1.0),
                             stop_on_eos=False)
    eng2 = Engine(model_path, n_ctx=64, n_slots=1)
    beam, _ = beam_search(eng2, [1, 9, 33], n_beams=1, n_predict=8)
    assert beam == greedy


def test_beam_search_improves_logprob(model_path):
    eng = Engine(model_path, n_ctx=64, n_slots=4)
    greedy, _ = eng.generate([1, 9, 33], n_predict=6,
                             sampling=SamplingParams(temp=0.0, penalty_repeat=1.0),
                             stop_on_eos=False)
    eng2 = Engine(model_path, n_ctx=64, n_slots=4)
    beam, score = beam_search(eng2, [1, 9, 33], n_beams=4, n_predict=6)
    assert len(beam) == 6
    # beam result must be at least as good as greedy under the model
    scorer = Engine(model_path, n_ctx=64)
    lp_beam = _seq_logprob(scorer, [1, 9, 33], beam)
    lp_greedy = _seq_logprob(scorer, [1, 9, 33], greedy)
    assert lp_beam >= lp_greedy - 1e-4
    del score


def test_infill_prompt_assembly(model_path, tmp_path):
    """FIM tokens present -> [BOS] <PRE> prefix <SUF> suffix <MID>."""
    from tpulamm.gguf.reader import GGUFReader
    from tpulamm.gguf.writer import GGUFWriter
    from tpulamm.cli.infill import infill_tokens
    # clone the model adding FIM token ids
    src = GGUFReader(model_path)
    path = str(tmp_path / "fim.gguf")
    w = GGUFWriter(path)
    for k, v in src.metadata.items():
        w.add_kv(k, v)
    w.add_kv("tokenizer.ggml.prefix_token_id", 10)
    w.add_kv("tokenizer.ggml.suffix_token_id", 11)
    w.add_kv("tokenizer.ggml.middle_token_id", 12)
    for name, info in src.tensors.items():
        w.add_tensor(name, np.asarray(info.data), shape=info.shape,
                     ggml_type=info.ggml_type)
    w.write()
    src.close()
    eng = Engine(path, n_ctx=64)
    toks = infill_tokens(eng, "aa", "bb")
    bos = eng.tokenizer.vocab.bos_id
    assert toks[0] == bos and toks[1] == 10
    assert 11 in toks and toks[-1] == 12
    assert toks.index(11) > 1


def test_prompt_cache_cli(model_path, tmp_path, capsys):
    from tpulamm.cli.main import main
    cache = str(tmp_path / "cache.npz")
    argv = ["-m", model_path, "-p", "the cat sat on the mat", "-n", "4",
            "--temp", "0", "--prompt-cache", cache, "-c", "64",
            "--no-display-prompt"]
    main(argv)
    out1 = capsys.readouterr()
    # second run with a longer prompt sharing the prefix reuses the cache
    argv2 = ["-m", model_path, "-p", "the cat sat on the mat and slept",
             "-n", "4", "--temp", "0", "--prompt-cache", cache, "-c", "64",
             "--no-display-prompt"]
    main(argv2)
    out2 = capsys.readouterr()
    assert "prompt cache: reusing" in out2.err
    # and the continuation must equal a cache-less run
    argv3 = ["-m", model_path, "-p", "the cat sat on the mat and slept",
             "-n", "4", "--temp", "0", "-c", "64", "--no-display-prompt"]
    main(argv3)
    out3 = capsys.readouterr()
    assert out2.out == out3.out
    del out1


def test_server_grammar_param(model_path):
    import threading
    from tpulamm.server.server import serve
    started = threading.Event()
    th = threading.Thread(target=serve, args=(model_path,),
                          kwargs=dict(port=0, n_slots=2, n_ctx=64,
                                      started=started), daemon=True)
    th.start()
    assert started.wait(timeout=300)
    url = f"http://127.0.0.1:{started.httpd.server_port}"
    body = json.dumps({
        "prompt": "x", "n_predict": 6, "temperature": 1.0,
        "grammar": 'root ::= [0-9]+\n'}).encode()
    req = urllib.request.Request(url + "/completion", data=body,
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        res = json.loads(r.read())
    assert res["content"]
    assert all(c in "0123456789" for c in res["content"])
    started.httpd.shutdown()


def test_beam_retirement_frees_slots(tmp_path):
    """A beam ending in EOS must free its slot for later forks (regression:
    retired-beam slots leaked and beam_search crashed with IndexError)."""
    from tpulamm.models.config import ModelConfig
    from tpulamm.ops.rope import RopeParams
    from tpulamm.train.model import init_params, save_params_gguf
    cfg = ModelConfig(arch="llama", vocab_size=16, dim=64, n_layers=1,
                      n_heads=2, n_kv_heads=2, ffn_dim=128, n_ctx_train=64,
                      norm_eps=1e-5, rope=RopeParams(n_rot=32),
                      compute_dtype="float32")
    params = init_params(cfg, seed=7)
    path = str(tmp_path / "v16.gguf")
    save_params_gguf(params, cfg, path)
    eng = Engine(path, n_ctx=64, n_slots=8)
    # with vocab 16 and 8 beams, EOS (id 2) lands in the beam set quickly;
    # generation must complete without slot exhaustion
    toks, score = beam_search(eng, [1, 5, 9], n_beams=8, n_predict=12)
    assert len(toks) <= 12 and np.isfinite(score)

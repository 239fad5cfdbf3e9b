"""BPE and WPM tokenizer goldens vs HF slow tokenizers.

The reference validates tokenizers with golden encodings of real vocabs
(tests/test-tokenizer-1-bpe.cpp etc.); offline we construct small synthetic
vocab/merges files, instantiate HF's reference implementations (GPT2Tokenizer
= the byte-level BPE llama.cpp mirrors; BertTokenizer = the WordPiece
llm_tokenizer_wpm mirrors) and require identical ids.
"""

import json

import pytest

pytest.importorskip("transformers")
from transformers import BertTokenizer, GPT2Tokenizer  # noqa: E402

from tpulamm.tokenizer.bpe import BPETokenizer, bytes_to_unicode  # noqa: E402
from tpulamm.tokenizer.spm import Vocab  # noqa: E402
from tpulamm.tokenizer.wpm import WPMTokenizer  # noqa: E402

SENTENCES = [
    "Hello world!",
    "  leading spaces and   runs",
    "The 1234 numbers, punct!!! and CamelCase.",
    "don't you've we'll it's",
    "tab\tand\nnewline",
    "unicode: café naïve 北京 🚀",
    "",
    " ",
]


@pytest.fixture(scope="module")
def bpe_pair(tmp_path_factory):
    d = tmp_path_factory.mktemp("bpe")
    units = list(bytes_to_unicode().values())
    merges = ["h e", "l l", "he ll", "hell o", "Ġ w", "Ġw o", "Ġwo r",
              "Ġwor l", "Ġworl d", "t h", "th e", "Ġ t", "Ġt he", "a n",
              "an d", "i n", "in g", "o u", "Ġ a", "1 2", "12 3", "e r",
              "' s", "n 't", "Ġ n"]
    tokens = units + [m.replace(" ", "") for m in merges]
    vocab = {t: i for i, t in enumerate(tokens)}
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n" + "\n".join(merges) + "\n")
    hf = GPT2Tokenizer(str(d / "vocab.json"), str(d / "merges.txt"))
    ours = BPETokenizer(Vocab(
        tokens=tokens, scores=[0.0] * len(tokens),
        token_types=[1] * len(tokens), bos_id=-1, eos_id=-1, unk_id=0,
        add_bos=False, model="gpt2", merges=merges))
    return hf, ours


@pytest.mark.parametrize("text", SENTENCES)
def test_bpe_matches_hf(bpe_pair, text):
    hf, ours = bpe_pair
    assert ours.encode(text) == hf.encode(text)


@pytest.mark.parametrize("text", SENTENCES)
def test_bpe_decode_roundtrip(bpe_pair, text):
    _, ours = bpe_pair
    assert ours.decode(ours.encode(text)) == text


def test_bpe_special_token_partition(bpe_pair):
    _, ours = bpe_pair
    v = ours.vocab
    v.tokens.append("<|endoftext|>")
    v.scores.append(0.0)
    v.token_types.append(3)  # control
    ours2 = BPETokenizer(v)
    ids = ours2.encode("hello<|endoftext|>world", special=True)
    eot = len(v.tokens) - 1
    assert eot in ids
    # text around the special token still tokenizes
    assert ids[0] == ours2.token_to_id["hello"]


@pytest.fixture(scope="module")
def wpm_pair(tmp_path_factory):
    d = tmp_path_factory.mktemp("wpm")
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "hello", "world", "the", "quick", "brown", "fox", "##s",
             "##ing", "##ed", "un", "##believ", "##able", "number",
             "##1", "##2", "##3", "1", "2", "3", ",", ".", "!", "?",
             "北", "京",
             "cafe", "naive", "a", "b", "c", "d", "e", "f", "g", "h", "i",
             "j", "k", "l", "m", "n", "o", "p", "q", "r", "s", "t", "u",
             "v", "w", "x", "y", "z", "##a", "##b", "##c", "##d", "##e",
             "##f", "##g", "##h", "##i", "##j", "##k", "##l", "##m", "##n",
             "##o", "##p", "##q", "##r", "##s2", "##t", "##u", "##v",
             "##w", "##x", "##y", "##z"]
    (d / "vocab.txt").write_text("\n".join(words) + "\n")
    hf = BertTokenizer(str(d / "vocab.txt"), do_lower_case=True)
    # GGUF-side vocab: converted like convert-hf-to-gguf BertModel.set_vocab
    # ("##x" -> "x", "x" -> "▁x"); specials become control tokens
    gg_tokens = []
    ttypes = []
    for w in words:
        if w.startswith("[") and w.endswith("]"):
            gg_tokens.append(w)
            ttypes.append(3)
        elif w.startswith("##"):
            gg_tokens.append(w[2:])
            ttypes.append(1)
        else:
            gg_tokens.append("▁" + w)
            ttypes.append(1)
    ours = WPMTokenizer(Vocab(
        tokens=gg_tokens, scores=[0.0] * len(gg_tokens), token_types=ttypes,
        bos_id=2, eos_id=3, unk_id=1, add_bos=True, model="bert"))
    return hf, ours


@pytest.mark.parametrize("text", [
    "hello world",
    "the quick brown foxs",
    "unbelievable",
    "Hello, World!",
    "numbers 123 and punct?!",
    "北京 cafe",
    "HELLO THE WORLD",
])
def test_wpm_matches_hf(wpm_pair, text):
    hf, ours = wpm_pair
    assert ours.encode(text) == hf.encode(text, add_special_tokens=True)


def test_wpm_unknown_word(wpm_pair):
    hf, ours = wpm_pair
    # a word with no matching pieces at all -> single UNK, like the reference
    assert ours.encode("ß") == hf.encode("ß", add_special_tokens=True)


def test_vocab_from_hf_roundtrip(bpe_pair):
    """vocab_from_hf(hf tokenizer) -> GGUF metadata -> our tokenizer must
    reproduce the HF encoding (the converter's tokenizer-metadata path)."""
    from tpulamm.tools.convert_hf import vocab_from_hf
    hf, _ = bpe_pair
    v = vocab_from_hf(hf)
    assert v["model"] == "gpt2" and v["merges"]
    md = {
        "tokenizer.ggml.model": v["model"],
        "tokenizer.ggml.tokens": v["tokens"],
        "tokenizer.ggml.scores": v["scores"],
        "tokenizer.ggml.token_type": v["token_type"],
        "tokenizer.ggml.merges": v["merges"],
    }
    from tpulamm.tokenizer.spm import build_tokenizer
    ours = build_tokenizer(md)
    for text in SENTENCES:
        assert ours.encode(text) == hf.encode(text)


def test_wpm_partial_word_divergence(wpm_pair):
    """Documented divergence from HF WordPiece, faithful to the reference:
    llm_tokenizer_wpm (llama.cpp:9938-9957) skips unmatched characters
    mid-word and keeps the matched pieces; HF UNKs the whole word."""
    hf, ours = wpm_pair
    our_ids = ours.encode("aß")
    hf_ids = hf.encode("aß", add_special_tokens=True)
    assert hf_ids[1] == 1                     # HF: whole word -> [UNK]
    assert ours.vocab.unk_id not in our_ids   # ours: 'a' kept, 'ß' skipped

"""SPM tokenizer semantics tests (vs llm_tokenizer_spm behavior)."""

import numpy as np
import pytest

from tpulamm.tokenizer.spm import (SPMTokenizer, Vocab, TOKEN_TYPE_BYTE,
                                   TOKEN_TYPE_CONTROL, TOKEN_TYPE_NORMAL,
                                   TOKEN_TYPE_UNKNOWN)


def make_vocab():
    # a tiny llama-style vocab: specials, bytes, then pieces with scores
    tokens = ["<unk>", "<s>", "</s>"]
    ttypes = [TOKEN_TYPE_UNKNOWN, TOKEN_TYPE_CONTROL, TOKEN_TYPE_CONTROL]
    scores = [0.0, 0.0, 0.0]
    for b in range(256):
        tokens.append(f"<0x{b:02X}>")
        ttypes.append(TOKEN_TYPE_BYTE)
        scores.append(0.0)
    pieces = {
        "▁": -2.0, "a": -3.0, "b": -3.5, "c": -4.0,
        "ab": -1.0, "abc": -0.5, "▁ab": -0.9, "▁h": -3.0, "i": -3.2,
        "▁hi": -1.5, "hello": -2.5, "▁hello": -1.2,
    }
    for t, s in pieces.items():
        tokens.append(t)
        ttypes.append(TOKEN_TYPE_NORMAL)
        scores.append(s)
    return Vocab(tokens=tokens, scores=scores, token_types=ttypes,
                 bos_id=1, eos_id=2, unk_id=0)


@pytest.fixture(scope="module")
def tok():
    return SPMTokenizer(make_vocab())


def ids_to_text(tok, ids):
    return [tok.vocab.tokens[i] for i in ids]


def test_greedy_merge_order(tok):
    # "abc" should merge to the single best-scoring piece "abc"
    ids = tok.encode("abc", add_bos=False)
    # leading space prefix -> "▁abc" -> no such piece, so best split
    names = ids_to_text(tok, ids)
    assert names == ["▁", "abc"]


def test_bos_and_space_prefix(tok):
    ids = tok.encode("hi")
    names = ids_to_text(tok, ids)
    assert names[0] == "<s>"
    assert names[1] == "▁hi"


def test_byte_fallback(tok):
    ids = tok.encode("q", add_bos=False)  # 'q' not in vocab
    names = ids_to_text(tok, ids)
    assert names[0] == "▁"
    assert names[1] == "<0x71>"  # 'q'


def test_utf8_byte_fallback_roundtrip(tok):
    text = "héllo"  # é not in vocab -> two utf-8 bytes
    ids = tok.encode(text, add_bos=False)
    assert tok.decode(ids) == " " + text


def test_special_token_partition(tok):
    ids = tok.encode("hi</s>hi", add_bos=False, special=True)
    names = ids_to_text(tok, ids)
    assert "</s>" in names
    i = names.index("</s>")
    assert names[i - 1] != "</s>" and len(names) >= 3


def test_specials_not_matched_without_flag(tok):
    ids = tok.encode("</s>", add_bos=False, special=False)
    names = ids_to_text(tok, ids)
    assert "</s>" not in names  # literal text, byte-fallback pieces


def test_empty(tok):
    assert tok.encode("", add_bos=False) == []
    assert tok.encode("", add_bos=True) == [1]


def test_decode_pieces(tok):
    # control tokens render empty unless special=True
    assert tok.decode([1, tok.token_to_id["▁hi"]]) == " hi"
    assert tok.decode([1], special=True) == "<s>"


def test_native_spm_matches_python():
    """native/tl_tokenizer.cpp must produce identical ids to the Python
    reference merge loop on realistic vocabs and random unicode text."""
    import random
    from tpulamm.quant.native import get_lib
    from tpulamm.tokenizer.spm import SPMTokenizer, Vocab
    if get_lib() is None or not hasattr(get_lib(), "tl_spm_new"):
        import pytest
        pytest.skip("native library unavailable")

    rng = random.Random(0)
    tokens = ["<unk>", "<s>", "</s>"]
    types = [2, 3, 3]
    for b in range(256):
        tokens.append(f"<0x{b:02X}>"); types.append(6)
    words = ["▁the", "▁cat", "▁do", "▁dog", "do", "og", "▁d", "c", "at",
             "▁ca", "▁c", "th", "▁t", "he", "▁th", "e", "▁", "a", "t",
             "▁a", "▁an", "and", "▁and", "n", "d", "o", "g", "he▁", "sat",
             "▁s", "▁sat", "語", "日本", "▁日本語", "é", "caf", "▁café"]
    scores = [0.0] * len(tokens) + [-float(i + 1) for i in range(len(words))]
    tokens += words
    types += [1] * len(words)
    v = Vocab(tokens=tokens, scores=scores, token_types=types)
    tok = SPMTokenizer(v)
    assert tok._native is not None

    # python-only twin
    tok_py = SPMTokenizer(v)
    tok_py._native = None

    cases = ["the cat sat", "a dog and a cat", "日本語 café",
             "the the the", "", " ", "xyz unknown ★ bytes",
             "café au lait", "and and and the dog"]
    for _ in range(40):
        cases.append("".join(rng.choice("the catdogandé日本語 ★x")
                             for _ in range(rng.randint(1, 60))))
    for text in cases:
        assert tok.encode(text) == tok_py.encode(text), repr(text)


def test_spm_no_space_prefix_after_leading_special(tok):
    """llama.cpp b2430: the space prefix applies only when the very first
    fragment is raw — a leading special token (chat templates) suppresses
    it (llama_tokenize_internal: '&fragment == &fragment_buffer.front()')."""
    bos = tok.vocab.bos_id
    after_special = tok.encode("<s>x", add_bos=False, special=True)
    assert after_special[0] == bos
    # expected: the raw "x" WITHOUT any space prefix
    want: list[int] = []
    tok._spm_encode("x", want)
    assert after_special[1:] == want
    # and the plain front-of-text case still gets the prefix
    if tok.vocab.add_space_prefix:
        assert tok.encode("x", add_bos=False, special=True) != want

"""Speculative decoding: draft-model and prompt-lookup (n-gram) drafting.

Capability parity with the reference's decode-loop examples:
- examples/speculative/speculative.cpp (604 LoC): a small draft model
  proposes n_draft tokens; the target model scores the whole draft in ONE
  forward pass; accepted = the longest prefix where the target sampler's
  own choice equals the draft; rejected KV cells are dropped with
  llama_kv_cache_seq_rm. On TPU the verification pass is a single batched
  matmul-heavy step, so acceptance-rate x draft-length translates directly
  into decode speedup (decode is HBM-bandwidth-bound; one weight read
  scores k+1 tokens).
- examples/lookup/lookup.cpp (241 LoC): prompt n-gram speculation — the
  draft comes from matching the most recent n-gram of the generated context
  against earlier context, no second model needed.

Both return (token_ids, text, stats) and leave the engine state exactly as
plain autoregressive decoding would (same KV contents for the accepted
prefix; positions beyond it removed).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from tpulamm.runtime.engine import Engine
from tpulamm.runtime.sampling import Sampler, SamplingParams


@dataclass
class SpecStats:
    n_drafted: int = 0
    n_accepted: int = 0
    n_target_steps: int = 0

    @property
    def accept_rate(self) -> float:
        return self.n_accepted / max(self.n_drafted, 1)


def _mk_sampler(engine: Engine, sampling: SamplingParams | None,
                grammar=None) -> Sampler:
    sampling = sampling or SamplingParams()
    eos = engine.tokenizer.vocab.eos_id if engine.tokenizer else 2
    pieces = engine.token_pieces() if grammar is not None else None
    return Sampler(sampling, engine.cfg.vocab_size, eos_id=eos,
                   grammar=grammar, token_pieces=pieces)


def _tokens(engine: Engine, prompt) -> list[int]:
    if isinstance(prompt, str):
        assert engine.tokenizer is not None
        return engine.tokenizer.encode(prompt, special=True)
    return list(prompt)


def _spec_loop(target: Engine, sampler: Sampler, first_logits: np.ndarray,
               propose, on_accept, n_predict: int, eos: int,
               stop_on_eos: bool, slot: int, stream=None):
    """Shared verify loop: `propose(cur)` -> draft list; `on_accept(toks)`
    keeps auxiliary state (draft engine / history) in sync."""
    stats = SpecStats()
    out: list[int] = []
    # byte tokens may split multi-byte UTF-8 across steps: stream through
    # an incremental decoder (same as Engine.generate)
    import codecs
    sdec = codecs.getincrementaldecoder("utf-8")("replace")

    def emit(tok):
        if stream is not None and target.tokenizer is not None:
            piece = sdec.decode(target.tokenizer.token_bytes(tok))
            if piece:
                stream(piece)

    cur = sampler.sample(first_logits)
    sampler.accept(cur)
    while len(out) < n_predict:
        if stop_on_eos and cur == eos and not sampler.params.ignore_eos:
            break
        out.append(cur)
        emit(cur)
        if len(out) >= n_predict:
            break
        draft = propose(cur)
        stats.n_drafted += len(draft)
        stats.n_target_steps += 1
        base = int(target.n_past[slot])
        logits = target.eval_tokens(slot, [cur] + draft)   # (1+k, vocab)
        accepted: list[int] = []
        nxt = None
        for i in range(len(draft) + 1):
            tok = sampler.sample(logits[i])
            if i < len(draft) and tok == draft[i]:
                sampler.accept(tok)
                accepted.append(tok)
            else:
                nxt = tok
                break
        stats.n_accepted += len(accepted)
        # keep only [cur] + accepted in the target KV
        target.rollback(slot, base + 1 + len(accepted))
        on_accept([cur] + accepted)
        hit_eos = False
        for t in accepted:
            if stop_on_eos and t == eos and not sampler.params.ignore_eos:
                hit_eos = True       # accepted draft ended the sequence
                break
            out.append(t)
            emit(t)
        if hit_eos:
            break
        sampler.accept(nxt)
        cur = nxt
    return out, stats


def generate_speculative(target: Engine, draft: Engine, prompt, *,
                         n_predict: int = 128,
                         sampling: SamplingParams | None = None,
                         n_draft: int = 5, slot: int = 0,
                         stop_on_eos: bool = True, stream=None, grammar=None):
    """Draft-model speculative decoding (speculative.cpp parity)."""
    tokens = _tokens(target, prompt)
    if grammar is not None and isinstance(grammar, str):
        from tpulamm.grammar.engine import Grammar
        grammar = Grammar.from_gbnf(grammar)
    sampler = _mk_sampler(target, sampling, grammar)
    for t in tokens:
        sampler.accept(t, apply_grammar=False)

    logits = target.prefill(slot, tokens)
    draft.prefill(slot, tokens)

    def propose(cur: int) -> list[int]:
        # draft greedily proposes n_draft continuations of cur
        base = int(draft.n_past[slot])
        toks: list[int] = []
        lg = draft.decode_one(slot, cur)
        for _ in range(n_draft):
            t = int(np.argmax(lg))
            toks.append(t)
            if len(toks) < n_draft:
                lg = draft.decode_one(slot, t)
        # drop the drafted cells; on_accept replays the accepted prefix
        draft.rollback(slot, base)
        return toks

    def on_accept(chunk: list[int]):
        draft.eval_tokens(slot, chunk)

    eos = target.tokenizer.vocab.eos_id if target.tokenizer else 2
    out, stats = _spec_loop(target, sampler, logits, propose, on_accept,
                            n_predict, eos, stop_on_eos, slot, stream)
    text = target.tokenizer.decode(out) if target.tokenizer else ""
    return out, text, stats


def find_ngram_draft(history: list[int], n_draft: int,
                     ngram_min: int = 1, ngram_max: int = 4) -> list[int]:
    """Prompt-lookup proposal: match the most recent n-gram against earlier
    history and copy what followed it (lookup.cpp / common ngram cache)."""
    h = history
    n = len(h)
    for g in range(min(ngram_max, n - 1), ngram_min - 1, -1):
        tail = h[n - g:]
        # search latest earlier occurrence
        for start in range(n - g - 1, -1, -1):
            if h[start:start + g] == tail:
                cont = h[start + g:start + g + n_draft]
                if cont:
                    return cont
    return []


def generate_prompt_lookup(engine: Engine, prompt, *, n_predict: int = 128,
                           sampling: SamplingParams | None = None,
                           n_draft: int = 5, ngram_min: int = 1,
                           ngram_max: int = 4, slot: int = 0,
                           stop_on_eos: bool = True, stream=None,
                           grammar=None):
    """Prompt n-gram speculative decoding (lookup.cpp parity)."""
    tokens = _tokens(engine, prompt)
    if grammar is not None and isinstance(grammar, str):
        from tpulamm.grammar.engine import Grammar
        grammar = Grammar.from_gbnf(grammar)
    sampler = _mk_sampler(engine, sampling, grammar)
    for t in tokens:
        sampler.accept(t, apply_grammar=False)

    logits = engine.prefill(slot, tokens)
    history = list(tokens)

    def propose(cur: int) -> list[int]:
        return find_ngram_draft(history + [cur], n_draft,
                                ngram_min, ngram_max)

    def on_accept(chunk: list[int]):
        history.extend(chunk)

    eos = engine.tokenizer.vocab.eos_id if engine.tokenizer else 2
    out, stats = _spec_loop(engine, sampler, logits, propose, on_accept,
                            n_predict, eos, stop_on_eos, slot, stream)
    text = engine.tokenizer.decode(out) if engine.tokenizer else ""
    return out, text, stats

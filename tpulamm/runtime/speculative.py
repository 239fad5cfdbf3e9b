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


# -- on-device speculative decoding -------------------------------------------
#
# The host loop above pays one device round-trip per VERIFY step (plus k
# per draft proposal) — fine on a directly-attached chip, ruinous through a
# tunneled transport. The TPU-native form runs the whole
# draft -> verify -> accept cycle inside one jitted lax.while_loop:
#
#  - the draft model proposes k tokens with an inner lax.scan (k tiny
#    forwards, KV written at positions pos..pos+k-1, plus one extra forward
#    so the last proposal's KV is present if it gets accepted);
#  - the target scores [cur] + draft in ONE (1+k)-token forward (decode is
#    weight-streaming-bound, so this costs nearly the same as one token);
#  - acceptance is the longest prefix where the target's own sampled choice
#    equals the draft (speculative.cpp semantics), computed with vector ops;
#  - REJECTED cells need no surgery: cells are indexed by position and the
#    attention mask requires cell_pos <= qpos, so a rejected cell is either
#    overwritten by the next verify write at the same position or causally
#    masked until it is. Only the final loop exit rolls positions back.
#
# Greedy speculative decoding is OUTPUT-INVARIANT: for any draft model the
# emitted tokens equal plain greedy decoding of the target (only the speed
# changes). tests/test_speculative.py uses that as an exact parity gate.
#
# Temperature verify has two exact acceptance rules:
#  - TOKEN-MATCH (legacy, TPULAMM_SPEC_TOKEN_MATCH=1): sample t_j from the
#    target per position, accept while t_j equals the draft. Exact (every
#    emitted token IS a target sample) but acceptance probability is
#    sum_x p(x)q(x) — low when both distributions are spread (measured
#    10.7% at temp 0.8, PERF.md r4).
#  - STOCHASTIC (default for temp>0): true speculative sampling
#    (speculative.cpp:245-295; Leviathan et al.) — the draft SAMPLES its
#    proposals from q, acceptance is u <= p(d)/q(d) per position, the
#    first rejection resamples from normalize(max(p-q, 0)). Exact by the
#    standard telescoping argument, with acceptance sum_x min(p(x), q(x))
#    >= sum_x p(x)q(x): strictly better whenever the distributions
#    overlap. tests/test_speculative.py gates the emitted-token
#    distribution against plain sampling empirically.


def _dense_dist(lg, temp, top_k: int):
    """(V,) logits -> the plain sampler's distribution (temp + top-k),
    dense over V. Matches Engine._sample_next's categorical over the
    top-k set: entries below the k-th largest logit get probability 0.
    (A boundary TIE keeps every tied element where _sample_next keeps
    exactly k — measure-zero for real-model logits.)"""
    import jax
    import jax.numpy as jnp
    t = jnp.maximum(temp, 1e-6)
    if top_k > 0:
        thr = jax.lax.top_k(lg, top_k)[0][-1]
        lg = jnp.where(lg >= thr, lg, -jnp.inf)
    return jax.nn.softmax(lg / t)


def _dist_sample(dist, key):
    """Categorical draw from a dense probability vector (zeros excluded)."""
    import jax
    import jax.numpy as jnp
    return jax.random.categorical(
        key, jnp.where(dist > 0, jnp.log(dist), -jnp.inf)).astype(jnp.int32)


def _stochastic_accept(pt, qd, draft_toks, key):
    """Speculative-sampling acceptance with residual resampling.

    Reference semantics: speculative.cpp:245-295 — per position draw
    u ~ U(0,1), accept draft token d_i iff u <= p_i(d_i)/q_i(d_i); at the
    first rejection sample the correction from normalize(max(p_i - q_i, 0));
    if all k accepted, the bonus token samples from p_k. Emitted tokens are
    distributed EXACTLY as plain target sampling (Leviathan et al. 2023,
    thm 1), for any draft distribution q.

    pt: (k+1, V) target dists; qd: (k, V) draft dists; draft_toks: (k,).
    Returns (n_acc, nxt, key)."""
    import jax
    import jax.numpy as jnp
    k = qd.shape[0]
    key, ku, kr = jax.random.split(key, 3)
    u = jax.random.uniform(ku, (k,))
    p_at = jnp.take_along_axis(pt[:k], draft_toks[:, None], 1)[:, 0]
    q_at = jnp.take_along_axis(qd, draft_toks[:, None], 1)[:, 0]
    # u*q <= p  <=>  u <= p/q (q(d) > 0 since d was sampled from q); the
    # multiplied form needs no divide-by-zero guard
    acc = u * q_at <= p_at
    n_acc = jnp.where(acc.all(), k, jnp.argmax(~acc)).astype(jnp.int32)
    p_sel = pt[n_acc]                                     # (V,)
    q_sel = jnp.where(n_acc < k,
                      qd[jnp.minimum(n_acc, k - 1)], 0.0)  # 0 => bonus pos
    res = jnp.maximum(p_sel - q_sel, 0.0)
    den = res.sum()
    # den == 0 on a rejection requires p == q pointwise, whose rejection
    # probability is 0; the p_sel fallback only guards float dust
    dist = jnp.where(den > 0, res / jnp.maximum(den, 1e-30), p_sel)
    nxt = _dist_sample(dist, kr)
    return n_acc, nxt, key


def _build_spec_scan(target: Engine, draft: Engine, n_draft: int,
                     max_steps: int, top_k: int, greedy: bool,
                     span_t: int | None = None, span_d: int | None = None,
                     stochastic: bool = False):
    import jax
    import jax.numpy as jnp

    cfg_t, cfg_d = target.cfg_step, draft.cfg_step
    fwd_t, fwd_d = target._model_forward, draft._model_forward
    k = n_draft
    Vt, Vd = cfg_t.vocab_size, cfg_d.vocab_size
    n_ctx = min(target.n_ctx, draft.n_ctx)

    def run(params_t, cache_t, params_d, cache_d, first_tok, start_pos,
            key, temp, eos_id, n_predict):
        rows0 = jnp.full((max_steps, k + 1), -1, jnp.int32)
        accs0 = jnp.zeros((max_steps,), jnp.int32)

        def cond(st):
            (_, _, _, pos, _, _, _, i, emitted, done) = st
            return ((~done) & (i < max_steps) & (emitted < n_predict)
                    & (pos + k + 1 <= n_ctx))

        def body(st):
            (cache_t, cache_d, tok, pos, key, rows, accs, i, emitted,
             done) = st

            if stochastic:
                key, dk = jax.random.split(key)
                dkeys = jax.random.split(dk, k)
            else:
                dkeys = jnp.zeros((k, 2), jnp.uint32)    # unused

            def dstep(c, dkey):
                cache_d, t, p = c
                lg, cache_d = fwd_d(params_d, cfg_d, t[None, None],
                                    p[None, None], cache_d, None,
                                    p[None, None], kv_span=span_d)
                lgv = lg[0, 0, :Vd]
                if stochastic:
                    # SAMPLE from the draft's own temp/top-k distribution
                    # and keep it: the acceptance ratio and the residual
                    # need q, not just the token
                    q = _dense_dist(lgv, temp, top_k)
                    nt = _dist_sample(q, dkey)
                    out = (nt, q)
                else:
                    nt = jnp.argmax(lgv).astype(jnp.int32)
                    out = (nt, jnp.zeros((0,), jnp.float32))
                return (cache_d, nt, p + 1), out

            (cache_d, last, pd), (draft_toks, qds) = jax.lax.scan(
                dstep, (cache_d, tok, pos), dkeys, length=k)
            # write the last proposal's KV too (its logits are unused): if
            # the whole draft is accepted the next cycle proposes from a
            # context that includes it (host path replays via on_accept)
            _, cache_d = fwd_d(params_d, cfg_d, last[None, None],
                               pd[None, None], cache_d, None,
                               pd[None, None], kv_span=span_d)

            toks = jnp.concatenate([tok[None], draft_toks])          # (k+1,)
            poss = pos + jnp.arange(k + 1, dtype=jnp.int32)
            logits, cache_t = fwd_t(params_t, cfg_t, toks[None],
                                    poss[None], cache_t, None, poss[None],
                                    kv_span=span_t)
            lg = logits[0, :, :Vt]                                 # (k+1, V)
            if greedy:
                tgt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
                match = tgt[:k] == draft_toks
                n_acc = jnp.where(match.all(), k,
                                  jnp.argmax(~match)).astype(jnp.int32)
                nxt = tgt[n_acc]
            elif stochastic:
                pt = jax.vmap(lambda l: _dense_dist(l, temp, top_k))(lg)
                n_acc, nxt, key = _stochastic_accept(pt, qds, draft_toks,
                                                     key)
            else:
                key, sub = jax.random.split(key)
                subs = jax.random.split(sub, k + 1)
                tgt = jax.vmap(
                    lambda l, s: Engine._sample_next(
                        l, s, temp, top_k, False)[1])(lg, subs)
                match = tgt[:k] == draft_toks
                n_acc = jnp.where(match.all(), k,
                                  jnp.argmax(~match)).astype(jnp.int32)
                nxt = tgt[n_acc]
            idx = jnp.arange(k + 1, dtype=jnp.int32)
            row = jnp.where(idx < n_acc,
                            jnp.concatenate([draft_toks, draft_toks[:1]]),
                            jnp.where(idx == n_acc, nxt, -1))
            hit_eos = jnp.any((idx <= n_acc) & (row == eos_id))
            rows = jax.lax.dynamic_update_slice(rows, row[None], (i, 0))
            accs = jax.lax.dynamic_update_slice(accs, n_acc[None], (i,))
            n_emit = n_acc + 1
            return (cache_t, cache_d, nxt, pos + n_emit, key, rows, accs,
                    i + 1, emitted + n_emit, done | hit_eos)

        st = (cache_t, cache_d, first_tok, start_pos, key, rows0, accs0,
              jnp.int32(0), jnp.int32(0), jnp.bool_(False))
        (cache_t, cache_d, _, pos, _, rows, accs, n_steps, emitted,
         _) = jax.lax.while_loop(cond, body, st)
        return rows, accs, n_steps, pos, cache_t, cache_d

    return jax.jit(run, donate_argnums=(1, 3))


def generate_speculative_fast(target: Engine, draft: Engine, prompt, *,
                              n_predict: int = 128, n_draft: int = 5,
                              temp: float = 0.0, top_k: int = 40,
                              seed: int = 0, stop_on_eos: bool = True):
    """Draft-model speculative decoding with the whole propose/verify/accept
    loop on device (one dispatch per generation block). Greedy (temp<=0)
    emits exactly the tokens plain greedy decoding would; temp>0 uses TRUE
    speculative sampling (speculative.cpp:245-295: draft samples from q,
    accept iff u <= p/q, residual-resample on rejection — emitted tokens
    are distributed exactly as plain target sampling, with acceptance
    sum min(p,q) instead of token-match's sum p*q).
    TPULAMM_SPEC_TOKEN_MATCH=1 restores the legacy token-match verify for
    A/B. Both engines must be single-slot, unmeshed, non-recurrent.

    Returns (token_ids, text, SpecStats)."""
    import os

    import jax
    import jax.numpy as jnp

    for eng, name in ((target, "target"), (draft, "draft")):
        if eng.mesh is not None or eng.recurrent or eng.n_slots != 1:
            raise ValueError(
                f"{name} engine must be single-slot, unmeshed, "
                "non-recurrent for on-device speculation")
    tokens = _tokens(target, prompt)
    target.reset_slot(0)
    draft.reset_slot(0)
    logits = target.prefill(0, tokens)
    draft.prefill(0, tokens)
    import time
    t0 = time.perf_counter()
    first = int(np.argmax(logits))
    eos = target.tokenizer.vocab.eos_id if target.tokenizer else 2
    greedy = temp <= 0.0
    # the residual max(p-q, 0) needs p and q over the SAME vocab
    stochastic = (not greedy
                  and target.cfg.vocab_size == draft.cfg.vocab_size
                  and os.environ.get("TPULAMM_SPEC_TOKEN_MATCH",
                                     "0") == "0")

    max_steps = next((b for b in Engine.DECODE_BUCKETS if b >= n_predict),
                     Engine.DECODE_BUCKETS[-1])
    scans = getattr(target, "_spec_scans", None)
    if scans is None:
        scans = target._spec_scans = {}
    stats = SpecStats()
    out = [first]
    cur = first
    start0 = int(target.n_past[0])
    while len(out) < n_predict and not (stop_on_eos and eos in out):
        startb = int(target.n_past[0])
        # last verify step may overshoot n_predict by up to k accepted
        # tokens, and its KV writes reach k past the final position
        budget = n_predict - len(out) + 2 * n_draft + 2
        span_t = target._kv_span(budget)
        span_d = draft._kv_span(budget)
        cache_key = (id(draft), n_draft, max_steps, top_k, greedy,
                     span_t, span_d, stochastic)
        if cache_key not in scans:
            scans[cache_key] = _build_spec_scan(
                target, draft, n_draft, max_steps, top_k, greedy,
                span_t=span_t, span_d=span_d, stochastic=stochastic)
        rows, accs, n_steps, pos, target.cache, draft.cache = \
            scans[cache_key](
                target.params, target.cache, draft.params, draft.cache,
                jnp.int32(cur), jnp.int32(startb),
                jax.random.PRNGKey(seed + len(out)), jnp.float32(temp),
                jnp.int32(eos if stop_on_eos else -1),
                jnp.int32(n_predict - len(out)))
        rows, accs, n_steps, pos = jax.device_get((rows, accs, n_steps,
                                                   pos))   # one round-trip
        n_steps, pos = int(n_steps), int(pos)
        if n_steps == 0:
            break                                    # context full
        stats.n_target_steps += n_steps
        stats.n_drafted += n_draft * n_steps
        stats.n_accepted += int(accs[:n_steps].sum())
        block = [int(t) for r in rows[:n_steps] for t in r if t >= 0]
        # device state: positions startb..pos-1 hold [cur] + block[:-1];
        # mirror that before the final EOS/n_predict rollback below
        target.n_past[0] = pos
        target.cell_pos[0, startb:pos] = np.arange(startb, pos)
        draft.n_past[0] = pos
        draft.cell_pos[0, startb:pos] = np.arange(startb, pos)
        out.extend(block)
        cur = out[-1]
        if pos + n_draft + 1 > min(target.n_ctx, draft.n_ctx):
            break                                    # context full
    total_written = int(target.n_past[0]) - start0
    out = out[:n_predict]
    if stop_on_eos and eos in out:
        out = out[:out.index(eos)]
    # same post-call contract as generate_fast: KV holds exactly the
    # returned tokens (the final token's KV may be unwritten)
    tgt_past = start0 + min(len(out), total_written)
    if tgt_past != int(target.n_past[0]):
        target.rollback(0, tgt_past)
    dr_past = min(tgt_past, int(draft.n_past[0]))
    if dr_past != int(draft.n_past[0]):
        draft.rollback(0, dr_past)
    target.timings.t_eval += time.perf_counter() - t0
    target.timings.n_eval += len(out)
    text = target.tokenizer.decode(out) if target.tokenizer else ""
    return out, text, stats


# -- on-device prompt-lookup speculation ---------------------------------------
#
# lookup.cpp's n-gram drafting with ZERO drafting cost on device: proposals
# come from a vectorized match of the most recent n-gram against a history
# buffer (one VPU compare sweep per gram size), so a verify cycle costs one
# (1+k)-token target forward — the speedup is purely tokens-per-verify.
# When no n-gram matches, the proposal is all-zeros and simply gets
# rejected (greedy output-invariance holds for ANY proposal source).


def _build_lookup_scan(target: Engine, n_draft: int, max_steps: int,
                       top_k: int, greedy: bool, ngram_min: int,
                       ngram_max: int, span_t: int | None = None,
                       raw: bool = False):
    import jax
    import jax.numpy as jnp

    cfg_t = target.cfg_step
    fwd_t = target._model_forward
    k = n_draft
    Vt = cfg_t.vocab_size
    n_ctx = target.n_ctx
    B = target.n_slots

    # history buffer is padded past n_ctx so every in-scan write is a
    # CONTIGUOUS dynamic_update_slice — a masked scatter here measured
    # ~0.9 ms/step on v5e (XLA's dynamic-index scatter lowering), wiping
    # out the speculation win; padding slots hold -1 which never matches
    # a real token id
    H = n_ctx + n_draft + 2

    def propose(h, tok, pos):
        """Latest earlier occurrence of the longest tail n-gram; copy the
        k tokens that followed it (find_ngram_draft semantics)."""
        h = jax.lax.dynamic_update_slice(h, tok[None], (pos,))
        idx = jnp.arange(H, dtype=jnp.int32)
        cand = jnp.zeros((k,), jnp.int32)
        found = jnp.bool_(False)
        for g in range(ngram_max, ngram_min - 1, -1):     # longest first
            tail = jax.lax.dynamic_slice(h, (pos - g + 1,), (g,))
            eq = jnp.ones((H,), bool)
            for j in range(g):
                eq &= jnp.roll(h, -j) == tail[j]
            # match must end before pos and the tail must exist at all
            valid = eq & (idx <= pos - g) & (pos + 1 >= g)
            best = jnp.max(jnp.where(valid, idx, -1))
            cont = jax.lax.dynamic_slice(
                h, (jnp.maximum(best, 0) + g,), (k,))
            hit = best >= 0
            cand = jnp.where(~found & hit, cont, cand)
            found = found | hit
        return h, cand

    def run(params_t, cache_t, h, first_tok, start_pos, slot, key, temp,
            eos_id, n_predict):
        rows0 = jnp.full((max_steps, k + 1), -1, jnp.int32)
        accs0 = jnp.zeros((max_steps,), jnp.int32)

        def cond(st):
            (_, _, _, pos, _, _, _, i, emitted, done) = st
            return ((~done) & (i < max_steps) & (emitted < n_predict)
                    & (pos + k + 1 <= n_ctx))

        def body(st):
            (cache_t, h, tok, pos, key, rows, accs, i, emitted, done) = st
            h, draft_toks = propose(h, tok, pos)

            toks = jnp.concatenate([tok[None], draft_toks])          # (k+1,)
            poss = pos + jnp.arange(k + 1, dtype=jnp.int32)
            # all-slots batch view: only `slot`'s row is live, the rest
            # pad to the trash cell (the engine's n-row step contract)
            rowm = (jnp.arange(B, dtype=jnp.int32) == slot)[:, None]
            tokt = jnp.where(rowm, toks[None, :], 0)
            post = jnp.where(rowm, poss[None, :], -1)
            cellt = jnp.where(rowm, poss[None, :], n_ctx)
            logits, cache_t = fwd_t(params_t, cfg_t, tokt, post, cache_t,
                                    None, cellt, kv_span=span_t)
            lg = logits[slot, :, :Vt]                              # (k+1, V)
            if greedy:
                tgt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            else:
                key, sub = jax.random.split(key)
                subs = jax.random.split(sub, k + 1)
                tgt = jax.vmap(
                    lambda l, s: Engine._sample_next(
                        l, s, temp, top_k, False)[1])(lg, subs)
            match = tgt[:k] == draft_toks
            n_acc = jnp.where(match.all(), k,
                              jnp.argmax(~match)).astype(jnp.int32)
            nxt = tgt[n_acc]
            idx = jnp.arange(k + 1, dtype=jnp.int32)
            row = jnp.where(idx < n_acc,
                            jnp.concatenate([draft_toks, draft_toks[:1]]),
                            jnp.where(idx == n_acc, nxt, -1))
            hit_eos = jnp.any((idx <= n_acc) & (row == eos_id))
            rows = jax.lax.dynamic_update_slice(rows, row[None], (i, 0))
            accs = jax.lax.dynamic_update_slice(accs, n_acc[None], (i,))
            # emitted tokens land at h[pos+1 .. pos+1+n_acc]; the row's -1
            # padding beyond n_acc overwrites only not-yet-reached slots
            # (always re-written before pos passes them), so one contiguous
            # update replaces the masked scatter
            h = jax.lax.dynamic_update_slice(h, row, (pos + 1,))
            n_emit = n_acc + 1
            return (cache_t, h, nxt, pos + n_emit, key, rows, accs,
                    i + 1, emitted + n_emit, done | hit_eos)

        st = (cache_t, h, first_tok, start_pos, key, rows0, accs0,
              jnp.int32(0), jnp.int32(0), jnp.bool_(False))
        (cache_t, h, _, pos, _, rows, accs, n_steps, emitted,
         _) = jax.lax.while_loop(cond, body, st)
        return rows, accs, n_steps, pos, cache_t

    if raw:
        # caller wraps (Engine.spec_lookup_block shard_maps under a mesh)
        return run
    return jax.jit(run, donate_argnums=(1, 2))


def generate_prompt_lookup_fast(engine: Engine, prompt, *,
                                n_predict: int = 128, n_draft: int = 5,
                                ngram_min: int = 1, ngram_max: int = 4,
                                temp: float = 0.0, top_k: int = 40,
                                seed: int = 0, stop_on_eos: bool = True,
                                slot: int = 0):
    """Prompt n-gram speculative decoding with the whole loop on device
    (lookup.cpp parity, zero drafting cost). Greedy output is identical to
    plain greedy decoding. Returns (token_ids, text, SpecStats)."""
    import jax
    import jax.numpy as jnp

    if engine.mesh is not None or engine.recurrent:
        raise ValueError("engine must be unmeshed, non-recurrent for "
                         "on-device speculation")
    tokens = _tokens(engine, prompt)
    engine.reset_slot(slot)
    logits = engine.prefill(slot, tokens)
    import time
    t0 = time.perf_counter()
    first = int(np.argmax(logits))
    eos = engine.tokenizer.vocab.eos_id if engine.tokenizer else 2
    greedy = temp <= 0.0

    max_steps = next((b for b in Engine.DECODE_BUCKETS if b >= n_predict),
                     Engine.DECODE_BUCKETS[-1])
    scans = getattr(engine, "_spec_scans", None)
    if scans is None:
        scans = engine._spec_scans = {}
    stats = SpecStats()
    out = [first]
    cur = first
    history = list(tokens)          # tokens BEFORE the current position
    start0 = int(engine.n_past[slot])
    while len(out) < n_predict and not (stop_on_eos and eos in out):
        startb = int(engine.n_past[slot])
        span_t = engine._kv_span(n_predict - len(out) + 2 * n_draft + 2)
        cache_key = ("lookup", n_draft, ngram_min, ngram_max, max_steps,
                     top_k, greedy, span_t)
        if cache_key not in scans:
            scans[cache_key] = _build_lookup_scan(
                engine, n_draft, max_steps, top_k, greedy, ngram_min,
                ngram_max, span_t=span_t)
        # padded so in-scan writes are contiguous; -1 never matches a token
        h = np.full(engine.n_ctx + n_draft + 2, -1, np.int32)
        h[:len(history)] = history
        rows, accs, n_steps, pos, engine.cache = scans[cache_key](
            engine.params, engine.cache, jnp.asarray(h),
            jnp.int32(cur), jnp.int32(startb), jnp.int32(slot),
            jax.random.PRNGKey(seed + len(out)), jnp.float32(temp),
            jnp.int32(eos if stop_on_eos else -1),
            jnp.int32(n_predict - len(out)))
        rows, accs, n_steps, pos = jax.device_get((rows, accs, n_steps,
                                                   pos))   # one round-trip
        n_steps, pos = int(n_steps), int(pos)
        if n_steps == 0:
            break                                    # context full
        stats.n_target_steps += n_steps
        stats.n_drafted += n_draft * n_steps
        stats.n_accepted += int(accs[:n_steps].sum())
        block = [int(t) for r in rows[:n_steps] for t in r if t >= 0]
        engine.n_past[slot] = pos
        engine.cell_pos[slot, startb:pos] = np.arange(startb, pos)
        history.append(cur)
        history.extend(block[:-1])   # block[-1] is the new carry token
        out.extend(block)
        cur = out[-1]
        if pos + n_draft + 1 > engine.n_ctx:
            break                                    # context full
    total_written = int(engine.n_past[slot]) - start0
    out = out[:n_predict]
    if stop_on_eos and eos in out:
        out = out[:out.index(eos)]
    tgt_past = start0 + min(len(out), total_written)
    if tgt_past != int(engine.n_past[slot]):
        engine.rollback(slot, tgt_past)
    engine.timings.t_eval += time.perf_counter() - t0
    engine.timings.n_eval += len(out)
    text = engine.tokenizer.decode(out) if engine.tokenizer else ""
    return out, text, stats


def _build_draft_scan_srv(target: Engine, draft: Engine, n_draft: int,
                          max_steps: int, top_k: int, greedy: bool,
                          span_t: int | None = None,
                          span_d: int | None = None,
                          stochastic: bool = False, raw: bool = False):
    """Draft-model speculation for SERVING: one active slot of a
    multi-slot target engine, single-slot draft engine, the whole
    draft/verify/accept loop in one jitted while_loop (the _build_spec_scan
    body with _build_lookup_scan's compound-row target step). greedy
    verifies by argmax match (output-exact); temp>0 runs TRUE speculative
    sampling (_stochastic_accept) so every emitted token is distributed as
    plain sampling while acceptance is sum min(p,q) — the serving win the
    token-match tier could not reach (PERF.md r4: 10.7% acceptance at
    temp 0.8)."""
    import jax
    import jax.numpy as jnp

    cfg_t, cfg_d = target.cfg_step, draft.cfg_step
    fwd_t, fwd_d = target._model_forward, draft._model_forward
    k = n_draft
    Vt, Vd = cfg_t.vocab_size, cfg_d.vocab_size
    n_ctx = min(target.n_ctx, draft.n_ctx)
    B = target.n_slots

    def run(params_t, cache_t, params_d, cache_d, first_tok, start_pos,
            slot, key, temp, eos_id, n_predict):
        rows0 = jnp.full((max_steps, k + 1), -1, jnp.int32)
        accs0 = jnp.zeros((max_steps,), jnp.int32)

        def cond(st):
            (_, _, _, pos, _, _, _, i, emitted, done) = st
            return ((~done) & (i < max_steps) & (emitted < n_predict)
                    & (pos + k + 1 <= n_ctx))

        def body(st):
            (cache_t, cache_d, tok, pos, key, rows, accs, i, emitted,
             done) = st

            if stochastic:
                key, dk = jax.random.split(key)
                dkeys = jax.random.split(dk, k)
            else:
                dkeys = jnp.zeros((k, 2), jnp.uint32)

            def dstep(c, dkey):
                cache_d, t, p = c
                lg, cache_d = fwd_d(params_d, cfg_d, t[None, None],
                                    p[None, None], cache_d, None,
                                    p[None, None], kv_span=span_d)
                lgv = lg[0, 0, :Vd]
                if stochastic:
                    q = _dense_dist(lgv, temp, top_k)
                    nt = _dist_sample(q, dkey)
                    out = (nt, q)
                else:
                    nt = jnp.argmax(lgv).astype(jnp.int32)
                    out = (nt, jnp.zeros((0,), jnp.float32))
                return (cache_d, nt, p + 1), out

            (cache_d, last, pd), (draft_toks, qds) = jax.lax.scan(
                dstep, (cache_d, tok, pos), dkeys, length=k)
            _, cache_d = fwd_d(params_d, cfg_d, last[None, None],
                               pd[None, None], cache_d, None,
                               pd[None, None], kv_span=span_d)

            toks = jnp.concatenate([tok[None], draft_toks])          # (k+1,)
            poss = pos + jnp.arange(k + 1, dtype=jnp.int32)
            # all-slots batch view: only `slot`'s row is live, the rest
            # pad to the trash cell (the engine's n-row step contract)
            rowm = (jnp.arange(B, dtype=jnp.int32) == slot)[:, None]
            tokt = jnp.where(rowm, toks[None, :], 0)
            post = jnp.where(rowm, poss[None, :], -1)
            cellt = jnp.where(rowm, poss[None, :], target.n_ctx)
            logits, cache_t = fwd_t(params_t, cfg_t, tokt, post, cache_t,
                                    None, cellt, kv_span=span_t)
            lg = logits[slot, :, :Vt]                              # (k+1, V)
            if greedy:
                tgt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
                match = tgt[:k] == draft_toks
                n_acc = jnp.where(match.all(), k,
                                  jnp.argmax(~match)).astype(jnp.int32)
                nxt = tgt[n_acc]
            elif stochastic:
                pt = jax.vmap(lambda l: _dense_dist(l, temp, top_k))(lg)
                n_acc, nxt, key = _stochastic_accept(pt, qds, draft_toks,
                                                     key)
            else:
                key, sub = jax.random.split(key)
                subs = jax.random.split(sub, k + 1)
                tgt = jax.vmap(
                    lambda l, s: Engine._sample_next(
                        l, s, temp, top_k, False)[1])(lg, subs)
                match = tgt[:k] == draft_toks
                n_acc = jnp.where(match.all(), k,
                                  jnp.argmax(~match)).astype(jnp.int32)
                nxt = tgt[n_acc]
            # overshoot past n_predict is trimmed by the caller
            # (_emit_generated), same contract as _build_lookup_scan
            idx = jnp.arange(k + 1, dtype=jnp.int32)
            row = jnp.where(idx < n_acc,
                            jnp.concatenate([draft_toks, draft_toks[:1]]),
                            jnp.where(idx == n_acc, nxt, -1))
            hit_eos = jnp.any((idx <= n_acc) & (row == eos_id))
            rows = jax.lax.dynamic_update_slice(rows, row[None], (i, 0))
            accs = jax.lax.dynamic_update_slice(accs, n_acc[None], (i,))
            n_emit = n_acc + 1
            return (cache_t, cache_d, nxt, pos + n_emit, key, rows, accs,
                    i + 1, emitted + n_emit, done | hit_eos)

        st = (cache_t, cache_d, first_tok, start_pos, key, rows0, accs0,
              jnp.int32(0), jnp.int32(0), jnp.bool_(False))
        (cache_t, cache_d, _, pos, _, rows, accs, n_steps, emitted,
         _) = jax.lax.while_loop(cond, body, st)
        return rows, accs, n_steps, pos, cache_t, cache_d

    if raw:
        return run
    return jax.jit(run, donate_argnums=(1, 3))


def _build_lookup_scan_multi(target: Engine, n_rows: int, n_draft: int,
                             max_steps: int, ngram_min: int, ngram_max: int,
                             span_t: int | None = None, greedy: bool = True,
                             top_k: int = 40, raw: bool = False):
    """Multi-slot prompt-lookup speculation: every ACTIVE slot drafts from
    its own history and ONE (n_rows, 1+k) compound forward verifies all of
    them per step — the serving extension of _build_lookup_scan. Slots
    freeze independently (eos / budget / context) while the loop keeps
    verifying the rest. n_rows may be the engine's active-slot compaction
    bucket (Engine._b_rows) rather than n_slots.

    greedy=False: TEMPERATURE verify with exact acceptance. Lookup drafts
    are deterministic tokens (no draft distribution), so the exact
    speculative rule degenerates to token matching: sample
    t_j ~ p(.|prefix, draft[:j]) per position with the slot's temp/top_k
    (Engine._sample_next — the same sampler the plain fast path uses,
    so distribution parity is by construction), accept while t_j equals
    the draft, and the first mismatch's SAMPLE is the emitted correction.
    Every emitted token is therefore drawn from the true conditional —
    the reference's stochastic-acceptance goal (speculative.cpp:180-260)
    for the degenerate point-mass draft case."""
    import jax
    import jax.numpy as jnp

    cfg_t = target.cfg_step
    fwd_t = target._model_forward
    k = n_draft
    Vt = cfg_t.vocab_size
    n_ctx = target.n_ctx
    B = n_rows
    H = n_ctx + n_draft + 2

    def propose(h, tok, pos):
        """(H,) history -> (k,) draft; same semantics as the single-slot
        scan's propose (latest earlier occurrence of the longest tail
        n-gram). vmapped over slots below."""
        h = jax.lax.dynamic_update_slice(h, tok[None], (pos,))
        idx = jnp.arange(H, dtype=jnp.int32)
        cand = jnp.zeros((k,), jnp.int32)
        found = jnp.bool_(False)
        for g in range(ngram_max, ngram_min - 1, -1):
            tail = jax.lax.dynamic_slice(h, (pos - g + 1,), (g,))
            eq = jnp.ones((H,), bool)
            for j in range(g):
                eq &= jnp.roll(h, -j) == tail[j]
            valid = eq & (idx <= pos - g) & (pos + 1 >= g)
            best = jnp.max(jnp.where(valid, idx, -1))
            cont = jax.lax.dynamic_slice(
                h, (jnp.maximum(best, 0) + g,), (k,))
            hit = best >= 0
            cand = jnp.where(~found & hit, cont, cand)
            found = found | hit
        return h, cand

    def run(params_t, cache_t, h, tok, pos, active0, eos_id, budgets,
            key, temps):
        """h: (B, H); tok/pos: (B,); active0: (B,) bool; budgets: (B,)
        remaining n_predict per slot; key: PRNGKey, temps: (B,) f32
        (both ignored when greedy)."""
        rows0 = jnp.full((max_steps, B, k + 1), -1, jnp.int32)
        accs0 = jnp.zeros((max_steps, B), jnp.int32)

        def cond(st):
            (_, _, _, _, act, _, _, _, i) = st
            return act.any() & (i < max_steps)

        def body(st):
            (cache_t, h, tok, pos, act, emitted, rows, accs, i) = st
            h2, drafts = jax.vmap(propose)(h, tok, pos)   # (B,H), (B,k)
            h = jnp.where(act[:, None], h2, h)

            idxk = jnp.arange(k + 1, dtype=jnp.int32)
            toks = jnp.concatenate([tok[:, None], drafts], axis=1)
            poss = pos[:, None] + idxk[None, :]
            post = jnp.where(act[:, None], poss, -1)
            cellt = jnp.where(act[:, None], poss, n_ctx)
            tokt = jnp.where(act[:, None], toks, 0)
            logits, cache_t = fwd_t(params_t, cfg_t, tokt, post, cache_t,
                                    None, cellt, kv_span=span_t)
            lg = logits[:, :, :Vt]                       # (B, k+1, V)
            if greedy:
                tgt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            else:
                ki = jax.random.fold_in(key, i)
                subs = jax.random.split(ki, B * (k + 1)).reshape(
                    B, k + 1, -1)
                tgt = jax.vmap(lambda ls, ss, tb: jax.vmap(
                    lambda l, s: Engine._sample_next(
                        l, s, tb, top_k, False)[1])(ls, ss))(
                    lg, subs, temps)

            match = tgt[:, :k] == drafts                 # (B, k)
            n_acc = jnp.where(match.all(axis=1), k,
                              jnp.argmax(~match, axis=1)).astype(jnp.int32)
            # never emit past the per-slot budget
            n_acc = jnp.minimum(n_acc, jnp.maximum(budgets - emitted - 1, 0))
            nxt = jnp.take_along_axis(tgt, n_acc[:, None], axis=1)[:, 0]
            row = jnp.where(idxk[None, :] < n_acc[:, None],
                            jnp.concatenate([drafts, drafts[:, :1]], axis=1),
                            jnp.where(idxk[None, :] == n_acc[:, None],
                                      nxt[:, None], -1))
            row = jnp.where(act[:, None], row, -1)
            hit_eos = ((idxk[None, :] <= n_acc[:, None]) &
                       (row == eos_id[:, None])).any(axis=1)
            # emitted history: contiguous per-slot write (same stale-slot
            # argument as the single-slot scan)
            h = jax.vmap(lambda hh, rr, pp: jax.lax.dynamic_update_slice(
                hh, rr, (pp + 1,)))(h, row, pos)
            n_emit = jnp.where(act, n_acc + 1, 0)
            rows = jax.lax.dynamic_update_slice(
                rows, row[None], (i, 0, 0))
            accs = jax.lax.dynamic_update_slice(
                accs, jnp.where(act, n_acc, 0)[None], (i, 0))
            tok = jnp.where(act, nxt, tok)
            pos = pos + n_emit
            emitted = emitted + n_emit
            act = (act & ~hit_eos & (emitted < budgets)
                   & (pos + k + 1 <= n_ctx))
            return (cache_t, h, tok, pos, act, emitted, rows, accs, i + 1)

        st = (cache_t, h, tok, pos, active0, jnp.zeros((B,), jnp.int32),
              rows0, accs0, jnp.int32(0))
        (cache_t, h, tok, pos, act, emitted, rows, accs,
         n_steps) = jax.lax.while_loop(cond, body, st)
        return rows, accs, n_steps, pos, emitted, cache_t

    if raw:
        return run
    return jax.jit(run, donate_argnums=(1,))

"""On-device sampler chain for the batched decode scan.

Vectorized (over slots) jnp implementation of the host sampler's hot
subset — repetition/frequency/presence penalties, penalize_nl/ignore_eos
masks, and the default sampler queue top_k -> tail_free -> typical ->
top_p -> min_p -> temp (sampler_queue, common/sampling.cpp:127-161) —
so the server's multi-token decode blocks stay on device for DEFAULT
OpenAI-style requests (temp + penalties + top_p) instead of falling back
to one host round-trip per token. Math mirrors runtime/sampling.py
(itself llama_sample_* parity); at temp<=0 the result is exactly the
host sampler's argmax-after-penalties.

Penalty state lives on device inside the scan: a (W, B) ring of the last
W=64 fed tokens with one shared write cursor plus an incrementally
maintained (B, V) count tensor; per-slot penalty_last_n <= W windows are
enforced by evicting the entry that ages past each slot's window. The
chain runs on the static top-K=128 candidates (every filter's keep-set
is downstream of top_k in the default queue order, and per-slot top_k
values <= K apply as one more rank cut), so the per-step cost is one
lax.top_k over V plus O(B*K) work.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

W_RING = 64      # penalty window capacity (penalty_last_n <= W_RING)
K_CHAIN = 128    # static candidate count (per-slot top_k <= K_CHAIN)


class SampParams(NamedTuple):
    """Per-slot sampling parameter vectors, shape (B,) each."""
    temp: np.ndarray          # f32; <=0 -> greedy (argmax after penalties)
    top_k: np.ndarray         # i32 in [1, K_CHAIN]
    top_p: np.ndarray         # f32; >=1 disables
    min_p: np.ndarray         # f32; <=0 disables
    tfs_z: np.ndarray         # f32; >=1 disables
    typical_p: np.ndarray     # f32; >=1 disables
    pen_repeat: np.ndarray    # f32; 1.0 disables
    pen_freq: np.ndarray      # f32
    pen_present: np.ndarray   # f32
    last_n: np.ndarray        # i32 in [0, W_RING]
    penalize_nl: np.ndarray   # bool
    ignore_eos: np.ndarray    # bool


def params_from_samplers(samplers, n_slots: int) -> SampParams:
    """Build (B,)-vectors from host Sampler objects (None -> neutral)."""
    temp = np.zeros(n_slots, np.float32)
    top_k = np.ones(n_slots, np.int32)
    top_p = np.ones(n_slots, np.float32)
    min_pv = np.zeros(n_slots, np.float32)
    tfs = np.ones(n_slots, np.float32)
    typ = np.ones(n_slots, np.float32)
    rep = np.ones(n_slots, np.float32)
    freq = np.zeros(n_slots, np.float32)
    pres = np.zeros(n_slots, np.float32)
    last_n = np.zeros(n_slots, np.int32)
    pnl = np.ones(n_slots, bool)
    ieos = np.zeros(n_slots, bool)
    for i, s in samplers.items() if isinstance(samplers, dict) \
            else enumerate(samplers):
        if s is None:
            continue
        p = s.params
        temp[i] = p.temp
        top_k[i] = min(p.top_k if p.top_k > 0 else K_CHAIN, K_CHAIN)
        top_p[i] = p.top_p
        min_pv[i] = p.min_p
        tfs[i] = p.tfs_z
        typ[i] = p.typical_p
        rep[i] = p.penalty_repeat
        freq[i] = p.penalty_freq
        pres[i] = p.penalty_present
        last_n[i] = min(p.penalty_last_n, W_RING) \
            if p.penalty_last_n >= 0 else W_RING
        pnl[i] = p.penalize_nl
        ieos[i] = p.ignore_eos
    return SampParams(temp, top_k, top_p, min_pv, tfs, typ, rep, freq,
                      pres, last_n, pnl, ieos)


def ring_from_prev(prevs, n_slots: int) -> tuple[np.ndarray, int]:
    """(W, B) ring + shared cursor from per-slot prev-token lists.

    Right-aligned so the newest entry of every slot sits at column
    cursor-1; unwritten cells are -1 (contribute no counts)."""
    ring = np.full((W_RING, n_slots), -1, np.int32)
    for i, prev in prevs.items() if isinstance(prevs, dict) \
            else enumerate(prevs):
        if not prev:
            continue
        tail = list(prev)[-W_RING:]
        ring[W_RING - len(tail):, i] = tail
    return ring, W_RING    # cursor: next write position (wraps to 0)


def fast_chain_eligible(params) -> bool:
    """Can SamplingParams be reproduced by the on-device chain?"""
    p = params
    if (p.mirostat != 0 or p.logit_bias or p.n_probs
            or p.samplers_sequence != "kfypmt"
            or p.dynatemp_range > 0.0):
        return False
    if p.penalty_last_n > W_RING:
        return False
    if p.penalty_last_n < 0 and max(p.n_prev, 0) > W_RING:
        # -1 = whole context; reproducible only while the host window
        # (prev, capped at n_prev) fits the device ring
        return False
    if p.temp > 0.0 and not (0 < p.top_k <= K_CHAIN):
        return False
    return True


# -- device side (jnp) --------------------------------------------------------

def build_counts(ring, wr, last_n, vocab: int):
    """(B, V) occurrence counts of each slot's newest last_n ring entries."""
    import jax.numpy as jnp
    W, B = ring.shape
    age = (wr - 1 - jnp.arange(W, dtype=jnp.int32)) % W          # (W,)
    valid = (age[:, None] < last_n[None, :]) & (ring >= 0)       # (W, B)
    tok = jnp.where(valid, ring, vocab)                          # OOB drops
    onehot = tok[:, :, None] == jnp.arange(vocab, dtype=jnp.int32)
    return onehot.sum(axis=0).astype(jnp.int32)                  # (B, V)


def push_token(ring, wr, counts, last_n, new_tok, active):
    """Advance the penalty window by one fed token per slot."""
    import jax
    import jax.numpy as jnp
    W, B = ring.shape
    V = counts.shape[1]
    iota_v = jnp.arange(V, dtype=jnp.int32)
    # entry ageing past each slot's window exits the counts
    evict_col = (wr - last_n) % W                                # (B,)
    old = jnp.take_along_axis(ring.T, evict_col[:, None], axis=1)[:, 0]
    old_ok = active & (old >= 0) & (last_n > 0)
    counts = counts - ((old[:, None] == iota_v)
                       & old_ok[:, None]).astype(jnp.int32)
    new_ok = active & (last_n > 0)
    counts = counts + ((new_tok[:, None] == iota_v)
                       & new_ok[:, None]).astype(jnp.int32)
    row = jnp.where(active, new_tok, ring[wr % W])
    ring = jax.lax.dynamic_update_slice(ring, row[None, :], (wr % W, 0))
    return ring, wr + 1, counts


def apply_penalties(lg, counts, sp: "SampParams", nl_id: int, eos_id: int):
    """llama_sample_repetition_penalties + penalize_nl/ignore_eos masks."""
    import jax.numpy as jnp
    used = counts > 0
    rep = sp.pen_repeat[:, None]
    pen = jnp.where(used, jnp.where(lg > 0, lg / rep, lg * rep), lg)
    pen = pen - counts * sp.pen_freq[:, None] \
        - used * sp.pen_present[:, None]
    # restore the newline logit where penalize_nl is off
    nl = jnp.where(sp.penalize_nl, pen[:, nl_id], lg[:, nl_id])
    pen = pen.at[:, nl_id].set(nl)
    eos = jnp.where(sp.ignore_eos, -jnp.inf, pen[:, eos_id])
    return pen.at[:, eos_id].set(eos)


def _softmax(v):
    import jax.numpy as jnp
    m = jnp.max(v, axis=-1, keepdims=True)
    e = jnp.exp(v - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def filter_candidates(pen, sp: "SampParams"):
    """Default sampler queue on penalized (B, V) logits.

    Returns (kv, ki): top-K_CHAIN candidate logits (filtered entries at
    -1e30) and their token ids; kv[:, 0] is the penalized argmax."""
    import jax
    import jax.numpy as jnp

    kv, ki = jax.lax.top_k(pen, K_CHAIN)              # (B, K) sorted desc
    K = K_CHAIN
    col = jnp.arange(K, dtype=jnp.int32)[None, :]
    neg = jnp.float32(-1e30)

    # per-slot top_k: a rank cut on the already-sorted candidates
    kv = jnp.where(col < sp.top_k[:, None], kv, neg)

    # tail-free (llama_sample_tail_free): |second derivative| mass cut
    probs = _softmax(kv)
    d2 = jnp.abs(jnp.diff(probs, n=2, axis=-1))       # (B, K-2)
    s = jnp.sum(d2, axis=-1, keepdims=True)
    d2n = jnp.where(s > 0, d2 / jnp.where(s > 0, s, 1.0), 0.0)
    csum = jnp.cumsum(d2n, axis=-1)
    cut = jnp.sum((csum < sp.tfs_z[:, None]).astype(jnp.int32),
                  axis=-1, keepdims=True) + 1
    keep_tfs = (col < cut) | (sp.tfs_z[:, None] >= 1.0) | (s <= 0)
    kv = jnp.where(keep_tfs, kv, neg)

    # locally-typical: order by |−log p − H| ascending, cumulative-prob cut
    probs = _softmax(kv)
    logp = jnp.log(jnp.maximum(probs, 1e-30))
    ent = -jnp.sum(jnp.where(probs > 0, probs * logp, 0.0),
                   axis=-1, keepdims=True)
    shifted = jnp.abs(-logp - ent)
    t_order = jnp.argsort(shifted, axis=-1)
    t_rank = jnp.argsort(t_order, axis=-1)
    csum = jnp.cumsum(jnp.take_along_axis(probs, t_order, axis=-1), axis=-1)
    cut = jnp.sum((csum < sp.typical_p[:, None]).astype(jnp.int32),
                  axis=-1, keepdims=True) + 1
    keep_typ = (t_rank < cut) | (sp.typical_p[:, None] >= 1.0)
    kv = jnp.where(keep_typ, kv, neg)

    # top-p on the surviving set (rank by current logits desc)
    probs = _softmax(kv)
    p_order = jnp.argsort(-kv, axis=-1)
    p_rank = jnp.argsort(p_order, axis=-1)
    csum = jnp.cumsum(jnp.take_along_axis(probs, p_order, axis=-1), axis=-1)
    cut = jnp.sum((csum < sp.top_p[:, None]).astype(jnp.int32),
                  axis=-1, keepdims=True) + 1
    keep_p = (p_rank < cut) | (sp.top_p[:, None] >= 1.0)
    kv = jnp.where(keep_p, kv, neg)

    # min-p: drop below min_p * max_prob (max always survives)
    probs = _softmax(kv)
    limit = jnp.max(probs, axis=-1, keepdims=True) * sp.min_p[:, None]
    kv = jnp.where((probs >= limit) | (sp.min_p[:, None] <= 0.0), kv, neg)
    return kv, ki


def sample_chain(lg, key, sp: "SampParams", counts, nl_id: int,
                 eos_id: int, active):
    """One sampling step: penalties + default queue on (B, V) logits.

    Returns (key, next_token (B,) i32). temp<=0 slots take
    argmax-after-penalties (exact host-sampler greedy semantics)."""
    import jax
    import jax.numpy as jnp

    pen = apply_penalties(lg.astype(jnp.float32), counts, sp, nl_id, eos_id)
    kv, ki = filter_candidates(pen, sp)

    key, sub = jax.random.split(key)
    cat = jax.random.categorical(
        sub, kv / jnp.maximum(sp.temp, 1e-6)[:, None])
    pick = jnp.take_along_axis(ki, cat[:, None], axis=-1)[:, 0]
    greedy = ki[:, 0]                                 # argmax of penalized
    nxt = jnp.where(sp.temp > 0.0, pick, greedy).astype(jnp.int32)
    return key, nxt

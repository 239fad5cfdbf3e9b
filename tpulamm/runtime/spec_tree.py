"""Draft-TREE speculative decoding, fully on device.

Capability parity with the reference's multi-branch speculation
(examples/speculative/speculative.cpp:40-43,171-280,440-560): while
drafting, a branch whose draft distribution has a strong second candidate
(p > p_split) SPLITS — the top-1 token continues the branch and each
runner-up (up to n_seq_dft total branches) forks a new one; the target
then scores the whole token TREE in one forward pass and the verify walk
follows target choices down the tree, so one weight-streaming step can
accept along whichever branch the target actually prefers.

TPU-native redesign (nothing like the reference's seq_id bookkeeping):

- ONE engine slot per model. Tree tokens are written to node-indexed KV
  cells and tree attention is expressed through the engine's packed
  segment ranges (models/transformer.py KQ mask): branch ids form a
  laminar family — every node's cell is tagged with its branch-pool range
  [lo, hi] at creation, a query carries its pool's lo, and
  `klo <= qid <= khi` + the causal position test is EXACTLY ancestor
  visibility for laminar ranges. No KV copies on split (the reference
  does llama_kv_cache_seq_cp per split).
- The whole propose/verify/accept cycle runs inside one jitted
  lax.while_loop (host round-trips through a tunneled transport cost more
  than the verify step itself — see runtime/speculative.py).
- After each verify, the accepted path's K/V cells are consolidated into
  canonical positional cells with a small gather + contiguous
  dynamic_update_slice (k+1 cells per layer), and the tree window's
  position plane is rewritten so stale branch cells die (-1).

Branch-pool split rule: a fork takes the top id of its parent's pool, so
the high-probability chain keeps splitting until ids run out while each
fork gets a leaf pool. The reference instead draws from a global seq
pool; same capability (n_seq_dft-way trees), slightly different shapes
when forks themselves want to fork.

Greedy tree speculation is OUTPUT-INVARIANT: emitted tokens equal plain
greedy decoding of the target (tests/test_spec_tree.py gates on that).
"""

from __future__ import annotations

import numpy as np

from tpulamm.runtime.engine import Engine
from tpulamm.runtime.speculative import SpecStats, _tokens


def _consolidate(cache, startb, path_cells, n_acc, pos0, window):
    """Gather the accepted path's cells into canonical positional cells
    and kill the rest of the tree window (pos -1). All writes contiguous."""
    import jax
    import jax.numpy as jnp

    j = jnp.arange(window, dtype=jnp.int32)
    newpos = jnp.where(j <= n_acc, pos0 + j, -1)
    k_new, v_new = [], []
    ks_new = [] if cache.ks is not None else None
    vs_new = [] if cache.vs is not None else None
    for li in range(len(cache.k)):
        sel = jnp.take(cache.k[li][0], path_cells, axis=1)  # (H, W, D)
        k_new.append(jax.lax.dynamic_update_slice(
            cache.k[li], sel[None], (0, 0, startb, 0)))
        sel = jnp.take(cache.v[li][0], path_cells, axis=1)
        v_new.append(jax.lax.dynamic_update_slice(
            cache.v[li], sel[None], (0, 0, startb, 0)))
        if ks_new is not None:
            sel = jnp.take(cache.ks[li][0], path_cells, axis=1)  # (H, W)
            ks_new.append(jax.lax.dynamic_update_slice(
                cache.ks[li], sel[None], (0, 0, startb)))
        if vs_new is not None:
            sel = jnp.take(cache.vs[li][0], path_cells, axis=1)
            vs_new.append(jax.lax.dynamic_update_slice(
                cache.vs[li], sel[None], (0, 0, startb)))
    pos = jax.lax.dynamic_update_slice(cache.pos, newpos[None], (0, startb))
    seg = jax.lax.dynamic_update_slice(
        cache.seg, jnp.zeros((1, window), jnp.int32), (0, startb))
    from dataclasses import replace
    return replace(cache, k=k_new, v=v_new, pos=pos, seg=seg,
                   ks=ks_new, vs=vs_new)


def _build_tree_scan(target: Engine, draft: Engine, n_draft: int,
                     n_seq: int, p_split: float, max_steps: int,
                     top_k: int, greedy: bool,
                     span_t: int | None = None, span_d: int | None = None):
    import jax
    import jax.numpy as jnp

    cfg_t, cfg_d = target.cfg_step, draft.cfg_step
    fwd_t, fwd_d = target._model_forward, draft._model_forward
    K = n_draft                   # total drafted-token budget (batch_tgt cap)
    B = n_seq                     # max branches (n_seq_dft)
    F = min(B, 4)                 # top-1 + up to F-1 forks per node per step
    CAP = 1 + K + B               # root + budget + same-step overshoot
    Vt, Vd = cfg_t.vocab_size, cfg_d.vocab_size
    n_ctx = min(target.n_ctx, draft.n_ctx)
    i32 = jnp.int32

    def pack(lo, hi):
        return lo | (hi << 16)

    def draft_tree(params_d, cache_d, cur, pos0, startb):
        """Build the token tree with the draft model; returns node arrays."""
        tok0 = jnp.zeros((CAP,), i32).at[0].set(cur)
        par0 = jnp.full((CAP,), -1, i32)
        dep0 = jnp.zeros((CAP,), i32)
        seg0 = jnp.zeros((CAP,), i32).at[0].set(pack(1, B))
        tips_node0 = jnp.zeros((B,), i32)
        tips_lo0 = jnp.zeros((B,), i32).at[0].set(1)
        tips_hi0 = jnp.zeros((B,), i32).at[0].set(B)
        tips_act0 = jnp.zeros((B,), bool).at[0].set(True)

        def cond(st):
            (_, _, _, _, _, _, tips_act, _, _, n_nodes, _, depth) = st
            return tips_act.any() & (n_nodes - 1 < K) & (depth < K)

        def body(st):
            (cache_d, tok, par, dep, seg, tips_node, tips_act, tips_lo,
             tips_hi, n_nodes, n_seq_cur, depth) = st
            toks = jnp.take(tok, tips_node)                       # (B,)
            poss = jnp.where(tips_act, pos0 + depth, -1)
            cells = jnp.where(tips_act, startb + tips_node, n_ctx)
            qsegs = jnp.where(tips_act, jnp.take(seg, tips_node), 0)
            lg, cache_d = fwd_d(params_d, cfg_d, toks[None],
                                poss[None], cache_d, None, cells[None],
                                segs=qsegs[None], kv_span=span_d)
            probs = jax.nn.softmax(lg[0, :, :Vd], axis=-1)        # (B, Vd)
            pv, pi = jax.lax.top_k(probs, F)

            # Snapshot tip state BEFORE the branch loop: a fork created by
            # an earlier iteration of this same pass lives at a slot
            # >= n_seq_cur(snapshot) and was NOT part of this step's
            # forward — its logits row is a masked pos=-1 row, i.e.
            # garbage. Such forks must only be extended after the NEXT
            # forward, so every read below goes through the snapshot and
            # every write preserves the CURRENT value for branches that
            # were inactive at snapshot time.
            tips0 = tips_node
            act0 = tips_act
            lo0, hi0 = tips_lo, tips_hi
            for b in range(B):
                act = act0[b]
                lo_b, hi_b = lo0[b], hi0[b]
                # fork decisions first: the continuing child's written
                # range must already exclude forked ids (a fork is an
                # ALTERNATIVE to the continuation, not its descendant)
                forks = []
                n_forks = i32(0)
                for f in range(1, F):
                    ok = (act & (n_nodes - 1 + 1 + n_forks < K)
                          & (pv[b, f] > p_split)
                          & (n_seq_cur + n_forks < B)
                          & (hi_b - n_forks > lo_b))
                    forks.append(ok)
                    n_forks = n_forks + ok
                # continuation (reference sa[0] = s, token cur_p[0])
                can = act & (n_nodes - 1 < K)
                idx = n_nodes
                tok = tok.at[idx].set(jnp.where(can, pi[b, 0], tok[idx]))
                par = par.at[idx].set(jnp.where(can, tips0[b], par[idx]))
                dep = dep.at[idx].set(jnp.where(can, depth + 1, dep[idx]))
                seg = seg.at[idx].set(jnp.where(
                    can, pack(lo_b, hi_b - n_forks), seg[idx]))
                tips_node = tips_node.at[b].set(
                    jnp.where(can, idx, tips_node[b]))
                tips_act = tips_act.at[b].set(
                    jnp.where(act, can, tips_act[b]))
                n_nodes = n_nodes + can
                # fork nodes take ids from the top of the pool
                taken = i32(0)
                for f in range(1, F):
                    ok = forks[f - 1]
                    fid = hi_b - taken
                    sidx = n_nodes
                    tok = tok.at[sidx].set(jnp.where(ok, pi[b, f],
                                                     tok[sidx]))
                    par = par.at[sidx].set(jnp.where(ok, tips0[b],
                                                     par[sidx]))
                    dep = dep.at[sidx].set(jnp.where(ok, depth + 1,
                                                     dep[sidx]))
                    seg = seg.at[sidx].set(jnp.where(ok, pack(fid, fid),
                                                     seg[sidx]))
                    tslot = n_seq_cur
                    tips_node = tips_node.at[tslot].set(
                        jnp.where(ok, sidx, tips_node[tslot]))
                    tips_lo = tips_lo.at[tslot].set(
                        jnp.where(ok, fid, tips_lo[tslot]))
                    tips_hi = tips_hi.at[tslot].set(
                        jnp.where(ok, fid, tips_hi[tslot]))
                    tips_act = tips_act.at[tslot].set(
                        tips_act[tslot] | ok)
                    n_nodes = n_nodes + ok
                    n_seq_cur = n_seq_cur + ok
                    taken = taken + ok
                tips_hi = tips_hi.at[b].set(
                    jnp.where(act, hi_b - taken, tips_hi[b]))
            return (cache_d, tok, par, dep, seg, tips_node, tips_act,
                    tips_lo, tips_hi, n_nodes, n_seq_cur, depth + 1)

        st = (cache_d, tok0, par0, dep0, seg0, tips_node0, tips_act0,
              tips_lo0, tips_hi0, i32(1), i32(1), i32(0))
        (cache_d, tok, par, dep, seg, _, _, _, _, n_nodes, _,
         _) = jax.lax.while_loop(cond, body, st)
        return cache_d, tok, par, dep, seg, n_nodes

    def run(params_t, cache_t, params_d, cache_d, first_tok, start_pos,
            key, temp, eos_id, n_predict):
        rows0 = jnp.full((max_steps, K + 1), -1, i32)
        accs0 = jnp.zeros((max_steps,), i32)
        drafted0 = jnp.zeros((max_steps,), i32)

        def cond(st):
            (_, _, _, pos, _, _, _, _, i, emitted, done) = st
            return ((~done) & (i < max_steps) & (emitted < n_predict)
                    & (pos + CAP + 1 <= n_ctx))

        def body(st):
            (cache_t, cache_d, tok, pos, key, rows, accs, drafted, i,
             emitted, done) = st
            startb = pos                  # consolidated caches: cell == pos
            cache_d, ntok, npar, ndep, nseg, n_nodes = draft_tree(
                params_d, cache_d, tok, pos, startb)

            # -- target scores the whole tree in one forward --
            valid = jnp.arange(CAP, dtype=i32) < n_nodes
            poss = jnp.where(valid, pos + ndep, -1)
            cells = jnp.where(valid, startb + jnp.arange(CAP, dtype=i32),
                              n_ctx)
            logits, cache_t = fwd_t(params_t, cfg_t, ntok[None], poss[None],
                                    cache_t, None, cells[None],
                                    segs=jnp.where(valid, nseg, 0)[None],
                                    kv_span=span_t)
            lg = logits[0, :, :Vt]                               # (CAP, V)
            if greedy:
                tgt = jnp.argmax(lg, axis=-1).astype(i32)
            else:
                key, sub = jax.random.split(key)
                subs = jax.random.split(sub, CAP)
                tgt = jax.vmap(
                    lambda l, s: Engine._sample_next(
                        l, s, temp, top_k, False)[1])(lg, subs)

            # -- accept walk: follow target choices down the tree --
            nid = jnp.arange(CAP, dtype=i32)
            acc = i32(0)
            n_acc = i32(0)
            walking = jnp.bool_(True)
            path = jnp.zeros((CAP,), i32)
            row = jnp.full((K + 1,), -1, i32)
            for step in range(K):
                want = tgt[acc]
                match = valid & (npar == acc) & (ntok == want) & walking
                found = match.any()
                child = jnp.argmax(match)
                path = path.at[step + 1].set(jnp.where(found, child, 0))
                row = row.at[step].set(jnp.where(found, want, row[step]))
                acc = jnp.where(found, child, acc)
                n_acc = n_acc + found
                walking = walking & found
            correction = tgt[acc]
            row = row.at[n_acc].set(correction)
            idx = jnp.arange(K + 1, dtype=i32)
            hit_eos = jnp.any((idx <= n_acc) & (row == eos_id))

            # -- consolidate both caches onto the accepted path --
            path_cells = startb + path
            cache_t = _consolidate(cache_t, startb, path_cells, n_acc,
                                   pos, CAP)
            cache_d = _consolidate(cache_d, startb, path_cells, n_acc,
                                   pos, CAP)

            rows = jax.lax.dynamic_update_slice(rows, row[None], (i, 0))
            accs = jax.lax.dynamic_update_slice(accs, n_acc[None], (i,))
            drafted = jax.lax.dynamic_update_slice(
                drafted, (n_nodes - 1)[None], (i,))
            n_emit = n_acc + 1
            return (cache_t, cache_d, correction, pos + n_emit, key, rows,
                    accs, drafted, i + 1, emitted + n_emit, done | hit_eos)

        st = (cache_t, cache_d, first_tok, start_pos, key, rows0, accs0,
              drafted0, jnp.int32(0), jnp.int32(0), jnp.bool_(False))
        (cache_t, cache_d, _, pos, _, rows, accs, drafted, n_steps,
         emitted, _) = jax.lax.while_loop(cond, body, st)
        return rows, accs, drafted, n_steps, pos, cache_t, cache_d

    import jax
    return jax.jit(run, donate_argnums=(1, 3))


def generate_speculative_tree(target: Engine, draft: Engine, prompt, *,
                              n_predict: int = 128, n_draft: int = 8,
                              n_seq_dft: int = 4, p_split: float = 0.1,
                              temp: float = 0.0, top_k: int = 40,
                              seed: int = 0, stop_on_eos: bool = True):
    """Draft-tree speculative decoding on device (speculative.cpp
    n_seq_dft/p_split parity). Greedy (temp<=0) emits exactly the tokens
    plain greedy decoding would. Returns (token_ids, text, SpecStats)."""
    import jax
    import jax.numpy as jnp

    for eng, name in ((target, "target"), (draft, "draft")):
        if eng.mesh is not None or eng.recurrent or eng.n_slots != 1:
            raise ValueError(
                f"{name} engine must be single-slot, unmeshed, "
                "non-recurrent for on-device tree speculation")
    if n_seq_dft < 2:
        raise ValueError("n_seq_dft must be >= 2 (use the chain path "
                         "generate_speculative_fast for single-branch)")
    if n_seq_dft > 0xFFFF - 1:
        raise ValueError("n_seq_dft too large for packed segment ranges")
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
    CAP = 1 + n_draft + n_seq_dft

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
        budget = n_predict - len(out) + 2 * CAP
        span_t = target._kv_span(budget)
        span_d = draft._kv_span(budget)
        cache_key = ("tree", id(draft), n_draft, n_seq_dft, p_split,
                     max_steps, top_k, greedy, span_t, span_d)
        if cache_key not in scans:
            scans[cache_key] = _build_tree_scan(
                target, draft, n_draft, n_seq_dft, p_split, max_steps,
                top_k, greedy, span_t=span_t, span_d=span_d)
        rows, accs, drafted, n_steps, pos, target.cache, draft.cache = \
            scans[cache_key](
                target.params, target.cache, draft.params, draft.cache,
                jnp.int32(cur), jnp.int32(startb),
                jax.random.PRNGKey(seed + len(out)), jnp.float32(temp),
                jnp.int32(eos if stop_on_eos else -1),
                jnp.int32(n_predict - len(out)))
        rows, accs, drafted, n_steps, pos = jax.device_get(
            (rows, accs, drafted, n_steps, pos))       # one round-trip
        n_steps, pos = int(n_steps), int(pos)
        if n_steps == 0:
            break                                      # context full
        stats.n_target_steps += n_steps
        stats.n_drafted += int(drafted[:n_steps].sum())
        stats.n_accepted += int(accs[:n_steps].sum())
        block = [int(t) for r in rows[:n_steps] for t in r if t >= 0]
        target.n_past[0] = pos
        target.cell_pos[0, startb:pos] = np.arange(startb, pos)
        draft.n_past[0] = pos
        draft.cell_pos[0, startb:pos] = np.arange(startb, pos)
        out.extend(block)
        cur = out[-1]
        if pos + CAP + 1 > min(target.n_ctx, draft.n_ctx):
            break                                      # context full
    total_written = int(target.n_past[0]) - start0
    out = out[:n_predict]
    if stop_on_eos and eos in out:
        out = out[:out.index(eos)]
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

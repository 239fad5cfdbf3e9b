"""Device mesh + sharding policy (GSPMD + shard_map).

TPU-native replacement for the reference's distribution story: where
ggml-mpi.c (216 LoC) implements layer-pipeline parallelism with blocking
MPI_Send/Recv (and is disabled at b2430 — llama.cpp:8796), we lay out a
("dp", "tp") jax.sharding.Mesh. The quantized inference path runs the
forward inside shard_map (manual SPMD: the Pallas qmm kernels see local
weight shards; forward() inserts the psum/all-gather collectives — see
models/transformer.py _proj_row), while the dense training path uses plain
GSPMD annotations and lets XLA place collectives.

Policy (megatron-style for the transformer block):
- attn q/k/v and ffn gate/up projections: output features (N) sharded on tp
  (contiguous N-shards are head-aligned because n_heads % tp is required)
- attn output and ffn down projections: input features (K) sharded on tp;
  the contraction completes with a psum over tp
- KV cache: kv-heads sharded on tp, slots (batch) on dp
- embeddings/norms/routers: replicated; lm head: vocab sharded on tp
- biases of N-sharded weights: sharded on tp; of K-sharded: replicated
  (added once, after the psum)
- MoE experts: same col/row rules per expert; one psum after the mix
- activations: batch on dp, replicated over tp

This module computes PartitionSpec TREES from one rule table; the same spec
tree drives jax.device_put (placing weights) and shard_map in_specs/out_specs
(running steps). QTensor mm-layout planes all carry N on the last axis and
(packed) K on the first, so one PartitionSpec per orientation covers every
plane of a tensor.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpulamm.ops.qtensor import QTensor


def make_mesh(n_dp: int, n_tp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_dp * n_tp, \
        f"need {n_dp * n_tp} devices, have {len(devices)}"
    arr = np.asarray(devices[:n_dp * n_tp]).reshape(n_dp, n_tp)
    return Mesh(arr, ("dp", "tp"))


def _put(x, mesh: Mesh, spec: P):
    return jax.device_put(x, NamedSharding(mesh, spec))


def _weight_spec(w, axis: str | None, dim: int):
    """Spec tree for one weight. dim: 0 = shard N (output features),
    1 = shard K (input features)."""
    if isinstance(w, QTensor):
        if axis is None or w.layout != "mm":
            per_plane = {k: P() for k in w.planes}
        elif dim == 0:   # N is the LAST axis of every mm plane
            per_plane = {k: P(None, axis) for k in w.planes}
        else:            # K is the first axis of every mm plane
            per_plane = {k: P(axis, None) for k in w.planes}
        return QTensor(qtype=w.qtype, shape=w.shape, layout=w.layout,
                       planes=per_plane)
    if axis is None:
        return P(*(None,) * w.ndim)
    return P(axis, *(None,) * (w.ndim - 1)) if dim == 0 else P(None, axis)


def _repl_spec(x):
    # descends registered pytrees (QTensor -> per-plane specs)
    return jax.tree_util.tree_map(
        lambda a: P(*(None,) * np.ndim(a)), x)


# per-layer weight name -> orientation. COL = output features (N) on tp,
# ROW = input features (K) on tp (the matmul result is a tp-psum).
# wqkv_fused/wgateup_fused are SHARD-INTERLEAVED under tp (engine
# _fuse_projections): an even N-split over tp lands [q_i|k_i|v_i] /
# [gate_i|up_i] on shard i, so they spec as plain col weights.
_COL_W = ("wq", "w_gate", "w_up", "wqkv_fused", "wgateup_fused")
_KV_W = ("wk", "wv")
_ROW_W = ("wo", "w_down")
_COL_B = ("bq", "b_gate", "b_up", "ffn_act_scales", "bqkv_fused")
_KV_B = ("bk", "bv")
# Everything else in a layer (norms, qk-norm planes, router, ssm_* mamba
# tensors) is replicated.


def param_pspecs(params: dict, cfg, mesh: Mesh, tp_axis: str = "tp") -> dict:
    """PartitionSpec tree mirroring `params` for ANY arch's pytree.

    Covers every ARCH_SPECS architecture: separate QKV, biases, qk-norm,
    MoE expert lists, post-norm/parallel-residual extra norms, mamba ssm
    tensors (replicated). Unknown keys are replicated — always correct.
    Requires n_heads % tp == 0 and n_kv_heads % tp == 0 (the Engine
    validates before calling).
    """
    tp = mesh.shape[tp_axis]

    def col(w):
        return _weight_spec(w, tp_axis if _n_ok(w, tp) else None, 0)

    def row(w, partner_ok=True):
        # quantized planes interleave elements within 256-element K-chunks
        # (quant/repack.py), so a K-shard must split at chunk granularity;
        # and a row-parallel weight only helps when its upstream col
        # weight was sharded (otherwise the activation is already global).
        quantum = 256 * tp if isinstance(w, QTensor) else tp
        ok = partner_ok and w.shape[1] % quantum == 0
        return _weight_spec(w, tp_axis if ok else None, 1)

    def bias(b):
        return P(tp_axis) if b.shape[0] % tp == 0 else P()

    out = {}
    for key, val in params.items():
        if val is None:
            out[key] = None
        elif key == "layers":
            out[key] = [_layer_pspecs(lyr, tp, col, row, bias)
                        for lyr in val]
        elif key == "output":
            out[key] = col(val)          # lm head: vocab sharded on tp
        elif key == "output_b":
            out[key] = bias(val)
        else:
            out[key] = _repl_spec(val)   # embeddings, final norms, ...
    return out


def _n_ok(w, tp: int) -> bool:
    """Divisibility is the only constraint: shards too small for the
    Pallas tile minimum fall back to the dequant matmul path (qmatmul)."""
    return w.shape[0] % tp == 0


def _layer_pspecs(lyr: dict, tp: int, col, row, bias) -> dict:
    # partner coupling: wo pairs with wq (always sharded when the Engine
    # validated n_heads % tp); w_down pairs with w_gate/w_up
    # partner coupling must see the FUSED gate tensor when the engine's
    # fusion pass already popped w_gate/w_up (tp-interleaved fusion) —
    # otherwise w_down silently loses its K-shard and every tp shard
    # duplicates + fully recomputes the largest FFN weight
    gate = lyr.get("wgateup_fused")
    if gate is None:
        gate = lyr.get("w_gate") if lyr.get("w_gate") is not None \
            else lyr.get("w_up")
    gate_ok = gate is not None and _n_ok(gate, tp)
    exps = (lyr.get("ffn_gate_exp") or lyr.get("ffn_up_exp") or [None])
    exp_ok = exps[0] is not None and _n_ok(exps[0], tp)
    out = {}
    for key, val in lyr.items():
        if val is None:
            out[key] = None
        elif key in _COL_W or key in _KV_W:
            out[key] = col(val)
        elif key == "wo":
            out[key] = row(val)
        elif key == "w_down":
            out[key] = row(val, partner_ok=gate_ok)
        elif key in _COL_B or key in _KV_B:
            out[key] = bias(val)
        elif key in ("ffn_gate_exp", "ffn_up_exp"):
            out[key] = [col(w) for w in val]
        elif key == "ffn_down_exp":
            out[key] = [row(w, partner_ok=exp_ok) for w in val]
        else:
            out[key] = _repl_spec(val)
    return out


def cache_pspecs(cache, mesh: Mesh, dp_axis: str | None = "dp",
                 tp_axis: str | None = "tp"):
    """Spec tree for a KVCache (per-layer (B, H, S, D)) or MambaState."""
    from tpulamm.runtime.kvcache import KVCache
    if isinstance(cache, KVCache):
        b, h = cache.k[0].shape[0], cache.k[0].shape[1]
        dp_ax = dp_axis if (dp_axis and b % mesh.shape[dp_axis] == 0) else None
        tp_ax = tp_axis if (tp_axis and h % mesh.shape[tp_axis] == 0) else None
        kv = P(dp_ax, tp_ax, None, None)
        sc = P(dp_ax, tp_ax, None)      # q8_0 scale planes (B, H, S)
        return KVCache(k=[kv] * len(cache.k), v=[kv] * len(cache.v),
                       pos=P(dp_ax, None), seg=P(dp_ax, None),
                       ks=None if cache.ks is None else [sc] * len(cache.ks),
                       vs=None if cache.vs is None else [sc] * len(cache.vs))
    # recurrent (mamba) state (L, B, ...): batch on dp only
    b = cache.conv.shape[1]
    dp_ax = dp_axis if (dp_axis and b % mesh.shape[dp_axis] == 0) else None
    return type(cache)(conv=P(None, dp_ax, None, None),
                       ssm=P(None, dp_ax, None, None))


def put_tree(tree, specs, mesh: Mesh):
    """device_put every array leaf of `tree` per the matching spec leaf."""
    return jax.tree_util.tree_map(lambda x, s: _put(x, mesh, s), tree, specs)


def shard_params(params: dict, cfg, mesh: Mesh, tp_axis: str = "tp") -> dict:
    """Place a param pytree on the mesh per the tensor-parallel layout."""
    return put_tree(params, param_pspecs(params, cfg, mesh, tp_axis), mesh)


# kept for round-1 callers/tests; thin alias over the general policy
def shard_llama_params(params: dict, mesh: Mesh, tp_axis: str = "tp",
                       cfg=None) -> dict:
    if cfg is None:
        from tpulamm.models.config import ModelConfig
        cfg = ModelConfig()
    return shard_params(params, cfg, mesh, tp_axis)


def shard_cache(cache, mesh: Mesh):
    """KVCache: batch on dp, kv heads on tp (see cache_pspecs)."""
    return put_tree(cache, cache_pspecs(cache, mesh), mesh)


def shard_inputs(tokens, positions, slots, cells, mesh: Mesh):
    b = tokens.shape[0]
    dp_ax = "dp" if b % mesh.shape["dp"] == 0 else None
    return (_put(tokens, mesh, P(dp_ax, None)),
            _put(positions, mesh, P(dp_ax, None)),
            _put(slots, mesh, P(dp_ax)),
            _put(cells, mesh, P(dp_ax, None)))

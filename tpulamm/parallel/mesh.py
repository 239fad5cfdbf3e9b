"""Device mesh + sharding policy (GSPMD).

TPU-native replacement for the reference's distribution story: where
ggml-mpi.c (216 LoC) implements layer-pipeline parallelism with blocking
MPI_Send/Recv (and is disabled at b2430 — llama.cpp:8796), we lay out a
("dp", "tp") jax.sharding.Mesh and annotate weight/cache shardings; XLA
GSPMD inserts all-gather / reduce-scatter / psum collectives over ICI.

Policy (megatron-style for the transformer block):
- attn q/k/v and ffn gate/up projections: output features (N) sharded on tp
- attn output and ffn down projections: input features (K) sharded on tp,
  contraction produces a psum
- KV cache: kv-heads sharded on tp, slots (batch) on dp
- embeddings/norms: replicated; lm head: output (vocab) sharded on tp
- activations: batch on dp

QTensor planes all carry N on the last axis and (packed) K on the first, so
one PartitionSpec per orientation covers every plane of a tensor.
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


def _shard_weight(w, mesh: Mesh, axis: str | None, dim: int):
    """dim: 0 = shard N (output features), 1 = shard K (input features)."""
    if isinstance(w, QTensor):
        if axis is None:
            spec_planes = {k: P() for k in w.planes}
        elif dim == 0:   # N is the LAST axis of every mm plane
            spec_planes = {k: P(None, axis) for k in w.planes}
        else:            # K is the first axis of every mm plane
            spec_planes = {k: P(axis, None) for k in w.planes}
        planes = {k: _put(v, mesh, spec_planes[k]) for k, v in w.planes.items()}
        return QTensor(qtype=w.qtype, shape=w.shape, layout=w.layout,
                       planes=planes)
    # dense (N, K) array
    if axis is None:
        return _put(w, mesh, P())
    return _put(w, mesh, P(axis) if dim == 0 else P(None, axis))


def shard_llama_params(params: dict, mesh: Mesh, tp_axis: str = "tp") -> dict:
    """Apply the tensor-parallel layout to a llama param pytree."""
    out = dict(params)
    out["tok_emb"] = jax.tree_util.tree_map(
        lambda x: _put(x, mesh, P()), params["tok_emb"])
    out["out_norm"] = _put(params["out_norm"], mesh, P())
    out["output"] = _shard_weight(params["output"], mesh, tp_axis, 0)
    layers = []
    for lyr in params["layers"]:
        layers.append({
            "attn_norm": _put(lyr["attn_norm"], mesh, P()),
            "ffn_norm": _put(lyr["ffn_norm"], mesh, P()),
            "wq": _shard_weight(lyr["wq"], mesh, tp_axis, 0),
            "wk": _shard_weight(lyr["wk"], mesh, tp_axis, 0),
            "wv": _shard_weight(lyr["wv"], mesh, tp_axis, 0),
            "wo": _shard_weight(lyr["wo"], mesh, tp_axis, 1),
            "w_gate": _shard_weight(lyr["w_gate"], mesh, tp_axis, 0),
            "w_up": _shard_weight(lyr["w_up"], mesh, tp_axis, 0),
            "w_down": _shard_weight(lyr["w_down"], mesh, tp_axis, 1),
        })
    out["layers"] = layers
    return out


def shard_cache(cache, mesh: Mesh):
    """KVCache (L, B, H, S, D): batch on dp, kv heads on tp."""
    from tpulamm.runtime.kvcache import KVCache
    kv_spec = P("dp", "tp", None, None)
    return KVCache(
        k=[_put(x, mesh, kv_spec) for x in cache.k],
        v=[_put(x, mesh, kv_spec) for x in cache.v],
        pos=_put(cache.pos, mesh, P("dp", None)),
        seg=_put(cache.seg, mesh, P("dp", None)),
    )


def shard_inputs(tokens, positions, slots, cells, mesh: Mesh):
    return (_put(tokens, mesh, P("dp", None)),
            _put(positions, mesh, P("dp", None)),
            _put(slots, mesh, P("dp")),
            _put(cells, mesh, P("dp", None)))

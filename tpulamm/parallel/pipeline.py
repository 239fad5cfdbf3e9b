"""Pipeline parallelism (GPipe schedule) over a ("pp",) mesh axis.

TPU-native rebuild of the reference's layer-pipeline distribution slot
(ggml-mpi.c:105-201: each rank owns a layer span, activations hop ranks via
blocking MPI_Send/Recv; hooked at llama.cpp:8736-8758 and disabled at
b2430). Here every stage runs the SAME shard_map program:

- the per-layer param stack is sharded on axis 0 over "pp", so each device
  holds n_layers/P consecutive layers and scans over its local stack;
- activations rotate stage->stage+1 with lax.ppermute each schedule tick
  (the ICI analogue of MPI_Send/Recv, but pipelined and differentiable);
- the GPipe schedule runs M + P - 1 ticks for M microbatches; stage s is
  live on ticks [s, s + M); the first/last stages also run the embedding /
  lm-head + loss (replicated weights, masked contribution);
- jax.grad differentiates straight through the ppermutes (grad of a
  rotation is the reverse rotation), so the same function serves training.

This complements tensor parallelism (parallel/mesh.py): tp splits matmuls
inside a layer, pp splits the layer stack — compose by nesting meshes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from tpulamm.models.config import ModelConfig
from tpulamm.ops.layers import rms_norm
from tpulamm.train.model import _layer_fwd


def make_pp_mesh(n_pp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_pp, f"need {n_pp} devices"
    return Mesh(np.asarray(devices[:n_pp]), ("pp",))


def stack_layer_params(params: dict) -> dict:
    """List-of-layer-dicts -> one dict of (L, ...) stacked leaves (the
    shardable representation: axis 0 splits over "pp")."""
    layers = params["layers"]
    stacked = {k: jnp.stack([lyr[k] for lyr in layers])
               for k in layers[0]}
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers"] = stacked
    return out


def pipeline_specs(stacked: dict) -> dict:
    """PartitionSpec tree: layer stack on "pp", everything else replicated."""
    def repl(x):
        return jax.tree_util.tree_map(lambda a: P(*(None,) * a.ndim), x)

    out = {}
    for k, v in stacked.items():
        if k == "layers":
            out[k] = {n: P("pp", *(None,) * (a.ndim - 1))
                      for n, a in v.items()}
        else:
            out[k] = repl(v)
    return out


def make_pipeline_loss(cfg: ModelConfig, mesh: Mesh, n_micro: int):
    """Returns loss_fn(stacked_params, tokens) -> scalar CE loss, where
    tokens is (n_micro, mb, T+1) and the forward runs the GPipe schedule
    over the "pp" mesh axis. Differentiable (use jax.grad for training)."""
    n_pp = mesh.shape["pp"]
    assert cfg.n_layers % n_pp == 0, \
        f"n_layers={cfg.n_layers} must divide pp={n_pp}"

    def body(params, tokens):
        # runs per-device under shard_map: params["layers"] leaves are the
        # LOCAL (L/P, ...) stacks
        stage = jax.lax.axis_index("pp")
        M = n_micro
        toks_in = tokens[:, :, :-1]                      # (M, mb, T)
        targets = tokens[:, :, 1:]
        mb, T = toks_in.shape[1], toks_in.shape[2]
        positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32),
                                     (mb, T))
        mask = jnp.tril(jnp.ones((T, T), bool))[None, None, None]

        local_layers = params["layers"]                  # (L/P, ...) leaves

        def run_local(x):
            def lyr(h, lw):
                return _layer_fwd(lw, cfg, h, positions, mask), None
            h, _ = jax.lax.scan(lyr, x, local_layers)
            return h

        def head_loss(h, tgt):
            h = rms_norm(h, params["out_norm"], cfg.norm_eps)
            logits = (h @ params["output"].T).astype(jnp.float32)
            lp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(
                lp, tgt[..., None].astype(jnp.int32), axis=-1)[..., 0]
            return nll.mean()

        def tick(carry, t):
            act, loss_sum = carry
            # stage 0 ingests microbatch t (when in range); other stages
            # ingest the rotated activation from the previous stage
            m_in = jnp.clip(t, 0, M - 1)
            fresh = params["tok_emb"][toks_in[m_in]]
            x = jnp.where(stage == 0, fresh, act)
            h = run_local(x)
            # last stage finishes microbatch t - (P-1)
            m_out = jnp.clip(t - (n_pp - 1), 0, M - 1)
            live = (stage == n_pp - 1) & (t >= n_pp - 1)
            loss = head_loss(h, targets[m_out])
            loss_sum = loss_sum + jnp.where(live, loss, 0.0)
            act = jax.lax.ppermute(
                h, "pp", [(i, (i + 1) % n_pp) for i in range(n_pp)])
            return (act, loss_sum), None

        act0 = jnp.zeros((mb, T, cfg.dim), params["tok_emb"].dtype)
        (_, loss_sum), _ = jax.lax.scan(
            tick, (act0, jnp.float32(0.0)),
            jnp.arange(M + n_pp - 1, dtype=jnp.int32))
        # every device returns the same scalar (psum moves the last
        # stage's sum everywhere)
        return jax.lax.psum(loss_sum, "pp") / M

    cache: dict = {}

    def loss_fn(stacked_params, tokens):
        # build + jit the shard_map once per pytree structure (re-tracing
        # every call would pay the full GPipe trace per training step)
        key = jax.tree_util.tree_structure((stacked_params, tokens))
        fn = cache.get(key)
        if fn is None:
            specs = pipeline_specs(stacked_params)
            sm = jax.shard_map(
                body, mesh=mesh,
                in_specs=(specs, P(*(None,) * tokens.ndim)),
                out_specs=P(),
                check_vma=False)
            fn = jax.jit(sm)
            cache[key] = fn
        return fn(stacked_params, tokens)

    return loss_fn


def make_train_step_pp(cfg: ModelConfig, mesh: Mesh, opt, n_micro: int):
    """Compiled AdamW pipeline step: returns
    step(params, opt_state, tokens) -> (params, opt_state, loss)."""
    import optax
    loss_fn = make_pipeline_loss(cfg, mesh, n_micro)

    @jax.jit
    def step(stacked_params, opt_state, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(stacked_params, tokens)
        updates, opt_state = opt.update(grads, opt_state, stacked_params)
        return optax.apply_updates(stacked_params, updates), opt_state, loss

    return step


def train_step_pp(cfg: ModelConfig, mesh: Mesh, stacked_params, opt,
                  opt_state, tokens, n_micro: int, _cache={}):
    """One AdamW step under pipeline parallelism; returns
    (params, opt_state, loss). Compiled steps are cached per
    (mesh, n_micro, n_layers) so repeated calls don't re-trace."""
    key = (id(mesh), n_micro, cfg.n_layers, id(opt))
    step = _cache.get(key)
    if step is None:
        step = _cache[key] = make_train_step_pp(cfg, mesh, opt, n_micro)
    return step(stacked_params, opt_state, tokens)

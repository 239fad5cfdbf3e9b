"""Training loop: AdamW / L-BFGS over the causal-LM loss.

Parity with the reference's optimizer layer (ggml_opt_init + ADAM/LBFGS,
ggml.h:2004-2160) and examples/train-text-from-scratch's loop (tokenize a
raw text corpus, sample windows, optimize, checkpoint). optax provides the
optimizers; jax.grad the backward pass; jax.jit the fused train step.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpulamm.models.config import ModelConfig
from tpulamm.train.model import causal_lm_loss


@dataclass
class TrainConfig:
    optimizer: str = "adamw"      # adamw | lbfgs (GGML_OPT_TYPE_{ADAM,LBFGS})
    lr: float = 1e-3
    weight_decay: float = 0.01
    grad_clip: float = 1.0
    batch_size: int = 8
    seq_len: int = 128
    n_steps: int = 100
    warmup_steps: int = 10
    remat: bool = False           # gradient checkpointing
    seed: int = 0


def make_optimizer(tc: TrainConfig):
    if tc.optimizer == "adamw":
        sched = optax.join_schedules(
            [optax.linear_schedule(0.0, tc.lr, tc.warmup_steps),
             optax.cosine_decay_schedule(tc.lr,
                                         max(tc.n_steps - tc.warmup_steps, 1))],
            [tc.warmup_steps])
        return optax.chain(optax.clip_by_global_norm(tc.grad_clip),
                           optax.adamw(sched, weight_decay=tc.weight_decay))
    if tc.optimizer == "lbfgs":
        return optax.lbfgs(tc.lr)
    raise ValueError(tc.optimizer)


def sample_batches(data: np.ndarray, tc: TrainConfig):
    """Random windows over the token stream (train-text-from-scratch
    get_example_targets-style sampling)."""
    rng = np.random.default_rng(tc.seed)
    n = len(data) - tc.seq_len - 1
    assert n > 0, "corpus shorter than seq_len"
    while True:
        idx = rng.integers(0, n, size=tc.batch_size)
        yield np.stack([data[i:i + tc.seq_len + 1] for i in idx])


def train(params: dict, cfg: ModelConfig, data: np.ndarray,
          tc: TrainConfig, log_every: int = 10, log=print,
          grad_mask=None, mesh=None, batches=None):
    """Optimize params on a token stream; returns (params, losses).

    grad_mask: optional pytree of {0,1} matching params — zeroes gradients
    of frozen tensors (used by LoRA finetuning).

    batches: optional generator of (batch_size, seq_len+1) int arrays
    overriding the default random-window sampler (document-aligned tasks
    like tools/passkey_train need episode boundaries respected).

    mesh: optional ("dp","tp") jax.sharding.Mesh. Dense training shards
    with plain GSPMD annotations (no custom kernels on this path): params
    get the megatron layout from parallel/mesh.py, batches shard over dp,
    and XLA places the collectives (psum of dp gradients, tp all-gathers)."""
    batch_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tpulamm.parallel.mesh import shard_params
        params = shard_params(params, cfg, mesh)
        batch_sharding = NamedSharding(mesh, P("dp", None))
    opt = make_optimizer(tc)
    opt_state = opt.init(params)

    def loss_fn(p, batch):
        return causal_lm_loss(p, cfg, batch, remat=tc.remat)

    @jax.jit
    def step(p, s, batch):
        loss, grads = jax.value_and_grad(loss_fn)(p, batch)
        if grad_mask is not None:
            grads = jax.tree_util.tree_map(lambda g, m: g * m, grads,
                                           grad_mask)
        if tc.optimizer == "lbfgs":
            updates, s = opt.update(grads, s, p, value=loss, grad=grads,
                                    value_fn=lambda q: loss_fn(q, batch))
        else:
            updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    losses = []
    if batches is None:
        batches = sample_batches(data, tc)
    t0 = time.perf_counter()
    for i in range(tc.n_steps):
        batch = jnp.asarray(next(batches), jnp.int32)
        if batch_sharding is not None:
            batch = jax.device_put(batch, batch_sharding)
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
        if log_every and (i % log_every == 0 or i == tc.n_steps - 1):
            dt = time.perf_counter() - t0
            log(f"step {i:5d}  loss {losses[-1]:.4f}  "
                f"({dt / (i + 1):.3f}s/step)")
    return params, losses

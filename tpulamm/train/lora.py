"""LoRA: low-rank adapters — apply at load and finetune on a frozen base.

Parity with the reference's llama_model_apply_lora_from_file
(llama.h:436, llama.cpp ~12850: W += scale * B@A per matched tensor, where
scale = alpha/r) and examples/finetune (1,861 LoC: LoRA finetuning with
frozen base weights, checkpointed as a loadable adapter file).

Adapter file format: GGUF with metadata {adapter.type="lora", adapter.lora.r,
adapter.lora.alpha} and tensors "<gguf base name>.lora_a" (r, K) /
".lora_b" (N, r) — our analogue of the reference's ggla binary.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tpulamm.gguf.reader import GGUFReader
from tpulamm.gguf.writer import GGUFWriter
from tpulamm.models.config import ModelConfig

# param-tree key -> gguf tensor base name (llama arch)
_KEY2NAME = {"wq": "attn_q", "wk": "attn_k", "wv": "attn_v",
             "wo": "attn_output", "w_gate": "ffn_gate", "w_up": "ffn_up",
             "w_down": "ffn_down"}
_NAME2KEY = {v: k for k, v in _KEY2NAME.items()}


def init_lora(params: dict, r: int = 8, alpha: int = 16, seed: int = 0,
              targets: tuple[str, ...] = ("wq", "wv")) -> dict:
    """LoRA tree mirroring params: {layers: [{wq: {a, b}, ...}]}.
    A ~ N(0, 1/r), B = 0 (standard init: delta starts at zero)."""
    rng = np.random.default_rng(seed)
    lora = {"r": r, "alpha": alpha, "layers": []}
    for layer in params["layers"]:
        entry = {}
        for key in targets:
            w = layer[key]
            n, k = w.shape
            entry[key] = {
                "a": jnp.asarray(rng.normal(0, 1.0 / r, (r, k)), w.dtype),
                "b": jnp.zeros((n, r), w.dtype),
            }
        lora["layers"].append(entry)
    return lora


def merge_lora(params: dict, lora: dict) -> dict:
    """W += (alpha/r) * B @ A — returns a new params tree (dense weights)."""
    scale = lora["alpha"] / lora["r"]
    out = dict(params)
    out["layers"] = []
    for layer, ladapt in zip(params["layers"], lora["layers"]):
        new = dict(layer)
        for key, ab in ladapt.items():
            new[key] = layer[key] + scale * (ab["b"] @ ab["a"])
        out["layers"].append(new)
    return out


def finetune_lora(params: dict, cfg: ModelConfig, data, tc,
                  r: int = 8, alpha: int = 16,
                  targets: tuple[str, ...] = ("wq", "wv"),
                  log=print) -> tuple[dict, list[float]]:
    """LoRA finetuning: base frozen, adapters trained (examples/finetune
    semantics). Returns (lora tree, losses)."""
    import jax
    import optax

    from tpulamm.train.model import causal_lm_loss
    from tpulamm.train.train import make_optimizer, sample_batches

    lora = init_lora(params, r=r, alpha=alpha, seed=tc.seed, targets=targets)
    adapters = lora["layers"]                  # arrays only (differentiable)
    opt = make_optimizer(tc)
    opt_state = opt.init(adapters)

    def loss_fn(ad, batch):
        merged = merge_lora(params, {"r": r, "alpha": alpha, "layers": ad})
        return causal_lm_loss(merged, cfg, batch, remat=tc.remat)

    @jax.jit
    def step(ad, s, batch):
        loss, grads = jax.value_and_grad(loss_fn)(ad, batch)
        updates, s = opt.update(grads, s, ad)
        return optax.apply_updates(ad, updates), s, loss

    losses = []
    import time as _time
    import jax.numpy as _jnp
    batches = sample_batches(np.asarray(data), tc)
    t0 = _time.perf_counter()
    for i in range(tc.n_steps):
        batch = _jnp.asarray(next(batches), _jnp.int32)
        adapters, opt_state, loss = step(adapters, opt_state, batch)
        losses.append(float(loss))
        if i % 10 == 0 or i == tc.n_steps - 1:
            log(f"lora step {i:5d}  loss {losses[-1]:.4f}  "
                f"({(_time.perf_counter() - t0) / (i + 1):.3f}s/step)")
    lora["layers"] = adapters
    return lora, losses


def save_lora_gguf(lora: dict, path: str) -> None:
    w = GGUFWriter(path)
    w.add_kv("general.architecture", "lora")
    w.add_kv("adapter.type", "lora")
    w.add_kv("adapter.lora.r", int(lora["r"]))
    w.add_kv("adapter.lora.alpha", int(lora["alpha"]))
    for i, layer in enumerate(lora["layers"]):
        for key, ab in layer.items():
            base = f"blk.{i}.{_KEY2NAME[key]}.weight"
            w.add_tensor(base + ".lora_a", np.asarray(ab["a"], np.float32))
            w.add_tensor(base + ".lora_b", np.asarray(ab["b"], np.float32))
    w.write()


def load_lora_gguf(path: str) -> dict:
    rd = GGUFReader(path)
    r = int(rd.metadata.get("adapter.lora.r", 8))
    alpha = int(rd.metadata.get("adapter.lora.alpha", r * 2))
    layers: dict[int, dict] = {}
    for name, info in rd.tensors.items():
        if name.endswith(".lora_a") or name.endswith(".lora_b"):
            parts = name.split(".")          # blk, i, base, weight, lora_x
            i = int(parts[1])
            key = _NAME2KEY[parts[2]]
            ab = "a" if name.endswith("a") else "b"
            layers.setdefault(i, {}).setdefault(key, {})[ab] = \
                jnp.asarray(info.to_f32())
    rd.close()
    n_layers = max(layers) + 1 if layers else 0
    return {"r": r, "alpha": alpha,
            "layers": [layers.get(i, {}) for i in range(n_layers)]}


def apply_lora_to_qparams(params: dict, lora: dict, cfg: ModelConfig) -> dict:
    """Apply an adapter to a LOADED inference model (QTensors included):
    dequantize -> add delta -> requantize to the original block format
    (llama_model_apply_lora_from_file does the same dequant/requant dance
    for quantized bases)."""
    from tpulamm.ops.qtensor import QTensor, dequant_mm
    from tpulamm.quant.formats import quantize

    scale = lora["alpha"] / lora["r"]
    out = dict(params)
    out["layers"] = []
    for layer, ladapt in zip(params["layers"], lora["layers"]):
        new = dict(layer)
        for key, ab in ladapt.items():
            w = layer[key]
            delta = scale * np.asarray(ab["b"] @ ab["a"], np.float32)
            if isinstance(w, QTensor):
                dense = np.asarray(dequant_mm(w, jnp.float32)).T  # (N, K)
                dense = dense + delta
                raw = quantize(dense, w.qtype)
                new[key] = QTensor.from_gguf_raw(raw, w.qtype, w.shape,
                                                 layout=w.layout)
            else:
                new[key] = w + jnp.asarray(delta, w.dtype)
        out["layers"].append(new)
    return out

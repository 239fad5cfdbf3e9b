"""LLaMA-family forward pass — thin alias over the generic transformer.

Semantics mirror build_llama (llama.cpp:5708-5882): RMSNorm -> {Q,K,V}
projections -> NORM RoPE on Q,K -> KV store -> masked softmax attention
(scale 1/sqrt(head_dim)) -> output proj -> residual; RMSNorm -> SwiGLU FFN
(silu(gate) * up -> down) -> residual; final RMSNorm -> lm_head; plus the
MoE branch (:5797-5858).

The implementation lives in models/transformer.py, whose feature-flagged
forward covers all reference architectures; with a llama ModelConfig the
flags reduce exactly to the topology above.
"""

from __future__ import annotations

from tpulamm.models.transformer import (Params, attention, embed, ffn,  # noqa: F401
                                        forward, moe_ffn)

__all__ = ["Params", "attention", "embed", "ffn", "forward", "moe_ffn"]

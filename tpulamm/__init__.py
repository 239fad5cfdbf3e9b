"""tpulamm — TPU-native quantized LLM inference engine.

A from-scratch JAX/XLA/Pallas framework with the capability surface of
AyiStar/la-llama.cpp (llama.cpp b2430 + LASX GEMM kernels), redesigned for TPU:

- GGUF model files load directly; weights stay block-quantized in HBM
  (Q2_K / Q4_0 / Q4_1 / Q5_0 / Q5_1 / Q8_0, bit-exact with ggml formats).
- Every matmul is a fused dequant+MXU Pallas kernel (no f32 weights in HBM).
- The graph/scheduler layer of the reference (ggml.c) is replaced by jax.jit;
  scale-out uses jax.sharding.Mesh + GSPMD collectives instead of MPI.

Package map (see SURVEY.md for the reference layer map this mirrors):
  gguf/      GGUF reader/writer (ref: ggml.c:20500-21300, gguf-py)
  quant/     block formats, bit-exact codecs (ref: ggml-quants.c, ggml-common.h)
  ops/       Pallas kernels + jnp ops (ref: src/lamm_kernel_*.hpp, ggml ops)
  models/    model graph definitions (ref: llama.cpp llm_build_* for 25 archs)
  runtime/   KV cache, decode engine, sampling (ref: llama.cpp L3)
  tokenizer/ SPM/BPE/WPM tokenizers (ref: llama.cpp:9484-10175)
  parallel/  mesh + sharding policy (ref: ggml-mpi.c, replaced by GSPMD)
  server/    OpenAI-compatible continuous-batching HTTP server (ref: examples/server)
  cli/       main / quantize / perplexity / bench tools (ref: examples/*)
"""

__version__ = "0.1.0"

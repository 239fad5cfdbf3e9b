"""Inference-state checkpoint / resume.

Parity with llama_copy_state_data / llama_save_session_file
(llama.cpp:13518-13845): serializes the full KV cache (k/v/pos), per-slot
decode cursors, self-extend state and the token history, so generation can
resume exactly (the reference's `main` uses this as a prompt cache with
prefix-matching reuse, main.cpp:600-620).

Format: numpy .npz — TPU-native state lives in arrays, so npz is the natural
container (the reference uses a raw byte blob).
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from tpulamm.runtime.kvcache import KVCache

MAGIC = "tpulamm-session-v2"   # v2: KV buffers are head-major (B, H, S, D)


def save_session(path: str, engine, tokens: list[int] | None = None) -> None:
    cache = engine.cache
    # write through a handle: np.savez on a bare path silently appends
    # ".npz", breaking user-chosen session filenames (--prompt-cache foo.bin)
    if not isinstance(cache, KVCache):
        # recurrent (mamba) state: conv/ssm arrays instead of K/V
        with open(path, "wb") as fh:
            np.savez_compressed(
                fh, magic=np.array(MAGIC + "-recurrent"),
                conv=np.asarray(cache.conv), ssm=np.asarray(cache.ssm),
                n_past=engine.n_past,
                tokens=np.asarray(tokens if tokens is not None else [],
                                  np.int32))
        return
    def stack(bufs):
        if bufs[0].dtype == jnp.bfloat16:
            return np.stack([np.asarray(x).view(np.uint16) for x in bufs])
        return np.stack([np.asarray(x) for x in bufs])
    extra = {}
    if cache.ks is not None:
        extra["ks"] = np.stack([np.asarray(x) for x in cache.ks])
    if cache.vs is not None:
        extra["vs"] = np.stack([np.asarray(x) for x in cache.vs])
    with open(path, "wb") as fh:
        np.savez_compressed(
            fh,
            magic=np.array(MAGIC),
            k=stack(cache.k),
            k_dtype=np.array(str(cache.k[0].dtype)),
            v_dtype=np.array(str(cache.v[0].dtype)),
            v=stack(cache.v),
            **extra,
            pos=np.asarray(cache.pos),
            seg=np.asarray(cache.seg),
            n_past=engine.n_past,
            cell_pos=engine.cell_pos,
            ga_i=engine.ga_i,
            tokens=np.asarray(tokens if tokens is not None else [], np.int32),
            meta=np.array(json.dumps({
                "n_ctx": engine.n_ctx, "n_slots": engine.n_slots,
                "arch": engine.cfg.arch, "dim": engine.cfg.dim,
                "n_layers": engine.cfg.n_layers,
            })),
        )


def load_session(path: str, engine) -> list[int]:
    """Restore engine state in place; returns the saved token history."""
    z = np.load(path, allow_pickle=False)
    if str(z["magic"]) == MAGIC + "-recurrent":
        from tpulamm.models.mamba import MambaState
        engine.cache = MambaState(conv=jnp.asarray(z["conv"]),
                                  ssm=jnp.asarray(z["ssm"]))
        engine.n_past = z["n_past"].copy()
        return [int(t) for t in z["tokens"]]
    if str(z["magic"]) != MAGIC:
        raise ValueError(f"{path}: not a tpulamm session file")
    meta = json.loads(str(z["meta"]))
    if meta["n_ctx"] != engine.n_ctx or meta["n_slots"] != engine.n_slots or \
            meta["n_layers"] != engine.cfg.n_layers or meta["dim"] != engine.cfg.dim:
        raise ValueError("session/model shape mismatch: "
                         f"{meta} vs engine n_ctx={engine.n_ctx}")
    kd = str(z["k_dtype"])
    vd = str(z["v_dtype"]) if "v_dtype" in z.files else kd
    k, v = z["k"], z["v"]
    if kd == "bfloat16":
        k = jnp.asarray(k).view(jnp.bfloat16)
    if vd == "bfloat16":
        v = jnp.asarray(v).view(jnp.bfloat16)
    seg = (jnp.asarray(z["seg"]) if "seg" in z.files
           else jnp.zeros_like(jnp.asarray(z["pos"])))

    def split(st):
        return [jnp.asarray(st[i]) for i in range(st.shape[0])]
    new = KVCache(
        k=split(jnp.asarray(k)), v=split(jnp.asarray(v)),
        pos=jnp.asarray(z["pos"]), seg=seg,
        ks=split(z["ks"]) if "ks" in z.files else None,
        vs=split(z["vs"]) if "vs" in z.files else None)
    # the cache pytree STRUCTURE depends on the quantization layout (ks/vs
    # presence) and compiled steps/mesh specs were built for the engine's
    # -ctk/-ctv — a silently swapped layout would retrace at best and break
    # shard_map in_specs at worst, so mismatches are an error
    old = engine.cache
    if ((new.ks is None) != (old.ks is None)
            or (new.vs is None) != (old.vs is None)
            or new.k[0].dtype != old.k[0].dtype
            or new.v[0].dtype != old.v[0].dtype):
        def desc(c):
            return (f"k={'q8_0' if c.ks is not None else c.k[0].dtype}, "
                    f"v={'q8_0' if c.vs is not None else c.v[0].dtype}")
        raise ValueError(
            f"{path}: session KV layout ({desc(new)}) does not match the "
            f"engine cache ({desc(old)}); pass matching -ctk/-ctv")
    engine.cache = new
    engine.n_past = z["n_past"].copy()
    engine.cell_pos = z["cell_pos"].copy()
    engine.ga_i = z["ga_i"].copy()
    return [int(t) for t in z["tokens"]]

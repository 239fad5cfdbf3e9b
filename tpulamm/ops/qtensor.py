"""QTensor: a block-quantized weight living on device as packed planes.

Registered as a JAX pytree so it flows through jit/pjit/shard_map. The plane
layouts are produced by tpulamm.quant.repack (see its module docstring).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from tpulamm.gguf.constants import GGMLType
from tpulamm.quant.repack import SPECS, repack_mm, repack_rows


@jax.tree_util.register_pytree_node_class
@dataclass
class QTensor:
    """Quantized 2-D weight of logical shape (N, K) = (out, in) features.

    layout "mm":   planes ready for the fused dequant-matmul kernel
                   (qmatmul computes x @ W.T, i.e. (..., K) -> (..., N)).
    layout "rows": planes ready for row gather (embedding tables).
    """

    qtype: GGMLType
    shape: tuple[int, int]
    layout: str
    planes: dict[str, jax.Array] = field(default_factory=dict)

    def tree_flatten(self):
        keys = tuple(sorted(self.planes))
        return tuple(self.planes[k] for k in keys), (self.qtype, self.shape,
                                                     self.layout, keys)

    @classmethod
    def tree_unflatten(cls, aux, children):
        qtype, shape, layout, keys = aux
        return cls(qtype=qtype, shape=shape, layout=layout,
                   planes=dict(zip(keys, children)))

    @property
    def spec(self):
        return SPECS[self.qtype]

    @property
    def mm_dims(self) -> tuple[int, int]:
        """(N, K) derived from the PLANE shapes, not the static `shape`
        field: inside shard_map the planes are per-device shards while
        `shape` stays global, and the matmul paths must follow the data."""
        assert self.layout == "mm"
        s = self.planes.get("scales")
        if s is None:                       # Q2_K compact layout
            s = self.planes["scd"]
        return s.shape[1], s.shape[0] * self.spec.group

    @property
    def n_bytes(self) -> int:
        return sum(int(np.prod(p.shape)) * p.dtype.itemsize
                   for p in self.planes.values())

    @classmethod
    def from_gguf_raw(cls, raw: np.ndarray, qtype: GGMLType,
                      shape: tuple[int, int], layout: str = "mm",
                      device=None) -> "QTensor":
        n, k = shape
        fn = repack_mm if layout == "mm" else repack_rows
        planes_np = fn(raw.reshape(n, -1), qtype, k)
        planes = {name: jax.device_put(arr, device)
                  for name, arr in planes_np.items()}
        return cls(qtype=qtype, shape=(n, k), layout=layout, planes=planes)

    @classmethod
    def from_float(cls, w: np.ndarray, qtype: GGMLType,
                   layout: str = "mm", device=None) -> "QTensor":
        from tpulamm.quant.formats import quantize
        raw = quantize(np.asarray(w, np.float32), qtype)
        return cls.from_gguf_raw(raw, qtype, w.shape, layout, device)

    @staticmethod
    def concat_n(qts: list["QTensor"]) -> "QTensor":
        """Concatenate mm-layout QTensors along N (planes carry N as the
        last axis, so this is a plane concat). Used to fuse QKV / gate+up
        projections into one kernel launch."""
        first = qts[0]
        assert all(q.layout == "mm" and q.qtype == first.qtype
                   and q.shape[1] == first.shape[1] for q in qts)
        planes = {name: jnp.concatenate([q.planes[name] for q in qts],
                                        axis=-1)
                  for name in first.planes}
        n = sum(q.shape[0] for q in qts)
        return QTensor(qtype=first.qtype, shape=(n, first.shape[1]),
                       layout="mm", planes=planes)

    def slice_n(self, lo: int, hi: int) -> "QTensor":
        """Slice along N (planes carry N as the LAST axis; quant blocks
        run along K, so every N range is block-aligned). Used to build
        shard-interleaved fusions: concat_n over per-shard slices so an
        even tp-split of the fused tensor lands [q_i|k_i|v_i] locally."""
        assert self.layout == "mm" and 0 <= lo < hi <= self.shape[0]
        planes = {name: p[..., lo:hi] for name, p in self.planes.items()}
        return QTensor(qtype=self.qtype, shape=(hi - lo, self.shape[1]),
                       layout="mm", planes=planes)

    def pad_n(self, n_new: int) -> "QTensor":
        """Zero-pad along N. Padded rows dequantize to exactly 0 (their
        scales are 0), so callers can slice the matmul output back down.
        Lets tile-unfriendly heads (e.g. vocab 32000 -> tn 256) use the
        widest kernel tiles (32768 -> tn 1024: 4x fewer grid steps)."""
        n, k = self.shape
        if n_new == n:
            return self
        assert self.layout == "mm" and n_new > n
        planes = {name: jnp.pad(p, ((0, 0), (0, n_new - n)))
                  for name, p in self.planes.items()}
        return QTensor(qtype=self.qtype, shape=(n_new, k), layout="mm",
                       planes=planes)


def unpack_mm_values(qt_planes: dict, qtype: GGMLType, k: int) -> jnp.ndarray:
    """mm planes -> integer values (K, N) as int32 (jnp; reference path).

    Mirrors the unpack the Pallas kernels perform per (256, TN) tile, but over
    the whole array. Used on CPU and as the golden model for kernel tests.
    """
    spec = SPECS[qtype]
    if spec.bits in (4, 5):
        v = qt_planes["qs"].astype(jnp.int32)          # (K/2, N)
        n = v.shape[1]
        c = v.reshape(k // 256, 128, n)
        vals = jnp.concatenate([c & 0xF, (c >> 4) & 0xF], axis=1).reshape(k, n)
        if spec.bits == 5:
            h = qt_planes["qh"].astype(jnp.int32).reshape(k // 256, 32, n)
            hb = jnp.concatenate([(h >> t) & 1 for t in range(8)], axis=1)
            vals = vals | (hb.reshape(k, n) << 4)
        return vals
    if spec.bits == 2:
        v = qt_planes["q2"].astype(jnp.int32).reshape(k // 256, 64, -1)
        vals = jnp.concatenate([(v >> (2 * t)) & 3 for t in range(4)], axis=1)
        return vals.reshape(k, -1)
    if spec.bits == 8:
        return qt_planes["q8"].astype(jnp.int32)
    raise ValueError(qtype)


def mm_scale_planes(planes: dict, qtype: GGMLType):
    """-> (scales (K/g, N) f32, mins | None) from mm planes, decoding
    Q2_K's compact scd/dm form (scale = d*(b&0xF), min = -dmin*(b>>4))."""
    if qtype == GGMLType.Q2_K and "scd" in planes:
        scd = jnp.asarray(planes["scd"]).astype(jnp.int32)    # (K/16, N)
        dm = jax.lax.bitcast_convert_type(
            jnp.asarray(planes["dm"]), jnp.float16).astype(jnp.float32)
        ng, n = scd.shape
        dm3 = dm.reshape(ng // 16, 8, n)
        d = jnp.repeat(dm3[:, 0], 16, axis=0)                 # (K/16, N)
        dmin = jnp.repeat(dm3[:, 1], 16, axis=0)
        return ((scd & 0xF).astype(jnp.float32) * d,
                (scd >> 4).astype(jnp.float32) * (-dmin))
    scales = jnp.asarray(planes["scales"]).astype(jnp.float32)
    mins = (jnp.asarray(planes["mins"]).astype(jnp.float32)
            if "mins" in planes else None)
    return scales, mins


def dequant_mm(qt: QTensor, dtype=jnp.float32) -> jnp.ndarray:
    """mm-layout QTensor -> dense (K, N) array (reference/CPU path)."""
    n, k = qt.mm_dims
    spec = qt.spec
    vals = unpack_mm_values(qt.planes, qt.qtype, k).astype(jnp.float32)
    sc, mn = mm_scale_planes(qt.planes, qt.qtype)
    scales = jnp.repeat(sc, spec.group, axis=0)
    w = (vals - spec.zero) * scales
    if spec.has_min:
        w = w + jnp.repeat(mn, spec.group, axis=0)
    return w.astype(dtype)


def unpack_rows_values(planes: dict, qtype: GGMLType, k: int) -> jnp.ndarray:
    """rows planes (already gathered: (..., plane_k)) -> int values (..., K)."""
    spec = SPECS[qtype]
    if spec.bits in (4, 5):
        v = planes["qs"].astype(jnp.int32)
        vals = jnp.concatenate([v & 0xF, (v >> 4) & 0xF], axis=-1)
        if spec.bits == 5:
            h = planes["qh"].astype(jnp.int32)
            hb = jnp.concatenate([(h >> t) & 1 for t in range(8)], axis=-1)
            vals = vals | (hb << 4)
        return vals
    if spec.bits == 2:
        v = planes["q2"].astype(jnp.int32)
        return jnp.concatenate([(v >> (2 * t)) & 3 for t in range(4)], axis=-1)
    if spec.bits == 8:
        return planes["q8"].astype(jnp.int32)
    raise ValueError(qtype)


def gather_dequant_rows(qt: QTensor, idx: jnp.ndarray,
                        dtype=jnp.float32) -> jnp.ndarray:
    """Gather rows `idx` (any shape) of a rows-layout QTensor -> (..., K).

    TPU-native replacement for ggml_get_rows on quantized embeddings
    (ggml.c get_rows dequantizes per row); the table stays packed in HBM.
    """
    assert qt.layout == "rows"
    n, k = qt.shape
    spec = qt.spec
    gathered = {name: plane[idx] for name, plane in qt.planes.items()}
    vals = unpack_rows_values(gathered, qt.qtype, k).astype(jnp.float32)
    scales = jnp.repeat(gathered["scales"].astype(jnp.float32),
                        spec.group, axis=-1)
    w = (vals - spec.zero) * scales
    if spec.has_min:
        w = w + jnp.repeat(gathered["mins"].astype(jnp.float32),
                           spec.group, axis=-1)
    return w.astype(dtype)

"""ctypes bindings for the native codec (native/tl_codec.cpp).

Load-time repack and model quantization run over GB-scale arrays; the C++
library does them with scalar loops + a thread pool, typically much faster
than the vectorized-numpy fallback on small-core hosts. Disable with
TPULAMM_NATIVE=0. Everything falls back to the numpy implementations in
tpulamm.quant.{formats,repack} when the library is missing — results are
bit-identical (enforced by tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import pathlib

import numpy as np

from tpulamm.gguf.constants import GGMLType, GGML_TYPE_SIZES

_LIB = None
_TRIED = False


def _find_lib():
    here = pathlib.Path(__file__).resolve().parents[2] / "native"
    for cand in (here / "libtpulamm_native.so",
                 pathlib.Path(__file__).parent / "libtpulamm_native.so"):
        if cand.exists():
            return str(cand)
    return None


def _build(path: pathlib.Path) -> bool:
    import subprocess
    try:
        subprocess.run(["make", "-C", str(path)], check=True,
                       capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def get_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("TPULAMM_NATIVE", "1") == "0":
        return None
    so = _find_lib()
    if so is None:
        native_dir = pathlib.Path(__file__).resolve().parents[2] / "native"
        if native_dir.exists() and _build(native_dir):
            so = _find_lib()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.tl_quantize.argtypes = [ctypes.c_int, f32p, u8p, ctypes.c_int64,
                                ctypes.c_int64, ctypes.c_int]
    lib.tl_dequantize.argtypes = [ctypes.c_int, u8p, f32p, ctypes.c_int64,
                                  ctypes.c_int64, ctypes.c_int]
    for fn in (lib.tl_repack_mm, lib.tl_repack_rows):
        fn.argtypes = [ctypes.c_int, u8p, ctypes.c_int64, ctypes.c_int64,
                       u8p, u8p, f32p, f32p, ctypes.c_int]
    _LIB = lib
    return lib


def _nthreads() -> int:
    return int(os.environ.get("TPULAMM_THREADS", os.cpu_count() or 1))


_U8P = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
_F32P = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

NATIVE_TYPES = (GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1,
                GGMLType.Q8_0, GGMLType.Q8_1, GGMLType.Q2_K, GGMLType.Q8_K)


def quantize(x: np.ndarray, qtype: GGMLType) -> np.ndarray | None:
    lib = get_lib()
    if lib is None or qtype not in NATIVE_TYPES:
        return None
    x = np.ascontiguousarray(x, np.float32)
    k = x.shape[-1]
    bs, tb = GGML_TYPE_SIZES[qtype]
    if k % bs:
        return None
    rows = x.reshape(-1, k)
    out = np.empty((rows.shape[0], k // bs * tb), np.uint8)
    rc = lib.tl_quantize(int(qtype), _F32P(rows), _U8P(out), rows.shape[0],
                         k, _nthreads())
    if rc != 0:
        return None
    return out.reshape(*x.shape[:-1], -1)


def dequantize(raw: np.ndarray, qtype: GGMLType, k: int) -> np.ndarray | None:
    lib = get_lib()
    if lib is None or qtype not in NATIVE_TYPES:
        return None
    bs, tb = GGML_TYPE_SIZES[qtype]
    rows = np.ascontiguousarray(raw).reshape(-1, k // bs * tb)
    out = np.empty((rows.shape[0], k), np.float32)
    rc = lib.tl_dequantize(int(qtype), _U8P(rows), _F32P(out), rows.shape[0],
                           k, _nthreads())
    if rc != 0:
        return None
    return out.reshape(*raw.shape[:-1], k)


_REPACK_SUPPORTED = (GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0,
                     GGMLType.Q5_1, GGMLType.Q8_0, GGMLType.Q2_K)


def repack(raw: np.ndarray, qtype: GGMLType, k: int,
           layout: str) -> dict[str, np.ndarray] | None:
    lib = get_lib()
    if lib is None or qtype not in _REPACK_SUPPORTED:
        return None
    if layout == "mm" and k % 256:
        return None
    from tpulamm.quant.repack import SPECS
    spec = SPECS[qtype]
    n = raw.shape[0]
    rows = np.ascontiguousarray(raw)

    g = spec.group
    out: dict[str, np.ndarray] = {}
    if spec.bits in (4, 5):
        qs = np.empty((k // 2, n) if layout == "mm" else (n, k // 2), np.uint8)
        qh = (np.empty((k // 8, n) if layout == "mm" else (n, k // 8), np.uint8)
              if spec.bits == 5 else None)
    elif spec.bits == 2:
        qs = np.empty((k // 4, n) if layout == "mm" else (n, k // 4), np.uint8)
        qh = None
    else:
        qs = np.empty((k, n) if layout == "mm" else (n, k), np.int8)
        qh = None
    scales = np.empty((k // g, n) if layout == "mm" else (n, k // g),
                      np.float32)
    mins = (np.empty_like(scales) if spec.has_min else None)

    fn = lib.tl_repack_mm if layout == "mm" else lib.tl_repack_rows
    rc = fn(int(qtype), _U8P(rows), n, k, _U8P(qs.view(np.uint8)),
            _U8P(qh) if qh is not None else None, _F32P(scales),
            _F32P(mins) if mins is not None else None, _nthreads())
    if rc != 0:
        return None
    name = {8: "q8", 2: "q2"}.get(spec.bits, "qs")
    out[name] = qs
    if qh is not None:
        out["qh"] = qh
    out["scales"] = scales
    if mins is not None:
        out["mins"] = mins
    return out

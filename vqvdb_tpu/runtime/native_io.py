"""ctypes bridge to the native host runtime (native/vqvdb_native.cpp).

Loads libvqvdb_native.so when present (building it on first use if a
compiler is available), else transparently falls back to numpy
implementations with identical semantics. Callers use the module-level
functions and never need to know which path ran; `backend()` reports it.

This is the framework's counterpart to the reference's native host layer:
TBB leaf gather/scatter (src/orchestrator/VQVAECodec.cpp) and the buffered
chunk IO of VDBStreamWriter/Reader (src/Utils/VQVDB_Reader.cpp).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

ORIGIN_BYTES = 12
_LIB_PATH = Path(__file__).resolve().parent.parent / "native" / "libvqvdb_native.so"
_SRC_DIR = Path(__file__).resolve().parent.parent.parent / "native"

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        build = _SRC_DIR / "build.sh"
        if build.exists() and os.environ.get("VQVDB_NO_NATIVE_BUILD") != "1":
            try:
                subprocess.run(["sh", str(build)], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64 = ctypes.c_int64
    lib.vq_interleave.argtypes = [i32p, u8p, i64, i64, u8p]
    lib.vq_deinterleave.argtypes = [u8p, i64, i64, i32p, u8p]
    lib.vq_gather_leaves.argtypes = [f32p, i64, i64, i64, i64, i32p, i32p,
                                     i64, ctypes.c_float, f32p]
    lib.vq_scatter_leaves.argtypes = [f32p, i32p, i32p, i64, i64, i64, i64,
                                      i64, f32p]
    lib.vq_version.restype = ctypes.c_int
    if lib.vq_version() >= 2:  # LZ4 entry points (a stale .so lacks them)
        lib.vq_lz4_compress.argtypes = [u8p, i64, u8p, i64]
        lib.vq_lz4_compress.restype = i64
        lib.vq_lz4_decompress.argtypes = [u8p, i64, u8p, i64]
        lib.vq_lz4_decompress.restype = i64
    if lib.vq_version() >= 3:  # threaded copy
        lib.vq_copy_mt.argtypes = [u8p, u8p, i64, ctypes.c_int]
    _lib = lib
    return _lib


def _lib_v2() -> Optional[ctypes.CDLL]:
    lib = _load()
    return lib if lib is not None and lib.vq_version() >= 2 else None


def backend() -> str:
    return "native" if _load() is not None else "numpy"


def _p(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


# ---------------------------------------------------------------------------
# Interleave / deinterleave
# ---------------------------------------------------------------------------

def interleave(origins: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """(origins i32[n,3], indices u8[n,block]) -> u8[n, 12+block] chunks."""
    origins = np.ascontiguousarray(origins, np.int32)
    indices = np.ascontiguousarray(indices, np.uint8).reshape(origins.shape[0], -1)
    n, block = indices.shape
    lib = _load()
    if lib is not None and n:
        out = np.empty((n, ORIGIN_BYTES + block), np.uint8)
        lib.vq_interleave(_p(origins, ctypes.c_int32), _p(indices, ctypes.c_uint8),
                          n, block, _p(out, ctypes.c_uint8))
        return out
    return np.concatenate(
        [origins.view(np.uint8).reshape(-1, ORIGIN_BYTES), indices], axis=1)


def deinterleave(raw: np.ndarray, block: int) -> Tuple[np.ndarray, np.ndarray]:
    """u8[n*(12+block)] bytes -> (indices u8[n,block], origins i32[n,3])."""
    raw = np.frombuffer(raw, np.uint8) if isinstance(raw, (bytes, bytearray)) \
        else np.ascontiguousarray(raw, np.uint8).reshape(-1)
    chunk = ORIGIN_BYTES + block
    n = raw.size // chunk
    lib = _load()
    if lib is not None and n:
        origins = np.empty((n, 3), np.int32)
        indices = np.empty((n, block), np.uint8)
        lib.vq_deinterleave(_p(raw, ctypes.c_uint8), n, block,
                            _p(origins, ctypes.c_int32), _p(indices, ctypes.c_uint8))
        return indices, origins
    chunks = raw[: n * chunk].reshape(n, chunk)
    origins = chunks[:, :ORIGIN_BYTES].reshape(-1).view(np.int32).reshape(n, 3).copy()
    indices = chunks[:, ORIGIN_BYTES:].copy()
    return indices, origins


# ---------------------------------------------------------------------------
# LZ4 block codec (v5 .vqvdb payload frames)
# ---------------------------------------------------------------------------

def lz4_compress(data: bytes) -> bytes:
    """LZ4 block compress (native C++ when built, else the spec-derived
    pure-Python codec in vdb/blosc.py — identical block format, both
    cross-validated against system liblz4)."""
    lib = _lib_v2()
    if lib is not None and len(data):
        src = np.frombuffer(data, np.uint8)
        cap = len(data) + len(data) // 255 + 16
        out = np.empty(cap, np.uint8)
        k = lib.vq_lz4_compress(_p(src, ctypes.c_uint8), len(data),
                                _p(out, ctypes.c_uint8), cap)
        if k > 0:
            return out[:k].tobytes()
    from vqvdb_tpu.vdb.blosc import lz4_compress as py_compress

    return py_compress(data)


def lz4_decompress(blob: bytes, dst_size: int) -> bytes:
    """LZ4 block decompress to exactly dst_size bytes; raises ValueError on
    malformed input (both paths are bounds-checked)."""
    lib = _lib_v2()
    if lib is not None and len(blob) and dst_size:
        src = np.frombuffer(blob, np.uint8)
        out = np.empty(dst_size, np.uint8)
        k = lib.vq_lz4_decompress(_p(src, ctypes.c_uint8), len(blob),
                                  _p(out, ctypes.c_uint8), dst_size)
        if k != dst_size:
            raise ValueError("lz4: malformed block")
        return out.tobytes()
    from vqvdb_tpu.vdb.blosc import FormatError
    from vqvdb_tpu.vdb.blosc import lz4_decompress as py_decompress

    try:
        return py_decompress(blob, dst_size)
    except FormatError as e:
        raise ValueError(str(e)) from e


# ---------------------------------------------------------------------------
# Threaded flat copy (DP_SCALING fix (a): the decode pipeline's host stage
# is memcpy-bound; a threaded native copy multiplies effective host
# bandwidth on multi-core hosts).
# ---------------------------------------------------------------------------

def copy_into(dst: np.ndarray, src: np.ndarray, threads: int = 0) -> None:
    """dst[...] = src via a threaded native memcpy when both arrays are
    C-contiguous, same dtype/shape, and the lib is built; numpy otherwise.
    threads=0 uses the hardware count."""
    lib = _load()
    if (lib is not None and lib.vq_version() >= 3
            and dst.flags.c_contiguous and src.flags.c_contiguous
            and dst.dtype == src.dtype and dst.shape == src.shape):
        lib.vq_copy_mt(_p(src.view(np.uint8).reshape(-1), ctypes.c_uint8),
                       _p(dst.view(np.uint8).reshape(-1), ctypes.c_uint8),
                       dst.nbytes, threads)
        return
    np.copyto(dst, src)


# ---------------------------------------------------------------------------
# Dense <-> leaf gather/scatter
# ---------------------------------------------------------------------------

def gather_leaves(dense: np.ndarray, origins: np.ndarray, lo: np.ndarray,
                  background: float = 0.0) -> np.ndarray:
    """dense f32[X,Y,Z,C] spanning [lo, lo+dims) -> leaves f32[n,8,8,8,C]."""
    dense = np.ascontiguousarray(dense, np.float32)
    origins = np.ascontiguousarray(origins, np.int32)
    lo = np.ascontiguousarray(lo, np.int32)
    n = origins.shape[0]
    dx, dy, dz, c = dense.shape
    lib = _load()
    out = np.empty((n, 8, 8, 8, c), np.float32)
    if lib is not None and n:
        lib.vq_gather_leaves(_p(dense, ctypes.c_float), dx, dy, dz, c,
                             _p(origins, ctypes.c_int32), _p(lo, ctypes.c_int32),
                             n, background, _p(out, ctypes.c_float))
        return out
    for i in range(n):
        ox, oy, oz = origins[i] - lo
        block = np.full((8, 8, 8, c), background, np.float32)
        sx = slice(max(ox, 0), min(ox + 8, dx))
        sy = slice(max(oy, 0), min(oy + 8, dy))
        sz = slice(max(oz, 0), min(oz + 8, dz))
        if sx.start < sx.stop and sy.start < sy.stop and sz.start < sz.stop:
            block[sx.start - ox : sx.stop - ox, sy.start - oy : sy.stop - oy,
                  sz.start - oz : sz.stop - oz] = dense[sx, sy, sz]
        out[i] = block
    return out


def scatter_leaves(leaves: np.ndarray, origins: np.ndarray, lo: np.ndarray,
                   dims: Tuple[int, int, int], background: float = 0.0
                   ) -> np.ndarray:
    """leaves f32[n,8,8,8,C] -> dense f32[dims..., C] spanning [lo, lo+dims)."""
    leaves = np.ascontiguousarray(leaves, np.float32)
    origins = np.ascontiguousarray(origins, np.int32)
    lo = np.ascontiguousarray(lo, np.int32)
    n, c = leaves.shape[0], leaves.shape[-1]
    dx, dy, dz = dims
    dense = np.full((dx, dy, dz, c), background, np.float32)
    lib = _load()
    if lib is not None and n:
        lib.vq_scatter_leaves(_p(leaves, ctypes.c_float), _p(origins, ctypes.c_int32),
                              _p(lo, ctypes.c_int32), n, dx, dy, dz, c,
                              _p(dense, ctypes.c_float))
        return dense
    for i in range(n):
        ox, oy, oz = origins[i] - lo
        dense[ox : ox + 8, oy : oy + 8, oz : oz + 8] = leaves[i]
    return dense

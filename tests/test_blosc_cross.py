"""Cross-validate the spec-derived blosc codec against real c-blosc.

tests/test_blosc.py proves the pair (compress/decompress) against itself
and hand-built golden chunks; this module breaks that circle the same way
test_torch_onnx_cross.py does for ONNX: the system `libblosc.so.1`
(c-blosc 1.21.x — the library OpenVDB/Houdini actually link,
ref: openvdb io/Compression.cc bloscDecompress) is driven via ctypes as
an independent producer AND consumer. Both directions must round-trip:

  real blosc_compress_ctx -> vqvdb_tpu.vdb.blosc.decompress
  vqvdb_tpu.vdb.blosc.compress -> real blosc_decompress_ctx

across shuffle modes, compression levels, codecs (lz4, zlib), typesizes,
and sizes spanning memcpyed/tiny/odd/multi-block chunks. Skipped when the
shared library is absent (pure-TPU hosts) — the self-paired and golden
tests still gate the codec there.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np
import pytest

from vqvdb_tpu.utils.errors import FormatError
from vqvdb_tpu.vdb import blosc as myblosc


def _load_libblosc():
    for name in ("libblosc.so.1", "libblosc.so", "blosc"):
        try:
            lib = ctypes.CDLL(name)
            break
        except OSError:
            lib = None
    if lib is None:
        found = ctypes.util.find_library("blosc")
        if not found:
            return None
        lib = ctypes.CDLL(found)
    lib.blosc_compress_ctx.restype = ctypes.c_int
    lib.blosc_compress_ctx.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_size_t, ctypes.c_size_t,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int]
    lib.blosc_decompress_ctx.restype = ctypes.c_int
    lib.blosc_decompress_ctx.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int]
    return lib


LIB = _load_libblosc()

pytestmark = pytest.mark.skipif(LIB is None,
                                reason="system libblosc not available")

SHUFFLE_NONE, SHUFFLE_BYTE, SHUFFLE_BIT = 0, 1, 2


def real_compress(data: bytes, typesize: int, *, clevel: int = 9,
                  shuffle: int = SHUFFLE_BYTE, codec: bytes = b"lz4",
                  blocksize: int = 0) -> bytes:
    dst = ctypes.create_string_buffer(len(data) + myblosc.MAX_OVERHEAD + 64)
    n = LIB.blosc_compress_ctx(clevel, shuffle, typesize, len(data), data,
                               dst, len(dst), codec, blocksize, 1)
    assert n > 0, f"blosc_compress_ctx failed: {n}"
    return dst.raw[:n]


def real_decompress(chunk: bytes, nbytes: int) -> bytes:
    dst = ctypes.create_string_buffer(max(nbytes, 1))
    n = LIB.blosc_decompress_ctx(chunk, dst, nbytes, 1)
    assert n == nbytes, f"blosc_decompress_ctx returned {n}, want {nbytes}"
    return dst.raw[:nbytes]


def _payloads():
    rng = np.random.default_rng(7)
    smooth = np.cumsum(rng.standard_normal(4096).astype(np.float32) * 0.01)
    big = np.cumsum(rng.standard_normal(200_000).astype(np.float32) * 0.001)
    return [
        ("smooth_f32", smooth.tobytes(), 4),
        ("noise_f32", rng.standard_normal(1000).astype(np.float32).tobytes(), 4),
        ("zeros", bytes(8192), 4),
        ("f16_ramp", (np.arange(3000) % 97).astype(np.float16).tobytes(), 2),
        ("tiny", b"abcd" * 3, 4),
        ("odd_u8", rng.integers(0, 4, 10001).astype(np.uint8).tobytes(), 1),
        ("multiblock_f32", big.tobytes(), 4),  # > default blocksize
    ]


@pytest.mark.parametrize("name,data,typesize", _payloads())
@pytest.mark.parametrize("shuffle", [SHUFFLE_NONE, SHUFFLE_BYTE])
@pytest.mark.parametrize("clevel", [1, 5, 9])
def test_real_lz4_chunks_decode(name, data, typesize, shuffle, clevel):
    chunk = real_compress(data, typesize, clevel=clevel, shuffle=shuffle)
    assert bytes(myblosc.decompress(chunk)) == data


@pytest.mark.parametrize("name,data,typesize", _payloads())
def test_real_zlib_chunks_decode(name, data, typesize):
    chunk = real_compress(data, typesize, codec=b"zlib")
    assert bytes(myblosc.decompress(chunk)) == data


@pytest.mark.parametrize("name,data,typesize", _payloads())
@pytest.mark.parametrize("eff_typesize", [None, 1])
def test_our_chunks_decode_under_real_blosc(name, data, typesize,
                                            eff_typesize):
    mine = myblosc.compress(data, typesize=eff_typesize or typesize)
    assert real_decompress(bytes(mine), len(data)) == data


def test_explicit_blocksize_interop():
    # Force several blocks incl. a ragged leftover on the real side.
    data = np.arange(70_000, dtype=np.float32).tobytes()
    chunk = real_compress(data, 4, blocksize=16384)
    assert bytes(myblosc.decompress(chunk)) == data


def test_real_bitshuffle_rejected_cleanly():
    # We deliberately don't implement bitshuffle (OpenVDB never writes
    # it); real bitshuffle chunks must fail loudly, not corrupt.
    data = np.arange(4096, dtype=np.float32).tobytes()
    chunk = real_compress(data, 4, shuffle=SHUFFLE_BIT)
    with pytest.raises(FormatError, match="bit-shuffle"):
        myblosc.decompress(chunk)


def test_openvdb_policy_chunks_match_real():
    # The chunks our .vdb writer emits (OpenVDB's pad/min-bytes policy,
    # zero-padded to >=128 B when short) must be consumable by real blosc.
    rng = np.random.default_rng(3)
    for nfloat in (40, 512, 2048):  # padded / one block / typical leaf
        raw = np.cumsum(
            rng.standard_normal(nfloat).astype(np.float32)).tobytes()
        chunk = myblosc.openvdb_compress(raw)
        if chunk is None:  # tiny or incompressible: stored raw upstream
            continue
        nbytes = int.from_bytes(bytes(chunk)[4:8], "little")  # header u32
        assert nbytes >= len(raw)  # write-side zero padding only grows it
        assert real_decompress(bytes(chunk), nbytes)[: len(raw)] == raw

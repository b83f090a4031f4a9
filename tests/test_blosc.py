"""Blosc1 chunk codec tests (vdb/blosc.py).

Pair methodology plus an independent producer: beyond encoder<->decoder
round trips, the golden tests construct chunks BY HAND in the test body,
byte field by byte field from the c-blosc1 spec, so the decoder is checked
against a second, independently written implementation of the format.
"""

import struct

import numpy as np
import pytest

from vqvdb_tpu.utils.errors import FormatError
from vqvdb_tpu.vdb import blosc


# ---------------------------------------------------------------------------
# LZ4 block codec
# ---------------------------------------------------------------------------

def _corpus(rng):
    zeros = b"\x00" * 4096
    ramp = bytes(range(256)) * 16
    rep = b"abcdefgh" * 512
    rand = rng.integers(0, 256, 4096, np.uint8).tobytes()
    lowent = rng.integers(0, 4, 8192, np.uint8).tobytes()
    mixed = zeros[:100] + rand[:333] + rep[:1000] + zeros[:77]
    short = b"hello world, hello world, hello"
    return [zeros, ramp, rep, rand, lowent, mixed, short,
            b"x", b"ab" * 7, rand[:13]]


def test_lz4_round_trip():
    rng = np.random.default_rng(0)
    for data in _corpus(rng):
        comp = blosc.lz4_compress(data)
        assert blosc.lz4_decompress(comp, len(data)) == data


def test_lz4_compresses_redundant_data():
    data = b"\x00" * 4096
    comp = blosc.lz4_compress(data)
    assert len(comp) < 64  # must actually emit matches, not all-literals


def test_lz4_decode_hand_built_sequences():
    # One sequence: 5 literals "hello", then match offset 5 len 10
    # (overlapping run -> "hello" repeated), then final literals "XY".
    src = bytes([0x56]) + b"hello" + struct.pack("<H", 5)
    src += bytes([0x20]) + b"XY"
    assert blosc.lz4_decompress(src, 17) == b"hellohellohelloXY"
    # Extended literal length: 15+240+3=258 literals via 0xF0 token.
    lits = bytes(range(250)) + b"ABCDEFGH"
    src2 = bytes([0xF0, 243]) + lits
    assert blosc.lz4_decompress(src2, 258) == lits
    # Extended match length: 4+15+255+2 = 276.
    seed = b"Z" * 8
    src3 = bytes([0x8F]) + seed + struct.pack("<H", 8) + bytes([255, 2])
    src3 += bytes([0x10]) + b"q"
    out = blosc.lz4_decompress(src3, 8 + 276 + 1)
    assert out == seed + (seed * 35)[:276] + b"q"


def test_lz4_decode_rejects_bad_streams():
    with pytest.raises(FormatError):
        blosc.lz4_decompress(bytes([0x10]), 1)  # literal past end
    with pytest.raises(FormatError):  # offset 0 invalid
        blosc.lz4_decompress(bytes([0x04]) + struct.pack("<H", 0), 4)
    with pytest.raises(FormatError):  # offset beyond output so far
        blosc.lz4_decompress(
            bytes([0x14]) + b"a" + struct.pack("<H", 9), 5)
    with pytest.raises(FormatError):  # wrong decoded size
        blosc.lz4_decompress(bytes([0x20]) + b"ab", 3)


# ---------------------------------------------------------------------------
# Chunk round trips
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("typesize", [1, 2, 4, 8, 12])
@pytest.mark.parametrize("shuffle", [True, False])
def test_chunk_round_trip(typesize, shuffle):
    rng = np.random.default_rng(typesize)
    # Float-ish data: low-entropy high bytes so shuffle+lz4 bites.
    vals = (rng.normal(0, 1, 1024).astype(np.float32).tobytes() * 2)[:6000]
    for data in [vals, b"\x00" * 777, rng.integers(0, 256, 513, np.uint8
                                                   ).tobytes()]:
        chunk = blosc.compress(data, typesize, shuffle=shuffle)
        assert blosc.decompress(chunk) == data


def test_chunk_round_trip_multiblock_and_leftover():
    rng = np.random.default_rng(7)
    data = np.sin(np.arange(5000, dtype=np.float32)).tobytes()  # 20000 B
    # Forced blocksize -> 4 blocks of 6000 B + leftover 2000 B.
    chunk = blosc.compress(data, 4, blocksize=6000)
    hdr = blosc.HEADER.unpack_from(chunk)
    assert hdr[5] == 6000 and hdr[4] == 20000
    assert blosc.decompress(chunk) == data
    # Blocksize not a typesize multiple gets rounded down.
    chunk2 = blosc.compress(data, 8, blocksize=999)
    assert blosc.HEADER.unpack_from(chunk2)[5] == 992
    assert blosc.decompress(chunk2) == data
    rand = rng.integers(0, 256, 10000, np.uint8).tobytes()
    assert blosc.decompress(blosc.compress(rand, 4, blocksize=3000)) == rand


def test_chunk_zlib_codec():
    data = b"spam and eggs " * 300
    chunk = blosc.compress(data, 2, codec=blosc.CODEC_ZLIB)
    flags = chunk[2]
    assert (flags >> 5) & 0x7 == blosc.CODEC_ZLIB
    assert blosc.decompress(chunk) == data


def test_chunk_memcpyed_paths():
    rng = np.random.default_rng(3)
    rand = rng.integers(0, 256, 2048, np.uint8).tobytes()
    # Incompressible input falls back to memcpyed automatically.
    chunk = blosc.compress(rand, 4)
    assert chunk[2] & blosc.FLAG_MEMCPYED
    assert len(chunk) == len(rand) + 16
    assert blosc.decompress(chunk) == rand
    # clevel=0 forces memcpyed.
    easy = b"\x00" * 1000
    chunk0 = blosc.compress(easy, 4, clevel=0)
    assert chunk0[2] & blosc.FLAG_MEMCPYED
    assert blosc.decompress(chunk0) == easy
    # Empty payload.
    assert blosc.decompress(blosc.compress(b"", 4)) == b""


def test_chunk_split_flag_consistency():
    # Large typesize must set dont-split (decoder derives the same).
    data = np.zeros(4096, np.uint8).tobytes()
    c_big = blosc.compress(data, 24)  # > MAX_SPLITS -> unsplit
    assert c_big[2] & blosc.FLAG_DONT_SPLIT
    c_small = blosc.compress(data, 4)
    assert not (c_small[2] & blosc.FLAG_DONT_SPLIT)
    assert blosc.decompress(c_big) == data == blosc.decompress(c_small)


# ---------------------------------------------------------------------------
# Hand-built golden chunks (independent producer)
# ---------------------------------------------------------------------------

def _hand_chunk(data: bytes, typesize: int, flags: int, blocksize: int,
                streams_per_block):
    """Assemble a chunk from spec fields with caller-supplied streams."""
    nblocks = -(-len(data) // blocksize)
    base = 16 + 4 * nblocks
    body = bytearray()
    bstarts = []
    for block_streams in streams_per_block:
        bstarts.append(base + len(body))
        for neblock, payload in block_streams:
            body += struct.pack("<i", len(payload)) + payload
    cbytes = base + len(body)
    head = blosc.HEADER.pack(2, 1, flags, typesize, len(data), blocksize,
                             cbytes)
    return head + struct.pack(f"<{nblocks}i", *bstarts) + bytes(body)


def test_decode_hand_built_split_shuffled_chunk():
    """512 f32-like values, one block, split into 4 shuffled streams, each
    stored verbatim (sbytes == neblock marks stored streams)."""
    vals = np.arange(512, dtype="<u4")
    data = vals.tobytes()
    planes = data[0::4], data[1::4], data[2::4], data[3::4]
    flags = blosc.FLAG_BYTE_SHUFFLE | (blosc.CODEC_LZ4 << 5)
    chunk = _hand_chunk(data, 4, flags, len(data),
                        [[(512, p) for p in planes]])
    assert blosc.decompress(chunk) == data


def test_decode_hand_built_lz4_chunk_with_compressed_stream():
    """One unsplit, unshuffled block whose single stream is a hand-written
    LZ4 sequence (literals + overlapping match)."""
    data = b"0123456789abcdef" * 40  # 640 B
    # LZ4: 16 literals (15+1 extension byte), then a 624-byte overlapping
    # match at offset 16; match-length extension 624-4-15=605 -> 255,255,95.
    stream = bytes([0xFF, 1]) + data[:16] + struct.pack("<H", 16)
    stream += bytes([255, 255, 95])
    flags = blosc.FLAG_DONT_SPLIT | (blosc.CODEC_LZ4 << 5)
    chunk = _hand_chunk(data, 1, flags, 640, [[(640, stream)]])
    assert blosc.decompress(chunk) == data


def test_decode_hand_built_memcpyed_chunk():
    data = bytes(range(100))
    head = blosc.HEADER.pack(2, 1, blosc.FLAG_MEMCPYED, 1, 100, 100, 116)
    assert blosc.decompress(head + data) == data


def test_decode_rejects_malformed_chunks():
    good = blosc.compress(b"\x00" * 256, 4)
    with pytest.raises(FormatError):
        blosc.decompress(good[:10])  # truncated header
    with pytest.raises(FormatError):
        blosc.decompress(good + b"x")  # cbytes mismatch
    bad = bytearray(good)
    bad[2] |= blosc.FLAG_BIT_SHUFFLE
    with pytest.raises(FormatError, match="bit-shuffle"):
        blosc.decompress(bytes(bad))
    zstd = bytearray(good)
    zstd[2] = (zstd[2] & 0x1F) | (blosc.CODEC_ZSTD << 5)
    with pytest.raises(FormatError, match="zstd"):
        blosc.decompress(bytes(zstd))


# ---------------------------------------------------------------------------
# OpenVDB policy wrappers
# ---------------------------------------------------------------------------

def test_openvdb_policy_small_buffers():
    assert blosc.openvdb_compress(b"\x00" * 47) is None  # below minimum
    # 48..127 B: padded to 128; decode truncates back.
    raw = bytes(range(64))
    chunk = blosc.openvdb_compress(raw)
    if chunk is not None:  # padded chunk may still be >= raw -> None ok
        assert blosc.decompress(chunk)[:64] == raw
        assert blosc.openvdb_decompress(chunk, 64) == raw


def test_openvdb_policy_leaf_buffer():
    """A typical smooth 2048-B leaf buffer must round-trip and shrink."""
    x = np.linspace(0, 1, 512, dtype=np.float32)
    raw = np.sin(x * 3).astype(np.float32).tobytes()
    chunk = blosc.openvdb_compress(raw)
    assert chunk is not None and len(chunk) < len(raw)
    assert blosc.openvdb_decompress(chunk, len(raw)) == raw

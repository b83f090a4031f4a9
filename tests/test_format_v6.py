"""v6 container: v5 frames plus an optional per-grid residual-correction
stream (the near-lossless tier; format/vqvdb.py FORMAT_VERSION_V6 notes).

Grid metadata = v5's + u8 residualMode (0 none / 1 int8 / 2 f16) +
u8 residualChannels; frame blobs append [f32 scales] + residual values
after the indices block. Indices-only consumption of a residual file is a
valid lossy decode.
"""

import struct

import numpy as np
import pytest

from vqvdb_tpu.format.vqvdb import (
    FormatError,
    GridMetadata,
    VqvdbReader,
    VqvdbWriter,
)


def _lattice_origins(n):
    side = int(np.ceil(n ** (1 / 3)))
    o = np.stack(np.unravel_index(np.arange(n), (side,) * 3), 1)
    return (o * 8).astype(np.int32)


def _payload(n, channels, mode, seed=0):
    rng = np.random.default_rng(seed)
    indices = rng.integers(0, 256, (n, 4, 4, 4)).astype(np.uint8)
    origins = _lattice_origins(n)
    if mode == "int8":
        scales = rng.random(n).astype(np.float32) * 1e-3 + 1e-6
        residual = rng.integers(-127, 128, (n, 512 * channels)).astype(np.int8)
    else:
        scales = None
        residual = (rng.standard_normal((n, 512 * channels)) * 1e-3
                    ).astype(np.float16)
    return indices, origins, scales, residual


def _write(path, indices, origins, scales, residual, *, channels,
           mode, batches=1, compression="zlib"):
    meta = GridMetadata(
        "g", num_embeddings=256, latent_shape=tuple(indices.shape[1:]),
        total_blocks=indices.shape[0],
        residual_mode={"int8": 1, "f16": 2}[mode], residual_channels=channels)
    with VqvdbWriter(path, version=6, compression=compression) as w:
        w.start_grid(meta)
        splits = np.array_split(np.arange(indices.shape[0]), batches)
        for sel in splits:
            w.write_batch(indices[sel], origins[sel],
                          scales[sel] if scales is not None else None,
                          residual[sel])
        w.end_grid()


@pytest.mark.parametrize("mode", ["int8", "f16"])
@pytest.mark.parametrize("channels", [1, 3])
@pytest.mark.parametrize("compression", ["zlib", "lz4"])
def test_v6_round_trip(tmp_path, mode, channels, compression):
    n = 77
    indices, origins, scales, residual = _payload(n, channels, mode)
    path = tmp_path / "a.vqvdb"
    _write(path, indices, origins, scales, residual, channels=channels,
           mode=mode, batches=3, compression=compression)

    with VqvdbReader(path) as r:
        assert r.version == 6
        meta = r.next_grid_metadata()
        assert meta.residual_mode == {"int8": 1, "f16": 2}[mode]
        assert meta.residual_channels == channels
        assert meta.residual_values == 512 * channels
        got = [[], [], [], []]
        while r.has_next():
            i, o, s, res = r.next_batch_residual(13)  # misaligned with frames
            got[0].append(i)
            got[1].append(o)
            if s is not None:
                got[2].append(s)
            got[3].append(res)
    np.testing.assert_array_equal(np.concatenate(got[0]), indices)
    np.testing.assert_array_equal(np.concatenate(got[1]), origins)
    if mode == "int8":
        np.testing.assert_array_equal(np.concatenate(got[2]), scales)
    res_all = np.concatenate(got[3])
    assert res_all.dtype == (np.int8 if mode == "int8" else np.float16)
    np.testing.assert_array_equal(res_all, residual)


def test_v6_indices_only_read_is_valid(tmp_path):
    """next_batch on a residual grid drops the correction stream (lossy
    decode) without corrupting the index/origin framing."""
    n = 30
    indices, origins, scales, residual = _payload(n, 1, "int8")
    path = tmp_path / "b.vqvdb"
    _write(path, indices, origins, scales, residual, channels=1, mode="int8")
    with VqvdbReader(path) as r:
        r.next_grid_metadata()
        i, o = r.next_batch(n)
    np.testing.assert_array_equal(i, indices)
    np.testing.assert_array_equal(o, origins)


def test_v6_mode0_equals_v5_semantics(tmp_path):
    """A v6 grid without residuals reads back exactly like a v5 grid."""
    rng = np.random.default_rng(2)
    indices = rng.integers(0, 256, (25, 4, 4, 4)).astype(np.uint8)
    origins = _lattice_origins(25)
    meta = GridMetadata("g", num_embeddings=256, latent_shape=(4, 4, 4),
                        total_blocks=25)
    path = tmp_path / "c.vqvdb"
    with VqvdbWriter(path, version=6) as w:
        w.start_grid(meta)
        w.write_batch(indices, origins)
        w.end_grid()
    with VqvdbReader(path) as r:
        m = r.next_grid_metadata()
        assert m.residual_mode == 0 and m.residual_bytes == 0
        i, o, s, res = r.next_batch_residual(25)
    np.testing.assert_array_equal(i, indices)
    np.testing.assert_array_equal(o, origins)
    assert s is None and res is None


def test_v6_mixed_grids_and_skip(tmp_path):
    """Residual and plain grids coexist; skip_grid_payload walks residual
    frames and reports real stored bytes."""
    n = 40
    indices, origins, scales, residual = _payload(n, 1, "int8", seed=5)
    plain_idx = (indices + 1).astype(np.uint8)
    m1 = GridMetadata("res", num_embeddings=256, latent_shape=(4, 4, 4),
                      total_blocks=n, residual_mode=1, residual_channels=1)
    m2 = GridMetadata("plain", num_embeddings=256, latent_shape=(4, 4, 4),
                      total_blocks=n)
    path = tmp_path / "d.vqvdb"
    with VqvdbWriter(path, version=6) as w:
        w.start_grid(m1)
        w.write_batch(indices, origins, scales, residual)
        w.end_grid()
        w.start_grid(m2)
        w.write_batch(plain_idx, origins)
        w.end_grid()

    with VqvdbReader(path) as r:
        meta = r.next_grid_metadata()
        assert meta.name == "res"
        skipped = r.skip_grid_payload()
        assert skipped > 0
        meta2 = r.next_grid_metadata()
        assert meta2.name == "plain" and meta2.residual_mode == 0
        i, o = r.next_batch(n)
    np.testing.assert_array_equal(i, plain_idx)

    # Skipping after partially consuming a residual grid still lands on
    # the next grid cleanly.
    with VqvdbReader(path) as r:
        r.next_grid_metadata()
        r.next_batch_residual(7)
        r.skip_grid_payload()
        assert r.next_grid_metadata().name == "plain"


def test_v6_writer_validation(tmp_path):
    n = 4
    indices, origins, scales, residual = _payload(n, 1, "int8")
    meta = GridMetadata("g", num_embeddings=256, latent_shape=(4, 4, 4),
                        total_blocks=n, residual_mode=1, residual_channels=1)

    # residual data on a residual-free grid
    with VqvdbWriter(tmp_path / "x1.vqvdb", version=6) as w:
        w.start_grid(GridMetadata("g", num_embeddings=256,
                                  latent_shape=(4, 4, 4), total_blocks=n))
        with pytest.raises(FormatError):
            w.write_batch(indices, origins, scales, residual)
        w.write_batch(indices, origins)

    # missing residual / scales on a residual grid
    with VqvdbWriter(tmp_path / "x2.vqvdb", version=6) as w:
        w.start_grid(meta)
        with pytest.raises(FormatError):
            w.write_batch(indices, origins)
        with pytest.raises(FormatError):
            w.write_batch(indices, origins, None, residual)
        with pytest.raises(FormatError):  # wrong residual width
            w.write_batch(indices, origins, scales, residual[:, :256])
        w.write_batch(indices, origins, scales, residual)

    # residuals demand v6
    with VqvdbWriter(tmp_path / "x3.vqvdb", version=5) as w:
        with pytest.raises(FormatError):
            w.start_grid(meta)

    # metadata self-checks
    with pytest.raises(FormatError):
        GridMetadata("g", num_embeddings=256, latent_shape=(4, 4, 4),
                     total_blocks=1, residual_mode=1, residual_channels=0)
    with pytest.raises(FormatError):
        GridMetadata("g", num_embeddings=256, latent_shape=(4, 4, 4),
                     total_blocks=1, residual_mode=7, residual_channels=1)


def test_v6_bad_residual_mode_byte(tmp_path):
    n = 3
    indices, origins, scales, residual = _payload(n, 1, "int8")
    path = tmp_path / "e.vqvdb"
    _write(path, indices, origins, scales, residual, channels=1, mode="int8")
    data = bytearray(path.read_bytes())
    # residual mode byte: 12 header + 4 nameLen + 1 name + 64 transform
    # + 6 shape + 4 blocks + 1 codec
    data[12 + 4 + 1 + 64 + 6 + 4 + 1] = 9
    path.write_bytes(bytes(data))
    with VqvdbReader(path) as r:
        with pytest.raises(FormatError):
            r.next_grid_metadata()


def test_v6_truncation_detected(tmp_path):
    n = 12
    indices, origins, scales, residual = _payload(n, 1, "f16")
    path = tmp_path / "f.vqvdb"
    _write(path, indices, origins, scales, residual, channels=1, mode="f16")
    data = path.read_bytes()
    path.write_bytes(data[:-9])
    with VqvdbReader(path) as r:
        r.next_grid_metadata()
        with pytest.raises(FormatError):
            r.next_batch_residual(n)


def test_v6_golden_structure_bytes(tmp_path):
    """Pin the v6 grid-header layout byte for byte (the writer's own bytes,
    same pair methodology as the other containers: a layout change cannot
    slip through unnoticed)."""
    indices = np.arange(2 * 64, dtype=np.uint8).reshape(2, 4, 4, 4)
    origins = np.array([[0, 0, 0], [8, 0, 0]], np.int32)
    scales = np.array([0.5, 0.25], np.float32)
    residual = np.zeros((2, 512), np.int8)
    path = tmp_path / "g.vqvdb"
    _write(path, indices, origins, scales, residual, channels=1, mode="int8")
    raw = path.read_bytes()
    assert raw[:5] == b"VQVDB"
    assert raw[5] == 6  # version
    assert raw[6] == 1  # numGrids
    assert struct.unpack("<I", raw[7:11])[0] == 256  # numEmbeddings
    assert raw[11] == 3  # latentDimCount
    off = 12
    (name_len,) = struct.unpack("<I", raw[off:off + 4])
    assert name_len == 1 and raw[off + 4:off + 5] == b"g"
    off += 4 + 1 + 64 + 6  # name, transform, latent shape
    assert struct.unpack("<I", raw[off:off + 4])[0] == 2  # totalBlocks
    off += 4
    assert raw[off] == 0  # codec byte: zlib
    assert raw[off + 1] == 1  # residual mode: int8
    assert raw[off + 2] == 1  # residual channels
    off += 3
    n_chunks, comp = struct.unpack("<IQ", raw[off:off + 12])
    assert n_chunks == 2
    assert off + 12 + comp == len(raw)
    import zlib

    blob = zlib.decompress(raw[off + 12:])
    # origins deltas, indices, scales, residual — in that order
    assert len(blob) == 2 * (12 + 64 + 4 + 512)
    deltas = np.frombuffer(blob, np.int32, count=6).reshape(2, 3)
    np.testing.assert_array_equal(deltas, [[0, 0, 0], [8, 0, 0]])
    got_idx = np.frombuffer(blob, np.uint8, offset=24, count=128)
    np.testing.assert_array_equal(got_idx, indices.reshape(-1))
    got_scales = np.frombuffer(blob, np.float32, offset=24 + 128, count=2)
    np.testing.assert_array_equal(got_scales, scales)

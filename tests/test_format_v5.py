"""v5 container: compressed payload frames (our extension beyond the
reference format — v3 stays the frozen interchange default).

Layout: v4 metadata + codec byte; payload = frames of
[u32 nChunks, u64 compBytes, blob], each decompressing to delta-encoded
origins then indices (format/vqvdb.py FORMAT_VERSION_V5 notes)."""

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


def _write(path, indices, origins, *, version=5, batches=1, k=256,
           compression="zlib"):
    meta = GridMetadata("g", num_embeddings=k,
                        latent_shape=tuple(indices.shape[1:]),
                        total_blocks=indices.shape[0])
    with VqvdbWriter(path, version=version, compression=compression) as w:
        w.start_grid(meta)
        for part_i, part_o in zip(np.array_split(indices, batches),
                                  np.array_split(origins, batches)):
            w.write_batch(part_i, part_o)
        w.end_grid()


@pytest.mark.parametrize("compression", ["zlib", "lzma", "lz4"])
@pytest.mark.parametrize("batches", [1, 3])
def test_v5_round_trip(tmp_path, compression, batches):
    rng = np.random.default_rng(0)
    n = 101
    indices = rng.integers(0, 256, (n, 4, 4, 4)).astype(np.uint8)
    origins = _lattice_origins(n)
    path = tmp_path / "a.vqvdb"
    _write(path, indices, origins, batches=batches, compression=compression)

    with VqvdbReader(path) as r:
        assert r.version == 5
        meta = r.next_grid_metadata()
        assert meta.total_blocks == n
        got_i, got_o = [], []
        while r.has_next():
            i, o = r.next_batch(17)  # misaligned with frame sizes
            assert i.shape[0] <= 17
            got_i.append(i)
            got_o.append(o)
    np.testing.assert_array_equal(np.concatenate(got_i), indices)
    np.testing.assert_array_equal(np.concatenate(got_o), origins)


def test_v5_u16_indices(tmp_path):
    rng = np.random.default_rng(1)
    indices = rng.integers(0, 4096, (40, 4, 4, 4)).astype(np.uint16)
    origins = _lattice_origins(40)
    path = tmp_path / "b.vqvdb"
    _write(path, indices, origins, k=4096)
    with VqvdbReader(path) as r:
        meta = r.next_grid_metadata()
        assert meta.index_bytes == 2
        i, o = r.next_batch(40)
    np.testing.assert_array_equal(i, indices)
    np.testing.assert_array_equal(o, origins)


def test_v5_smaller_than_v3_on_real_indices(tmp_path):
    """On actual encoded content (correlated indices, lattice origins) the
    v5 payload must beat v3 by a meaningful margin."""
    import jax

    from vqvdb_tpu.core.config import CodecConfig, ModelConfig
    from vqvdb_tpu.models import init_vqvae_params
    from vqvdb_tpu.runtime.codec import VQCodec
    from vqvdb_tpu.train.synthetic import smoke_grid

    mcfg = ModelConfig(embedding_dim=32, num_embeddings=64)
    codec = VQCodec(init_vqvae_params(jax.random.key(0), mcfg), mcfg,
                    CodecConfig(batch_size=256, compute_dtype="float32"))
    g = smoke_grid(64, seed=5)
    p3, p5 = tmp_path / "a3.vqvdb", tmp_path / "a5.vqvdb"
    codec.compress(g, p3, format_version=3)
    codec.compress(g, p5, format_version=5)
    (g3,), _ = codec.decompress(p3)
    (g5,), _ = codec.decompress(p5)
    np.testing.assert_array_equal(g5.leaves, g3.leaves)
    np.testing.assert_array_equal(g5.origins, g3.origins)
    ratio = p3.stat().st_size / p5.stat().st_size
    assert ratio > 1.25, f"v5 only {ratio:.2f}x smaller than v3"

    # The lz4 codec trades a little ratio for several-fold faster reads;
    # through the full codec it must still round-trip exactly and beat v3.
    p5l = tmp_path / "a5l.vqvdb"
    codec.compress(g, p5l, format_version=5, compression="lz4")
    (g5l,), _ = codec.decompress(p5l)
    np.testing.assert_array_equal(g5l.leaves, g3.leaves)
    np.testing.assert_array_equal(g5l.origins, g3.origins)
    assert p5l.stat().st_size < p3.stat().st_size


def test_v5_truncation_detected(tmp_path):
    indices = np.zeros((10, 4, 4, 4), np.uint8)
    origins = _lattice_origins(10)
    path = tmp_path / "c.vqvdb"
    _write(path, indices, origins)
    data = path.read_bytes()
    path.write_bytes(data[:-5])
    with VqvdbReader(path) as r:
        r.next_grid_metadata()
        with pytest.raises(FormatError):
            r.next_batch(10)


def test_v5_bad_codec_byte(tmp_path):
    indices = np.zeros((2, 4, 4, 4), np.uint8)
    _write(path := tmp_path / "d.vqvdb", indices, _lattice_origins(2))
    data = bytearray(path.read_bytes())
    # codec byte sits right after the u32 totalBlocks of the grid header:
    # 12 header + 4 nameLen + 1 name + 64 transform + 6 shape + 4 blocks
    data[12 + 4 + 1 + 64 + 6 + 4] = 9
    path.write_bytes(bytes(data))
    with VqvdbReader(path) as r:
        with pytest.raises(FormatError):
            r.next_grid_metadata()


def test_v3_writer_rejects_v5_only_options():
    with pytest.raises(Exception):
        VqvdbWriter("/tmp/x.vqvdb", version=5, compression="zstd")


def test_v5_lz4_corrupt_frame_raises(tmp_path):
    """Flipping bytes inside an lz4 frame must surface as FormatError (a
    malformed block or a wrong-size decode), never as a crash or silent
    corruption passed through."""
    rng = np.random.default_rng(3)
    indices = rng.integers(0, 256, (50, 4, 4, 4)).astype(np.uint8)
    path = tmp_path / "e.vqvdb"
    _write(path, indices, _lattice_origins(50), compression="lz4")
    data = bytearray(path.read_bytes())
    for flip in (len(data) - 3, len(data) // 2 + 7):
        bad = bytearray(data)
        bad[flip] ^= 0xFF
        (p := tmp_path / "bad.vqvdb").write_bytes(bytes(bad))
        with VqvdbReader(p) as r:
            r.next_grid_metadata()
            try:
                got, _ = r.next_batch(50)
                # A flip in the literal tail can still decode to the right
                # size; then the payload must differ, not crash.
                assert got.shape[0] == 50
            except FormatError:
                pass


def test_v5_lz4_native_python_interop(tmp_path, monkeypatch):
    """Files written with the pure-Python lz4 fallback must read back under
    the native C++ codec and vice versa — one block format, two
    independent implementations (both also cross-validated against system
    liblz4 in tests/test_native_io.py / test_blosc_cross.py)."""
    from vqvdb_tpu.runtime import native_io
    from vqvdb_tpu.vdb import blosc as pyblosc

    rng = np.random.default_rng(4)
    indices = rng.integers(0, 64, (80, 4, 4, 4)).astype(np.uint8)
    origins = _lattice_origins(80)

    if native_io._lib_v2() is None:
        pytest.skip("native lz4 not available to cross against")

    # Write with the python codec forced, read with the native one.
    p1 = tmp_path / "py.vqvdb"
    monkeypatch.setattr(native_io, "_lib_v2", lambda: None)
    _write(p1, indices, origins, compression="lz4")
    monkeypatch.undo()
    with VqvdbReader(p1) as r:
        r.next_grid_metadata()
        i1, o1 = r.next_batch(80)
    np.testing.assert_array_equal(i1, indices)
    np.testing.assert_array_equal(o1, origins)

    # Write with the native codec, read with the python one forced.
    p2 = tmp_path / "nat.vqvdb"
    _write(p2, indices, origins, compression="lz4")
    monkeypatch.setattr(native_io, "_lib_v2", lambda: None)
    with VqvdbReader(p2) as r:
        r.next_grid_metadata()
        i2, o2 = r.next_batch(80)
    np.testing.assert_array_equal(i2, indices)
    np.testing.assert_array_equal(o2, origins)

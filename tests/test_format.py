""".vqvdb v3 container tests: golden bytes, round trips, error paths.

The golden-byte fixtures are constructed independently from the byte layout
documented in the reference (src/Utils/VQVDB_Reader.hpp:30-42, .cpp writer),
so writer and reader are validated against the spec, not just each other.
"""

import struct

import numpy as np
import pytest

from vqvdb_tpu.format import GridMetadata, VqvdbReader, VqvdbWriter
from vqvdb_tpu.format.vqvdb import write_single_grid


def _expected_bytes(name, num_embeddings, latent_shape, indices, origins, transform):
    """Hand-build the exact byte stream from the format spec."""
    out = b"VQVDB"  # magic
    out += struct.pack("<B", 3)  # version
    out += struct.pack("<B", 1)  # numGrids
    out += struct.pack("<I", num_embeddings)
    out += struct.pack("<B", len(latent_shape))
    name_b = name.encode()
    out += struct.pack("<I", len(name_b)) + name_b
    out += np.asarray(transform, np.float32).tobytes()
    out += np.asarray(latent_shape, np.uint16).tobytes()
    out += struct.pack("<I", indices.shape[0])
    for i in range(indices.shape[0]):
        out += np.asarray(origins[i], np.int32).tobytes()
        out += np.asarray(indices[i], np.uint8).tobytes()
    return out


def test_golden_bytes_single_grid(tmp_path, rng):
    indices = rng.integers(0, 256, size=(5, 4, 4, 4), dtype=np.uint8)
    origins = rng.integers(-1000, 1000, size=(5, 3)).astype(np.int32) * 8
    transform = np.eye(4, dtype=np.float32)
    path = tmp_path / "g.vqvdb"
    write_single_grid(path, "density", indices, origins, num_embeddings=256)

    expected = _expected_bytes("density", 256, (4, 4, 4), indices, origins, transform)
    assert path.read_bytes() == expected


def test_header_fields(tmp_path, rng):
    indices = rng.integers(0, 256, size=(1, 4, 4, 4), dtype=np.uint8)
    origins = np.zeros((1, 3), np.int32)
    path = tmp_path / "h.vqvdb"
    write_single_grid(path, "d", indices, origins, num_embeddings=256)
    raw = path.read_bytes()
    assert raw[:5] == b"VQVDB"
    assert raw[5] == 3  # version
    assert raw[6] == 1  # numGrids
    assert struct.unpack("<I", raw[7:11])[0] == 256
    assert raw[11] == 3  # latentDimCount
    assert len(raw) == 12 + (4 + 1) + 64 + 6 + 4 + 1 * (12 + 64)


def test_round_trip_multi_grid_multi_batch(tmp_path, rng):
    grids = []
    for gi, n in enumerate([7, 1, 130]):
        indices = rng.integers(0, 256, size=(n, 4, 4, 4), dtype=np.uint8)
        origins = rng.integers(-(2**20), 2**20, size=(n, 3)).astype(np.int32)
        tf = np.arange(16, dtype=np.float32).reshape(4, 4) + gi
        grids.append((f"grid_{gi}", indices, origins, tf))

    path = tmp_path / "m.vqvdb"
    with VqvdbWriter(path) as w:
        for name, indices, origins, tf in grids:
            w.start_grid(
                GridMetadata(
                    name=name,
                    num_embeddings=256,
                    latent_shape=(4, 4, 4),
                    total_blocks=indices.shape[0],
                    transform=tf,
                )
            )
            # Write in uneven batches to exercise streaming.
            for s in range(0, indices.shape[0], 3):
                w.write_batch(indices[s : s + 3], origins[s : s + 3])
            w.end_grid()

    with VqvdbReader(path) as r:
        assert r.num_grids == 3
        assert r.num_embeddings == 256
        assert r.latent_dim_count == 3
        for name, indices, origins, tf in grids:
            meta = r.next_grid_metadata()
            assert meta.name == name
            assert meta.latent_shape == (4, 4, 4)
            assert meta.total_blocks == indices.shape[0]
            np.testing.assert_array_equal(meta.transform, tf)
            got_i, got_o = [], []
            while r.has_next():
                bi, bo = r.next_batch(32)
                got_i.append(bi)
                got_o.append(bo)
            np.testing.assert_array_equal(np.concatenate(got_i), indices)
            np.testing.assert_array_equal(np.concatenate(got_o), origins)
        assert not r.has_next_grid()


def test_bad_magic_and_version(tmp_path):
    p = tmp_path / "bad.vqvdb"
    p.write_bytes(b"NOTDB" + bytes(7))
    with pytest.raises(ValueError, match="magic"):
        VqvdbReader(p)
    p.write_bytes(b"VQVDB" + bytes([9]) + bytes(6))
    with pytest.raises(ValueError, match="version"):
        VqvdbReader(p)


def test_v3_header_rejects_k_over_256(tmp_path):
    # A v3 chunk stores one byte per index, so a v3 header declaring
    # K>256 is internally inconsistent; the reader must reject it up
    # front (docs/FORMATS.md error-handling contract) just as the writer
    # refuses to produce it.
    import struct

    p = tmp_path / "k4096.vqvdb"
    p.write_bytes(struct.pack("<5sBBIB", b"VQVDB", 3, 1, 4096, 3))
    with pytest.raises(ValueError, match="256"):
        VqvdbReader(p)


def test_truncation_detected(tmp_path, rng):
    indices = rng.integers(0, 256, size=(10, 4, 4, 4), dtype=np.uint8)
    origins = np.zeros((10, 3), np.int32)
    path = tmp_path / "t.vqvdb"
    write_single_grid(path, "d", indices, origins, num_embeddings=256)
    raw = path.read_bytes()
    (tmp_path / "trunc.vqvdb").write_bytes(raw[:-40])  # chop mid-chunk
    r = VqvdbReader(tmp_path / "trunc.vqvdb")
    r.next_grid_metadata()
    with pytest.raises(ValueError, match="truncated"):
        while r.has_next():
            r.next_batch(64)


def test_cross_grid_consistency_enforced(tmp_path, rng):
    path = tmp_path / "c.vqvdb"
    w = VqvdbWriter(path)
    w.start_grid(
        GridMetadata("a", num_embeddings=256, latent_shape=(4, 4, 4), total_blocks=0)
    )
    w.end_grid()
    with pytest.raises(ValueError, match="Inconsistent number of embeddings"):
        w.start_grid(
            GridMetadata("b", num_embeddings=128, latent_shape=(4, 4, 4), total_blocks=0)
        )
    with pytest.raises(ValueError, match="Inconsistent latent dimension"):
        w.start_grid(
            GridMetadata("b", num_embeddings=256, latent_shape=(4, 4), total_blocks=0)
        )
    w.close()


def test_block_count_mismatch_detected(tmp_path, rng):
    path = tmp_path / "bc.vqvdb"
    w = VqvdbWriter(path)
    w.start_grid(
        GridMetadata("a", num_embeddings=256, latent_shape=(4, 4, 4), total_blocks=5)
    )
    w.write_batch(
        np.zeros((3, 4, 4, 4), np.uint8), np.zeros((3, 3), np.int32)
    )
    with pytest.raises(ValueError, match="declared 5"):
        w.end_grid()
    # close() re-runs the consistency check for a still-open grid, so a
    # caller that skips end_grid() entirely still fails at write time
    # instead of producing a file that reads back as truncated.
    with pytest.raises(ValueError, match="declared 5"):
        w.close()


def test_close_without_end_grid_catches_mismatch(tmp_path):
    path = tmp_path / "bc2.vqvdb"
    w = VqvdbWriter(path)
    w.start_grid(
        GridMetadata("a", num_embeddings=256, latent_shape=(4, 4, 4), total_blocks=5)
    )
    w.write_batch(np.zeros((3, 4, 4, 4), np.uint8), np.zeros((3, 3), np.int32))
    with pytest.raises(ValueError, match="declared 5"):
        w.close()


def test_exit_after_exception_does_not_mask(tmp_path):
    """An exception inside the `with` body propagates, not the close check."""
    path = tmp_path / "bc3.vqvdb"
    with pytest.raises(KeyError):
        with VqvdbWriter(path) as w:
            w.start_grid(GridMetadata("a", num_embeddings=256,
                                      latent_shape=(4, 4, 4), total_blocks=5))
            raise KeyError("boom")


def test_writer_close_releases_handle_on_mismatch(tmp_path):
    """A close() that raises the declared-vs-written consistency error must
    still release the file handle (no fd leak, no re-raise on retry)."""
    import numpy as np

    from vqvdb_tpu.format.vqvdb import FormatError, VqvdbWriter

    path = tmp_path / "bad.vqvdb"
    w = VqvdbWriter(path)
    w.start_grid(GridMetadata("g", num_embeddings=256,
                              latent_shape=(4, 4, 4), total_blocks=5))
    w.write_batch(np.zeros((2, 4, 4, 4), np.uint8),
                  np.zeros((2, 3), np.int32))
    with pytest.raises(FormatError):
        w.close()
    assert w._f is None  # handle released despite the raise
    w.close()  # second close is a clean no-op


def test_v3_bytes_second_independent_derivation(tmp_path):
    """A second, from-the-spec-text derivation of v3 bytes (VERDICT r3
    item 9): this writer is built from docs/FORMATS.md alone — plain
    struct.pack, no shared code with VqvdbWriter (which is numpy-vectorized
    with deferred finalize) — and must produce the identical file. Guards
    the hand-derived golden fixtures with an independent construction."""
    import struct

    name = "density"
    k, latent = 256, (4, 4, 4)
    n = 5
    rng = np.random.default_rng(3)
    origins = (rng.integers(-64, 64, (n, 3)) * 8).astype(np.int32)
    indices = rng.integers(0, k, (n, 4, 4, 4)).astype(np.uint8)
    transform = np.diag([0.5, 0.5, 0.5, 1.0]).astype(np.float32)

    spec = b"VQVDB" + struct.pack("<BBIB", 3, 1, k, len(latent))
    nm = name.encode()
    spec += struct.pack("<I", len(nm)) + nm
    spec += struct.pack("<16f", *transform.reshape(-1))
    spec += struct.pack(f"<{len(latent)}H", *latent)
    spec += struct.pack("<I", n)
    for i in range(n):
        spec += struct.pack("<3i", *origins[i])
        spec += indices[i].tobytes()

    path = tmp_path / "spec.vqvdb"
    with VqvdbWriter(path, version=3) as w:
        w.start_grid(GridMetadata(name=name, num_embeddings=k,
                                  latent_shape=latent, total_blocks=n,
                                  transform=transform))
        w.write_batch(indices, origins)
        w.end_grid()
    assert path.read_bytes() == spec

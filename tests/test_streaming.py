"""Streaming decode: memory-bounded iteration over large scenes."""

import numpy as np

import jax

from vqvdb_tpu.core.config import CodecConfig, ModelConfig
from vqvdb_tpu.models import init_vqvae_params
from vqvdb_tpu.runtime.codec import VQCodec
from vqvdb_tpu.vdb.grid import LeafGrid

CFG = ModelConfig(embedding_dim=32, num_embeddings=64)


def _codec():
    params = init_vqvae_params(jax.random.key(0), CFG)
    return VQCodec(params, CFG, CodecConfig(batch_size=64, compute_dtype="float32"))


def test_decode_stream_matches_decompress(tmp_path, rng):
    codec = _codec()
    n = 333  # several batches + ragged tail
    grid = LeafGrid(
        "g",
        (np.arange(n * 3).reshape(n, 3) * 8).astype(np.int32),
        rng.random((n, 8, 8, 8), np.float32),
    )
    path = tmp_path / "s.vqvdb"
    codec.compress(grid, path)

    # Streamed pieces concatenate to exactly the materialized result.
    stream_leaves, stream_origins, batch_sizes = [], [], []
    for meta, leaves, origins in codec.decode_stream(path):
        assert meta.name == "g"
        stream_leaves.append(leaves)
        stream_origins.append(origins)
        batch_sizes.append(leaves.shape[0])
    assert max(batch_sizes) <= 64  # memory-bounded
    got_leaves = np.concatenate(stream_leaves)
    got_origins = np.concatenate(stream_origins)

    grids, _ = codec.decompress(path)
    np.testing.assert_array_equal(got_origins, grids[0].origins)
    np.testing.assert_allclose(got_leaves, grids[0].leaves, rtol=1e-6)
    np.testing.assert_array_equal(got_origins, grid.origins)


def test_decode_stream_multi_grid_boundaries(tmp_path, rng):
    codec = _codec()
    g1 = LeafGrid("a", (np.arange(30).reshape(10, 3) * 8).astype(np.int32),
                  rng.random((10, 8, 8, 8), np.float32))
    g2 = LeafGrid("b", (np.arange(300).reshape(100, 3) * 8).astype(np.int32),
                  rng.random((100, 8, 8, 8), np.float32))
    path = tmp_path / "m.vqvdb"
    codec.compress([g1, g2], path)

    per_grid = {}
    for meta, leaves, origins in codec.decode_stream(path):
        per_grid.setdefault(meta.name, 0)
        per_grid[meta.name] += leaves.shape[0]
    assert per_grid == {"a": 10, "b": 100}

def _lattice(n):
    """n origins on a compact 8-voxel lattice (so bboxes select subsets)."""
    side = int(np.ceil(n ** (1 / 3)))
    return (np.stack(np.unravel_index(np.arange(n), (side,) * 3), 1)
            * 8).astype(np.int32)


def test_selective_decode_by_grid_name(tmp_path, rng):
    codec = _codec()
    g1 = LeafGrid("density", _lattice(40), rng.random((40, 8, 8, 8), np.float32))
    g2 = LeafGrid("temperature", _lattice(25), rng.random((25, 8, 8, 8), np.float32))
    path = tmp_path / "sel.vqvdb"
    codec.compress([g1, g2], path)

    full, _ = codec.decompress(path)
    only, _ = codec.decompress(path, grids="temperature")
    assert [g.name for g in only] == ["temperature"]
    ref = next(g for g in full if g.name == "temperature")
    np.testing.assert_array_equal(only[0].origins, ref.origins)
    np.testing.assert_array_equal(only[0].leaves, ref.leaves)

    both, _ = codec.decompress(path, grids={"density", "temperature"})
    assert [g.name for g in both] == ["density", "temperature"]


def test_selective_decode_by_bbox(tmp_path, rng):
    """bbox selection is bit-identical to mask-filtering a full decode,
    including selections that straddle device-batch boundaries (batch 64,
    carry repacking)."""
    codec = _codec()
    n = 200
    origins = _lattice(n)
    grid = LeafGrid("g", origins, rng.random((n, 8, 8, 8), np.float32))
    path = tmp_path / "bbox.vqvdb"
    codec.compress(grid, path)
    full, _ = codec.decompress(path)

    lo, hi = np.array([4, 0, 0]), np.array([20, 40, 40])
    got, _ = codec.decompress(path, bbox=(lo, hi))
    keep = (np.all(origins < hi, axis=1)
            & np.all(origins + 8 > lo, axis=1))
    assert keep.sum() not in (0, n)  # a real subset
    np.testing.assert_array_equal(got[0].origins, origins[keep])
    np.testing.assert_array_equal(got[0].leaves, full[0].leaves[keep])

    # Empty selection: the grid is omitted entirely (documented semantics).
    none, _ = codec.decompress(path, bbox=((10_000,) * 3, (10_008,) * 3))
    assert none == []


def test_selective_decode_v5_and_stream(tmp_path, rng):
    """Name skip + bbox on a v5 (compressed-payload) file, via the
    streaming API."""
    codec = _codec()
    g1 = LeafGrid("a", _lattice(70), rng.random((70, 8, 8, 8), np.float32))
    g2 = LeafGrid("b", _lattice(90), rng.random((90, 8, 8, 8), np.float32))
    path = tmp_path / "sel5.vqvdb"
    codec.compress([g1, g2], path, format_version=5)

    full = {}
    for meta, leaves, origins in codec.decode_stream(path):
        full.setdefault(meta.name, []).append((leaves, origins))

    lo, hi = (0, 0, 0), (16, 16, 16)
    sel_leaves, sel_origins = [], []
    for meta, leaves, origins in codec.decode_stream(path, grids="b",
                                                     bbox=(lo, hi)):
        assert meta.name == "b"
        sel_leaves.append(leaves)
        sel_origins.append(origins)
    got_o = np.concatenate(sel_origins)
    ref_l = np.concatenate([x[0] for x in full["b"]])
    ref_o = np.concatenate([x[1] for x in full["b"]])
    keep = (np.all(ref_o < np.asarray(hi), axis=1)
            & np.all(ref_o + 8 > np.asarray(lo), axis=1))
    np.testing.assert_array_equal(got_o, ref_o[keep])
    np.testing.assert_array_equal(np.concatenate(sel_leaves), ref_l[keep])

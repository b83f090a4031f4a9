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

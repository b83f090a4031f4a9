"""Vec3 pipeline end-to-end + format capacity limits."""

import numpy as np
import pytest

import jax

from vqvdb_tpu.core.config import CodecConfig, ModelConfig
from vqvdb_tpu.models import init_vqvae_params
from vqvdb_tpu.runtime.codec import VQCodec
from vqvdb_tpu.train.synthetic import velocity_grid
from vqvdb_tpu.vdb.grid import LeafGrid


def test_vec3_file_roundtrip(tmp_path):
    """3-channel velocity grid through the full codec + container."""
    cfg = ModelConfig(in_channels=3, embedding_dim=64, num_embeddings=256)
    params = init_vqvae_params(jax.random.key(0), cfg)
    codec = VQCodec(params, cfg, CodecConfig(batch_size=16, compute_dtype="float32"))

    grid = velocity_grid(24, seed=3)
    assert grid.channels == 3
    path = tmp_path / "vel.vqvdb"
    stats = codec.compress(grid, path)
    assert stats["leaves"] == grid.num_leaves

    grids, _ = codec.decompress(path)
    (g2,) = grids
    assert g2.leaves.shape == grid.leaves.shape
    np.testing.assert_array_equal(g2.origins, grid.origins)
    # tanh head: outputs within [-1, 1]
    assert g2.leaves.min() >= -1.0 and g2.leaves.max() <= 1.0


def test_large_codebook_uses_v4(tmp_path, rng):
    """The vec3 notebook's 4096-code config cannot round-trip the v3 file
    (uint8 index ceiling); the codec auto-upgrades to our v4 extension
    (u16 indices) and round-trips exactly."""
    cfg = ModelConfig(in_channels=3, embedding_dim=16, num_embeddings=512)
    params = init_vqvae_params(jax.random.key(0), cfg)
    codec = VQCodec(params, cfg, CodecConfig(batch_size=8, compute_dtype="float32"))
    grid = LeafGrid("v", (np.arange(15).reshape(5, 3) * 8).astype(np.int32),
                    rng.random((5, 8, 8, 8, 3), np.float32))
    path = tmp_path / "x.vqvdb"
    codec.compress(grid, path)

    from vqvdb_tpu.format.vqvdb import VqvdbReader
    with VqvdbReader(path) as r:
        assert r.version == 4
        meta, idx, org = r.read_grid()
        assert idx.dtype == np.uint16
        assert meta.chunk_size == 12 + 64 * 2
    # decode path consumes u16 indices
    grids, _ = codec.decompress(path)
    np.testing.assert_array_equal(grids[0].origins, grid.origins)

    # explicit v3 request with a big codebook must fail loudly
    with pytest.raises(ValueError, match="requires"):
        codec.compress(grid, tmp_path / "y.vqvdb", format_version=3)


def test_large_codebook_array_level_still_works():
    """Array-level encode with K>256 uses uint16 indices (future v4)."""
    cfg = ModelConfig(in_channels=1, embedding_dim=16, num_embeddings=512)
    assert cfg.index_dtype == np.uint16 or str(cfg.index_dtype) == "uint16"

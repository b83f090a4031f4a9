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


def test_large_codebook_rejected_for_v3_files(tmp_path):
    """The vec3 notebook's 4096-code config cannot round-trip the v3 file
    (uint8 index ceiling) — must fail loudly, not truncate."""
    cfg = ModelConfig(in_channels=3, embedding_dim=16, num_embeddings=512)
    params = init_vqvae_params(jax.random.key(0), cfg)
    codec = VQCodec(params, cfg, CodecConfig(batch_size=8, compute_dtype="float32"))
    grid = LeafGrid("v", np.zeros((1, 3), np.int32),
                    np.zeros((1, 8, 8, 8, 3), np.float32))
    with pytest.raises(ValueError, match="uint8 index capacity"):
        codec.compress(grid, tmp_path / "x.vqvdb")


def test_large_codebook_array_level_still_works():
    """Array-level encode with K>256 uses uint16 indices (future v4)."""
    cfg = ModelConfig(in_channels=1, embedding_dim=16, num_embeddings=512)
    assert cfg.index_dtype == np.uint16 or str(cfg.index_dtype) == "uint16"

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


def test_notebook_vec3_4096_codes_roundtrip(tmp_path, rng):
    """The reference's vec3 notebook config (4096 codes, D=64 — which its
    C++ runtime could not serve at all) round-trips our v4 container."""
    cfg = ModelConfig(in_channels=3, embedding_dim=64, num_embeddings=4096)
    assert str(np.dtype(cfg.index_dtype)) == "uint16"
    params = init_vqvae_params(jax.random.key(5), cfg)
    codec = VQCodec(params, cfg, CodecConfig(batch_size=8, compute_dtype="float32"))
    assert codec.check_latent_shape() == (4, 4, 4)

    grid = LeafGrid("vel", (np.arange(30).reshape(10, 3) * 8).astype(np.int32),
                    rng.random((10, 8, 8, 8, 3), np.float32) * 2 - 1)
    path = tmp_path / "vel4096.vqvdb"
    stats = codec.compress(grid, path)
    assert stats["leaves"] == 10

    from vqvdb_tpu.format.vqvdb import VqvdbReader
    with VqvdbReader(path) as r:
        assert r.version == 4 and r.num_embeddings == 4096

    grids, _ = codec.decompress(path)
    np.testing.assert_array_equal(grids[0].origins, grid.origins)
    # indices actually use the >255 range given a 4096-entry codebook
    idx = codec.encode_leaves(grid.leaves)
    assert idx.dtype == np.uint16

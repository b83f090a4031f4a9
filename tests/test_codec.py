"""End-to-end codec tests: grid -> .vqvdb -> grid round trips, artifacts."""

import numpy as np
import pytest

import jax

from vqvdb_tpu import api
from vqvdb_tpu.core.artifact import load_model, save_model
from vqvdb_tpu.core.config import CodecConfig, ModelConfig
from vqvdb_tpu.format.vqvdb import VqvdbReader
from vqvdb_tpu.models import init_vqvae_params
from vqvdb_tpu.runtime.codec import VQCodec
from vqvdb_tpu.vdb.grid import LeafGrid


CFG = ModelConfig()


@pytest.fixture(scope="module")
def small_codec():
    params = init_vqvae_params(jax.random.key(0), CFG)
    # f32 compute on CPU; small batch to exercise multi-batch streaming.
    return VQCodec(params, CFG, CodecConfig(batch_size=16, compute_dtype="float32"))


def _grid(rng, n=37, name="density"):
    leaves = rng.random((n, 8, 8, 8), np.float32)
    origins = (np.arange(n * 3).reshape(n, 3) * 8).astype(np.int32)
    return LeafGrid(name, origins, leaves)


def test_latent_shape_probe(small_codec):
    assert small_codec.check_latent_shape() == (4, 4, 4)


def test_encode_decode_array_roundtrip_is_idempotent(small_codec, rng):
    """decode(encode(x)) re-encoded must give identical indices — the codec
    is a projection: quantize(project(x)) is stable on its own output."""
    leaves = rng.random((20, 8, 8, 8), np.float32)
    idx = small_codec.encode_leaves(leaves)
    assert idx.shape == (20, 4, 4, 4) and idx.dtype == np.uint8
    rec = small_codec.decode_indices(idx)
    assert rec.shape == (20, 8, 8, 8, 1)
    # determinism across calls (also exercises the padded ragged tail)
    np.testing.assert_array_equal(small_codec.encode_leaves(leaves), idx)


def test_file_roundtrip_preserves_structure(tmp_path, small_codec, rng):
    g = _grid(rng)
    path = tmp_path / "out.vqvdb"
    stats = small_codec.compress(g, path)
    assert stats["leaves"] == g.num_leaves
    assert stats["bytes"] == path.stat().st_size

    # File is readable by the raw format layer with correct metadata.
    with VqvdbReader(path) as r:
        assert r.num_grids == 1 and r.num_embeddings == 256
        meta, idx, org = r.read_grid()
        assert meta.name == "density"
        assert meta.total_blocks == g.num_leaves
        np.testing.assert_array_equal(org, g.origins)

    grids, dstats = small_codec.decompress(path)
    assert dstats["leaves"] == g.num_leaves
    (g2,) = grids
    assert g2.name == g.name
    np.testing.assert_array_equal(g2.origins, g.origins)
    assert g2.leaves.shape == g.leaves.shape

    # Decoded leaves == direct decode of the encoded indices.
    direct = small_codec.decode_indices(small_codec.encode_leaves(g.leaves))
    np.testing.assert_allclose(g2.leaves, direct, rtol=1e-5, atol=1e-6)


def test_multi_grid_file(tmp_path, small_codec, rng):
    g1, g2 = _grid(rng, 10, "a"), _grid(rng, 33, "b")
    path = tmp_path / "multi.vqvdb"
    small_codec.compress([g1, g2], path)
    grids, _ = small_codec.decompress(path)
    assert [g.name for g in grids] == ["a", "b"]
    assert [g.num_leaves for g in grids] == [10, 33]


def test_mismatched_model_rejected(tmp_path, small_codec, rng):
    path = tmp_path / "x.vqvdb"
    small_codec.compress(_grid(rng, 5), path)
    other_cfg = ModelConfig(num_embeddings=128)
    other = VQCodec(init_vqvae_params(jax.random.key(1), other_cfg), other_cfg,
                    CodecConfig(batch_size=8, compute_dtype="float32"))
    with pytest.raises(ValueError, match="embeddings"):
        other.decompress(path)


def test_model_artifact_roundtrip(tmp_path):
    params = init_vqvae_params(jax.random.key(7), CFG)
    p = tmp_path / "m.vqmodel"
    save_model(p, params, CFG)
    params2, cfg2 = load_model(p)
    assert cfg2 == CFG
    np.testing.assert_array_equal(np.asarray(params2.vq.embedding),
                                  np.asarray(params.vq.embedding))
    leaves = np.random.default_rng(0).random((4, 8, 8, 8), np.float32)
    c1 = VQCodec(params, CFG, CodecConfig(batch_size=4, compute_dtype="float32"))
    c2 = VQCodec(params2, cfg2, CodecConfig(batch_size=4, compute_dtype="float32"))
    np.testing.assert_array_equal(c1.encode_leaves(leaves), c2.encode_leaves(leaves))


def test_load_model_config_only(tmp_path):
    """load_model_config reads the ModelConfig without touching the params
    blob (bench.py/__graft_entry__ sniff encoder_arch this way)."""
    from vqvdb_tpu.core.artifact import load_model_config
    from vqvdb_tpu.utils.errors import ArtifactError

    cfg = ModelConfig(encoder_arch="packed")
    params = init_vqvae_params(jax.random.key(7), cfg)
    p = tmp_path / "m.vqmodel"
    save_model(p, params, cfg)
    assert load_model_config(p) == cfg

    # Works even when the params blob is truncated — it never reads it.
    data = p.read_bytes()
    (tmp_path / "trunc.vqmodel").write_bytes(data[: len(data) // 2])
    assert load_model_config(tmp_path / "trunc.vqmodel") == cfg

    (tmp_path / "bad.bin").write_bytes(b"NOTMODEL" + b"\0" * 64)
    with pytest.raises(ArtifactError):
        load_model_config(tmp_path / "bad.bin")


def test_api_surface(tmp_path, rng):
    """SOP-equivalent surface: model artifact path in, files in/out,
    name filter."""
    params = init_vqvae_params(jax.random.key(9), CFG)
    model_path = tmp_path / "m.vqmodel"
    save_model(model_path, params, CFG)

    g1, g2 = _grid(rng, 6, "density"), _grid(rng, 4, "temperature")
    out = tmp_path / "scene.vqvdb"
    api.encode([g1, g2], model_path, out, batch_size=8, name_filter="density")
    grids, _ = api.decode(out, model_path, batch_size=8)
    assert len(grids) == 1 and grids[0].name == "density"

    with pytest.raises(ValueError, match="no grid named"):
        api.encode([g1], model_path, out, name_filter="nope")

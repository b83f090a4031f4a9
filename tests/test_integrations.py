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


def test_houdini_cook_requires_source():
    with pytest.raises(ValueError, match="grids"):
        cook_encoder(outputpath="x.vqvdb", model="m")


def test_multi_host_single_process():
    info = init_multi_host()  # no-op on one process
    assert info["process_count"] == 1
    assert info["process_index"] == 0
    assert local_batch_slice(64) == slice(0, 64)

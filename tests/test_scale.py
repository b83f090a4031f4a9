"""Scale test: large-scene streaming stays memory-bounded and correct."""

import numpy as np
import pytest

import jax

from vqvdb_tpu.core.config import CodecConfig, ModelConfig
from vqvdb_tpu.format.vqvdb import GridMetadata, VqvdbReader, VqvdbWriter
from vqvdb_tpu.models import init_vqvae_params
from vqvdb_tpu.runtime.codec import VQCodec


@pytest.mark.slow
def test_100k_leaf_stream_decode(tmp_path, rng):
    """40k-leaf scene: write the container directly (indices only — no
    encode cost), then stream-decode and verify counts/origins without ever
    materializing the full grid."""
    cfg = ModelConfig(embedding_dim=32, num_embeddings=64)
    codec = VQCodec(init_vqvae_params(jax.random.key(0), cfg), cfg,
                    CodecConfig(batch_size=2048, compute_dtype="float32"))

    n = 40_000
    path = tmp_path / "big.vqvdb"
    with VqvdbWriter(path) as w:
        w.start_grid(GridMetadata("big", num_embeddings=64,
                                  latent_shape=(4, 4, 4), total_blocks=n))
        # stream-write in slabs to keep the test itself memory-bounded
        for s in range(0, n, 10_000):
            m = min(10_000, n - s)
            idx = rng.integers(0, 64, (m, 4, 4, 4), dtype=np.uint8)
            org = np.stack([np.arange(s, s + m) * 8,
                            np.zeros(m, np.int64),
                            np.zeros(m, np.int64)], axis=1).astype(np.int32)
            w.write_batch(idx, org)
        w.end_grid()
    assert path.stat().st_size == 12 + (4 + 3) + 64 + 6 + 4 + n * 76

    seen = 0
    max_batch = 0
    next_expected_x = 0
    for meta, leaves, origins in codec.decode_stream(path):
        assert leaves.shape[1:] == (8, 8, 8, 1)
        max_batch = max(max_batch, leaves.shape[0])
        # origins arrive in file order
        assert origins[0, 0] == next_expected_x
        next_expected_x = origins[-1, 0] + 8
        seen += leaves.shape[0]
    assert seen == n
    assert max_batch <= 2048  # memory-bounded


@pytest.mark.slow
def test_reader_handles_many_grids(tmp_path, rng):
    """255 grids (the u8 numGrids ceiling) round-trip."""
    path = tmp_path / "many.vqvdb"
    with VqvdbWriter(path) as w:
        for g in range(255):
            w.start_grid(GridMetadata(f"g{g}", num_embeddings=64,
                                      latent_shape=(4, 4, 4), total_blocks=1))
            w.write_batch(rng.integers(0, 64, (1, 4, 4, 4), dtype=np.uint8),
                          np.array([[g * 8, 0, 0]], np.int32))
            w.end_grid()
    with VqvdbReader(path) as r:
        assert r.num_grids == 255
        names = []
        while r.has_next_grid():
            meta, idx, org = r.read_grid()
            names.append(meta.name)
        assert names == [f"g{g}" for g in range(255)]

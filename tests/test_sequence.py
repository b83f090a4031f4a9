"""Animated sequence encode/decode: per-frame files, reused compiled codec."""

import numpy as np

import jax

from vqvdb_tpu import api
from vqvdb_tpu.core.config import CodecConfig, ModelConfig
from vqvdb_tpu.models import init_vqvae_params
from vqvdb_tpu.runtime.codec import VQCodec
from vqvdb_tpu.train.synthetic import smoke_grid


def test_sequence_roundtrip(tmp_path):
    cfg = ModelConfig(embedding_dim=32, num_embeddings=64)
    codec = VQCodec(init_vqvae_params(jax.random.key(0), cfg), cfg,
                    CodecConfig(batch_size=32, compute_dtype="float32"))

    frames = [smoke_grid(24, seed=10 + i) for i in range(4)]
    stats = api.encode_sequence(frames, codec, tmp_path / "seq")
    assert stats["frames"] == 4
    assert stats["leaves"] == sum(f.num_leaves for f in frames)
    assert len(list((tmp_path / "seq").glob("frame_*.vqvdb"))) == 4
    # steady-state frames should not be slower than the first (compile reuse)
    assert min(stats["seconds_per_frame"]) <= stats["seconds_per_frame"][0] * 1.5

    decoded, dstats = api.decode_sequence(tmp_path / "seq", codec)
    assert dstats["frames"] == 4
    for frame, orig in zip(decoded, frames):
        assert frame[0].num_leaves == orig.num_leaves
        np.testing.assert_array_equal(frame[0].origins, orig.origins)

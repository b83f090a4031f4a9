"""Fused projection+quantize scoring: equivalence with the unfused path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqvdb_tpu.core.config import CodecConfig, ModelConfig
from vqvdb_tpu.models import init_vqvae_params
from vqvdb_tpu.models.quantizer import nearest_indices
from vqvdb_tpu.models.vqvae import encoder_apply, encoder_features
from vqvdb_tpu.models import blocks
from vqvdb_tpu.ops.quantize import (
    fold_proj_into_scores,
    fused_score_argmin,
    score_argmin_xla,
)
from vqvdb_tpu.runtime.codec import VQCodec


@pytest.mark.parametrize("cfg", [ModelConfig(embedding_dim=32, num_embeddings=64),
                                 ModelConfig(in_channels=3, embedding_dim=64)],
                         ids=["scalar-small", "vec3"])
def test_scores_match_distance_argmin(rng, cfg):
    params = init_vqvae_params(jax.random.key(0), cfg)
    x = jnp.asarray(rng.random((6, 8, 8, 8, cfg.in_channels), dtype=np.float32))

    # reference path: proj then distance argmin
    z = encoder_apply(params.encoder, x, cfg)
    ref_idx = np.asarray(nearest_indices(
        z.reshape(-1, cfg.embedding_dim), params.vq.embedding))

    # fused path
    h = encoder_features(params.encoder, x, cfg)
    m, c = fold_proj_into_scores(np.asarray(params.encoder["proj"]["w"]),
                                 np.asarray(params.encoder["proj"]["b"]),
                                 np.asarray(params.vq.embedding))
    flat_h = h.reshape(-1, h.shape[-1])
    got_xla = np.asarray(score_argmin_xla(flat_h, m, c))
    got_pallas = np.asarray(fused_score_argmin(flat_h, m, c, tile_n=128))

    # identical up to fp reassociation; on random init all assignments agree
    assert (got_xla == ref_idx).mean() > 0.999
    np.testing.assert_array_equal(got_pallas, got_xla)


def test_encoder_apply_equals_features_plus_proj(rng):
    cfg = ModelConfig(embedding_dim=32, num_embeddings=64)
    params = init_vqvae_params(jax.random.key(1), cfg)
    x = jnp.asarray(rng.random((3, 8, 8, 8, 1), dtype=np.float32))
    z1 = encoder_apply(params.encoder, x, cfg)
    z2 = blocks.conv3d(params.encoder["proj"],
                       encoder_features(params.encoder, x, cfg))
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=1e-6)


def test_codec_encode_unchanged_by_fusion(rng):
    cfg = ModelConfig(embedding_dim=32, num_embeddings=64)
    params = init_vqvae_params(jax.random.key(2), cfg)
    leaves = rng.random((25, 8, 8, 8), dtype=np.float32)
    on = VQCodec(params, cfg, CodecConfig(batch_size=16, compute_dtype="float32",
                                          fuse_proj_quantize=True))
    off = VQCodec(params, cfg, CodecConfig(batch_size=16, compute_dtype="float32",
                                           fuse_proj_quantize=False))
    a, b = on.encode_leaves(leaves), off.encode_leaves(leaves)
    assert (a == b).mean() > 0.999  # fp reassociation may flip exact ties
    # decoded quality identical in practice
    ra, rb = on.decode_indices(a), off.decode_indices(b)
    np.testing.assert_allclose(ra, rb, atol=5e-3)


def test_codec_encode_unchanged_by_packed_down(rng):
    cfg = ModelConfig(embedding_dim=32, num_embeddings=64)
    params = init_vqvae_params(jax.random.key(3), cfg)
    leaves = rng.random((25, 8, 8, 8), dtype=np.float32)
    on = VQCodec(params, cfg, CodecConfig(batch_size=16, compute_dtype="float32",
                                          pack_down_conv=True))
    off = VQCodec(params, cfg, CodecConfig(batch_size=16, compute_dtype="float32",
                                           pack_down_conv=False))
    a, b = on.encode_leaves(leaves), off.encode_leaves(leaves)
    assert (a == b).mean() > 0.999


def test_packed_down_vec3(rng):
    from vqvdb_tpu.models.vqvae import encoder_features_packed_down
    from vqvdb_tpu.ops.packed import fold_strided_conv

    cfg = ModelConfig(in_channels=3, embedding_dim=64)
    params = init_vqvae_params(jax.random.key(4), cfg)
    folded = fold_strided_conv(np.asarray(params.encoder["down"]["w"]),
                               np.asarray(params.encoder["down"]["b"]))
    x = jnp.asarray(rng.random((2, 8, 8, 8, 3), dtype=np.float32))
    ref = np.asarray(encoder_features(params.encoder, x, cfg))
    got = np.asarray(encoder_features_packed_down(params.encoder, folded, x, cfg))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

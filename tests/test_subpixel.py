"""Subpixel folding of the decoder's final conv: exact-identity tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqvdb_tpu.core.config import CodecConfig, ModelConfig
from vqvdb_tpu.models import blocks, init_vqvae_params
from vqvdb_tpu.models.vqvae import (
    decoder_apply,
    decoder_tail,
    decoder_tail_folded,
    decoder_trunk,
)
from vqvdb_tpu.ops.subpixel import fold_final_conv
from vqvdb_tpu.runtime.codec import VQCodec


@pytest.mark.parametrize("cout", [1, 3])
def test_folded_tail_matches_reference_tail(rng, cout):
    """shuffle->conv == folded-conv->shuffle on random data, all borders."""
    b, cin = 3, 32
    h = jnp.asarray(rng.standard_normal((b, 4, 4, 4, cin * 8)).astype(np.float32))
    w = rng.standard_normal((3, 3, 3, cin, cout)).astype(np.float32) * 0.3
    bias = rng.standard_normal(cout).astype(np.float32)

    ref = blocks.conv3d({"w": jnp.asarray(w), "b": jnp.asarray(bias)},
                        blocks.pixel_shuffle_3d(h, 2), padding=1)
    folded = fold_final_conv(w, bias)
    got = blocks.pixel_shuffle_3d(blocks.conv3d(folded, h, padding=1), 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("cfg", [ModelConfig(),
                                 ModelConfig(in_channels=3, embedding_dim=64)],
                         ids=["scalar", "vec3"])
def test_decoder_tails_agree(rng, cfg):
    params = init_vqvae_params(jax.random.key(0), cfg)
    z = jnp.asarray(rng.standard_normal((2, 4, 4, 4, cfg.embedding_dim))
                    .astype(np.float32))
    h = decoder_trunk(params.decoder, z, cfg)
    ref = decoder_tail(params.decoder, h, cfg)
    folded = fold_final_conv(np.asarray(params.decoder["final"]["w"]),
                             np.asarray(params.decoder["final"]["b"]))
    got = decoder_tail_folded(folded, h, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    # and the whole decoder_apply equals trunk+tail
    np.testing.assert_allclose(np.asarray(decoder_apply(params.decoder, z, cfg)),
                               np.asarray(ref), rtol=1e-6, atol=1e-7)


def test_codec_decode_unchanged_by_folding(rng):
    """All three decoder tails (plain convs / folded final conv / collapsed
    tail GEMM) produce the same reconstructions."""
    cfg = ModelConfig(embedding_dim=32, num_embeddings=64)
    params = init_vqvae_params(jax.random.key(1), cfg)
    idx = rng.integers(0, 64, (10, 4, 4, 4)).astype(np.uint8)
    plain = VQCodec(params, cfg, CodecConfig(
        batch_size=16, compute_dtype="float32",
        fuse_decoder_tail=False, fuse_final_conv=False))
    folded = VQCodec(params, cfg, CodecConfig(
        batch_size=16, compute_dtype="float32",
        fuse_decoder_tail=False, fuse_final_conv=True))
    tail = VQCodec(params, cfg, CodecConfig(
        batch_size=16, compute_dtype="float32", fuse_decoder_tail=True))
    ref = plain.decode_indices(idx)
    np.testing.assert_allclose(folded.decode_indices(idx), ref,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(tail.decode_indices(idx), ref,
                               rtol=1e-4, atol=1e-5)

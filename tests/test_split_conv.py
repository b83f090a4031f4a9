"""Split-K conv rewrite: exactness and codec-path equivalence.

blocks.conv3d(split_in=N) computes a conv as a sum over input-channel
slabs — linear in channels, so exact up to fp reassociation. Measured 2x on
v5e for the >64-input convs (benchmarks/experiment_stem.py); these tests
pin the numerics so the speedup can never drift the results.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqvdb_tpu.core.config import CodecConfig, ModelConfig
from vqvdb_tpu.models import blocks
from vqvdb_tpu.models.vqvae import init_vqvae_params
from vqvdb_tpu.runtime.codec import VQCodec


@pytest.mark.parametrize("cin,cout,split", [(128, 64, 64), (128, 32, 32),
                                            (96, 16, 64)])
def test_split_conv_matches_full_f32(cin, cout, split):
    key = jax.random.key(0)
    p = blocks.init_conv3d(key, cin, cout, 3)
    x = jax.random.normal(jax.random.key(1), (4, 4, 4, 4, cin), jnp.float32)
    full = blocks.conv3d(p, x, padding=1)
    part = blocks.conv3d(p, x, padding=1, split_in=split)
    np.testing.assert_allclose(np.asarray(part), np.asarray(full),
                               atol=1e-5, rtol=1e-5)


def test_split_conv_strided():
    p = blocks.init_conv3d(jax.random.key(0), 128, 32, 4)
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 8, 128), jnp.float32)
    full = blocks.conv3d(p, x, stride=2, padding=1)
    part = blocks.conv3d(p, x, stride=2, padding=1, split_in=64)
    np.testing.assert_allclose(np.asarray(part), np.asarray(full),
                               atol=1e-5, rtol=1e-5)


def test_split_conv_noop_below_threshold():
    p = blocks.init_conv3d(jax.random.key(0), 64, 64, 3)
    x = jax.random.normal(jax.random.key(1), (2, 4, 4, 4, 64), jnp.float32)
    full = blocks.conv3d(p, x, padding=1)
    part = blocks.conv3d(p, x, padding=1, split_in=64)
    np.testing.assert_array_equal(np.asarray(part), np.asarray(full))


@pytest.mark.parametrize("variant", ["scalar", "vec3"])
def test_codec_split_vs_unsplit(variant):
    """Full codec round trip: the split option must reproduce the unsplit
    graph — indices identical at f32 (no near-ties with random params),
    reconstructions within reassociation tolerance. (The option is default
    OFF per the in-context A/B, benchmarks/ab_split_r2.json; this pins its
    correctness for graph contexts where it wins.)"""
    mcfg = ModelConfig() if variant == "scalar" else ModelConfig(
        in_channels=3, embedding_dim=64)
    params = init_vqvae_params(jax.random.key(0), mcfg)
    rng = np.random.default_rng(0)
    leaves = rng.random((32, 8, 8, 8, mcfg.in_channels), np.float32)

    base = CodecConfig(batch_size=32, compute_dtype="float32",
                       split_conv_in=0)
    split = CodecConfig(batch_size=32, compute_dtype="float32",
                        split_conv_in=64)
    c0 = VQCodec(params, mcfg, base)
    c1 = VQCodec(params, mcfg, split)
    idx0 = c0.encode_leaves(leaves)
    idx1 = c1.encode_leaves(leaves)
    np.testing.assert_array_equal(idx0, idx1)
    r0 = c0.decode_indices(idx0)
    r1 = c1.decode_indices(idx0)
    np.testing.assert_allclose(r1, r0, atol=1e-5, rtol=1e-5)

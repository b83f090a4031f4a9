"""Fused residual-block kernel vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqvdb_tpu.models import blocks
from vqvdb_tpu.ops.fused_rb import banded_weights, residual_block_fused


@pytest.fixture
def rb_params(rng):
    return blocks.init_residual_block(jax.random.key(7), 16)


def test_banded_weights_reproduce_conv(rng):
    """The 9 banded tap matrices applied by hand == lax 3^3 conv."""
    params = blocks.init_conv3d(jax.random.key(1), 16, 16, 3)
    x = jnp.asarray(rng.random((5, 8, 8, 8, 16), np.float32))
    want = blocks.conv3d(params, x, stride=1, padding=1)

    wb = np.asarray(banded_weights(params["w"]))
    xr = np.asarray(x).reshape(5, 64, 128)
    acc = np.zeros((5, 64, 128), np.float32)
    for k in range(9):
        a, b = k // 3, k % 3
        s = (a - 1) * 8 + (b - 1)
        shifted = np.roll(xr, -s, axis=1)
        r = np.arange(64)
        ok = ((r // 8 + a - 1 >= 0) & (r // 8 + a - 1 < 8)
              & (r % 8 + b - 1 >= 0) & (r % 8 + b - 1 < 8))
        shifted = shifted * ok[None, :, None]
        acc += shifted @ wb[k]
    acc += np.tile(np.asarray(params["b"]), 8)
    np.testing.assert_allclose(acc.reshape(5, 8, 8, 8, 16),
                               np.asarray(want), atol=1e-4, rtol=1e-4)


def test_fused_rb_matches_oracle_f32(rng, rb_params):
    x = jnp.asarray(rng.standard_normal((37, 8, 8, 8, 16)).astype(np.float32))
    want = blocks.residual_block(rb_params, x, groups=8)
    got = residual_block_fused(rb_params, x, groups=8, tile=16,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_fused_rb_matches_oracle_bf16(rng, rb_params):
    x = jnp.asarray(rng.standard_normal((32, 8, 8, 8, 16))).astype(jnp.bfloat16)
    want = blocks.residual_block(rb_params, x, groups=8)
    got = residual_block_fused(rb_params, x, groups=8, tile=32,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_fused_rb_groups4(rng):
    """The encoder's pre-GN group count (4) also works."""
    params = blocks.init_residual_block(jax.random.key(9), 16)
    x = jnp.asarray(rng.random((8, 8, 8, 8, 16), np.float32))
    want = blocks.residual_block(params, x, groups=4)
    got = residual_block_fused(params, x, groups=4, tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

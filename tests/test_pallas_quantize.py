"""Pallas fused quantizer kernels vs the pure-XLA oracle.

On CPU these run in interpreter mode; on TPU the same code compiles via
Mosaic. The XLA twin (models/quantizer.py) is the correctness oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqvdb_tpu.models import quantizer as vq
from vqvdb_tpu.ops.quantize import fused_dequantize, fused_nearest_indices


@pytest.mark.parametrize("n", [64, 128, 1000, 4096])
def test_fused_nearest_matches_xla(rng, n):
    d, k = 128, 256
    z = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    cb = jnp.asarray(rng.standard_normal((k, d)).astype(np.float32))
    ref = np.asarray(vq.nearest_indices(z, cb))
    got = np.asarray(fused_nearest_indices(z, cb, tile_n=256))
    np.testing.assert_array_equal(got, ref)


def test_fused_nearest_tie_breaking(rng):
    d, k = 16, 32
    cb = rng.standard_normal((k, d)).astype(np.float32)
    cb[20] = cb[3]  # exact duplicate rows -> tie
    z = np.concatenate([cb[3][None], rng.standard_normal((127, d)).astype(np.float32)])
    ref = np.asarray(vq.nearest_indices(jnp.asarray(z), jnp.asarray(cb)))
    got = np.asarray(fused_nearest_indices(jnp.asarray(z), jnp.asarray(cb), tile_n=128))
    np.testing.assert_array_equal(got, ref)
    assert got[0] == 3  # first-minimum wins


@pytest.mark.parametrize("n", [128, 555, 2048])
def test_fused_dequantize_matches_lookup(rng, n):
    d, k = 128, 256
    cb = jnp.asarray(rng.standard_normal((k, d)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, k, size=(n,)).astype(np.int32))
    ref = np.asarray(cb)[np.asarray(idx)]
    got = np.asarray(fused_dequantize(idx, cb, tile_n=256))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_fused_nearest_uint8_range(rng):
    """End-use contract: indices must be expressible as uint8 for K<=256."""
    d, k = 128, 256
    z = jnp.asarray(rng.standard_normal((512, d)).astype(np.float32))
    cb = jnp.asarray(rng.standard_normal((k, d)).astype(np.float32))
    got = np.asarray(fused_nearest_indices(z, cb, tile_n=256))
    assert got.min() >= 0 and got.max() < 256

"""Model-level tests: shapes, round-trip identities, train-vs-inference parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqvdb_tpu.core.config import ModelConfig
from vqvdb_tpu.models import (
    decode_from_indices,
    encode_to_indices,
    init_vqvae_params,
    vqvae_forward,
)
from vqvdb_tpu.models.quantizer import reset_dead_codes, VQState


SCALAR = ModelConfig()
VEC3 = ModelConfig(in_channels=3, embedding_dim=64, num_embeddings=256)


@pytest.mark.parametrize("cfg", [SCALAR, VEC3], ids=["scalar", "vec3"])
def test_shapes_and_dtypes(rng, cfg):
    params = init_vqvae_params(jax.random.key(0), cfg)
    x = jnp.asarray(rng.random((4, 8, 8, 8, cfg.in_channels), dtype=np.float32))

    idx = encode_to_indices(params, x, cfg)
    assert idx.shape == (4, 4, 4, 4)
    assert idx.dtype == jnp.uint8

    recon = decode_from_indices(params, idx, cfg)
    assert recon.shape == x.shape
    assert recon.dtype == jnp.float32
    r = np.asarray(recon)
    if cfg.variant == "scalar":
        assert (r >= 0).all() and (r <= 1).all()  # sigmoid head
    else:
        assert (r >= -1).all() and (r <= 1).all()  # tanh head


def test_encode_deterministic_and_jittable(rng):
    cfg = SCALAR
    params = init_vqvae_params(jax.random.key(1), cfg)
    x = jnp.asarray(rng.random((8, 8, 8, 8, 1), dtype=np.float32))
    f = jax.jit(lambda p, x: encode_to_indices(p, x, cfg))
    a = np.asarray(f(params, x))
    b = np.asarray(f(params, x))
    np.testing.assert_array_equal(a, b)


def test_train_forward_matches_inference_encode(rng):
    """The training-graph argmin must equal the inference-graph argmin
    (the reference's only correctness gate was exactly this parity)."""
    cfg = SCALAR
    params = init_vqvae_params(jax.random.key(2), cfg)
    x = jnp.asarray(rng.random((4, 8, 8, 8, 1), dtype=np.float32))

    z, recon, new_vq, vq_loss, ppl = vqvae_forward(params, x, cfg)
    assert z.shape == (4, 4, 4, 4, cfg.embedding_dim)
    assert recon.shape == x.shape
    assert float(vq_loss) >= 0.0
    assert 1.0 <= float(ppl) <= cfg.num_embeddings

    # decode(encode(x)) must equal the decoder applied to the quantized
    # latents of the train path when EMA state is unchanged.
    idx = encode_to_indices(params, x, cfg)
    recon_inf = decode_from_indices(params, idx, cfg)
    # train path used STE so recon differs only via quantized values — both
    # use the same codebook rows, so reconstructions are identical.
    np.testing.assert_allclose(np.asarray(recon_inf), np.asarray(recon),
                               rtol=1e-5, atol=1e-5)


def test_ema_state_moves_toward_assignments(rng):
    cfg = SCALAR
    params = init_vqvae_params(jax.random.key(3), cfg)
    x = jnp.asarray(rng.random((16, 8, 8, 8, 1), dtype=np.float32))
    _, _, new_vq, _, _ = vqvae_forward(params, x, cfg)
    assert not np.allclose(np.asarray(new_vq.cluster_size),
                           np.asarray(params.vq.cluster_size))


def test_dead_code_reset(rng):
    k, d = 16, 8
    state = VQState(
        embedding=jnp.asarray(rng.standard_normal((k, d)).astype(np.float32)),
        cluster_size=jnp.asarray(
            np.concatenate([np.zeros(4), np.full(12, 10.0)]).astype(np.float32)),
        embed_avg=jnp.zeros((k, d), jnp.float32),
    )
    flat_z = jnp.asarray(rng.standard_normal((100, d)).astype(np.float32))
    new_state, n_dead = reset_dead_codes(jax.random.key(0), state, flat_z)
    assert int(n_dead) == 4
    # Dead codes resampled from flat_z rows; live codes untouched.
    emb = np.asarray(new_state.embedding)
    np.testing.assert_array_equal(emb[4:], np.asarray(state.embedding)[4:])
    fz = np.asarray(flat_z)
    for i in range(4):
        assert any(np.allclose(emb[i], fz[j]) for j in range(100))
    np.testing.assert_array_equal(np.asarray(new_state.cluster_size)[:4], 1.0)


def test_bf16_compute_close_to_f32(rng):
    cfg = SCALAR
    params = init_vqvae_params(jax.random.key(4), cfg)
    x32 = jnp.asarray(rng.random((4, 8, 8, 8, 1), dtype=np.float32))
    idx32 = encode_to_indices(params, x32, cfg)
    idx16 = encode_to_indices(params, x32.astype(jnp.bfloat16), cfg)
    # bf16 conv path may flip a few borderline assignments but must broadly agree
    agreement = (np.asarray(idx32) == np.asarray(idx16)).mean()
    assert agreement > 0.95

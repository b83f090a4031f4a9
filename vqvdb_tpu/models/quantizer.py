"""EMA vector quantizer — pure-functional JAX re-design of the reference's
VectorQuantizerEMA (python/VQVAE_v2.py:89-156).

State is an explicit pytree (codebook + EMA statistics) threaded through the
train step, which makes the EMA update trivially data-parallel: under a device
mesh the per-batch sufficient statistics (one-hot counts and code sums) are
`psum`-reduced across chips before the decay update, giving the exact same
result as single-device training on the global batch.

All heavy math is MXU-shaped: distances via ||z||^2 + ||e||^2 - 2 z @ e^T
(an [N,D] x [D,K] matmul) and dequantization via one_hot @ codebook instead
of a gather — on TPU a [N,K] x [K,D] matmul beats row gathers for K<=256.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class VQState(NamedTuple):
    """Codebook and EMA statistics (ref buffers: embedding, cluster_size,
    embed_avg — python/VQVAE_v2.py:103-105)."""

    embedding: jnp.ndarray  # (K, D)
    cluster_size: jnp.ndarray  # (K,)
    embed_avg: jnp.ndarray  # (K, D)


def init_vq_state(key, num_embeddings: int, embedding_dim: int, dtype=jnp.float32) -> VQState:
    """Random-normal, row-normalized codebook (ref: python/VQVAE_v2.py:100-101)."""
    embed = jax.random.normal(key, (num_embeddings, embedding_dim), dtype)
    embed = embed / jnp.linalg.norm(embed, axis=1, keepdims=True)
    return VQState(
        embedding=embed,
        cluster_size=jnp.ones((num_embeddings,), dtype),
        # Distinct buffer: embedding/embed_avg must not alias or buffer
        # donation in the train step donates the same buffer twice.
        embed_avg=jnp.copy(embed),
    )


def pairwise_sq_distances(flat_z: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """[N, K] squared L2 distances, computed in f32 on the MXU."""
    flat_z = flat_z.astype(jnp.float32)
    codebook = codebook.astype(jnp.float32)
    z_sq = jnp.sum(flat_z * flat_z, axis=1, keepdims=True)  # (N, 1)
    e_sq = jnp.sum(codebook * codebook, axis=1)  # (K,)
    cross = jnp.dot(flat_z, codebook.T, preferred_element_type=jnp.float32)
    return z_sq + e_sq[None, :] - 2.0 * cross


def nearest_indices(flat_z: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """Argmin over codes; first-minimum tie-breaking (matches torch.argmin)."""
    return jnp.argmin(pairwise_sq_distances(flat_z, codebook), axis=1)


def dequantize(indices: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """indices (...,) -> vectors (..., D) via one-hot matmul (MXU-friendly)."""
    k = codebook.shape[0]
    one_hot = jax.nn.one_hot(indices, k, dtype=codebook.dtype)
    return jnp.dot(one_hot, codebook, preferred_element_type=codebook.dtype)


def batch_stats(flat_z: jnp.ndarray, indices: jnp.ndarray, num_embeddings: int
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sufficient statistics for the EMA update: per-code counts (K,) and
    per-code sums (K, D). These are what gets psum'd under data parallelism."""
    one_hot = jax.nn.one_hot(indices, num_embeddings, dtype=jnp.float32)
    counts = jnp.sum(one_hot, axis=0)
    sums = jnp.dot(one_hot.T, flat_z.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    return counts, sums


def ema_update(state: VQState, counts: jnp.ndarray, sums: jnp.ndarray,
               decay: float, eps: float) -> VQState:
    """EMA codebook update (ref: python/VQVAE_v2.py:136-144):
        cluster_size <- decay * cs + (1 - decay) * counts
        embed_avg    <- decay * ea + (1 - decay) * sums
        embedding    <- embed_avg / max(cluster_size, eps)
    """
    new_cs = state.cluster_size * decay + (1.0 - decay) * counts
    new_ea = state.embed_avg * decay + (1.0 - decay) * sums
    denom = jnp.clip(new_cs, min=eps)
    new_embed = new_ea / denom[:, None]
    return VQState(embedding=new_embed, cluster_size=new_cs, embed_avg=new_ea)


def vq_train_forward(
    state: VQState,
    z: jnp.ndarray,
    commitment_cost: float,
    decay: float,
    eps: float,
    *,
    axis_name: str | None = None,
) -> Tuple[jnp.ndarray, VQState, jnp.ndarray, jnp.ndarray]:
    """Training-mode quantizer pass on channels-last latents z (..., D).

    Returns (quantized-with-STE, new_state, commitment_loss, perplexity).
    If axis_name is given, EMA statistics and perplexity histogram are
    all-reduced over that mesh axis so DP training matches global-batch math.
    """
    d = z.shape[-1]
    flat = z.reshape(-1, d)
    idx = nearest_indices(flat, state.embedding)
    quant_flat = dequantize(idx, state.embedding.astype(z.dtype))
    quantized = quant_flat.reshape(z.shape)

    counts, sums = batch_stats(flat, idx, state.embedding.shape[0])
    n_vectors = jnp.asarray(flat.shape[0], jnp.float32)
    if axis_name is not None:
        counts = jax.lax.psum(counts, axis_name)
        sums = jax.lax.psum(sums, axis_name)
        n_vectors = jax.lax.psum(n_vectors, axis_name)
    new_state = ema_update(state, counts, sums, decay, eps)

    # Commitment loss beta * MSE(z, sg[q]) (ref: VQVAE_v2.py:146); mean over
    # local shard — the outer DP loss mean handles cross-chip averaging.
    commitment = commitment_cost * jnp.mean(
        jnp.square(z.astype(jnp.float32) - jax.lax.stop_gradient(quantized).astype(jnp.float32))
    )

    # Straight-through estimator (ref: VQVAE_v2.py:150).
    quantized = z + jax.lax.stop_gradient(quantized - z)

    avg_probs = counts / jnp.maximum(n_vectors, 1.0)
    perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))
    return quantized, new_state, commitment, perplexity


def reset_dead_codes(
    key,
    state: VQState,
    flat_z: jnp.ndarray,
    threshold: float = 1.0,
) -> Tuple[VQState, jnp.ndarray]:
    """Resample codes with cluster_size < threshold from encoder outputs
    (ref: python/VQVAE_v2.py:382-417), as a jit-safe masked update.

    Every code draws a random candidate row from flat_z; only dead codes take
    it. Returns (new_state, num_dead).
    """
    k = state.embedding.shape[0]
    dead = state.cluster_size < threshold  # (K,)
    n = flat_z.shape[0]
    sample_idx = jax.random.randint(key, (k,), 0, n)
    candidates = flat_z.astype(state.embedding.dtype)[sample_idx]  # (K, D)
    new_embed = jnp.where(dead[:, None], candidates, state.embedding)
    new_avg = jnp.where(dead[:, None], candidates, state.embed_avg)
    new_cs = jnp.where(dead, jnp.ones_like(state.cluster_size), state.cluster_size)
    return VQState(new_embed, new_cs, new_avg), jnp.sum(dead)

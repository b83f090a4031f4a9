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


# ---------------------------------------------------------------------------
# Residual VQ (multi-stage) — the quality tier the reference cannot express
# ---------------------------------------------------------------------------
# The reference is architecturally locked to one quantizer stage and K<=256
# (uint8 indices end-to-end: python/VQVAE_v2.py VectorQuantizerEMA is a
# single codebook; src/Utils/VQVDB_Reader.cpp stores one byte per latent
# position). Residual VQ quantizes the encoder latent in S successive
# stages — stage s encodes the residual left by stages <s — giving an
# effective codebook of K^S (65,536 at S=2, K=256) for S argmin GEMMs and
# S bytes per latent position. The .vqvdb container carries it natively:
# the index tensor is declared as latent shape (4,4,4,S), which is a
# structurally valid v3 file (the format's latent shape is
# dimension-count generic).
#
# State layout: the SAME VQState pytree, with a leading stage axis on
# every leaf — embedding (S,K,D), cluster_size (S,K), embed_avg (S,K,D).
# Artifact serialization, checkpointing, replication and donation all
# work unchanged; single-stage code paths keep the (K,D) layout.


def init_rvq_state(key, num_stages: int, num_embeddings: int,
                   embedding_dim: int, dtype=jnp.float32) -> VQState:
    """Stage-stacked VQState; each stage initialized like init_vq_state."""
    states = [init_vq_state(k, num_embeddings, embedding_dim, dtype)
              for k in jax.random.split(key, num_stages)]
    return VQState(*(jnp.stack(leaves) for leaves in zip(*states)))


def _stage(state: VQState, s: int) -> VQState:
    return VQState(state.embedding[s], state.cluster_size[s],
                   state.embed_avg[s])


def rvq_indices(flat_z: jnp.ndarray, state: VQState) -> jnp.ndarray:
    """[N,D] -> [N,S] stage indices (greedy residual argmin per stage)."""
    res = flat_z.astype(jnp.float32)
    idx = []
    for s in range(state.embedding.shape[0]):
        codebook = state.embedding[s]
        i = nearest_indices(res, codebook)
        idx.append(i)
        res = res - dequantize(i, codebook.astype(jnp.float32))
    return jnp.stack(idx, axis=-1)


def rvq_dequantize(indices: jnp.ndarray, state: VQState,
                   dtype=jnp.float32) -> jnp.ndarray:
    """[N,S] stage indices -> [N,D] (sum of per-stage codewords)."""
    out = None
    for s in range(state.embedding.shape[0]):
        q = dequantize(indices[..., s], state.embedding[s].astype(dtype))
        out = q if out is None else out + q
    return out


def rvq_train_forward(
    state: VQState,
    z: jnp.ndarray,
    commitment_cost: float,
    decay: float,
    eps: float,
    *,
    axis_name: str | None = None,
) -> Tuple[jnp.ndarray, VQState, jnp.ndarray, jnp.ndarray]:
    """Training pass for stage-stacked state; same contract as
    vq_train_forward. Each stage runs the standard EMA update on its own
    input distribution (the running residual), statistics psum'd under DP
    exactly like the single-stage path; ONE straight-through estimator is
    applied to the summed quantization so the encoder gradient is the
    ordinary STE of the total. Commitment loss is the mean over stages of
    each stage's beta*MSE(residual, sg[stage quantized]). Perplexity
    reported for stage 0 (comparable with single-stage logs)."""
    d = z.shape[-1]
    s_total = state.embedding.shape[0]
    flat = z.reshape(-1, d).astype(jnp.float32)
    res = flat
    q_total = jnp.zeros_like(flat)
    new_stages = []
    commitment = 0.0
    perplexity0 = None
    n_vectors = jnp.asarray(flat.shape[0], jnp.float32)
    if axis_name is not None:
        n_vectors = jax.lax.psum(n_vectors, axis_name)
    for s in range(s_total):
        st = _stage(state, s)
        idx = nearest_indices(res, st.embedding)
        q = dequantize(idx, st.embedding.astype(jnp.float32))
        counts, sums = batch_stats(res, idx, st.embedding.shape[0])
        if axis_name is not None:
            counts = jax.lax.psum(counts, axis_name)
            sums = jax.lax.psum(sums, axis_name)
        new_stages.append(ema_update(st, counts, sums, decay, eps))
        commitment = commitment + commitment_cost * jnp.mean(
            jnp.square(res - jax.lax.stop_gradient(q)))
        if s == 0:
            avg = counts / jnp.maximum(n_vectors, 1.0)
            perplexity0 = jnp.exp(-jnp.sum(avg * jnp.log(avg + 1e-10)))
        res = res - q
        q_total = q_total + q
    commitment = commitment / s_total
    new_state = VQState(*(jnp.stack(leaves)
                          for leaves in zip(*new_stages)))
    quantized = q_total.reshape(z.shape).astype(z.dtype)
    quantized = z + jax.lax.stop_gradient(quantized - z)
    return quantized, new_state, commitment, perplexity0


def rvq_reset_dead_codes(
    key,
    state: VQState,
    flat_z: jnp.ndarray,
    threshold: float = 1.0,
) -> Tuple[VQState, jnp.ndarray]:
    """Per-stage dead-code reset: stage s resamples its dead codes from its
    OWN input distribution — the residual left by stages <s on this batch
    (matching what that stage actually quantizes)."""
    res = flat_z.astype(jnp.float32)
    new_stages = []
    total_dead = jnp.zeros((), jnp.int32)
    for s, k in enumerate(jax.random.split(key, state.embedding.shape[0])):
        st = _stage(state, s)
        new_st, n_dead = reset_dead_codes(k, st, res, threshold)
        new_stages.append(new_st)
        total_dead = total_dead + n_dead.astype(jnp.int32)
        idx = nearest_indices(res, new_st.embedding)
        res = res - dequantize(idx, new_st.embedding.astype(jnp.float32))
    return (VQState(*(jnp.stack(leaves) for leaves in zip(*new_stages))),
            total_dead)

"""VQ-VAE model assembly (scalar and vec3 variants), channels-last JAX.

Architecture reproduces the reference graphs exactly (cited per stage below)
so that trained quality matches; layout/dtype/kernel choices are TPU-native:
NDHWC tensors, f32 norm statistics, bf16-capable conv path, MXU-shaped
quantizer math.

Scalar variant (in_channels=1; ref: python/VQVAE_v2.py:231-275):
  enc: conv(1->16,k3,p1) GN(4) relu RB(16) | conv(16->32,k4,s2,p1) | RB(32)
       | CA(32) | conv(32->D,k1)
  dec: conv(D->64,k3,p1) GN(8) relu | RB(64) | CA(64) | conv(64->256,k3,p1,ICNR)
       | pixel_shuffle(2) | conv(32->1,k3,p1) | sigmoid

Vec3 variant (in_channels=3; ref: python/VQVAE_v2.py:278-325):
  enc: conv(3->64,k3,p1) GN(8) relu RB(64) | conv(64->128,k3,s2,p1)
       | RB(128) RB(128) | CA(128) | conv(128->D,k1)
  dec: conv(D->128,k3,p1) GN(8) relu | RB(128) RB(128) | CA(128)
       | conv(128->256,k3,p1,ICNR) | pixel_shuffle(2) | conv(32->3,k3,p1) | tanh
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from vqvdb_tpu.core.config import ModelConfig
from vqvdb_tpu.models import blocks
from vqvdb_tpu.models.quantizer import (
    VQState,
    dequantize,
    init_rvq_state,
    init_vq_state,
    nearest_indices,
    rvq_dequantize,
    rvq_indices,
    rvq_train_forward,
    vq_train_forward,
)

Params = Dict[str, Any]


class VQVAEParams(NamedTuple):
    """Full model pytree: encoder/decoder weights + quantizer state."""

    encoder: Params
    decoder: Params
    vq: VQState


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _init_encoder_scalar(key, cfg: ModelConfig, dtype) -> Params:
    k = jax.random.split(key, 6)
    return {
        "pre_conv": blocks.init_conv3d(k[0], cfg.in_channels, 16, 3, dtype=dtype),
        "pre_gn": blocks.init_group_norm(16, dtype),
        "pre_rb": blocks.init_residual_block(k[1], 16, dtype),
        "down": blocks.init_conv3d(k[2], 16, 32, 4, dtype=dtype),
        "rb": blocks.init_residual_block(k[3], 32, dtype),
        "attn": blocks.init_channel_attention(k[4], 32, dtype=dtype),
        "proj": blocks.init_conv3d(k[5], 32, cfg.embedding_dim, 1, dtype=dtype),
    }


def _init_decoder_scalar(key, cfg: ModelConfig, dtype) -> Params:
    k = jax.random.split(key, 6)
    return {
        "stem_conv": blocks.init_conv3d(k[0], cfg.embedding_dim, 64, 3, dtype=dtype),
        "stem_gn": blocks.init_group_norm(64, dtype),
        "rb": blocks.init_residual_block(k[1], 64, dtype),
        "attn": blocks.init_channel_attention(k[2], 64, dtype=dtype),
        "up_conv": blocks.init_conv3d_icnr(k[3], 64, 32 * 8, 3, dtype=dtype),
        "final": blocks.init_conv3d(k[4], 32, cfg.in_channels, 3, dtype=dtype),
    }


def _init_encoder_vec3(key, cfg: ModelConfig, dtype) -> Params:
    k = jax.random.split(key, 7)
    return {
        "pre_conv": blocks.init_conv3d(k[0], cfg.in_channels, 64, 3, dtype=dtype),
        "pre_gn": blocks.init_group_norm(64, dtype),
        "pre_rb": blocks.init_residual_block(k[1], 64, dtype),
        "down": blocks.init_conv3d(k[2], 64, 128, 3, dtype=dtype),
        "rb1": blocks.init_residual_block(k[3], 128, dtype),
        "rb2": blocks.init_residual_block(k[4], 128, dtype),
        "attn": blocks.init_channel_attention(k[5], 128, dtype=dtype),
        "proj": blocks.init_conv3d(k[6], 128, cfg.embedding_dim, 1, dtype=dtype),
    }


def _init_decoder_vec3(key, cfg: ModelConfig, dtype) -> Params:
    k = jax.random.split(key, 7)
    return {
        "stem_conv": blocks.init_conv3d(k[0], cfg.embedding_dim, 128, 3, dtype=dtype),
        "stem_gn": blocks.init_group_norm(128, dtype),
        "rb1": blocks.init_residual_block(k[1], 128, dtype),
        "rb2": blocks.init_residual_block(k[2], 128, dtype),
        "attn": blocks.init_channel_attention(k[3], 128, dtype=dtype),
        "up_conv": blocks.init_conv3d_icnr(k[4], 128, 32 * 8, 3, dtype=dtype),
        "final": blocks.init_conv3d(k[5], 32, cfg.in_channels, 3, dtype=dtype),
    }


def packed_encoder_width(cfg: ModelConfig) -> int:
    """Channel width of the packed (TPU-co-designed) encoder: mirrors the
    decoder trunk width per variant (64 scalar / 128 vec3) — the widths
    measured at 62% MFU on v5e (docs/DECODE_ROOFLINE.md)."""
    return 64 if cfg.variant == "scalar" else 128


def _init_encoder_packed(key, cfg: ModelConfig, dtype) -> Params:
    """TPU-co-designed encoder (cfg.encoder_arch == "packed").

    The reference encoder's 8^3 16-channel stages are HBM-bound by
    architecture (docs/ENCODE_ROOFLINE.md: 28.6% MFU, every kernel-level
    fix measured and lost). This graph is MXU-shaped from the first layer
    instead: space-to-channel pack the leaf onto the 4^3 latent grid (a
    free reshape — lossless, 8 voxels -> 8 channels), then run the decoder
    trunk's mirror image at >=64-wide channels:

        s2c(2): (8,8,8,C) -> (4,4,4,8C)
        stem:   conv k3 (8C -> W) + GN(8) + relu
        rb:     residual block (W)
        attn:   channel attention (W)
        proj:   1x1 conv (W -> D)   [fused into the quantizer score GEMM
                                     at inference, ops/quantize.py]

    ~32 MFLOP/leaf scalar (vs the reference graph's 30 MFLOP at 28.6% MFU),
    all in conv/GEMM shapes the v5e decoder trunk already runs at 62% MFU.
    "packed_lite" makes the RB's closer conv pointwise (k1) — ~19 MFLOP —
    for the measured speed point past 2x the reference-arch encode.
    "packed_stem" prepends one cheap 8^3 stage — conv k3 (C -> W/8) + GN +
    relu — BEFORE the pack, so space-to-channel lands exactly on the trunk
    width W and the trunk stem conv becomes pointwise (k1 W -> W). Total
    FLOPs stay ~packed (the 8^3 stem is ~0.2 MFLOP/leaf scalar) but the
    graph regains an 8^3-resolution receptive field: the round-4 ladder
    showed plain "packed" loses the levelset tail at 10x data (p5 28.59 vs
    reference 34.16) because 4^3-only convs treat each 2^3 sub-cell as
    opaque channels — exactly the high-frequency narrow-band signal.
    Not reference graphs: the torch-module exporter rejects them (no
    reference module tree), but ONNX export works — the emitted
    encoder.onnx keeps the reference runtime's exact I/O contract
    (interop/onnx_export.py).
    """
    w = packed_encoder_width(cfg)
    k = jax.random.split(key, 6)
    kernel2 = 1 if cfg.encoder_arch == "packed_lite" else 3
    params: Params = {}
    if cfg.encoder_arch == "packed_stem":
        s = w // 8
        params["pre_conv"] = blocks.init_conv3d(k[4], cfg.in_channels, s, 3,
                                                dtype=dtype)
        params["pre_gn"] = blocks.init_group_norm(s, dtype)
        stem_in, stem_kernel = w, 1
    else:
        stem_in, stem_kernel = cfg.in_channels * 8, 3
    params.update({
        "stem_conv": blocks.init_conv3d(k[0], stem_in, w, stem_kernel,
                                        dtype=dtype),
        "stem_gn": blocks.init_group_norm(w, dtype),
        "rb": blocks.init_residual_block(k[1], w, dtype, kernel2=kernel2),
        "attn": blocks.init_channel_attention(k[2], w, dtype=dtype),
        "proj": blocks.init_conv3d(k[3], w, cfg.embedding_dim, 1, dtype=dtype),
    })
    return params


def init_vqvae_params(key, cfg: ModelConfig, dtype=jnp.float32) -> VQVAEParams:
    ke, kd, kq = jax.random.split(key, 3)
    if cfg.encoder_arch.startswith("packed"):
        enc = _init_encoder_packed(ke, cfg, dtype)
        dec = (_init_decoder_scalar(kd, cfg, dtype) if cfg.variant == "scalar"
               else _init_decoder_vec3(kd, cfg, dtype))
    elif cfg.variant == "scalar":
        enc = _init_encoder_scalar(ke, cfg, dtype)
        dec = _init_decoder_scalar(kd, cfg, dtype)
    else:
        enc = _init_encoder_vec3(ke, cfg, dtype)
        dec = _init_decoder_vec3(kd, cfg, dtype)
    if cfg.num_quantizers > 1:
        vq = init_rvq_state(kq, cfg.num_quantizers, cfg.num_embeddings,
                            cfg.embedding_dim, dtype)
    else:
        vq = init_vq_state(kq, cfg.num_embeddings, cfg.embedding_dim, dtype)
    return VQVAEParams(encoder=enc, decoder=dec, vq=vq)


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def _encoder_features_packed(params: Params, x: jnp.ndarray,
                             cfg: ModelConfig) -> jnp.ndarray:
    """Packed-encoder features: (B,8,8,8,C) -> (B,4,4,4,W).
    See _init_encoder_packed for the graph rationale."""
    from vqvdb_tpu.ops.packed import space_to_channel

    h = x
    if "pre_conv" in params:  # packed_stem: cheap 8^3 stage before the pack
        h = blocks.conv3d(params["pre_conv"], h, padding=1)
        s = params["pre_gn"]["scale"].shape[0]
        h = jax.nn.relu(blocks.group_norm(params["pre_gn"], h, s // 2))
    h = space_to_channel(h, 2)  # free reshape: (B,4,4,4, 8C)
    ks = params["stem_conv"]["w"].shape[0]
    h = blocks.conv3d(params["stem_conv"], h, padding=(ks - 1) // 2)
    h = jax.nn.relu(blocks.group_norm(params["stem_gn"], h, 8))
    h = blocks.residual_block(params["rb"], h)
    return blocks.channel_attention(params["attn"], h)


def encoder_features(params: Params, x: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """Encoder up to (excluding) the 1x1 projection: (B,8,8,8,C) ->
    (B,4,4,4,32|64|128). Split out so inference can fuse the projection into
    the quantizer's score matmul (see runtime/codec.py)."""
    if cfg.encoder_arch.startswith("packed"):
        return _encoder_features_packed(params, x, cfg)
    if cfg.variant == "scalar":
        h = blocks.conv3d(params["pre_conv"], x, padding=1)
        h = jax.nn.relu(blocks.group_norm(params["pre_gn"], h, 4))
        h = blocks.residual_block(params["pre_rb"], h)
        h = blocks.conv3d(params["down"], h, stride=2, padding=1)  # k4 s2: 8^3 -> 4^3
        h = blocks.residual_block(params["rb"], h)
        return blocks.channel_attention(params["attn"], h)
    else:
        h = blocks.conv3d(params["pre_conv"], x, padding=1)
        h = jax.nn.relu(blocks.group_norm(params["pre_gn"], h, 8))
        h = blocks.residual_block(params["pre_rb"], h)
        h = blocks.conv3d(params["down"], h, stride=2, padding=1)  # k3 s2: 8^3 -> 4^3
        h = blocks.residual_block(params["rb1"], h)
        h = blocks.residual_block(params["rb2"], h)
        return blocks.channel_attention(params["attn"], h)


def encoder_apply(params: Params, x: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """x: (B, 8, 8, 8, C) -> latents (B, 4, 4, 4, D)."""
    return blocks.conv3d(params["proj"], encoder_features(params, x, cfg))


def encoder_features_packed_down(params: Params, folded_down: Params,
                                 x: jnp.ndarray, cfg: ModelConfig,
                                 split_in: int = 0,
                                 fuse_rb16: bool = False) -> jnp.ndarray:
    """[reference encoder only — the packed arch has no strided conv]
    encoder_features with the strided downsampling conv executed on the
    space-to-channel packed grid (exact identity; ops/packed.py). The
    strided conv (k4 s2 scalar / k3 s2 vec3) is the slowest encoder stage
    on v5e; as a k3 SAME conv on (4^3, C*8) it runs at MXU-friendly
    shapes. split_in splits wide convs into input-channel slabs (exact;
    see blocks.conv3d) — the packed conv has C*8 input channels, squarely
    in the regime where XLA's wide-input strategy loses 2x."""
    from vqvdb_tpu.ops.packed import space_to_channel

    if cfg.variant == "scalar":
        h = blocks.conv3d(params["pre_conv"], x, padding=1)
        h = jax.nn.relu(blocks.group_norm(params["pre_gn"], h, 4))
        if fuse_rb16:
            from vqvdb_tpu.ops.fused_rb import residual_block_fused

            h = residual_block_fused(params["pre_rb"], h)
        else:
            h = blocks.residual_block(params["pre_rb"], h)
        h = blocks.conv3d(folded_down, space_to_channel(h, 2), padding=1,
                          split_in=split_in)
        h = blocks.residual_block(params["rb"], h)
        return blocks.channel_attention(params["attn"], h)
    else:
        h = blocks.conv3d(params["pre_conv"], x, padding=1)
        h = jax.nn.relu(blocks.group_norm(params["pre_gn"], h, 8))
        h = blocks.residual_block(params["pre_rb"], h)
        h = blocks.conv3d(folded_down, space_to_channel(h, 2), padding=1,
                          split_in=split_in)
        h = blocks.residual_block(params["rb1"], h, split_in=split_in)
        h = blocks.residual_block(params["rb2"], h, split_in=split_in)
        return blocks.channel_attention(params["attn"], h)


def decoder_pre_tail(params: Params, z: jnp.ndarray, cfg: ModelConfig,
                     split_in: int = 0) -> jnp.ndarray:
    """Decoder up to (excluding) up_conv: (B,4,4,4,D) -> (B,4,4,4,64|128).

    Everything after this point (up_conv -> shuffle -> final conv) is linear
    and can run as one dense GEMM (ops/tail.py). split_in splits wide convs
    into input-channel slabs (exact; see blocks.conv3d) — the D=128-input
    stem conv is decode's dominant stage and runs 2x faster split."""
    if cfg.variant == "scalar":
        h = blocks.conv3d(params["stem_conv"], z, padding=1,
                          split_in=split_in)
        h = jax.nn.relu(blocks.group_norm(params["stem_gn"], h, 8))
        h = blocks.residual_block(params["rb"], h)
        return blocks.channel_attention(params["attn"], h)
    else:
        h = blocks.conv3d(params["stem_conv"], z, padding=1,
                          split_in=split_in)
        h = jax.nn.relu(blocks.group_norm(params["stem_gn"], h, 8))
        h = blocks.residual_block(params["rb1"], h, split_in=split_in)
        h = blocks.residual_block(params["rb2"], h, split_in=split_in)
        return blocks.channel_attention(params["attn"], h)


def decoder_trunk(params: Params, z: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """Decoder up to (and including) up_conv: (B,4,4,4,D) -> (B,4,4,4,256)."""
    return blocks.conv3d(params["up_conv"], decoder_pre_tail(params, z, cfg),
                         padding=1)


def _head_activation(h: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    if cfg.variant == "scalar":
        return jax.nn.sigmoid(h.astype(jnp.float32))
    return jnp.tanh(h.astype(jnp.float32))


def decoder_tail(params: Params, h: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """Standard tail: shuffle -> final k3 conv -> head activation."""
    h = blocks.pixel_shuffle_3d(h, 2)
    h = blocks.conv3d(params["final"], h, padding=1)
    return _head_activation(h, cfg)


def decoder_tail_folded(folded: Params, h: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """Inference-optimized tail: final conv folded before the shuffle
    (exact subpixel identity; see ops/subpixel.py). The k3 conv runs on the
    MXU-friendly (4^3, 256) tensor and the shuffle becomes a pure reshape
    of the tiny output."""
    y = blocks.conv3d(folded, h, padding=1)  # (B,4,4,4, C*8)
    y = blocks.pixel_shuffle_3d(y, 2)  # (B,8,8,8,C)
    return _head_activation(y, cfg)


def decoder_apply(params: Params, z: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """z: (B, 4, 4, 4, D) -> reconstruction (B, 8, 8, 8, C)."""
    return decoder_tail(params, decoder_trunk(params, z, cfg), cfg)


def quantize_infer(vq: VQState, flat: jnp.ndarray, cfg: ModelConfig,
                   compute_dtype=jnp.float32
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inference quantization dispatcher: flat latents (N,D) -> (indices,
    quantized (N,D)). Indices are (N,) single-stage / (N,S) residual-VQ."""
    if cfg.num_quantizers > 1:
        idx = rvq_indices(flat, vq)
        return idx, rvq_dequantize(idx, vq, compute_dtype)
    idx = nearest_indices(flat, vq.embedding)
    return idx, dequantize(idx, vq.embedding.astype(compute_dtype))


def quantize_train_forward(vq: VQState, z: jnp.ndarray, cfg: ModelConfig,
                           *, axis_name: str | None = None):
    """Training quantizer dispatcher (single-stage EMA vs residual-VQ);
    same contract as vq_train_forward."""
    fwd = rvq_train_forward if cfg.num_quantizers > 1 else vq_train_forward
    return fwd(vq, z, cfg.commitment_cost, cfg.ema_decay, cfg.ema_eps,
               axis_name=axis_name)


def reset_dead(key, vq: VQState, flat_z: jnp.ndarray, cfg: ModelConfig,
               threshold: float = 1.0):
    """Dead-code reset dispatcher (per-stage residual inputs for RVQ)."""
    from vqvdb_tpu.models.quantizer import (reset_dead_codes,
                                            rvq_reset_dead_codes)

    if cfg.num_quantizers > 1:
        return rvq_reset_dead_codes(key, vq, flat_z, threshold)
    return reset_dead_codes(key, vq, flat_z, threshold)


def encode_to_indices(params: VQVAEParams, x: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """Inference encode: leaves (B,8,8,8,C) -> uint8 indices (B,4,4,4)
    — (B,4,4,4,S) for residual-VQ models
    (ref: VQVAE.encode, python/VQVAE_v2.py:350-369)."""
    z = encoder_apply(params.encoder, x, cfg)
    b = z.shape[0]
    flat = z.reshape(-1, cfg.embedding_dim)
    idx, _ = quantize_infer(params.vq, flat, cfg)
    return idx.reshape((b,) + cfg.index_shape).astype(cfg.index_dtype)


def decode_from_indices(params: VQVAEParams, indices: jnp.ndarray, cfg: ModelConfig,
                        compute_dtype=jnp.float32) -> jnp.ndarray:
    """Inference decode: uint8 indices (B,4,4,4[,S]) -> leaves (B,8,8,8,C)
    (ref: VQVAE.decode, python/VQVAE_v2.py:371-377)."""
    if cfg.num_quantizers > 1:
        flat_idx = indices.astype(jnp.int32).reshape(-1, cfg.num_quantizers)
        z = rvq_dequantize(flat_idx, params.vq, compute_dtype)
        z = z.reshape(indices.shape[:1] + cfg.latent_shape
                      + (cfg.embedding_dim,))
    else:
        codebook = params.vq.embedding.astype(compute_dtype)
        z = dequantize(indices.astype(jnp.int32), codebook)
    return decoder_apply(params.decoder, z, cfg)


def vqvae_forward(
    params: VQVAEParams,
    x: jnp.ndarray,
    cfg: ModelConfig,
    *,
    axis_name: str | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, VQState, jnp.ndarray, jnp.ndarray]:
    """Training forward (ref: VQVAE.forward, python/VQVAE_v2.py:344-348).

    Returns (z, recon, new_vq_state, vq_loss, perplexity).
    """
    z = encoder_apply(params.encoder, x, cfg)
    quantized, new_vq, vq_loss, perplexity = quantize_train_forward(
        params.vq, z, cfg, axis_name=axis_name)
    recon = decoder_apply(params.decoder, quantized, cfg)
    return z, recon, new_vq, vq_loss, perplexity

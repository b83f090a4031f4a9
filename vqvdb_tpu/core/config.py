"""Configuration dataclasses for vqvdb_tpu.

Replaces the reference's 4-layer ad-hoc config system (C++ `CodecConfig`
in src/core/IVQVAECodec.hpp:83-89, Houdini DS parm blocks, argparse
constants in python/training.py:48-56, and CMake feature flags) with two
explicit, hashable dataclasses usable as jit static args.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

# Geometry of an OpenVDB FloatGrid leaf node (ref: src/orchestrator/VQVAECodec.cpp:20-22).
LEAF_DIM = 8
LEAF_VOXELS = LEAF_DIM**3  # 512
# Encoder downsamples 8^3 -> 4^3 (stride-2 conv; ref: python/VQVAE_v2.py:240).
LATENT_DIM = 4
LATENT_VOXELS = LATENT_DIM**3  # 64


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """VQ-VAE architecture hyperparameters.

    Defaults reproduce the reference scalar model (ref: python/training.py:52-55):
    K=256 codes x D=128 dims, latent 4x4x4, commitment cost 0.25, EMA decay
    0.95 / eps 1e-4 (ref: python/VQVAE_v2.py:90-91).
    """

    in_channels: int = 1
    embedding_dim: int = 128
    num_embeddings: int = 256
    commitment_cost: float = 0.25
    ema_decay: float = 0.95
    ema_eps: float = 1e-4
    # Residual-VQ stages. 1 = the reference architecture (single EMA
    # codebook). S>1 quantizes the latent in S greedy residual stages
    # (effective codebook K^S for S bytes/latent-position) — the quality
    # tier the reference cannot express: its runtime and container are
    # locked to one uint8 index per latent position
    # (src/Utils/VQVDB_Reader.cpp). Files declare index shape (4,4,4,S),
    # still a structurally valid v3 container.
    num_quantizers: int = 1
    # Encoder graph family. "reference" reproduces the reference encoder
    # stage-for-stage (python/VQVAE_v2.py:231-250 / :278-305) so torch
    # checkpoints import bit-faithfully; it is HBM-bound by architecture on
    # TPU (16-channel 8^3 stages, docs/ENCODE_ROOFLINE.md — 28.6% MFU).
    # "packed" is the TPU-co-designed encoder: the leaf is space-to-channel
    # packed to the 4^3 latent grid up front (a free reshape) and every
    # stage runs MXU-shaped with >=64-wide channels — the same shapes that
    # carry the decoder trunk to 62% MFU. "packed_lite" additionally makes
    # the residual block's closer conv pointwise (k1), halving encode
    # FLOPs; measured on v5e (benchmarks/encoder_v2_ab_r4.json). Decoder,
    # quantizer, and container are unchanged for both. ONNX export works
    # for every arch (the graph is built from our own ops); only the
    # torch-module exporters require "reference" (they target the
    # reference's state_dict tree, which the packed graphs don't have).
    # "packed_stem" is packed plus a cheap full-resolution stem: one k3
    # conv at 8^3 to W/8 channels (+GN+relu) BEFORE space-to-channel, so
    # the pack lands exactly on the trunk width W and the trunk stem conv
    # shrinks to a pointwise mix — near-identical FLOPs to "packed"
    # (~0.2 MFLOP/leaf 8^3 stem replaces ~1.3 MFLOP of trunk stem) while
    # restoring the 8^3-resolution receptive field that the round-4
    # quality ladder showed "packed" lacks on high-frequency narrow-band
    # level-set surfaces (levelset p5 28.59 vs reference 34.16 at 10x
    # data, benchmarks/arch10x_*_r4.json).
    encoder_arch: str = "reference"

    def __post_init__(self):
        if self.encoder_arch not in ("reference", "packed", "packed_lite",
                                     "packed_stem"):
            raise ValueError(
                f"unknown encoder_arch {self.encoder_arch!r} (expected "
                "'reference', 'packed', 'packed_lite', or 'packed_stem')")

    @property
    def variant(self) -> str:
        """'scalar' (sigmoid head) or 'vec3' (tanh head); selection mirrors
        ref python/VQVAE_v2.py:331-336 (in_channels==1 -> float variant)."""
        return "scalar" if self.in_channels == 1 else "vec3"

    @property
    def latent_shape(self) -> Tuple[int, int, int]:
        return (LATENT_DIM, LATENT_DIM, LATENT_DIM)

    @property
    def index_shape(self) -> Tuple[int, ...]:
        """Shape of one leaf's index tensor as stored in files and returned
        by encode: (4,4,4) single-stage, (4,4,4,S) residual-VQ."""
        if self.num_quantizers == 1:
            return self.latent_shape
        return self.latent_shape + (self.num_quantizers,)

    @property
    def index_dtype(self):
        # The .vqvdb v3 container stores 1 byte per latent index, so K must
        # fit uint8 (ref: src/Utils/VQVDB_Reader.cpp — blockDataSize is the
        # latent voxel count in bytes). Larger codebooks need format v4.
        return jnp.uint8 if self.num_embeddings <= 256 else jnp.uint16


@dataclasses.dataclass(frozen=True)
class CodecConfig:
    """Runtime codec settings.

    The reference exposed backend/device enums (ONNX/LibTorch x CPU/CUDA,
    ref: src/core/IVQVAECodec.hpp:21,83-89); under JAX that collapses to
    platform selection, so only pipeline knobs remain.
    """

    # Leaves per device step (ref SOP default was 64 — tiny for TPU). The
    # round-2 sweep (benchmarks/sweep_batch_r2.json) shows throughput is
    # flat-to-falling above ~2-4k for both directions on v5e (encode
    # b2048 1.89M > b8192 1.70M leaves/s); 4096 balances step efficiency
    # against host round trips in the file-level pipeline.
    batch_size: int = 4096
    compute_dtype: str = "bfloat16"  # conv compute precision on TPU
    param_dtype: str = "float32"
    # Measured on v5e with fence-robust timing (docs/ARCHITECTURE.md):
    # XLA's fused GEMM+argmin beats the hand-written Pallas quantizer
    # kernels in full-graph context — the pallas_call custom-call boundary
    # forces the conv output to materialize instead of fusing into the
    # score matmul. Defaults follow the measurements; the kernels remain
    # available (and bit-exact-tested) for configurations where they win.
    use_pallas: bool = False  # encode-side Pallas nearest-code kernel
    use_pallas_dequant: bool = False  # decode-side Pallas dequantize
    # Collapse the decoder tail (up_conv -> shuffle -> final conv, all
    # linear) into one dense GEMM (ops/tail.py) — 15x fewer FLOPs than the
    # separate convs, exact boundaries by construction. Supersedes
    # fuse_final_conv when enabled.
    fuse_decoder_tail: bool = True
    # Fold the decoder's final conv before the pixel shuffle (exact subpixel
    # identity, ops/subpixel.py) — the post-shuffle k3 conv on 8^3 runs at
    # ~3 TFLOP/s on v5e and costs ~25% of decode otherwise. Used when
    # fuse_decoder_tail is off.
    fuse_final_conv: bool = True
    # Compose the encoder's 1x1 projection with the quantizer distance
    # matmul into one score GEMM (exact; ops/quantize.py) — the separate
    # proj + quantize stages are the slowest part of encode on v5e.
    fuse_proj_quantize: bool = True
    # Run the strided downsampling conv on the space-to-channel packed grid
    # (exact; ops/packed.py). Only takes effect together with
    # fuse_proj_quantize (both rewrite the encode graph).
    pack_down_conv: bool = True
    # Compute inference convs with more than this many input channels as a
    # sum over input-channel slabs (exact up to fp reassociation;
    # blocks.conv3d). In ISOLATION this is 2x for the 128-input decode stem
    # (benchmarks/experiment_stem.py: 1.74 -> 0.84 ms / 4096 leaves), but in
    # the FULL codec graphs it is a measured LOSS (benchmarks/ab_split.py,
    # ab_split_r2.json: decode 0.96x, encode 0.89x) — XLA's full-graph
    # scheduling already hides the wide conv's cost, and the split breaks
    # it. Default off; same lesson as the Pallas quantizer kernels.
    split_conv_in: int = 0
    # Run the encoder's 16-channel residual block as one fused Pallas
    # kernel (ops/fused_rb.py: banded block-Toeplitz matmuls on a fused
    # (w, c) 128-lane layout; 2 HBM passes instead of 6-8). Default
    # follows the in-context A/B on v5e (benchmarks/ab_rb16.py) — the
    # round-1/2 rule that isolated wins invert in-graph applies here too.
    fuse_rb16: bool = False
    donate_buffers: bool = True

    @property
    def compute_jnp_dtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def param_jnp_dtype(self):
        return jnp.dtype(self.param_dtype)

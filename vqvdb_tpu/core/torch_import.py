"""Import reference torch checkpoints into VQVAEParams.

A user of the reference has trained `.pth` checkpoints (torch state_dicts
saved by python/training.py — either the full checkpoint dict with a
"state_dict" entry, ref training.py:219-233, or a bare state_dict). This
module maps them onto our pytree so existing models keep working:

  torch layout -> ours
    Conv3d.weight  (O, I, kD, kH, kW)  ->  (kD, kH, kW, I, O)   [DHWIO]
    GroupNorm.weight/bias (C,)         ->  scale/bias (C,)
    Linear.weight  (out, in)           ->  w (in, out)
    quantizer buffers (embedding, cluster_size, embed_avg) -> VQState

Key names follow the reference module tree (python/VQVAE_v2.py:231-342):
encoder.pre.{0 conv,1 gn,3 residual}, encoder.down, encoder.res_stack.N,
encoder.attn.fc.{0,2}, encoder.proj, decoder.stem.{0,1}, decoder.res_stack.N,
decoder.attn.fc.{0,2}, decoder.up_conv, decoder.final, quantizer.*.

Loading uses numpy only — checkpoints saved with torch.save need torch
installed (we call torch.load when available), but .npz exports work
without it.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Mapping, Union

import jax.numpy as jnp
import numpy as np

from vqvdb_tpu.core.config import ModelConfig
from vqvdb_tpu.models.quantizer import VQState
from vqvdb_tpu.models.vqvae import VQVAEParams


def _conv(sd: Mapping, prefix: str) -> Dict:
    w = np.asarray(sd[f"{prefix}.weight"], np.float32)
    p = {"w": jnp.asarray(np.transpose(w, (2, 3, 4, 1, 0)))}
    if f"{prefix}.bias" in sd:
        p["b"] = jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32))
    return p


def _gn(sd: Mapping, prefix: str) -> Dict:
    return {
        "scale": jnp.asarray(np.asarray(sd[f"{prefix}.weight"], np.float32)),
        "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32)),
    }


def _res_block(sd: Mapping, prefix: str) -> Dict:
    return {
        "gn1": _gn(sd, f"{prefix}.gn1"),
        "conv1": _conv(sd, f"{prefix}.conv1"),
        "gn2": _gn(sd, f"{prefix}.gn2"),
        "conv2": _conv(sd, f"{prefix}.conv2"),
    }


def _attn(sd: Mapping, prefix: str) -> Dict:
    w1 = np.asarray(sd[f"{prefix}.fc.0.weight"], np.float32)  # (out, in)
    w2 = np.asarray(sd[f"{prefix}.fc.2.weight"], np.float32)
    return {"fc1": {"w": jnp.asarray(w1.T)}, "fc2": {"w": jnp.asarray(w2.T)}}


def _encoder(sd: Mapping, cfg: ModelConfig) -> Dict:
    if cfg.variant == "scalar":
        return {
            "pre_conv": _conv(sd, "encoder.pre.0"),
            "pre_gn": _gn(sd, "encoder.pre.1"),
            "pre_rb": _res_block(sd, "encoder.pre.3"),
            "down": _conv(sd, "encoder.down"),
            "rb": _res_block(sd, "encoder.res_stack.0"),
            "attn": _attn(sd, "encoder.attn"),
            "proj": _conv(sd, "encoder.proj"),
        }
    return {
        "pre_conv": _conv(sd, "encoder.pre.0"),
        "pre_gn": _gn(sd, "encoder.pre.1"),
        "pre_rb": _res_block(sd, "encoder.pre.3"),
        "down": _conv(sd, "encoder.down1"),
        "rb1": _res_block(sd, "encoder.res_stack.0"),
        "rb2": _res_block(sd, "encoder.res_stack.1"),
        "attn": _attn(sd, "encoder.attn"),
        "proj": _conv(sd, "encoder.proj"),
    }


def _decoder(sd: Mapping, cfg: ModelConfig) -> Dict:
    if cfg.variant == "scalar":
        return {
            "stem_conv": _conv(sd, "decoder.stem.0"),
            "stem_gn": _gn(sd, "decoder.stem.1"),
            "rb": _res_block(sd, "decoder.res_stack.0"),
            "attn": _attn(sd, "decoder.attn"),
            "up_conv": _conv(sd, "decoder.up_conv"),
            "final": _conv(sd, "decoder.final"),
        }
    return {
        "stem_conv": _conv(sd, "decoder.stem.0"),
        "stem_gn": _gn(sd, "decoder.stem.1"),
        "rb1": _res_block(sd, "decoder.res_stack.0"),
        "rb2": _res_block(sd, "decoder.res_stack.1"),
        "attn": _attn(sd, "decoder.attn"),
        "up_conv": _conv(sd, "decoder.up_conv"),
        "final": _conv(sd, "decoder.final"),
    }


def import_state_dict(sd: Mapping, cfg: ModelConfig) -> VQVAEParams:
    """Map a reference torch state_dict (tensors or numpy arrays) onto
    VQVAEParams. Raises KeyError with the missing key name on mismatch."""
    if cfg.encoder_arch != "reference":
        raise ValueError(
            "torch checkpoints carry the reference encoder layout; import "
            "them with encoder_arch='reference' (the packed arch is "
            "TPU-only, trained from scratch)")
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in sd.items()}
    vq = VQState(
        embedding=jnp.asarray(np.asarray(sd["quantizer.embedding"], np.float32)),
        cluster_size=jnp.asarray(
            np.asarray(sd["quantizer.cluster_size"], np.float32)),
        embed_avg=jnp.asarray(np.asarray(sd["quantizer.embed_avg"], np.float32)),
    )
    if vq.embedding.shape != (cfg.num_embeddings, cfg.embedding_dim):
        raise ValueError(
            f"checkpoint codebook {vq.embedding.shape} != config "
            f"({cfg.num_embeddings}, {cfg.embedding_dim})"
        )
    return VQVAEParams(
        encoder=_encoder(sd, cfg),
        decoder=_decoder(sd, cfg),
        vq=vq,
    )


def import_torch_checkpoint(path: Union[str, Path], cfg: ModelConfig
                            ) -> VQVAEParams:
    """Load a reference .pth checkpoint (full train checkpoint or bare
    state_dict) and convert it."""
    import torch

    obj = torch.load(str(path), map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return import_state_dict(obj, cfg)

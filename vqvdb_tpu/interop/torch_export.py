"""Export VQVAEParams to reference-layout torch artifacts.

Exact inverse of core/torch_import.py's key/layout mapping:

  ours                                ->  torch layout
    conv w (kD, kH, kW, I, O) [DHWIO] ->  Conv3d.weight (O, I, kD, kH, kW)
    gn scale/bias (C,)                ->  GroupNorm.weight/bias
    linear w (in, out)                ->  Linear.weight (out, in)
    VQState                           ->  quantizer.{embedding,cluster_size,embed_avg}

Three artifact forms, matching the reference ecosystem's three entry points:
  * export_state_dict        — in-memory reference-keyed dict
  * save_reference_checkpoint — .pth shaped like python/training.py:219-233
    checkpoints ({"epoch", "state_dict", ...}), loadable by their trainer
    resume path AND by our own core/torch_import.py (round-trip tested).
  * save_torchscript         — scripted .pt with encode/decode methods, the
    exact input of the reference's ONNX converter (python/to_onnx.py:46-56).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Mapping, Union

import numpy as np

from vqvdb_tpu.core.config import ModelConfig
from vqvdb_tpu.models.vqvae import VQVAEParams


def _conv(out: Dict[str, np.ndarray], prefix: str, p: Mapping) -> None:
    w = np.asarray(p["w"], np.float32)
    out[f"{prefix}.weight"] = np.ascontiguousarray(np.transpose(w, (4, 3, 0, 1, 2)))
    if "b" in p:
        out[f"{prefix}.bias"] = np.asarray(p["b"], np.float32)


def _gn(out: Dict[str, np.ndarray], prefix: str, p: Mapping) -> None:
    out[f"{prefix}.weight"] = np.asarray(p["scale"], np.float32)
    out[f"{prefix}.bias"] = np.asarray(p["bias"], np.float32)


def _rb(out: Dict[str, np.ndarray], prefix: str, p: Mapping) -> None:
    _gn(out, f"{prefix}.gn1", p["gn1"])
    _conv(out, f"{prefix}.conv1", p["conv1"])
    _gn(out, f"{prefix}.gn2", p["gn2"])
    _conv(out, f"{prefix}.conv2", p["conv2"])


def _attn(out: Dict[str, np.ndarray], prefix: str, p: Mapping) -> None:
    out[f"{prefix}.fc.0.weight"] = np.ascontiguousarray(
        np.asarray(p["fc1"]["w"], np.float32).T)
    out[f"{prefix}.fc.2.weight"] = np.ascontiguousarray(
        np.asarray(p["fc2"]["w"], np.float32).T)


def export_state_dict(params: VQVAEParams, cfg: ModelConfig) -> Dict[str, np.ndarray]:
    """VQVAEParams -> reference-keyed state_dict of float32 numpy arrays."""
    if cfg.num_quantizers != 1:
        raise ValueError(
            "torch export targets the reference layout, which has a single "
            "quantizer stage; residual-VQ models cannot be exported")
    if cfg.encoder_arch != "reference":
        raise ValueError(
            "torch export targets the reference module tree; the packed "
            "(TPU-co-designed) encoder has no torch counterpart")
    sd: Dict[str, np.ndarray] = {}
    enc = params.encoder
    _conv(sd, "encoder.pre.0", enc["pre_conv"])
    _gn(sd, "encoder.pre.1", enc["pre_gn"])
    _rb(sd, "encoder.pre.3", enc["pre_rb"])
    if cfg.variant == "scalar":
        _conv(sd, "encoder.down", enc["down"])
        _rb(sd, "encoder.res_stack.0", enc["rb"])
    else:
        _conv(sd, "encoder.down1", enc["down"])
        _rb(sd, "encoder.res_stack.0", enc["rb1"])
        _rb(sd, "encoder.res_stack.1", enc["rb2"])
    _attn(sd, "encoder.attn", enc["attn"])
    _conv(sd, "encoder.proj", enc["proj"])
    sd.update(decoder_quantizer_state_dict(params, cfg))
    return sd


def decoder_quantizer_state_dict(params: VQVAEParams, cfg: ModelConfig
                                 ) -> Dict[str, np.ndarray]:
    """Reference-keyed decoder + quantizer entries only. The decoder graph
    is shared by every encoder_arch (the packed encoders pair with the
    unchanged reference decoder), so the ONNX exporter reuses this for
    packed models that export_state_dict rejects."""
    sd: Dict[str, np.ndarray] = {}
    dec = params.decoder
    _conv(sd, "decoder.stem.0", dec["stem_conv"])
    _gn(sd, "decoder.stem.1", dec["stem_gn"])
    if cfg.variant == "scalar":
        _rb(sd, "decoder.res_stack.0", dec["rb"])
    else:
        _rb(sd, "decoder.res_stack.0", dec["rb1"])
        _rb(sd, "decoder.res_stack.1", dec["rb2"])
    _attn(sd, "decoder.attn", dec["attn"])
    _conv(sd, "decoder.up_conv", dec["up_conv"])
    _conv(sd, "decoder.final", dec["final"])

    sd["quantizer.embedding"] = np.asarray(params.vq.embedding, np.float32)
    sd["quantizer.cluster_size"] = np.asarray(params.vq.cluster_size, np.float32)
    sd["quantizer.embed_avg"] = np.asarray(params.vq.embed_avg, np.float32)
    return sd


def save_reference_checkpoint(path: Union[str, Path], params: VQVAEParams,
                              cfg: ModelConfig, *, epoch: int = 0) -> None:
    """Write a .pth in the reference trainer's checkpoint shape
    (ref: python/training.py:219-233): a dict with a "state_dict" entry of
    torch tensors. core/torch_import.py reads this back losslessly."""
    import torch

    sd = {k: torch.from_numpy(np.array(v, copy=True))
          for k, v in export_state_dict(params, cfg).items()}
    torch.save({"epoch": epoch, "state_dict": sd}, str(path))


def save_torchscript(path: Union[str, Path], params: VQVAEParams,
                     cfg: ModelConfig) -> None:
    """Write a TorchScript .pt exposing encode/decode — the artifact the
    reference ONNX converter consumes via torch.jit.load
    (ref: python/to_onnx.py:46-56, 100-104)."""
    import torch

    from vqvdb_tpu.interop.torch_module import build_torch_vqvae

    module = build_torch_vqvae(cfg)
    sd = {k: torch.from_numpy(np.array(v, copy=True))
          for k, v in export_state_dict(params, cfg).items()}
    module.load_state_dict(sd, strict=True)
    scripted = torch.jit.script(module)
    scripted.save(str(path))

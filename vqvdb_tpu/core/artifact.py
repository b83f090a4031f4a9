"""Versioned model artifact: params + config in one file.

Replaces the reference's model-packaging pipeline (checkpoint -> TorchScript
-> ONNX -> C byte arrays compiled into the DSO; ref: python/
save_for_inference.py, python/to_onnx.py, python/convert_to_header.py and
src/Bin/*.h). A JAX runtime needs no graph export — the graph is the code —
so the artifact is just the weight pytree plus the ModelConfig that rebuilds
it, with the latent-shape probe at load acting as the reference's runtime
self-check (ref: OnnxBackend_CPU.cpp initialize_latent_shape_impl).

Layout (little-endian):
    magic   b"VQMODEL1"
    u32     config JSON length, then JSON bytes
    u64     params msgpack length, then flax.serialization bytes
"""

from __future__ import annotations

import dataclasses
import json
import struct
from pathlib import Path
from typing import Tuple, Union

import jax
from flax import serialization

from vqvdb_tpu.utils.errors import ArtifactError

from vqvdb_tpu.core.config import ModelConfig
from vqvdb_tpu.models.quantizer import VQState
from vqvdb_tpu.models.vqvae import VQVAEParams, init_vqvae_params

MAGIC = b"VQMODEL1"


def save_model(path: Union[str, Path], params: VQVAEParams, cfg: ModelConfig) -> None:
    cfg_json = json.dumps(dataclasses.asdict(cfg)).encode("utf-8")
    params_bytes = serialization.to_bytes(params._asdict())
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<I", len(cfg_json)))
        f.write(cfg_json)
        f.write(struct.pack("<Q", len(params_bytes)))
        f.write(params_bytes)


def load_model_config(path: Union[str, Path]) -> ModelConfig:
    """Read just the ModelConfig block (skips the params blob entirely —
    cheap way to sniff e.g. encoder_arch off a multi-MB artifact)."""
    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            raise ArtifactError(f"not a vqvdb_tpu model artifact: {path}")
        (cfg_len,) = struct.unpack("<I", f.read(4))
        return ModelConfig(**json.loads(f.read(cfg_len).decode("utf-8")))


def load_model(path: Union[str, Path]) -> Tuple[VQVAEParams, ModelConfig]:
    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            raise ArtifactError(f"not a vqvdb_tpu model artifact: {path}")
        (cfg_len,) = struct.unpack("<I", f.read(4))
        cfg = ModelConfig(**json.loads(f.read(cfg_len).decode("utf-8")))
        (p_len,) = struct.unpack("<Q", f.read(8))
        raw = f.read(p_len)
        if len(raw) != p_len:
            raise ArtifactError("model artifact truncated")
    # Build a template pytree with the right structure, then restore bytes
    # into it (flax from_bytes needs the target structure).
    template = init_vqvae_params(jax.random.key(0), cfg)
    restored = serialization.from_bytes(template._asdict(), raw)
    params = VQVAEParams(
        encoder=restored["encoder"],
        decoder=restored["decoder"],
        vq=VQState(**restored["vq"]) if isinstance(restored["vq"], dict)
        else restored["vq"],
    )
    return params, cfg

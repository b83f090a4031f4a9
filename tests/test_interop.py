"""Interop exports: torch checkpoint / TorchScript / ONNX parity gates.

The deployment arrow back into the reference ecosystem (VERDICT round-1
Missing #3): models trained here must load into (a) the reference trainer's
checkpoint format, (b) its ONNX converter's TorchScript input
(ref: python/to_onnx.py:46-56), and (c) its ONNX-Runtime C++ backend
(encoder.onnx/decoder.onnx, 'input'/'output', uint8 indices). Each arrow is
gated on numerical parity with the JAX forward at atol 1e-5 — the
reference's own validation threshold (ref: python/to_onnx.py:208).
"""

import json
import subprocess
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vqvdb_tpu.core.config import ModelConfig
from vqvdb_tpu.core.torch_import import import_state_dict
from vqvdb_tpu.interop.onnx_eval import run_model
from vqvdb_tpu.interop.onnx_export import build_decoder_onnx, build_encoder_onnx
from vqvdb_tpu.interop.torch_export import (
    export_state_dict,
    save_reference_checkpoint,
    save_torchscript,
)
from vqvdb_tpu.models.vqvae import (
    decode_from_indices,
    encode_to_indices,
    init_vqvae_params,
)

SCALAR = ModelConfig()
VEC3 = ModelConfig(in_channels=3, embedding_dim=64)


def _params(cfg, seed=0):
    return init_vqvae_params(jax.random.key(seed), cfg)


def _leaves(cfg, n=4, seed=1):
    rng = np.random.default_rng(seed)
    x = rng.random((n, 8, 8, 8, cfg.in_channels), np.float32)
    if cfg.variant == "vec3":
        x = (2.0 * x - 1.0).astype(np.float32)
    return x


@pytest.mark.parametrize("cfg", [SCALAR, VEC3], ids=["scalar", "vec3"])
def test_state_dict_round_trip_bit_identical(cfg):
    params = _params(cfg)
    back = import_state_dict(export_state_dict(params, cfg), cfg)
    flat_a, _ = jax.tree_util.tree_flatten_with_path(params)
    flat_b, _ = jax.tree_util.tree_flatten_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (ka, a), (kb, b) in zip(flat_a, flat_b):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(ka))


def test_reference_checkpoint_shape(tmp_path):
    """The .pth must look like a python/training.py:219-233 checkpoint."""
    params = _params(SCALAR)
    p = tmp_path / "ckpt.pth"
    save_reference_checkpoint(p, params, SCALAR, epoch=7)
    obj = torch.load(p, map_location="cpu", weights_only=True)
    assert obj["epoch"] == 7
    sd = obj["state_dict"]
    assert sd["encoder.pre.0.weight"].shape == (16, 1, 3, 3, 3)
    assert sd["quantizer.embedding"].shape == (256, 128)
    back = import_state_dict(sd, SCALAR)
    np.testing.assert_array_equal(np.asarray(back.vq.embedding),
                                  np.asarray(params.vq.embedding))


@pytest.mark.parametrize("cfg", [SCALAR, VEC3], ids=["scalar", "vec3"])
def test_torchscript_encode_decode_parity(cfg, tmp_path):
    """torch.jit.load'ed module (the reference converter's input) must match
    the JAX forward: indices exactly, reconstruction at atol 1e-5."""
    params = _params(cfg)
    p = tmp_path / "model.pt"
    save_torchscript(p, params, cfg)
    mod = torch.jit.load(str(p))  # as ref to_onnx.py:53 does

    x = _leaves(cfg)
    want_idx = np.asarray(encode_to_indices(params, jnp.asarray(x), cfg))
    with torch.no_grad():
        got_idx = mod.encode(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
    assert got_idx.dtype == torch.int64
    np.testing.assert_array_equal(want_idx.astype(np.int64),
                                  got_idx.numpy())

    want = np.asarray(decode_from_indices(params, jnp.asarray(want_idx), cfg))
    with torch.no_grad():
        got = mod.decode(torch.from_numpy(want_idx.astype(np.int64)))
    np.testing.assert_allclose(np.moveaxis(got.numpy(), 1, -1), want,
                               atol=1e-5)


@pytest.mark.parametrize("cfg", [SCALAR, VEC3], ids=["scalar", "vec3"])
def test_onnx_encoder_decoder_parity(cfg):
    """Serialized ONNX bytes, re-parsed and numpy-executed, match JAX."""
    params = _params(cfg)
    enc_bytes = build_encoder_onnx(params, cfg)
    dec_bytes = build_decoder_onnx(params, cfg)

    x = _leaves(cfg)
    want_idx = np.asarray(encode_to_indices(params, jnp.asarray(x), cfg))
    got_idx = run_model(enc_bytes, {"input": np.moveaxis(x, -1, 1)})["output"]
    assert got_idx.dtype == np.uint8
    np.testing.assert_array_equal(want_idx, got_idx)

    want = np.asarray(decode_from_indices(params, jnp.asarray(want_idx), cfg))
    got = run_model(dec_bytes, {"input": want_idx})["output"]
    np.testing.assert_allclose(np.moveaxis(got, 1, -1), want, atol=1e-5)


PACKED_CFGS = [
    ModelConfig(encoder_arch="packed"),
    ModelConfig(encoder_arch="packed_lite"),
    ModelConfig(encoder_arch="packed_stem"),
    ModelConfig(in_channels=3, embedding_dim=64, encoder_arch="packed"),
    ModelConfig(in_channels=3, embedding_dim=64, encoder_arch="packed_stem"),
]


@pytest.mark.parametrize("cfg", PACKED_CFGS,
                         ids=["packed", "packed_lite", "packed_stem",
                              "vec3_packed", "vec3_packed_stem"])
def test_onnx_packed_encoder_parity(cfg):
    """The TPU-co-designed encoders export to ONNX with the reference
    runtime's exact I/O contract; re-parsed + numpy-executed bytes match
    the JAX forward (space-to-channel pack included)."""
    params = _params(cfg)
    x = _leaves(cfg)
    want_idx = np.asarray(encode_to_indices(params, jnp.asarray(x), cfg))
    got_idx = run_model(build_encoder_onnx(params, cfg),
                        {"input": np.moveaxis(x, -1, 1)})["output"]
    assert got_idx.dtype == np.uint8
    np.testing.assert_array_equal(want_idx, got_idx)

    # Decoder export is the shared reference graph; round-trip it too.
    want = np.asarray(decode_from_indices(params, jnp.asarray(want_idx), cfg))
    got = run_model(build_decoder_onnx(params, cfg),
                    {"input": want_idx})["output"]
    np.testing.assert_allclose(np.moveaxis(got, 1, -1), want, atol=1e-5)


def test_onnx_v4_indices_use_uint16():
    cfg = ModelConfig(num_embeddings=512, embedding_dim=32)
    params = _params(cfg)
    x = _leaves(cfg)
    got = run_model(build_encoder_onnx(params, cfg),
                    {"input": np.moveaxis(x, -1, 1)})["output"]
    assert got.dtype == np.uint16
    want = np.asarray(encode_to_indices(params, jnp.asarray(x), cfg))
    np.testing.assert_array_equal(want, got)


def test_cli_export_onnx_and_torch(tmp_path):
    from vqvdb_tpu.core.artifact import save_model

    params = _params(SCALAR)
    model = tmp_path / "m.vqmodel"
    save_model(model, params, SCALAR)

    env_cmd = [sys.executable, "-m", "vqvdb_tpu.cli"]
    r = subprocess.run(
        env_cmd + ["export-onnx", str(model), str(tmp_path / "onnx")],
        capture_output=True, text=True,
        env={"VQVDB_PLATFORM": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"},
    )
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["valid"] is True
    assert out["encoder_index_agreement"] == 1.0
    assert (tmp_path / "onnx" / "encoder.onnx").exists()
    assert (tmp_path / "onnx" / "decoder.onnx").exists()

    r = subprocess.run(
        env_cmd + ["export-torch", str(model),
                   "--checkpoint", str(tmp_path / "ref.pth"),
                   "--torchscript", str(tmp_path / "ref.pt")],
        capture_output=True, text=True,
        env={"VQVDB_PLATFORM": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"},
    )
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "ref.pth").exists()
    mod = torch.jit.load(str(tmp_path / "ref.pt"))
    with torch.no_grad():
        idx = mod.encode(torch.zeros(1, 1, 8, 8, 8))
    assert tuple(idx.shape) == (1, 4, 4, 4)


def test_embed_header_round_trip(tmp_path):
    """bin_onnx.h-style embedding (ref: python/convert_to_header.py): the
    emitted C arrays must reproduce the source bytes and carry the symbol
    names OnnxBackendFactory links against."""
    import re

    from vqvdb_tpu.interop.embed import write_embed_header

    payload = bytes(range(256)) * 3 + b"\x00\xff"
    hdr = write_embed_header(tmp_path / "bin_onnx.h",
                             {"encoder_model_data": payload})
    text = hdr.read_text()
    assert "const unsigned char encoder_model_data[]" in text
    assert "const size_t encoder_model_data_size" in text
    got = bytes(int(h, 16) for h in re.findall(r"0x([0-9a-f]{2})", text))
    assert got == payload

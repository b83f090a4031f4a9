"""Torch checkpoint import: full-model numerical parity.

Builds a synthetic reference-layout state_dict, imports it, and checks our
jitted encode/decode against an independent torch-functional forward of the
same documented architecture (composed here from torch.nn.functional ops —
the numerics oracle, not reference code)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vqvdb_tpu.core.config import ModelConfig
from vqvdb_tpu.core.torch_import import import_state_dict, import_torch_checkpoint
from vqvdb_tpu.models.vqvae import encoder_apply, decoder_apply
from vqvdb_tpu.models.quantizer import nearest_indices

CFG = ModelConfig()  # scalar, D=128, K=256
G = torch.Generator().manual_seed(0)


def _t(*shape, scale=0.2):
    return torch.randn(*shape, generator=G) * scale


def _conv_sd(sd, name, cout, cin, k):
    sd[f"{name}.weight"] = _t(cout, cin, k, k, k)
    sd[f"{name}.bias"] = _t(cout)


def _gn_sd(sd, name, c):
    sd[f"{name}.weight"] = 1.0 + 0.1 * _t(c)
    sd[f"{name}.bias"] = 0.1 * _t(c)


def _rb_sd(sd, name, c):
    _gn_sd(sd, f"{name}.gn1", c)
    _conv_sd(sd, f"{name}.conv1", c, c, 3)
    _gn_sd(sd, f"{name}.gn2", c)
    _conv_sd(sd, f"{name}.conv2", c, c, 3)


def _attn_sd(sd, name, c, r=4):
    sd[f"{name}.fc.0.weight"] = _t(c // r, c)
    sd[f"{name}.fc.2.weight"] = _t(c, c // r)


def make_scalar_state_dict():
    sd = {}
    _conv_sd(sd, "encoder.pre.0", 16, 1, 3)
    _gn_sd(sd, "encoder.pre.1", 16)
    _rb_sd(sd, "encoder.pre.3", 16)
    _conv_sd(sd, "encoder.down", 32, 16, 4)
    _rb_sd(sd, "encoder.res_stack.0", 32)
    _attn_sd(sd, "encoder.attn", 32)
    _conv_sd(sd, "encoder.proj", 128, 32, 1)
    _conv_sd(sd, "decoder.stem.0", 64, 128, 3)
    _gn_sd(sd, "decoder.stem.1", 64)
    _rb_sd(sd, "decoder.res_stack.0", 64)
    _attn_sd(sd, "decoder.attn", 64)
    _conv_sd(sd, "decoder.up_conv", 256, 64, 3)
    _conv_sd(sd, "decoder.final", 1, 32, 3)
    sd["quantizer.embedding"] = _t(256, 128, scale=1.0)
    sd["quantizer.cluster_size"] = torch.ones(256)
    sd["quantizer.embed_avg"] = _t(256, 128, scale=1.0)
    return sd


# ---------------------------------------------------------------------------
# Independent torch-functional forward (the oracle)
# ---------------------------------------------------------------------------

def torch_rb(sd, p, x):
    h = F.relu(F.group_norm(x, 8, sd[f"{p}.gn1.weight"], sd[f"{p}.gn1.bias"]))
    h = F.conv3d(h, sd[f"{p}.conv1.weight"], sd[f"{p}.conv1.bias"], padding=1)
    h = F.relu(F.group_norm(h, 8, sd[f"{p}.gn2.weight"], sd[f"{p}.gn2.bias"]))
    h = F.conv3d(h, sd[f"{p}.conv2.weight"], sd[f"{p}.conv2.bias"], padding=1)
    return x + 0.1 * h


def torch_attn(sd, p, x):
    b, c = x.shape[:2]
    y = x.mean(dim=(2, 3, 4))
    y = torch.sigmoid(F.linear(F.relu(F.linear(y, sd[f"{p}.fc.0.weight"])),
                               sd[f"{p}.fc.2.weight"]))
    return x * y.view(b, c, 1, 1, 1)


def torch_encode(sd, x):
    h = F.conv3d(x, sd["encoder.pre.0.weight"], sd["encoder.pre.0.bias"], padding=1)
    h = F.relu(F.group_norm(h, 4, sd["encoder.pre.1.weight"], sd["encoder.pre.1.bias"]))
    h = torch_rb(sd, "encoder.pre.3", h)
    h = F.conv3d(h, sd["encoder.down.weight"], sd["encoder.down.bias"],
                 stride=2, padding=1)
    h = torch_rb(sd, "encoder.res_stack.0", h)
    h = torch_attn(sd, "encoder.attn", h)
    z = F.conv3d(h, sd["encoder.proj.weight"], sd["encoder.proj.bias"])
    flat = z.permute(0, 2, 3, 4, 1).reshape(-1, 128)
    e = sd["quantizer.embedding"]
    dist = flat.pow(2).sum(1, keepdim=True) + e.pow(2).sum(1) - 2 * flat @ e.t()
    return torch.argmin(dist, dim=1).view(z.shape[0], 4, 4, 4)


def torch_decode(sd, idx):
    e = sd["quantizer.embedding"]
    z = F.embedding(idx.long(), e).permute(0, 4, 1, 2, 3)
    h = F.conv3d(z, sd["decoder.stem.0.weight"], sd["decoder.stem.0.bias"], padding=1)
    h = F.relu(F.group_norm(h, 8, sd["decoder.stem.1.weight"], sd["decoder.stem.1.bias"]))
    h = torch_rb(sd, "decoder.res_stack.0", h)
    h = torch_attn(sd, "decoder.attn", h)
    h = F.conv3d(h, sd["decoder.up_conv.weight"], sd["decoder.up_conv.bias"], padding=1)
    b, c, d, hh, w = h.shape
    h = h.view(b, 32, 2, 2, 2, d, hh, w).permute(0, 1, 5, 2, 6, 3, 7, 4)
    h = h.reshape(b, 32, d * 2, hh * 2, w * 2)
    return torch.sigmoid(F.conv3d(h, sd["decoder.final.weight"],
                                  sd["decoder.final.bias"], padding=1))


def test_import_full_parity():
    sd = make_scalar_state_dict()
    params = import_state_dict(sd, CFG)

    x = torch.rand(5, 1, 8, 8, 8, generator=G)
    ref_idx = torch_encode(sd, x).numpy()
    ref_rec = torch_decode(sd, torch.from_numpy(ref_idx)).numpy()

    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))
    z = encoder_apply(params.encoder, xj, CFG)
    got_idx = np.asarray(
        nearest_indices(z.reshape(-1, 128), params.vq.embedding)
    ).reshape(5, 4, 4, 4)
    np.testing.assert_array_equal(got_idx, ref_idx)

    from vqvdb_tpu.models.vqvae import decode_from_indices
    got_rec = np.asarray(decode_from_indices(params, jnp.asarray(got_idx), CFG))
    np.testing.assert_allclose(got_rec.transpose(0, 4, 1, 2, 3), ref_rec,
                               rtol=2e-4, atol=2e-5)


def test_import_from_pth_file(tmp_path):
    sd = make_scalar_state_dict()
    # full train-checkpoint layout (dict with "state_dict")
    torch.save({"epoch": 3, "state_dict": sd}, tmp_path / "ck.pth")
    params = import_torch_checkpoint(tmp_path / "ck.pth", CFG)
    np.testing.assert_array_equal(np.asarray(params.vq.embedding),
                                  sd["quantizer.embedding"].numpy())


def test_import_rejects_wrong_codebook():
    sd = make_scalar_state_dict()
    sd["quantizer.embedding"] = torch.randn(128, 64)
    with pytest.raises(ValueError, match="codebook"):
        import_state_dict(sd, CFG)


def test_import_vec3_structure():
    cfg = ModelConfig(in_channels=3, embedding_dim=64, num_embeddings=256)
    sd = {}
    _conv_sd(sd, "encoder.pre.0", 64, 3, 3)
    _gn_sd(sd, "encoder.pre.1", 64)
    _rb_sd(sd, "encoder.pre.3", 64)
    _conv_sd(sd, "encoder.down1", 128, 64, 3)
    _rb_sd(sd, "encoder.res_stack.0", 128)
    _rb_sd(sd, "encoder.res_stack.1", 128)
    _attn_sd(sd, "encoder.attn", 128)
    _conv_sd(sd, "encoder.proj", 64, 128, 1)
    _conv_sd(sd, "decoder.stem.0", 128, 64, 3)
    _gn_sd(sd, "decoder.stem.1", 128)
    _rb_sd(sd, "decoder.res_stack.0", 128)
    _rb_sd(sd, "decoder.res_stack.1", 128)
    _attn_sd(sd, "decoder.attn", 128)
    _conv_sd(sd, "decoder.up_conv", 256, 128, 3)
    _conv_sd(sd, "decoder.final", 3, 32, 3)
    sd["quantizer.embedding"] = _t(256, 64, scale=1.0)
    sd["quantizer.cluster_size"] = torch.ones(256)
    sd["quantizer.embed_avg"] = _t(256, 64, scale=1.0)
    params = import_state_dict(sd, cfg)
    # sanity: runs through the vec3 graph
    x = jnp.asarray(np.random.default_rng(0).random((2, 8, 8, 8, 3), np.float32))
    z = encoder_apply(params.encoder, x, cfg)
    assert z.shape == (2, 4, 4, 4, 64)
    rec = decoder_apply(params.decoder, z, cfg)
    assert rec.shape == (2, 8, 8, 8, 3)

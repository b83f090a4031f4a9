"""Packed (TPU-co-designed) encoder — ModelConfig.encoder_arch='packed'.

The reference encoder's 8^3 16-channel stages are HBM-bound by architecture
(docs/ENCODE_ROOFLINE.md); the packed arch runs MXU-shaped from the first
layer (space-to-channel to the 4^3 grid, >=64-wide channels — the decoder
trunk's shapes). These tests cover: shape/config plumbing, fused-score
inference identity vs the plain graph, the full codec + container round
trip (container unchanged — a packed-encoder file is indistinguishable from
a reference-encoder file), training on both trainers, mesh (DP) encode
equivalence, artifact round trip incl. backward compat, and the interop
export gates (no reference counterpart exists for this graph).
"""

import dataclasses
import json
import struct
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqvdb_tpu.core.artifact import MAGIC, load_model, save_model
from vqvdb_tpu.core.config import CodecConfig, ModelConfig
from vqvdb_tpu.models import init_vqvae_params
from vqvdb_tpu.models.vqvae import (
    encode_to_indices,
    encoder_apply,
    packed_encoder_width,
    vqvae_forward,
)
from vqvdb_tpu.runtime.codec import VQCodec
from vqvdb_tpu.vdb.grid import LeafGrid

PCFG = ModelConfig(encoder_arch="packed")
PCFG_V3 = ModelConfig(in_channels=3, encoder_arch="packed")


@pytest.fixture(scope="module")
def packed_params():
    return init_vqvae_params(jax.random.key(7), PCFG)


def test_config_validation():
    with pytest.raises(ValueError, match="encoder_arch"):
        ModelConfig(encoder_arch="mxu")
    assert PCFG.index_shape == (4, 4, 4)
    assert packed_encoder_width(PCFG) == 64
    assert packed_encoder_width(PCFG_V3) == 128


def test_encoder_shapes(packed_params, rng):
    x = jnp.asarray(rng.random((4, 8, 8, 8, 1), np.float32))
    z = encoder_apply(packed_params.encoder, x, PCFG)
    assert z.shape == (4, 4, 4, 4, PCFG.embedding_dim)
    idx = encode_to_indices(packed_params, x, PCFG)
    assert idx.shape == (4, 4, 4, 4)
    assert idx.dtype == jnp.uint8

    p3 = init_vqvae_params(jax.random.key(1), PCFG_V3)
    x3 = jnp.asarray(rng.random((2, 8, 8, 8, 3), np.float32))
    assert encode_to_indices(p3, x3, PCFG_V3).shape == (2, 4, 4, 4)


def test_decoder_is_reference_decoder(packed_params):
    """The packed arch changes ONLY the encoder: decoder params must be the
    reference decoder tree (so decode perf/parity carry over unchanged)."""
    ref = init_vqvae_params(jax.random.key(7), ModelConfig())
    assert (jax.tree.map(lambda a: a.shape, ref.decoder)
            == jax.tree.map(lambda a: a.shape, packed_params.decoder))


def test_fused_score_matches_plain_graph(packed_params, rng):
    """The proj-into-score fold (ops/quantize.py) must stay exact for the
    packed encoder's W-wide features."""
    leaves = rng.random((33, 8, 8, 8, 1)).astype(np.float32)
    fused = VQCodec(packed_params, PCFG,
                    CodecConfig(batch_size=16, compute_dtype="float32",
                                fuse_proj_quantize=True))
    plain = VQCodec(packed_params, PCFG,
                    CodecConfig(batch_size=16, compute_dtype="float32",
                                fuse_proj_quantize=False))
    np.testing.assert_array_equal(fused.encode_leaves(leaves),
                                  plain.encode_leaves(leaves))


def test_codec_file_round_trip(packed_params, rng, tmp_path):
    """Full compress/decompress through the v3 container — the container is
    byte-compatible regardless of encoder arch."""
    codec = VQCodec(packed_params, PCFG,
                    CodecConfig(batch_size=16, compute_dtype="float32"))
    codec.check_latent_shape()
    n = 37
    grid = LeafGrid(
        name="density",
        origins=(np.arange(n * 3).reshape(n, 3) * 8).astype(np.int32),
        leaves=rng.random((n, 8, 8, 8, 1)).astype(np.float32),
    )
    path = tmp_path / "packed.vqvdb"
    codec.compress(grid, path)
    out, _ = codec.decompress(path)
    assert out[0].leaves.shape == (n, 8, 8, 8, 1)
    # Decode must equal the array-level path bit-for-bit.
    idx = codec.encode_leaves(grid.leaves)
    np.testing.assert_array_equal(out[0].leaves, codec.decode_indices(idx))


def test_train_step_runs_and_learns(rng):
    """Short host-loop training on easy data must reduce recon error."""
    from vqvdb_tpu.train.train import (TrainConfig, make_optimizer,
                                       make_train_state, train_step)

    tcfg = TrainConfig(epochs=1, batch_size=32, lr=3e-3,
                       compute_dtype="float32")
    state = make_train_state(jax.random.key(0), PCFG, tcfg, total_steps=60)
    opt = make_optimizer(tcfg, 60)
    # Learnable data: smooth per-leaf ramps (pure noise has no structure a
    # 64-latent VQ can capture, so recon_err would sit at data variance).
    ramp = np.linspace(0.0, 1.0, 8, dtype=np.float32)
    grid = (ramp[:, None, None] * ramp[None, :, None]
            * ramp[None, None, :])[None, ..., None]  # (1,8,8,8,1)
    amp = rng.random((32, 1, 1, 1, 1)).astype(np.float32)
    batch = jnp.asarray(amp * grid)
    first = None
    for _ in range(60):
        state, metrics, _ = train_step(state, batch, opt, PCFG, tcfg)
        if first is None:
            first = float(metrics["recon_err"])
    assert float(metrics["recon_err"]) < first * 0.7


def test_device_resident_trainer(rng):
    from vqvdb_tpu.train.fast import train_on_device
    from vqvdb_tpu.train.train import TrainConfig

    leaves = rng.random((96, 8, 8, 8, 1)).astype(np.float32)
    tcfg = TrainConfig(epochs=2, batch_size=32, compute_dtype="float32",
                       val_fraction=0.0)
    state, trace = train_on_device(leaves, PCFG, tcfg, log_fn=lambda *_: None)
    assert trace.shape[0] == 2
    assert np.isfinite(trace[:, 0]).all()


def test_mesh_encode_matches_single_device(packed_params, rng):
    """DP-inference invariant carries over to the packed arch."""
    from vqvdb_tpu.parallel.mesh import make_mesh

    leaves = rng.random((48, 8, 8, 8, 1)).astype(np.float32)
    single = VQCodec(packed_params, PCFG,
                     CodecConfig(batch_size=16, compute_dtype="float32"))
    mesh = make_mesh()
    sharded = VQCodec(packed_params, PCFG,
                      CodecConfig(batch_size=16, compute_dtype="float32"),
                      mesh=mesh)
    np.testing.assert_array_equal(single.encode_leaves(leaves),
                                  sharded.encode_leaves(leaves))


def test_artifact_round_trip(packed_params, tmp_path):
    path = tmp_path / "packed.vqmodel"
    save_model(path, packed_params, PCFG)
    params2, cfg2 = load_model(path)
    assert cfg2 == PCFG
    np.testing.assert_array_equal(
        np.asarray(params2.encoder["stem_conv"]["w"]),
        np.asarray(packed_params.encoder["stem_conv"]["w"]))


def test_artifact_backward_compat(tmp_path):
    """Artifacts written before encoder_arch existed (no key in the config
    JSON) must load as the reference arch."""
    cfg = ModelConfig()
    params = init_vqvae_params(jax.random.key(0), cfg)
    path = tmp_path / "old.vqmodel"
    save_model(path, params, cfg)
    raw = path.read_bytes()
    (cfg_len,) = struct.unpack("<I", raw[len(MAGIC):len(MAGIC) + 4])
    start = len(MAGIC) + 4
    doc = json.loads(raw[start:start + cfg_len])
    assert doc.pop("encoder_arch") == "reference"
    old_json = json.dumps(doc).encode()
    patched = (raw[:len(MAGIC)] + struct.pack("<I", len(old_json))
               + old_json + raw[start + cfg_len:])
    old_path = tmp_path / "pre_arch.vqmodel"
    old_path.write_bytes(patched)
    _, cfg2 = load_model(old_path)
    assert cfg2.encoder_arch == "reference"


def test_interop_gates(packed_params, tmp_path):
    """torch interop stays reference-only (the packed graph has no torch
    module tree); ONNX export of packed archs works (the ONNX graph is
    built from our own ops — parity gates live in tests/test_interop.py)."""
    from vqvdb_tpu.core.torch_import import import_state_dict
    from vqvdb_tpu.interop.onnx_export import export_onnx
    from vqvdb_tpu.interop.torch_export import export_state_dict

    with pytest.raises(ValueError, match="packed"):
        export_state_dict(packed_params, PCFG)
    with pytest.raises(ValueError, match="reference"):
        import_state_dict({}, PCFG)
    paths = export_onnx(tmp_path / "onnx", packed_params, PCFG)
    assert Path(paths["encoder"]).exists() and Path(paths["decoder"]).exists()


def test_forward_training_graph(packed_params, rng):
    x = jnp.asarray(rng.random((8, 8, 8, 8, 1), np.float32))
    z, recon, new_vq, vq_loss, ppl = vqvae_forward(packed_params, x, PCFG)
    assert z.shape == (8, 4, 4, 4, PCFG.embedding_dim)
    assert recon.shape == x.shape
    assert np.isfinite(float(vq_loss))


def test_packed_lite_variant(rng):
    """packed_lite (pointwise RB closer): shapes, fused-score identity,
    and file round trip."""
    cfg = ModelConfig(encoder_arch="packed_lite")
    params = init_vqvae_params(jax.random.key(2), cfg)
    assert params.encoder["rb"]["conv2"]["w"].shape == (1, 1, 1, 64, 64)
    x = jnp.asarray(rng.random((4, 8, 8, 8, 1), np.float32))
    assert encode_to_indices(params, x, cfg).shape == (4, 4, 4, 4)

    leaves = rng.random((19, 8, 8, 8, 1)).astype(np.float32)
    fused = VQCodec(params, cfg, CodecConfig(batch_size=8,
                                             compute_dtype="float32"))
    plain = VQCodec(params, cfg,
                    CodecConfig(batch_size=8, compute_dtype="float32",
                                fuse_proj_quantize=False))
    np.testing.assert_array_equal(fused.encode_leaves(leaves),
                                  plain.encode_leaves(leaves))


@pytest.mark.parametrize("in_ch", [1, 3], ids=["scalar", "vec3"])
def test_packed_stem_variant(in_ch, rng):
    """packed_stem: an 8^3 k3 stem (C -> W/8) + GN + relu BEFORE the
    space-to-channel pack, then a pointwise trunk stem — near-packed FLOPs
    with an 8^3 receptive field. Checks the structural contract, encode
    shape, fused-vs-plain score agreement (near-tie tolerant at random
    init), and the file round trip."""
    cfg = ModelConfig(in_channels=in_ch, encoder_arch="packed_stem")
    params = init_vqvae_params(jax.random.key(3), cfg)
    w = packed_encoder_width(cfg)
    # 8^3 stem lands the pack exactly on the trunk width W.
    assert params.encoder["pre_conv"]["w"].shape == (3, 3, 3, in_ch, w // 8)
    # Trunk stem is pointwise (the spatial mixing moved to 8^3 + the RB).
    assert params.encoder["stem_conv"]["w"].shape == (1, 1, 1, w, w)

    x = jnp.asarray(rng.random((4, 8, 8, 8, in_ch), np.float32))
    assert encode_to_indices(params, x, cfg).shape == (4, 4, 4, 4)

    leaves = rng.random((33, 8, 8, 8, in_ch)).astype(np.float32)
    fused = VQCodec(params, cfg, CodecConfig(batch_size=16,
                                             compute_dtype="float32"))
    plain = VQCodec(params, cfg,
                    CodecConfig(batch_size=16, compute_dtype="float32",
                                fuse_proj_quantize=False))
    fi = np.asarray(fused.encode_leaves(leaves)).ravel()
    pi = np.asarray(plain.encode_leaves(leaves)).ravel()
    # At random init codebook distances can near-tie; the fused score GEMM
    # (h @ (-2 P E)^T + c) and the plain proj-then-distance path round
    # differently, so a tiny flip rate is fp, not a graph bug. Any flip
    # must be a genuine near-tie under the PLAIN metric.
    flips = np.flatnonzero(fi != pi)
    assert flips.size <= max(2, fi.size // 100), f"{flips.size}/{fi.size}"
    if flips.size:
        import vqvdb_tpu.models.blocks as blocks
        from vqvdb_tpu.models.vqvae import encoder_features

        h = encoder_features(params.encoder, jnp.asarray(leaves), cfg)
        z = np.asarray(blocks.conv3d(params.encoder["proj"], h))
        flat = z.reshape(-1, cfg.embedding_dim)
        emb = np.asarray(params.vq.embedding)
        for i in flips:
            da = ((flat[i] - emb[fi[i]]) ** 2).sum()
            db = ((flat[i] - emb[pi[i]]) ** 2).sum()
            assert abs(da - db) < 1e-3 * max(da, db, 1e-6)

    # File round trip: the container is arch-agnostic.
    import tempfile

    n = 21
    grid = LeafGrid(
        name="density",
        origins=(np.arange(n * 3).reshape(n, 3) * 8).astype(np.int32),
        leaves=rng.random((n, 8, 8, 8, in_ch)).astype(np.float32),
    )
    with tempfile.TemporaryDirectory() as td:
        path = Path(td) / "stem.vqvdb"
        fused.compress(grid, path)
        out, _ = fused.decompress(path)
    idx = fused.encode_leaves(grid.leaves)
    np.testing.assert_array_equal(out[0].leaves, fused.decode_indices(idx))

"""The v6 residual-correction tier through the full codec.

Key property: the corrected output's per-voxel error is bounded by the
quantization step alone — int8 mode by scale/2 (scale = per-leaf max error
/ 127), f16 mode by one half-precision rounding of the error. This holds
because the stored residual is measured against the SAME decode executable
decompress runs (runtime/residual.py), so the test uses an UNTRAINED model:
the lossy reconstruction is garbage, and the bound must hold anyway.
"""

import jax
import numpy as np
import pytest

from vqvdb_tpu.core.config import CodecConfig, ModelConfig
from vqvdb_tpu.format.vqvdb import VqvdbReader
from vqvdb_tpu.models import init_vqvae_params
from vqvdb_tpu.runtime.codec import VQCodec
from vqvdb_tpu.runtime.residual import apply_residual, quantize_residual
from vqvdb_tpu.train.synthetic import smoke_grid, velocity_grid
from vqvdb_tpu.utils.errors import ModelMismatchError
from vqvdb_tpu.vdb.grid import psnr


def _codec(channels=1, batch=128, mesh=None, **model_kw):
    mcfg = ModelConfig(in_channels=channels, embedding_dim=32,
                       num_embeddings=64, **model_kw)
    params = init_vqvae_params(jax.random.key(0), mcfg)
    return VQCodec(params, mcfg,
                   CodecConfig(batch_size=batch, compute_dtype="float32"),
                   mesh=mesh)


def test_quantize_apply_unit():
    rng = np.random.default_rng(0)
    err = rng.standard_normal((5, 8, 8, 8, 1)).astype(np.float32) * 0.03
    scales, q = quantize_residual(err, "int8")
    assert q.dtype == np.int8 and scales.dtype == np.float32
    rec = np.zeros_like(err)
    apply_residual(rec, scales, q)
    bound = scales[:, None, None, None, None] / 2
    assert np.all(np.abs(err - rec) <= bound + 1e-9)

    _, q16 = quantize_residual(err, "f16")
    rec16 = np.zeros_like(err)
    apply_residual(rec16, None, q16)
    np.testing.assert_array_equal(rec16, err.astype(np.float16).astype(
        np.float32).reshape(rec16.shape))

    with pytest.raises(ValueError):
        quantize_residual(err, "int16")


@pytest.mark.parametrize("mode", ["int8", "f16"])
def test_roundtrip_error_bound_untrained_model(tmp_path, mode):
    codec = _codec()
    g = smoke_grid(48, seed=3)
    x = g.leaves  # [N,8,8,8,1]
    path = tmp_path / "r.vqvdb"
    codec.compress(g, path, residual=mode)

    (got,), _ = codec.decompress(path)
    np.testing.assert_array_equal(got.origins, g.origins)

    # The lossy reconstruction (indices only) for the per-leaf error e.
    with VqvdbReader(path) as r:
        meta = r.next_grid_metadata()
        idx, org, scales, stored = r.next_batch_residual(meta.total_blocks)
    lossy = codec.decode_indices(idx)
    e = x - lossy
    err_corrected = np.abs(x - got.leaves)
    if mode == "int8":
        bound = scales[:, None, None, None, None] / 2
        assert np.all(err_corrected <= bound + 1e-9)
        # and the bound is tight to the actual error magnitude
        np.testing.assert_allclose(
            scales, np.abs(e).reshape(e.shape[0], -1).max(1) / 127,
            rtol=1e-6)
    else:
        # one f16 rounding of e: relative 2^-11 for normals plus the
        # subnormal quantum
        assert np.all(err_corrected <= np.abs(e) * 2.0**-10 + 1e-6)

    # The tier must transform garbage into near-original: an untrained
    # model reconstructs at single-digit PSNR, corrected output is >45 dB.
    assert psnr(got.leaves[..., 0], x[..., 0]) > 45.0
    assert psnr(lossy[..., 0], x[..., 0]) < 25.0


def test_vec3_roundtrip_and_stream(tmp_path):
    codec = _codec(channels=3)
    g = velocity_grid(48, seed=4)
    path = tmp_path / "v.vqvdb"
    codec.compress(g, path, residual="int8")
    with VqvdbReader(path) as r:
        meta = r.next_grid_metadata()
        assert meta.residual_mode == 1 and meta.residual_channels == 3

    # decode_stream applies the correction batch by batch
    rows, orgs = [], []
    for _, leaves, org in codec.decode_stream(path):
        rows.append(leaves)
        orgs.append(org)
    got = np.concatenate(rows)
    np.testing.assert_array_equal(np.concatenate(orgs), g.origins)
    assert psnr(got, g.leaves) > 45.0


def test_selection_keeps_residuals_aligned(tmp_path):
    """bbox filtering and batch regrouping must slice the residual stream
    with the indices — misalignment would apply chunk A's correction to
    chunk B and blow the error bound."""
    codec = _codec(batch=64)
    g = smoke_grid(64, seed=5)
    path = tmp_path / "s.vqvdb"
    codec.compress(g, path, residual="int8")

    lo, hi = (0, 0, 0), (32, 32, 32)
    (sel,), _ = codec.decompress(path, bbox=(lo, hi))
    keep = np.all(g.origins < hi, axis=1) & np.all(g.origins + 8 > lo, axis=1)
    np.testing.assert_array_equal(sel.origins, g.origins[keep])
    x = g.leaves[keep]
    scales = []
    with VqvdbReader(path) as r:
        r.next_grid_metadata()
        while r.has_next():  # one frame per compress batch
            _, _, s, _ = r.next_batch_residual(1 << 30)
            scales.append(s)
    scales = np.concatenate(scales)
    bound = scales[keep][:, None, None, None, None] / 2
    assert np.all(np.abs(x - sel.leaves) <= bound + 1e-9)


def test_mixed_residual_and_plain_grids(tmp_path):
    codec = _codec()
    g1 = smoke_grid(48, seed=6, name="hero")
    g2 = smoke_grid(48, seed=7, name="bg")
    p_res = tmp_path / "hero.vqvdb"
    p_plain = tmp_path / "bg.vqvdb"
    codec.compress(g1, p_res, residual="f16")
    codec.compress(g2, p_plain, format_version=5)
    (r1,), _ = codec.decompress(p_res)
    (r2,), _ = codec.decompress(p_plain)
    assert psnr(r1.leaves[..., 0], g1.leaves[..., 0]) > 45.0
    # plain grid: bit-identical to the ordinary lossy path
    with VqvdbReader(p_plain) as r:
        meta = r.next_grid_metadata()
        idx, _ = r.next_batch(meta.total_blocks)
    np.testing.assert_array_equal(r2.leaves, codec.decode_indices(idx))


def test_residual_channel_mismatch_raises(tmp_path):
    codec3 = _codec(channels=3)
    g = velocity_grid(48, seed=8)
    path = tmp_path / "m.vqvdb"
    codec3.compress(g, path, residual="int8")
    codec1 = _codec(channels=1)
    with pytest.raises(ModelMismatchError):
        codec1.decompress(path)


def test_compress_validation(tmp_path):
    codec = _codec()
    g = smoke_grid(48, seed=9)
    with pytest.raises(ValueError):
        codec.compress(g, tmp_path / "x.vqvdb", residual="int4")
    with pytest.raises(ValueError):
        codec.compress(g, tmp_path / "x.vqvdb", residual="int8",
                       format_version=5)


def test_mesh_compress_matches_single_device(tmp_path):
    """N-chip residual compress must produce byte-identical files to
    1-chip (the DP invariant extends to the v6 tier)."""
    from vqvdb_tpu.parallel.mesh import make_mesh

    g = smoke_grid(48, seed=10)
    p1 = tmp_path / "one.vqvdb"
    pn = tmp_path / "mesh.vqvdb"
    _codec(batch=64).compress(g, p1, residual="int8")
    _codec(batch=64, mesh=make_mesh(4)).compress(g, pn, residual="int8")
    assert p1.read_bytes() == pn.read_bytes()

    codec = _codec(batch=64, mesh=make_mesh(4))
    (got,), _ = codec.decompress(pn)
    (ref,), _ = _codec(batch=64).decompress(p1)
    np.testing.assert_array_equal(got.leaves, ref.leaves)


def test_residual_tol_floor_and_bound(tmp_path):
    """residual_tol floors the step: error <= max(leaf_max_err/254, tol),
    well-fit leaves quantize to zeros, and files get smaller."""
    rng = np.random.default_rng(2)
    err = rng.standard_normal((6, 8, 8, 8, 1)).astype(np.float32)
    err[:4] *= 1e-5   # "well-fit" leaves
    err[4:] *= 0.05   # badly-fit leaves
    tol = 1e-3
    scales, q = quantize_residual(err, "int8", tol)
    # floor active exactly where leaf max error < 254*tol
    amax = np.abs(err).reshape(6, -1).max(1)
    np.testing.assert_allclose(scales, np.maximum(amax / 127, 2 * tol),
                               rtol=1e-6)
    assert np.all(q[:4] == 0)  # 1e-5 noise under a 2e-3 step -> zeros
    rec = np.zeros_like(err)
    apply_residual(rec, scales, q)
    assert np.all(np.abs(err - rec) <= np.maximum(amax / 254, tol)[
        :, None, None, None, None] + 1e-9)

    with pytest.raises(ValueError):
        quantize_residual(err, "f16", tol)

    # Through the file: a tol'd file must be meaningfully smaller than the
    # max-precision tier on content the model fits well in places.
    codec = _codec()
    g = smoke_grid(48, seed=11)
    p_max = tmp_path / "max.vqvdb"
    p_tol = tmp_path / "tol.vqvdb"
    codec.compress(g, p_max, residual="int8")
    # untrained model: large errors; pick tol near the typical error so
    # the floor engages broadly
    codec.compress(g, p_tol, residual="int8", residual_tol=0.05)
    assert p_tol.stat().st_size < p_max.stat().st_size
    (got,), _ = codec.decompress(p_tol)
    assert np.abs(got.leaves - g.leaves).max() <= 0.05 + 1e-6

    with pytest.raises(ValueError):
        codec.compress(g, tmp_path / "x.vqvdb", residual="f16",
                       residual_tol=0.01)


def test_residual_over_rvq_model(tmp_path):
    """The residual tier composes with residual-VQ (S=2): indices are
    [4,4,4,2], the correction bound still holds."""
    codec = _codec(num_quantizers=2)
    g = smoke_grid(48, seed=12)
    path = tmp_path / "rvq_res.vqvdb"
    codec.compress(g, path, residual="int8")
    with VqvdbReader(path) as r:
        meta = r.next_grid_metadata()
        assert meta.latent_shape == (4, 4, 4, 2)
        assert meta.residual_mode == 1
    (got,), _ = codec.decompress(path)
    assert psnr(got.leaves[..., 0], g.leaves[..., 0]) > 45.0

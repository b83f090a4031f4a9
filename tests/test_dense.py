"""Device-resident dense paths (runtime/dense.py).

The oracle for every test is the host pipeline the module replaces:
`decode_indices` + `LeafGrid.to_dense` (scatter) and `LeafGrid.from_dense`
+ `encode_leaves` (gather). Same decode/encode graphs, so results must
agree to float tolerance; sparsification decisions must agree exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqvdb_tpu import api
from vqvdb_tpu.core.config import CodecConfig, ModelConfig
from vqvdb_tpu.models import init_vqvae_params
from vqvdb_tpu.runtime.codec import VQCodec
from vqvdb_tpu.runtime.dense import (
    decode_file_to_dense,
    decode_to_dense,
    encode_dense_to_file,
    encode_from_dense,
)
from vqvdb_tpu.utils.errors import VqvdbError
from vqvdb_tpu.vdb.grid import LeafGrid

CFG = ModelConfig()


@pytest.fixture(scope="module")
def codec():
    params = init_vqvae_params(jax.random.key(0), CFG)
    # Small batch so every test exercises multi-step scans + padded tails.
    return VQCodec(params, CFG, CodecConfig(batch_size=16,
                                            compute_dtype="float32"))


def _sparse_grid(rng, bdims=(5, 4, 3), fill=0.4, background=0.0):
    """A LeafGrid occupying a random subset of a bdims block box."""
    n_blocks = int(np.prod(bdims))
    active = rng.random(n_blocks) < fill
    active[0] = True  # pin the bbox lower corner
    active[-1] = True  # and the upper corner
    (flat,) = np.nonzero(active)
    bi = np.stack(np.unravel_index(flat, bdims), axis=1)
    origins = (bi * 8).astype(np.int32)
    leaves = rng.random((flat.size, 8, 8, 8), np.float32)
    return LeafGrid("density", origins, leaves, background=background)


def _host_dense(codec, idx, grid):
    rec = codec.decode_indices(idx)
    g = LeafGrid("d", grid.origins, rec, background=grid.background)
    return g.to_dense()


def test_decode_to_dense_matches_host_scatter(codec, rng):
    g = _sparse_grid(rng)
    idx = codec.encode_leaves(g.leaves)
    dense, lo = decode_to_dense(codec, idx, g.origins)
    host, hlo = _host_dense(codec, idx, g)
    np.testing.assert_array_equal(lo, hlo)
    assert dense.shape == host.shape
    np.testing.assert_allclose(np.asarray(dense), host, atol=1e-6)


def test_decode_to_dense_background_fills_inactive(codec, rng):
    g = _sparse_grid(rng, bdims=(3, 3, 3), fill=0.3)
    idx = codec.encode_leaves(g.leaves)
    dense, lo = decode_to_dense(codec, idx, g.origins, background=7.5)
    d = np.asarray(dense)
    # Every block NOT in the grid must be exactly the background value.
    occupied = {tuple(o // 8) for o in g.origins}
    for b in np.ndindex(3, 3, 3):
        blk = d[b[0] * 8:(b[0] + 1) * 8, b[1] * 8:(b[1] + 1) * 8,
                b[2] * 8:(b[2] + 1) * 8]
        if b not in occupied:
            np.testing.assert_array_equal(blk, np.full_like(blk, 7.5))


def test_decode_to_dense_pinned_frame(codec, rng):
    """lo/shape pin the output frame (fixed compile across frames)."""
    g = _sparse_grid(rng, bdims=(2, 2, 2), fill=1.0)
    idx = codec.encode_leaves(g.leaves)
    dense, lo = decode_to_dense(codec, idx, g.origins + 16,
                                lo=(0, 0, 0), shape=(48, 48, 48))
    assert dense.shape == (48, 48, 48, 1)
    np.testing.assert_array_equal(lo, [0, 0, 0])
    d = np.asarray(dense)
    assert np.all(d[:16] == 0) and np.any(d[16:32, 16:32, 16:32] != 0)


def test_decode_to_dense_rejects_out_of_frame(codec, rng):
    g = _sparse_grid(rng, bdims=(2, 2, 2), fill=1.0)
    idx = codec.encode_leaves(g.leaves)
    with pytest.raises(VqvdbError):
        decode_to_dense(codec, idx, g.origins, lo=(0, 0, 0), shape=(8, 8, 8))
    with pytest.raises(VqvdbError):
        decode_to_dense(codec, idx, g.origins + 1)  # not leaf-aligned


def test_decode_to_dense_empty(codec):
    dense, lo = decode_to_dense(
        codec, np.zeros((0, 4, 4, 4), np.uint8), np.zeros((0, 3), np.int32))
    assert dense.shape == (0, 0, 0, 1)


def test_encode_from_dense_matches_host_sparsify(codec, rng):
    g = _sparse_grid(rng, bdims=(4, 3, 2), fill=0.5)
    dense, lo = g.to_dense()
    idx_dev, org_dev = encode_from_dense(codec, dense[..., 0], origin=lo)
    # Host oracle: from_dense picks the same active set...
    g2 = LeafGrid.from_dense("d", dense, origin=lo)
    np.testing.assert_array_equal(org_dev, g2.origins)
    # ...and the encoded indices agree with the batched host encoder.
    idx_host = codec.encode_leaves(g2.leaves)
    np.testing.assert_array_equal(idx_dev, idx_host)


def test_encode_from_dense_tolerance_and_background(codec, rng):
    bg = 0.25
    dense = np.full((24, 24, 24), bg, np.float32)
    dense[8:16, 8:16, 8:16] += 0.3  # one clearly active block
    dense[0:8, 0:8, 0:8] += 1e-4  # below tolerance
    idx, org = encode_from_dense(codec, dense, background=bg, tolerance=1e-3)
    np.testing.assert_array_equal(org, [[8, 8, 8]])
    assert idx.shape == (1, 4, 4, 4)


def test_encode_from_dense_pads_unaligned_extent(codec, rng):
    dense = rng.random((12, 20, 9)).astype(np.float32)
    idx, org = encode_from_dense(codec, dense)
    g = LeafGrid.from_dense("d", dense)
    np.testing.assert_array_equal(org, g.origins)
    np.testing.assert_array_equal(idx, codec.encode_leaves(g.leaves))


def test_encode_from_dense_empty(codec):
    idx, org = encode_from_dense(codec, np.zeros((16, 16, 16), np.float32))
    assert idx.shape == (0, 4, 4, 4) and org.shape == (0, 3)


def test_encode_from_dense_accepts_device_array(codec, rng):
    dense = jnp.asarray(rng.random((16, 16, 16)).astype(np.float32))
    idx, org = encode_from_dense(codec, dense)
    assert idx.shape[0] == 8


def test_encode_from_dense_channel_mismatch(codec, rng):
    with pytest.raises(VqvdbError):
        encode_from_dense(codec, rng.random((8, 8, 8, 3)).astype(np.float32))


def test_file_roundtrip_through_dense_paths(codec, tmp_path, rng):
    """encode_dense_to_file -> decode_file_to_dense == host pipeline."""
    g = _sparse_grid(rng, bdims=(3, 4, 2), fill=0.6)
    dense_in, lo = g.to_dense()
    path = tmp_path / "dense.vqvdb"
    stats = encode_dense_to_file(codec, dense_in, path, name="density",
                                 origin=lo)
    assert stats["leaves"] == g.num_leaves
    out = decode_file_to_dense(codec, path)
    assert len(out) == 1 and out[0]["name"] == "density"
    np.testing.assert_array_equal(out[0]["lo"], lo)
    # Oracle: the ordinary file decode + host scatter.
    grids, _ = codec.decompress(path)
    host, hlo = grids[0].to_dense()
    np.testing.assert_allclose(np.asarray(out[0]["dense"]), host, atol=1e-6)


def test_decode_file_to_dense_multigrid(codec, tmp_path, rng):
    g1 = _sparse_grid(rng, bdims=(2, 2, 2), fill=1.0)
    g2 = _sparse_grid(rng, bdims=(3, 2, 2), fill=0.7)
    g2.name = "temperature"
    path = tmp_path / "two.vqvdb"
    codec.compress([g1, g2], path)
    out = decode_file_to_dense(codec, path)
    assert [o["name"] for o in out] == ["density", "temperature"]
    grids, _ = codec.decompress(path)
    for o, g in zip(out, grids):
        host, _ = g.to_dense()
        np.testing.assert_allclose(np.asarray(o["dense"]), host, atol=1e-6)


def test_api_wrappers(codec, tmp_path, rng):
    g = _sparse_grid(rng, bdims=(2, 2, 2), fill=1.0)
    dense_in, lo = g.to_dense()
    path = tmp_path / "api.vqvdb"
    api.encode_dense(dense_in, codec, path, origin=lo)
    out = api.decode_dense(path, codec)
    assert out[0]["dense"].shape == dense_in.shape


def test_vec3_dense_roundtrip(rng):
    cfg = ModelConfig(in_channels=3, embedding_dim=64)
    params = init_vqvae_params(jax.random.key(1), cfg)
    codec = VQCodec(params, cfg,
                    CodecConfig(batch_size=8, compute_dtype="float32"))
    n = 11
    origins = (np.stack(np.unravel_index(np.arange(n), (3, 2, 2)), 1)
               * 8).astype(np.int32)
    leaves = rng.standard_normal((n, 8, 8, 8, 3)).astype(np.float32) * 0.3
    idx = codec.encode_leaves(leaves)
    dense, lo = decode_to_dense(codec, idx, origins)
    assert dense.shape[-1] == 3
    rec = codec.decode_indices(idx)
    host, _ = LeafGrid("v", origins, rec).to_dense()
    np.testing.assert_allclose(np.asarray(dense), host, atol=1e-6)
    # Gather side.
    idx2, org2 = encode_from_dense(codec, dense, tolerance=-1.0)
    assert org2.shape[0] == 12  # every block of the 3x2x2 box is active
    np.testing.assert_array_equal(org2[:, 0] % 8, 0)


@pytest.fixture(scope="module")
def mesh_codec():
    from vqvdb_tpu.parallel.mesh import make_mesh

    params = init_vqvae_params(jax.random.key(0), CFG)
    return VQCodec(params, CFG,
                   CodecConfig(batch_size=16, compute_dtype="float32"),
                   mesh=make_mesh())


def test_mesh_dense_decode_bit_identical(codec, mesh_codec, rng):
    """x-slab-sharded dense decode == single-device dense decode, bit for
    bit (VERDICT r3 item 2) — incl. a skewed occupancy (slabs with zero
    leaves) and a bbox thinner than the mesh along x."""
    for bdims in ((17, 3, 2), (2, 5, 5)):
        g = _sparse_grid(rng, bdims=bdims)
        idx = codec.encode_leaves(g.leaves)
        dense, lo = decode_to_dense(codec, idx, g.origins)
        mdense, mlo = decode_to_dense(mesh_codec, idx, g.origins)
        np.testing.assert_array_equal(lo, mlo)
        np.testing.assert_array_equal(np.asarray(mdense), np.asarray(dense))


def test_mesh_encode_dense_bit_identical(codec, mesh_codec, rng):
    """x-slab-sharded dense encode == single-device dense encode, bit for
    bit (VERDICT r4 item 4) — incl. ragged occupancy (slabs with zero
    active blocks), an x extent thinner than the mesh, and a nonzero
    background with tolerance sparsification."""
    for bdims in ((17, 3, 2), (2, 5, 5)):
        g = _sparse_grid(rng, bdims=bdims, background=0.1)
        dense, _ = g.to_dense()
        kw = dict(origin=(0, 0, 0), background=0.1, tolerance=0.05)
        idx, org = encode_from_dense(codec, dense, **kw)
        midx, morg = encode_from_dense(mesh_codec, dense, **kw)
        np.testing.assert_array_equal(org, morg)
        np.testing.assert_array_equal(idx, midx)
    # Unaligned extent (forces padding on every axis incl. the slab axis).
    vol = np.zeros((20, 11, 9), np.float32)
    vol[3:9, 2:7, 1:5] = rng.random((6, 5, 4)).astype(np.float32)
    idx, org = encode_from_dense(codec, vol)
    midx, morg = encode_from_dense(mesh_codec, vol)
    np.testing.assert_array_equal(org, morg)
    np.testing.assert_array_equal(idx, midx)


def test_mesh_encode_dense_empty(mesh_codec):
    idx, org = encode_from_dense(mesh_codec, np.zeros((8, 8, 8), np.float32))
    assert idx.shape[0] == 0 and org.shape == (0, 3)


def test_multihost_dense_encode_rejected(mesh_codec):
    mesh_codec._multihost = True
    try:
        with pytest.raises(VqvdbError, match="single-process"):
            encode_from_dense(mesh_codec, np.zeros((8, 8, 8), np.float32))
    finally:
        mesh_codec._multihost = False


def test_multihost_dense_rejected(mesh_codec, rng):
    """The mesh dense path builds host-global shard inputs, which only a
    single-process mesh can address — multihost codecs must get a typed
    error, not an obscure JAX device failure."""
    from vqvdb_tpu.utils.errors import VqvdbError

    g = _sparse_grid(rng, bdims=(2, 2, 2))
    idx = np.zeros((g.num_leaves, 4, 4, 4), np.uint8)
    mesh_codec._multihost = True
    try:
        with pytest.raises(VqvdbError, match="single-process"):
            decode_to_dense(mesh_codec, idx, g.origins)
    finally:
        mesh_codec._multihost = False


def _residual_file(codec, tmp_path, rng, mode, name="dense_res"):
    g = _sparse_grid(rng, bdims=(6, 3, 2))
    path = tmp_path / f"{name}_{mode}.vqvdb"
    codec.compress(g, path, residual=mode)
    return g, path


@pytest.mark.parametrize("mode", ["int8", "f16"])
def test_dense_file_decode_applies_residual(codec, tmp_path, rng, mode):
    """v6 archives decode residual-corrected on the dense path (round 3
    decoded indices-only with a warning). Host-path agreement is to the
    same 1e-6 standard as the plain dense tests (the scan-embedded decode
    compiles separately from the standalone decode executable — 1-ulp
    differences pre-date residuals), and the tier's error bound must hold
    on the dense output."""
    g, path = _residual_file(codec, tmp_path, rng, mode)
    host_grids, _ = codec.decompress(path)
    host_dense, _ = host_grids[0].to_dense()
    out = decode_file_to_dense(codec, path)
    d = np.asarray(out[0]["dense"])
    np.testing.assert_allclose(d, host_dense, atol=1e-6)
    # The near-lossless bound holds on the dense path: corrected output is
    # far closer to the source than the indices-only decode.
    src, _ = g.to_dense()
    raw, _ = LeafGrid("d", g.origins,
                      codec.decode_indices(codec.encode_leaves(g.leaves))
                      ).to_dense()
    err_corr = np.abs(d - src).max()
    err_raw = np.abs(raw - src).max()
    assert err_corr < err_raw * 0.1
    if mode == "f16":
        assert err_corr < 2e-3  # one half-precision rounding + 1 ulp


@pytest.mark.parametrize("mode", ["int8", "f16"])
def test_mesh_dense_residual_bit_identical(codec, mesh_codec, tmp_path,
                                           rng, mode):
    g, path = _residual_file(codec, tmp_path, rng, mode, name="mesh")
    single = decode_file_to_dense(codec, path)
    mesh = decode_file_to_dense(mesh_codec, path)
    np.testing.assert_array_equal(np.asarray(mesh[0]["dense"]),
                                  np.asarray(single[0]["dense"]))

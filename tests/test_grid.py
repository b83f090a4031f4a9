"""LeafGrid sparse container tests: dense round trips, npy persistence."""

import numpy as np
import pytest

from vqvdb_tpu.vdb.grid import LeafGrid, mse, psnr, split_mse


def test_from_dense_to_dense_round_trip(rng):
    dense = np.zeros((24, 16, 32), np.float32)
    dense[2:10, 3:9, 4:12] = rng.random((8, 6, 8)).astype(np.float32)
    dense[16:24, 8:16, 24:32] = 1.0
    g = LeafGrid.from_dense("d", dense)
    assert g.channels == 1
    assert (g.origins % 8 == 0).all()
    back, lo = g.to_dense()
    # Dense round trip must reproduce all active regions exactly.
    hi = lo + np.array(back.shape[:3])
    np.testing.assert_array_equal(
        back[..., 0],
        dense[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]],
    )


def test_from_dense_sparsity(rng):
    dense = np.zeros((64, 64, 64), np.float32)
    dense[0:8, 0:8, 0:8] = 0.5  # exactly one active leaf
    g = LeafGrid.from_dense("s", dense)
    assert g.num_leaves == 1
    np.testing.assert_array_equal(g.origins[0], [0, 0, 0])


def test_background_and_tolerance(rng):
    dense = np.full((16, 16, 16), 2.0, np.float32)
    dense[8:16, 8:16, 8:16] += 0.5
    g = LeafGrid.from_dense("bg", dense, background=2.0, tolerance=0.1)
    assert g.num_leaves == 1
    back, lo = g.to_dense()
    assert back[0, 0, 0, 0] == pytest.approx(2.5)


def test_vec3_channels(rng):
    dense = rng.random((8, 8, 8, 3)).astype(np.float32)
    g = LeafGrid.from_dense("v", dense)
    assert g.channels == 3
    assert g.leaves.shape == (1, 8, 8, 8, 3)


def test_nonaligned_extent_padding(rng):
    dense = rng.random((10, 9, 13)).astype(np.float32) + 0.1  # all active
    g = LeafGrid.from_dense("p", dense)
    back, lo = g.to_dense()
    np.testing.assert_array_equal(back[:10, :9, :13, 0], dense)
    # padding voxels are background
    assert (back[10:, :, :, 0] == 0).all()


def test_npy_round_trip(tmp_path, rng):
    leaves = rng.random((17, 8, 8, 8), np.float32)
    origins = (rng.integers(0, 100, (17, 3)) * 8).astype(np.int32)
    tf = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)
    g = LeafGrid("rt", origins, leaves, transform=tf, background=0.5)
    p = tmp_path / "leaves.npy"
    g.save_npy(p)
    g2 = LeafGrid.load_npy(p)
    assert g2.name == "rt"
    np.testing.assert_array_equal(g2.leaves, g.leaves)
    np.testing.assert_array_equal(g2.origins, g.origins)
    np.testing.assert_array_equal(g2.transform, tf)
    assert g2.background == 0.5


def test_load_npy_without_origins(tmp_path, rng):
    leaves = rng.random((10, 8, 8, 8), np.float32)
    p = tmp_path / "plain.npy"
    np.save(p, leaves)
    g = LeafGrid.load_npy(p)
    assert g.num_leaves == 10
    # synthetic origins must be unique and leaf-aligned
    assert len({tuple(o) for o in g.origins}) == 10
    assert (g.origins % 8 == 0).all()


def test_metrics(rng):
    a = np.zeros((100,))
    b = np.full((100,), 0.1)
    assert mse(a, b) == pytest.approx(0.01)
    assert psnr(a, b) == pytest.approx(20.0)
    assert psnr(a, a) == float("inf")
    target = np.array([0.0, 0.0, 1.0, 1.0])
    recon = np.array([0.1, 0.0, 0.8, 1.0])
    z, nz = split_mse(recon, target)
    assert z == pytest.approx(0.005)
    assert nz == pytest.approx(0.02)

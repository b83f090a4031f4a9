"""Synthetic-volume cache + train-seed allocation.

The generators are pure functions of (family, size, seed); the disk cache
must be bit-transparent, and training pools must never draw seeds from the
reserved eval band [1000, 2000) (the 50k-block eval pools start at 1000 —
overlap silently turns held-out evaluation into train-set evaluation).
"""

import numpy as np

from vqvdb_tpu.train import synthetic
from vqvdb_tpu.train.synthetic import (EVAL_SEED_BAND, levelset_grid,
                                       smoke_grid, train_seeds,
                                       velocity_grid)


def test_train_seeds_small_pools_unchanged():
    assert train_seeds(5) == [0, 1, 2, 3, 4]
    assert train_seeds(1000) == list(range(1000))


def test_train_seeds_skip_eval_band():
    seeds = train_seeds(1005)
    assert seeds[:1000] == list(range(1000))
    assert seeds[1000:] == [2000, 2001, 2002, 2003, 2004]
    lo, hi = EVAL_SEED_BAND
    assert not any(lo <= s < hi for s in seeds)
    assert len(set(seeds)) == len(seeds)


def test_train_seeds_start_offset():
    assert train_seeds(3, start=998) == [998, 999, 2000]


def test_cache_roundtrip_bit_exact(tmp_path, monkeypatch):
    monkeypatch.setenv("VQVDB_SYNTH_CACHE", "0")
    fresh = smoke_grid(32, seed=11, name="d")

    monkeypatch.setenv("VQVDB_SYNTH_CACHE", str(tmp_path / "c"))
    first = smoke_grid(32, seed=11, name="d")  # miss: generates + writes
    files = list((tmp_path / "c").glob("smoke_32_11.npz"))
    assert len(files) == 1
    second = smoke_grid(32, seed=11, name="renamed")  # hit: reads

    for g in (first, second):
        np.testing.assert_array_equal(g.leaves, fresh.leaves)
        np.testing.assert_array_equal(g.origins, fresh.origins)
    assert second.name == "renamed"
    assert second.leaves.dtype == np.float32 and second.origins.dtype == np.int32


def test_cache_distinguishes_family_size_seed(tmp_path, monkeypatch):
    monkeypatch.setenv("VQVDB_SYNTH_CACHE", str(tmp_path))
    smoke_grid(32, seed=1)
    levelset_grid(32, seed=1)
    velocity_grid(32, seed=1)
    smoke_grid(32, seed=2)
    names = sorted(p.name for p in tmp_path.glob("*.npz"))
    assert names == ["levelset_32_1.npz", "smoke_32_1.npz",
                     "smoke_32_2.npz", "velocity_32_1.npz"]
    v = velocity_grid(32, seed=1)
    assert v.channels == 3


def test_cache_corrupt_file_regenerates(tmp_path, monkeypatch):
    monkeypatch.setenv("VQVDB_SYNTH_CACHE", str(tmp_path))
    good = smoke_grid(32, seed=3)
    path = tmp_path / "smoke_32_3.npz"
    path.write_bytes(b"not an npz")
    again = smoke_grid(32, seed=3)
    np.testing.assert_array_equal(again.leaves, good.leaves)
    # regeneration rewrote a loadable cache entry
    with np.load(path) as z:
        np.testing.assert_array_equal(z["leaves"], good.leaves)


def test_cache_disabled_by_env(tmp_path, monkeypatch):
    monkeypatch.setenv("VQVDB_SYNTH_CACHE", "0")
    assert synthetic._cache_dir() is None
    monkeypatch.setenv("VQVDB_SYNTH_CACHE", "off")
    assert synthetic._cache_dir() is None

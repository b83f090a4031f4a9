"""Format fuzz: random grid configurations round-trip exactly.

The v3 container supports arbitrary latent ranks/shapes (latentDimCount u8 +
u16 dims); the codec pins (4,4,4) but the container layer must not."""

import numpy as np
import pytest

from vqvdb_tpu.format.vqvdb import GridMetadata, VqvdbReader, VqvdbWriter


@pytest.mark.parametrize("seed", range(4))
def test_random_configurations_roundtrip(tmp_path, seed):
    rng = np.random.default_rng(seed)
    version = int(rng.choice([3, 4]))
    n_grids = int(rng.integers(1, 6))
    rank = int(rng.integers(1, 5))
    latent_shape = tuple(int(d) for d in rng.integers(1, 9, rank))
    num_embeddings = int(rng.choice([16, 256] if version == 3 else [16, 256, 4096]))
    dtype = np.uint8 if num_embeddings <= 256 else np.uint16

    grids = []
    path = tmp_path / f"fuzz_{seed}.vqvdb"
    with VqvdbWriter(path, version=version) as w:
        for g in range(n_grids):
            n = int(rng.integers(0, 200))
            idx = rng.integers(0, num_embeddings, (n,) + latent_shape).astype(dtype)
            org = rng.integers(-(2**24), 2**24, (n, 3)).astype(np.int32)
            name = f"grid_{seed}_{g}" * int(rng.integers(1, 4))  # vary name len
            tf = rng.standard_normal((4, 4)).astype(np.float32)
            w.start_grid(GridMetadata(name, num_embeddings=num_embeddings,
                                      latent_shape=latent_shape, total_blocks=n,
                                      transform=tf))
            # write in random batch sizes
            s = 0
            while s < n:
                step = int(rng.integers(1, 64))
                w.write_batch(idx[s:s + step], org[s:s + step])
                s += step
            w.end_grid()
            grids.append((name, idx, org, tf))

    with VqvdbReader(path) as r:
        assert r.version == version
        assert r.num_grids == n_grids
        for name, idx, org, tf in grids:
            meta, got_idx, got_org = r.read_grid()
            assert meta.name == name
            assert meta.latent_shape == latent_shape
            np.testing.assert_array_equal(meta.transform, tf)
            np.testing.assert_array_equal(got_idx, idx)
            np.testing.assert_array_equal(got_org, org)

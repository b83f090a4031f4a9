"""Training loop tests: loss decreases, checkpoint resume, dataset pipeline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqvdb_tpu.core.config import ModelConfig
from vqvdb_tpu.train.data import LeafDataset, find_npy_files
from vqvdb_tpu.train.train import (
    TrainConfig,
    eval_step,
    make_optimizer,
    make_train_state,
    train_step,
    train,
)

MCFG = ModelConfig(embedding_dim=32, num_embeddings=64)  # small for CPU speed
TCFG = TrainConfig(epochs=2, batch_size=32, lr=3e-3, compute_dtype="float32",
                   dead_code_interval=1, log_every=1000)


def _make_dataset(tmp_path, rng, n=256):
    """Synthetic leaves with structure (spheres) so the model can learn."""
    x, y, z = np.mgrid[0:8, 0:8, 0:8].astype(np.float32)
    leaves = []
    for i in range(n):
        cx, cy, cz = rng.random(3) * 8
        r = np.sqrt((x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2)
        leaves.append(np.clip(1.0 - r / (2 + 4 * rng.random()), 0, 1))
    arr = np.stack(leaves).astype(np.float32)
    # Two files to exercise multi-file offsets.
    np.save(tmp_path / "part0.npy", arr[: n // 2])
    np.save(tmp_path / "part1.npy", arr[n // 2 :])
    return LeafDataset(find_npy_files(tmp_path))


def test_dataset_gather_and_split(tmp_path, rng):
    ds = _make_dataset(tmp_path, rng, n=100)
    assert len(ds) == 100
    batch = ds.gather(np.array([0, 50, 99]))
    assert batch.shape == (3, 8, 8, 8, 1) and batch.dtype == np.float32
    tr, va = ds.split(0.2, seed=1)
    assert len(tr) == 80 and len(va) == 20
    assert set(tr.subset).isdisjoint(set(va.subset))
    batches = list(tr.batches(32, shuffle=True))
    assert len(batches) == 2  # 80 // 32, remainder dropped
    assert all(b.shape == (32, 8, 8, 8, 1) for b in batches)


def test_train_step_reduces_loss(tmp_path, rng):
    ds = _make_dataset(tmp_path, rng, n=128)
    opt = make_optimizer(TCFG, 100)
    state = make_train_state(jax.random.key(0), MCFG, TCFG, 100)
    step = jax.jit(lambda s, b: train_step(s, b, opt, MCFG, TCFG))
    batch = jnp.asarray(ds.gather(np.arange(32)))
    first = None
    for i in range(12):
        state, metrics, _ = step(state, batch)
        if i == 0:
            first = float(metrics["recon_err"])
    last = float(metrics["recon_err"])
    assert last < first, f"recon did not improve: {first} -> {last}"
    assert int(state.step) == 12


def test_full_train_driver_and_resume(tmp_path, rng):
    ds = _make_dataset(tmp_path, rng, n=160)
    ckpt_dir = tmp_path / "ckpts"

    state1, hist1 = train(ds, MCFG, TCFG, checkpoint_dir=str(ckpt_dir),
                          log_fn=lambda *_: None)
    assert len(hist1["val_loss"]) == 2
    assert np.isfinite(hist1["val_loss"]).all()

    # Resume: config says 3 epochs now; epochs 1-2 are already checkpointed,
    # so the driver should continue from the saved state, not restart.
    tcfg3 = TrainConfig(**{**TCFG.__dict__, "epochs": 3})
    state2, hist2 = train(ds, MCFG, tcfg3, checkpoint_dir=str(ckpt_dir),
                          resume=True, log_fn=lambda *_: None)
    assert int(state2.step) > int(state1.step)
    assert len(hist2["val_loss"]) == 1  # only the one remaining epoch ran


def test_eval_step_no_side_effects(tmp_path, rng):
    ds = _make_dataset(tmp_path, rng, n=64)
    state = make_train_state(jax.random.key(0), MCFG, TCFG, 10)
    batch = jnp.asarray(ds.gather(np.arange(16)))
    m1 = eval_step(state.params, batch, MCFG, TCFG)
    m2 = eval_step(state.params, batch, MCFG, TCFG)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]))


def test_gradient_loss_runs(rng):
    from vqvdb_tpu.train.train import gradient_loss
    a = jnp.asarray(rng.random((2, 8, 8, 8, 1), dtype=np.float32))
    b = jnp.asarray(rng.random((2, 8, 8, 8, 1), dtype=np.float32))
    assert float(gradient_loss(a, a)) == pytest.approx(0.0)
    assert float(gradient_loss(a, b)) > 0.0

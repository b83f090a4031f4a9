"""Device-resident trainer: equivalence with the host-loop step + learning."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqvdb_tpu.core.config import ModelConfig
from vqvdb_tpu.train.fast import make_device_epoch_runner, train_on_device
from vqvdb_tpu.train.train import (
    TrainConfig,
    make_optimizer,
    make_train_state,
    train_step,
)

MCFG = ModelConfig(embedding_dim=32, num_embeddings=64)
TCFG = TrainConfig(epochs=4, batch_size=16, lr=2e-3, compute_dtype="float32",
                   dead_code_interval=2, seed=3)


def test_device_runner_matches_host_loop(rng):
    """One epoch in-graph == the same shuffled batches through the host
    step, parameter-for-parameter."""
    n = 64
    data = rng.random((n, 8, 8, 8, 1), dtype=np.float32)
    opt = make_optimizer(TCFG, 100)

    state_dev = make_train_state(jax.random.key(0), MCFG, TCFG, 100)
    state_host = jax.tree.map(jnp.copy, state_dev)

    key = jax.random.key(42)
    run = make_device_epoch_runner(opt, MCFG, TCFG, n)
    state_dev, trace = run(state_dev, jnp.asarray(data),
                           jnp.zeros((0, 8, 8, 8, 1), jnp.float32), key, 1)

    # Replicate: the runner's epoch uses one split of `key` for the perm.
    _, kperm = jax.random.split(key)
    perm = np.asarray(jax.random.permutation(kperm, n))
    host_step = jax.jit(lambda s, b: train_step(s, b, opt, MCFG, TCFG))
    for i in range(n // TCFG.batch_size):
        idx = perm[i * TCFG.batch_size : (i + 1) * TCFG.batch_size]
        state_host, metrics, _ = host_step(state_host, jnp.asarray(data[idx]))

    for a, b in zip(jax.tree.leaves(state_dev.params),
                    jax.tree.leaves(state_host.params)):
        # atol 1e-5: in-graph and host-loop runs fuse reductions differently
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    assert trace.shape == (1, 5)
    assert np.isfinite(np.asarray(trace)[:, :4]).all()
    assert np.isnan(np.asarray(trace)[0, 4])  # no val shard supplied


def test_train_on_device_learns(rng):
    x, y, z = np.mgrid[0:8, 0:8, 0:8].astype(np.float32)
    leaves = []
    for i in range(128):
        c = rng.random(3) * 8
        r = np.sqrt(((x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2))
        leaves.append(np.clip(1 - r / 4, 0, 1))
    data = np.stack(leaves)[..., None]

    state, trace = train_on_device(data, MCFG, TCFG, log_fn=lambda *_: None)
    assert trace.shape == (TCFG.epochs, 5)
    assert trace[-1, 1] < trace[0, 1]  # recon_err decreases
    assert np.isfinite(trace[:, 4]).all()  # val computed every epoch
    assert trace[-1, 4] < trace[0, 4]  # held-out loss improves too
    n_train = 128 - int(128 * TCFG.val_fraction)
    assert int(state.step) == (n_train // 16) * TCFG.epochs


def test_train_on_device_pool_segments(rng):
    """pool_segments=2 (epoch-sharded resident pool — the big-pool worker
    crash workaround): training still learns, spans rotate over disjoint
    segments, and the step count reflects the per-segment epoch size."""
    x, y, z = np.mgrid[0:8, 0:8, 0:8].astype(np.float32)
    leaves = []
    for i in range(128):
        c = rng.random(3) * 8
        r = np.sqrt(((x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2))
        leaves.append(np.clip(1 - r / 4, 0, 1))
    data = np.stack(leaves)[..., None]

    tcfg = TrainConfig(epochs=4, batch_size=16, lr=2e-3,
                       compute_dtype="float32", dead_code_interval=2,
                       val_fraction=0.0, seed=3, pool_segments=2)
    state, trace = train_on_device(data, MCFG, tcfg, log_fn=lambda *_: None)
    assert trace.shape == (tcfg.epochs, 5)
    assert trace[-1, 1] < trace[0, 1]  # recon_err decreases
    seg = 128 // 2
    assert int(state.step) == (seg // 16) * tcfg.epochs

    with pytest.raises(ValueError, match="pool_segments"):
        train_on_device(data, MCFG,
                        TrainConfig(epochs=1, batch_size=64,
                                    val_fraction=0.0, pool_segments=4),
                        log_fn=lambda *_: None)


def test_train_on_device_bf16_pool(rng):
    """pool_dtype=bfloat16 (half-HBM resident pool for memory-bound
    pools): trains, learns, and tracks the f32-pool run closely at this
    error floor."""
    x, y, z = np.mgrid[0:8, 0:8, 0:8].astype(np.float32)
    leaves = []
    for i in range(128):
        c = rng.random(3) * 8
        r = np.sqrt(((x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2))
        leaves.append(np.clip(1 - r / 4, 0, 1))
    data = np.stack(leaves)[..., None]

    import dataclasses

    tcfg16 = dataclasses.replace(TCFG, pool_dtype="bfloat16")
    _, t16 = train_on_device(data, MCFG, tcfg16, log_fn=lambda *_: None)
    _, t32 = train_on_device(data, MCFG, TCFG, log_fn=lambda *_: None)
    assert np.isfinite(t16).all()
    assert t16[-1, 1] < t16[0, 1]  # recon_err decreases
    # bf16 target rounding adds ~1e-6 MSE noise; at this model's error
    # floor (~1e-3) the loss trajectories agree to a few percent.
    assert abs(t16[-1, 0] - t32[-1, 0]) < 0.3 * t32[-1, 0]


def test_train_on_device_checkpoint_resume(tmp_path, rng):
    data = rng.random((64, 8, 8, 8, 1), dtype=np.float32)
    ckpt = tmp_path / "ck"
    # 2 epochs (one reset interval), checkpointed
    t2 = TrainConfig(**{**TCFG.__dict__, "epochs": 2})
    n_train = 64 - int(64 * TCFG.val_fraction)  # 52 -> 3 steps/epoch
    s1, tr1 = train_on_device(data, MCFG, t2, checkpoint_dir=str(ckpt),
                              log_fn=lambda *_: None)
    assert int(s1.step) == (n_train // 16) * 2
    # extend to 4 epochs: resumes instead of restarting
    t4 = TrainConfig(**{**TCFG.__dict__, "epochs": 4})
    s2, tr2 = train_on_device(data, MCFG, t4, checkpoint_dir=str(ckpt),
                              log_fn=lambda *_: None)
    assert int(s2.step) == (n_train // 16) * 4
    assert tr2.shape[0] == 2  # only the remaining epochs ran


def test_train_on_device_selects_best_val_not_latest(tmp_path, rng):
    """The durable best/ slot must hold the best-val state, which is NOT
    always the final state (round-3 VERDICT #3: model selection on
    validation, ref: python/training.py:216-233). Deterministic setup:
    converge on easy data, then resume the run on pure noise — validation
    worsens, so best must survive from the first phase, across the resume
    (best_val is restored from the best/ slot's metrics)."""
    from vqvdb_tpu.train.checkpoint import CheckpointManager

    easy = np.clip(rng.standard_normal((80, 1, 1, 1, 1)).astype(np.float32)
                   * 0.05 + 0.5, 0, 1) * np.ones((1, 8, 8, 8, 1), np.float32)
    noise = rng.random((80, 8, 8, 8, 1), dtype=np.float32)
    ckpt = tmp_path / "ck"
    t3 = TrainConfig(epochs=3, batch_size=16, lr=2e-3,
                     compute_dtype="float32", dead_code_interval=1, seed=0)
    s1, tr1 = train_on_device(easy, MCFG, t3, checkpoint_dir=str(ckpt),
                              log_fn=lambda *_: None)
    t6 = TrainConfig(**{**t3.__dict__, "epochs": 6})
    state, tr2 = train_on_device(noise, MCFG, t6, checkpoint_dir=str(ckpt),
                                 log_fn=lambda *_: None)

    manager = CheckpointManager(str(ckpt))
    best = manager.restore_best(state)
    assert best is not None
    bstep, bstate = best
    meta = manager.read_best_metrics()
    # Phase-1 selection: recorded best == minimum span-end val of phase 1.
    np.testing.assert_allclose(meta["val_loss"], tr1[:, 4].min(), rtol=1e-6)
    # Phase 2 (noise) never beats it, so best != latest.
    assert (tr2[:, 4] > meta["val_loss"]).all()
    assert int(bstep) <= int(s1.step) < int(state.step)
    # The stored params differ from the final ones (a real earlier state).
    diffs = [not np.allclose(np.asarray(a), np.asarray(b))
             for a, b in zip(jax.tree_util.tree_leaves(bstate.params),
                             jax.tree_util.tree_leaves(state.params))]
    assert any(diffs)


def test_export_checkpoint_cli(tmp_path, rng):
    from vqvdb_tpu.cli import main as cli_main

    data = rng.random((32, 8, 8, 8, 1), dtype=np.float32)
    ckpt = tmp_path / "ck"
    t1 = TrainConfig(**{**TCFG.__dict__, "epochs": 2})
    train_on_device(data, MCFG, t1, checkpoint_dir=str(ckpt),
                    log_fn=lambda *_: None)
    out = tmp_path / "exported.vqmodel"
    rc = cli_main(["export-checkpoint", str(ckpt), str(out),
                   "--embedding-dim", "32", "--num-embeddings", "64"])
    assert rc == 0 and out.exists()

    from vqvdb_tpu.core.artifact import load_model
    params, cfg = load_model(out)
    assert cfg.embedding_dim == 32


def test_levelset_family():
    """Narrow-band level-set volumes: surface at 0.5, values in [0,1],
    sparse outside the band, and leaves extract like any FloatGrid."""
    from vqvdb_tpu.train.synthetic import levelset_grid, levelset_volume

    v = levelset_volume(48, seed=3)
    assert v.min() >= 0.0 and v.max() <= 1.0
    active = v != 0.0
    assert 0.001 < active.mean() < 0.5  # narrow band, not dense/empty
    # both sides of the surface are represented
    assert (v[active] > 0.5).any() and (v[active] < 0.5).any()
    g = levelset_grid(48, seed=3)
    assert g.leaves.shape[1:] == (8, 8, 8, 1)
    assert g.leaves.shape[0] > 4


def test_datagen_mixed_family(tmp_path):
    from vqvdb_tpu.train.synthetic import make_leaf_dataset_files

    paths = make_leaf_dataset_files(tmp_path, n_volumes=2, size=32,
                                    family="mixed")
    assert len(paths) == 2
    import numpy as np
    for p in paths:
        arr = np.load(p)
        assert arr.shape[1:] == (8, 8, 8)


def test_device_resident_mesh_matches_single_device():
    """Data-parallel device-resident training must reproduce the
    single-device run on the same global batches (replicated data + shared
    permutation + psum'd grads/EMA): the N-chip == 1-chip invariant,
    extended to the fast trainer."""
    import jax
    import numpy as np

    from vqvdb_tpu.core.config import ModelConfig
    from vqvdb_tpu.parallel.mesh import make_mesh
    from vqvdb_tpu.train.fast import train_on_device
    from vqvdb_tpu.train.train import TrainConfig

    mcfg = ModelConfig(embedding_dim=16, num_embeddings=32)
    n_dev = len(jax.devices())
    tcfg = TrainConfig(epochs=3, batch_size=8 * n_dev,
                       compute_dtype="float32", dead_code_interval=2)
    rng = np.random.default_rng(0)
    leaves = rng.random((8 * n_dev * 3 + 5, 8, 8, 8, 1), np.float32)

    s1, t1 = train_on_device(leaves, mcfg, tcfg, log_fn=lambda *a: None)
    sN, tN = train_on_device(leaves, mcfg, tcfg, mesh=make_mesh(n_dev),
                             log_fn=lambda *a: None)

    # Equivalence is modulo f32 reduction order (global-batch mean vs
    # pmean of shard means): observed max abs drift ~3e-6 after 3 epochs.
    np.testing.assert_allclose(tN, t1, rtol=1e-3, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(sN.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-5)


def test_pool_segments_coverage_warning_and_tail(rng):
    """Remainder leaves are covered by overlapping segment starts, and the
    trainer warns when epochs cannot rotate through every segment."""
    # 130 leaves, 3 segments: n_run=43, remainder 1 — the last segment
    # starts at n - n_run, so the tail leaf is trained on.
    data = rng.random((130, 8, 8, 8, 1), dtype=np.float32)
    msgs = []
    tcfg = TrainConfig(epochs=2, batch_size=8, lr=2e-3,
                       compute_dtype="float32", dead_code_interval=2,
                       val_fraction=0.0, seed=3, pool_segments=3)
    train_on_device(data, MCFG, tcfg, log_fn=msgs.append)
    assert any("WARNING" in m and "pool_segments=3" in m for m in msgs)

    # Enough epochs to rotate: no warning.
    msgs2 = []
    tcfg2 = TrainConfig(epochs=6, batch_size=8, lr=2e-3,
                        compute_dtype="float32", dead_code_interval=2,
                        val_fraction=0.0, seed=3, pool_segments=3)
    train_on_device(data, MCFG, tcfg2, log_fn=msgs2.append)
    assert not any("WARNING" in m for m in msgs2)

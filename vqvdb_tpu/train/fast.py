"""Device-resident training: whole epochs inside one jit call.

The leaf datasets this codec trains on are small next to HBM (1M leaves =
2 GiB), so the TPU-native training loop keeps the dataset on device and runs
`lax.fori_loop(steps)` inside `lax.fori_loop(epochs)` in a single compiled
program: in-graph shuffling (jax.random.permutation), on-device batch
gather, fused train steps, and a per-epoch metrics trace out. Host
involvement drops to one call per dead-code-reset interval — which is what
makes training fast on transports with high per-dispatch latency, and
maximally efficient everywhere else.

The math is identical to train.train_step (same loss/EMA/optimizer);
tests/test_fast_train.py checks step-for-step equivalence against the host
loop.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vqvdb_tpu.core.config import ModelConfig
from vqvdb_tpu.models.vqvae import encoder_apply, reset_dead
from vqvdb_tpu.train.train import (TrainConfig, TrainState, eval_step,
                                   make_optimizer, train_step)

METRIC_KEYS = ("loss", "recon_err", "vq_loss", "perplexity", "val_loss")


def make_device_epoch_runner(opt, mcfg: ModelConfig, tcfg: TrainConfig,
                             n_train: int, mesh=None, n_val: int = 0):
    """Build run(state, data, val_data, key, epochs)
    -> (state, metrics[epochs, 5] = loss/recon/vq/perplexity/val_loss).

    data: [N, 8, 8, 8, C] on device; only the first
    (N // batch_size) * batch_size leaves are touched per epoch (shuffled).
    val_data: [n_val, ...] held-out shard, evaluated in-graph after every
    epoch (no EMA/optimizer side effects — train.eval_step); when n_val
    yields no full batch the val column is NaN. Matching the reference,
    which validates every epoch (ref: python/training.py:184-208).

    With a mesh, the whole epoch program runs shard_mapped over the data
    axis: the dataset and shuffle key are replicated (these leaf datasets
    are small next to HBM — module docstring), every shard computes the
    SAME global permutation and takes its disjoint slice of each global
    batch, and train_step pmean/psums grads + EMA statistics. The result is
    bit-equivalent (mod f32 reduction order) to the single-chip run on the
    same global batches — the repo's N-chip == 1-chip invariant, kept for
    the fast trainer and verified in tests/test_fast_train.py.
    """
    bs = tcfg.batch_size
    steps_per_epoch = n_train // bs
    if steps_per_epoch == 0:
        raise ValueError(f"batch_size {bs} exceeds dataset size {n_train}")
    val_steps = n_val // bs

    n_dev = 1 if mesh is None else int(mesh.devices.size)
    if bs % n_dev:
        raise ValueError(f"batch_size {bs} not divisible by mesh size {n_dev}")
    bs_local = bs // n_dev
    n_metrics = len(METRIC_KEYS)
    axis = None
    if mesh is not None:
        from vqvdb_tpu.parallel.mesh import DATA_AXIS

        axis = DATA_AXIS

    def epochs_fn(state: TrainState, data: jnp.ndarray, val_data: jnp.ndarray,
                  key: jnp.ndarray, epochs: int):
        rank = 0 if axis is None else jax.lax.axis_index(axis)

        def epoch_body(e, carry):
            state, key, trace = carry
            key, kperm = jax.random.split(key)
            perm = jax.random.permutation(kperm, n_train)

            def step_body(i, carry2):
                state, acc = carry2
                idx = jax.lax.dynamic_slice(
                    perm, (i * bs + rank * bs_local,), (bs_local,))
                batch = jnp.take(data, idx, axis=0)
                state, metrics, _ = train_step(state, batch, opt, mcfg, tcfg,
                                               axis_name=axis)
                acc = acc + jnp.stack([metrics[k].astype(jnp.float32)
                                       for k in METRIC_KEYS[:4]])
                return state, acc

            state, acc = jax.lax.fori_loop(
                0, steps_per_epoch, step_body,
                (state, jnp.zeros((4,), jnp.float32)))

            # Per-epoch validation over the resident held-out shard. Each
            # shard evaluates its slice of every global val batch; shard
            # means over equal-sized slices pmean to the global batch mean.
            def val_body(i, vacc):
                vbatch = jax.lax.dynamic_slice_in_dim(
                    val_data, i * bs + rank * bs_local, bs_local, 0)
                loss = eval_step(state.params, vbatch, mcfg, tcfg)["loss"]
                if axis is not None:
                    loss = jax.lax.pmean(loss, axis)
                return vacc + loss.astype(jnp.float32)

            if val_steps:
                val_loss = jax.lax.fori_loop(
                    0, val_steps, val_body, jnp.float32(0.0)) / val_steps
            else:
                val_loss = jnp.float32(jnp.nan)
            row = jnp.concatenate([acc / steps_per_epoch, val_loss[None]])
            trace = trace.at[e].set(row)
            return state, key, trace

        trace0 = jnp.zeros((epochs, n_metrics), jnp.float32)
        state, key, trace = jax.lax.fori_loop(
            0, epochs, epoch_body, (state, key, trace0))
        return state, trace

    if mesh is None:
        @functools.partial(jax.jit, static_argnames=("epochs",),
                           donate_argnums=(0,))
        def run(state, data, val_data, key, epochs):
            return epochs_fn(state, data, val_data, key, epochs)

        return run

    from jax.sharding import PartitionSpec as P

    from vqvdb_tpu.parallel.mesh import _shard_map

    @functools.partial(jax.jit, static_argnames=("epochs",),
                       donate_argnums=(0,))
    def run_sharded(state, data, val_data, key, epochs):
        mapped = _shard_map(
            functools.partial(epochs_fn, epochs=epochs),
            mesh,
            in_specs=(P(), P(), P(), P()),
            out_specs=(P(), P()),
        )
        return mapped(state, data, val_data, key)

    return run_sharded


def train_on_device(
    dataset_leaves: np.ndarray,
    mcfg: ModelConfig,
    tcfg: TrainConfig,
    *,
    init_state: Optional[TrainState] = None,
    checkpoint_dir: Optional[str] = None,
    resume: bool = True,
    mesh=None,
    log_fn=print,
) -> Tuple[TrainState, np.ndarray]:
    """Full device-resident training driver.

    Holds out `tcfg.val_fraction` of the leaves (deterministic permutation
    by tcfg.seed, the reference's 80/20 convention, ref:
    python/training.py:67-95), keeps both shards resident, and runs
    `dead_code_interval` epochs per device call with per-epoch in-graph
    validation; then performs the dead-code reset from a probe batch (ref
    cadence: python/training.py:180). With checkpoint_dir, saves at every
    reset boundary, tracks best-val across spans (and across resumes via
    the best/ slot's metrics), and writes the best-val state to the
    durable `best/` slot — model selection matches the reference's
    best-val checkpointing (ref: python/training.py:216-233).
    Returns (final_state, metrics [epochs, 5] =
    loss/recon/vq/perplexity/val_loss).
    """
    from vqvdb_tpu.train.train import make_train_state

    leaves = np.asarray(dataset_leaves, np.float32)
    if leaves.ndim == 4:
        leaves = leaves[..., None]
    n_total = leaves.shape[0]
    n_val = int(n_total * tcfg.val_fraction)
    split = np.random.default_rng(tcfg.seed).permutation(n_total)
    val_idx, train_idx = split[:n_val], split[n_val:]
    n = train_idx.shape[0]
    n_segs = max(1, int(tcfg.pool_segments))
    n_run = n // n_segs if n_segs > 1 else n  # leaves per epoch pass
    if n_segs > 1 and n_run < tcfg.batch_size:
        raise ValueError(
            f"pool_segments={n_segs} leaves segments of {n_run} leaves, "
            f"below batch_size {tcfg.batch_size}")
    steps_per_epoch = max(n_run // tcfg.batch_size, 1)
    total_steps = steps_per_epoch * tcfg.epochs
    opt = make_optimizer(tcfg, total_steps)
    state = init_state or make_train_state(
        jax.random.key(tcfg.seed), mcfg, tcfg, total_steps)

    manager = None
    done = 0
    best_val = float("inf")
    if checkpoint_dir:
        from vqvdb_tpu.train.checkpoint import CheckpointManager

        manager = CheckpointManager(checkpoint_dir,
                                    max_to_keep=tcfg.max_checkpoints)
        if resume:
            restored = manager.restore_latest(state)
            if restored is not None:
                step0, state = restored
                done = int(step0) // steps_per_epoch
                log_fn(f"[fast-train] resumed at epoch {done} (step {step0})")
            best_meta = manager.read_best_metrics() or {}
            best_val = float(best_meta.get("val_loss", best_val))

    # Resident-pool dtype (TrainConfig.pool_dtype): bfloat16 halves the
    # pool's HBM footprint at the cost of bf16-rounding the recon target —
    # see the TrainConfig field docs for when that is safe.
    pool_dt = jnp.dtype(tcfg.pool_dtype)
    # Epoch-sharded pool (TrainConfig.pool_segments): each compiled span
    # sees one 1/S segment; segments rotate per span. All segments stay
    # device-resident — only the per-program operand shrinks (the v5e
    # big-pool worker-crash workaround; TrainConfig docs). Segment starts
    # are spread evenly over [0, n - n_run] so the n % n_segs remainder
    # leaves are covered too (adjacent segments overlap slightly instead
    # of dropping the tail — all programs keep the same operand shape).
    n_spans = -(-tcfg.epochs // max(tcfg.dead_code_interval, 1))
    if n_segs > 1 and n_spans < n_segs:
        log_fn(f"[fast-train] WARNING: epochs={tcfg.epochs} gives "
               f"{n_spans} compiled span(s) but pool_segments={n_segs}; "
               f"segments {n_spans}..{n_segs - 1} will never be trained "
               f"on. Raise epochs or lower pool_segments.")
    seg_starts = [(i * (n - n_run)) // (n_segs - 1) if n_segs > 1 else 0
                  for i in range(n_segs)]
    segments = [jnp.asarray(
        leaves[train_idx[s:s + n_run]], dtype=pool_dt)
        for s in seg_starts]
    run = make_device_epoch_runner(opt, mcfg, tcfg, n_run, mesh=mesh,
                                   n_val=n_val)
    val_data = jnp.asarray(leaves[val_idx], dtype=pool_dt)
    key = jax.random.key(tcfg.seed + 1)
    reset_key = jax.random.key(tcfg.seed + 2)
    # Burn key splits for already-completed spans so a resumed run shuffles
    # with the same stream it would have used uninterrupted.
    for _ in range(done // max(tcfg.dead_code_interval, 1)):
        key, _ = jax.random.split(key)
        reset_key, _ = jax.random.split(reset_key)

    traces = []
    while done < tcfg.epochs:
        span = min(tcfg.dead_code_interval, tcfg.epochs - done)
        data = segments[(done // max(tcfg.dead_code_interval, 1)) % n_segs]
        key, sub = jax.random.split(key)
        state, trace = run(state, data, val_data, sub, span)
        traces.append(np.asarray(trace))
        done += span
        m = traces[-1][-1]
        val_loss = float(m[4])
        log_fn(f"[fast-train] epoch {done}/{tcfg.epochs} "
               f"loss={m[0]:.5f} recon={m[1]:.5f} vq={m[2]:.5f} "
               f"ppl={m[3]:.1f} val={val_loss:.5f}")
        if done < tcfg.epochs:
            # Dead-code reset from a probe batch's encoder outputs.
            reset_key, sub2 = jax.random.split(reset_key)
            probe = data[: min(tcfg.batch_size, n_run)]
            z = encoder_apply(state.params.encoder,
                              probe.astype(jnp.dtype(tcfg.compute_dtype)), mcfg)
            flat_z = z.reshape(-1, mcfg.embedding_dim).astype(jnp.float32)
            new_vq, n_dead = reset_dead(sub2, state.params.vq, flat_z, mcfg)
            state = state._replace(params=state.params._replace(vq=new_vq))
            nd = int(n_dead)
            if nd:
                log_fn(f"[fast-train] reset {nd} dead codes")
        if manager is not None:
            manager.save(int(state.step), state,
                         metrics={"epoch": done,
                                  "loss": float(traces[-1][-1][0]),
                                  "val_loss": val_loss})
            # Selection metric: span-end val loss (falls back to train loss
            # for runs whose val split is below one batch).
            select = val_loss if np.isfinite(val_loss) else float(m[0])
            if select < best_val:
                best_val = select
                manager.save_best(int(state.step), state,
                                  metrics={"val_loss": select,
                                           "epoch": done})
                log_fn(f"[fast-train] new best val={select:.5f} "
                       f"(epoch {done})")
    return state, np.concatenate(traces, axis=0)

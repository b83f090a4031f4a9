"""Training loop: optax AdamW + cosine, EMA codebook, dead-code reset,
checkpoint/resume, validation — single-chip and data-parallel.

Functional redesign of the reference loop (python/training.py:47-258):
  * loss = 0.8*MSE + 0.2*L1 + commitment (ref :142-150); an optional 3D
    Sobel gradient loss is implemented (the reference defines one but never
    adds it to the loss — here it's a config weight, default 0).
  * AdamW(lr 1e-4, wd 1e-4, betas .9/.999) + cosine annealing over total
    steps (ref :99-105). Weight decay applies only to encoder/decoder
    weights; the EMA codebook is a non-gradient buffer (as in the
    reference) and is updated inside the forward pass.
  * Mixed precision: batches are cast to bfloat16 for the conv stacks
    (TPU-native AMP); norms/losses/EMA statistics stay f32.
  * Dead-code reset every N epochs from held first-batch encoder outputs
    (ref :119,152-154,180-181) — jit-safe masked resample.
  * Full-state checkpointing with actual resume (the reference saved but
    never loaded; see train/checkpoint.py).

Data parallelism (absent in the reference — single CUDA device) comes from
jitting `train_step` under a mesh with the batch sharded on the 'data' axis:
gradients and EMA sufficient statistics are psum'd, making multi-chip
training bit-equivalent to single-chip training on the global batch. See
vqvdb_tpu/parallel/mesh.py.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vqvdb_tpu.core.config import ModelConfig
from vqvdb_tpu.models.quantizer import VQState
from vqvdb_tpu.models.vqvae import (
    VQVAEParams,
    decoder_apply,
    encoder_apply,
    init_vqvae_params,
    quantize_infer,
    quantize_train_forward,
    reset_dead,
)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Hyperparameters (defaults = reference scalar recipe,
    ref: python/training.py:48-56,99-105)."""

    epochs: int = 30
    batch_size: int = 2048
    lr: float = 1e-4
    weight_decay: float = 1e-4
    beta1: float = 0.9
    beta2: float = 0.999
    mse_weight: float = 0.8
    l1_weight: float = 0.2
    grad_loss_weight: float = 0.0  # 3D Sobel loss (defined-but-unused in ref)
    dead_code_interval: int = 5  # epochs between dead-code resets
    val_fraction: float = 0.2
    compute_dtype: str = "bfloat16"
    # Dtype of the device-RESIDENT dataset in train/fast.py (the host
    # pipeline in this module ignores it). "bfloat16" halves the pool's
    # HBM footprint for memory-bound resident pools. (Note: the v5e
    # worker crash that prompted this knob — reference-arch vec3 at a
    # 687k-leaf pool, benchmarks/arch10x ladder — reproduced in BOTH
    # pool dtypes, so that specific failure is not memory-alone; packed
    # variants train clean on the same pool, and 347k-leaf pools work
    # for every arch.) Tradeoff: the reconstruction TARGET is
    # bf16-rounded, adding ~1e-6-level MSE noise — harmless when the
    # model's error floor is well above bf16 rounding (vec3 at ~36 dB),
    # wrong for 55+ dB scalar tiers. Keep float32 there.
    pool_dtype: str = "float32"
    # Epoch-sharded resident pool (train/fast.py only): split the train
    # pool into this many equal device-resident segments and run each
    # compiled span (dead_code_interval epochs) over ONE segment, rotating
    # per span. Every compiled program then touches a pool 1/S the size —
    # the workaround for the v5e worker crash that kills single-program
    # big-pool runs on 8^3-stage encoder graphs (reference-arch vec3 and
    # scalar packed_stem at >=4 GB pools crash the worker; segmented runs
    # train clean — see BASELINE.md round-5 bisect note). Costs nothing
    # when 1 (default); with S>1 an "epoch" passes over one segment, so
    # data exposure per epoch is 1/S; rotation covers every segment only
    # when epochs >= S * dead_code_interval (the trainer warns otherwise).
    # Remainder leaves (n % S) are covered by slight segment overlap.
    pool_segments: int = 1
    seed: int = 0
    log_every: int = 50
    checkpoint_every_epochs: int = 1
    max_checkpoints: int = 3


class TrainState(NamedTuple):
    params: VQVAEParams
    opt_state: Any
    step: jnp.ndarray  # scalar int32


def make_optimizer(tcfg: TrainConfig, total_steps: int) -> optax.GradientTransformation:
    schedule = optax.cosine_decay_schedule(tcfg.lr, decay_steps=max(total_steps, 1))
    return optax.adamw(
        learning_rate=schedule,
        b1=tcfg.beta1,
        b2=tcfg.beta2,
        weight_decay=tcfg.weight_decay,
    )


def make_train_state(
    key, mcfg: ModelConfig, tcfg: TrainConfig, total_steps: int
) -> TrainState:
    params = init_vqvae_params(key, mcfg)
    opt = make_optimizer(tcfg, total_steps)
    opt_state = opt.init((params.encoder, params.decoder))
    return TrainState(params=params, opt_state=opt_state, step=jnp.asarray(0))


# ---------------------------------------------------------------------------
# Sobel gradient loss (capability parity with ref training.py:15-44)
# ---------------------------------------------------------------------------

def _sobel_kernels() -> np.ndarray:
    """3D Sobel operators along x/y/z as a (3,3,3,1,3) DHWIO conv kernel.

    Kept as a host constant: creating a device array at import time would
    initialize a JAX backend before callers can override the platform.
    """
    smooth = np.array([1.0, 2.0, 1.0], np.float32)
    diff = np.array([-1.0, 0.0, 1.0], np.float32)
    gx = np.einsum("i,j,k->ijk", diff, smooth, smooth)
    gy = np.einsum("i,j,k->ijk", smooth, diff, smooth)
    gz = np.einsum("i,j,k->ijk", smooth, smooth, diff)
    return np.stack([gx, gy, gz], axis=-1)[:, :, :, None, :]  # (3,3,3,1,3)


_SOBEL = _sobel_kernels()  # numpy; converted to a device array under trace


def gradient_loss(recon: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean MSE between Sobel gradients of recon and target (per channel)."""
    c = recon.shape[-1]

    def grads(v):
        outs = []
        for ch in range(c):
            outs.append(jax.lax.conv_general_dilated(
                v[..., ch : ch + 1].astype(jnp.float32), _SOBEL,
                window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC")))
        return jnp.concatenate(outs, axis=-1)

    return jnp.mean(jnp.square(grads(recon) - grads(target)))


# ---------------------------------------------------------------------------
# Steps
# ---------------------------------------------------------------------------

def _forward_loss(
    trainable: Tuple[Any, Any],
    vq_state: VQState,
    batch: jnp.ndarray,
    mcfg: ModelConfig,
    tcfg: TrainConfig,
    axis_name: Optional[str],
):
    enc, dec = trainable
    x = batch.astype(jnp.dtype(tcfg.compute_dtype))
    z = encoder_apply(enc, x, mcfg)
    quantized, new_vq, vq_loss, perplexity = quantize_train_forward(
        vq_state, z, mcfg, axis_name=axis_name)
    recon = decoder_apply(dec, quantized, mcfg)  # f32 out
    target = batch.astype(jnp.float32)
    recon_mse = jnp.mean(jnp.square(recon - target))
    recon_l1 = jnp.mean(jnp.abs(recon - target))
    recon_err = tcfg.mse_weight * recon_mse + tcfg.l1_weight * recon_l1
    if tcfg.grad_loss_weight > 0.0:
        recon_err = recon_err + tcfg.grad_loss_weight * gradient_loss(recon, target)
    loss = recon_err + vq_loss
    metrics = {
        "loss": loss,
        "recon_mse": recon_mse,
        "recon_l1": recon_l1,
        "recon_err": recon_err,
        "vq_loss": vq_loss,
        "perplexity": perplexity,
    }
    return loss, (new_vq, metrics, z)


def train_step(
    state: TrainState,
    batch: jnp.ndarray,
    opt: optax.GradientTransformation,
    mcfg: ModelConfig,
    tcfg: TrainConfig,
    *,
    axis_name: Optional[str] = None,
) -> Tuple[TrainState, Dict[str, jnp.ndarray], jnp.ndarray]:
    """One optimizer step. Returns (new_state, metrics, encoder_outputs).

    encoder_outputs feed the periodic dead-code reset (ref keeps the first
    batch's z for this, training.py:152-154).
    """
    trainable = (state.params.encoder, state.params.decoder)
    grad_fn = jax.value_and_grad(_forward_loss, has_aux=True)
    (loss, (new_vq, metrics, z)), grads = grad_fn(
        trainable, state.params.vq, batch, mcfg, tcfg, axis_name
    )
    if axis_name is not None:
        grads = jax.lax.pmean(grads, axis_name)
        metrics = jax.tree.map(lambda m: jax.lax.pmean(m, axis_name), metrics)
    updates, new_opt_state = opt.update(grads, state.opt_state, trainable)
    new_enc, new_dec = optax.apply_updates(trainable, updates)
    new_params = VQVAEParams(encoder=new_enc, decoder=new_dec, vq=new_vq)
    return (
        TrainState(params=new_params, opt_state=new_opt_state, step=state.step + 1),
        metrics,
        z,
    )


def eval_step(
    params: VQVAEParams,
    batch: jnp.ndarray,
    mcfg: ModelConfig,
    tcfg: TrainConfig,
) -> Dict[str, jnp.ndarray]:
    """Validation forward: same loss arithmetic, no EMA/optimizer updates."""
    x = batch.astype(jnp.dtype(tcfg.compute_dtype))
    z = encoder_apply(params.encoder, x, mcfg)
    # Inference-style quantization (no EMA side effects).
    flat = z.reshape(-1, mcfg.embedding_dim)
    _, quant_flat = quantize_infer(params.vq, flat, mcfg, z.dtype)
    quantized = quant_flat.reshape(z.shape)
    commit = mcfg.commitment_cost * jnp.mean(
        jnp.square(z.astype(jnp.float32) - quantized.astype(jnp.float32)))
    recon = decoder_apply(params.decoder, quantized, mcfg)
    target = batch.astype(jnp.float32)
    recon_mse = jnp.mean(jnp.square(recon - target))
    recon_l1 = jnp.mean(jnp.abs(recon - target))
    recon_err = tcfg.mse_weight * recon_mse + tcfg.l1_weight * recon_l1
    return {
        "loss": recon_err + commit,
        "recon_mse": recon_mse,
        "recon_err": recon_err,
        "vq_loss": commit,
    }


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def train(
    dataset,
    mcfg: ModelConfig,
    tcfg: TrainConfig,
    *,
    checkpoint_dir: Optional[str] = None,
    resume: bool = True,
    mesh=None,
    log_fn=print,
) -> Tuple[TrainState, Dict[str, list]]:
    """Full training driver over a LeafDataset.

    With `mesh` (a 1-D jax.sharding.Mesh), the step runs data-parallel:
    batch sharded over the 'data' axis, params replicated, gradients and
    EMA statistics all-reduced. Returns (final_state, history).
    """
    from vqvdb_tpu.train.checkpoint import CheckpointManager

    train_view, val_view = dataset.split(tcfg.val_fraction, seed=tcfg.seed)
    steps_per_epoch = max(len(train_view) // tcfg.batch_size, 1)
    total_steps = steps_per_epoch * tcfg.epochs
    opt = make_optimizer(tcfg, total_steps)

    state = make_train_state(jax.random.key(tcfg.seed), mcfg, tcfg, total_steps)
    start_epoch = 0
    best_val = float("inf")
    manager = None
    if checkpoint_dir:
        manager = CheckpointManager(checkpoint_dir, max_to_keep=tcfg.max_checkpoints)
        if resume:
            restored = manager.restore_latest(state)
            if restored is not None:
                step0, state = restored
                start_epoch = int(step0) // steps_per_epoch
                m = manager.read_metrics(step0)
                if m:
                    best_val = m.get("best_val", best_val)
                log_fn(f"[train] resumed from step {step0} (epoch {start_epoch})")

    if mesh is not None:
        from vqvdb_tpu.parallel.distributed import (
            global_batch_from_local, local_batch_slice)
        from vqvdb_tpu.parallel.mesh import make_sharded_train_step, make_sharded_eval_step
        step_fn = make_sharded_train_step(mesh, opt, mcfg, tcfg)
        eval_fn = make_sharded_eval_step(mesh, mcfg, tcfg)
        multi_host = jax.process_count() > 1

        def to_device(batch):
            # Every host iterates the same seeded global batch order; under
            # multi-host each contributes only its slice's device buffers.
            rows = batch[local_batch_slice(batch.shape[0])] if multi_host else batch
            return global_batch_from_local(mesh, rows)
    else:
        step_fn = jax.jit(
            lambda s, b: train_step(s, b, opt, mcfg, tcfg), donate_argnums=(0,))
        eval_fn = jax.jit(lambda p, b: eval_step(p, b, mcfg, tcfg))
        to_device = jnp.asarray

    history: Dict[str, list] = {"train_recon": [], "train_vq": [], "val_loss": [],
                                "perplexity": []}
    reset_key = jax.random.key(tcfg.seed + 1)

    for epoch in range(start_epoch, tcfg.epochs):
        t0 = time.perf_counter()
        run_recon, run_vq, last_ppl = 0.0, 0.0, 0.0
        first_z = None
        n_steps = 0
        for i, batch in enumerate(
            train_view.batches(tcfg.batch_size, shuffle=True,
                               seed=tcfg.seed, epoch=epoch)
        ):
            state, metrics, z = step_fn(state, to_device(batch))
            if i == 0:
                first_z = z  # held for dead-code reset (ref :152-154)
            n_steps += 1
            if (i + 1) % tcfg.log_every == 0:
                m = jax.tree.map(float, metrics)
                log_fn(
                    f"[train] epoch {epoch + 1} step {i + 1}/{steps_per_epoch} "
                    f"recon={m['recon_err']:.5f} vq={m['vq_loss']:.5f} "
                    f"ppl={m['perplexity']:.1f}"
                )
            run_recon += float(metrics["recon_err"])
            run_vq += float(metrics["vq_loss"])
            last_ppl = float(metrics["perplexity"])

        # Dead-code reset every N epochs (ref :180-181).
        if (epoch + 1) % tcfg.dead_code_interval == 0 and first_z is not None:
            reset_key, sub = jax.random.split(reset_key)
            flat_z = jnp.reshape(first_z, (-1, mcfg.embedding_dim)).astype(jnp.float32)
            new_vq, n_dead = reset_dead(sub, state.params.vq, flat_z, mcfg)
            state = state._replace(params=state.params._replace(vq=new_vq))
            if int(n_dead):
                log_fn(f"[train] reset {int(n_dead)} dead codes")

        # Validation (ref :184-208).
        val_losses = []
        for batch in val_view.batches(tcfg.batch_size, drop_remainder=True):
            val_losses.append(float(eval_fn(state.params, to_device(batch))["loss"]))
        val_loss = float(np.mean(val_losses)) if val_losses else float("nan")

        denom = max(n_steps, 1)
        history["train_recon"].append(run_recon / denom)
        history["train_vq"].append(run_vq / denom)
        history["val_loss"].append(val_loss)
        history["perplexity"].append(last_ppl)
        log_fn(
            f"[train] epoch {epoch + 1:02d}/{tcfg.epochs} "
            f"recon={run_recon / denom:.6f} vq={run_vq / denom:.6f} "
            f"val={val_loss:.6f} ppl={last_ppl:.1f} "
            f"({time.perf_counter() - t0:.1f}s)"
        )

        if manager:
            # Selection metric: val loss; falls back to the epoch's train
            # loss when the val split is smaller than one batch (tiny runs).
            select = val_loss if not np.isnan(val_loss) else run_recon / denom
            improved = select < best_val
            best_val = min(best_val, select)
            if improved:
                # Durable slot outside the rolling pool — survives pruning
                # (ref kept the best model the same way, training.py:216-233).
                manager.save_best(int(state.step), state,
                                  metrics={"val_loss": val_loss,
                                           "epoch": epoch + 1})
            if improved or (epoch + 1) % tcfg.checkpoint_every_epochs == 0:
                manager.save(int(state.step), state,
                             metrics={"best_val": best_val,
                                      "val_loss": val_loss,
                                      "epoch": epoch + 1})

    return state, history

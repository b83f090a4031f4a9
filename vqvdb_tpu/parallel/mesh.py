"""Multi-chip execution over a JAX device mesh.

The reference is strictly single-device (device_id=0 hardcoded, ref:
src/backends/onnx/OnnxBackend_Cuda.cpp:21; no collective library anywhere in
the tree — SURVEY.md §2.3). This module is the new capability: the leaf axis
is embarrassingly parallel, so everything here is a 1-D data mesh with
parameters replicated and the batch sharded.

  * Training: `shard_map`ped train step; gradients are `pmean`ed and the
    EMA quantizer's sufficient statistics `psum`ed across chips (see
    models/quantizer.vq_train_forward), making N-chip training numerically
    identical to 1-chip training on the global batch.
  * Inference: `shard_map`ped encode/decode steps — each chip runs the full
    conv stack + Pallas quantizer on its batch shard; no cross-chip traffic
    at all (weights and codebook are replicated once at init and stay
    resident).

Collectives ride the mesh axis (ICI on real hardware); there is no
host-mediated communication anywhere in the step.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over the first n_devices."""
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(f"asked for {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def _shard_map(fn, mesh, in_specs, out_specs):
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                         check_vma=False)


def make_sharded_train_step(mesh: Mesh, opt, mcfg, tcfg):
    """Data-parallel train step: batch sharded, state replicated.

    Returns step(state, batch) -> (state, metrics, z_shard) jitted over the
    mesh. Gradients/metrics are pmean'd, EMA statistics psum'd inside, so
    the returned state is identical on every chip.
    """
    from vqvdb_tpu.train.train import train_step

    def local_step(state, batch):
        return train_step(state, batch, opt, mcfg, tcfg, axis_name=DATA_AXIS)

    mapped = _shard_map(
        local_step,
        mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=(P(), P(), P(DATA_AXIS)),
    )
    return jax.jit(mapped, donate_argnums=(0,))


def make_sharded_eval_step(mesh: Mesh, mcfg, tcfg):
    """Data-parallel eval: batch sharded, scalar metrics pmean'd."""
    from vqvdb_tpu.train.train import eval_step

    def local_eval(params, batch):
        metrics = eval_step(params, batch, mcfg, tcfg)
        return jax.tree.map(lambda m: jax.lax.pmean(m, DATA_AXIS), metrics)

    mapped = _shard_map(local_eval, mesh, in_specs=(P(), P(DATA_AXIS)),
                        out_specs=P())
    return jax.jit(mapped)


def _make_sharded_step(mesh: Mesh, step, replicate_out: bool):
    """Common encode/decode wrapper. replicate_out=True all-gathers the
    result over the mesh axis inside the step, so EVERY process holds the
    full batch output — the multi-host file codec needs this: each host
    addresses only its own shards of a distributed array, but the .vqvdb
    writer needs every row (the gather rides ICI/DCN, inserted here, not
    host-mediated)."""
    def fn(params, x):
        out = step(params, x)
        if replicate_out:
            out = jax.lax.all_gather(out, DATA_AXIS, axis=0, tiled=True)
        return out

    mapped = _shard_map(
        fn, mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=P() if replicate_out else P(DATA_AXIS),
    )
    return jax.jit(mapped)


def make_sharded_encode(mesh: Mesh, codec, replicate_out: bool = False):
    """Shard the codec's encode step over the mesh's data axis.

    encode(params, leaves [B,8,8,8,C]) -> indices [B,4,4,4]; B must divide
    by the mesh size (the codec's fixed-shape batching guarantees this when
    batch_size % n_devices == 0).
    """
    return _make_sharded_step(mesh, codec._encode_step, replicate_out)


def make_sharded_decode(mesh: Mesh, codec, replicate_out: bool = False):
    """Shard the codec's decode step over the mesh's data axis."""
    return _make_sharded_step(mesh, codec._decode_step, replicate_out)


def replicate(tree, mesh: Mesh):
    """Place a pytree fully-replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(arr, mesh: Mesh):
    """Place an array sharded along dim 0 over the data axis."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.device_put(arr, sharding)

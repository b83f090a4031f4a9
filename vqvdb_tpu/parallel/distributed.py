"""Multi-host (multi-process) execution support.

Single-host multi-chip needs nothing beyond parallel/mesh.py. For pods or
multi-host slices, JAX's distributed runtime stitches processes into one
global device view; the data mesh then spans all hosts and the same
shard_map train/inference steps run unchanged — collectives ride ICI within
a slice and DCN across slices, inserted by XLA from the sharding layout.

The reference has no distributed path at all (SURVEY §2.3); this module is
the new capability's multi-host entry point. It is exercised for real by
tests/test_distributed.py: two spawned processes with gloo CPU collectives
run one data-parallel train step each and must produce bit-identical state,
equal to the single-process step on the same global batch.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def init_multi_host(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    *,
    cpu_collectives: Optional[str] = None,
) -> dict:
    """Initialize JAX's distributed runtime (no-op on single process).

    On TPU pods the arguments are auto-detected from the environment; pass
    them explicitly elsewhere. `cpu_collectives="gloo"` enables cross-process
    collectives on the CPU backend (used by the multi-host smoke test; TPU
    meshes get collectives from ICI/DCN and don't need it). Returns a
    summary dict.
    """
    if cpu_collectives:
        jax.config.update("jax_cpu_collectives_implementation", cpu_collectives)
    if (num_processes is not None and num_processes > 1) or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def local_batch_slice(global_batch: int) -> slice:
    """Each process feeds its contiguous slice of the global batch.

    Matches the row order of `global_batch_from_local` on a 1-D data mesh
    built over `jax.devices()` (process-major device order), so host i
    loading rows [i*per, (i+1)*per) reassembles exactly the global batch.
    """
    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)


def global_batch_from_local(mesh, local_rows: np.ndarray) -> jax.Array:
    """Assemble a global, data-sharded jax.Array from this process's rows.

    local_rows: the slice of the global batch this host loaded (see
    `local_batch_slice`). Under a single process this is a plain device_put
    with the sharded layout, so callers need no special-casing.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vqvdb_tpu.parallel.mesh import DATA_AXIS

    sharding = NamedSharding(mesh, P(DATA_AXIS))
    if jax.process_count() == 1:
        return jax.device_put(np.asarray(local_rows), sharding)
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local_rows)
    )

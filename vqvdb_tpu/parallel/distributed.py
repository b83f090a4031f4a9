"""Multi-host (multi-process) execution support.

Single-host multi-chip needs nothing beyond parallel/mesh.py. For pods or
multi-host slices, JAX's distributed runtime stitches processes into one
global device view; the data mesh then spans all hosts and the same
shard_map train/inference steps run unchanged — collectives ride ICI within
a slice and DCN across slices, inserted by XLA from the sharding layout.

The reference has no distributed path at all (SURVEY §2.3); this module is
the new capability's multi-host entry point.
"""

from __future__ import annotations

from typing import Optional

import jax


def init_multi_host(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize JAX's distributed runtime (no-op on single process).

    On TPU pods the arguments are auto-detected from the environment;
    pass them explicitly elsewhere. Returns a summary dict.
    """
    if num_processes is not None and num_processes > 1 or coordinator_address:
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
    """Each process feeds its slice of the global batch (per-host data
    loading for DP training)."""
    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)

"""Data-parallel codec benchmark: aggregate throughput + host-side cost model.

Round-2 projected "v5e-8 ~= 13-16M leaves/s" from the single-chip rate;
this harness replaces the projection with measurements: it runs the
file-level mesh codec end-to-end over 1..N devices and separately times
the two host stages a DP step adds or keeps serialized —
`shard_batch` (host batch -> mesh-sharded device array) and the result
gather (`np.asarray(device_result)`) — which bound aggregate throughput
no matter how many chips the compute spreads over:

    aggregate <= batch / (t_shard + t_gather + t_write_host)

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/bench_dp.py --out benchmarks/dp_host_overhead_r3.json
    python benchmarks/bench_dp.py            # on the real chip(s)

Writes one JSON document with per-mesh-size rows.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# The TPU PJRT plugin is preloaded in this image, so JAX_PLATFORMS alone
# cannot force CPU (see CLAUDE.md); honour it via jax.config before first
# jax use instead.
_plat = os.environ.get("VQVDB_PLATFORM") or os.environ.get("JAX_PLATFORMS")
if _plat:
    import jax

    jax.config.update("jax_platforms", _plat)


def _host_stage_times(codec, mesh, batch_size, k, n_rep=30):
    """Median per-call seconds for the host stages of a DP decode step."""
    import jax

    from vqvdb_tpu.parallel.mesh import shard_batch

    rng = np.random.default_rng(0)
    idx = rng.integers(0, k, (batch_size, 4, 4, 4)).astype(np.uint8)

    # shard_batch: host -> device scatter (the DP replacement for a plain
    # jnp.asarray transfer).
    ts = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        dev = shard_batch(idx, mesh)
        jax.block_until_ready(dev)
        ts.append(time.perf_counter() - t0)
    t_shard = float(np.median(ts))

    # device step + gather: run the sharded step, then materialize the
    # full result on host (what the scatter-writeback consumes).
    dev_in = shard_batch(idx, mesh)
    out = codec._decode_jit(codec.params, dev_in)
    jax.block_until_ready(out)
    tg = []
    for _ in range(n_rep):
        out = codec._decode_jit(codec.params, dev_in)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        host = np.asarray(out)
        tg.append(time.perf_counter() - t0)
    assert host.shape[0] == batch_size
    t_gather = float(np.median(tg))

    # per-shard gather (what the codec actually uses, VQCodec._host_rows):
    # shard buffers copied straight into the output, no jax reassembly.
    tps = []
    for _ in range(n_rep):
        out = codec._decode_jit(codec.params, dev_in)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        host2 = codec._host_rows(out, batch_size)
        tps.append(time.perf_counter() - t0)
    np.testing.assert_array_equal(host2, host)
    t_gather_shards = float(np.median(tps))

    # fenced device step time (dispatch->ready), for the compute column.
    td = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        out = codec._decode_jit(codec.params, dev_in)
        jax.block_until_ready(out)
        td.append(time.perf_counter() - t0)
    t_step = float(np.median(td))
    return t_shard, t_gather, t_gather_shards, t_step


def bench_mesh_size(n_dev, batch_size, n_leaves, compute_dtype):
    import jax

    from vqvdb_tpu.core.config import CodecConfig, ModelConfig
    from vqvdb_tpu.models import init_vqvae_params
    from vqvdb_tpu.parallel.mesh import make_mesh
    from vqvdb_tpu.runtime.codec import VQCodec
    from vqvdb_tpu.vdb.grid import LeafGrid

    mcfg = ModelConfig()
    params = init_vqvae_params(jax.random.key(0), mcfg)
    mesh = make_mesh(n_dev) if n_dev > 0 else None
    codec = VQCodec(params, mcfg,
                    CodecConfig(batch_size=batch_size,
                                compute_dtype=compute_dtype), mesh=mesh)

    rng = np.random.default_rng(1)
    origins = np.zeros((n_leaves, 3), np.int32)
    origins[:, 0] = np.arange(n_leaves) * 8
    leaves = rng.random((n_leaves, 8, 8, 8, 1), np.float32)
    grid = LeafGrid(name="bench", origins=origins, leaves=leaves)

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        path = Path(td) / "bench.vqvdb"
        codec.compress(grid, path)
        # warm decode (compile)
        next(iter(codec.decode_stream(path)))
        t0 = time.perf_counter()
        total = 0
        for _meta, batch, _orig in codec.decode_stream(path):
            total += batch.shape[0]
        dt = time.perf_counter() - t0

    row = {
        "n_devices": n_dev if n_dev else 1,
        "mesh": bool(mesh),
        "batch_size": batch_size,
        "leaves": total,
        "e2e_decode_leaves_per_sec": round(total / dt, 1),
    }
    if mesh is not None:
        t_shard, t_gather, t_gather_shards, t_step = _host_stage_times(
            codec, mesh, batch_size, mcfg.num_embeddings)
        row.update({
            "host_shard_ms_per_batch": round(t_shard * 1e3, 3),
            "host_gather_ms_per_batch": round(t_gather * 1e3, 3),
            "host_gather_shards_ms_per_batch": round(t_gather_shards * 1e3, 3),
            "device_step_ms_per_batch": round(t_step * 1e3, 3),
            # Host-bound ceilings if device compute were free (chips -> inf),
            # under the naive full reassembly vs the per-shard copy the
            # codec uses (VQCodec._host_rows).
            "host_bound_ceiling_leaves_per_sec": round(
                batch_size / max(t_shard + t_gather, 1e-9), 1),
            "host_bound_ceiling_shards_leaves_per_sec": round(
                batch_size / max(t_shard + t_gather_shards, 1e-9), 1),
        })
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--batch-size", type=int, default=2048)
    ap.add_argument("--leaves", type=int, default=0,
                    help="0 = auto (platform-dependent)")
    args = ap.parse_args()

    import jax

    on_tpu = jax.default_backend() == "tpu"
    n_avail = len(jax.devices())
    n_leaves = args.leaves or (200_000 if on_tpu else 6_144)
    dtype = "bfloat16" if on_tpu else "float32"

    rows = [bench_mesh_size(0, args.batch_size, n_leaves, dtype)]  # no mesh
    n = 1
    while n <= n_avail:
        rows.append(bench_mesh_size(n, args.batch_size, n_leaves, dtype))
        n *= 2
    doc = {
        "platform": jax.default_backend(),
        "devices_available": n_avail,
        "batch_size": args.batch_size,
        "leaves": n_leaves,
        "rows": rows,
    }
    text = json.dumps(doc, indent=2)
    print(text)
    if args.out:
        Path(args.out).write_text(text)


if __name__ == "__main__":
    main()

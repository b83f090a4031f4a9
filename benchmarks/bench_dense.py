"""Device-resident dense decode bench: leaves/s with the scatter ON DEVICE.

Context (docs/DP_SCALING.md): the file-level decode pipeline is host-bound
at ~1.4M leaves/s per pipeline — every decoded byte crosses D2H and is
scattered by the CPU. runtime/dense.py moves the scatter into the decode
program itself (one scan, one dispatch). This bench quantifies what that
buys:

  decode_dense   in-graph rate of the full decode+scatter+voxel-reshape
                 program (house protocol: fori_loop around the whole-scene
                 program, salted compiles, marginal-cost timing, square-sum
                 consumption of the dense output)
  decode_only    same protocol, same batches, scatter removed (the bench.py
                 north-star graph) — the delta is the on-device scatter tax
  host_path      wall-clock decode_indices + LeafGrid.to_dense for the same
                 scene (the pipeline dense.py replaces; on the axon relay
                 this is transport-inflated, see DP_SCALING.md)

Writes benchmarks/dense_r3.json.

    python benchmarks/bench_dense.py            # TPU
    VQVDB_PLATFORM=cpu python benchmarks/bench_dense.py --leaves 4000
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import statistics
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

_plat = os.environ.get("VQVDB_PLATFORM")
if _plat:
    import jax

    jax.config.update("jax_platforms", _plat)


def _scene(n_leaves: int):
    """Real smoke leaves on a compact block box (dense-friendly bbox)."""
    data_dir = ROOT / "data_scalar_r2"
    chunks = []
    for p in sorted(data_dir.glob("vol_*.npy")):
        chunks.append(np.load(p).astype(np.float32))
        if sum(c.shape[0] for c in chunks) >= n_leaves:
            break
    leaves = np.concatenate(chunks)[:n_leaves]
    n = leaves.shape[0]
    side = int(np.ceil(n ** (1 / 3)))
    origins = (np.stack(np.unravel_index(np.arange(n), (side,) * 3), 1)
               * 8).astype(np.int32)
    return leaves, origins, side


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--leaves", type=int, default=50_000)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vqvdb_tpu import api
    from vqvdb_tpu.runtime.dense import (
        _block_plan, _dense_decode_fn, _pad_steps, decode_to_dense)
    from vqvdb_tpu.vdb.grid import LeafGrid

    codec = api.make_codec(str(ROOT / "models" / "scalar.vqmodel"),
                           batch_size=args.batch)
    leaves, origins, side = _scene(args.leaves)
    print(f"[scene] {leaves.shape[0]} leaves, bbox {side}^3 blocks "
          f"({side * 8}^3 voxels), backend {jax.default_backend()}",
          file=sys.stderr)
    idx = codec.encode_leaves(leaves)
    n = idx.shape[0]
    lo, bdims, bids, _ = _block_plan(origins)
    n_blocks = int(np.prod(bdims))
    idx_steps = jnp.asarray(_pad_steps(idx, args.batch, 0))
    bid_steps = jnp.asarray(_pad_steps(bids, args.batch, n_blocks))
    raw_fn = _dense_decode_fn(codec, None)

    def dense_fn(params, x, bid_steps, n_blocks, bdims, bg):
        return raw_fn(params, x, bid_steps, None, None, n_blocks, bdims, bg)

    K = codec.mcfg.num_embeddings

    def perturb(x):
        return ((x.astype(jnp.int32) + 1) % K).astype(x.dtype)

    @functools.partial(jax.jit, static_argnames=("reps", "s", "scatter"))
    def loop(params, idx0, bid_steps, reps, s, scatter):
        def body(i, carry):
            x, acc = carry
            if scatter:
                out = dense_fn(params, x, bid_steps, n_blocks, bdims,
                               jnp.float32(0.0))
            else:
                def step(_, xs):
                    return None, codec._decode_step(params, xs[0])

                _, out = jax.lax.scan(step, None, (x, bid_steps))
            return perturb(x), acc + jnp.sum(out * out)

        _, acc = jax.lax.fori_loop(0, reps, body, (idx0, jnp.float32(s)))
        return acc

    def rate(scatter: bool, salt: int) -> float:
        float(loop(codec.params, idx_steps, bid_steps, 1, salt, scatter))
        lo_n, hi_n = 1, 4
        deltas = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(codec.params, idx_steps, bid_steps, lo_n, salt,
                       scatter))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(loop(codec.params, idx_steps, bid_steps, hi_n, salt,
                       scatter))
            t_hi = time.perf_counter() - t0
            deltas.append((t_hi - t_lo) / (hi_n - lo_n))
        deltas.sort()
        return n / max(deltas[len(deltas) // 2], 1e-9)

    out = {"backend": jax.default_backend(), "leaves": n,
           "bbox_blocks": list(bdims), "batch": args.batch}

    r_dense = [rate(True, 1000 + i) for i in range(args.reps)]
    r_plain = [rate(False, 2000 + i) for i in range(args.reps)]
    out["decode_dense_leaves_per_s"] = statistics.median(r_dense)
    out["decode_only_leaves_per_s"] = statistics.median(r_plain)
    out["scatter_tax"] = round(
        1 - out["decode_dense_leaves_per_s"] / out["decode_only_leaves_per_s"],
        4)
    out["runs_dense"] = [round(r) for r in r_dense]
    out["runs_plain"] = [round(r) for r in r_plain]

    # Host-path comparator: decode to host leaves, scatter on CPU.
    t0 = time.perf_counter()
    rec = codec.decode_indices(idx)
    LeafGrid("d", origins, rec).to_dense()
    out["host_path_leaves_per_s"] = round(n / (time.perf_counter() - t0))

    # Sanity: the dense program result matches the host scatter.
    dense, _ = decode_to_dense(codec, idx[:4096], origins[:4096])
    host, _ = LeafGrid("d", origins[:4096],
                       codec.decode_indices(idx[:4096])).to_dense()
    err = float(np.max(np.abs(np.asarray(dense) - host)))
    out["vs_host_max_abs_err"] = err
    assert err < 1e-5, err

    # Mesh row: the same dense decode sharded by x-slabs over every local
    # device (1 row on a single chip; N on a pod / the virtual CPU mesh).
    n_dev = len(jax.devices())
    if n_dev > 1:
        from vqvdb_tpu.parallel.mesh import make_mesh

        mesh_codec = api.make_codec(str(ROOT / "models" / "scalar.vqmodel"),
                                    batch_size=args.batch,
                                    mesh=make_mesh())
        t0 = time.perf_counter()
        mdense, _ = decode_to_dense(mesh_codec, idx, origins)
        jax.block_until_ready(mdense)
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        mdense, _ = decode_to_dense(mesh_codec, idx, origins)
        jax.block_until_ready(mdense)
        dt = time.perf_counter() - t0
        out["mesh_devices"] = n_dev
        out["mesh_dense_leaves_per_s"] = round(n / dt)
        out["mesh_dense_compile_s"] = round(t_first, 2)
        single_full, _ = decode_to_dense(codec, idx, origins)
        merr = float(np.max(np.abs(np.asarray(mdense)
                                   - np.asarray(single_full))))
        out["mesh_vs_single_max_abs_err"] = merr
        assert merr == 0.0, merr

    dst = ROOT / "benchmarks" / "dense_r3.json"
    dst.write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Multi-pipeline file-decode harness + threaded-copy A/B (round 4).

docs/DP_SCALING.md bounds file-level DP decode by the host memcpy floor
(~1.4M leaves/s *per pipeline* on a 1-core host) and projects v5e-8
aggregate as min(8 x 2.0M compute, n_pipelines x per-pipeline ceiling).
Round 3 ASSERTED the n_pipelines multiplier; this harness MEASURES it:

  pipelines  N OS processes, each running the full file decode pipeline
             (VqvdbReader -> decode -> host materialization) on its own
             .vqvdb file — the per-grid/per-frame parallelism a production
             host would use. Reports aggregate leaves/s for N in 1..4.
  copy_ab    the native threaded copy (vq_copy_mt, DP_SCALING fix (a))
             vs numpy assignment at the measured 4.2 MB/batch size.

On THIS 1-core host both measurements bound the environment, not the fix:
N pipelines time-slice one core and threads split one memory controller.
The numbers to read are the per-pipeline rate (does isolation hold?) and
the copy parity (no regression from threading); multi-core scaling needs a
production host. Writes benchmarks/dp_pipelines_r4.json.

    VQVDB_PLATFORM=cpu python benchmarks/bench_pipelines.py --leaves 30000
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

_WORKER = """
import sys, time
import jax
jax.config.update("jax_platforms", "cpu")
from vqvdb_tpu import api

path, model, out = sys.argv[1], sys.argv[2], sys.argv[3]
codec = api.make_codec(model, batch_size=2048, compute_dtype="float32")
codec.check_latent_shape()  # compile before the timed region
t0 = time.perf_counter()
grids, stats = codec.decompress(path)
dt = time.perf_counter() - t0
open(out, "w").write(f"{stats['leaves']} {dt}")
"""


_HOST_WORKER = """
import sys, time
import numpy as np
from vqvdb_tpu.format.vqvdb import VqvdbReader
from vqvdb_tpu.runtime.native_io import copy_into

path, out = sys.argv[1], sys.argv[2]
bs = 2048
# The per-batch decode result a device would hand back; host-only mode
# measures everything the HOST must still do per batch (file read, chunk
# deinterleave, result-row materialization) with device compute removed —
# the per-pipeline ceiling term of the DP_SCALING projection. The clock
# starts AFTER the first batch: lazy imports, dlopen of the native lib,
# and allocator warmup all land there, and at bench-scale files they
# would otherwise swamp the steady-state per-leaf rate the projection
# needs (production scenes amortize them to nothing). The cold-start
# seconds are reported separately.
sim = np.random.default_rng(0).random((bs, 8, 8, 8, 1)).astype(np.float32)
dst = None

def one_pass():
    global dst
    total = 0
    with VqvdbReader(path) as r:
        while r.has_next_grid():
            meta = r.next_grid_metadata()
            # Long-lived pipelines REUSE the result buffer across grids /
            # frames; a fresh np.empty per grid would re-pay ~0.3 s of
            # page faults per 123 MB and report fault throughput, not
            # pipeline throughput (round-5 finding).
            if dst is None or dst.shape[0] < meta.total_blocks:
                dst = np.empty((meta.total_blocks, 8, 8, 8, 1), np.float32)
            got = 0
            while r.has_next():
                idx, origins = r.next_batch(bs)
                n = idx.shape[0]
                copy_into(dst[got : got + n], sim[:n])
                got += n
            total += got
    return total

t0 = time.perf_counter()
total = one_pass()                       # cold: faults + file-cache misses
cold_s = time.perf_counter() - t0
t0 = time.perf_counter()
total3 = sum(one_pass() for _ in range(3))   # warm steady state
dt = time.perf_counter() - t0
open(out, "w").write(f"{total3} {dt} {total / cold_s}")
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--leaves", type=int, default=30_000)
    ap.add_argument("--max-pipelines", type=int, default=4)
    ap.add_argument("--host-only", action="store_true",
                    help="skip model decode in the workers: measures the "
                         "per-pipeline HOST ceiling (reader + "
                         "materialization), not CPU conv throughput")
    ap.add_argument("--out", default=None,
                    help="output JSON (default: dp_pipelines_r4.json, or "
                         "dp_pipelines_host_r4.json with --host-only)")
    args = ap.parse_args()
    if args.out is None:
        args.out = ("benchmarks/dp_pipelines_host_r4.json" if args.host_only
                    else "benchmarks/dp_pipelines_r4.json")

    _plat = os.environ.get("VQVDB_PLATFORM")
    if _plat:
        import jax

        jax.config.update("jax_platforms", _plat)

    import tempfile

    from vqvdb_tpu import api
    from vqvdb_tpu.runtime.native_io import backend, copy_into
    from vqvdb_tpu.train.synthetic import smoke_grid

    model = str(ROOT / "models" / "scalar.vqmodel")
    doc: dict = {"leaves_per_file": args.leaves, "native": backend(),
                 "host_only": bool(args.host_only)}

    # --- threaded-copy A/B at the DP batch size (4.2 MB) -----------------
    src = np.random.default_rng(0).random((2048, 8, 8, 8, 1)
                                          ).astype(np.float32)
    dst = np.empty_like(src)
    for name, fn in (("numpy", lambda: np.copyto(dst, src)),
                     ("native_mt", lambda: copy_into(dst, src))):
        fn()  # warm
        reps = 200
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        ms = (time.perf_counter() - t0) / reps * 1e3
        doc[f"copy_{name}_ms_per_4mb"] = round(ms, 3)
    doc["copy_speedup"] = round(doc["copy_numpy_ms_per_4mb"]
                                / doc["copy_native_mt_ms_per_4mb"], 2)

    # --- multi-pipeline decode -------------------------------------------
    with tempfile.TemporaryDirectory() as td:
        tdp = Path(td)
        codec = api.make_codec(model, batch_size=2048,
                               compute_dtype="float32")
        # Distinct files so pipelines share nothing but the page cache.
        chunks, total, seed = [], 0, 0
        while total < args.leaves:
            g = smoke_grid(96, seed=seed)
            chunks.append(np.asarray(g.leaves, np.float32))
            total += g.num_leaves
            seed += 1
        leaves = np.concatenate(chunks)[: args.leaves]
        from vqvdb_tpu.vdb.grid import LeafGrid

        side = int(np.ceil(args.leaves ** (1 / 3)))
        origins = (np.stack(np.unravel_index(
            np.arange(args.leaves), (side,) * 3), 1) * 8).astype(np.int32)
        for i in range(args.max_pipelines):
            codec.compress(LeafGrid(f"g{i}", origins, leaves),
                           tdp / f"f{i}.vqvdb")

        env = dict(os.environ)
        env["PYTHONPATH"] = str(ROOT) + os.pathsep + env.get("PYTHONPATH", "")
        rows = []
        for n in range(1, args.max_pipelines + 1):
            t0 = time.perf_counter()
            procs = []
            for i in range(n):
                worker_argv = (
                    [sys.executable, "-c", _HOST_WORKER,
                     str(tdp / f"f{i}.vqvdb"), str(tdp / f"r{i}.txt")]
                    if args.host_only else
                    [sys.executable, "-c", _WORKER,
                     str(tdp / f"f{i}.vqvdb"), model,
                     str(tdp / f"r{i}.txt")])
                procs.append(subprocess.Popen(
                    worker_argv,
                    env=env, stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT))
            for p in procs:
                out, _ = p.communicate(timeout=900)
                assert p.returncode == 0, out.decode()[-2000:]
            wall = time.perf_counter() - t0
            per = [open(tdp / f"r{i}.txt").read().split() for i in range(n)]
            inner = [int(t[0]) / float(t[1]) for t in per]
            # Leaves actually processed inside `wall`: the host-only worker
            # runs 1 cold + 3 warm passes (t[0] counts the warm ones), the
            # full worker one pass — count them, or the incl-startup column
            # deflates by the pass count.
            done = [int(t[0]) + (args.leaves if len(t) > 2 else 0)
                    for t in per]
            row = {
                "pipelines": n,
                "aggregate_leaves_per_s_incl_startup": round(
                    sum(done) / wall),
                "per_pipeline_leaves_per_s": [round(r) for r in inner],
                "aggregate_leaves_per_s": round(sum(inner)),
            }
            if len(per[0]) > 2:  # host-only: first (cold) pass rate
                row["cold_pass_leaves_per_s"] = [round(float(t[2]))
                                                 for t in per]
            rows.append(row)
            print(json.dumps(rows[-1]), flush=True)
        doc["pipelines"] = rows

    (ROOT / args.out).write_text(json.dumps(doc, indent=2))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

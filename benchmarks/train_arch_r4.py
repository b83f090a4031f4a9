"""Round-4 encoder-arch quality ladder: train every encoder arch with the
SAME flagship recipe on the SAME (3x round-3) pools and judge on the 50k
unseen sets — the quality gate for the packed/packed_lite TPU encoders
(VERDICT r3 item 1: ">=2x encode at equal-or-better PSNR per family").

Also doubles as the round-4 data-scale rung for the reference arch
(item 8): pools are 900 smoke / 450 levelset / 540 velocity volumes vs the
committed artifacts' 450/225/270.

    python benchmarks/train_arch_r4.py [--epochs 200] [--only scalar_packed ...]

Writes <out-dir>/<job>.vqmodel(+.history.json) and
benchmarks/arch_quality_r4.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

_plat = os.environ.get("VQVDB_PLATFORM")
if _plat:
    import jax

    jax.config.update("jax_platforms", _plat)

from retrain_scale_r3 import eval_pool, scalar_pool, vec3_pool  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", type=int, default=900)
    ap.add_argument("--levelset", type=int, default=450)
    ap.add_argument("--velocity", type=int, default=540)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--min-blocks", type=int, default=50_000)
    ap.add_argument("--out-dir", default="/tmp/arch_r4")
    ap.add_argument("--out-json", default="benchmarks/arch_quality_r4.json")
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--pool-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="resident-pool dtype (bfloat16 halves HBM — "
                         "needed for reference-arch vec3 at the 10x pool)")
    ap.add_argument("--pool-segments", type=int, default=1,
                    help="epoch-sharded resident pool: each compiled span "
                         "runs over 1/S of the pool (the big-pool worker "
                         "crash workaround — TrainConfig.pool_segments)")
    args = ap.parse_args()

    import jax

    from vqvdb_tpu import api
    from vqvdb_tpu.core.artifact import save_model
    from vqvdb_tpu.core.config import ModelConfig
    from vqvdb_tpu.eval.metrics import evaluate_codec
    from vqvdb_tpu.train.fast import train_on_device
    from vqvdb_tpu.train.train import TrainConfig

    compute = "float32" if jax.default_backend() == "cpu" else "bfloat16"
    tcfg = TrainConfig(epochs=args.epochs, batch_size=2048, lr=1e-4,
                       compute_dtype=compute, pool_dtype=args.pool_dtype,
                       pool_segments=args.pool_segments,
                       val_fraction=0.0, seed=0)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    jobs = {
        "scalar_reference": (ModelConfig(), "scalar"),
        "scalar_packed": (ModelConfig(encoder_arch="packed"), "scalar"),
        "scalar_packed_lite": (ModelConfig(encoder_arch="packed_lite"),
                               "scalar"),
        # Round-5 hybrid: packed + cheap 8^3 stem (VERDICT r4 item 1b) —
        # targets the levelset tail the 4^3-only packed graph loses.
        "scalar_packed_stem": (ModelConfig(encoder_arch="packed_stem"),
                               "scalar"),
        "vec3_packed_stem": (ModelConfig(in_channels=3,
                                         encoder_arch="packed_stem"),
                             "vec3"),
        "vec3_reference": (ModelConfig(in_channels=3), "vec3"),
        "vec3_packed": (ModelConfig(in_channels=3, encoder_arch="packed"),
                        "vec3"),
        # RVQ quality-tier rungs (VERDICT r3 item 8: flagship + rvq2 at
        # the scaled pools); reference arch matches the committed rvq2
        # artifact lineage.
        "scalar_rvq2": (ModelConfig(num_quantizers=2), "scalar"),
        "vec3_rvq2": (ModelConfig(in_channels=3, num_quantizers=2), "vec3"),
        # Packed-encoder vec3 RVQ tier: pairs the round-4 packed vec3
        # flagship with its quality tier (the reference-arch vec3 graph
        # cannot train at the 10x f32 resident pool — see pool_dtype).
        "vec3_rvq2_packed": (ModelConfig(in_channels=3,
                                         encoder_arch="packed",
                                         num_quantizers=2), "vec3"),
        # Round-5: the recommended quality tier moves onto the
        # TPU-co-designed encoder — same packed+rebalanced-pool recipe
        # that flipped the scalar flagship (arch_r5_packed_rebal.json).
        "scalar_rvq2_packed": (ModelConfig(encoder_arch="packed",
                                           num_quantizers=2), "scalar"),
    }
    if args.only:
        jobs = {k: v for k, v in jobs.items() if k in args.only}

    if args.pool_dtype == "bfloat16":
        scalar_jobs = [k for k, (_, fam) in jobs.items() if fam == "scalar"]
        if scalar_jobs:
            ap.error(f"--pool-dtype bfloat16 would bf16-round the recon "
                     f"target of 55+ dB scalar rungs {scalar_jobs} — run "
                     f"them in a separate f32-pool invocation (see "
                     f"TrainConfig.pool_dtype docs)")

    pools: dict = {}

    def pool_for(family: str) -> np.ndarray:
        if family not in pools:
            pools[family] = (scalar_pool(args.smoke, args.levelset)
                             if family == "scalar"
                             else vec3_pool(args.velocity))
            print(f"[pool/{family}] {pools[family].shape[0]} leaves",
                  flush=True)
        return pools[family]

    evals: dict = {}
    rows = []
    for name, (mcfg, family) in jobs.items():
        dst = out_dir / f"{name}.vqmodel"
        if not dst.exists():
            data = pool_for(family)
            t0 = time.time()
            with tempfile.TemporaryDirectory() as ck:
                state, trace = train_on_device(data, mcfg, tcfg,
                                               checkpoint_dir=ck,
                                               resume=False)
            save_model(dst, state.params, mcfg)
            hist = {k: trace[:, i].tolist() for i, k in enumerate(
                ("loss", "recon", "vq", "perplexity", "val_loss"))}
            dst.with_suffix(".history.json").write_text(json.dumps(hist))
            print(f"[trained] {name}: {data.shape[0]} leaves in "
                  f"{time.time() - t0:.0f}s final={float(trace[-1, 0]):.5f}",
                  flush=True)
        row = {"model": name, "arch": mcfg.encoder_arch}
        codec = api.make_codec(str(dst), batch_size=2048,
                               compute_dtype=compute)
        fams = ("smoke", "levelset") if family == "scalar" else ("velocity",)
        for fam in fams:
            if fam not in evals:
                evals[fam] = eval_pool(fam, args.min_blocks)
            rep = evaluate_codec(codec, evals[fam])
            row[f"{fam}_psnr_mean"] = round(float(rep["psnr_mean"]), 3)
            row[f"{fam}_psnr_p5"] = round(float(rep["psnr_p5"]), 2)
            row[f"{fam}_zero_mse"] = float(f"{rep['zero_voxel_mse']:.3e}")
        rows.append(row)
        print(json.dumps(row), flush=True)

    doc = {"recipe": f"flagship ({args.epochs} epochs, b2048, lr 1e-4, "
                     "full data, device-resident)",
           "pools": {"smoke": args.smoke, "levelset": args.levelset,
                     "velocity": args.velocity},
           "psnr_metric": "mean per-block PSNR (eval-report metric)",
           "eval_blocks_per_family": args.min_blocks,
           "rows": rows}
    (ROOT / args.out_json).write_text(json.dumps(doc, indent=2))
    print(f"wrote {args.out_json}")


if __name__ == "__main__":
    main()

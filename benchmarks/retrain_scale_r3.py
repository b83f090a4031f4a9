"""Retrain all shipped artifacts at a chosen data scale (swap pipeline).

The data-scaling ladder (data_scaling_r3.json) showed quality still
climbing at 2-3x the committed pools. This script retrains the four
shipped artifacts — scalar flagship (S=1), scalar residual-VQ tier (S=2),
vec3 flagship, vec3 RVQ tier — at a chosen scale with the fixed flagship
recipe (200 epochs, b2048, lr 1e-4, full data, device-resident), saves
models + history JSONs to --out-dir, and evaluates each on the 50k-block
unseen sets (seeds 1000+; mean per-block PSNR, the eval-report metric).

Scale semantics: --smoke N --levelset M --velocity V volume counts
(committed pools: 300/150/180). Seeds: smoke/velocity take the first N/V
seeds from train_seeds() (counting from 0 but skipping the reserved eval
band [1000, 2000)), levelset 5000..5000+M-1 — supersets of the committed
pools, disjoint from the eval pools (seeds 1000+) at every scale.

    python benchmarks/retrain_scale_r3.py --smoke 900 --levelset 450 \
        --velocity 540
Writes <out-dir>/{scalar,scalar_rvq2,vec3,vec3_rvq2}.vqmodel(+.history.json)
and benchmarks/retrain_scale_r3.json with the eval comparison.
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


def scalar_pool(n_smoke: int, n_level: int) -> np.ndarray:
    from vqvdb_tpu.train.synthetic import levelset_grid, smoke_grid, train_seeds

    # train_seeds skips the reserved eval band [1000, 2000) so pools larger
    # than 1000 smoke volumes stay disjoint from the 50k-block eval sets.
    chunks = [np.asarray(smoke_grid(96, seed=s).leaves, np.float32)
              for s in train_seeds(n_smoke)]
    chunks += [np.asarray(levelset_grid(96, seed=s).leaves, np.float32)
               for s in range(5000, 5000 + n_level)]
    return np.concatenate(chunks)


def vec3_pool(n_vel: int) -> np.ndarray:
    from vqvdb_tpu.train.synthetic import train_seeds, velocity_grid

    return np.concatenate(
        [np.asarray(velocity_grid(96, seed=s).leaves, np.float32)
         for s in train_seeds(n_vel)])


def eval_pool(kind: str, min_blocks: int) -> np.ndarray:
    from vqvdb_tpu.train.synthetic import (levelset_grid, smoke_grid,
                                           velocity_grid)

    fac = {"smoke": smoke_grid, "levelset": levelset_grid,
           "velocity": velocity_grid}[kind]
    chunks, total, seed = [], 0, 1000
    while total < min_blocks:
        g = fac(96, seed=seed)
        chunks.append(np.asarray(g.leaves, np.float32))
        total += g.num_leaves
        seed += 1
    return np.concatenate(chunks)[:min_blocks]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", type=int, default=900)
    ap.add_argument("--levelset", type=int, default=450)
    ap.add_argument("--velocity", type=int, default=540)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--min-blocks", type=int, default=50_000)
    ap.add_argument("--out-dir", default="/tmp/swap")
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of {scalar, scalar_rvq2, vec3, vec3_rvq2}")
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
                       compute_dtype=compute, val_fraction=0.0, seed=0)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    jobs = {
        "scalar": (ModelConfig(), "scalar"),
        "scalar_rvq2": (ModelConfig(num_quantizers=2), "scalar"),
        "vec3": (ModelConfig(in_channels=3), "vec3"),
        "vec3_rvq2": (ModelConfig(in_channels=3, num_quantizers=2), "vec3"),
    }
    if args.only:
        jobs = {k: v for k, v in jobs.items() if k in args.only}

    pools_cache: dict = {}

    def train_pool_for(family: str) -> np.ndarray:
        if family not in pools_cache:
            pools_cache[family] = (scalar_pool(args.smoke, args.levelset)
                                   if family == "scalar"
                                   else vec3_pool(args.velocity))
        return pools_cache[family]

    rows = []
    for name, (mcfg, family) in jobs.items():
        dst = out_dir / f"{name}.vqmodel"
        if not dst.exists():
            data = train_pool_for(family)
            t0 = time.time()
            with tempfile.TemporaryDirectory() as ck:
                state, trace = train_on_device(data, mcfg, tcfg,
                                               checkpoint_dir=ck,
                                               resume=False)
            save_model(dst, state.params, mcfg)
            hist = {"loss": trace[:, 0].tolist(),
                    "recon": trace[:, 1].tolist(),
                    "vq": trace[:, 2].tolist(),
                    "perplexity": trace[:, 3].tolist(),
                    "val_loss": trace[:, 4].tolist()}
            dst.with_suffix(".history.json").write_text(json.dumps(hist))
            print(f"[trained] {name}: {data.shape[0]} leaves in "
                  f"{time.time()-t0:.0f}s final={float(trace[-1,0]):.5f}")
        row = {"model": name, "train_volumes":
               {"scalar": [args.smoke, args.levelset],
                "vec3": [args.velocity]}[family]}
        codec = api.make_codec(str(dst), batch_size=2048,
                               compute_dtype=compute)
        fams = ("smoke", "levelset") if family == "scalar" else ("velocity",)
        for fam in fams:
            rep = evaluate_codec(codec, eval_pool(fam, args.min_blocks))
            row[f"{fam}_psnr_mean"] = round(float(rep["psnr_mean"]), 3)
            row[f"{fam}_psnr_p5"] = round(float(rep["psnr_p5"]), 2)
            row[f"{fam}_zero_mse"] = float(f"{rep['zero_voxel_mse']:.3e}")
        rows.append(row)
        print(json.dumps(row))

    doc = {"recipe": "flagship (200 epochs, b2048, lr 1e-4, full data)",
           "psnr_metric": "mean per-block PSNR (eval-report metric)",
           "eval_blocks_per_family": args.min_blocks,
           "rows": rows}
    (ROOT / "benchmarks" / "retrain_scale_r3.json").write_text(
        json.dumps(doc, indent=2))
    print("wrote benchmarks/retrain_scale_r3.json")


if __name__ == "__main__":
    main()

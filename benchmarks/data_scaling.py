"""Data-scaling ladder for the scalar flagship.

Round 3's data-diversity experiment (retrain_data15_r3.json) measured
+1.45/+1.55 dB from +50% training volumes at a fixed recipe. This ladder
extends the curve: train the flagship recipe (200 epochs, b2048, lr 1e-4,
full data, device-resident) on 1x / 1.5x / 2x the committed pool and
evaluate each on the 50k-block unseen sets (seeds 1000+). All added
volumes use fresh seeds disjoint from the eval pool and each other:

  1x   smoke 0-299   + levelset 5000-5149   (the committed flagship's pool)
  1.5x smoke 0-449   + levelset 5000-5224
  2x   smoke 0-599   + levelset 5000-5299

The 1x row is NOT retrained: the committed models/scalar.vqmodel is that
point (recipe equality verified leaf-for-leaf in train_k_models.py).

    python benchmarks/data_scaling.py                # TPU
    python benchmarks/data_scaling.py --only 2.0     # one rung
Writes /tmp/data_scaling/x{scale}.vqmodel + benchmarks/data_scaling_r3.json.
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

RUNGS = {  # scale -> (smoke volumes, levelset volumes)
    "1.5": (450, 225),
    "2.0": (600, 300),
    "3.0": (900, 450),
    "4.5": (1350, 675),
}
# Measured pool sizes (so cached-model re-evals still report them).
POOL_LEAVES = {"1.5": 266168, "2.0": 356595, "3.0": 532108}


def pool(n_smoke: int, n_level: int) -> np.ndarray:
    from vqvdb_tpu.train.synthetic import levelset_grid, smoke_grid, train_seeds

    # train_seeds skips the reserved eval band [1000, 2000): pools <= 1000
    # smoke volumes are identical to the historical 0..n-1 scheme, larger
    # pools continue at 2000+ instead of overlapping the eval seeds. (The
    # originally-published 4.5x rung used raw range(1350) and trained on the
    # whole smoke eval pool; its smoke number was contaminated.)
    chunks = [np.asarray(smoke_grid(96, seed=s).leaves, np.float32)
              for s in train_seeds(n_smoke)]
    chunks += [np.asarray(levelset_grid(96, seed=s).leaves, np.float32)
               for s in range(5000, 5000 + n_level)]
    return np.concatenate(chunks)


def eval_pools(min_blocks: int) -> dict:
    from vqvdb_tpu.train.synthetic import levelset_grid, smoke_grid

    out = {}
    for kind, fac in (("smoke", smoke_grid), ("levelset", levelset_grid)):
        chunks, total, seed = [], 0, 1000
        while total < min_blocks:
            g = fac(96, seed=seed)
            chunks.append(np.asarray(g.leaves, np.float32)[..., 0])
            total += g.num_leaves
            seed += 1
        out[kind] = np.concatenate(chunks)[:min_blocks]
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--min-blocks", type=int, default=50_000)
    ap.add_argument("--out-dir", default="/tmp/data_scaling")
    args = ap.parse_args()

    import jax

    from vqvdb_tpu import api
    from vqvdb_tpu.core.artifact import save_model
    from vqvdb_tpu.core.config import ModelConfig
    from vqvdb_tpu.train.fast import train_on_device
    from vqvdb_tpu.train.train import TrainConfig
    from vqvdb_tpu.vdb.grid import psnr, split_mse

    rungs = dict(RUNGS)
    if args.only:
        rungs = {k: v for k, v in rungs.items() if k in args.only}
    compute = "float32" if jax.default_backend() == "cpu" else "bfloat16"
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    pools = eval_pools(args.min_blocks)
    rows = []

    def eval_row(label: str, model_path: Path, extra: dict) -> None:
        codec = api.make_codec(str(model_path), batch_size=2048,
                               compute_dtype=compute)
        row = {"scale": label, **extra}
        for fam, leaves in pools.items():
            idx = codec.encode_leaves(leaves)
            rec = codec.decode_indices(idx)[..., 0]
            row[f"{fam}_psnr_db"] = round(psnr(rec, leaves), 3)
            z, nz = split_mse(rec, leaves)
            row[f"{fam}_zero_mse"] = float(f"{z:.3e}")
        rows.append(row)
        print(json.dumps(row))

    eval_row("1.0", ROOT / "models" / "scalar.vqmodel",
             {"train_leaves": 174693, "note": "committed flagship"})

    tcfg = TrainConfig(epochs=args.epochs, batch_size=2048, lr=1e-4,
                       compute_dtype=compute, val_fraction=0.0, seed=0)
    for label, (ns, nl) in rungs.items():
        dst = out_dir / f"x{label}.vqmodel"
        if not dst.exists():
            data = pool(ns, nl)
            t0 = time.time()
            with tempfile.TemporaryDirectory() as ck:
                state, trace = train_on_device(data, ModelConfig(), tcfg,
                                               checkpoint_dir=ck,
                                               resume=False)
            save_model(dst, state.params, ModelConfig())
            print(f"[trained] x{label}: {data.shape[0]} leaves in "
                  f"{time.time()-t0:.0f}s final={float(trace[-1,0]):.5f}")
            n_leaves = int(data.shape[0])
            del data
        else:
            n_leaves = POOL_LEAVES.get(label)
        eval_row(label, dst, {"train_leaves": n_leaves})

    doc = {"recipe": "flagship (200 epochs, b2048, lr 1e-4, full data), "
                     "only data volume varied",
           "psnr_metric": "pooled -10*log10(global MSE) (k_sweep metric)",
           "eval_blocks_per_family": args.min_blocks,
           "rows": rows}
    dst = ROOT / "benchmarks" / "data_scaling_r3.json"
    dst.write_text(json.dumps(doc, indent=2))
    print("wrote", dst)


if __name__ == "__main__":
    main()

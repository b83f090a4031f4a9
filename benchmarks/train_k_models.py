"""Train the k_sweep frontier models with the flagship recipe.

Reproduces the committed scalar artifact's exact training pool — smoke
seeds 0-299 + level-set seeds 5000-5149 at size 96 (174,693 leaves,
verified equal to benchmarks/retrain_data15_r3.json's count) — and the
recipe that produced it (200 epochs, b2048, lr 1e-4, --val-fraction 0,
device-resident), varying ONLY the quantizer: K in {128, 512, 1024} and
an S=2 residual-VQ variant at K=256. The committed models/scalar.vqmodel
IS the K=256 S=1 point, so the sweep rows are recipe-matched end to end.

    python benchmarks/train_k_models.py                 # TPU, all models
    python benchmarks/train_k_models.py --only 512      # one model
Writes /tmp/k_sweep/k{K}.vqmodel and /tmp/k_sweep/rvq2.vqmodel.
"""

from __future__ import annotations

import argparse
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


def flagship_pool() -> np.ndarray:
    from vqvdb_tpu.train.synthetic import levelset_grid, smoke_grid

    chunks = [np.asarray(smoke_grid(96, seed=s).leaves, np.float32)
              for s in range(300)]
    chunks += [np.asarray(levelset_grid(96, seed=s).leaves, np.float32)
               for s in range(5000, 5150)]
    return np.concatenate(chunks)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, nargs="*", default=None,
                    help="subset of {128, 512, 1024, rvq2}")
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--out-dir", default="/tmp/k_sweep")
    args = ap.parse_args()

    import jax

    from vqvdb_tpu.core.artifact import save_model
    from vqvdb_tpu.core.config import ModelConfig
    from vqvdb_tpu.train.fast import train_on_device
    from vqvdb_tpu.train.train import TrainConfig

    variants = {
        "128": ModelConfig(num_embeddings=128),
        "512": ModelConfig(num_embeddings=512),
        "1024": ModelConfig(num_embeddings=1024),
        "rvq2": ModelConfig(num_embeddings=256, num_quantizers=2),
    }
    if args.only:
        variants = {k: v for k, v in variants.items() if k in args.only}

    pool = flagship_pool()
    print(f"training pool: {pool.shape[0]} leaves "
          f"(expect 174693 for the flagship recipe)")
    compute = "float32" if jax.default_backend() == "cpu" else "bfloat16"
    tcfg = TrainConfig(epochs=args.epochs, batch_size=2048, lr=1e-4,
                       compute_dtype=compute, val_fraction=0.0, seed=0)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for label, mcfg in variants.items():
        name = f"rvq2.vqmodel" if label == "rvq2" else f"k{label}.vqmodel"
        dst = out_dir / name
        if dst.exists():
            print(f"[skip] {dst} exists")
            continue
        t0 = time.time()
        with tempfile.TemporaryDirectory() as ck:
            state, trace = train_on_device(pool, mcfg, tcfg,
                                           checkpoint_dir=ck, resume=False)
        save_model(dst, state.params, mcfg)
        print(f"[done] {dst} in {time.time()-t0:.0f}s "
              f"final_loss={float(trace[-1, 0]):.5f}")


if __name__ == "__main__":
    main()

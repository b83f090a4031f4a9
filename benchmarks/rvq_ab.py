"""Residual-VQ A/B: what does a second quantizer stage buy at a matched
recipe?

Trains two scalar models that differ ONLY in num_quantizers (S=1 vs S=2;
same data, same seeds, same epochs/batch/lr) with the device-resident
trainer, then evaluates both on unseen blocks (seeds 1000+, the same pool
as gen_eval_r3.py) and measures the real storage cost from encoded files
(raw v3 and entropy-coded v5). The claim under test: S=2 spends 2x the raw
index bytes (128 vs 64 per leaf) but far less than 2x after entropy
coding, for a PSNR gain no single-stage K<=256 model can reach — the
quality tier the reference architecture is locked out of
(ref: src/Utils/VQVDB_Reader.cpp one uint8 per latent position;
python/VQVAE_v2.py single VectorQuantizerEMA).

Scale knobs (--train-leaves/--epochs/--min-blocks) exist because the CPU
host can only afford a reduced recipe; the TPU run uses the full one.

    python benchmarks/rvq_ab.py                              # TPU, full
    VQVDB_PLATFORM=cpu python benchmarks/rvq_ab.py \
        --train-leaves 2048 --epochs 24 --batch-size 256 --min-blocks 3000
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


def train_pool(n_leaves: int, seed0: int = 3000) -> np.ndarray:
    """Training blocks from seeds disjoint from the 1000+ eval pool and
    the committed artifacts' data (seeds < 1000 and 2000-2199)."""
    from vqvdb_tpu.train.synthetic import smoke_grid

    chunks, total, seed = [], 0, seed0
    while total < n_leaves:
        g = smoke_grid(96, seed=seed)
        chunks.append(np.asarray(g.leaves, np.float32))
        total += g.num_leaves
        seed += 1
    return np.concatenate(chunks)[:n_leaves]


def eval_pool(n_blocks: int) -> np.ndarray:
    from vqvdb_tpu.train.synthetic import smoke_grid

    chunks, total, seed = [], 0, 1000
    while total < n_blocks:
        g = smoke_grid(96, seed=seed)
        chunks.append(np.asarray(g.leaves, np.float32)[..., 0])
        total += g.num_leaves
        seed += 1
    return np.concatenate(chunks)[:n_blocks]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-leaves", type=int, default=40_000)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--batch-size", type=int, default=2048)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--num-embeddings", type=int, default=256)
    ap.add_argument("--min-blocks", type=int, default=50_000)
    ap.add_argument("--stages", type=int, nargs="*", default=[1, 2])
    ap.add_argument("--out", default=None)
    ap.add_argument("--save-models-dir", default=None,
                    help="keep the trained .vqmodel artifacts here")
    args = ap.parse_args()

    import jax

    from vqvdb_tpu import api
    from vqvdb_tpu.core.artifact import save_model
    from vqvdb_tpu.core.config import CodecConfig, ModelConfig
    from vqvdb_tpu.runtime.codec import VQCodec
    from vqvdb_tpu.train.fast import train_on_device
    from vqvdb_tpu.train.train import TrainConfig
    from vqvdb_tpu.vdb.grid import LeafGrid, psnr, split_mse

    train_leaves = train_pool(args.train_leaves)
    pool = eval_pool(args.min_blocks)
    compute = "float32" if jax.default_backend() == "cpu" else "bfloat16"
    rows = []
    for s_stages in args.stages:
        mcfg = ModelConfig(num_embeddings=args.num_embeddings,
                           num_quantizers=s_stages)
        tcfg = TrainConfig(epochs=args.epochs, batch_size=args.batch_size,
                           lr=args.lr, compute_dtype=compute,
                           val_fraction=0.0, seed=0)
        t0 = time.time()
        with tempfile.TemporaryDirectory() as ck:
            state, trace = train_on_device(train_leaves, mcfg, tcfg,
                                           checkpoint_dir=ck, resume=False)
        train_s = time.time() - t0
        params = state.params
        if args.save_models_dir:
            d = Path(args.save_models_dir)
            d.mkdir(parents=True, exist_ok=True)
            save_model(d / f"rvq_s{s_stages}.vqmodel", params, mcfg)
        codec = VQCodec(params, mcfg,
                        CodecConfig(batch_size=args.batch_size,
                                    compute_dtype=compute))
        idx = codec.encode_leaves(pool)
        rec = codec.decode_indices(idx)[..., 0]
        z_mse, nz_mse = split_mse(rec, pool)
        row = {
            "num_quantizers": s_stages,
            "K": args.num_embeddings,
            "psnr_db": round(psnr(rec, pool), 3),
            "zero_mse": float(f"{z_mse:.3e}"),
            "nonzero_mse": float(f"{nz_mse:.3e}"),
            "final_train_loss": float(trace[-1, 0]),
            "train_seconds": round(train_s, 1),
        }
        # Real storage cost from files.
        n = pool.shape[0]
        side = int(np.ceil(n ** (1 / 3)))
        origins = (np.stack(np.unravel_index(np.arange(n), (side,) * 3), 1)
                   * 8).astype(np.int32)
        grid = LeafGrid("density", origins, pool)
        with tempfile.TemporaryDirectory() as td:
            raw, v5 = Path(td) / "raw.vqvdb", Path(td) / "v5.vqvdb"
            api.encode(grid, codec, raw)
            api.encode(grid, codec, v5, format_version=5)
            row["raw_bytes_per_leaf"] = round(raw.stat().st_size / n, 2)
            row["v5_bytes_per_leaf"] = round(v5.stat().st_size / n, 2)
        rows.append(row)
        print(json.dumps(row))

    base = next((r for r in rows if r["num_quantizers"] == 1), None)
    summary = {
        "recipe": {"train_leaves": args.train_leaves, "epochs": args.epochs,
                   "batch_size": args.batch_size, "lr": args.lr,
                   "compute_dtype": compute,
                   "backend": jax.default_backend(),
                   "eval_blocks": int(pool.shape[0])},
        "rows": rows,
    }
    if base is not None:
        for r in rows:
            if r is not base:
                r["psnr_gain_vs_s1_db"] = round(r["psnr_db"] - base["psnr_db"], 3)
                r["v5_size_ratio_vs_s1"] = round(
                    r["v5_bytes_per_leaf"] / base["v5_bytes_per_leaf"], 3)
    dst = Path(args.out) if args.out else ROOT / "benchmarks" / "rvq_ab_r3.json"
    dst.write_text(json.dumps(summary, indent=2))
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()

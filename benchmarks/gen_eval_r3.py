"""Round-3 quality evaluation at reference scale (>=50k blocks/family).

Round 2's committed eval reports covered 837/934/861 blocks; the
reference's acceptance harness validated 345,929 (notebook_scalar.ipynb
cell 1). This script regenerates docs/eval_report{,_levelset,_vec3} from
>=50k unseen procedural blocks per family (smoke / narrow-band level set /
curl-noise velocity, seeds 1000+ — disjoint from every training seed) so
the headline MSE/PSNR claims carry a sample size that supports them.

    python benchmarks/gen_eval_r3.py                 # TPU (or default)
    VQVDB_PLATFORM=cpu python benchmarks/gen_eval_r3.py --min-blocks 2000

Writes the reports plus benchmarks/eval_r3.json with the aggregate rows.
"""

from __future__ import annotations

import argparse
import json
import os
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

FAMILIES = {
    # name -> (grid factory, volume size, model, report dir, title note)
    "smoke": ("smoke", 96, "models/scalar.vqmodel", "docs/eval_report",
              "unseen smoke volumes, seeds 1000+"),
    "levelset": ("levelset", 96, "models/scalar.vqmodel",
                 "docs/eval_report_levelset",
                 "unseen narrow-band level sets, seeds 1000+"),
    "vec3": ("velocity", 96, "models/vec3.vqmodel", "docs/eval_report_vec3",
             "unseen curl-noise velocity volumes, seeds 1000+"),
}


def gather_family(kind: str, size: int, min_blocks: int) -> np.ndarray:
    from vqvdb_tpu.train.synthetic import (levelset_grid, smoke_grid,
                                           velocity_grid)

    factory = {"smoke": smoke_grid, "levelset": levelset_grid,
               "velocity": velocity_grid}[kind]
    chunks, total, seed = [], 0, 1000
    while total < min_blocks:
        g = factory(size, seed=seed)
        chunks.append(np.asarray(g.leaves, np.float32))
        total += g.num_leaves
        seed += 1
    leaves = np.concatenate(chunks, axis=0)
    print(f"[{kind}] {total} blocks from {seed - 1000} volumes "
          f"(size {size}^3)", file=sys.stderr)
    return leaves


def eval_family(name: str, min_blocks: int, batch_size: int,
                model_override=None, write_reports=True) -> dict:
    from vqvdb_tpu import api
    from vqvdb_tpu.eval.metrics import codebook_report, evaluate_codec
    from vqvdb_tpu.eval.report import write_report

    kind, size, model, report_dir, note = FAMILIES[name]
    model_path = Path(model_override) if model_override else ROOT / model
    if not model_path.exists():
        print(f"[{name}] SKIP: {model} missing", file=sys.stderr)
        return {"family": name, "skipped": True}
    leaves = gather_family(kind, size, min_blocks)
    codec = api.make_codec(model_path, batch_size=batch_size)
    t0 = time.perf_counter()
    report = evaluate_codec(codec, leaves)
    dt = time.perf_counter() - t0
    cb = codebook_report(report["indices"], codec.mcfg.num_embeddings)

    if write_reports:
        k = min(6, leaves.shape[0])
        recon = codec.decode_indices(report["indices"][:k])
        write_report(ROOT / report_dir, report, cb,
                     sample_leaves=leaves[:k], sample_recon=recon,
                     title=f"eval: {model} ({note}; "
                           f"{__import__('jax').default_backend()} "
                           f"{codec.ccfg.compute_dtype} eval, "
                           f"{report['num_blocks']} blocks)")
    row = {k2: v for k2, v in report.items() if not isinstance(v, np.ndarray)}
    row.update({k2: v for k2, v in cb.items() if not isinstance(v, np.ndarray)})
    # Spread evidence for threshold-setting: percentile ladder of PSNR.
    psnr = report["per_block_psnr"]
    finite = psnr[np.isfinite(psnr)]
    row["psnr_percentiles"] = {
        str(p): round(float(np.percentile(finite, p)), 2)
        for p in (1, 5, 25, 50, 75, 95, 99)}
    row["family"] = name
    row["eval_seconds"] = round(dt, 2)
    print(f"[{name}] {row['num_blocks']} blocks: mean {row['psnr_mean']:.2f} "
          f"dB, mse {row['mse']:.3e}, zero {row['zero_voxel_mse']:.3e} "
          f"({dt:.1f}s)", file=sys.stderr)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-blocks", type=int, default=50_000)
    ap.add_argument("--batch-size", type=int, default=2048)
    ap.add_argument("--families", nargs="*", default=list(FAMILIES))
    ap.add_argument("--out", default=str(ROOT / "benchmarks/eval_r3.json"))
    ap.add_argument("--scalar-model", default=None,
                    help="override the scalar model path (no reports written)")
    ap.add_argument("--vec3-model", default=None)
    ap.add_argument("--no-reports", action="store_true")
    args = ap.parse_args()

    overrides = {"smoke": args.scalar_model, "levelset": args.scalar_model,
                 "vec3": args.vec3_model}
    rows = [eval_family(f, args.min_blocks, args.batch_size,
                        model_override=overrides.get(f),
                        write_reports=not args.no_reports)
            for f in args.families]
    doc = {"min_blocks": args.min_blocks, "rows": rows}
    Path(args.out).write_text(json.dumps(doc, indent=2))
    print(json.dumps(doc, indent=2))


if __name__ == "__main__":
    main()

"""Re-anchor the trained-quality gates after an artifact swap (rounds 4-5).

Runs the exact leading-seed evals the gates in tests/test_trained_quality.py
use, against the CURRENTLY COMMITTED artifacts, and prints the measured
anchors. Floors are then set by hand ~1.5-3 dB below these (retrain
headroom) — this script only measures; it never edits tests.

    VQVDB_PLATFORM=cpu python benchmarks/anchor_gates.py
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

_plat = os.environ.get("VQVDB_PLATFORM")
if _plat:
    import jax

    jax.config.update("jax_platforms", _plat)


def main() -> None:
    from vqvdb_tpu import api
    from vqvdb_tpu.eval.metrics import evaluate_codec
    from vqvdb_tpu.train.synthetic import (levelset_grid, smoke_grid,
                                           velocity_grid)

    models = ROOT / "models"
    jobs = [
        ("scalar", models / "scalar.vqmodel",
         [("smoke", smoke_grid, (1000, 1001, 1002)),
          ("levelset", levelset_grid, (1000, 1001, 1002))]),
        ("scalar_reference", models / "scalar_reference.vqmodel",
         [("smoke", smoke_grid, (1000, 1001, 1002)),
          ("levelset", levelset_grid, (1000, 1001, 1002))]),
        ("scalar_packed_lite", models / "scalar_packed_lite.vqmodel",
         [("smoke", smoke_grid, (1000, 1001, 1002))]),
        ("scalar_rvq2", models / "scalar_rvq2.vqmodel",
         [("smoke", smoke_grid, (1000, 1001, 1002)),
          ("levelset", levelset_grid, (1000, 1001, 1002))]),
        ("vec3", models / "vec3.vqmodel",
         [("velocity", velocity_grid, (1000,))]),
        ("vec3_rvq2", models / "vec3_rvq2.vqmodel",
         [("velocity", velocity_grid, (1000,))]),
        # test_trained_model_quality's probe: smoke_grid(64, seed=9999)
        ("scalar@9999", models / "scalar.vqmodel",
         [("smoke64", lambda size, seed: smoke_grid(64, seed=seed),
           (9999,))]),
    ]
    out = {}
    for name, path, fams in jobs:
        if not path.exists():
            continue
        codec = api.make_codec(str(path), batch_size=256,
                               compute_dtype="float32")
        for fam, factory, seeds in fams:
            leaves = np.concatenate([
                np.asarray(factory(96, seed=s).leaves, np.float32)
                for s in seeds])
            rep = evaluate_codec(codec, leaves)
            row = {"blocks": int(rep["num_blocks"]),
                   "psnr_mean": round(float(rep["psnr_mean"]), 2),
                   "psnr_p5": round(float(rep["psnr_p5"]), 2)}
            out[f"{name}/{fam}"] = row
            print(f"{name}/{fam}: {json.dumps(row)}", flush=True)
    (ROOT / "benchmarks" / "anchors_r5.json").write_text(
        json.dumps(out, indent=2))
    print("wrote benchmarks/anchors_r5.json")


if __name__ == "__main__":
    main()

"""Rate-distortion measurement of the v6 near-lossless residual tier.

Builds a 50k-leaf real-content smoke scene (unseen eval pool, seeds 1000+),
then measures every shipped fidelity tier end to end through real files:
lossy v3/v5 (flagship), residual-VQ S=2, v6 residual int8/f16 on both the
flagship and the RVQ base. Reports stored bytes/leaf, compression vs raw
leaves, pooled PSNR, per-voxel max error, and decompress wall time.

    python benchmarks/residual_tier.py            # TPU (bf16, shipped config)
    VQVDB_PLATFORM=cpu python benchmarks/...      # CPU (f32)

Writes benchmarks/residual_tier_r3.json.
"""

from __future__ import annotations

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


def scene(min_blocks: int = 50_000):
    from vqvdb_tpu.train.synthetic import smoke_grid
    from vqvdb_tpu.vdb.grid import LeafGrid

    chunks, total, seed = [], 0, 1000
    while total < min_blocks:
        g = smoke_grid(96, seed=seed)
        chunks.append(np.asarray(g.leaves, np.float32)[..., 0])
        total += g.num_leaves
        seed += 1
    leaves = np.concatenate(chunks)[:min_blocks]
    n = leaves.shape[0]
    side = int(np.ceil(n ** (1 / 3)))
    origins = (np.stack(np.unravel_index(np.arange(n), (side,) * 3), 1)
               * 8).astype(np.int32)
    return LeafGrid("density", origins, leaves)


def main() -> None:
    import jax

    from vqvdb_tpu import api
    from vqvdb_tpu.vdb.grid import psnr

    compute = "float32" if jax.default_backend() == "cpu" else "bfloat16"
    g = scene()
    x = g.leaves[..., 0]
    raw_bytes = g.num_leaves * 2048

    flagship = api.make_codec(str(ROOT / "models" / "scalar.vqmodel"),
                              batch_size=4096, compute_dtype=compute)
    rvq2 = api.make_codec(str(ROOT / "models" / "scalar_rvq2.vqmodel"),
                          batch_size=4096, compute_dtype=compute)

    variants = [
        ("lossy-v3", flagship, dict(format_version=3)),
        ("lossy-v5-zlib", flagship, dict(format_version=5)),
        ("rvq2-v5-zlib", rvq2, dict(format_version=5)),
        ("residual-int8", flagship, dict(residual="int8")),
        ("residual-int8-tol2e-3", flagship,
         dict(residual="int8", residual_tol=2e-3)),
        ("residual-int8-tol5e-4", flagship,
         dict(residual="int8", residual_tol=5e-4)),
        ("residual-f16", flagship, dict(residual="f16")),
        ("rvq2-residual-int8", rvq2, dict(residual="int8")),
        ("rvq2-residual-int8-tol5e-4", rvq2,
         dict(residual="int8", residual_tol=5e-4)),
    ]
    out = {"scene_leaves": g.num_leaves, "compute_dtype": compute,
           "psnr_metric": "pooled -10*log10(global MSE), peak 1.0",
           "rows": []}
    with tempfile.TemporaryDirectory() as td:
        for name, codec, kw in variants:
            p = Path(td) / f"{name}.vqvdb"
            codec.compress(g, p, **kw)
            t0 = time.perf_counter()
            (dec,), _ = codec.decompress(p)
            dt = time.perf_counter() - t0
            rec = dec.leaves[..., 0]
            err = np.abs(rec.astype(np.float64) - x.astype(np.float64))
            size = p.stat().st_size
            row = {
                "variant": name,
                "bytes_per_leaf": round(size / g.num_leaves, 1),
                "compression_vs_raw": round(raw_bytes / size, 1),
                "psnr_db": round(psnr(rec, x), 2),
                "max_abs_err": float(f"{err.max():.3e}"),
                "decompress_s": round(dt, 2),
            }
            out["rows"].append(row)
            print(json.dumps(row))

    dst = ROOT / "benchmarks" / "residual_tier_r3.json"
    dst.write_text(json.dumps(out, indent=2))
    print("wrote", dst)


if __name__ == "__main__":
    main()

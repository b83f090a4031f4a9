"""Quality-vs-bitrate frontier over codebook size K (scalar family).

The reference is hard-capped at K=256: its runtime hardcodes
numEmbeddings=256 (ref: src/orchestrator/VQVAECodec.cpp metadata block)
and the v3 container stores one *byte* per latent index
(ref: src/Utils/VQVDB_Reader.cpp chunk layout), so its 4096-code vec3
notebook config could never round-trip. Our v4 (u16 indices) + v5
(compressed payload) containers remove the cap — this sweep measures what
that buys: PSNR on the 50k-block unseen eval pool vs the *actual* stored
bits/leaf for K in {128, 256, 512, 1024}, same data, same recipe
(benchmarks/retrain_data15_r3.json), only K varied.

Bits/leaf is measured, not assumed: each model encodes the same unseen
scene to the smallest container it fits (v3 for K<=256, v4 above) and to
v5-zlib; bytes/leaf comes from the files. The entropy coder (v5) is what
makes K>256 interesting — raw v4 doubles the index bytes, but zlib over
the index stream pays only the real entropy (~log2(perplexity) bits).

Prereqs: /tmp/k_sweep/k{K}.vqmodel trained via `cli train` (see
ROUND3.md); K=256 row reuses the committed models/scalar.vqmodel.
Writes benchmarks/k_sweep_r3.json.

    python benchmarks/k_sweep.py            # TPU
    VQVDB_PLATFORM=cpu python benchmarks/k_sweep.py --min-blocks 2000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

_plat = os.environ.get("VQVDB_PLATFORM")
if _plat:
    import jax

    jax.config.update("jax_platforms", _plat)


def eval_leaves(kind: str, size: int, min_blocks: int) -> np.ndarray:
    """Unseen blocks, seeds 1000+ (same pool as gen_eval_r3.py)."""
    from vqvdb_tpu.train.synthetic import levelset_grid, smoke_grid

    factory = {"smoke": smoke_grid, "levelset": levelset_grid}[kind]
    chunks, total, seed = [], 0, 1000
    while total < min_blocks:
        g = factory(size, seed=seed)
        chunks.append(np.asarray(g.leaves, np.float32)[..., 0])
        total += g.num_leaves
        seed += 1
    return np.concatenate(chunks, axis=0)[:min_blocks]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-blocks", type=int, default=50_000)
    ap.add_argument("--batch-size", type=int, default=2048)
    ap.add_argument("--models-dir", default="/tmp/k_sweep")
    ap.add_argument("--ks", type=int, nargs="*", default=[128, 256, 512, 1024])
    ap.add_argument("--extra-models", nargs="*", default=[],
                    metavar="LABEL=PATH",
                    help="additional artifacts to add as frontier rows "
                         "(e.g. rvq2=/tmp/k_sweep/rvq2.vqmodel) — rows "
                         "record K and num_quantizers from the artifact")
    args = ap.parse_args()

    from vqvdb_tpu import api
    from vqvdb_tpu.vdb.grid import LeafGrid, psnr, split_mse

    pools = {k: eval_leaves(k, 96, args.min_blocks)
             for k in ("smoke", "levelset")}
    targets = []
    for K in args.ks:
        model = (ROOT / "models" / "scalar.vqmodel" if K == 256
                 else Path(args.models_dir) / f"k{K}.vqmodel")
        targets.append((f"k{K}", model, K))
    for spec in args.extra_models:
        label, _, p = spec.partition("=")
        targets.append((label, Path(p), None))

    rows = []
    for label, model, K in targets:
        if not model.exists():
            print(f"[skip] {label}: {model} missing", file=sys.stderr)
            continue
        codec = api.make_codec(str(model), batch_size=args.batch_size)
        if K is not None:
            assert codec.mcfg.num_embeddings == K, (K, codec.mcfg.num_embeddings)
        K = codec.mcfg.num_embeddings
        S = codec.mcfg.num_quantizers
        row = {"label": label, "K": K, "num_quantizers": S,
               "model": str(model)}
        # Quality per family on the unseen pool.
        for fam, leaves in pools.items():
            idx = codec.encode_leaves(leaves)
            rec = codec.decode_indices(idx)[..., 0]
            row[f"{fam}_psnr_db"] = round(psnr(rec, leaves), 3)
            z, nz = split_mse(rec, leaves)
            row[f"{fam}_zero_mse"] = float(f"{z:.3e}")
            # Index-stream statistics: empirical entropy bounds what any
            # payload codec can reach. For RVQ, entropy is summed over
            # stages (each stage is its own uint8 plane/distribution).
            stages = idx.reshape(-1, S) if S > 1 else idx.reshape(-1, 1)
            ent, used = 0.0, 0
            for s in range(stages.shape[1]):
                counts = np.bincount(stages[:, s].astype(np.int64),
                                     minlength=K).astype(np.float64)
                p = counts[counts > 0] / counts.sum()
                ent += float(-(p * np.log2(p)).sum())
                used += int((counts > 0).sum())
            row[f"{fam}_index_entropy_bits"] = round(ent, 3)
            row[f"{fam}_codes_used"] = used
        # Measured bits/leaf on the smoke pool (64 indices + 12 B origin).
        n = pools["smoke"].shape[0]
        side = int(np.ceil(n ** (1 / 3)))
        origins = (np.stack(np.unravel_index(np.arange(n), (side,) * 3), 1)
                   * 8).astype(np.int32)
        grid = LeafGrid("density", origins, pools["smoke"])
        with tempfile.TemporaryDirectory() as td:
            raw = Path(td) / "raw.vqvdb"
            api.encode(grid, codec, raw)  # v3 (K<=256) or v4 (K>256)
            v5 = Path(td) / "v5.vqvdb"
            api.encode(grid, codec, v5, format_version=5)
            row["raw_container"] = "v3" if K <= 256 else "v4"
            row["raw_bytes_per_leaf"] = round(raw.stat().st_size / n, 2)
            row["v5_bytes_per_leaf"] = round(v5.stat().st_size / n, 2)
            row["v5_ratio_vs_leaf"] = round(2048 / row["v5_bytes_per_leaf"], 1)
        rows.append(row)
        print(json.dumps(row))

    out = {"min_blocks": args.min_blocks,
           "recipe": "retrain_data15_r3 (200 epochs, b2048, full data), "
                     "only K varied",
           "psnr_metric": "pooled: -10*log10(MSE over all voxels). The "
                          "eval reports' psnr_mean is the mean of "
                          "per-block PSNRs and reads several dB higher "
                          "on heavy-tailed families (levelset).",
           "rows": rows}
    dst = ROOT / "benchmarks" / "k_sweep_r3.json"
    dst.write_text(json.dumps(out, indent=2))
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()

"""Premise check for a v5 entropy codec (codec id 3): what rate can a
static-table coder actually reach on real VQ index streams?

Motivation: v5-zlib reaches 1.65x size vs v3 but inflates at ~85 MB/s —
far below one chip's 2M leaves/s consumption; v5-lzma reaches 1.97x at an
unusable 14 MB/s (benchmarks/v5_codec_r3.json). An rANS coder with a
static per-frame model would decode at hundreds of MB/s; the question this
script answers is whether any *cheap* context model reaches lzma-class
rates, before we build the codec. House rule: measure the premise first
(compare temporal_premise.py, which killed a container idea this way).

Models measured, all as achievable bits/leaf for the 64-symbol index block
of each leaf, INCLUDING per-frame table overhead (frames = 2048 leaves,
matching the codec's batch framing; tables are zlib-compressed quantized
histograms, the exact thing the codec would ship):

  h0-global    one order-0 table for all positions
  h0-pos       one order-0 table per latent position (64 tables)
  h1-raster    context = previous symbol in raster order within the leaf
  h1-spatial   context = same position, previous leaf in file order
  h1-pos+prev  context = (position, previous leaf's symbol at the same
               position)  [table: 64*256 contexts — measures the ceiling,
               table cost will likely sink it]

Baselines on the identical frame payloads: zlib-9, lzma-6; plus both over
a position-major transposed frame layout (zlib-T / lzma-T) — a zero-cost
reordering the v5 codec could adopt if LZ matches lengthen.

Usage:  VQVDB_PLATFORM=cpu python benchmarks/entropy_premise.py
Writes: benchmarks/entropy_premise_r3.json
"""

from __future__ import annotations

import json
import lzma
import os
import sys
import zlib
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

_plat = os.environ.get("VQVDB_PLATFORM")
if _plat:
    import jax

    jax.config.update("jax_platforms", _plat)

FRAME = 2048  # leaves per frame (codec framing)


def quantized_table_bytes(counts: np.ndarray) -> int:
    """Size of the zlib-compressed quantized frequency table the codec
    would ship: counts quantized to a 4096 total per context, u16."""
    counts = counts.astype(np.float64)
    totals = counts.sum(axis=-1, keepdims=True)
    totals[totals == 0] = 1
    q = np.round(counts / totals * 4096).astype(np.uint16)
    return len(zlib.compress(q.tobytes(), 9))


def empirical_bits(symbols: np.ndarray, contexts: np.ndarray,
                   n_ctx: int) -> tuple[float, int]:
    """Static-model cost: build per-context histograms over this frame,
    return (total bits to code all symbols under the quantized model,
    table bytes). Uses the *quantized* distribution — what the codec
    actually ships — with a +1 floor so no symbol has probability 0."""
    counts = np.zeros((n_ctx, 256), np.int64)
    np.add.at(counts, (contexts.ravel(), symbols.ravel()), 1)
    # Quantize exactly as the codec would.
    tot = counts.sum(axis=1, keepdims=True).astype(np.float64)
    tot[tot == 0] = 1
    q = np.maximum(np.round(counts / tot * 4096), (counts > 0)).astype(
        np.int64)
    qt = q.sum(axis=1, keepdims=True).astype(np.float64)
    qt[qt == 0] = 1
    p = q / qt
    bits = -(counts * np.log2(np.where(p > 0, p, 1))).sum()
    return float(bits), quantized_table_bytes(counts)


def main() -> None:
    from vqvdb_tpu import api
    from vqvdb_tpu.train.synthetic import smoke_grid, levelset_grid

    # Real content: smoke + level-set grids, unseen seeds. Cache the
    # encoded indices so model iterations skip the 4-min CPU encode.
    cache = Path("/tmp/entropy_premise_idx.npy")
    if cache.exists():
        idx = np.load(cache)
        grids = []
    else:
        grids = [smoke_grid(96, seed=2200 + s) for s in range(4)]
        grids += [levelset_grid(96, seed=2300 + s) for s in range(2)]
        codec = api.make_codec(str(ROOT / "models" / "scalar.vqmodel"))
        all_idx = []
        for g in grids:
            idx = codec.encode_leaves(g.leaves)  # [N, 4,4,4] uint8
            all_idx.append(np.asarray(idx).reshape(idx.shape[0], -1))
        idx = np.concatenate(all_idx)  # [N, 64]
        np.save(cache, idx)
    n = idx.shape[0]
    print(f"{n} leaves from {len(grids)} grids")

    report: dict = {"leaves": int(n), "frame": FRAME, "models": {}}
    raw_bits_total = n * 64 * 8

    # Accumulate per-frame costs (bits incl. table) per model.
    tot = {k: 0.0 for k in
           ["h0-global", "h0-pos", "h1-raster", "h1-spatial", "h1-pos+prev",
            "zlib", "lzma", "zlib-T", "lzma-T"]}
    pos = np.broadcast_to(np.arange(64), (FRAME, 64))
    for f0 in range(0, n - FRAME + 1, FRAME):
        fr = idx[f0:f0 + FRAME]  # [F, 64]
        payload = fr.tobytes()
        tot["zlib"] += len(zlib.compress(payload, 9)) * 8
        tot["lzma"] += len(lzma.compress(payload, preset=6)) * 8
        payload_t = np.ascontiguousarray(fr.T).tobytes()
        tot["zlib-T"] += len(zlib.compress(payload_t, 9)) * 8
        tot["lzma-T"] += len(lzma.compress(payload_t, preset=6)) * 8

        b, t = empirical_bits(fr, np.zeros_like(fr, dtype=np.int64), 1)
        tot["h0-global"] += b + t * 8
        b, t = empirical_bits(fr, pos[: fr.shape[0]], 64)
        tot["h0-pos"] += b + t * 8
        prev_raster = np.concatenate(
            [np.zeros((fr.shape[0], 1), np.int64), fr[:, :-1]], axis=1)
        b, t = empirical_bits(fr, prev_raster, 256)
        tot["h1-raster"] += b + t * 8
        prev_leaf = np.concatenate(
            [np.zeros((1, 64), np.int64), fr[:-1]], axis=0)
        b, t = empirical_bits(fr, prev_leaf, 256)
        tot["h1-spatial"] += b + t * 8
        ctx = pos[: fr.shape[0]] * 256 + prev_leaf
        b, t = empirical_bits(fr, ctx, 64 * 256)
        tot["h1-pos+prev"] += b + t * 8

    nf = (n // FRAME) * FRAME
    for k, bits in tot.items():
        report["models"][k] = {
            "bits_per_leaf": round(bits / (nf / FRAME) / FRAME, 2),
            "bytes_per_leaf": round(bits / 8 / nf, 2),
            "vs_raw_64B": round(raw_bits_total * (nf / n) / bits, 3),
        }
        print(f"{k:14s} {report['models'][k]}")

    out = ROOT / "benchmarks" / "entropy_premise_r3.json"
    out.write_text(json.dumps(report, indent=1))
    print("wrote", out)


if __name__ == "__main__":
    main()

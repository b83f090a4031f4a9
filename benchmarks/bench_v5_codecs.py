"""v5 payload-codec bench: file size and host read throughput per codec.

Motivation: the DP cost model (docs/DP_SCALING.md) showed the file-level
decode pipeline is host-bound; for v5 files the dominant host cost beyond
the memcpy floor is frame decompression. zlib inflate caps at a few
hundred MB/s, well below what one chip consumes at 2M leaves/s — the lz4
codec (native C++, vq_lz4_decompress) exists to lift that ceiling.

Encodes a real scene with the committed scalar model, writes v3 and every
v5 codec, then times full-file reads (VqvdbReader.next_batch loop — the
exact path the file codec uses). Writes benchmarks/v5_codec_r3.json.

    VQVDB_PLATFORM=cpu python benchmarks/bench_v5_codecs.py
"""

from __future__ import annotations

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


def read_all(path: Path, batch: int = 4096) -> tuple[int, float]:
    from vqvdb_tpu.format.vqvdb import VqvdbReader

    t0 = time.perf_counter()
    leaves = 0
    with VqvdbReader(path) as r:
        while r.has_next_grid():
            r.next_grid_metadata()
            while r.has_next():
                idx, org = r.next_batch(batch)
                leaves += idx.shape[0]
    return leaves, time.perf_counter() - t0


def main() -> None:
    import tempfile

    from vqvdb_tpu import api
    from vqvdb_tpu.train.synthetic import smoke_grid
    from vqvdb_tpu.vdb.grid import LeafGrid

    # A scene big enough that read time is well above timer noise:
    # ~50k leaves of real smoke content (reads are then multi-MB).
    data_dir = ROOT / "data_scalar_r2"
    if data_dir.exists():
        chunks = []
        for p in sorted(data_dir.glob("vol_*.npy")):
            chunks.append(np.load(p).astype(np.float32))
            if sum(c.shape[0] for c in chunks) >= 50_000:
                break
        leaves = np.concatenate(chunks)[:50_000]
        n = leaves.shape[0]
        side = int(np.ceil(n ** (1 / 3)))
        origins = (np.stack(np.unravel_index(np.arange(n), (side,) * 3), 1)
                   * 8).astype(np.int32)
        grids = [LeafGrid("density", origins, leaves)]
    else:
        grids = [smoke_grid(96, seed=900 + s) for s in range(2)]
        for i, g in enumerate(grids):
            g.name = f"density_{i}"
    total = sum(g.num_leaves for g in grids)
    codec = api.make_codec(str(ROOT / "models" / "scalar.vqmodel"))

    out = {"total_leaves": total, "variants": []}
    with tempfile.TemporaryDirectory() as td:
        variants = [("v3", 3, "zlib"), ("v5-zlib", 5, "zlib"),
                    ("v5-lzma", 5, "lzma"), ("v5-lz4", 5, "lz4")]
        for name, ver, comp in variants:
            p = Path(td) / f"{name}.vqvdb"
            api.encode(grids, codec, p, format_version=ver, compression=comp)
            # Warm the page cache, then take the median of 5 reads.
            read_all(p)
            times = []
            for _ in range(5):
                leaves, dt = read_all(p)
                assert leaves == total
                times.append(dt)
            dt = float(np.median(times))
            size = p.stat().st_size
            out["variants"].append({
                "variant": name,
                "bytes": size,
                "read_s": round(dt, 4),
                "read_mleaves_per_s": round(total / dt / 1e6, 3),
                "read_MBps": round(size / dt / 1e6, 1),
            })
            print(out["variants"][-1])

    base = next(v for v in out["variants"] if v["variant"] == "v3")
    for v in out["variants"]:
        v["size_vs_v3"] = round(base["bytes"] / v["bytes"], 3)
        v["read_vs_v3"] = round(v["read_mleaves_per_s"]
                                / base["read_mleaves_per_s"], 3)
    from vqvdb_tpu.runtime import native_io

    out["lz4_backend"] = ("native" if native_io._lib_v2() is not None
                          else "python")
    dst = ROOT / "benchmarks" / "v5_codec_r3.json"
    dst.write_text(json.dumps(out, indent=2))
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()

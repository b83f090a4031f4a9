"""Premise check for temporal (inter-frame) index coding — NEGATIVE result.

Question: for animated sequences (`encode-seq` writes independent per-frame
files), would a delta-coded sequence container shrink files further?

Method: an animated smoke sequence with genuine temporal coherence — puff
centers move on smooth trajectories and the detail noise is a window
sliding through one larger static fBm field, so adjacent frames differ by
~1.5 voxels of drift. Encode each frame with the committed scalar model,
then measure frame-to-frame index coherence and the compressed size of a
subtraction-delta stream vs the raw index stream.

Result (benchmarks/temporal_premise_r3.json, 96^3, ~335 leaves/frame):
leaf-origin overlap is ~99% (the *occupancy* is coherent) but VQ indices
are chaotic under small content changes — ~35% of latent positions keep
their code, ~0.3% of whole 64-index blocks are identical, and zlib over
the delta stream is WORSE than zlib over the raw stream (the delta
destroys the code-cooccurrence structure zlib exploits). Conclusion:
temporal index-delta coding does not pay without a learned conditional
entropy model; per-frame v5 files stay the sequence representation.
(The reference has no sequence story at all — its SOP is cooked per
frame, ref: src/SOP/SOP_VQVDB_Encoder.cpp.)

    VQVDB_PLATFORM=cpu python benchmarks/temporal_premise.py
"""

from __future__ import annotations

import json
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


def smoke_sequence(size=96, seed=0, frames=4, drift=1.5):
    """Temporally coherent smoke: moving puffs + sliding noise window."""
    from vqvdb_tpu.train.synthetic import fbm_noise

    rng = np.random.default_rng(seed)
    pad = int(np.ceil(drift * frames)) + 2
    big = fbm_noise((size + pad,) * 3, rng, octaves=3, base_cell=size // 4)
    n_puffs = 3
    c0 = rng.random((n_puffs, 3)) * size
    vel = (rng.random((n_puffs, 3)) - 0.5) * 2 * drift
    rad = size * (0.15 + 0.2 * rng.random(n_puffs))
    coords = np.mgrid[0:size, 0:size, 0:size].astype(np.float32)
    for t in range(frames):
        off = int(round(drift * t))
        noise = big[off:off + size, off:off + size, off:off + size]
        density = np.zeros((size,) * 3, np.float32)
        for p in range(n_puffs):
            c = c0[p] + vel[p] * t
            r = np.sqrt(((coords - c[:, None, None, None]) ** 2).sum(0))
            density = np.maximum(density, np.clip(1.0 - r / rad[p], 0, 1))
        d = np.clip(density * (0.4 + 0.9 * noise), 0, 1)
        d[d < 0.02] = 0.0
        yield d


def main() -> None:
    from vqvdb_tpu import api
    from vqvdb_tpu.vdb.grid import LeafGrid

    codec = api.make_codec(str(ROOT / "models" / "scalar.vqmodel"),
                           batch_size=2048)
    enc = []
    for t, d in enumerate(smoke_sequence()):
        g = LeafGrid.from_dense("density", d)
        enc.append((g.origins, codec.encode_leaves(g.leaves)))
        print(f"frame {t}: {g.num_leaves} leaves", file=sys.stderr)

    rows = []
    for t in range(1, len(enc)):
        o0, i0 = enc[t - 1]
        o1, i1 = enc[t]
        prev = {tuple(o): k for k, o in enumerate(o0)}
        pairs = [(prev[tuple(o)], k) for k, o in enumerate(o1)
                 if tuple(o) in prev]
        a = np.array([p[0] for p in pairs])
        b = np.array([p[1] for p in pairs])
        delta = i1.copy()
        delta[b] = (i1[b].astype(np.int16)
                    - i0[a].astype(np.int16)).astype(np.uint8)
        rows.append({
            "t": t,
            "origin_overlap": round(len(pairs) / len(o1), 4),
            "same_block": round(float(
                (i0[a] == i1[b]).all(axis=(1, 2, 3)).mean()), 4),
            "same_position": round(float((i0[a] == i1[b]).mean()), 4),
            "zlib_raw_bytes_per_leaf": round(
                len(zlib.compress(i1.tobytes(), 6)) / len(o1), 2),
            "zlib_delta_bytes_per_leaf": round(
                len(zlib.compress(delta.tobytes(), 6)) / len(o1), 2),
        })
        print(json.dumps(rows[-1]))

    out = {
        "verdict": "negative: VQ indices are temporally chaotic; "
                   "delta coding compresses worse than raw",
        "setup": "96^3 animated smoke, drift 1.5 voxels/frame, "
                 "committed scalar model",
        "rows": rows,
    }
    dst = ROOT / "benchmarks" / "temporal_premise_r3.json"
    dst.write_text(json.dumps(out, indent=2))
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()

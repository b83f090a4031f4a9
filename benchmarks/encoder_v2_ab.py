"""A/B: reference encoder vs the packed (TPU-co-designed) encoder arch.

Throughput is weight-independent, so untrained params measure the
architecture decision before any training is spent (the round-4 sequencing:
validate the >=2x encode claim on the chip first, then train the winner
with the flagship recipe and gate it on the 50k-block eval).

Protocol: bench.py's fenced in-graph loop (scalar-readback fence, median of
(hi-lo) step deltas so relay transport jitter cancels), fresh-salted
compilations interleaved A/B/A/B so compile-lottery variance shows up in
the recorded runs instead of hiding in a single number.

    python benchmarks/encoder_v2_ab.py [--variants scalar vec3] [--reps 2]

Writes benchmarks/encoder_v2_ab_r4.json.
"""

from __future__ import annotations

import argparse
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

# Analytic dense FLOPs per leaf (2 FLOPs per MAC) of the optimized encode
# graphs, for MFU lines (see bench.py for the reference-arch breakdown):
#   packed scalar: stem k3 8->64 (1.77M) + RB64 (28.3M) + attn (~0.03M)
#                  + fused proj.score GEMM 64x256 (2.1M)      ~= 32.2 MFLOP
#   packed vec3:   stem k3 24->128 (10.6M) + RB128 (113.2M) + attn (~0.1M)
#                  + proj 128->128 (2.1M) + score 128x256 (4.2M) ~= 130 MFLOP
#   reference vec3: pre 3->64 (5.3M) + RB64@8^3 (226.5M) + packed-down k3s2
#                  64->128 (28.3M) + 2x RB128 (226.5M) + proj+score (6.3M)
#                                                              ~= 493 MFLOP
ENCODE_MFLOP = {
    ("scalar", "reference"): 30.0,
    ("scalar", "packed"): 32.2,
    ("vec3", "reference"): 493.0,
    ("vec3", "packed"): 130.0,
}
V5E_BF16_PEAK = 197e12


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="*", default=["scalar", "vec3"])
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--batch", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _fenced_rate
    from vqvdb_tpu.core.config import CodecConfig, ModelConfig
    from vqvdb_tpu.models import init_vqvae_params
    from vqvdb_tpu.runtime.codec import VQCodec

    on_tpu = jax.default_backend() == "tpu"
    bs = args.batch if on_tpu else 256
    steps = 256 if on_tpu else 4
    compute = "bfloat16" if on_tpu else "float32"
    rng = np.random.default_rng(0)

    def perturb(x):
        return jnp.abs(x * jnp.float32(0.999) + jnp.float32(1e-4))

    def consume(out):
        return jnp.sum(out.astype(jnp.float32))

    rows = []
    for variant in args.variants:
        cin = 1 if variant == "scalar" else 3
        leaves = jnp.asarray(rng.random((bs, 8, 8, 8, cin), np.float32))
        codecs = {}
        for arch in ("reference", "packed"):
            mcfg = ModelConfig(in_channels=cin, encoder_arch=arch)
            params = init_vqvae_params(jax.random.key(0), mcfg)
            codecs[arch] = (VQCodec(params, mcfg,
                                    CodecConfig(batch_size=bs,
                                                compute_dtype=compute)),
                            params)
        runs = {a: [] for a in codecs}
        for rep in range(args.reps):  # interleaved A/B/A/B, fresh salts
            for arch, (codec, params) in codecs.items():
                rate = _fenced_rate(codec._encode_step, params, leaves,
                                    steps, perturb, consume, salt=rep + 1)
                runs[arch].append(round(rate, 1))
                print(f"[{variant}/{arch}] rep {rep}: {rate:,.0f} leaves/s")
        row = {"variant": variant, "batch": bs, "compute": compute}
        for arch in codecs:
            med = float(np.median(runs[arch]))
            row[f"{arch}_leaves_per_sec"] = med
            row[f"{arch}_runs"] = runs[arch]
            if on_tpu:
                row[f"{arch}_mfu"] = round(
                    med * ENCODE_MFLOP[(variant, arch)] * 1e6 / V5E_BF16_PEAK,
                    3)
        row["speedup"] = round(row["packed_leaves_per_sec"]
                               / row["reference_leaves_per_sec"], 2)
        rows.append(row)
        print(json.dumps(row))

    out = {"protocol": "fenced in-graph loop, interleaved salted compiles, "
                       "median of reps; untrained weights (throughput is "
                       "weight-independent)",
           "rows": rows}
    (ROOT / "benchmarks" / "encoder_v2_ab_r4.json").write_text(
        json.dumps(out, indent=2))
    print("wrote benchmarks/encoder_v2_ab_r4.json")


if __name__ == "__main__":
    main()

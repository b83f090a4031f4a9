"""Reproduce every BASELINE.md measurement in one run.

Usage:  python benchmarks/measure_all.py [out.json]

Runs the fence-robust in-graph timing harness over the decode/encode
configurations documented in BASELINE.md and writes a JSON dict of
leaves/sec rows. Expects a TPU backend for meaningful numbers (runs
anywhere for smoke-testing).
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _rate(loop, args, batch, lo, hi, reps=5):
    float(loop(*args, 2))
    deltas = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(loop(*args, lo)); tlo = time.perf_counter() - t0
        t0 = time.perf_counter(); float(loop(*args, hi)); thi = time.perf_counter() - t0
        deltas.append((thi - tlo) / (hi - lo))
    deltas.sort()
    per = deltas[len(deltas) // 2]
    return batch / max(per, 1e-9)


def main(out_path=None):
    import jax
    import jax.numpy as jnp

    from vqvdb_tpu.core.config import CodecConfig, ModelConfig
    from vqvdb_tpu.models import init_vqvae_params
    from vqvdb_tpu.runtime.codec import VQCodec

    mcfg = ModelConfig()
    params = init_vqvae_params(jax.random.key(0), mcfg)
    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() == "tpu"
    scale = 1 if on_tpu else 1 / 64  # shrink step counts off-TPU

    results = {"backend": jax.default_backend()}

    def decode_loop(codec):
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(p, idx0, n):
            def body(i, carry):
                idx, acc = carry
                rec = codec._decode_step(p, idx)
                nxt = ((idx.astype(jnp.int32) + 1) % 256).astype(idx.dtype)
                return nxt, acc + jnp.sum(rec)
            _, acc = jax.lax.fori_loop(0, n, body, (idx0, jnp.float32(0)))
            return acc
        return loop

    def encode_loop(codec):
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(p, x0, n):
            def body(i, carry):
                x, acc = carry
                idx = codec._encode_step(p, x)
                return x + 0.001, acc + jnp.sum(idx.astype(jnp.int32))
            _, acc = jax.lax.fori_loop(0, n, body, (x0, jnp.int32(0)))
            return acc
        return loop

    def run_decode(name, batch, lo, hi, **cc):
        codec = VQCodec(params, mcfg, CodecConfig(batch_size=batch, **cc))
        idx = jnp.asarray(rng.integers(0, 256, (batch, 4, 4, 4)).astype(np.uint8))
        results[name] = round(_rate(decode_loop(codec), (params, idx), batch,
                                    max(int(lo * scale), 2), max(int(hi * scale), 4)), 1)
        print(f"{name}: {results[name]:,.0f} leaves/s", file=sys.stderr)

    def run_encode(name, batch, lo, hi, **cc):
        codec = VQCodec(params, mcfg, CodecConfig(batch_size=batch, **cc))
        x = jnp.asarray(rng.random((batch, 8, 8, 8, 1), np.float32))
        results[name] = round(_rate(encode_loop(codec), (params, x), batch,
                                    max(int(lo * scale), 2), max(int(hi * scale), 4)), 1)
        print(f"{name}: {results[name]:,.0f} leaves/s", file=sys.stderr)

    run_decode("decode_optimized_b2048", 2048, 256, 1024,
               compute_dtype="bfloat16")
    run_decode("decode_reference_shaped_b64", 64, 4096, 16384,
               compute_dtype="float32", use_pallas=False,
               fuse_decoder_tail=False, fuse_final_conv=False,
               fuse_proj_quantize=False, pack_down_conv=False)
    run_encode("encode_optimized_b2048", 2048, 128, 512,
               compute_dtype="bfloat16")
    run_encode("encode_reference_shaped_b64", 64, 4096, 16384,
               compute_dtype="float32", use_pallas=False,
               fuse_decoder_tail=False, fuse_final_conv=False,
               fuse_proj_quantize=False, pack_down_conv=False)

    results["decode_vs_baseline"] = round(
        results["decode_optimized_b2048"] / results["decode_reference_shaped_b64"], 2)
    results["encode_vs_baseline"] = round(
        results["encode_optimized_b2048"] / results["encode_reference_shaped_b64"], 2)

    out = json.dumps(results, indent=2)
    print(out)
    if out_path:
        with open(out_path, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)

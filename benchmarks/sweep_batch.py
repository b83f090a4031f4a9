"""Batch-size sweep for the optimized decode/encode steps.

Usage: python benchmarks/sweep_batch.py [out.json] [--vec3]

Round-1 picked b4096 decode / b8192 encode from a narrow scan; this sweeps
one octave around those with the fenced in-graph harness to confirm the
operating points (or move them). --vec3 sweeps the vec3 variant instead
(smaller batches — it is ~4-9x heavier per leaf).
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(out_path=None, vec3=False):
    import jax
    import jax.numpy as jnp

    from vqvdb_tpu.core.config import CodecConfig, ModelConfig
    from vqvdb_tpu.models import init_vqvae_params
    from vqvdb_tpu.runtime.codec import VQCodec

    mcfg = ModelConfig(in_channels=3, embedding_dim=64) if vec3 \
        else ModelConfig()
    params = init_vqvae_params(jax.random.key(0), mcfg)
    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() == "tpu"

    def rate(step, batch, perturb, consume, steps):
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(p, x0, n):
            def body(_, carry):
                x, acc = carry
                out = step(p, x)
                return perturb(x), acc + consume(out)
            _, acc = jax.lax.fori_loop(0, n, body, (x0, jnp.float32(0)))
            return acc

        float(loop(params, batch, 2))
        lo, hi = max(steps // 4, 1), steps
        deltas = []
        for _ in range(3):
            t0 = time.perf_counter(); float(loop(params, batch, lo)); tl = time.perf_counter() - t0
            t0 = time.perf_counter(); float(loop(params, batch, hi)); th = time.perf_counter() - t0
            deltas.append((th - tl) / (hi - lo))
        deltas.sort()
        return batch.shape[0] / max(deltas[len(deltas) // 2], 1e-9)

    def pidx(x):
        return ((x.astype(jnp.int32) + 1) % 256).astype(x.dtype)

    def pleaf(x):
        return jnp.abs(x * jnp.float32(0.999) + jnp.float32(1e-4))

    def cf(out):
        o = out.astype(jnp.float32)
        return jnp.sum(o * o)

    results = {"backend": jax.default_backend(),
               "variant": mcfg.variant}
    if vec3:
        dec_batches = enc_batches = (512, 1024, 2048, 4096) if on_tpu \
            else (64, 128)
        work = 256 * 1024
    else:
        dec_batches = (2048, 4096, 8192, 16384) if on_tpu else (128, 256)
        enc_batches = (2048, 4096, 8192, 16384) if on_tpu else (128, 256)
        work = 1024 * 1024
    for b in dec_batches:
        codec = VQCodec(params, mcfg, CodecConfig(batch_size=b,
                                                  compute_dtype="bfloat16"))
        idx = jnp.asarray(rng.integers(0, mcfg.num_embeddings,
                                       (b, 4, 4, 4)).astype(np.uint8))
        steps = max(2 * work // b, 8) if on_tpu else 6
        r = rate(codec._decode_step, idx, pidx, cf, steps)
        results[f"decode_b{b}"] = round(r, 1)
        print(f"decode b{b}: {r:,.0f} leaves/s", file=sys.stderr)
    for b in enc_batches:
        codec = VQCodec(params, mcfg, CodecConfig(batch_size=b,
                                                  compute_dtype="bfloat16"))
        x = jnp.asarray(rng.random((b, 8, 8, 8, mcfg.in_channels),
                                   np.float32))
        steps = max(work // b, 8) if on_tpu else 6
        r = rate(codec._encode_step, x, pleaf, cf, steps)
        results[f"encode_b{b}"] = round(r, 1)
        print(f"encode b{b}: {r:,.0f} leaves/s", file=sys.stderr)
    out = json.dumps(results, indent=2)
    print(out)
    if out_path:
        Path(out_path).write_text(out + "\n")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--vec3"]
    main(args[0] if args else None, vec3="--vec3" in sys.argv)

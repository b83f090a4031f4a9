"""A/B the fused RB16 Pallas kernel inside the FULL encode graph.

The round-2 encode roofline (docs/ENCODE_ROOFLINE.md) put RB16 at 1.95 ms
vs a 1.6 ms HBM floor at b8192 and left the gn->relu->conv partial-fusion
candidate un-measured; ops/fused_rb.py is that candidate (whole block in
one kernel, banded block-Toeplitz matmuls on a fused 128-lane layout).
Per the house rule (isolated wins invert in-graph — split-K and the Pallas
quantizer both did), this measures BOTH the isolated block and the full
_encode_step, interleaved, with fresh salted compiles.

Usage: python benchmarks/ab_rb16.py [out.json]
"""

from __future__ import annotations

import functools
import json
import statistics
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _rate(step, params, batch, lo, hi, perturb, consume, salt):
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n", "s"))
    def loop(p, x0, n, s):
        def body(_, carry):
            x, acc = carry
            out = step(p, x)
            return perturb(x), acc + consume(out)
        _, acc = jax.lax.fori_loop(0, n, body, (x0, jnp.float32(s)))
        return acc

    float(loop(params, batch, 2, salt))
    deltas = []
    for _ in range(3):
        t0 = time.perf_counter(); float(loop(params, batch, lo, salt)); tl = time.perf_counter() - t0
        t0 = time.perf_counter(); float(loop(params, batch, hi, salt)); th = time.perf_counter() - t0
        deltas.append((th - tl) / (hi - lo))
    deltas.sort()
    return batch.shape[0] / max(deltas[len(deltas) // 2], 1e-9)


def main(out_path=None):
    import jax
    import jax.numpy as jnp

    from vqvdb_tpu.core.config import CodecConfig, ModelConfig
    from vqvdb_tpu.models import blocks, init_vqvae_params
    from vqvdb_tpu.ops.fused_rb import residual_block_fused
    from vqvdb_tpu.runtime.codec import VQCodec

    mcfg = ModelConfig()
    params = init_vqvae_params(jax.random.key(0), mcfg)
    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() == "tpu"
    eb = 2048 if on_tpu else 128  # the shipped encode operating point
    lo, hi = (64, 256) if on_tpu else (2, 5)
    reps = 2 if on_tpu else 1

    leaves = jnp.asarray(rng.random((eb, 8, 8, 8, 1), np.float32))
    x16 = jnp.asarray(rng.standard_normal((eb, 8, 8, 8, 16))
                      ).astype(jnp.bfloat16)
    rb_params = jax.tree.map(lambda a: a, params.encoder["pre_rb"])

    def pleaf(x):
        return jnp.abs(x * jnp.float32(0.999) + jnp.float32(1e-4))

    def cf(out):
        o = out.astype(jnp.float32)
        return jnp.sum(o * o)

    results = {"backend": jax.default_backend(), "batch": eb}

    # Numerics gate first: fused must match XLA on the real dtype.
    want = np.asarray(blocks.residual_block(rb_params, x16), np.float32)
    got = np.asarray(residual_block_fused(rb_params, x16), np.float32)
    results["max_abs_err_bf16"] = float(np.abs(got - want).max())

    # Isolated RB16: XLA vs fused kernel.
    def xla_rb(p, x):
        return blocks.residual_block(p, x)

    def fused_rb(p, x):
        return residual_block_fused(p, x)

    iso = {}
    for name, fn in (("xla", xla_rb), ("fused", fused_rb)):
        iso[name] = [
            _rate(fn, rb_params, x16, lo, hi,
                  lambda x: x * jnp.bfloat16(0.999), cf, salt=r)
            for r in range(reps)]
        results[f"rb16_isolated_{name}"] = [round(v, 1) for v in iso[name]]
        print(f"isolated {name}: {iso[name]}", file=sys.stderr)
    results["rb16_isolated_speedup"] = round(
        statistics.median(iso["fused"]) / statistics.median(iso["xla"]), 3)

    # Full encode graph, interleaved.
    full = {}
    for flag in (False, True):
        cc = CodecConfig(batch_size=eb, compute_dtype="bfloat16",
                         fuse_rb16=flag)
        enc = VQCodec(params, mcfg, cc)
        full[flag] = [
            _rate(enc._encode_step, params, leaves, lo, hi, pleaf, cf,
                  salt=200 + int(flag) * 10 + r) for r in range(reps)]
        results[f"encode_fused_{flag}"] = [round(v, 1) for v in full[flag]]
        print(f"encode fuse_rb16={flag}: {full[flag]}", file=sys.stderr)
    results["encode_speedup"] = round(
        statistics.median(full[True]) / statistics.median(full[False]), 3)

    out = json.dumps(results, indent=2)
    print(out)
    if out_path:
        Path(out_path).write_text(out + "\n")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)

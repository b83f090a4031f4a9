"""Benchmark: decoded leaves (8^3 blocks)/sec per chip — the north-star metric.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "leaves/s", "vs_baseline": N}

Methodology
-----------
Throughput is measured with the batch loop *inside* jit (lax.fori_loop whose
carry perturbs the input each iteration and accumulates a scalar from every
output), and the clock stopped on a scalar readback. This is robust against
async-dispatch illusions — on some transports block_until_ready returns
before execution finishes, which makes naive host loops report impossible
numbers.

The reference publishes no absolute throughput (BASELINE.md), so the
baseline row is measured here on the same chip: the reference's execution
shape — batch 64 (the SOP parm default, ref: src/SOP/SOP_VQVDB_Encoder.cpp),
f32 math, no fused quantizer kernels, batches strictly sequential (the
reference hot loop is fully synchronous, ref: src/orchestrator/
VQVAECodec.cpp:108-127). `vs_baseline` = optimized / baseline.
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np


def _fenced_rate(decode_step, params, batch, steps: int, num_embeddings: int):
    """leaves/sec with the loop in-graph and a scalar-readback fence."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(params, idx0, n):
        def body(i, carry):
            idx, acc = carry
            rec = decode_step(params, idx)
            # Perturb input each iteration (prevents loop-invariant hoisting)
            # and consume EVERY output element (a full-batch reduction —
            # consuming a single element lets XLA slice-propagate the whole
            # decode down to batch size 1).
            nxt = ((idx.astype(jnp.int32) + 1) % num_embeddings).astype(idx.dtype)
            return nxt, acc + jnp.sum(rec)
        _, acc = jax.lax.fori_loop(0, n, body, (idx0, jnp.float32(0)))
        return acc

    float(loop(params, batch, 2))  # compile + warm
    b = batch.shape[0]
    lo, hi = max(steps // 4, 1), steps

    def timed(n):
        t0 = time.perf_counter()
        float(loop(params, batch, n))  # readback fences completion
        return time.perf_counter() - t0

    # The fixed per-call cost (dispatch/transport) can exceed the device
    # time; estimate the marginal per-step cost from the median of several
    # (hi - lo) deltas so transport jitter cancels.
    deltas = []
    for _ in range(3):
        t_lo = timed(lo)
        t_hi = timed(hi)
        deltas.append((t_hi - t_lo) / (hi - lo))
    deltas.sort()
    marginal = deltas[len(deltas) // 2]
    return b / max(marginal, 1e-9)


def main() -> None:
    import jax

    from vqvdb_tpu.core.config import CodecConfig, ModelConfig
    from vqvdb_tpu.models import init_vqvae_params
    from vqvdb_tpu.runtime.codec import VQCodec

    on_tpu = jax.default_backend() == "tpu"
    mcfg = ModelConfig()
    params = init_vqvae_params(jax.random.key(0), mcfg)
    rng = np.random.default_rng(0)

    import jax.numpy as jnp

    # Optimized path: bf16 compute, XLA one-hot dequantize, decoder tail
    # collapsed to one GEMM (ops/tail.py), b4096 (measured best on v5e).
    opt_batch = 4096 if on_tpu else 256
    steps = 512 if on_tpu else 6
    codec = VQCodec(params, mcfg, CodecConfig(batch_size=opt_batch,
                                              compute_dtype="bfloat16"))
    idx = jnp.asarray(rng.integers(0, mcfg.num_embeddings,
                                   (opt_batch, 4, 4, 4)).astype(np.uint8))
    value = _fenced_rate(codec._decode_step, params, idx, steps,
                         mcfg.num_embeddings)

    # Reference-shaped baseline: batch 64, f32, no Pallas, sequential.
    base = VQCodec(params, mcfg, CodecConfig(batch_size=64,
                                             compute_dtype="float32",
                                             use_pallas=False,
                                             fuse_decoder_tail=False,
                                             fuse_final_conv=False))
    idx64 = jnp.asarray(idx[:64])
    baseline = _fenced_rate(base._decode_step, params, idx64,
                            16384 if on_tpu else 24, mcfg.num_embeddings)

    print(json.dumps({
        "metric": "decode_leaves_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "leaves/s",
        "vs_baseline": round(value / baseline, 2),
    }))


if __name__ == "__main__":
    main()

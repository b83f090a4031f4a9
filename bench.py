"""Benchmark: decoded leaves (8^3 blocks)/sec per chip — the north-star metric.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "leaves/s", "vs_baseline": N}

The reference publishes no absolute throughput (BASELINE.md), so per the
survey's prescription the baseline row is measured here, on the same chip:
a faithful re-creation of the reference pipeline's *execution shape* —
synchronous per-batch loop at the SOP default batch size 64 (ref:
src/SOP/SOP_VQVDB_Encoder.cpp parm default), f32 math, no fused quantizer
kernels, result materialized before the next batch is dispatched (the
reference's hot loop has no overlap, ref: src/orchestrator/
VQVAECodec.cpp:108-127). `vs_baseline` is optimized / baseline throughput.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _steady_rate(fn, n_items: int, *, min_seconds: float = 1.0, warmups: int = 2):
    """items/sec: warm up, then run until min_seconds have elapsed."""
    for _ in range(warmups):
        fn()
    reps = 0
    t0 = time.perf_counter()
    while True:
        fn()
        reps += 1
        dt = time.perf_counter() - t0
        if dt >= min_seconds and reps >= 3:
            return n_items * reps / dt


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vqvdb_tpu.core.config import CodecConfig, ModelConfig
    from vqvdb_tpu.models import init_vqvae_params
    from vqvdb_tpu.runtime.codec import VQCodec

    on_tpu = jax.default_backend() == "tpu"
    mcfg = ModelConfig()
    params = init_vqvae_params(jax.random.key(0), mcfg)
    rng = np.random.default_rng(0)

    # --- optimized path: bf16, Pallas quantizer, large fixed batches,
    # pipelined host loop --------------------------------------------------
    opt_batch = 8192 if on_tpu else 512
    n_leaves = opt_batch * (8 if on_tpu else 2)
    codec = VQCodec(params, mcfg, CodecConfig(batch_size=opt_batch,
                                              compute_dtype="bfloat16"))
    indices = rng.integers(0, mcfg.num_embeddings,
                           size=(n_leaves, 4, 4, 4)).astype(np.uint8)
    value = _steady_rate(lambda: codec.decode_indices(indices), n_leaves)

    # --- reference-shaped baseline: batch 64, f32, no Pallas, fully
    # synchronous dispatch -------------------------------------------------
    base_codec = VQCodec(params, mcfg, CodecConfig(batch_size=64,
                                                   compute_dtype="float32",
                                                   use_pallas=False))
    base_n = 64 * (64 if on_tpu else 8)
    base_idx = indices[:base_n]

    def baseline_decode():
        for s in range(0, base_n, 64):
            chunk = jnp.asarray(base_idx[s : s + 64])
            np.asarray(base_codec._decode_jit(base_codec.params, chunk))

    baseline = _steady_rate(baseline_decode, base_n)

    print(json.dumps({
        "metric": "decode_leaves_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "leaves/s",
        "vs_baseline": round(value / baseline, 2),
    }))


if __name__ == "__main__":
    main()

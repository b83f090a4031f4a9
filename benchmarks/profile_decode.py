"""Per-stage decode profile: what would a fused megakernel recover?

Usage:  python benchmarks/profile_decode.py [out.json]

Times cumulative prefixes of the optimized decode graph (dequant -> stem
conv -> stem GN/relu -> RB64 -> attention -> tail GEMM) with the same
fence-robust in-graph harness as bench.py, then reports marginal per-stage
times. If the stage marginals sum to ~the full-graph time, there is no
inter-op overhead for a Pallas megakernel to recover — the remaining gap
to peak is inside XLA's convolutions themselves (see
docs/DECODE_ROOFLINE.md for the conclusion drawn from these numbers).

Each prefix consumes a full-tensor *sum of squares* of its last stage's
output: a plain sum is not enough — for linear stages (dequant one-hot
matmul, convs, the tail GEMM) XLA can reassociate sum∘linear into a
collapsed cheap form, silently deleting the stage being timed. The square
makes the reduction non-linear in the stage output, forcing the real
computation.
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(out_path=None):
    import jax
    import jax.numpy as jnp

    from vqvdb_tpu.core.config import CodecConfig, ModelConfig
    from vqvdb_tpu.models import blocks, init_vqvae_params
    from vqvdb_tpu.models.quantizer import dequantize
    from vqvdb_tpu.ops.tail import apply_decoder_tail, fold_decoder_tail

    mcfg = ModelConfig()
    ccfg = CodecConfig(batch_size=4096, compute_dtype="bfloat16")
    params = init_vqvae_params(jax.random.key(0), mcfg)
    folded_tail = fold_decoder_tail(params.decoder, mcfg)
    on_tpu = jax.default_backend() == "tpu"
    batch = 4096 if on_tpu else 256
    lo, hi = (128, 512) if on_tpu else (2, 6)

    rng = np.random.default_rng(0)
    idx0 = jnp.asarray(rng.integers(0, 256, (batch, 4, 4, 4)).astype(np.uint8))
    cdt = ccfg.compute_jnp_dtype

    dec = params.decoder

    def stage_dequant(idx):
        flat = idx.astype(jnp.int32).reshape(-1)
        z = dequantize(flat, params.vq.embedding.astype(cdt))
        return z.reshape((batch, 4, 4, 4, mcfg.embedding_dim))

    def stage_stem_conv(z):
        return blocks.conv3d(dec["stem_conv"], z, padding=1)

    def stage_stem_gn(h):
        return jax.nn.relu(blocks.group_norm(dec["stem_gn"], h, 8))

    def stage_rb(h):
        return blocks.residual_block(dec["rb"], h)

    def stage_attn(h):
        return blocks.channel_attention(dec["attn"], h)

    def stage_tail(h):
        return apply_decoder_tail(folded_tail, h, mcfg).astype(jnp.float32)

    stages = [
        ("dequant", stage_dequant),
        ("stem_conv", stage_stem_conv),
        ("stem_gn_relu", stage_stem_gn),
        ("rb64", stage_rb),
        ("attn", stage_attn),
        ("tail_gemm", stage_tail),
    ]

    def prefix_rate(k):
        """Time the first k stages; returns seconds per step."""

        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(p, i0, n):
            def body(_, carry):
                idx, acc = carry
                h = idx
                for _, fn in stages[:k]:
                    h = fn(h)
                nxt = ((idx.astype(jnp.int32) + 1) % 256).astype(idx.dtype)
                hf = h.astype(jnp.float32)
                return nxt, acc + jnp.sum(hf * hf)
            _, acc = jax.lax.fori_loop(0, n, body, (i0, jnp.float32(0)))
            return acc

        float(loop(params, idx0, 2))
        deltas = []
        for _ in range(3):
            t0 = time.perf_counter(); float(loop(params, idx0, lo)); tl = time.perf_counter() - t0
            t0 = time.perf_counter(); float(loop(params, idx0, hi)); th = time.perf_counter() - t0
            deltas.append((th - tl) / (hi - lo))
        deltas.sort()
        return deltas[len(deltas) // 2]

    results = {"backend": jax.default_backend(), "batch": batch}
    cum = []
    for k in range(1, len(stages) + 1):
        s = prefix_rate(k)
        cum.append(s)
        print(f"prefix {k} ({stages[k-1][0]}): {s*1e3:.3f} ms/step",
              file=sys.stderr)
    results["cumulative_ms"] = {stages[k][0]: round(cum[k] * 1e3, 4)
                                for k in range(len(stages))}
    marg = [cum[0]] + [cum[k] - cum[k - 1] for k in range(1, len(stages))]
    results["marginal_ms"] = {stages[k][0]: round(marg[k] * 1e3, 4)
                              for k in range(len(stages))}
    results["full_ms"] = round(cum[-1] * 1e3, 4)
    results["leaves_per_sec"] = round(batch / cum[-1], 1)
    out = json.dumps(results, indent=2)
    print(out)
    if out_path:
        Path(out_path).write_text(out + "\n")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)

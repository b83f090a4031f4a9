"""Per-stage encode profile (companion to profile_decode.py).

Usage:  python benchmarks/profile_encode.py [out.json] [batch]

batch defaults to 2048 — the shipped operating point since the round-2
sweep (CodecConfig rationale); round-2 profiled at the stale b8192 point,
which VERDICT r2 flagged.

Times cumulative prefixes of the optimized encode graph (pre conv ->
pre GN/relu -> RB16 -> packed down conv -> RB32 -> attention -> fused
score+argmin) plus, for calibration, the production `_encode_step` under
the same harness — round-2 measurements showed prefix-harness graphs
(closure-constant params) compile measurably slower than the production
jit step, so the production row anchors absolute numbers while the
marginals give relative attribution. Square-sum consumer (see
profile_decode.py for why a plain sum is invalid).
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(out_path=None, batch_arg=None):
    import jax
    import jax.numpy as jnp

    from vqvdb_tpu.core.config import CodecConfig, ModelConfig
    from vqvdb_tpu.models import blocks, init_vqvae_params
    from vqvdb_tpu.ops.packed import fold_strided_conv, space_to_channel
    from vqvdb_tpu.ops.quantize import fold_proj_into_scores, score_argmin_xla
    from vqvdb_tpu.runtime.codec import VQCodec

    mcfg = ModelConfig()
    batch_arg_v = int(batch_arg) if batch_arg else 2048
    ccfg = CodecConfig(batch_size=batch_arg_v, compute_dtype="bfloat16")
    params = init_vqvae_params(jax.random.key(0), mcfg)
    enc = params.encoder
    folded_down = fold_strided_conv(np.asarray(enc["down"]["w"], np.float32),
                                    np.asarray(enc["down"]["b"], np.float32))
    score_mc = fold_proj_into_scores(enc["proj"]["w"], enc["proj"]["b"],
                                     np.asarray(params.vq.embedding))
    on_tpu = jax.default_backend() == "tpu"
    batch = batch_arg_v if on_tpu else 256
    lo, hi = (64, 256) if on_tpu else (2, 6)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((batch, 8, 8, 8, 1), np.float32))
    cdt = ccfg.compute_jnp_dtype

    def s_pre_conv(x):
        return blocks.conv3d(enc["pre_conv"], x.astype(cdt), padding=1)

    def s_pre_gn(h):
        return jax.nn.relu(blocks.group_norm(enc["pre_gn"], h, 4))

    def s_rb16(h):
        return blocks.residual_block(enc["pre_rb"], h)

    def s_down(h):
        return blocks.conv3d(folded_down, space_to_channel(h, 2), padding=1)

    def s_rb32(h):
        return blocks.residual_block(enc["rb"], h)

    def s_attn(h):
        return blocks.channel_attention(enc["attn"], h)

    def s_score(h):
        m, c = score_mc
        flat = h.reshape(-1, h.shape[-1])
        return score_argmin_xla(flat, m, c).astype(jnp.int32)

    stages = [
        ("pre_conv", s_pre_conv),
        ("pre_gn_relu", s_pre_gn),
        ("rb16", s_rb16),
        ("packed_down", s_down),
        ("rb32", s_rb32),
        ("attn", s_attn),
        ("score_argmin", s_score),
    ]

    def perturb(x):
        return jnp.abs(x * jnp.float32(0.999) + jnp.float32(1e-4))

    def rate_of(fn):
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(x_init, n):
            def body(_, carry):
                x, acc = carry
                h = fn(x).astype(jnp.float32)
                return perturb(x), acc + jnp.sum(h * h)
            _, acc = jax.lax.fori_loop(0, n, body, (x_init, jnp.float32(0)))
            return acc

        float(loop(x0, 2))
        deltas = []
        for _ in range(3):
            t0 = time.perf_counter(); float(loop(x0, lo)); tl = time.perf_counter() - t0
            t0 = time.perf_counter(); float(loop(x0, hi)); th = time.perf_counter() - t0
            deltas.append((th - tl) / (hi - lo))
        deltas.sort()
        return deltas[len(deltas) // 2]

    results = {"backend": jax.default_backend(), "batch": batch}
    cum = []
    for k in range(1, len(stages) + 1):
        def prefix(x, k=k):
            h = x
            for _, fn in stages[:k]:
                h = fn(h)
            return h
        s = rate_of(prefix)
        cum.append(s)
        print(f"prefix {k} ({stages[k-1][0]}): {s*1e3:.3f} ms/step",
              file=sys.stderr)
    results["cumulative_ms"] = {stages[k][0]: round(cum[k] * 1e3, 4)
                                for k in range(len(stages))}
    marg = [cum[0]] + [cum[k] - cum[k - 1] for k in range(1, len(stages))]
    results["marginal_ms"] = {stages[k][0]: round(marg[k] * 1e3, 4)
                              for k in range(len(stages))}

    codec = VQCodec(params, mcfg, ccfg)
    prod = rate_of(lambda x: codec._encode_step(params, x))
    results["prefix_full_ms"] = round(cum[-1] * 1e3, 4)
    results["production_step_ms"] = round(prod * 1e3, 4)
    results["production_leaves_per_sec"] = round(batch / prod, 1)
    print(f"production _encode_step: {prod*1e3:.3f} ms/step", file=sys.stderr)
    out = json.dumps(results, indent=2)
    print(out)
    if out_path:
        Path(out_path).write_text(out + "\n")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None,
         sys.argv[2] if len(sys.argv) > 2 else None)

"""Per-stage vec3 profile: the scalar optimization discipline, pointed at
the 64/128-channel graphs (VERDICT r3 item 7).

Usage:  python benchmarks/profile_vec3.py [out.json]

Times cumulative prefixes of the optimized vec3 decode graph (dequant ->
stem conv 128->128 -> GN/relu -> RB128 -> RB128 -> attn -> tail GEMM) and
of both encode graphs (reference: pre 3->64 -> RB64 -> packed down ->
2xRB128 -> attn -> fused proj.score GEMM; packed: s2c -> stem 24->128 ->
RB128 -> attn -> score GEMM) with the same fence-robust in-graph harness
as bench.py / profile_decode.py. Marginal times localize the cost; MFU per
stage falls out of the analytic MAC counts (docs/VEC3_ROOFLINE.md).

Each prefix consumes a sum of *squares* of its last stage's output so XLA
cannot reassociate the reduction through the (linear) stage under test and
delete it — see profile_decode.py's docstring.
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _prefix_rate(stages, k, x0, lo, hi):
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(x, n):
        def body(_, carry):
            x, acc = carry
            h = x
            for _, fn in stages[:k]:
                h = fn(h)
            hf = h.astype(jnp.float32)
            if x.dtype == jnp.uint8:
                nxt = ((x.astype(jnp.int32) + 1) % 256).astype(x.dtype)
            else:
                nxt = x * 0.999 + 1e-4
            return nxt, acc + jnp.sum(hf * hf)

        _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
        return acc

    float(loop(x0, 2))
    deltas = []
    for _ in range(3):
        t0 = time.perf_counter(); float(loop(x0, lo)); tl = time.perf_counter() - t0
        t0 = time.perf_counter(); float(loop(x0, hi)); th = time.perf_counter() - t0
        deltas.append((th - tl) / (hi - lo))
    deltas.sort()
    return deltas[len(deltas) // 2]


def _profile(name, stages, x0, batch, lo, hi, results):
    cum = []
    for k in range(1, len(stages) + 1):
        s = _prefix_rate(stages, k, x0, lo, hi)
        cum.append(s)
        print(f"[{name}] prefix {k} ({stages[k - 1][0]}): "
              f"{s * 1e3:.3f} ms/step", file=sys.stderr)
    marg = [cum[0]] + [cum[i] - cum[i - 1] for i in range(1, len(stages))]
    results[name] = {
        "cumulative_ms": {stages[i][0]: round(cum[i] * 1e3, 4)
                          for i in range(len(stages))},
        "marginal_ms": {stages[i][0]: round(marg[i] * 1e3, 4)
                        for i in range(len(stages))},
        "full_ms": round(cum[-1] * 1e3, 4),
        "leaves_per_sec": round(batch / cum[-1], 1),
    }


def main(out_path=None):
    import jax
    import jax.numpy as jnp

    from vqvdb_tpu.core.config import CodecConfig, ModelConfig
    from vqvdb_tpu.models import blocks, init_vqvae_params
    from vqvdb_tpu.models.quantizer import dequantize
    from vqvdb_tpu.ops.packed import fold_strided_conv, space_to_channel
    from vqvdb_tpu.ops.quantize import (fold_proj_into_scores,
                                        score_argmin_xla)
    from vqvdb_tpu.ops.tail import apply_decoder_tail, fold_decoder_tail

    ccfg = CodecConfig(batch_size=2048, compute_dtype="bfloat16")
    cdt = ccfg.compute_jnp_dtype
    on_tpu = jax.default_backend() == "tpu"
    batch = 2048 if on_tpu else 64
    lo, hi = (64, 256) if on_tpu else (2, 6)
    rng = np.random.default_rng(0)
    results = {"backend": jax.default_backend(), "batch": batch,
               "compute": ccfg.compute_dtype}

    # ---- decode (shared decoder: both archs use it) ---------------------
    mcfg = ModelConfig(in_channels=3)
    params = init_vqvae_params(jax.random.key(0), mcfg)
    folded_tail = fold_decoder_tail(params.decoder, mcfg)
    dec = params.decoder
    D = mcfg.embedding_dim

    def d_dequant(idx):
        z = dequantize(idx.astype(jnp.int32).reshape(-1),
                       params.vq.embedding.astype(cdt))
        return z.reshape((batch, 4, 4, 4, D))

    stages_dec = [
        ("dequant", d_dequant),
        ("stem_conv", lambda z: blocks.conv3d(dec["stem_conv"], z, padding=1)),
        ("stem_gn_relu",
         lambda h: jax.nn.relu(blocks.group_norm(dec["stem_gn"], h, 8))),
        ("rb128_1", lambda h: blocks.residual_block(dec["rb1"], h)),
        ("rb128_2", lambda h: blocks.residual_block(dec["rb2"], h)),
        ("attn", lambda h: blocks.channel_attention(dec["attn"], h)),
        ("tail_gemm",
         lambda h: apply_decoder_tail(folded_tail, h, mcfg
                                      ).astype(jnp.float32)),
    ]
    idx0 = jnp.asarray(rng.integers(0, 256, (batch, 4, 4, 4)
                                    ).astype(np.uint8))
    _profile("decode", stages_dec, idx0, batch, lo, hi, results)

    # ---- encode, reference arch (optimized: packed down + fused score) --
    enc = params.encoder
    fdown = fold_strided_conv(np.asarray(enc["down"]["w"]),
                              np.asarray(enc["down"]["b"]))
    m_ref, c_ref = fold_proj_into_scores(np.asarray(enc["proj"]["w"]),
                                         np.asarray(enc["proj"]["b"]),
                                         np.asarray(params.vq.embedding))

    def e_score(h, m, c):
        return score_argmin_xla(h.reshape(-1, h.shape[-1]), m, c)

    stages_ref = [
        ("pre_conv", lambda x: blocks.conv3d(enc["pre_conv"],
                                             x.astype(cdt), padding=1)),
        ("pre_gn_relu",
         lambda h: jax.nn.relu(blocks.group_norm(enc["pre_gn"], h, 8))),
        ("pre_rb64", lambda h: blocks.residual_block(enc["pre_rb"], h)),
        ("packed_down",
         lambda h: blocks.conv3d(fdown, space_to_channel(h, 2), padding=1)),
        ("rb128_1", lambda h: blocks.residual_block(enc["rb1"], h)),
        ("rb128_2", lambda h: blocks.residual_block(enc["rb2"], h)),
        ("attn", lambda h: blocks.channel_attention(enc["attn"], h)),
        ("score_gemm", lambda h: e_score(h, m_ref, c_ref)),
    ]
    x0 = jnp.asarray(rng.random((batch, 8, 8, 8, 3), np.float32))
    _profile("encode_reference", stages_ref, x0, batch, lo, hi, results)

    # ---- encode, packed arch -------------------------------------------
    mcfg_p = ModelConfig(in_channels=3, encoder_arch="packed")
    params_p = init_vqvae_params(jax.random.key(1), mcfg_p)
    encp = params_p.encoder
    m_p, c_p = fold_proj_into_scores(np.asarray(encp["proj"]["w"]),
                                     np.asarray(encp["proj"]["b"]),
                                     np.asarray(params_p.vq.embedding))
    stages_packed = [
        ("s2c_stem",
         lambda x: blocks.conv3d(encp["stem_conv"],
                                 space_to_channel(x.astype(cdt), 2),
                                 padding=1)),
        ("stem_gn_relu",
         lambda h: jax.nn.relu(blocks.group_norm(encp["stem_gn"], h, 8))),
        ("rb128", lambda h: blocks.residual_block(encp["rb"], h)),
        ("attn", lambda h: blocks.channel_attention(encp["attn"], h)),
        ("score_gemm", lambda h: e_score(h, m_p, c_p)),
    ]
    _profile("encode_packed", stages_packed, x0, batch, lo, hi, results)

    out = json.dumps(results, indent=2)
    print(out)
    if out_path:
        Path(out_path).write_text(out + "\n")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)

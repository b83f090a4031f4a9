"""Stem-conv strategy experiment (decode's dominant stage).

profile_decode.py shows the decoder stem conv (128->64, k3 on 4^3) running
at ~80 TF/s while the RB64 convs (64->64) run near peak — XLA picks a worse
strategy for the 128-input conv. Conv is linear in input channels, so
  conv(z, W) == conv(z[..., :64], W[..., :64, :]) + conv(z[..., 64:], W[..., 64:, :])
exactly (up to fp reassociation). This script times dequant+stem under:

  v0_full    — one 128-in conv (current)
  v1_split2  — sum of two 64-in convs
  v2_split4  — sum of four 32-in convs

Usage: python benchmarks/experiment_stem.py [out.json]
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

    from vqvdb_tpu.core.config import ModelConfig
    from vqvdb_tpu.models import blocks, init_vqvae_params
    from vqvdb_tpu.models.quantizer import dequantize

    mcfg = ModelConfig()
    params = init_vqvae_params(jax.random.key(0), mcfg)
    dec = params.decoder
    on_tpu = jax.default_backend() == "tpu"
    batch = 4096 if on_tpu else 256
    lo, hi = (128, 512) if on_tpu else (2, 6)
    rng = np.random.default_rng(0)
    idx0 = jnp.asarray(rng.integers(0, 256, (batch, 4, 4, 4)).astype(np.uint8))
    cdt = jnp.bfloat16

    def deq(idx):
        flat = idx.astype(jnp.int32).reshape(-1)
        z = dequantize(flat, params.vq.embedding.astype(cdt))
        return z.reshape(idx.shape + (mcfg.embedding_dim,))

    w = dec["stem_conv"]["w"]  # (3,3,3,128,64)
    b = dec["stem_conv"]["b"]

    def v0_full(idx):
        return blocks.conv3d(dec["stem_conv"], deq(idx), padding=1)

    def _split(idx, parts):
        z = deq(idx)
        cin = z.shape[-1]
        step = cin // parts
        y = None
        for i in range(parts):
            sl = slice(i * step, (i + 1) * step)
            piece = blocks.conv3d({"w": w[..., sl, :]}, z[..., sl],
                                  padding=1)
            y = piece if y is None else y + piece
        return y + b.astype(y.dtype)

    def v1_split2(idx):
        return _split(idx, 2)

    def v2_split4(idx):
        return _split(idx, 4)

    def rate(fn):
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(i0, n):
            def body(_, carry):
                idx, acc = carry
                h = fn(idx).astype(jnp.float32)
                nxt = ((idx.astype(jnp.int32) + 1) % 256).astype(idx.dtype)
                return nxt, acc + jnp.sum(h * h)
            _, acc = jax.lax.fori_loop(0, n, body, (i0, jnp.float32(0)))
            return acc

        float(loop(idx0, 2))
        deltas = []
        for _ in range(3):
            t0 = time.perf_counter(); float(loop(idx0, lo)); tl = time.perf_counter() - t0
            t0 = time.perf_counter(); float(loop(idx0, hi)); th = time.perf_counter() - t0
            deltas.append((th - tl) / (hi - lo))
        deltas.sort()
        return deltas[len(deltas) // 2]

    # Numerics check first: exact rewrite up to fp reassociation.
    ref = np.asarray(v0_full(idx0[:64]), np.float32)
    for name, fn in (("v1_split2", v1_split2), ("v2_split4", v2_split4)):
        got = np.asarray(fn(idx0[:64]), np.float32)
        err = float(np.max(np.abs(got - ref)))
        assert err < 1e-1, f"{name} diverges: {err}"  # bf16 reassociation slack
        print(f"{name} max abs diff vs full: {err:.5f}", file=sys.stderr)

    results = {"backend": jax.default_backend(), "batch": batch}
    for name, fn in (("v0_full", v0_full), ("v1_split2", v1_split2),
                     ("v2_split4", v2_split4)):
        ms = rate(fn) * 1e3
        results[name + "_ms"] = round(ms, 4)
        print(f"{name}: {ms:.3f} ms/step", file=sys.stderr)
    out = json.dumps(results, indent=2)
    print(out)
    if out_path:
        Path(out_path).write_text(out + "\n")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)

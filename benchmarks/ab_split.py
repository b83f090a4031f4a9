"""A/B the split-K conv rewrite inside the FULL codec graphs.

benchmarks/experiment_stem.py measured the isolated dequant+stem pair 2x
faster split; this measures the same rewrite in context (the whole
_decode_step/_encode_step), same process, interleaved A/B/A/B with fresh
salted compiles, because fusion boundaries and the compilation lottery can
eat isolated-stage wins.

Usage: python benchmarks/ab_split.py [out.json]
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

    # Salt as the accumulator's init value: a real HLO constant (the fence
    # discards the result), so each salt compiles fresh even under an
    # HLO-keyed cache; `jnp.float32(s) * 0.0` would constant-fold away.
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
    from vqvdb_tpu.models import init_vqvae_params
    from vqvdb_tpu.runtime.codec import VQCodec

    mcfg = ModelConfig()
    params = init_vqvae_params(jax.random.key(0), mcfg)
    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() == "tpu"
    db, eb = (4096, 8192) if on_tpu else (256, 256)
    dlo, dhi = (128, 512) if on_tpu else (2, 6)
    elo, ehi = (64, 256) if on_tpu else (2, 6)
    reps = 2 if on_tpu else 1

    idx = jnp.asarray(rng.integers(0, 256, (db, 4, 4, 4)).astype(np.uint8))
    leaves = jnp.asarray(rng.random((eb, 8, 8, 8, 1), np.float32))

    def pidx(x):
        return ((x.astype(jnp.int32) + 1) % 256).astype(x.dtype)

    def pleaf(x):
        return jnp.abs(x * jnp.float32(0.999) + jnp.float32(1e-4))

    def cf(out):
        o = out.astype(jnp.float32)
        return jnp.sum(o * o)

    results = {"backend": jax.default_backend()}
    for split in (0, 64):
        cc = CodecConfig(batch_size=db, compute_dtype="bfloat16",
                         split_conv_in=split)
        ce = CodecConfig(batch_size=eb, compute_dtype="bfloat16",
                         split_conv_in=split)
        dec = VQCodec(params, mcfg, cc)
        enc = VQCodec(params, mcfg, ce)
        dr = [_rate(dec._decode_step, params, idx, dlo, dhi, pidx, cf,
                    salt=split + r) for r in range(reps)]
        er = [_rate(enc._encode_step, params, leaves, elo, ehi, pleaf, cf,
                    salt=split + 100 + r) for r in range(reps)]
        results[f"decode_split{split}"] = [round(v, 1) for v in dr]
        results[f"encode_split{split}"] = [round(v, 1) for v in er]
        print(f"split={split}: decode {dr} encode {er}", file=sys.stderr)

    for kind in ("decode", "encode"):
        a = statistics.median(results[f"{kind}_split0"])
        b = statistics.median(results[f"{kind}_split64"])
        results[f"{kind}_speedup"] = round(b / a, 3)
    out = json.dumps(results, indent=2)
    print(out)
    if out_path:
        Path(out_path).write_text(out + "\n")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)

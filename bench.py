"""Benchmark: decoded leaves (8^3 blocks)/sec per chip — the north-star metric.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "leaves/s", "vs_baseline": N, ...}

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

Pinned baseline protocol (round-2): the tiny baseline graph's throughput
varies between XLA compilations (BASELINE.md round-1 row: 675k-1.18M
leaves/s). The baseline is therefore the MEDIAN over BASELINE_COMPILES
fresh compilations — each run salts the graph with a distinct embedded
constant so the compile cache cannot reuse the previous executable — and
the JSON reports every run plus the relative spread, making `vs_baseline`
reproducible instead of compilation-lottery.

MFU lines use analytic FLOP counts per leaf (constants below) against the
v5e bf16 peak of 197 TFLOP/s.
"""

from __future__ import annotations

import functools
import json
import statistics
import time

import numpy as np

# Analytic dense-FLOP cost of the optimized inference graphs, per 8^3 leaf
# (multiply-add = 2 FLOPs; elementwise/norm/lookup excluded):
#   decode: stem conv D128->64 on 4^3 (28.3M) + RB64 2x k3 conv (28.3M)
#           + tail GEMM 4096x512 (4.2M) + attn (~0.1M)            ~= 61 MFLOP
#   encode (reference arch): pre 1->16 (0.44M) + RB16 (14.2M) + packed down
#           conv k4 16->32 (4.2M) + RB32 (7.1M) + proj+score (4.5M) ~= 30
#   encode (packed arch): stem k3 8->64 (1.77M) + RB64 (28.3M)
#           + fused proj.score 64x256 (2.1M)                      ~= 32.2
#   encode (packed_lite): RB closer pointwise                     ~= 18.9
DECODE_MFLOP_PER_LEAF = 61.0
#   encode (packed_stem): 8^3 stem k3 1->8 (0.22M) + pointwise trunk stem
#           64->64 (0.52M) + RB64 (28.3M) + fused proj.score (2.1M) ~= 31.2
ENCODE_MFLOP_PER_LEAF = {
    "reference": 30.0,
    "packed": 32.2,
    "packed_lite": 18.9,
    "packed_stem": 31.2,
}
V5E_BF16_PEAK_TFLOPS = 197.0
BASELINE_COMPILES = 3


def _fenced_rate(step, params, batch, steps: int, perturb, consume,
                 salt: int = 0):
    """leaves/sec with the loop in-graph and a scalar-readback fence.

    `salt` is embedded as a distinct constant in the compiled program (the
    accumulator's initial value — the fence discards the result, so the
    bias is harmless) so successive calls produce distinct HLO and compile
    fresh executables even under an HLO-keyed persistent compile cache.
    NB: an expression like `jnp.float32(s) * 0.0` would NOT work — s is
    static, so it constant-folds to the same 0.0 at trace time."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n", "s"))
    def loop(params, x0, n, s):
        def body(i, carry):
            x, acc = carry
            out = step(params, x)
            # Perturb input each iteration (prevents loop-invariant hoisting)
            # and consume EVERY output element (a full-batch reduction —
            # consuming a single element lets XLA slice-propagate the whole
            # graph down to batch size 1).
            return perturb(x), acc + consume(out)
        _, acc = jax.lax.fori_loop(0, n, body, (x0, jnp.float32(s)))
        return acc

    float(loop(params, batch, 2, salt))  # compile + warm
    b = batch.shape[0]
    lo, hi = max(steps // 4, 1), steps

    def timed(n):
        t0 = time.perf_counter()
        float(loop(params, batch, n, salt))  # readback fences completion
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


def main(data_parallel: bool = False) -> None:
    import jax

    from vqvdb_tpu.core.config import CodecConfig, ModelConfig
    from vqvdb_tpu.models import init_vqvae_params
    from vqvdb_tpu.runtime.codec import VQCodec

    on_tpu = jax.default_backend() == "tpu"
    mcfg = ModelConfig()
    params = init_vqvae_params(jax.random.key(0), mcfg)
    rng = np.random.default_rng(0)

    # The encode row benches what ships: the committed flagship artifact's
    # encoder arch, whatever that is at HEAD (throughput is
    # weight-independent, so untrained params with the same config measure
    # the same program). The packed/packed_lite tiers have their own A/B
    # rows in benchmarks/encoder_v2_ab_r4.json.
    from pathlib import Path

    from vqvdb_tpu.core.artifact import load_model_config

    flag_path = Path(__file__).parent / "models" / "scalar.vqmodel"
    enc_arch = "reference"
    if flag_path.exists():
        enc_arch = load_model_config(flag_path).encoder_arch
    mcfg_enc = ModelConfig(encoder_arch=enc_arch)
    params_enc = (params if enc_arch == "reference"
                  else init_vqvae_params(jax.random.key(0), mcfg_enc))

    import jax.numpy as jnp

    K = mcfg.num_embeddings

    def perturb_idx(idx):
        return ((idx.astype(jnp.int32) + 1) % K).astype(idx.dtype)

    def perturb_leaves(x):
        return jnp.abs(x * jnp.float32(0.999) + jnp.float32(1e-4))

    def consume_f(out):
        return jnp.sum(out.astype(jnp.float32))

    # Optimized decode: bf16 compute, XLA one-hot dequantize, decoder tail
    # collapsed to one GEMM (ops/tail.py), b2048 (round-2 sweep best;
    # benchmarks/sweep_batch_r2.json — flat 2048-4096, falling above).
    opt_batch = 2048 if on_tpu else 256
    steps = 512 if on_tpu else 6
    codec = VQCodec(params, mcfg, CodecConfig(batch_size=opt_batch,
                                              compute_dtype="bfloat16"))
    idx = jnp.asarray(rng.integers(0, K, (opt_batch, 4, 4, 4)).astype(np.uint8))
    value = _fenced_rate(codec._decode_step, params, idx, steps,
                         perturb_idx, consume_f)

    # Optimized encode at the flagship arch (packed: proj fused into the
    # quantizer score GEMM; reference: + packed strided down-conv), b2048
    # (sweeps: sweep_batch_r2.json, packed_batch_sweep_r4.json — flat).
    enc_batch = 2048 if on_tpu else 256
    enc_codec = VQCodec(params_enc, mcfg_enc,
                        CodecConfig(batch_size=enc_batch,
                                    compute_dtype="bfloat16"))
    leaves = jnp.asarray(rng.random((enc_batch, 8, 8, 8, 1), np.float32))
    encode_value = _fenced_rate(enc_codec._encode_step, params_enc, leaves,
                                steps // 2 if on_tpu else 4,
                                perturb_leaves, consume_f)

    # Regression-tracked secondary rows (VERDICT r3 item 7): vec3 and the
    # RVQ (S=2) tier, encode+decode, at their operating points.
    vec3_path = Path(__file__).parent / "models" / "vec3.vqmodel"
    v3_arch = "reference"
    if vec3_path.exists():
        v3_arch = load_model_config(vec3_path).encoder_arch
    extra = {}
    if on_tpu:
        mcfg_v3 = ModelConfig(in_channels=3, encoder_arch=v3_arch)
        params_v3 = init_vqvae_params(jax.random.key(0), mcfg_v3)
        cdec = VQCodec(params_v3, mcfg_v3,
                       CodecConfig(batch_size=1024,
                                   compute_dtype="bfloat16"))
        idx3 = jnp.asarray(rng.integers(0, K, (1024, 4, 4, 4)
                                        ).astype(np.uint8))
        leaves3 = jnp.asarray(rng.random((1024, 8, 8, 8, 3), np.float32))
        extra["vec3_decode_leaves_per_sec"] = round(_fenced_rate(
            cdec._decode_step, params_v3, idx3, 128, perturb_idx,
            consume_f), 1)
        extra["vec3_encode_leaves_per_sec"] = round(_fenced_rate(
            cdec._encode_step, params_v3, leaves3, 128, perturb_leaves,
            consume_f), 1)
        extra["vec3_encoder_arch"] = v3_arch

        mcfg_rvq = ModelConfig(num_quantizers=2)
        params_rvq = init_vqvae_params(jax.random.key(0), mcfg_rvq)
        crvq = VQCodec(params_rvq, mcfg_rvq,
                       CodecConfig(batch_size=2048,
                                   compute_dtype="bfloat16"))
        idx_rvq = jnp.asarray(rng.integers(0, K, (2048, 4, 4, 4, 2)
                                           ).astype(np.uint8))
        extra["rvq2_decode_leaves_per_sec"] = round(_fenced_rate(
            crvq._decode_step, params_rvq, idx_rvq, 256, perturb_idx,
            consume_f), 1)
        extra["rvq2_encode_leaves_per_sec"] = round(_fenced_rate(
            crvq._encode_step, params_rvq, leaves, 128, perturb_leaves,
            consume_f), 1)

        # Dense device paths (VERDICT r4 item 2): one dispatch per grid
        # (relay-safe), full occupancy, scalar-readback fenced. Decode:
        # R prebuilt index payloads (H2D included — that IS the path's
        # host cost) dispatched back-to-back, clock stopped on a sum over
        # every output. Encode: sequential calls (its activity-mask
        # readback syncs per call by design).
        from vqvdb_tpu.runtime.dense import decode_to_dense, encode_from_dense

        bd = (48, 48, 48)
        n_dense = bd[0] * bd[1] * bd[2]  # 110,592 leaves = 384^3 volume
        org_d = (np.stack(np.unravel_index(np.arange(n_dense), bd), 1) * 8
                 ).astype(np.int32)
        idx_payloads = [rng.integers(0, K, (n_dense, 4, 4, 4)
                                     ).astype(np.uint8) for _ in range(4)]
        dcodec = VQCodec(params, mcfg, CodecConfig(batch_size=2048,
                                                   compute_dtype="bfloat16"))
        decode_to_dense(dcodec, idx_payloads[0], org_d)  # compile, untimed
        t0 = time.perf_counter()
        outs = [decode_to_dense(dcodec, p, org_d)[0] for p in idx_payloads]
        fence = float(sum(jnp.sum(o.astype(jnp.float32)) for o in outs))
        dt = time.perf_counter() - t0
        assert np.isfinite(fence)
        extra["dense_decode_leaves_per_sec"] = round(
            len(idx_payloads) * n_dense / dt, 1)
        dense0 = outs[0]

        encode_from_dense(dcodec, dense0)  # compile, untimed
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            di, _ = encode_from_dense(dcodec, dense0)
        dt = time.perf_counter() - t0
        assert di.shape[0] == n_dense
        extra["dense_encode_leaves_per_sec"] = round(reps * n_dense / dt, 1)

        # Device-only dense rates (the e2e rows above include per-dispatch
        # transport — through the HTTP relay that term dominates: ~7 MB
        # H2D + round trips per grid. A PCIe-attached host pays ~1 ms for
        # the same H2D, so its e2e approaches the device-program rate
        # measured here with the in-graph repeat + scalar-fence protocol).
        from vqvdb_tpu.runtime.dense import (_blocks_to_dense, _pad_steps,
                                             _scan_scatter, _to_blocks)

        bs_d = dcodec.ccfg.batch_size
        idx_steps = jnp.asarray(_pad_steps(idx_payloads[0], bs_d, 0))
        bid_steps = jnp.asarray(_pad_steps(
            np.arange(n_dense, dtype=np.int32), bs_d, n_dense))
        row = 512 * mcfg.in_channels

        @functools.partial(jax.jit, static_argnames=("n",))
        def dense_dec_loop(params, idx_s, bid_s, n):
            def body(i, carry):
                idx_s, acc = carry
                buf = jnp.zeros((n_dense + 1, row), jnp.float32)
                buf = _scan_scatter(dcodec, buf, idx_s, bid_s, None, None,
                                    params, None)
                # The shipped program ends in the voxel-order transpose
                # (_dense_decode_fn) — include its HBM traffic. The barrier
                # forces the transposed volume to materialize (a plain sum
                # is permutation-invariant and XLA would drop the transpose).
                dense = jax.lax.optimization_barrier(_blocks_to_dense(
                    buf, n_dense, bd, mcfg.in_channels))
                nxt = ((idx_s.astype(jnp.int32) + 1) % K).astype(idx_s.dtype)
                return nxt, acc + jnp.sum(buf) + dense[0, 0, 0, 0]

            _, acc = jax.lax.fori_loop(0, n, body, (idx_s, jnp.float32(0.0)))
            return acc

        float(dense_dec_loop(params, idx_steps, bid_steps, 1))  # compile

        def timed_dense(fn, args, n):
            t0 = time.perf_counter()
            float(fn(*args, n))
            return time.perf_counter() - t0

        deltas = sorted(
            (timed_dense(dense_dec_loop, (params, idx_steps, bid_steps), 8)
             - timed_dense(dense_dec_loop, (params, idx_steps, bid_steps), 2))
            / 6 for _ in range(3))
        extra["dense_decode_device_leaves_per_sec"] = round(
            n_dense / max(deltas[1], 1e-9), 1)

        @functools.partial(jax.jit, static_argnames=("n",))
        def dense_enc_loop(params, dense, bid_s, n):
            def body(i, carry):
                dense, acc = carry
                rows = _to_blocks(dense)
                # The shipped path runs the activity reduction before the
                # gather+encode program (_dense_encode_fns) — include it.
                # (The two-dispatch split's duplicate _to_blocks is not
                # modeled; it is a reshape XLA fuses into each consumer.)
                act = jnp.max(jnp.abs(rows - jnp.float32(0.0)),
                              axis=1) > jnp.float32(0.0)

                def step(_, bid_b):
                    leaves = rows[bid_b].reshape(
                        bid_b.shape[0], 8, 8, 8, mcfg.in_channels)
                    return None, dcodec._encode_step(params, leaves)

                _, di = jax.lax.scan(step, None, bid_s)
                nxt = jnp.abs(dense * jnp.float32(0.999) + jnp.float32(1e-4))
                return nxt, (acc + jnp.sum(di.astype(jnp.float32))
                             + jnp.sum(act.astype(jnp.float32)))

            _, acc = jax.lax.fori_loop(0, n, body, (dense, jnp.float32(0.0)))
            return acc

        float(dense_enc_loop(params, dense0, bid_steps, 1))  # compile
        deltas = sorted(
            (timed_dense(dense_enc_loop, (params, dense0, bid_steps), 8)
             - timed_dense(dense_enc_loop, (params, dense0, bid_steps), 2))
            / 6 for _ in range(3))
        extra["dense_encode_device_leaves_per_sec"] = round(
            n_dense / max(deltas[1], 1e-9), 1)
        del outs, dense0

    # Reference-shaped baseline: batch 64, f32, no Pallas, sequential;
    # median over fresh compilations (see module docstring).
    base = VQCodec(params, mcfg, CodecConfig(batch_size=64,
                                             compute_dtype="float32",
                                             use_pallas=False,
                                             fuse_decoder_tail=False,
                                             fuse_final_conv=False))
    idx64 = jnp.asarray(idx[:64])
    base_runs = [
        _fenced_rate(base._decode_step, params, idx64,
                     16384 if on_tpu else 24, perturb_idx, consume_f, salt=s)
        for s in range(1, BASELINE_COMPILES + 1)
    ]
    baseline = statistics.median(base_runs)
    spread = (max(base_runs) - min(base_runs)) / baseline if baseline else 0.0

    peak = V5E_BF16_PEAK_TFLOPS * 1e12
    out = {
        "metric": "decode_leaves_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "leaves/s",
        "vs_baseline": round(value / baseline, 2),
        "encode_leaves_per_sec_per_chip": round(encode_value, 1),
        "baseline_leaves_per_sec": round(baseline, 1),
        "baseline_runs": [round(r, 1) for r in base_runs],
        "baseline_spread": round(spread, 3),
        "encoder_arch": enc_arch,
        "decode_mfu": round(value * DECODE_MFLOP_PER_LEAF * 1e6 / peak, 3)
        if on_tpu else None,
        "encode_mfu": round(
            encode_value * ENCODE_MFLOP_PER_LEAF[enc_arch] * 1e6 / peak,
            3) if on_tpu else None,
        **extra,
    }
    if data_parallel:
        # Mesh codec end-to-end over every local device (1 chip today, N
        # when available) + the measured host-stage cost model that bounds
        # DP scaling (see benchmarks/bench_dp.py, docs/DP_SCALING.md).
        import sys

        sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
        from benchmarks.bench_dp import bench_mesh_size

        row = bench_mesh_size(len(jax.devices()), opt_batch,
                              100_000 if on_tpu else 8_192,
                              "bfloat16" if on_tpu else "float32")
        out["mesh_devices"] = row["n_devices"]
        out["dp_e2e_decode_leaves_per_sec"] = row["e2e_decode_leaves_per_sec"]
        for k in ("host_shard_ms_per_batch", "host_gather_ms_per_batch",
                  "host_gather_shards_ms_per_batch",
                  "device_step_ms_per_batch",
                  "host_bound_ceiling_leaves_per_sec",
                  "host_bound_ceiling_shards_leaves_per_sec"):
            if k in row:
                out[k] = row[k]
    print(json.dumps(out))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--data-parallel", action="store_true",
                    help="add mesh codec end-to-end + host cost fields")
    main(data_parallel=ap.parse_args().data_parallel)

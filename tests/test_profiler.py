"""Profiler utilities."""

import time

from vqvdb_tpu.utils.profiler import Profiler, scoped_timer, trace


def test_profiler_accumulates():
    p = Profiler()
    for _ in range(3):
        with p("stage_a"):
            time.sleep(0.002)
    with p("stage_b"):
        pass
    rep = p.report()
    assert rep["stage_a"]["count"] == 3
    assert rep["stage_a"]["total_s"] >= 0.006
    assert rep["stage_b"]["count"] == 1
    p.reset()
    assert p.report() == {}


def test_scoped_timer_logs():
    lines = []
    with scoped_timer("op", log_fn=lines.append):
        pass
    assert len(lines) == 1 and "op" in lines[0]


def test_trace_noop_without_dir():
    with trace(None):
        pass  # must be a silent no-op


def test_codec_profiler_wired(rng):
    import jax
    import numpy as np

    from vqvdb_tpu.core.config import CodecConfig, ModelConfig
    from vqvdb_tpu.models import init_vqvae_params
    from vqvdb_tpu.runtime.codec import VQCodec

    cfg = ModelConfig(embedding_dim=32, num_embeddings=64)
    codec = VQCodec(init_vqvae_params(jax.random.key(0), cfg), cfg,
                    CodecConfig(batch_size=8, compute_dtype="float32"))
    codec.encode_leaves(rng.random((20, 8, 8, 8), dtype=np.float32))
    rep = codec.profiler.report()
    assert rep["device/dispatch"]["count"] == 3  # ceil(20/8)
    assert "host/pad" in rep  # ragged tail padded once

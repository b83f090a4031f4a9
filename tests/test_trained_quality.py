"""Quality regression against the committed trained artifact.

The reference's acceptance bar was notebook PSNR/MSE on a val set
(BASELINE.md: zero/nonzero MSE 1.21e-05 / 1.79e-04). Here the committed
models/scalar.vqmodel must beat fixed thresholds on unseen procedural
volumes — a regression trip-wire for model/kernel/numerics changes.
"""

from pathlib import Path

import numpy as np
import pytest

MODEL = Path(__file__).resolve().parent.parent / "models" / "scalar.vqmodel"

pytestmark = pytest.mark.skipif(not MODEL.exists(),
                                reason="trained artifact not present")


def test_trained_model_quality():
    from vqvdb_tpu import api
    from vqvdb_tpu.eval.metrics import codebook_report, evaluate_codec
    from vqvdb_tpu.train.synthetic import smoke_grid

    codec = api.make_codec(MODEL, batch_size=256, compute_dtype="float32")
    leaves = smoke_grid(64, seed=9999).leaves  # unseen volume
    rep = evaluate_codec(codec, leaves)
    # Current artifact scores 43.4 dB here; a 42 dB floor leaves ~1.4 dB
    # retrain headroom while catching kernel/numerics regressions that the
    # old 38 dB bar would have let through.
    assert rep["psnr_mean"] > 42.0, f"PSNR regressed: {rep['psnr_mean']:.2f} dB"
    assert rep["mse"] < 2e-4
    cb = codebook_report(rep["indices"], codec.mcfg.num_embeddings)
    assert cb["active_codes"] > 100  # healthy codebook utilization


def test_trained_model_file_roundtrip(tmp_path):
    from vqvdb_tpu import api
    from vqvdb_tpu.train.synthetic import smoke_grid
    from vqvdb_tpu.vdb.grid import psnr

    codec = api.make_codec(MODEL, batch_size=256, compute_dtype="float32")
    g = smoke_grid(48, seed=31337)
    path = tmp_path / "q.vqvdb"
    stats = api.encode(g, codec, path)
    ratio = g.num_leaves * 2048 / stats["bytes"]
    assert ratio > 20.0  # ~26.9x expected (32x payload + origins + headers)
    grids, _ = api.decode(path, codec)
    d1, _ = g.to_dense()
    d2, _ = grids[0].to_dense()
    assert psnr(d2, d1) > 30.0

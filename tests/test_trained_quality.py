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
    from vqvdb_tpu.eval.metrics import evaluate_codec
    from vqvdb_tpu.train.synthetic import smoke_grid

    codec = api.make_codec(MODEL, batch_size=256, compute_dtype="float32")
    leaves = smoke_grid(64, seed=9999).leaves  # unseen volume
    rep = evaluate_codec(codec, leaves)
    # Provenance gate: these anchors are CPU-f32 numbers; a TPU-bf16 eval
    # reads ~0.6-0.8 dB lower on the same artifact (BASELINE.md) — the
    # gate must never silently compare across bases.
    assert rep["eval_backend"] == "cpu" and rep["compute_dtype"] == "float32"
    # The committed round-5 flagship (packed arch, 3000 smoke + 3000
    # levelset pools) scores 53.62 dB here (benchmarks/anchors_r5.json);
    # a 50 dB floor leaves ~3.5 dB retrain headroom while catching
    # kernel/numerics regressions well above eval noise (deterministic).
    assert rep["psnr_mean"] > 50.0, f"PSNR regressed: {rep['psnr_mean']:.2f} dB"
    assert rep["mse"] < 1e-4


def test_trained_model_codebook_utilization():
    """Mixed-distribution utilization gate (VERDICT r4 item 6). The
    round-4 flagship silently regressed to 142/256 active and the old
    `> 100` floor let it ship. Utilization must be judged on the TRAINING
    distribution (smoke + levelset): per-family probes undercount because
    codes specialize per family (the r5 flagship uses 127 codes on smoke,
    129 others on levelset — 256/256 combined, perplexity 61)."""
    from vqvdb_tpu import api
    from vqvdb_tpu.eval.metrics import codebook_report, evaluate_codec
    from vqvdb_tpu.train.synthetic import levelset_grid, smoke_grid

    codec = api.make_codec(MODEL, batch_size=256, compute_dtype="float32")
    leaves = np.concatenate(
        [np.asarray(smoke_grid(96, seed=s).leaves, np.float32)
         for s in (1000, 1001)]
        + [np.asarray(levelset_grid(96, seed=s).leaves, np.float32)
           for s in (1000, 1001)])
    rep = evaluate_codec(codec, leaves)
    cb = codebook_report(rep["indices"], codec.mcfg.num_embeddings)
    assert cb["active_codes"] >= 240, \
        f"codebook utilization regressed: {cb['active_codes']}/256"
    assert cb["perplexity"] > 40.0


REFERENCE_MODEL = MODEL.parent / "scalar_reference.vqmodel"

# The reference-arch interop tier (torch/TorchScript export requires the
# reference module tree): the round-4 10x flagship, kept as the committed
# reference-arch artifact. Leading-seed anchors (anchors_r4.json): smoke
# 55.54 / p5 49.88, levelset 43.19 / 35.17. Floors leave ~2 dB headroom.


@pytest.mark.skipif(not REFERENCE_MODEL.exists(),
                    reason="reference-arch artifact not present")
def test_reference_tier_quality():
    from vqvdb_tpu.core.artifact import load_model
    from vqvdb_tpu.train.synthetic import levelset_grid, smoke_grid

    _, cfg = load_model(REFERENCE_MODEL)
    assert cfg.encoder_arch == "reference"  # the tier's reason to exist
    rep = _family_eval(smoke_grid, REFERENCE_MODEL, (1000, 1001, 1002))
    assert rep["psnr_mean"] > 53.5, f"ref smoke mean {rep['psnr_mean']:.2f}"
    assert rep["psnr_p5"] > 47.5, f"ref smoke p5 {rep['psnr_p5']:.2f}"
    rep = _family_eval(levelset_grid, REFERENCE_MODEL, (1000, 1001, 1002))
    assert rep["psnr_mean"] > 41.0, f"ref levelset mean {rep['psnr_mean']:.2f}"
    assert rep["psnr_p5"] > 33.0, f"ref levelset p5 {rep['psnr_p5']:.2f}"


PACKED_LITE_MODEL = MODEL.parent / "scalar_packed_lite.vqmodel"

# packed_lite: the >=2x encode tier (~3.7M leaves/s,
# benchmarks/packed_lite_bench_r4.json; 50k TPU-bf16 judge 54.63/40.73,
# arch10x_a_r4.json). Floors mirror the packed gate's headroom.


@pytest.mark.skipif(not PACKED_LITE_MODEL.exists(),
                    reason="packed_lite artifact not present")
def test_packed_lite_tier_smoke_quality():
    from vqvdb_tpu.train.synthetic import smoke_grid

    rep = _family_eval(smoke_grid, PACKED_LITE_MODEL, (1000, 1001, 1002))
    assert rep["num_blocks"] > 900
    assert rep["psnr_mean"] > 52.3, \
        f"packed_lite smoke mean {rep['psnr_mean']:.2f}"
    assert rep["psnr_p5"] > 47.0, \
        f"packed_lite smoke p5 {rep['psnr_p5']:.2f}"


VEC3_MODEL = MODEL.parent / "vec3.vqmodel"

# Family thresholds anchored to the committed artifacts (round-5 flagship:
# packed arch at 3000 smoke + 3000 levelset pools; leading-seed evals in
# benchmarks/anchors_r5.json, 50k-block judge row in
# benchmarks/arch_r5_packed_rebal.json). Leading-seed anchors:
#   smoke    999 blocks: mean 55.75 p5 50.80 (50k TPU-bf16: 55.04 / 49.31)
#   levelset 1136 blocks: mean 44.30 p5 36.35 (50k TPU-bf16: 43.71 / 35.57)
#   vec3     387 blocks: mean 37.81 p5 28.24 (50k TPU-bf16: 36.17 / 27.31)
# (These gates run on CPU, where bf16 computes at ~f32 numerics — hence
# the ~0.7 dB offset vs the TPU ladder rows.)
# Floors leave ~2 dB retrain headroom while tripping on kernel or
# numerics regressions well above noise (run-to-run spread is 0 — the
# eval is deterministic; the margin covers future retrains only).


def _family_eval(factory, model, seeds):
    from vqvdb_tpu import api
    from vqvdb_tpu.eval.metrics import evaluate_codec

    leaves = np.concatenate(
        [np.asarray(factory(96, seed=s).leaves, np.float32) for s in seeds])
    codec = api.make_codec(model, batch_size=256, compute_dtype="float32")
    return evaluate_codec(codec, leaves)


def test_scalar_smoke_quality_50k_anchored():
    from vqvdb_tpu.train.synthetic import smoke_grid

    rep = _family_eval(smoke_grid, MODEL, (1000, 1001, 1002))
    assert rep["num_blocks"] > 900
    assert rep["psnr_mean"] > 53.7, f"smoke mean {rep['psnr_mean']:.2f} dB"
    assert rep["psnr_p5"] > 48.5, f"smoke p5 {rep['psnr_p5']:.2f} dB"


def test_scalar_levelset_quality_50k_anchored():
    from vqvdb_tpu.train.synthetic import levelset_grid

    rep = _family_eval(levelset_grid, MODEL, (1000, 1001, 1002))
    assert rep["num_blocks"] > 1000
    assert rep["psnr_mean"] > 42.3, f"levelset mean {rep['psnr_mean']:.2f} dB"
    assert rep["psnr_p5"] > 34.3, f"levelset p5 {rep['psnr_p5']:.2f} dB"


RVQ2_MODEL = MODEL.parent / "scalar_rvq2.vqmodel"

# The residual-VQ quality tier (S=2, flagship recipe; k_sweep_r3.json)
# must stay strictly above the single-stage flagship. Round-4 10x-data
# leading-seed anchors: smoke 999 blocks mean 58.71 p5 53.03; levelset
# 1136 blocks mean 45.73 p5 38.72 (50k-block TPU-bf16 judge: 58.75 /
# 45.52, benchmarks/arch10x_b_r4.json). Floors leave ~2 dB retrain
# headroom.


@pytest.mark.skipif(not RVQ2_MODEL.exists(),
                    reason="rvq2 artifact not present")
def test_rvq2_tier_beats_flagship_smoke():
    from vqvdb_tpu.train.synthetic import smoke_grid

    rep = _family_eval(smoke_grid, RVQ2_MODEL, (1000, 1001, 1002))
    assert rep["num_blocks"] > 900
    assert rep["psnr_mean"] > 56.5, f"rvq2 smoke mean {rep['psnr_mean']:.2f}"
    assert rep["psnr_p5"] > 51.0, f"rvq2 smoke p5 {rep['psnr_p5']:.2f}"


@pytest.mark.skipif(not RVQ2_MODEL.exists(),
                    reason="rvq2 artifact not present")
def test_rvq2_tier_beats_flagship_levelset():
    from vqvdb_tpu.train.synthetic import levelset_grid

    rep = _family_eval(levelset_grid, RVQ2_MODEL, (1000, 1001, 1002))
    assert rep["num_blocks"] > 1000
    assert rep["psnr_mean"] > 43.5, f"rvq2 levelset mean {rep['psnr_mean']:.2f}"
    assert rep["psnr_p5"] > 36.5, f"rvq2 levelset p5 {rep['psnr_p5']:.2f}"


@pytest.mark.slow
@pytest.mark.skipif(not VEC3_MODEL.exists(),
                    reason="vec3 artifact not present")
def test_vec3_quality_50k_anchored():
    from vqvdb_tpu.train.synthetic import velocity_grid

    rep = _family_eval(velocity_grid, VEC3_MODEL, (1000,))
    assert rep["num_blocks"] > 300
    assert rep["psnr_mean"] > 35.5, f"vec3 mean {rep['psnr_mean']:.2f} dB"
    assert rep["psnr_p5"] > 26.0, f"vec3 p5 {rep['psnr_p5']:.2f} dB"


VEC3_RVQ2_MODEL = MODEL.parent / "vec3_rvq2.vqmodel"

# Vec3 residual-VQ tier (S=2, packed encoder, 10x pools). Leading-seed
# anchor: 387 blocks mean 42.07 p5 31.06 (50k TPU-bf16 judge: 40.27 /
# 30.11, benchmarks/arch10x_e_r4.json) — strictly above the vec3
# flagship gate again (+4.3 dB). Floors leave ~2 dB retrain headroom.


@pytest.mark.slow
@pytest.mark.skipif(not VEC3_RVQ2_MODEL.exists(),
                    reason="vec3 rvq2 artifact not present")
def test_vec3_rvq2_tier_beats_flagship():
    from vqvdb_tpu.train.synthetic import velocity_grid

    rep = _family_eval(velocity_grid, VEC3_RVQ2_MODEL, (1000,))
    assert rep["num_blocks"] > 300
    assert rep["psnr_mean"] > 40.0, f"vec3 rvq2 mean {rep['psnr_mean']:.2f}"
    assert rep["psnr_p5"] > 29.0, f"vec3 rvq2 p5 {rep['psnr_p5']:.2f}"


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

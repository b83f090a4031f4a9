"""`vqvdb verify` — archive integrity + round-trip fidelity audit.

The structural checks cover invariants the format implies but the stream
reader never enforces (lattice-aligned origins, unique origins, in-range
codebook indices, finite residual scales); the round-trip checks cover the
v6 residual tier's stored error bound, which must hold for an UNTRAINED
model because the correction is measured against the same decode executable
(runtime/residual.py).
"""

import json

import jax
import numpy as np

from vqvdb_tpu.cli import main as cli_main
from vqvdb_tpu.core.artifact import save_model
from vqvdb_tpu.core.config import CodecConfig, ModelConfig
from vqvdb_tpu.format.verify import verify_container, verify_roundtrip
from vqvdb_tpu.format.vqvdb import GridMetadata, VqvdbWriter
from vqvdb_tpu.models import init_vqvae_params
from vqvdb_tpu.runtime.codec import VQCodec
from vqvdb_tpu.train.synthetic import smoke_grid
from vqvdb_tpu.vdb.grid import LeafGrid


def _codec(batch=128):
    mcfg = ModelConfig(embedding_dim=32, num_embeddings=64)
    params = init_vqvae_params(jax.random.key(0), mcfg)
    return VQCodec(params, mcfg,
                   CodecConfig(batch_size=batch, compute_dtype="float32"))


def _lattice_origins(n):
    side = int(np.ceil(n ** (1 / 3)))
    o = np.stack(np.unravel_index(np.arange(n), (side,) * 3), 1)
    return (o * 8).astype(np.int32)


def _write_raw(path, indices, origins, *, num_embeddings=256, version=3,
               scales=None, residual=None, residual_mode=0, channels=0):
    meta = GridMetadata(
        "g", num_embeddings=num_embeddings,
        latent_shape=tuple(indices.shape[1:]),
        total_blocks=indices.shape[0], residual_mode=residual_mode,
        residual_channels=channels)
    with VqvdbWriter(path, version=version) as w:
        w.start_grid(meta)
        if residual_mode:
            w.write_batch(indices, origins, scales, residual)
        else:
            w.write_batch(indices, origins)
        w.end_grid()


def test_container_clean(tmp_path):
    n = 20
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 256, (n, 4, 4, 4)).astype(np.uint8)
    path = tmp_path / "ok.vqvdb"
    _write_raw(path, idx, _lattice_origins(n))
    rep = verify_container(path)
    assert rep["ok"], rep
    (g,) = rep["grids"]
    assert g["leaves"] == g["declared_leaves"] == n
    assert g["issues"] == []
    assert g["residual"] == "none" and g["codec"] is None


def test_container_flags_bad_origins_and_indices(tmp_path):
    n = 8
    idx = np.full((n, 4, 4, 4), 200, np.uint8)  # >= num_embeddings=64
    origins = _lattice_origins(n)
    origins[2] = origins[1]  # duplicate
    origins[5, 0] += 3  # off-lattice
    path = tmp_path / "bad.vqvdb"
    _write_raw(path, idx, origins, num_embeddings=64)
    rep = verify_container(path)
    assert not rep["ok"]
    issues = " | ".join(rep["grids"][0]["issues"])
    assert "duplicate" in issues
    assert "lattice" in issues
    assert "num_embeddings" in issues


def test_container_reports_truncation_instead_of_raising(tmp_path):
    n = 30
    idx = np.zeros((n, 4, 4, 4), np.uint8)
    path = tmp_path / "t.vqvdb"
    _write_raw(path, idx, _lattice_origins(n))
    raw = path.read_bytes()
    path.write_bytes(raw[:-40])
    rep = verify_container(path)
    assert not rep["ok"]
    assert "error" in rep

    garbage = tmp_path / "g.vqvdb"
    garbage.write_bytes(b"NOTVQ" + raw[5:])
    rep = verify_container(garbage)
    assert not rep["ok"] and "error" in rep


def test_container_flags_bad_residual_scales(tmp_path):
    n = 6
    rng = np.random.default_rng(1)
    idx = rng.integers(0, 256, (n, 4, 4, 4)).astype(np.uint8)
    scales = np.full(n, 1e-3, np.float32)
    scales[3] = np.nan
    residual = rng.integers(-127, 128, (n, 512)).astype(np.int8)
    path = tmp_path / "r.vqvdb"
    _write_raw(path, idx, _lattice_origins(n), version=6, scales=scales,
               residual=residual, residual_mode=1, channels=1)
    rep = verify_container(path)
    assert not rep["ok"]
    assert any("scale" in s for s in rep["grids"][0]["issues"])


def test_roundtrip_clean_and_v6_bound(tmp_path):
    codec = _codec()
    g = smoke_grid(48, seed=3)
    path = tmp_path / "s.vqvdb"
    codec.compress(g, path, residual="int8")

    rep = verify_roundtrip(path, codec, [g])
    assert rep["ok"], rep
    (row,) = rep["grids"]
    assert row["matched_leaves"] == g.num_leaves
    assert row["source_only_leaves"] == 0 and row["file_only_leaves"] == 0
    assert row["bound_ok"]
    assert row["max_abs_err"] <= row["residual_bound"] * (1 + 1e-4) + 1e-9
    assert np.isfinite(row["psnr_db"])


def test_roundtrip_on_corrupt_archive_reports_instead_of_raising(tmp_path):
    # The exact input an audit tool exists for: a truncated archive must
    # yield the container diagnosis and skip decoding, not re-raise the
    # reader's FormatError as a stack trace.
    codec = _codec()
    g = smoke_grid(48, seed=4)
    path = tmp_path / "trunc.vqvdb"
    codec.compress(g, path, residual="int8")
    path.write_bytes(path.read_bytes()[:-64])

    rep = verify_roundtrip(path, codec, [g])
    assert not rep["ok"]
    assert rep["grids"] == []
    assert "error" in rep["integrity"]


def test_roundtrip_lossless_match_emits_json_safe_psnr(tmp_path):
    # mse == 0 maps to psnr_db null (Infinity is not strict JSON); the
    # lossless case is real: audit a file against its own decode.
    codec = _codec()
    g = smoke_grid(48, seed=5)
    path = tmp_path / "l.vqvdb"
    codec.compress(g, path)
    (dec,), _ = codec.decompress(path)
    rep = verify_roundtrip(path, codec, [dec])
    assert rep["ok"], rep
    (row,) = rep["grids"]
    assert row["mse"] == 0.0 and row["psnr_db"] is None
    json.dumps(rep, allow_nan=False)  # strict-JSON clean


def test_roundtrip_detects_divergence(tmp_path):
    codec = _codec()
    g = smoke_grid(48, seed=3)
    path = tmp_path / "s.vqvdb"
    codec.compress(g, path, residual="int8")

    # A tampered source violates the stored bound.
    bad = LeafGrid(g.name, g.origins, g.leaves + 0.25,
                   transform=g.transform)
    rep = verify_roundtrip(path, codec, [bad])
    assert not rep["ok"]
    assert not rep["grids"][0]["bound_ok"]

    # A renamed source means the file's grid has no counterpart.
    renamed = LeafGrid("other", g.origins, g.leaves, transform=g.transform)
    rep = verify_roundtrip(path, codec, [renamed])
    assert not rep["ok"]
    names = {r["name"]: r for r in rep["grids"]}
    assert "no source grid" in names[g.name]["issues"][0]
    assert "missing from the file" in names["other"]["issues"][0]

    # A source missing a leaf is reported (coverage), not failed.
    subset = LeafGrid(g.name, g.origins[1:], g.leaves[1:],
                      transform=g.transform)
    rep = verify_roundtrip(path, codec, [subset])
    (row,) = rep["grids"]
    assert row["file_only_leaves"] == 1
    assert not rep["ok"]


def test_cli_verify(tmp_path, capsys):
    codec = _codec()
    g = smoke_grid(48, seed=5)
    src = tmp_path / "src.npy"
    g.save_npy(src)
    model = tmp_path / "m.vqmodel"
    save_model(model, codec.params, codec.mcfg)
    path = tmp_path / "s.vqvdb"
    codec.compress(g, path, residual="int8")

    assert cli_main(["verify", str(path)]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["ok"] and out["grids"][0]["issues"] == []

    rc = cli_main(["verify", str(path), "--against", str(src),
                   "--model", str(model), "--batch-size", "128",
                   "--compute-dtype", "float32"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0 and out["ok"]
    assert out["grids"][0]["bound_ok"]

    raw = path.read_bytes()
    path.write_bytes(raw[:-20])
    assert cli_main(["verify", str(path)]) == 1

    assert cli_main(["verify", str(path), "--against", str(src)]) == 2


def test_cli_verify_sequence_dir(tmp_path, capsys):
    codec = _codec()
    seq = tmp_path / "seq"
    seq.mkdir()
    for i in range(3):
        codec.compress(smoke_grid(40, seed=10 + i),
                       seq / f"frame_{i:04d}.vqvdb")
    assert cli_main(["verify", str(seq)]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["ok"] and len(out["files"]) == 3

    bad = seq / "frame_0001.vqvdb"
    bad.write_bytes(bad.read_bytes()[:-10])
    assert cli_main(["verify", str(seq)]) == 1
    out = json.loads(capsys.readouterr().out)
    assert not out["ok"]
    assert sum(not f["ok"] for f in out["files"]) == 1

    # --against is a single-archive operation.
    assert cli_main(["verify", str(seq), "--against", "x"]) == 2
    capsys.readouterr()

"""Animated sequence encode/decode: per-frame files, reused compiled codec."""

import numpy as np

import jax

from vqvdb_tpu import api
from vqvdb_tpu.core.config import CodecConfig, ModelConfig
from vqvdb_tpu.models import init_vqvae_params
from vqvdb_tpu.runtime.codec import VQCodec
from vqvdb_tpu.train.synthetic import smoke_grid


def test_sequence_roundtrip(tmp_path):
    cfg = ModelConfig(embedding_dim=32, num_embeddings=64)
    codec = VQCodec(init_vqvae_params(jax.random.key(0), cfg), cfg,
                    CodecConfig(batch_size=32, compute_dtype="float32"))

    frames = [smoke_grid(24, seed=10 + i) for i in range(4)]
    stats = api.encode_sequence(frames, codec, tmp_path / "seq")
    assert stats["frames"] == 4
    assert stats["leaves"] == sum(f.num_leaves for f in frames)
    assert len(list((tmp_path / "seq").glob("frame_*.vqvdb"))) == 4
    # steady-state frames should not be slower than the first (compile reuse)
    assert min(stats["seconds_per_frame"]) <= stats["seconds_per_frame"][0] * 1.5

    decoded, dstats = api.decode_sequence(tmp_path / "seq", codec)
    assert dstats["frames"] == 4
    for frame, orig in zip(decoded, frames):
        assert frame[0].num_leaves == orig.num_leaves
        np.testing.assert_array_equal(frame[0].origins, orig.origins)


def test_cli_sequence_roundtrip(tmp_path, capsys):
    """encode-seq / decode-seq CLI over per-frame .vdb assets."""
    import json

    from vqvdb_tpu.cli import main as cli_main
    from vqvdb_tpu.core.artifact import save_model
    from vqvdb_tpu.vdb.openvdb_io import write_vdb_leafgrids

    cfg = ModelConfig(embedding_dim=32, num_embeddings=64)
    model_path = tmp_path / "m.vqmodel"
    save_model(model_path, init_vqvae_params(jax.random.key(0), cfg), cfg)

    in_dir = tmp_path / "frames"
    in_dir.mkdir()
    originals = []
    for i in range(3):
        g = smoke_grid(24, seed=40 + i)
        g.name = "density"
        write_vdb_leafgrids(in_dir / f"f{i}.vdb", [g])
        originals.append(g)

    seq_dir = tmp_path / "seq"
    rc = cli_main(["encode-seq", str(in_dir), str(seq_dir),
                   "--model", str(model_path), "--batch-size", "32",
                   "--compute-dtype", "float32"])
    assert rc == 0
    enc = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert enc["frames"] == 3
    assert enc["leaves"] == sum(g.num_leaves for g in originals)
    assert sorted(p.name for p in seq_dir.glob("*.vqvdb")) == [
        f"frame_{i:04d}.vqvdb" for i in range(3)]

    out_dir = tmp_path / "recon"
    rc = cli_main(["decode-seq", str(seq_dir), str(out_dir),
                   "--model", str(model_path), "--batch-size", "32",
                   "--compute-dtype", "float32", "--vdb"])
    assert rc == 0
    dec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert dec["frames"] == 3
    from vqvdb_tpu.vdb.openvdb_io import read_vdb_leafgrids

    for i, g in enumerate(originals):
        (r,) = read_vdb_leafgrids(out_dir / f"frame_{i:04d}.vdb")
        assert r.name == "density"
        np.testing.assert_array_equal(np.sort(r.origins, axis=0),
                                      np.sort(g.origins, axis=0))


def test_sequence_residual_tier(tmp_path):
    """encode_sequence(residual=...) writes v6 frames; decode_sequence
    returns near-original leaves even with an untrained model."""
    from vqvdb_tpu.format.vqvdb import VqvdbReader
    from vqvdb_tpu.vdb.grid import psnr

    cfg = ModelConfig(embedding_dim=32, num_embeddings=64)
    codec = VQCodec(init_vqvae_params(jax.random.key(2), cfg), cfg,
                    CodecConfig(batch_size=32, compute_dtype="float32"))
    frames = [smoke_grid(24, seed=60 + i) for i in range(2)]
    api.encode_sequence(frames, codec, tmp_path / "seq", residual="int8",
                        compression="lz4")
    with VqvdbReader(tmp_path / "seq" / "frame_0000.vqvdb") as r:
        assert r.version == 6
        assert r.next_grid_metadata().residual_mode == 1
    decoded, _ = api.decode_sequence(tmp_path / "seq", codec)
    for frame, orig in zip(decoded, frames):
        assert psnr(frame[0].leaves, orig.leaves) > 45.0

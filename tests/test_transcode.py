"""Container transcoding: model-free re-framing between versions, payload
codecs, and fidelity tiers (format/transcode.py)."""

import json

import numpy as np
import pytest

from vqvdb_tpu.cli import main as cli_main
from vqvdb_tpu.format.transcode import transcode
from vqvdb_tpu.format.vqvdb import (
    FormatError,
    GridMetadata,
    VqvdbReader,
    VqvdbWriter,
)


def _origins(n):
    side = int(np.ceil(n ** (1 / 3)))
    o = np.stack(np.unravel_index(np.arange(n), (side,) * 3), 1)
    return (o * 8).astype(np.int32)


def _write_plain(path, n=50, k=256, version=3, names=("g",), seed=0):
    rng = np.random.default_rng(seed)
    dtype = np.uint8 if k <= 256 else np.uint16
    per = {}
    with VqvdbWriter(path, version=version) as w:
        for name in names:
            idx = rng.integers(0, k, (n, 4, 4, 4)).astype(dtype)
            org = _origins(n)
            w.start_grid(GridMetadata(name, num_embeddings=k,
                                      latent_shape=(4, 4, 4), total_blocks=n))
            w.write_batch(idx, org)
            w.end_grid()
            per[name] = (idx, org)
    return per


def _read_all(path):
    out = {}
    with VqvdbReader(path) as r:
        while r.has_next_grid():
            meta = r.next_grid_metadata()
            idx, org, sc, res = [], [], [], []
            while r.has_next():
                i, o, s, q = r.next_batch_residual(17)
                idx.append(i)
                org.append(o)
                if s is not None:
                    sc.append(s)
                if q is not None:
                    res.append(q)
            out[meta.name] = (meta, np.concatenate(idx), np.concatenate(org),
                              np.concatenate(sc) if sc else None,
                              np.concatenate(res) if res else None)
    return out


@pytest.mark.parametrize("src_ver,dst_ver,codec", [
    (3, 5, "zlib"), (3, 5, "lz4"), (5, 3, "zlib"), (3, 4, "zlib"),
    (5, 5, "lzma"), (3, 6, "lz4"), (4, 5, "zlib"),
])
def test_version_matrix_round_trip(tmp_path, src_ver, dst_ver, codec):
    src = tmp_path / "src.vqvdb"
    per = _write_plain(src, version=src_ver)
    dst = tmp_path / "dst.vqvdb"
    stats = transcode(src, dst, version=dst_ver, compression=codec)
    assert stats["grids"] == 1 and stats["leaves"] == 50
    with VqvdbReader(dst) as r:
        assert r.version == dst_ver
    (meta, idx, org, sc, res) = _read_all(dst)["g"]
    np.testing.assert_array_equal(idx, per["g"][0])
    np.testing.assert_array_equal(org, per["g"][1])
    assert sc is None and res is None


def test_keep_version_and_u16(tmp_path):
    src = tmp_path / "s.vqvdb"
    per = _write_plain(src, k=4096, version=4)
    dst = tmp_path / "d.vqvdb"
    transcode(src, dst)  # version=None keeps v4
    with VqvdbReader(dst) as r:
        assert r.version == 4
        meta = r.next_grid_metadata()
        assert meta.index_bytes == 2
        idx, _ = r.next_batch(50)
    np.testing.assert_array_equal(idx, per["g"][0])

    with pytest.raises(FormatError):  # u16 indices cannot land in v3
        transcode(src, tmp_path / "bad.vqvdb", version=3)


def test_residual_preserved_and_dropped(tmp_path):
    rng = np.random.default_rng(1)
    n = 33
    idx = rng.integers(0, 256, (n, 4, 4, 4)).astype(np.uint8)
    org = _origins(n)
    sc = rng.random(n).astype(np.float32)
    res = rng.integers(-127, 128, (n, 512)).astype(np.int8)
    src = tmp_path / "res.vqvdb"
    with VqvdbWriter(src, version=6) as w:
        w.start_grid(GridMetadata("g", num_embeddings=256,
                                  latent_shape=(4, 4, 4), total_blocks=n,
                                  residual_mode=1, residual_channels=1))
        w.write_batch(idx, org, sc, res)
        w.end_grid()

    # v6 -> v6 (codec change): residual stream preserved bit-exact
    kept = tmp_path / "kept.vqvdb"
    transcode(src, kept, compression="lz4")
    meta, i2, o2, s2, r2 = _read_all(kept)["g"]
    assert meta.residual_mode == 1
    np.testing.assert_array_equal(i2, idx)
    np.testing.assert_array_equal(s2, sc)
    np.testing.assert_array_equal(r2, res)

    # downgrade without confirmation: refused
    with pytest.raises(FormatError):
        transcode(src, tmp_path / "x.vqvdb", version=5)

    # explicit drop: plain v5
    lossy = tmp_path / "lossy.vqvdb"
    transcode(src, lossy, version=5, drop_residual=True)
    meta, i3, _, s3, r3 = _read_all(lossy)["g"]
    assert meta.residual_mode == 0 and s3 is None and r3 is None
    np.testing.assert_array_equal(i3, idx)
    assert lossy.stat().st_size < src.stat().st_size / 2


def test_grid_selection(tmp_path):
    src = tmp_path / "multi.vqvdb"
    per = _write_plain(src, names=("a", "b", "c"))
    dst = tmp_path / "only_b.vqvdb"
    stats = transcode(src, dst, grids="b")
    assert stats["grids"] == 1
    got = _read_all(dst)
    assert list(got) == ["b"]
    np.testing.assert_array_equal(got["b"][1], per["b"][0])

    with pytest.raises(FormatError):
        transcode(src, tmp_path / "none.vqvdb", grids="zzz")
    assert not (tmp_path / "none.vqvdb").exists()


def test_cli_transcode(tmp_path, capsys):
    src = tmp_path / "s.vqvdb"
    per = _write_plain(src, version=3)
    dst = tmp_path / "d.vqvdb"
    rc = cli_main(["transcode", str(src), str(dst),
                   "--format-version", "5", "--v5-codec", "lz4"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["grids"] == 1 and stats["bytes_out"] > 0
    got = _read_all(dst)["g"]
    np.testing.assert_array_equal(got[1], per["g"][0])

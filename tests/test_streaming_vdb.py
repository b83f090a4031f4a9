"""Bounded-memory .vdb ingestion (vdb.openvdb_io.open_vdb_leaf_streams +
VQCodec.compress_stream) — VERDICT r3 item 5.

The oracle is the materializing path: streamed leaves must equal
read_vdb's, and a streamed encode must produce a BYTE-IDENTICAL .vqvdb.
The slow test proves the memory property itself: encoding a .vdb whose
leaf payload alone is several times the allowed RSS budget, measured in a
subprocess against a small-file baseline.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax

from vqvdb_tpu.core.config import CodecConfig, ModelConfig
from vqvdb_tpu.models import init_vqvae_params
from vqvdb_tpu.runtime.codec import VQCodec
from vqvdb_tpu.vdb.openvdb_io import (
    VdbGrid,
    VdbTile,
    open_vdb_leaf_streams,
    read_vdb,
    read_vdb_leafgrids,
    write_vdb,
)

REPO = Path(__file__).resolve().parent.parent


def _grid(rng, n=150, name="density", comps=1, tiles=()):
    shape = (n, 8, 8, 8) + ((comps,) if comps > 1 else ())
    side = int(np.ceil(n ** (1 / 3)))
    origins = (np.stack(np.unravel_index(np.arange(n), (side,) * 3), 1)
               * 8).astype(np.int32)
    leaves = rng.random(shape).astype(np.float32)
    leaves[leaves < 0.3] = 0.0  # compressible runs + inactive voxels
    masks = np.full((n, 64), 0xFF, np.uint8)
    return VdbGrid(name=name, value_type="float" if comps == 1 else "vec3s",
                   origins=origins, leaves=leaves, leaf_masks=masks,
                   tiles=list(tiles))


@pytest.mark.parametrize("comps,half", [(1, False), (1, True), (3, False)])
def test_stream_matches_read_vdb(tmp_path, rng, comps, half):
    g = _grid(rng, n=73, comps=comps)
    path = tmp_path / "s.vdb"
    write_vdb(path, [g], half=half)
    (full,) = read_vdb(path)
    (stream,) = open_vdb_leaf_streams(path)
    assert stream.num_leaves == full.num_leaves
    np.testing.assert_array_equal(stream.origins, full.origins)
    got = np.concatenate(list(stream.leaf_batches(16)))
    want = full.leaves.reshape(got.shape)
    np.testing.assert_array_equal(got, want)
    # Batches are bounded by the requested size.
    assert max(b.shape[0] for b in stream.leaf_batches(16)) <= 16


def test_stream_tile_leaves_and_filter(tmp_path, rng):
    tile = VdbTile(np.array([64, 0, 0], np.int32), 8,
                   np.float32(0.25), True)
    big_tile = VdbTile(np.array([128, 0, 0], np.int32), 128,
                       np.float32(1.0), True)
    g = _grid(rng, n=9, tiles=[tile, big_tile])
    g2 = _grid(rng, n=5, name="other")
    path = tmp_path / "t.vdb"
    write_vdb(path, [g, g2])
    streams = open_vdb_leaf_streams(path)
    assert [s.name for s in streams] == ["density", "other"]
    s = streams[0]
    assert s.num_leaves == 10  # 9 buffers + 1 leaf-span tile
    assert s.dropped_tiles == 1
    got = np.concatenate(list(s.leaf_batches(4)))
    assert np.all(got[-1] == 0.25)
    # Name filter skips other grids' payloads.
    only = open_vdb_leaf_streams(path, names="other")
    assert len(only) == 1 and only[0].name == "other"


def test_streamed_encode_byte_identical(tmp_path, rng):
    """compress_stream(vdb stream) == compress(read_vdb grids), byte for
    byte — for v3 and for the v6 residual tier (which re-reads each chunk
    for the error computation)."""
    g = _grid(rng, n=90)
    path = tmp_path / "e.vdb"
    write_vdb(path, [g])
    mcfg = ModelConfig()
    params = init_vqvae_params(jax.random.key(0), mcfg)
    codec = VQCodec(params, mcfg,
                    CodecConfig(batch_size=16, compute_dtype="float32"))
    grids = read_vdb_leafgrids(path)
    streams = open_vdb_leaf_streams(path)
    for kw in ({}, {"residual": "int8"}, {"format_version": 5}):
        a, b = tmp_path / "a.vqvdb", tmp_path / "b.vqvdb"
        codec.compress(grids, a, **kw)
        codec.compress_stream(streams, b, **kw)
        assert a.read_bytes() == b.read_bytes(), f"differs for {kw}"


def _mapping_rss_kib(path: Path) -> int:
    """Resident KiB of OUR mmap of `path`, from /proc/self/smaps."""
    rss, in_map = 0, False
    with open("/proc/self/smaps") as f:
        for line in f:
            if line[0].isdigit() or line[0] in "abcdef":
                in_map = line.rstrip().endswith(str(path))
            elif in_map and line.startswith("Rss:"):
                rss += int(line.split()[1])
    return rss


@pytest.mark.skipif(not os.path.exists("/proc/self/smaps"),
                    reason="needs Linux smaps")
def test_stream_drops_consumed_pages(tmp_path, rng):
    """Default-suite memory gate (the round-4 slow-only RSS test let a
    broken bound ship): after draining leaf_batches, the file mapping's
    own resident size must be O(batch), not O(file) — leaf_batches
    madvises consumed pages away behind the read cursor."""
    n = 6_000  # ~12 MB of leaf payload
    g = _grid(rng, n=n)
    path = tmp_path / "pages.vdb"
    write_vdb(path, [g])
    file_kib = path.stat().st_size // 1024
    (stream,) = open_vdb_leaf_streams(path)
    for _ in stream.leaf_batches(64):
        pass
    rss = _mapping_rss_kib(path)
    # Headers + topology + the last unaligned batch; far below the file.
    assert rss < max(2_048, file_kib // 4), (rss, file_kib)


_RSS_RUNNER = """
import resource, sys
import jax
jax.config.update("jax_platforms", "cpu")
from vqvdb_tpu.core.config import CodecConfig, ModelConfig
from vqvdb_tpu.models import init_vqvae_params
from vqvdb_tpu.runtime.codec import VQCodec

small_vdb, big_vdb, out_dir = sys.argv[1], sys.argv[2], sys.argv[3]
from vqvdb_tpu.vdb.openvdb_io import open_vdb_leaf_streams
mcfg = ModelConfig()
params = init_vqvae_params(jax.random.key(0), mcfg)
codec = VQCodec(params, mcfg,
                CodecConfig(batch_size=256, compute_dtype="float32"))
# Warm pass over the SMALL scene: compiles the graphs and pushes the
# process high-water mark to its steady state. The subsequent big-scene
# increase is then a clean materialization signal — comparing ru_maxrss
# across two separate processes carries jax/allocator noise of the same
# order as the bound (the round-5 flake).
codec.compress_stream(open_vdb_leaf_streams(small_vdb),
                      out_dir + "/small.vqvdb")
base = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB on Linux
codec.compress_stream(open_vdb_leaf_streams(big_vdb),
                      out_dir + "/big.vqvdb")
peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
print(base)
print(peak)
"""


@pytest.mark.slow
def test_streaming_encode_bounded_rss(tmp_path, rng):
    """Peak RSS of a streamed encode must not scale with scene size: a
    scene with ~8x the leaf payload may add only a small constant over the
    small-scene baseline (topology + batches), nowhere near the ~340 MB
    the big scene's leaves would cost if materialized."""
    small, big = 6_000, 60_000  # leaves: ~12 MB vs ~123 MB of payload

    def make(n, tag):
        path = tmp_path / f"{tag}.vdb"
        # Constant-ish leaves keep write memory low and files small.
        side = int(np.ceil(n ** (1 / 3)))
        origins = (np.stack(
            np.unravel_index(np.arange(n), (side,) * 3), 1) * 8
        ).astype(np.int32)
        leaves = np.zeros((n, 8, 8, 8), np.float32)
        leaves[:, ::2] = rng.random((n, 4, 8, 8)).astype(np.float32)
        write_vdb(path, [VdbGrid(name="d", value_type="float",
                                 origins=origins, leaves=leaves)])
        return path

    p_small, p_big = make(small, "small"), make(big, "big")
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c", _RSS_RUNNER, str(p_small), str(p_big),
         str(tmp_path)],
        env=env, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-3000:]
    rss_small, rss_big = map(int, out.stdout.strip().splitlines()[-2:])
    # 10x the payload; allow 60 MB of slack (topology arrays, allocator
    # noise) — full materialization would add ~110 MB for leaves alone,
    # plus the file read. Both marks come from ONE process (warm small
    # pass first) so the jax/compile baseline cancels exactly.
    assert rss_big - rss_small < 60_000, (rss_small, rss_big)

"""OpenVDB .vdb container tests.

Same methodology as the .vqvdb golden-byte suite (tests/test_format.py):
the writer and reader are derived independently from the published OpenVDB
file format, so write->read round trips plus structure-level byte fixtures
establish correctness without a ground-truth binary.
"""

import numpy as np
import pytest

from vqvdb_tpu.utils.errors import FormatError
from vqvdb_tpu.vdb.openvdb_io import (
    COMPRESS_ACTIVE_MASK,
    COMPRESS_BLOSC,
    COMPRESS_NONE,
    COMPRESS_ZIP,
    FILE_VERSION,
    OPENVDB_MAGIC,
    VdbGrid,
    VdbTile,
    leafgrid_to_vdbgrid,
    read_vdb,
    read_vdb_leafgrids,
    vdbgrid_to_leafgrid,
    write_vdb,
    write_vdb_leafgrids,
)

ALL_COMPRESSIONS = [
    COMPRESS_NONE,
    COMPRESS_ZIP,
    COMPRESS_ACTIVE_MASK,
    COMPRESS_ZIP | COMPRESS_ACTIVE_MASK,
]


def _random_grid(rng, n_leaves=13, value_type="float", masked=False,
                 background=0.0, name="density"):
    comps = 1 if value_type == "float" else 3
    # Random distinct origins, including negatives, spread over several
    # internal nodes (span 128) and root children (span 4096).
    pool = rng.choice(40, size=(4 * n_leaves, 3), replace=True) * 8 - 160
    pool[n_leaves // 2 :, 0] += 4096  # force a second root child
    origins = np.unique(pool, axis=0)[:n_leaves].astype(np.int32)
    shape = (len(origins), 8, 8, 8) + ((comps,) if comps > 1 else ())
    leaves = rng.random(shape, np.float32)
    masks = None
    if masked:
        masks = rng.integers(0, 256, (len(origins), 64), dtype=np.uint8)
        masks[:, 0] |= 1  # ensure at least one active voxel per leaf
    return VdbGrid(
        name=name, value_type=value_type, origins=origins, leaves=leaves,
        leaf_masks=masks, background=background if comps == 1
        else np.full(3, background, np.float32))


@pytest.mark.parametrize("compression", ALL_COMPRESSIONS)
@pytest.mark.parametrize("value_type", ["float", "vec3s"])
def test_roundtrip_active_leaves(tmp_path, rng, compression, value_type):
    """Fully-active leaves survive any compression mode bit-exactly."""
    g = _random_grid(rng, value_type=value_type)
    path = tmp_path / "g.vdb"
    write_vdb(path, [g], compression=compression)
    (r,) = read_vdb(path)
    assert r.name == g.name and r.value_type == value_type
    order = np.lexsort(g.origins.T[::-1])
    rorder = np.lexsort(r.origins.T[::-1])
    np.testing.assert_array_equal(r.origins[rorder], g.origins[order])
    np.testing.assert_array_equal(r.leaves[rorder], g.leaves[order])
    np.testing.assert_array_equal(r.leaf_masks, 0xFF)


@pytest.mark.parametrize("compression",
                         [COMPRESS_NONE, COMPRESS_ZIP | COMPRESS_ACTIVE_MASK])
def test_roundtrip_partial_masks(tmp_path, rng, compression):
    """Random value masks: active voxels always survive; without mask
    compression inactive voxel values survive too."""
    g = _random_grid(rng, masked=True)
    path = tmp_path / "g.vdb"
    write_vdb(path, [g], compression=compression)
    (r,) = read_vdb(path)
    order = np.lexsort(g.origins.T[::-1])
    rorder = np.lexsort(r.origins.T[::-1])
    np.testing.assert_array_equal(r.leaf_masks[rorder], g.leaf_masks[order])
    act = np.unpackbits(g.leaf_masks[order], bitorder="little").astype(bool)
    got = r.leaves[rorder].reshape(len(r.origins), 512)
    want = g.leaves[order].reshape(len(g.origins), 512)
    act = act.reshape(len(g.origins), 512)
    np.testing.assert_array_equal(got[act], want[act])
    if not (compression & COMPRESS_ACTIVE_MASK):
        np.testing.assert_array_equal(got, want)


def test_mask_compression_inactive_reconstruction(tmp_path):
    """Each per-node metadata code path reconstructs inactive voxels as the
    format specifies (background / -background / stored values + mask)."""
    bg = 2.0
    cases = {
        # leaf values for inactive voxels -> expected reconstruction
        "plus_bg": (np.float32(bg), bg),
        "minus_bg": (np.float32(-bg), -bg),
        "one_val": (np.float32(7.5), 7.5),
    }
    for name, (fill, expect) in cases.items():
        leaves = np.full((1, 8, 8, 8), 9.0, np.float32)
        flat = leaves.reshape(512)
        flat[256:] = fill  # voxels 256.. inactive
        masks = np.zeros((1, 64), np.uint8)
        masks[0, :32] = 0xFF
        g = VdbGrid(name=name, value_type="float",
                    origins=np.zeros((1, 3), np.int32), leaves=leaves,
                    leaf_masks=masks, background=bg)
        path = f"/tmp/{name}.vdb"
        write_vdb(path, [g],
                  compression=COMPRESS_ZIP | COMPRESS_ACTIVE_MASK)
        (r,) = read_vdb(path)
        got = r.leaves.reshape(512)
        np.testing.assert_array_equal(got[:256], 9.0)
        np.testing.assert_allclose(got[256:], expect)


def test_mask_compression_two_inactive_vals(tmp_path):
    bg = 1.0
    leaves = np.full((1, 8, 8, 8), 5.0, np.float32)
    flat = leaves.reshape(512)
    flat[128:320] = 3.25   # inactive value A
    flat[320:] = -8.5      # inactive value B
    masks = np.zeros((1, 64), np.uint8)
    masks[0, :16] = 0xFF   # voxels 0..127 active
    g = VdbGrid(name="two", value_type="float",
                origins=np.zeros((1, 3), np.int32), leaves=leaves,
                leaf_masks=masks, background=bg)
    path = tmp_path / "two.vdb"
    write_vdb(path, [g], compression=COMPRESS_ZIP | COMPRESS_ACTIVE_MASK)
    (r,) = read_vdb(path)
    got = r.leaves.reshape(512)
    np.testing.assert_array_equal(got, flat)  # both values + selection mask


def test_many_distinct_inactive_vals_stored_verbatim(tmp_path, rng):
    """>2 distinct inactive values force NO_MASK_AND_ALL_VALS: everything
    survives even under mask compression."""
    leaves = rng.random((1, 8, 8, 8), np.float32)
    masks = np.zeros((1, 64), np.uint8)
    masks[0, ::2] = 0xAA
    g = VdbGrid(name="noisy", value_type="float",
                origins=np.zeros((1, 3), np.int32), leaves=leaves,
                leaf_masks=masks, background=0.0)
    path = tmp_path / "n.vdb"
    write_vdb(path, [g], compression=COMPRESS_ZIP | COMPRESS_ACTIVE_MASK)
    (r,) = read_vdb(path)
    np.testing.assert_array_equal(r.leaves, g.leaves)


def test_tiles_roundtrip_all_levels(tmp_path, rng):
    tiles = [
        VdbTile(np.array([4096, 0, 0], np.int32), 4096,
                np.float32(1.5), True),
        VdbTile(np.array([128, 0, 0], np.int32), 128, np.float32(2.5), True),
        VdbTile(np.array([8, 8, 0], np.int32), 8, np.float32(3.5), True),
    ]
    g = _random_grid(rng, n_leaves=4)
    g = VdbGrid(name=g.name, value_type="float", origins=g.origins,
                leaves=g.leaves, tiles=tiles, background=0.25)
    path = tmp_path / "t.vdb"
    write_vdb(path, [g])
    (r,) = read_vdb(path)
    assert float(np.asarray(r.background)) == 0.25
    got = sorted(((tuple(t.origin), t.span, float(np.asarray(t.value)),
                   t.active) for t in r.tiles))
    want = sorted(((tuple(t.origin), t.span, float(np.asarray(t.value)),
                    t.active) for t in tiles))
    assert got == want


def test_multiple_grids_and_duplicate_names(tmp_path, rng):
    g1 = _random_grid(rng, n_leaves=3, name="density")
    g2 = _random_grid(rng, n_leaves=5, name="density")
    g3 = _random_grid(rng, n_leaves=2, value_type="vec3s", name="v")
    path = tmp_path / "multi.vdb"
    write_vdb(path, [g1, g2, g3])
    grids = read_vdb(path)
    assert [g.name for g in grids] == ["density", "density", "v"]
    assert grids[1].num_leaves == 5 and grids[2].value_type == "vec3s"


def test_golden_header_bytes(tmp_path, rng):
    """Structure-level fixture: exact byte layout of the file header
    (derived from the published format, io/Archive serialization)."""
    g = _random_grid(rng, n_leaves=1, name="density")
    path = tmp_path / "h.vdb"
    write_vdb(path, [g])
    raw = path.read_bytes()
    assert int.from_bytes(raw[0:8], "little") == OPENVDB_MAGIC == 0x56444220
    assert raw[:4] == b" BDV"
    assert int.from_bytes(raw[8:12], "little") == FILE_VERSION == 224
    # library major/minor
    assert int.from_bytes(raw[12:16], "little") >= 1
    assert raw[20] == 1  # hasGridOffsets
    uuid_txt = raw[21:57].decode("ascii")
    assert uuid_txt[8] == uuid_txt[13] == uuid_txt[18] == uuid_txt[23] == "-"
    # file-level metadata count == 0, then grid count == 1
    assert int.from_bytes(raw[57:61], "little") == 0
    assert int.from_bytes(raw[61:65], "little") == 1
    # grid descriptor: name, type, instance parent
    name_len = int.from_bytes(raw[65:69], "little")
    assert raw[69 : 69 + name_len] == b"density"
    p = 69 + name_len
    tlen = int.from_bytes(raw[p : p + 4], "little")
    assert raw[p + 4 : p + 4 + tlen] == b"Tree_float_5_4_3"
    p += 4 + tlen
    assert int.from_bytes(raw[p : p + 4], "little") == 0  # no instance parent
    p += 4
    grid_pos, block_pos, end_pos = np.frombuffer(raw[p : p + 24], "<i8")
    assert grid_pos == p + 24
    assert p + 24 < block_pos < end_pos == len(raw)


@pytest.mark.parametrize("compression",
                         [COMPRESS_BLOSC, COMPRESS_BLOSC | COMPRESS_ACTIVE_MASK])
@pytest.mark.parametrize("value_type", ["float", "vec3s"])
def test_blosc_roundtrip_bit_exact_to_zip_twin(tmp_path, rng, compression,
                                               value_type):
    """Blosc-compressed files (the Houdini/blosc-OpenVDB default) decode
    bit-exact to their ZIP twins — the round-3 no-fallback gate."""
    g = _random_grid(rng, n_leaves=9, value_type=value_type, masked=True)
    bpath, zpath = tmp_path / "b.vdb", tmp_path / "z.vdb"
    write_vdb(bpath, [g], compression=compression)
    zip_twin = (compression & ~COMPRESS_BLOSC) | COMPRESS_ZIP
    write_vdb(zpath, [g], compression=zip_twin)
    (rb,), (rz,) = read_vdb(bpath), read_vdb(zpath)
    np.testing.assert_array_equal(rb.origins, rz.origins)
    np.testing.assert_array_equal(rb.leaves, rz.leaves)
    np.testing.assert_array_equal(rb.leaf_masks, rz.leaf_masks)
    # And the blosc file actually stores blosc chunks (smaller or equal).
    assert bpath.stat().st_size > 0


def test_blosc_compresses_smooth_volumes(tmp_path, rng):
    """On smooth (real-world-like) data blosc must actually shrink leaf
    buffers, not just pass through the raw fallback framing."""
    origins = (np.mgrid[0:4, 0:2, 0:2].reshape(3, -1).T * 8).astype(np.int32)
    x = np.linspace(0, 1, 8, dtype=np.float32)
    base = np.sin(4 * x)[:, None, None] * np.cos(3 * x)[None, :, None] + x
    leaves = np.stack([np.float32(base + 0.01 * k) for k in
                       range(len(origins))])
    g = VdbGrid(name="s", value_type="float", origins=origins, leaves=leaves)
    bpath, npath = tmp_path / "b.vdb", tmp_path / "n.vdb"
    write_vdb(bpath, [g], compression=COMPRESS_BLOSC | COMPRESS_ACTIVE_MASK)
    write_vdb(npath, [g], compression=COMPRESS_ACTIVE_MASK)
    assert bpath.stat().st_size < npath.stat().st_size
    (r,) = read_vdb(bpath)
    np.testing.assert_array_equal(
        r.leaves[np.lexsort(r.origins.T[::-1])],
        leaves[np.lexsort(origins.T[::-1])])


def test_blosc_unsupported_codec_clear_error(tmp_path, rng):
    """A blosc chunk with an unsupported inner codec (zstd) raises a clear
    FormatError instead of garbage."""
    import struct as _struct

    from vqvdb_tpu.vdb import blosc as _blosc

    g = _random_grid(rng, n_leaves=2)
    path = tmp_path / "b.vdb"
    write_vdb(path, [g], compression=COMPRESS_BLOSC | COMPRESS_ACTIVE_MASK)
    raw = bytearray(path.read_bytes())
    # Find a blosc chunk (version=2, versionlz=1, lz4 codec bits) and
    # rewrite its codec id to zstd.
    patched = False
    for i in range(len(raw) - 16):
        if raw[i] == 2 and raw[i + 1] == 1 and (raw[i + 2] >> 5) == 1:
            (cb,) = _struct.unpack_from("<I", raw, i + 12)
            if 16 <= cb <= len(raw) - i:
                try:
                    _blosc.decompress(bytes(raw[i : i + cb]))
                except FormatError:
                    continue
                raw[i + 2] = (raw[i + 2] & 0x1F) | (4 << 5)
                patched = True
                break
    assert patched, "no blosc chunk found to patch"
    bad = tmp_path / "bad.vdb"
    bad.write_bytes(bytes(raw))
    with pytest.raises(FormatError, match="zstd"):
        read_vdb(bad)


@pytest.mark.parametrize("compression",
                         [COMPRESS_ZIP | COMPRESS_ACTIVE_MASK,
                          COMPRESS_BLOSC | COMPRESS_ACTIVE_MASK])
def test_half_float_write_read(tmp_path, rng, compression):
    """write_vdb(half=True): values survive exactly as f32->f16->f32 (the
    format's f16 semantics), the descriptor carries _HalfFloat, and the
    file is substantially smaller than its full-float twin."""
    g = _random_grid(rng, n_leaves=11, masked=True, background=0.5)
    hpath, fpath = tmp_path / "h.vdb", tmp_path / "f.vdb"
    write_vdb(hpath, [g], compression=compression, half=True)
    write_vdb(fpath, [g], compression=compression, half=False)
    (rh,) = read_vdb(hpath)
    assert rh.saved_as_half
    order = np.lexsort(g.origins.T[::-1])
    rorder = np.lexsort(rh.origins.T[::-1])
    want = g.leaves[order].astype(np.float16).astype(np.float32)
    act = np.unpackbits(g.leaf_masks[order], bitorder="little"
                        ).astype(bool).reshape(-1, 8, 8, 8)
    np.testing.assert_array_equal(rh.leaves[rorder][act], want[act])


def test_half_file_half_the_size(tmp_path, rng):
    """With raw value framing the f16 file stores half the value bytes."""
    g = _random_grid(rng, n_leaves=11)
    hpath, fpath = tmp_path / "h.vdb", tmp_path / "f.vdb"
    write_vdb(hpath, [g], compression=COMPRESS_NONE, half=True)
    write_vdb(fpath, [g], compression=COMPRESS_NONE, half=False)
    assert hpath.stat().st_size < 0.6 * fpath.stat().st_size


def test_half_flag_roundtrips_by_default(tmp_path, rng):
    """half=None preserves each grid's saved_as_half through a
    read->write->read cycle (a re-save doesn't change precision mode)."""
    g = _random_grid(rng, n_leaves=3)
    p1, p2 = tmp_path / "a.vdb", tmp_path / "b.vdb"
    write_vdb(p1, [g], half=True)
    (r1,) = read_vdb(p1)
    write_vdb(p2, [r1])  # half=None -> follow r1.saved_as_half
    (r2,) = read_vdb(p2)
    assert r2.saved_as_half
    np.testing.assert_array_equal(r1.leaves, r2.leaves)


def test_half_vec3_roundtrip(tmp_path, rng):
    g = _random_grid(rng, n_leaves=4, value_type="vec3s", background=0.25)
    path = tmp_path / "v.vdb"
    write_vdb(path, [g], half=True)
    (r,) = read_vdb(path)
    np.testing.assert_array_equal(
        r.leaves[np.lexsort(r.origins.T[::-1])],
        g.leaves[np.lexsort(g.origins.T[::-1])].astype(np.float16
                                                       ).astype(np.float32))


def test_bad_magic_and_truncation(tmp_path, rng):
    g = _random_grid(rng, n_leaves=2)
    path = tmp_path / "x.vdb"
    write_vdb(path, [g])
    raw = bytearray(path.read_bytes())
    bad = tmp_path / "bad.vdb"
    bad.write_bytes(b"JUNK" + bytes(raw[4:]))
    with pytest.raises(FormatError, match="magic"):
        read_vdb(bad)
    for cut in (10, 60, len(raw) // 2, len(raw) - 3):
        t = tmp_path / f"t{cut}.vdb"
        t.write_bytes(bytes(raw[:cut]))
        with pytest.raises((FormatError, Exception)):
            read_vdb(t)


def test_fuzz_random_bytes_never_crash(tmp_path, rng):
    """Arbitrary corruption raises typed errors, never hangs/segfaults."""
    g = _random_grid(rng, n_leaves=3)
    path = tmp_path / "f.vdb"
    write_vdb(path, [g])
    raw = bytearray(path.read_bytes())
    for trial in range(20):
        corrupt = bytearray(raw)
        for _ in range(5):
            corrupt[rng.integers(8, len(raw))] = rng.integers(0, 256)
        t = tmp_path / "c.vdb"
        t.write_bytes(bytes(corrupt))
        try:
            read_vdb(t)
        except Exception as e:  # typed failure is fine; silence is not
            assert not isinstance(e, (SystemExit, KeyboardInterrupt))


def test_leafgrid_bridge_roundtrip(tmp_path, rng):
    from vqvdb_tpu.vdb.grid import LeafGrid

    dense = rng.random((32, 24, 16), np.float32)
    dense[dense < 0.6] = 0.0
    lg = LeafGrid.from_dense("density", dense)
    path = tmp_path / "lg.vdb"
    write_vdb_leafgrids(path, [lg])
    (back,) = read_vdb_leafgrids(path)
    order = np.lexsort(lg.origins.T[::-1])
    rorder = np.lexsort(back.origins.T[::-1])
    np.testing.assert_array_equal(back.origins[rorder], lg.origins[order])
    np.testing.assert_array_equal(back.leaves[rorder], lg.leaves[order])


def test_leaf_tile_materialization(rng):
    g = _random_grid(rng, n_leaves=2)
    g.tiles = [
        VdbTile(np.array([16, 0, 0], np.int32), 8, np.float32(4.0), True),
        VdbTile(np.array([128, 0, 0], np.int32), 128, np.float32(1.0), True),
    ]
    lg = vdbgrid_to_leafgrid(g)
    assert lg.num_leaves == g.num_leaves + 1  # 8-span tile became a leaf
    assert lg.dropped_tiles == 1              # 128-span tile reported dropped
    tile_leaf = lg.leaves[-1]
    np.testing.assert_array_equal(tile_leaf, 4.0)


def test_negative_coordinates(tmp_path, rng):
    origins = np.array([[-8, -16, -4096], [0, 0, 0], [-4096, 8, 8]], np.int32)
    leaves = rng.random((3, 8, 8, 8), np.float32)
    g = VdbGrid(name="n", value_type="float", origins=origins, leaves=leaves)
    path = tmp_path / "neg.vdb"
    write_vdb(path, [g])
    (r,) = read_vdb(path)
    order = np.lexsort(origins.T[::-1])
    rorder = np.lexsort(r.origins.T[::-1])
    np.testing.assert_array_equal(r.origins[rorder], origins[order])
    np.testing.assert_array_equal(r.leaves[rorder], leaves[order])


def test_transform_survives(tmp_path, rng):
    mat = np.eye(4)
    mat[0, 0] = mat[1, 1] = mat[2, 2] = 0.5
    mat[3, :3] = (1.0, 2.0, 3.0)
    g = _random_grid(rng, n_leaves=2)
    g.transform = mat
    path = tmp_path / "tr.vdb"
    write_vdb(path, [g])
    (r,) = read_vdb(path)
    np.testing.assert_array_equal(r.transform, mat)


def test_vec3_grid_scalar_background_default():
    """VdbGrid's 0.0 default background must broadcast for vec3s grids."""
    import numpy as np

    from vqvdb_tpu.vdb.openvdb_io import VdbGrid

    g = VdbGrid(name="v", value_type="vec3s",
                origins=np.zeros((1, 3), np.int32),
                leaves=np.zeros((1, 8, 8, 8, 3), np.float32))
    assert g.background.shape == (3,)
    np.testing.assert_array_equal(g.background, np.zeros(3, np.float32))

"""Native C++ host runtime vs numpy fallback: bit-identical behaviour."""

import numpy as np
import pytest

from vqvdb_tpu.runtime import native_io


requires_native = pytest.mark.skipif(
    native_io.backend() != "native", reason="native library not built")


def _numpy_only(monkeypatch):
    """Force the numpy fallback path."""
    monkeypatch.setattr(native_io, "_lib", None)
    monkeypatch.setattr(native_io, "_tried", True)


def test_interleave_deinterleave_roundtrip(rng):
    n, block = 97, 64
    origins = rng.integers(-(2**20), 2**20, (n, 3)).astype(np.int32)
    indices = rng.integers(0, 256, (n, block), dtype=np.uint8)
    raw = native_io.interleave(origins, indices)
    assert raw.shape == (n, 12 + block)
    got_idx, got_org = native_io.deinterleave(raw.tobytes(), block)
    np.testing.assert_array_equal(got_idx, indices)
    np.testing.assert_array_equal(got_org, origins)


@requires_native
def test_native_matches_numpy(rng, monkeypatch):
    n, block = 33, 64
    origins = rng.integers(-1000, 1000, (n, 3)).astype(np.int32)
    indices = rng.integers(0, 256, (n, block), dtype=np.uint8)
    native_raw = native_io.interleave(origins, indices)
    _numpy_only(monkeypatch)
    assert native_io.backend() == "numpy"
    numpy_raw = native_io.interleave(origins, indices)
    np.testing.assert_array_equal(native_raw, numpy_raw)


def test_gather_scatter_roundtrip(rng):
    dense = rng.random((24, 16, 8, 1), dtype=np.float32)
    lo = np.array([8, 0, -8], np.int32)
    origins = np.array([[8, 0, -8], [16, 8, -8], [24, 8, 0]], np.int32)
    # last origin is partially out of range -> background fill
    leaves = native_io.gather_leaves(dense, origins, lo, background=7.0)
    assert leaves.shape == (3, 8, 8, 8, 1)
    np.testing.assert_array_equal(leaves[0], dense[0:8, 0:8, 0:8])
    np.testing.assert_array_equal(leaves[1], dense[8:16, 8:16, 0:8])
    assert (leaves[2] == 7.0).all()  # fully outside

    back = native_io.scatter_leaves(leaves[:2], origins[:2], lo, (24, 16, 8))
    np.testing.assert_array_equal(back[0:8, 0:8, 0:8], dense[0:8, 0:8, 0:8])
    np.testing.assert_array_equal(back[8:16, 8:16, 0:8], dense[8:16, 8:16, 0:8])
    assert (back[16:24] == 0).all()  # untouched region = background


@requires_native
def test_gather_matches_numpy_fallback(rng, monkeypatch):
    dense = rng.random((16, 16, 16, 3), dtype=np.float32)
    lo = np.zeros(3, np.int32)
    origins = np.array([[0, 0, 0], [8, 8, 8], [4, 4, 4]], np.int32)  # unaligned too
    native_res = native_io.gather_leaves(dense, origins, lo)
    _numpy_only(monkeypatch)
    numpy_res = native_io.gather_leaves(dense, origins, lo)
    np.testing.assert_array_equal(native_res, numpy_res)


def test_multichannel_scatter(rng):
    leaves = rng.random((2, 8, 8, 8, 3), dtype=np.float32)
    origins = np.array([[0, 0, 0], [8, 0, 0]], np.int32)
    lo = np.zeros(3, np.int32)
    dense = native_io.scatter_leaves(leaves, origins, lo, (16, 8, 8))
    np.testing.assert_array_equal(dense[0:8], leaves[0])
    np.testing.assert_array_equal(dense[8:16], leaves[1])


def test_tsan_clean(tmp_path):
    """Build the TSan harness against the shipped native source and run it:
    the library's safety-by-disjointness threading claim, checked under
    ThreadSanitizer rather than argued in comments (SURVEY §5 race
    detection). Skips where gcc/libtsan is unavailable."""
    import shutil
    import subprocess
    from pathlib import Path

    gxx = shutil.which("g++")
    if gxx is None:
        pytest.skip("g++ not available")
    src = Path(__file__).resolve().parent.parent / "native" / "tsan_check.cpp"
    exe = tmp_path / "vq_tsan"
    build = subprocess.run(
        [gxx, "-fsanitize=thread", "-O1", "-std=c++17", "-pthread",
         str(src), "-o", str(exe)],
        capture_output=True, text=True)
    if build.returncode != 0:
        pytest.skip(f"tsan build unavailable: {build.stderr[:200]}")
    run = subprocess.run([str(exe)], capture_output=True, text=True,
                         env={"TSAN_OPTIONS": "halt_on_error=1",
                              "PATH": "/usr/bin:/bin"})
    assert run.returncode == 0, run.stderr + run.stdout
    assert "clean" in run.stdout


# ---------------------------------------------------------------------------
# LZ4 block codec (v5 payload frames)
# ---------------------------------------------------------------------------

def _lz4_payloads(rng):
    """Representative v5 frame payloads: delta origins + indices, plus
    overlap-heavy and incompressible extremes."""
    n = 500
    deltas = np.zeros((n, 3), np.int32)
    deltas[:, 2] = 8
    idx = rng.integers(0, 64, (n, 64)).astype(np.uint8)
    return [
        b"",
        b"x",
        deltas.tobytes() + idx.tobytes(),
        bytes(10000),                      # period-1 overlap
        b"abcd" * 2500,                    # period-4 overlap
        rng.integers(0, 256, 10000).astype(np.uint8).tobytes(),  # random
        (b"0123456789abcdef" * 700)[:10007],
    ]


def test_lz4_roundtrip_both_backends(rng, monkeypatch):
    for data in _lz4_payloads(rng):
        blob = native_io.lz4_compress(data)
        assert native_io.lz4_decompress(blob, len(data)) == data


@requires_native
def test_lz4_native_python_cross(rng, monkeypatch):
    """Native blobs decode under the pure-Python codec and vice versa."""
    if native_io._lib_v2() is None:
        pytest.skip("stale native lib without lz4")
    payloads = _lz4_payloads(rng)
    native_blobs = [native_io.lz4_compress(d) for d in payloads]
    monkeypatch.setattr(native_io, "_lib_v2", lambda: None)
    py_blobs = [native_io.lz4_compress(d) for d in payloads]
    for d, blob in zip(payloads, native_blobs):
        assert native_io.lz4_decompress(blob, len(d)) == d
    monkeypatch.undo()
    for d, blob in zip(payloads, py_blobs):
        assert native_io.lz4_decompress(blob, len(d)) == d


@requires_native
def test_lz4_cross_system_liblz4(rng):
    """The native C++ codec against real liblz4 (the independent producer/
    consumer): our blobs decode under LZ4_decompress_safe and
    LZ4_compress_default blobs decode under ours."""
    import ctypes
    import ctypes.util

    if native_io._lib_v2() is None:
        pytest.skip("stale native lib without lz4")
    name = ctypes.util.find_library("lz4") or "liblz4.so.1"
    try:
        ref = ctypes.CDLL(name)
    except OSError:
        pytest.skip("system liblz4 not present")
    ref.LZ4_compress_default.restype = ctypes.c_int
    ref.LZ4_compress_default.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    ref.LZ4_decompress_safe.restype = ctypes.c_int
    ref.LZ4_decompress_safe.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int]

    for data in _lz4_payloads(rng):
        if not data:
            continue
        ours = native_io.lz4_compress(data)
        buf = ctypes.create_string_buffer(len(data))
        k = ref.LZ4_decompress_safe(ours, buf, len(ours), len(data))
        assert k == len(data) and buf.raw[:k] == data

        cap = len(data) + len(data) // 255 + 64
        cbuf = ctypes.create_string_buffer(cap)
        k = ref.LZ4_compress_default(data, cbuf, len(data), cap)
        assert k > 0
        assert native_io.lz4_decompress(cbuf.raw[:k], len(data)) == data


def test_lz4_malformed_raises(rng):
    data = rng.integers(0, 256, 1000).astype(np.uint8).tobytes()
    blob = native_io.lz4_compress(data)
    with pytest.raises(ValueError):
        native_io.lz4_decompress(blob, len(data) + 1)  # wrong size
    with pytest.raises(ValueError):
        native_io.lz4_decompress(b"\xff\xff\xff", 100)  # truncated lengths
    bad = bytearray(blob)
    bad[0] ^= 0xF0
    try:
        out = native_io.lz4_decompress(bytes(bad), len(data))
        assert len(out) == len(data)  # decoded-but-different is acceptable
    except ValueError:
        pass


def test_copy_into_parity(rng, monkeypatch):
    """Threaded native copy == numpy assignment, incl. sliced views and
    the above-threshold (threaded) size; falls back cleanly without the
    lib."""
    big = rng.random((700_000, 4)).astype(np.float32)  # >1 MiB: threaded
    out = np.empty_like(big)
    native_io.copy_into(out, big)
    np.testing.assert_array_equal(out, big)

    dst = np.zeros((1000, 64), np.float32)
    src = rng.random((400, 64)).astype(np.float32)
    native_io.copy_into(dst[100:500], src)
    np.testing.assert_array_equal(dst[100:500], src)
    assert not dst[:100].any() and not dst[500:].any()

    # Non-contiguous destination takes the numpy path (still correct).
    dst2 = np.zeros((100, 64), np.float32)
    native_io.copy_into(dst2[:, ::2], np.ones((100, 32), np.float32))
    assert dst2[:, ::2].all() and not dst2[:, 1::2].any()

    _numpy_only(monkeypatch)
    out2 = np.empty_like(big)
    native_io.copy_into(out2, big)
    np.testing.assert_array_equal(out2, big)

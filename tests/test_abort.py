"""Graceful-abort encode (VERDICT r4 item 9 / missing #2).

The reference threads a HoudiniInterrupter through long cooks so a user
can cancel mid-operation and still get a consistent result
(ref: src/Utils/Utils.hpp:174-209). Our equivalent: a `should_stop`
callback on VQCodec.compress / compress_stream (checked between batches)
plus a CLI SIGINT handler. An aborted encode must leave a STRUCTURALLY
VALID archive — every completed batch decodes, the open grid's header is
patched to its true block count (VqvdbWriter.abort_grid), later grids are
skipped — never the deferred-finalize writer's placeholder header.
"""

import signal

import numpy as np
import pytest

import jax

from vqvdb_tpu.core.config import CodecConfig, ModelConfig
from vqvdb_tpu.format.verify import verify_container
from vqvdb_tpu.models import init_vqvae_params
from vqvdb_tpu.runtime.codec import VQCodec
from vqvdb_tpu.vdb.grid import LeafGrid

CFG = ModelConfig()
BS = 16


@pytest.fixture(scope="module")
def codec():
    params = init_vqvae_params(jax.random.key(0), CFG)
    return VQCodec(params, CFG, CodecConfig(batch_size=BS,
                                            compute_dtype="float32"))


def _grid(rng, n, name="density"):
    origins = (np.arange(n * 3).reshape(n, 3) * 8).astype(np.int32)
    leaves = rng.random((n, 8, 8, 8, 1)).astype(np.float32)
    return LeafGrid(name, origins, leaves)


class _StopAfter:
    def __init__(self, n_checks):
        self.left = n_checks

    def __call__(self):
        self.left -= 1
        return self.left < 0


@pytest.mark.parametrize("kw", [{}, {"format_version": 5},
                                {"residual": "int8"}],
                         ids=["v3", "v5", "v6_residual"])
def test_compress_abort_keeps_completed_batches(codec, rng, tmp_path, kw):
    g = _grid(rng, 3 * BS + 5)  # 4 batches (ragged tail)
    path = tmp_path / "aborted.vqvdb"
    stop = _StopAfter(2)
    stats = codec.compress(g, path, should_stop=stop, **kw)
    assert stats["aborted"] is True
    assert 0 < stats["leaves"] < g.num_leaves
    assert stats["leaves"] % BS == 0  # whole batches only

    rep = verify_container(path)
    assert rep["ok"], rep
    assert rep["grids"][0]["declared_leaves"] == stats["leaves"]

    out, _ = codec.decompress(path)
    n = stats["leaves"]
    idx = codec.encode_leaves(g.leaves[:n])
    np.testing.assert_array_equal(out[0].origins, g.origins[:n])
    want = codec.decode_indices(idx)
    if kw.get("residual"):
        # v6 adds the stored correction on decode; match the full path.
        full = tmp_path / "full.vqvdb"
        codec.compress(LeafGrid("density", g.origins[:n], g.leaves[:n]),
                       full, **kw)
        want = codec.decompress(full)[0][0].leaves
    np.testing.assert_array_equal(out[0].leaves, want)


def test_compress_abort_skips_later_grids(codec, rng, tmp_path):
    g1, g2 = _grid(rng, 2 * BS), _grid(rng, BS, name="second")
    path = tmp_path / "multi.vqvdb"
    stats = codec.compress([g1, g2], path, should_stop=_StopAfter(1))
    assert stats["aborted"] and stats["leaves"] == BS
    rep = verify_container(path)
    assert rep["ok"], rep
    assert rep["num_grids"] == 1  # the second grid never started


def test_compress_stream_abort(codec, rng, tmp_path):
    g = _grid(rng, 3 * BS)
    vdb = tmp_path / "in.vdb"
    from vqvdb_tpu.vdb.openvdb_io import (VdbGrid, open_vdb_leaf_streams,
                                          write_vdb)

    write_vdb(vdb, [VdbGrid(name="density", value_type="float",
                            origins=g.origins,
                            leaves=g.leaves.reshape(-1, 8, 8, 8))])
    path = tmp_path / "stream_aborted.vqvdb"
    stats = codec.compress_stream(open_vdb_leaf_streams(vdb), path,
                                  should_stop=_StopAfter(1))
    assert stats["aborted"] and 0 < stats["leaves"] < g.num_leaves
    rep = verify_container(path)
    assert rep["ok"], rep
    out, _ = codec.decompress(path)
    assert out[0].num_leaves == stats["leaves"]


def test_no_stop_is_not_aborted(codec, rng, tmp_path):
    stats = codec.compress(_grid(rng, BS), tmp_path / "ok.vqvdb")
    assert stats["aborted"] is False


def test_graceful_interrupt_handler():
    """First SIGINT flips the flag; the second raises KeyboardInterrupt;
    the previous handler is restored on exit."""
    from vqvdb_tpu.cli import _GracefulInterrupt

    prev = signal.getsignal(signal.SIGINT)
    with _GracefulInterrupt() as stop:
        assert stop() is False
        signal.raise_signal(signal.SIGINT)
        assert stop() is True
        with pytest.raises(KeyboardInterrupt):
            signal.raise_signal(signal.SIGINT)
    assert signal.getsignal(signal.SIGINT) is prev

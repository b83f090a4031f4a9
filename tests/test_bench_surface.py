"""bench.py's import surface into runtime internals.

bench.py builds its fenced in-graph dense-device loops out of private
runtime helpers (`_pad_steps`, `_scan_scatter`, `_to_blocks`,
`VQCodec._encode_step`). Those loops only ever execute at round-end on
the real chip, so a rename or signature change would surface as a
TPU-only crash long after the edit. This reconstructs the same loops at
tiny scale on CPU so the breakage is caught in the default suite.
"""

import ast
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqvdb_tpu.core.config import CodecConfig, ModelConfig
from vqvdb_tpu.models import init_vqvae_params
from vqvdb_tpu.runtime.codec import VQCodec
from vqvdb_tpu.runtime import dense as dense_mod
from vqvdb_tpu.runtime.dense import (_blocks_to_dense, _pad_steps,
                                     _scan_scatter, _to_blocks)

CFG = ModelConfig()
BENCH = Path(__file__).parent.parent / "bench.py"


@pytest.fixture(scope="module")
def codec():
    params = init_vqvae_params(jax.random.key(1), CFG)
    return VQCodec(params, CFG, CodecConfig(batch_size=8,
                                            compute_dtype="float32"))


def test_bench_runtime_imports_resolve():
    """Every `from vqvdb_tpu.runtime.X import ...` name in bench.py exists."""
    tree = ast.parse(BENCH.read_text())
    checked = 0
    for node in ast.walk(tree):
        if (isinstance(node, ast.ImportFrom) and node.module
                and node.module.startswith("vqvdb_tpu")):
            mod = __import__(node.module, fromlist=["_"])
            for alias in node.names:
                assert hasattr(mod, alias.name), \
                    f"bench.py imports {alias.name} from {node.module}"
                checked += 1
    assert checked >= 3  # the dense helpers at minimum


def test_bench_dense_device_loops_compile(codec):
    """Tiny-shape replica of bench.py's dense_dec_loop / dense_enc_loop."""
    params = codec.params
    mcfg = codec.mcfg
    bs = codec.ccfg.batch_size
    n_dense = 12  # 3x2x2 blocks
    row = 512 * mcfg.in_channels
    K = mcfg.num_embeddings

    rng = np.random.default_rng(0)
    idx = rng.integers(0, K, (n_dense,) + mcfg.index_shape).astype(np.uint8)
    idx_steps = jnp.asarray(_pad_steps(idx, bs, 0))
    bid_steps = jnp.asarray(_pad_steps(
        np.arange(n_dense, dtype=np.int32), bs, n_dense))

    bd = (3, 2, 2)

    def dec_body(idx_s):
        buf = jnp.zeros((n_dense + 1, row), jnp.float32)
        buf = _scan_scatter(codec, buf, idx_s, bid_steps, None, None,
                            params, None)
        # Mirror bench.py: the timed program includes the voxel-order
        # transpose, materialized behind an optimization barrier.
        dense = jax.lax.optimization_barrier(_blocks_to_dense(
            buf, n_dense, bd, mcfg.in_channels))
        return buf, dense[0, 0, 0, 0]

    buf, probe = jax.jit(dec_body)(idx_steps)
    assert buf.shape == (n_dense + 1, row)
    assert bool(jnp.isfinite(buf).all()) and bool(jnp.isfinite(probe))

    dense = jnp.asarray(
        rng.random((24, 16, 16, mcfg.in_channels)).astype(np.float32))

    def enc_body(dense):
        rows = _to_blocks(dense)
        # Mirror bench.py: the activity reduction of the shipped encode
        # path is part of the timed program.
        act = jnp.max(jnp.abs(rows - jnp.float32(0.0)),
                      axis=1) > jnp.float32(0.0)

        def step(_, bid_b):
            leaves = rows[bid_b].reshape(
                bid_b.shape[0], 8, 8, 8, mcfg.in_channels)
            return None, codec._encode_step(params, leaves)

        _, di = jax.lax.scan(step, None, bid_steps)
        return di, jnp.sum(act.astype(jnp.float32))

    di, n_act = jax.jit(enc_body)(dense)
    assert di.shape[:2] == (bid_steps.shape[0], bs)
    assert float(n_act) > 0
    # Indices come back in codebook range.
    assert int(jnp.max(di)) < K and int(jnp.min(di)) >= 0


def test_pad_steps_shape_contract():
    a = np.arange(10, dtype=np.int32)
    out = _pad_steps(a, 4, 99)
    assert out.shape == (3, 4)
    assert out[0, 0] == 0 and out[2, 2] == 99 and out[2, 1] == 9
    # Degenerate empty input still yields one (padded) step.
    assert _pad_steps(np.zeros((0,), np.int32), 4, 7).shape == (1, 4)


def test_blocks_to_dense_helper_exists():
    # bench.py's gap analysis cites these; keep them present by name.
    assert callable(dense_mod._blocks_to_dense)

"""Residual VQ (multi-stage quantizer) — the quality tier beyond the
reference's single-codebook/uint8 ceiling.

Covers: stage-stacked state math (exact-by-construction dequantize,
greedy residual argmin), the rate-distortion property that justifies the
feature (stage 2 strictly reduces quantization error after EMA training),
DP equivalence (psum'd per-stage statistics == global batch), the full
codec/file path with (4,4,4,S) index tensors in a structurally valid v3
container, training smoke, dense paths, and the export gates (the
reference runtime cannot run RVQ)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqvdb_tpu.core.artifact import load_model, save_model
from vqvdb_tpu.core.config import CodecConfig, ModelConfig
from vqvdb_tpu.format.vqvdb import VqvdbReader
from vqvdb_tpu.models import init_vqvae_params
from vqvdb_tpu.models.quantizer import (
    VQState,
    init_rvq_state,
    rvq_dequantize,
    rvq_indices,
    rvq_reset_dead_codes,
    rvq_train_forward,
    vq_train_forward,
)
from vqvdb_tpu.runtime.codec import VQCodec
from vqvdb_tpu.vdb.grid import LeafGrid

RCFG = ModelConfig(num_quantizers=2)


@pytest.fixture(scope="module")
def rvq_codec():
    params = init_vqvae_params(jax.random.key(3), RCFG)
    return VQCodec(params, RCFG,
                   CodecConfig(batch_size=16, compute_dtype="float32"))


def test_config_index_shape():
    assert ModelConfig().index_shape == (4, 4, 4)
    assert RCFG.index_shape == (4, 4, 4, 2)
    assert RCFG.latent_shape == (4, 4, 4)


def test_state_layout_and_exact_dequantize():
    st = init_rvq_state(jax.random.key(0), 2, 8, 4)
    assert st.embedding.shape == (2, 8, 4)
    assert st.cluster_size.shape == (2, 8)
    idx = jnp.asarray([[0, 1], [7, 3]])
    got = rvq_dequantize(idx, st)
    want = (st.embedding[0][jnp.asarray([0, 7])]
            + st.embedding[1][jnp.asarray([1, 3])])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_greedy_residual_indices():
    """Stage 1 takes the nearest codeword; stage 2 the nearest to the
    residual — verified against a hand-built two-stage codebook."""
    e1 = jnp.asarray([[0.0, 0.0], [10.0, 0.0]])
    e2 = jnp.asarray([[0.0, 0.0], [1.0, 0.0]])
    st = VQState(embedding=jnp.stack([e1, e2]),
                 cluster_size=jnp.ones((2, 2)),
                 embed_avg=jnp.stack([e1, e2]))
    z = jnp.asarray([[10.8, 0.0], [0.1, 0.0]])
    idx = rvq_indices(z, st)
    np.testing.assert_array_equal(np.asarray(idx), [[1, 1], [0, 0]])
    q = rvq_dequantize(idx, st)
    np.testing.assert_allclose(np.asarray(q), [[11.0, 0.0], [0.0, 0.0]])


def test_second_stage_reduces_quantization_error(rng):
    """The rate-distortion claim: after EMA training on the same data,
    2-stage quantization has strictly lower ||z - q||^2 than 1-stage."""
    z = jnp.asarray(rng.standard_normal((512, 16)).astype(np.float32))
    st1 = init_rvq_state(jax.random.key(1), 1, 32, 16)
    st2 = init_rvq_state(jax.random.key(1), 2, 32, 16)
    for _ in range(60):
        _, st1, _, _ = rvq_train_forward(st1, z, 0.25, 0.9, 1e-4)
        _, st2, _, _ = rvq_train_forward(st2, z, 0.25, 0.9, 1e-4)

    def err(st):
        q = rvq_dequantize(rvq_indices(z, st), st)
        return float(jnp.mean(jnp.square(z - q)))

    e1, e2 = err(st1), err(st2)
    assert e2 < 0.7 * e1, (e1, e2)


def test_single_stage_rvq_matches_plain_vq(rng):
    """rvq_train_forward with S=1 stacked state reproduces
    vq_train_forward (same update, same losses) — the generalization is
    conservative."""
    z = jnp.asarray(rng.standard_normal((128, 8, 16)).astype(np.float32))
    st_plain = init_rvq_state(jax.random.key(2), 1, 16, 16)
    single = VQState(st_plain.embedding[0], st_plain.cluster_size[0],
                     st_plain.embed_avg[0])
    q_a, new_a, loss_a, ppl_a = rvq_train_forward(st_plain, z, 0.25, 0.95, 1e-4)
    q_b, new_b, loss_b, ppl_b = vq_train_forward(single, z, 0.25, 0.95, 1e-4)
    np.testing.assert_allclose(np.asarray(q_a), np.asarray(q_b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_a.embedding[0]),
                               np.asarray(new_b.embedding), atol=1e-6)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
    np.testing.assert_allclose(float(ppl_a), float(ppl_b), rtol=1e-6)


def test_dp_rvq_stats_match_global_batch(rng):
    """Per-stage EMA statistics psum'd over the mesh == one global batch
    (the invariant that makes N-chip RVQ training equal 1-chip)."""
    from vqvdb_tpu.parallel.mesh import DATA_AXIS, _shard_map, make_mesh
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(8)
    st = init_rvq_state(jax.random.key(4), 2, 16, 8)
    z = jnp.asarray(rng.standard_normal((64, 8)).astype(np.float32))

    _, global_new, global_loss, _ = rvq_train_forward(st, z, 0.25, 0.95, 1e-4)

    def shard_fn(st, z):
        q, new_st, loss, ppl = rvq_train_forward(
            st, z, 0.25, 0.95, 1e-4, axis_name=DATA_AXIS)
        return new_st, loss

    mapped = _shard_map(shard_fn, mesh,
                        in_specs=(P(), P(DATA_AXIS)),
                        out_specs=(P(), P()))
    sharded_new, sharded_loss = jax.jit(mapped)(st, z)
    np.testing.assert_allclose(np.asarray(global_new.embedding),
                               np.asarray(sharded_new.embedding), atol=1e-5)
    np.testing.assert_allclose(np.asarray(global_new.cluster_size),
                               np.asarray(sharded_new.cluster_size),
                               atol=1e-5)


def test_rvq_codec_roundtrip_and_v3_file(rvq_codec, rng, tmp_path):
    leaves = rng.random((21, 8, 8, 8), np.float32)
    idx = rvq_codec.encode_leaves(leaves)
    assert idx.shape == (21, 4, 4, 4, 2) and idx.dtype == np.uint8
    rec = rvq_codec.decode_indices(idx)
    assert rec.shape == (21, 8, 8, 8, 1)
    # Stability: re-encode of own output is a fixed point.
    np.testing.assert_array_equal(rvq_codec.encode_leaves(leaves), idx)

    g = LeafGrid("density", (np.arange(21 * 3).reshape(21, 3) * 8), leaves)
    path = tmp_path / "rvq.vqvdb"
    stats = rvq_codec.compress(g, path)
    assert stats["leaves"] == 21
    with VqvdbReader(path) as r:
        assert r.version == 3  # structurally valid v3: K=256 fits uint8
        meta, fidx, forg = r.read_grid()
        assert tuple(meta.latent_shape) == (4, 4, 4, 2)
        np.testing.assert_array_equal(fidx.reshape(idx.shape), idx)
    grids, _ = rvq_codec.decompress(path)
    np.testing.assert_allclose(grids[0].leaves, rec, atol=1e-6)


def test_rvq_probe_and_shape_mismatch(rvq_codec, tmp_path, rng):
    assert rvq_codec.check_latent_shape() == (4, 4, 4, 2)
    # A single-stage file must be rejected by an RVQ codec (and vice versa).
    from vqvdb_tpu.utils.errors import ModelMismatchError

    scfg = ModelConfig()
    sparams = init_vqvae_params(jax.random.key(0), scfg)
    scodec = VQCodec(sparams, scfg,
                     CodecConfig(batch_size=16, compute_dtype="float32"))
    g = LeafGrid("density", np.zeros((3, 3), np.int32) * 8,
                 rng.random((3, 8, 8, 8), np.float32))
    g.origins = (np.arange(9).reshape(3, 3) * 8).astype(np.int32)
    p = tmp_path / "single.vqvdb"
    scodec.compress(g, p)
    with pytest.raises(ModelMismatchError):
        rvq_codec.decompress(p)


def test_rvq_artifact_roundtrip(rvq_codec, tmp_path):
    path = tmp_path / "rvq.vqmodel"
    save_model(path, rvq_codec.params, RCFG)
    params2, cfg2 = load_model(path)
    assert cfg2.num_quantizers == 2
    np.testing.assert_array_equal(
        np.asarray(rvq_codec.params.vq.embedding),
        np.asarray(params2.vq.embedding))


def test_rvq_reset_dead_codes(rng):
    st = init_rvq_state(jax.random.key(5), 2, 8, 4)
    # Kill half of stage 0 and a different half of stage 1.
    cs = np.ones((2, 8), np.float32)
    cs[0, :4] = 0.0
    cs[1, 4:] = 0.0
    st = VQState(st.embedding, jnp.asarray(cs), st.embed_avg)
    flat = jnp.asarray(rng.standard_normal((64, 4)).astype(np.float32))
    new_st, n_dead = rvq_reset_dead_codes(jax.random.key(6), st, flat)
    assert int(n_dead) == 8
    assert np.all(np.asarray(new_st.cluster_size) >= 1.0)
    # Live codes are untouched.
    np.testing.assert_array_equal(np.asarray(new_st.embedding[0, 4:]),
                                  np.asarray(st.embedding[0, 4:]))


def test_rvq_train_on_device_smoke(tmp_path, rng):
    from vqvdb_tpu.train.fast import train_on_device
    from vqvdb_tpu.train.train import TrainConfig

    cfg = ModelConfig(embedding_dim=16, num_embeddings=16, num_quantizers=2)
    tcfg = TrainConfig(epochs=2, batch_size=32, lr=1e-3,
                       compute_dtype="float32", val_fraction=0.25)
    leaves = rng.random((128, 8, 8, 8, 1), np.float32)
    state, trace = train_on_device(leaves, cfg, tcfg,
                                   checkpoint_dir=str(tmp_path / "ck"),
                                   resume=False)
    assert state.params.vq.embedding.shape == (2, 16, 16)
    assert trace.shape[0] == 2
    assert np.isfinite(trace[:, 0]).all()


def test_rvq_dense_paths(rvq_codec, rng):
    from vqvdb_tpu.runtime.dense import decode_to_dense, encode_from_dense

    n = 9
    origins = (np.stack(np.unravel_index(np.arange(n), (3, 3, 1)), 1)
               * 8).astype(np.int32)
    leaves = rng.random((n, 8, 8, 8), np.float32)
    idx = rvq_codec.encode_leaves(leaves)
    dense, lo = decode_to_dense(rvq_codec, idx, origins)
    host, _ = LeafGrid("d", origins,
                       rvq_codec.decode_indices(idx)).to_dense()
    np.testing.assert_allclose(np.asarray(dense), host, atol=1e-6)
    idx2, org2 = encode_from_dense(rvq_codec, jnp.asarray(host[..., 0]),
                                   tolerance=-1.0)
    assert idx2.shape == (9, 4, 4, 4, 2)


def test_rvq_export_gates(rvq_codec, tmp_path):
    from vqvdb_tpu.interop.onnx_export import export_onnx
    from vqvdb_tpu.interop.torch_export import export_state_dict
    from vqvdb_tpu.utils.errors import ArtifactError

    with pytest.raises(ArtifactError):
        export_onnx(tmp_path, rvq_codec.params, RCFG)
    with pytest.raises(ValueError):
        export_state_dict(rvq_codec.params, RCFG)

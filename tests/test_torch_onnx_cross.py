"""ONNX interop cross-validated against torch as an independent producer.

The repo's ONNX writer/parser/executor (interop/onnx_proto.py,
onnx_eval.py) are otherwise pair-validated against each other; a shared
misreading of the spec would cancel out. torch.onnx.export is the one
independent ONNX producer in this environment (and the very exporter the
reference uses, ref: python/to_onnx.py:113-151), so these tests feed
*torch-produced* bytes — which this repo did not write — through our
parser and executor and require agreement with both the torch forward and
the JAX forward at the reference's 1e-5 gate.

torch's graphs exercise a wider op/field surface than our writer:
GroupNorm decomposes to Reshape/InstanceNormalization/Shape chains,
attention to ReduceMean/MatMul/Unsqueeze, the quantizer to
MatMul/ReduceSum/ArgMin, constants arrive as Constant nodes (sometimes
with typed int64_data instead of raw_data), and attribute ints can be
negative — all paths our own bytes never hit.

Field-order note (shared ops): protobuf semantics make field order
irrelevant, and the two producers do differ — torch emits NodeProto
attributes in op-schema order with extras our writer omits (Conv carries
dilations/group/kernel_shape; ours writes only strides/pads), writes
graph docstrings, and stores small Constant tensors via typed data
fields. test_field_order_and_defaults pins that divergence down
explicitly so parser changes can't silently start depending on our own
writer's layout.
"""

import io

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vqvdb_tpu.core.config import ModelConfig
from vqvdb_tpu.interop import onnx_proto as P
from vqvdb_tpu.interop.onnx_eval import run_model
from vqvdb_tpu.interop.onnx_export import build_encoder_onnx
from vqvdb_tpu.interop.torch_export import export_state_dict
from vqvdb_tpu.interop.torch_module import build_torch_vqvae
from vqvdb_tpu.models import init_vqvae_params
from vqvdb_tpu.models.vqvae import decode_from_indices, encode_to_indices

SCALAR = ModelConfig(embedding_dim=32, num_embeddings=64)
VEC3 = ModelConfig(in_channels=3, embedding_dim=48, num_embeddings=64)


def torch_onnx_bytes(module, example_args) -> bytes:
    """torch.onnx.export (legacy/TorchScript exporter, opset 11) to bytes.

    The exporter's final packaging step needs the `onnx` package only to
    splice in onnxscript custom-op functions; with none registered it is
    an identity on the serialized bytes, so it is bypassed — the protobuf
    itself is produced entirely by torch.
    """
    import torch.onnx._internal.torchscript_exporter.onnx_proto_utils as opu

    orig = opu._add_onnxscript_fn
    opu._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes
    try:
        buf = io.BytesIO()
        torch.onnx.export(module, example_args, buf, opset_version=11,
                          dynamo=False)
    finally:
        opu._add_onnxscript_fn = orig
    return buf.getvalue()


class _EncWrapper(torch.nn.Module):
    """The reference's EncoderWrapper contract: uint8 indices out
    (ref: python/to_onnx.py:19-30)."""

    def __init__(self, m):
        super().__init__()
        self.m = m

    def forward(self, x):
        return self.m.encode(x).to(torch.uint8)


class _DecWrapper(torch.nn.Module):
    """DecoderWrapper contract: uint8 in, cast to int64 for the embedding
    lookup (ref: python/to_onnx.py:33-43)."""

    def __init__(self, m):
        super().__init__()
        self.m = m

    def forward(self, i):
        return self.m.decode(i.to(torch.int64))


def _torch_model(cfg, seed=0):
    params = init_vqvae_params(jax.random.key(seed), cfg)
    m = build_torch_vqvae(cfg)
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in export_state_dict(params, cfg).items()}
    m.load_state_dict(sd)
    return params, m


@pytest.mark.parametrize("cfg", [SCALAR, VEC3], ids=["scalar", "vec3"])
def test_torch_produced_encoder_bytes_execute(cfg):
    params, m = _torch_model(cfg)
    rng = np.random.default_rng(3)
    x = rng.random((3, 8, 8, 8, cfg.in_channels), np.float32)
    if cfg.variant == "vec3":
        x = (2.0 * x - 1.0).astype(np.float32)
    xt = torch.from_numpy(np.moveaxis(x, -1, 1).copy())

    data = torch_onnx_bytes(_EncWrapper(m), (xt,))
    mdl = P.parse_model(data)
    assert mdl.producer == "pytorch" and mdl.opset == 11

    with torch.no_grad():
        want_torch = _EncWrapper(m)(xt).numpy()
    feeds = {mdl.graph.inputs[0]: xt.numpy()}
    (got,) = run_model(data, feeds).values()
    assert got.dtype == np.uint8
    # Executor == the torch graph the bytes encode...
    np.testing.assert_array_equal(got, want_torch)
    # ...and both == the JAX forward (index-exact).
    want_jax = np.asarray(encode_to_indices(params, jnp.asarray(x), cfg))
    np.testing.assert_array_equal(got, want_jax.astype(np.uint8))


@pytest.mark.parametrize("cfg", [SCALAR, VEC3], ids=["scalar", "vec3"])
def test_torch_produced_decoder_bytes_execute(cfg):
    params, m = _torch_model(cfg)
    rng = np.random.default_rng(4)
    idx = rng.integers(0, cfg.num_embeddings, (3, 4, 4, 4)).astype(np.uint8)
    it = torch.from_numpy(idx)

    data = torch_onnx_bytes(_DecWrapper(m), (it,))
    mdl = P.parse_model(data)

    with torch.no_grad():
        want_torch = _DecWrapper(m)(it).numpy()
    (got,) = run_model(data, {mdl.graph.inputs[0]: idx}).values()
    np.testing.assert_allclose(got, want_torch, atol=1e-5)
    want_jax = np.asarray(decode_from_indices(params, jnp.asarray(idx), cfg))
    np.testing.assert_allclose(np.moveaxis(got, 1, -1), want_jax, atol=1e-5)


def test_field_order_and_defaults():
    """Pin the producer divergences the parser must absorb: torch Conv
    nodes carry schema-ordered extra attributes ours omit, and torch
    Constant tensors may use typed data fields with negative values."""
    params, m = _torch_model(SCALAR)
    x = torch.zeros(1, 1, 8, 8, 8)
    tg = P.parse_model(torch_onnx_bytes(_EncWrapper(m), (x,))).graph
    og = P.parse_model(build_encoder_onnx(params, SCALAR)).graph

    tconv = next(n for n in tg.nodes if n.op_type == "Conv")
    oconv = next(n for n in og.nodes if n.op_type == "Conv")
    # torch writes the full schema surface; we omit dilations/group (the
    # executor must default them, not require them).
    assert {"dilations", "group", "kernel_shape"} <= set(tconv.attrs)
    assert "dilations" not in oconv.attrs and "group" not in oconv.attrs
    # Semantics agree where both speak.
    assert tconv.attrs["strides"].value == oconv.attrs["strides"].value
    assert tconv.attrs["pads"].value == oconv.attrs["pads"].value

    # The flatten-reshape constant holds a negative int64 (-1): sign must
    # survive whichever tensor encoding torch picked.
    consts = [n.attrs["value"].t.to_numpy() for n in tg.nodes
              if n.op_type == "Constant" and n.attrs["value"].t.dims]
    assert any((c < 0).any() for c in consts if c.dtype == np.int64)

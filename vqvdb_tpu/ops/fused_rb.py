"""Fused residual-block Pallas kernel — the round-3 RB16 experiment.

The encoder's 16-channel residual block is its roofline wall
(docs/ENCODE_ROOFLINE.md: measured 1.95 ms vs a 1.6 ms 6-pass HBM floor at
b8192). This kernel fuses the whole block —

    x + 0.1 * conv2(relu(gn2(conv1(relu(gn1(x))))))

— into ONE pallas_call, so x is read from HBM once and the result written
once (2 passes instead of 6-8).

The conv formulation is the part that makes this worth measuring. A
16-channel 3^3 conv maps terribly onto the 128x128 MXU in every naive
layout (16/128 of the output lanes or sublanes used). Here each leaf is
laid out as [64 rows = (d,h), 128 lanes = (w, c)] — the innermost spatial
axis is FUSED with the channel axis into one full 128-wide lane dim — and
the conv becomes 9 row-shifted [M,128]x[128,128] matmuls against banded
block-Toeplitz weight matrices (the w-axis taps are folded into the
weight matrix band; d/h taps become sublane rolls with boundary masks).
FLOP inflation is only 128/48 = 2.67x (the band is 3 of 8 w-blocks),
against the 8x lane waste of the [.., 16]-lane layouts — the first
formulation in the round-2 candidate sweep that is MXU-shaped at all.

GroupNorm statistics never reshape the lane dim (Mosaic-hostile): the
per-(leaf, group) sums are computed as a row reduction followed by a tiny
[128, G] matmul with a 0/1 group-collect matrix, and broadcast back with
its transpose.

Correctness oracle: blocks.residual_block (tests/test_fused_rb.py,
interpret mode on CPU, atol 1e-5 f32 / 1e-2 bf16). Measured in-context
A/B on the real chip decides whether the codec ever enables it
(benchmarks/ab_rb16.py) — round-1/2 precedent says isolated wins can
invert in-graph, so the default stays XLA until the full-graph numbers
say otherwise.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LEAF = 8
ROWS = LEAF * LEAF  # (d, h) rows per leaf


def _auto_interpret() -> bool:
    return jax.default_backend() != "tpu"


def banded_weights(w: jnp.ndarray) -> jnp.ndarray:
    """DHWIO conv kernel [3,3,3,C,C] -> [9, 8C, 8C] banded tap matrices.

    Tap k = a*3+b (d-offset a-1, h-offset b-1). Correlation semantics:
    out[w_out] sums x[w_out + c2 - 1] * w[.., c2, ..], so the entry at
    [(w_in, i), (w_out, o)] is w[a, b, w_in-w_out+1, i, o] within the band,
    zero outside — the w-axis of the conv lives inside the matrix, so the
    kernel never shifts lanes.
    """
    c = w.shape[-1]
    tap = jnp.arange(LEAF)[:, None] - jnp.arange(LEAF)[None, :] + 1  # [8,8]
    valid = (tap >= 0) & (tap < 3)
    out = []
    for a in range(3):
        for b in range(3):
            g = w[a, b][jnp.clip(tap, 0, 2)]          # [8,8,C,C]
            g = jnp.where(valid[:, :, None, None], g, 0)
            out.append(g.transpose(0, 2, 1, 3).reshape(LEAF * c, LEAF * c))
    return jnp.stack(out)


def _group_collect(c: int, groups: int) -> jnp.ndarray:
    """[8C, G] 0/1 matrix: lane (w, ch) -> its GroupNorm group."""
    ch = jnp.tile(jnp.arange(c), LEAF)
    gid = ch // (c // groups)
    return (gid[:, None] == jnp.arange(groups)[None, :]).astype(jnp.float32)


def _gn_relu(xf, gmat, gmat_t, scale_l, bias_l, eps):
    """GroupNorm (stats per leaf x group) + ReLU on [T, 64, L] f32."""
    lanes_per_group = xf.shape[-1] // gmat.shape[-1]
    n_elem = ROWS * lanes_per_group  # 64 rows x (w, group-channels) lanes
    s1 = jnp.sum(xf, axis=1)                       # [T, L]
    s2 = jnp.sum(xf * xf, axis=1)                  # [T, L]
    sg1 = jax.lax.dot_general(s1, gmat, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [T, G]
    sg2 = jax.lax.dot_general(s2, gmat, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    mean = sg1 / n_elem
    var = sg2 / n_elem - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    mean_l = jax.lax.dot_general(mean, gmat_t, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    inv_l = jax.lax.dot_general(inv, gmat_t, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    y = (xf - mean_l[:, None, :]) * inv_l[:, None, :]
    return jnp.maximum(y * scale_l + bias_l, 0.0)


def _tap_mask(a: int, b: int):
    """[1, 64, 1] f32 mask: 1 where the shifted source row is in-leaf."""
    r = jax.lax.broadcasted_iota(jnp.int32, (1, ROWS, 1), 1)
    dd = r // LEAF + (a - 1)
    hh = r % LEAF + (b - 1)
    ok = (dd >= 0) & (dd < LEAF) & (hh >= 0) & (hh < LEAF)
    return ok.astype(jnp.float32)


def _conv_banded(y, w_ref, bias_l, interpret: bool):
    """y [T, 64, L] f32 -> conv output [T, 64, L] f32 via 9 shifted dots."""
    t, rows, lanes = y.shape
    acc = jnp.zeros((t * rows, lanes), jnp.float32)
    for k in range(9):
        a, b = k // 3, k % 3
        s = (a - 1) * LEAF + (b - 1)
        if s == 0:
            shifted = y
        elif interpret:
            shifted = jnp.roll(y, -s, axis=1)
        else:
            # pltpu.roll rejects negative shifts; rolls are cyclic over the
            # 64-row axis so shift by (-s) mod 64 instead.
            shifted = pltpu.roll(y, (-s) % rows, 1)
        src = (shifted * _tap_mask(a, b)).reshape(t * rows, lanes)
        acc = acc + jax.lax.dot_general(
            src, w_ref[k], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return (acc + bias_l).reshape(t, rows, lanes)


def _rb_kernel(x_ref, w1_ref, w2_ref, b1_ref, b2_ref,
               g1s_ref, g1b_ref, g2s_ref, g2b_ref,
               gmat_ref, gmat_t_ref, out_ref,
               *, eps: float, res_scale: float, interpret: bool):
    xf = x_ref[:].astype(jnp.float32)
    gmat = gmat_ref[:]
    gmat_t = gmat_t_ref[:]
    y = _gn_relu(xf, gmat, gmat_t, g1s_ref[:], g1b_ref[:], eps)
    h = _conv_banded(y, w1_ref, b1_ref[:], interpret)
    y2 = _gn_relu(h, gmat, gmat_t, g2s_ref[:], g2b_ref[:], eps)
    h2 = _conv_banded(y2, w2_ref, b2_ref[:], interpret)
    out_ref[:] = (xf + res_scale * h2).astype(out_ref.dtype)


def _lane_tile(v: jnp.ndarray) -> jnp.ndarray:
    """Per-channel vector [C] -> per-lane row [1, 8C] (tiled over w)."""
    return jnp.tile(v.astype(jnp.float32), (LEAF,))[None, :]


@functools.partial(jax.jit,
                   static_argnames=("groups", "res_scale", "tile",
                                    "interpret"))
def residual_block_fused(
    params,
    x: jnp.ndarray,
    *,
    groups: int = 8,
    res_scale: float = 0.1,
    tile: int = 32,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Drop-in twin of blocks.residual_block for 8^3 leaves.

    x: [B, 8, 8, 8, C] with 8*C a lane-tile multiple (C=16 -> exactly 128
    lanes). Pads B to a tile multiple internally.
    """
    if interpret is None:
        interpret = _auto_interpret()
    b, d, h, w, c = x.shape
    assert (d, h, w) == (LEAF, LEAF, LEAF), "leaf-shaped input required"
    lanes = LEAF * c
    b_pad = -(-max(b, 1) // tile) * tile
    xr = x.reshape(b, ROWS, lanes)
    if b_pad != b:
        xr = jnp.pad(xr, ((0, b_pad - b), (0, 0), (0, 0)))

    w1 = banded_weights(params["conv1"]["w"].astype(jnp.float32))
    w2 = banded_weights(params["conv2"]["w"].astype(jnp.float32))
    dt = x.dtype
    if dt == jnp.bfloat16:
        w1, w2 = w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16)
    args = (
        xr,
        w1, w2,
        _lane_tile(params["conv1"]["b"]), _lane_tile(params["conv2"]["b"]),
        _lane_tile(params["gn1"]["scale"]), _lane_tile(params["gn1"]["bias"]),
        _lane_tile(params["gn2"]["scale"]), _lane_tile(params["gn2"]["bias"]),
        _group_collect(c, groups), _group_collect(c, groups).T,
    )
    grid = (b_pad // tile,)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_rb_kernel, eps=1e-5, res_scale=res_scale,
                          interpret=bool(interpret)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, ROWS, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full((9, lanes, lanes)), full((9, lanes, lanes)),
            full((1, lanes)), full((1, lanes)),
            full((1, lanes)), full((1, lanes)),
            full((1, lanes)), full((1, lanes)),
            full((lanes, groups)), full((groups, lanes)),
        ],
        out_specs=pl.BlockSpec((tile, ROWS, lanes), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, ROWS, lanes), dt),
        interpret=bool(interpret),
    )(*args)
    return out[:b].reshape(b, LEAF, LEAF, LEAF, c)

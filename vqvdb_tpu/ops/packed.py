"""Space-to-channel packed execution of the encoder pre-stage.

The scalar encoder spends most of its time in the 8^3-resolution stage
(conv 1->16, GroupNorm, ReLU, ResidualBlock(16)): 16-channel convs use 16 of
the MXU's 128 lanes. Packing 2x2x2 voxel neighborhoods into channels runs
the same math on a 4^3 x (C*8) tensor with full lanes:

  * k3 SAME convs commute with the packing exactly (the subpixel identity of
    ops/subpixel.py, applied on both sides): fold_final_conv already
    computes W' of shape (3,3,3, Cin*8, Cout*8).
  * The strided downsampling conv (k4 s2 p1 scalar / k3 s2 p1 vec3) maps to
    a k3 SAME conv on the packed grid with naturally-unpacked output
    (fold_strided_conv below).
  * GroupNorm / ReLU / residual adds are per-original-channel or
    elementwise, so they run on the packed tensor with the parity axis
    treated as extra spatial (packed_group_norm).

All transforms are inference-time weight rewrites — bit-exact up to fp
reassociation (tests/test_packed_encoder.py).

Channel convention everywhere: packed index = c_orig * 8 + parity, where
parity = a*4 + b*2 + c for voxel offset (a,b,c) — identical to the channel
split of blocks.pixel_shuffle_3d, so pack/unpack are mutual inverses.
"""

from __future__ import annotations

import itertools
from typing import Dict

import jax.numpy as jnp
import numpy as np


def space_to_channel(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B, D/r, H/r, W/r, C*r^3); inverse of
    blocks.pixel_shuffle_3d."""
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // r, r, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    return x.reshape(b, d // r, h // r, w // r, c * r**3)


def fold_strided_conv(w: np.ndarray, b: np.ndarray, r: int = 2
                      ) -> Dict[str, jnp.ndarray]:
    """Fold a stride-2, padding-1 conv (kernel k in {3, 4}) on the fine grid
    into a k3 SAME conv on the packed coarse grid with unpacked output.

    w: (k, k, k, Cin, Cout). Output: {'w': (3,3,3, Cin*8, Cout), 'b'}.

    Derivation (per axis): output cell p reads fine voxels 2p + d - 1 for
    d in [0, k). Writing 2p + d - 1 = 2(p + e) + s' gives d = 2e + s' + 1;
    valid taps are e in {-1,0,1} with d in [0,k), so a k3 SAME conv on the
    packed grid covers every case (k=4 uses all three e's; k=3 only
    e in {-1,0}). Zero padding on the fine grid maps exactly to zero
    padding of the packed grid.
    """
    w = np.asarray(w, np.float64)
    k = w.shape[0]
    cin, cout = w.shape[3], w.shape[4]
    r3 = r**3
    out = np.zeros((3, 3, 3, cin * r3, cout), np.float64)
    parities = list(itertools.product(range(r), repeat=3))
    for sp in parities:
        p_idx = (sp[0] * r + sp[1]) * r + sp[2]
        for e in itertools.product((-1, 0, 1), repeat=3):
            d = tuple(r * e[a] + sp[a] + 1 for a in range(3))
            if all(0 <= da < k for da in d):
                out[e[0] + 1, e[1] + 1, e[2] + 1, p_idx::r3, :] += \
                    w[d[0], d[1], d[2]]
    return {"w": jnp.asarray(out, jnp.float32),
            "b": jnp.asarray(np.asarray(b, np.float32))}


def packed_group_norm(params: Dict, x: jnp.ndarray, num_groups: int,
                      orig_channels: int, eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm(num_groups, orig_channels) evaluated on a packed tensor
    (B, D, H, W, orig_channels * 8): the parity axis joins the spatial
    reduction, reproducing the fine-grid statistics exactly."""
    b, d, h, w, cp = x.shape
    r3 = cp // orig_channels
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32).reshape(
        b, d, h, w, num_groups, orig_channels // num_groups, r3)
    mean = jnp.mean(xf, axis=(1, 2, 3, 5, 6), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 3, 5, 6), keepdims=True)
    xf = (xf - mean) / jnp.sqrt(var + eps)
    scale = params["scale"].astype(jnp.float32).reshape(
        num_groups, orig_channels // num_groups, 1)
    bias = params["bias"].astype(jnp.float32).reshape(
        num_groups, orig_channels // num_groups, 1)
    xf = xf * scale + bias
    return xf.reshape(b, d, h, w, cp).astype(orig_dtype)

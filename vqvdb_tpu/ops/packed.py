"""Space-to-channel packing: run the strided downsampling conv at full lanes.

The encoder's strided conv (k4 s2 p1 scalar / k3 s2 p1 vec3) is its slowest
stage on v5e (~11 TFLOP/s: 8^3 windows, 16 input channels of 128 lanes).
Packing 2x2x2 voxel neighborhoods into channels maps it EXACTLY to a k3
SAME conv on the (4^3, C*8) packed grid with naturally-unpacked output
(fold_strided_conv) — an inference-time weight rewrite, bit-exact up to fp
reassociation (tests/test_fused_encode.py). Measured: +42% encode.

Note: packing the SAME-resolution 8^3 convs (e.g. the 16-channel residual
block) is a measured LOSS — it inflates dense FLOPs 8x for an 8x lane gain,
and XLA's conv already exceeds 1/8 of peak there. Only the strided conv
wins, because its output lives on the coarse grid anyway.

Channel convention: packed index = c_orig * 8 + parity, where parity =
a*4 + b*2 + c for voxel offset (a,b,c) — identical to the channel split of
blocks.pixel_shuffle_3d, so pack/unpack are mutual inverses.
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

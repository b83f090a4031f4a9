"""Subpixel-convolution folding: move the decoder's final conv BEFORE the
pixel shuffle at inference time.

The decoder tail is `up_conv (4^3,256) -> pixel_shuffle -> final k3 conv
(8^3, 32->C)` with no nonlinearity between shuffle and final conv. On TPU
the final conv is the worst stage of the whole decode (measured: ~26% of
step time at ~3 TFLOP/s — 8^3 spatial windows, 1-32 lanes used), while the
4^3x256 tensors run near MXU peak.

conv(shuffle(x)) == shuffle'(conv(x, W')) exactly: for shuffle rate r=2 and
a k3 SAME conv, each output parity s in {0,1}^3 reads taps
d = 2e + s' - s (valid when |d| <= 1) from pre-shuffle cell offset e and
input parity s'. Folding produces W' of shape (3,3,3, 32*8, 8*C) applied on
the pre-shuffle grid with SAME padding, followed by a pure reshape/transpose
(the r=2 shuffle with C output channels). Zero padding on the 8^3 grid maps
exactly to zero padding on the 4^3 grid, so the identity is exact up to fp
reassociation (tests/test_subpixel.py asserts 1e-5 agreement and measures
the speedup).
"""

from __future__ import annotations

import itertools
from typing import Dict

import jax.numpy as jnp
import numpy as np


def fold_final_conv(w_final: np.ndarray, b_final: np.ndarray, r: int = 2
                    ) -> Dict[str, jnp.ndarray]:
    """Fold a k3 post-shuffle conv into a k3 pre-shuffle conv.

    w_final: (3,3,3, C_in, C_out) DHWIO weights of the post-shuffle conv
             (C_in = channels after shuffle, e.g. 32).
    Returns {'w': (3,3,3, C_in*r^3, C_out*r^3), 'b': (C_out*r^3,)} for a
    SAME conv on the pre-shuffle grid. Output channel ordering matches
    pixel_shuffle_3d's (oc outermost, then parity d,h,w), so the result
    shuffles back with the same reshape/transpose.
    """
    w = np.asarray(w_final, np.float64)
    kd, kh, kw, cin, cout = w.shape
    assert (kd, kh, kw) == (3, 3, 3), "fold_final_conv expects k3"
    r3 = r**3
    out = np.zeros((3, 3, 3, cin * r3, cout * r3), np.float64)

    parities = list(itertools.product(range(r), repeat=3))
    for s in parities:  # output parity
        for sp in parities:  # input parity
            for e in itertools.product((-1, 0, 1), repeat=3):  # cell offset
                d = tuple(r * e[a] + sp[a] - s[a] for a in range(3))
                if all(-1 <= da <= 1 for da in d):
                    m_idx = (s[0] * r + s[1]) * r + s[2]
                    p_idx = (sp[0] * r + sp[1]) * r + sp[2]
                    out[e[0] + 1, e[1] + 1, e[2] + 1,
                        p_idx::r3,  # c_u = oc*r3 + p_idx for every oc
                        m_idx::r3,  # m = oc_out*r3 + m_idx
                        ] += w[d[0] + 1, d[1] + 1, d[2] + 1]

    b = np.repeat(np.asarray(b_final, np.float64)[:, None], r3, axis=1).reshape(-1)
    # Note channel orderings: input c_u = oc*r3 + parity (matches the
    # (oc, rd, rh, rw) split of pixel_shuffle_3d); output m likewise.
    return {"w": jnp.asarray(out, jnp.float32), "b": jnp.asarray(b, jnp.float32)}


def shuffle_channels_to_space(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """(B, D, H, W, C*r^3) -> (B, D*r, H*r, W*r, C): identical semantics to
    blocks.pixel_shuffle_3d (re-exported here for the folded tail)."""
    from vqvdb_tpu.models.blocks import pixel_shuffle_3d

    return pixel_shuffle_3d(x, r)

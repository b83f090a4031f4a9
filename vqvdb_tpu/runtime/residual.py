"""Residual-correction math for the v6 near-lossless tier.

The correction is computed and applied ON THE HOST, against reconstructions
produced by the codec's ordinary decode executable. That is a deliberate
exactness guarantee, not a shortcut: the encode-time reconstruction and the
decode-time reconstruction come from the *same compiled program* (same
params, shapes, fusion decisions), so they are bit-identical, and the
per-voxel error of the corrected output is bounded by quantization alone:

  int8 mode: |x - (x_hat + s*q)| <= s/2,   s = max|x - x_hat| / 127 per leaf
  f16  mode: |x - (x_hat + e16)| = |e - f16(e)|  (one half-precision rounding)

Computing the residual inside a fused encode+decode device program would be
cheaper but voids the bound: XLA may compile the embedded decode subgraph
differently from the standalone decode program, and with bf16 compute the
two reconstructions can differ by more than the correction itself.

The reference has no counterpart to any of this — its container stores one
uint8 index per latent position and nothing else (src/Utils/VQVDB_Reader.cpp),
so its fidelity ceiling is whatever the VQ-VAE reaches.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

RESIDUAL_MODES = ("int8", "f16")


def quantize_residual(err: np.ndarray, mode: str, tol: Optional[float] = None
                      ) -> Tuple[Optional[np.ndarray], np.ndarray]:
    """Quantize per-leaf reconstruction errors for storage.

    err: f32 [n, 8, 8, 8, C] (any [n, ...] layout; flattened per leaf).
    Returns (scales f32 [n] | None, residual i8/f16 [n, voxels*C]).

    tol (int8 mode): target max absolute error. Per-leaf max scaling alone
    amplifies a nearly-perfect leaf's noise to the full int8 range —
    incompressible bytes spent below any fidelity anyone asked for. With
    tol, the quantization step is floored at 2*tol: leaves already within
    ~127*2*tol of exact quantize to (mostly zero, highly compressible)
    codes while still landing under tol; badly-fit leaves keep the
    max/127 scaling. Bound: per-voxel error <= max(leaf_max_err/254, tol).
    """
    if mode not in RESIDUAL_MODES:
        raise ValueError(f"unknown residual mode {mode!r}")
    n = err.shape[0]
    flat = np.ascontiguousarray(err, np.float32).reshape(n, -1)
    if mode == "f16":
        if tol is not None:
            raise ValueError("tol applies to the int8 mode only")
        return None, flat.astype(np.float16)
    amax = np.abs(flat).max(axis=1)
    scales = np.maximum(amax / 127.0, 1e-12)
    if tol is not None:
        scales = np.maximum(scales, 2.0 * float(tol))
    scales = scales.astype(np.float32)
    q = np.rint(flat / scales[:, None])
    return scales, np.clip(q, -127, 127).astype(np.int8)


def apply_residual(rec: np.ndarray, scales: Optional[np.ndarray],
                   residual: Optional[np.ndarray]) -> np.ndarray:
    """Add the stored correction to reconstructions, in place.

    rec: f32 [n, 8, 8, 8, C]; residual rows are reshaped to match.
    Returns rec (corrected) for convenience.
    """
    if residual is None or rec.shape[0] == 0:
        return rec
    r = residual.astype(np.float32).reshape(rec.shape)
    if scales is not None:
        r *= scales.reshape((-1,) + (1,) * (rec.ndim - 1))
    rec += r
    return rec

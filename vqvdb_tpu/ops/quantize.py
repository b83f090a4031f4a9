"""Pallas TPU kernels for the vector-quantization hot path.

The reference runs quantization as part of an ONNX/TorchScript graph on CUDA
(distance matmul + argmin inside the exported encoder, ref:
python/VQVAE_v2.py:364-367). Here it is a hand-written TPU kernel:

  * `fused_nearest_indices` — for each latent row z, computes
    argmin_k(||e_k||^2 - 2 z . e_k) entirely in VMEM: one [TILE_N, D] x
    [D, K] MXU matmul per tile, fused bias add and first-min argmin on the
    VPU, no [N, K] distance matrix ever touching HBM. The ||z||^2 term is
    dropped — it is constant per row and cannot change the argmin.
  * `fused_dequantize` — one-hot(idx) @ codebook as an MXU matmul per tile
    (row gathers are slow on TPU; a [TILE_N, K] x [K, D] matmul is not).

Both have pure-XLA twins in models/quantizer.py used as the correctness
oracle (tests/test_pallas_quantize.py) and as the fallback on non-TPU
backends.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE_N = 1024


def _auto_interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Nearest-code search
# ---------------------------------------------------------------------------

def _nearest_kernel(z_ref, cbt_ref, out_ref):
    """One tile: z [TILE_N, D], codebook^T [D, K] -> indices [TILE_N, 1] i32.

    The codebook arrives pre-transposed so the MXU contraction is a plain
    (M,K)x(K,N) matmul. Contracting dim 1 of both operands instead forces an
    in-kernel transpose that Mosaic unrolls into ~128MB of register spills
    on v5e — measured, not hypothetical.
    """
    z = z_ref[:].astype(jnp.float32)
    cbt = cbt_ref[:].astype(jnp.float32)

    # partial distance: ||e||^2 - 2 z.e  (||z||^2 dropped; argmin-invariant)
    e_sq = jnp.sum(cbt * cbt, axis=0, keepdims=True)  # (1, K), lane-major
    cross = jax.lax.dot_general(
        z, cbt,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TILE_N, K)
    dist = e_sq - 2.0 * cross

    # jnp.argmin guarantees first-minimum tie-breaking (== torch.argmin) and
    # lowers to a native Mosaic cross-lane reduction.
    idx = jnp.argmin(dist, axis=1)
    out_ref[:] = idx[:, None].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def fused_nearest_indices(
    flat_z: jnp.ndarray,
    codebook: jnp.ndarray,
    *,
    tile_n: int = DEFAULT_TILE_N,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """flat_z [N, D], codebook [K, D] -> int32 indices [N].

    N is padded up to a tile multiple internally; callers pass any N.
    """
    if interpret is None:
        interpret = _auto_interpret()
    n, d = flat_z.shape
    k = codebook.shape[0]
    tile = min(tile_n, max(128, -(-n // 128) * 128))
    n_pad = -(-n // tile) * tile
    if n_pad != n:
        flat_z = jnp.pad(flat_z, ((0, n_pad - n), (0, 0)))
    n_tiles = n_pad // tile

    # Index IO uses [N, 1] column layout: the last dim equals the full array
    # dim and the sublane dim is a tile multiple — satisfies Mosaic's block
    # tiling constraints, which reject (1, TILE) row blocks.
    out = pl.pallas_call(
        _nearest_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        interpret=interpret,
    )(flat_z, codebook.T)
    return out.reshape(n_pad)[:n]


# ---------------------------------------------------------------------------
# Dequantize (codebook lookup as matmul)
# ---------------------------------------------------------------------------

def _dequant_kernel(idx_ref, cb_ref, out_ref):
    """One tile: idx [TILE_N, 1] i32, codebook [K, D] -> vectors [TILE_N, D]."""
    idx = idx_ref[:, 0]  # (TILE_N,)
    cb = cb_ref[:]
    k = cb.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], k), 1)
    one_hot = (col == idx[:, None]).astype(cb.dtype)
    # MXU accumulators must be 32-bit; cast down only on the way out.
    out_ref[:] = jax.lax.dot_general(
        one_hot, cb,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cb.dtype)


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def fused_dequantize(
    indices: jnp.ndarray,
    codebook: jnp.ndarray,
    *,
    tile_n: int = DEFAULT_TILE_N,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """indices [N] (any int dtype), codebook [K, D] -> vectors [N, D]."""
    if interpret is None:
        interpret = _auto_interpret()
    n = indices.shape[0]
    k, d = codebook.shape
    tile = min(tile_n, max(128, -(-n // 128) * 128))
    n_pad = -(-n // tile) * tile
    idx = indices.astype(jnp.int32)
    if n_pad != n:
        idx = jnp.pad(idx, (0, n_pad - n))
    n_tiles = n_pad // tile

    out = pl.pallas_call(
        _dequant_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, d), codebook.dtype),
        interpret=interpret,
    )(idx.reshape(n_pad, 1), codebook)
    return out[:n]


# ---------------------------------------------------------------------------
# Fused projection + nearest-code scoring
# ---------------------------------------------------------------------------
#
# The encoder ends with a 1x1 projection z = h @ P + b followed by
# argmin_k(||e_k||^2 - 2 z.e_k). Both are linear in h, so at inference they
# compose into ONE score matmul:
#
#     idx = argmin(h @ M + c),   M = -2 P E^T   (F, K),
#                                 c = ||e||^2 - 2 b E^T   (K,)
#
# eliminating the projection AND the D-dim latent entirely (measured: the
# separate proj + quantize stages cost ~4x the FLOPs and ~10x the time of
# the fused score on v5e). Exact up to fp reassociation.

def fold_proj_into_scores(proj_w, proj_b, codebook):
    """proj_w (1,1,1,F,D) or (F,D), proj_b (D,), codebook (K,D) ->
    (M (F,K) f32, c (1,K) f32), computed in f64 for stability."""
    import numpy as np

    w = np.asarray(proj_w, np.float64).reshape(-1, np.asarray(codebook).shape[1])
    b = np.asarray(proj_b, np.float64)
    e = np.asarray(codebook, np.float64)
    m = -2.0 * (w @ e.T)
    c = np.sum(e * e, axis=1) - 2.0 * (b @ e.T)
    return (jnp.asarray(m, jnp.float32), jnp.asarray(c[None, :], jnp.float32))


def _score_argmin_kernel(h_ref, m_ref, c_ref, out_ref):
    """One tile: h [TILE_N, F], M [F, K], c [1, K] -> indices [TILE_N, 1]."""
    h = h_ref[:].astype(jnp.float32)
    m = m_ref[:].astype(jnp.float32)
    scores = jax.lax.dot_general(
        h, m,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + c_ref[:]
    idx = jnp.argmin(scores, axis=1)
    out_ref[:] = idx[:, None].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def fused_score_argmin(
    h_flat: jnp.ndarray,
    m: jnp.ndarray,
    c: jnp.ndarray,
    *,
    tile_n: int = DEFAULT_TILE_N,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """h_flat [N, F], M [F, K], c [1, K] -> int32 indices [N]."""
    if interpret is None:
        interpret = _auto_interpret()
    n, f = h_flat.shape
    k = m.shape[1]
    tile = min(tile_n, max(128, -(-n // 128) * 128))
    n_pad = -(-n // tile) * tile
    if n_pad != n:
        h_flat = jnp.pad(h_flat, ((0, n_pad - n), (0, 0)))
    n_tiles = n_pad // tile

    out = pl.pallas_call(
        _score_argmin_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        interpret=interpret,
    )(h_flat, m, c)
    return out.reshape(n_pad)[:n]


def score_argmin_xla(h_flat: jnp.ndarray, m: jnp.ndarray, c: jnp.ndarray
                     ) -> jnp.ndarray:
    """Pure-XLA twin of fused_score_argmin (oracle + non-TPU fallback)."""
    scores = jnp.dot(h_flat.astype(jnp.float32), m,
                     preferred_element_type=jnp.float32) + c
    return jnp.argmin(scores, axis=1)

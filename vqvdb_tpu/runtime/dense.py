"""Device-resident dense volume <-> .vqvdb codec paths.

The host-side cost model (docs/DP_SCALING.md) showed file-level decode is
bound by host memcpy (~1.4M leaves/s per pipeline on a 1-core host): every
decoded byte crosses device->host, then gets scattered into a dense array
by the CPU. The reference has the same shape of cost — its decode scatter
is a TBB loop over host leaves (ref: src/orchestrator/VQVAECodec.cpp
decode scatter, :182-192). This module removes that wall for consumers who
want a *dense* volume on device (ML pipelines, simulators, renderers):

  decode_to_dense   indices -> dense [X,Y,Z,C] entirely on device. ONE
                    compiled program: `lax.scan` over fixed-shape index
                    batches, each batch decoded and row-scattered into a
                    [nB+1, 512*C] blocks buffer (the +1 "trash" row absorbs
                    padded rows), final reshape/transpose to voxel order.
                    One dispatch per grid — nothing but the input indices
                    (64 B/leaf) crosses the host boundary.
  encode_from_dense dense -> (indices, origins). Per-block activity is
                    reduced on device (only nB floats come back to pick the
                    active set — mirrors OpenVDB sparsification semantics,
                    LeafGrid.from_dense), then one gather+encode scan.

Together these close the loop for on-device pipelines: a simulation state
living in HBM can be compressed to indices and written to .vqvdb without
materializing leaves on the host, and a .vqvdb can be decoded straight
into an HBM-resident dense field.

Sizing: the dense buffer must fit HBM — a 512^3 float volume is 512 MB,
comfortably inside a v5e's 16 GB. Compilation is per (bbox block dims,
step count); reuse the same codec across calls to hit jit's cache.

Single-device by design: the scatter/gather target is one unsharded HBM
buffer. Data-parallel meshes shard the *leaf* axis (parallel/mesh.py);
sharding a scatter destination would route rows through all-to-alls for
no bandwidth win at this model size.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from vqvdb_tpu.core.config import LEAF_DIM
from vqvdb_tpu.utils.errors import VqvdbError

Array = jax.Array
PathLike = Union[str, Path]


def _check_single_device(codec) -> None:
    if codec.mesh is not None:
        raise ValueError(
            "dense device paths are single-device; build the codec without "
            "a mesh (the dense buffer is one unsharded HBM array)")


def _block_plan(origins: np.ndarray, lo: Optional[np.ndarray] = None,
                shape: Optional[Tuple[int, int, int]] = None,
                ) -> Tuple[np.ndarray, Tuple[int, int, int], np.ndarray]:
    """(lo, block dims (nx,ny,nz), per-leaf linear block ids).

    `lo`/`shape` (voxel units) override the origins' bounding box — pass
    them to decode into a caller-fixed frame (e.g. an animation's union
    bbox so every frame compiles once).
    """
    origins = np.ascontiguousarray(origins, np.int32).reshape(-1, 3)
    if np.any(origins % LEAF_DIM):
        raise VqvdbError("leaf origins must be multiples of 8")
    if lo is None:
        lo = (origins.min(axis=0) if origins.shape[0]
              else np.zeros(3, np.int32))
    lo = np.asarray(lo, np.int32)
    if np.any(lo % LEAF_DIM):
        raise VqvdbError("dense lower corner must be a multiple of 8")
    if shape is None:
        hi = (origins.max(axis=0) + LEAF_DIM if origins.shape[0]
              else lo)
        ext = hi - lo
    else:
        ext = np.asarray(shape, np.int64)
        if np.any(ext % LEAF_DIM):
            raise VqvdbError("dense shape must be multiples of 8")
    bdims = tuple(int(e) // LEAF_DIM for e in ext)
    bi = (origins - lo) // LEAF_DIM
    if origins.shape[0] and (np.any(bi < 0) or np.any(bi >= np.array(bdims))):
        raise VqvdbError("leaf origins fall outside the dense bounds")
    bids = np.ravel_multi_index(
        (bi[:, 0], bi[:, 1], bi[:, 2]), bdims
    ).astype(np.int32) if origins.shape[0] else np.zeros(0, np.int32)
    return lo, bdims, bids


def _pad_steps(arr: np.ndarray, bs: int, fill) -> np.ndarray:
    """[N,...] -> [steps, bs, ...] zero-padded to a whole number of steps."""
    n = arr.shape[0]
    steps = max(1, -(-n // bs))
    out = np.full((steps * bs,) + arr.shape[1:], fill, arr.dtype)
    out[:n] = arr
    return out.reshape((steps, bs) + arr.shape[1:])


def _dense_decode_fn(codec):
    """Jitted (params, idx_steps, bid_steps, nB*, bdims*, background) ->
    dense [X,Y,Z,C]; cached on the codec so jit's shape cache is hit."""
    fn = getattr(codec, "_dense_decode_jit", None)
    if fn is not None:
        return fn

    c = codec.mcfg.in_channels
    row = LEAF_DIM ** 3 * c

    def decode_dense(params, idx_steps, bid_steps, n_blocks, bdims,
                     background):
        buf = jnp.full((n_blocks + 1, row), background, jnp.float32)

        def body(buf, xs):
            idx_b, bid_b = xs
            dec = codec._decode_step(params, idx_b)  # [bs,8,8,8,C] f32
            return buf.at[bid_b].set(dec.reshape(dec.shape[0], row)), None

        buf, _ = jax.lax.scan(body, buf, (idx_steps, bid_steps))
        nx, ny, nz = bdims
        ld = LEAF_DIM
        blocks = buf[:n_blocks].reshape(nx, ny, nz, ld, ld, ld, c)
        return blocks.transpose(0, 3, 1, 4, 2, 5, 6).reshape(
            nx * ld, ny * ld, nz * ld, c)

    fn = jax.jit(decode_dense, static_argnums=(3, 4))
    codec._dense_decode_jit = fn
    return fn


def _to_blocks(dense: jnp.ndarray) -> jnp.ndarray:
    """[X,Y,Z,C] (multiples of 8) -> [nB, 512*C] leaf-major rows."""
    x, y, z, c = dense.shape
    ld = LEAF_DIM
    blocks = dense.reshape(x // ld, ld, y // ld, ld, z // ld, ld, c)
    return blocks.transpose(0, 2, 4, 1, 3, 5, 6).reshape(-1, ld ** 3 * c)


def _dense_encode_fns(codec):
    """(activity_fn, encode_fn), jitted and cached on the codec."""
    fns = getattr(codec, "_dense_encode_jit", None)
    if fns is not None:
        return fns

    c = codec.mcfg.in_channels
    ld = LEAF_DIM

    def activity(dense, background, tolerance):
        rows = _to_blocks(dense)
        return jnp.max(jnp.abs(rows - background), axis=1) > tolerance

    def encode(params, dense, bid_steps):
        rows = _to_blocks(dense)

        def body(_, bid_b):
            leaves = rows[bid_b].reshape(bid_b.shape[0], ld, ld, ld, c)
            return None, codec._encode_step(params, leaves)

        _, idx = jax.lax.scan(body, None, bid_steps)
        return idx.reshape((-1,) + codec.mcfg.index_shape)

    fns = (jax.jit(activity), jax.jit(encode))
    codec._dense_encode_jit = fns
    return fns


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def decode_to_dense(
    codec,
    indices: np.ndarray,
    origins: np.ndarray,
    *,
    lo: Optional[Sequence[int]] = None,
    shape: Optional[Tuple[int, int, int]] = None,
    background: float = 0.0,
) -> Tuple[Array, np.ndarray]:
    """Decode [N,4,4,4] indices into a device-resident dense volume.

    Returns (dense jax.Array [X,Y,Z,C] f32 — still on device — and the
    bbox lower corner, index space). `lo`/`shape` pin the output frame;
    by default it is the origins' bounding box. Inactive voxels hold
    `background`. `np.asarray(dense)` materializes on the host if needed.
    """
    _check_single_device(codec)
    indices = np.ascontiguousarray(indices,
                                   np.dtype(codec.mcfg.index_dtype))
    lo_arr, bdims, bids = _block_plan(origins,
                                      None if lo is None else np.asarray(lo),
                                      shape)
    n_blocks = int(np.prod(bdims)) if indices.shape[0] else 0
    if indices.shape[0] == 0:
        c = codec.mcfg.in_channels
        return jnp.zeros((0, 0, 0, c), jnp.float32), lo_arr
    bs = codec.ccfg.batch_size
    idx_steps = _pad_steps(indices, bs, 0)
    # Padded rows scatter into the trash row (index n_blocks).
    bid_steps = _pad_steps(bids, bs, n_blocks)
    fn = _dense_decode_fn(codec)
    dense = fn(codec.params, jnp.asarray(idx_steps), jnp.asarray(bid_steps),
               n_blocks, bdims, jnp.float32(background))
    return dense, lo_arr


def encode_from_dense(
    codec,
    dense: Union[np.ndarray, Array],
    *,
    origin: Sequence[int] = (0, 0, 0),
    background: float = 0.0,
    tolerance: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Sparsify + encode a dense volume on device.

    Mirrors `LeafGrid.from_dense` semantics (a leaf is active when any
    voxel deviates from `background` by more than `tolerance`) but the
    volume never has to visit the host: per-block activity is a device
    reduction (nB booleans come back — 4 bytes per *leaf*, not 2 KiB),
    then active blocks are gathered and encoded in one scanned program.

    Returns (indices [N,4,4,4], origins [N,3] int32) as host arrays,
    ready for `VqvdbWriter.write_batch` / `LeafGrid` construction.
    """
    _check_single_device(codec)
    dense = jnp.asarray(dense, jnp.float32)
    if dense.ndim == 3:
        dense = dense[..., None]
    if dense.shape[-1] != codec.mcfg.in_channels:
        raise VqvdbError(
            f"dense has {dense.shape[-1]} channels, model wants "
            f"{codec.mcfg.in_channels}")
    ld = LEAF_DIM
    x, y, z, _ = dense.shape
    pads = [(-d) % ld for d in (x, y, z)]
    if any(pads):
        dense = jnp.pad(dense,
                        [(0, pads[0]), (0, pads[1]), (0, pads[2]), (0, 0)],
                        constant_values=background)
        x, y, z, _ = dense.shape
    bdims = (x // ld, y // ld, z // ld)
    activity_fn, encode_fn = _dense_encode_fns(codec)
    act = np.asarray(activity_fn(dense, jnp.float32(background),
                                 jnp.float32(tolerance)))
    (flat,) = np.nonzero(act)
    bi = np.stack(np.unravel_index(flat, bdims), axis=1)
    origins = (bi.astype(np.int32) * ld
               + np.asarray(origin, np.int32)).astype(np.int32)
    n = flat.shape[0]
    if n == 0:
        return (np.zeros((0,) + codec.mcfg.index_shape,
                         np.dtype(codec.mcfg.index_dtype)),
                origins)
    bs = codec.ccfg.batch_size
    # Padding rows gather block 0 (a real block) and are cropped after.
    bid_steps = _pad_steps(flat.astype(np.int32), bs, 0)
    idx = encode_fn(codec.params, dense, jnp.asarray(bid_steps))
    return np.asarray(idx[:n]), origins


def decode_file_to_dense(
    codec,
    in_path: PathLike,
    *,
    background: float = 0.0,
) -> List[dict]:
    """Decode every grid of a `.vqvdb` file into device-resident dense
    volumes. Returns [{name, dense (device [X,Y,Z,C]), lo, transform}].

    The host touches only the compact payload (indices at 64 B/leaf +
    origins): batches are collected per grid (to know the bbox before the
    buffer is allocated), then decoded + scattered in one dispatch.
    """
    from vqvdb_tpu.format.vqvdb import VqvdbReader
    from vqvdb_tpu.utils.errors import ModelMismatchError

    _check_single_device(codec)
    out: List[dict] = []
    with VqvdbReader(in_path) as r:
        if r.num_embeddings != codec.mcfg.num_embeddings:
            raise ModelMismatchError(
                f"file has {r.num_embeddings} embeddings, model has "
                f"{codec.mcfg.num_embeddings}")
        while r.has_next_grid():
            meta = r.next_grid_metadata()
            if tuple(meta.latent_shape) != codec.mcfg.index_shape:
                raise ModelMismatchError(
                    f"file latent shape {meta.latent_shape} != model "
                    f"{codec.mcfg.index_shape}")
            if meta.residual_mode:
                import warnings

                warnings.warn(
                    f"grid '{meta.name}' carries a v6 residual-correction "
                    "stream; the dense device path decodes indices only "
                    "(lossy). Use codec.decompress for the corrected "
                    "output.", stacklevel=2)
            idx_parts, org_parts = [], []
            while r.has_next():
                idx, org = r.next_batch(codec.ccfg.batch_size)
                idx_parts.append(idx)
                org_parts.append(org)
            indices = (np.concatenate(idx_parts) if idx_parts
                       else np.zeros((0,) + codec.mcfg.index_shape,
                                     np.dtype(codec.mcfg.index_dtype)))
            origins = (np.concatenate(org_parts) if org_parts
                       else np.zeros((0, 3), np.int32))
            dense, lo = decode_to_dense(codec, indices, origins,
                                        background=background)
            out.append({"name": meta.name, "dense": dense, "lo": lo,
                        "transform": meta.transform})
    return out


def encode_dense_to_file(
    codec,
    dense: Union[np.ndarray, Array],
    out_path: PathLike,
    *,
    name: str = "density",
    origin: Sequence[int] = (0, 0, 0),
    background: float = 0.0,
    tolerance: float = 0.0,
    transform: Optional[np.ndarray] = None,
    format_version: Optional[int] = None,
    compression: str = "zlib",
) -> dict:
    """Sparsify + encode a (device-resident) dense volume straight to a
    `.vqvdb` file. The volume itself never crosses to the host — only the
    activity mask and the compressed indices do."""
    from vqvdb_tpu.format.vqvdb import GridMetadata, VqvdbWriter

    indices, origins = encode_from_dense(
        codec, dense, origin=origin, background=background,
        tolerance=tolerance)
    if format_version is None:
        format_version = 3 if codec.mcfg.num_embeddings <= 256 else 4
    meta = GridMetadata(
        name=name,
        num_embeddings=codec.mcfg.num_embeddings,
        latent_shape=codec.mcfg.index_shape,
        total_blocks=int(indices.shape[0]),
        transform=(np.eye(4, dtype=np.float32) if transform is None
                   else np.asarray(transform, np.float32)),
    )
    with VqvdbWriter(out_path, version=format_version,
                     compression=compression) as w:
        w.start_grid(meta)
        bs = codec.ccfg.batch_size
        for s in range(0, indices.shape[0], bs):
            w.write_batch(indices[s:s + bs], origins[s:s + bs])
        w.end_grid()
    return {"leaves": int(indices.shape[0]),
            "bytes": Path(out_path).stat().st_size}

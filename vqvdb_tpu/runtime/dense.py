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
                    Mesh-capable like decode (x-slab sharding in reverse).

Together these close the loop for on-device pipelines: a simulation state
living in HBM can be compressed to indices and written to .vqvdb without
materializing leaves on the host, and a .vqvdb can be decoded straight
into an HBM-resident dense field.

Sizing: the dense buffer must fit HBM — a 512^3 float volume is 512 MB,
comfortably inside a v5e's 16 GB. Compilation is per (bbox block dims,
step count); reuse the same codec across calls to hit jit's cache.

Mesh execution (codec built with a mesh): the dense volume is sharded by
x-slabs of leaf blocks over the 1-D data mesh. The host partitions the
block plan per slab (each leaf's scatter target determines its owner), each
device decodes + scatters ONLY its slab's leaves into its local buffer
shard, and the assembled global array comes back sharded along X — no
cross-chip traffic in the step at all (scatter/gather stay shard-local by
construction; the only cost of skew is padded steps on underfull shards).
Output is bit-identical to the single-device path: per-leaf decode is the
same compiled math and scatter placement is exact.

v6 residual archives are corrected ON DEVICE: the compact stored stream
(int8 rows + f32 scales, or f16 rows — the same bytes the file holds) rides
up with the indices and the correction is added inside the scan, so the
near-lossless tier's bound survives without the 2 KiB/leaf host round trip
the sparse path pays (math identical to runtime/residual.apply_residual).
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
    return lo, bdims, bids, bi.astype(np.int32)


def _pad_steps(arr: np.ndarray, bs: int, fill) -> np.ndarray:
    """[N,...] -> [steps, bs, ...] zero-padded to a whole number of steps."""
    n = arr.shape[0]
    steps = max(1, -(-n // bs))
    out = np.full((steps * bs,) + arr.shape[1:], fill, arr.dtype)
    out[:n] = arr
    return out.reshape((steps, bs) + arr.shape[1:])


def _scan_scatter(codec, buf, idx_steps, bid_steps, sc_steps, res_steps,
                  params, mode: Optional[str]):
    """Decode + (optional residual-correct) + row-scatter scan into buf.

    The correction math mirrors runtime/residual.apply_residual exactly
    (f32 residual add, int8 rows scaled per leaf) so device-corrected
    output is bit-identical to the host path's."""
    row = buf.shape[-1]

    def body(buf, xs):
        if mode == "int8":
            idx_b, bid_b, sc_b, res_b = xs
        elif mode == "f16":
            idx_b, bid_b, res_b = xs
        else:
            idx_b, bid_b = xs
        dec = codec._decode_step(params, idx_b)  # [bs,8,8,8,C] f32
        rows = dec.reshape(dec.shape[0], row)
        if mode == "int8":
            # Round the product before the add (optimization_barrier blocks
            # FMA contraction) so the device correction is bit-identical to
            # the host path's two-step numpy math, not 1 ulp off.
            corr = jax.lax.optimization_barrier(
                res_b.astype(jnp.float32) * sc_b[:, None])
            rows = rows + corr
        elif mode == "f16":
            rows = rows + res_b.astype(jnp.float32)
        return buf.at[bid_b].set(rows), None

    xs = (idx_steps, bid_steps)
    if mode == "int8":
        xs = (idx_steps, bid_steps, sc_steps, res_steps)
    elif mode == "f16":
        xs = (idx_steps, bid_steps, res_steps)
    buf, _ = jax.lax.scan(body, buf, xs)
    return buf


def _blocks_to_dense(buf, n_blocks: int, bdims, c: int):
    nx, ny, nz = bdims
    ld = LEAF_DIM
    blocks = buf[:n_blocks].reshape(nx, ny, nz, ld, ld, ld, c)
    return blocks.transpose(0, 3, 1, 4, 2, 5, 6).reshape(
        nx * ld, ny * ld, nz * ld, c)


def _dense_decode_fn(codec, mode: Optional[str]):
    """Jitted (params, idx_steps, bid_steps, sc_steps, res_steps, nB*,
    bdims*, background) -> dense [X,Y,Z,C]; cached per residual mode on the
    codec so jit's shape cache is hit."""
    cache = getattr(codec, "_dense_decode_jit", None)
    if cache is None:
        cache = codec._dense_decode_jit = {}
    if mode in cache:
        return cache[mode]

    c = codec.mcfg.in_channels
    row = LEAF_DIM ** 3 * c

    def decode_dense(params, idx_steps, bid_steps, sc_steps, res_steps,
                     n_blocks, bdims, background):
        buf = jnp.full((n_blocks + 1, row), background, jnp.float32)
        buf = _scan_scatter(codec, buf, idx_steps, bid_steps, sc_steps,
                            res_steps, params, mode)
        return _blocks_to_dense(buf, n_blocks, bdims, c)

    fn = jax.jit(decode_dense, static_argnums=(5, 6))
    cache[mode] = fn
    return fn


def _mesh_dense_decode_fn(codec, mode: Optional[str]):
    """Mesh variant: per-shard scan into the local slab buffer; the global
    result assembles sharded along X (out_spec P(data) on the slab axis).

    Inputs arrive [n_dev, steps, bs, ...] — axis 0 is the shard axis the
    host partitioned by slab ownership."""
    cache = getattr(codec, "_mesh_dense_decode_jit", None)
    if cache is None:
        cache = codec._mesh_dense_decode_jit = {}
    if mode in cache:
        return cache[mode]

    from jax.sharding import PartitionSpec as P

    from vqvdb_tpu.parallel.mesh import DATA_AXIS, _shard_map

    mesh = codec.mesh
    c = codec.mcfg.in_channels
    row = LEAF_DIM ** 3 * c

    def decode_dense(params, idx_steps, bid_steps, sc_steps, res_steps,
                     n_local, bdims, background):
        arrs = [idx_steps, bid_steps]
        if mode == "int8":
            arrs += [sc_steps, res_steps]
        elif mode == "f16":
            arrs += [res_steps]

        def local(params, background, *shard_arrs):
            idx_s, bid_s = shard_arrs[0][0], shard_arrs[1][0]
            sc_s = shard_arrs[2][0] if mode == "int8" else None
            res_s = shard_arrs[-1][0] if mode else None
            buf = jnp.full((n_local + 1, row), background, jnp.float32)
            buf = _scan_scatter(codec, buf, idx_s, bid_s, sc_s, res_s,
                                params, mode)
            return buf[None, :n_local]

        spec = (P(), P()) + (P(DATA_AXIS),) * len(arrs)
        mapped = _shard_map(local, mesh, in_specs=spec,
                            out_specs=P(DATA_AXIS))
        blocks = mapped(params, background, *arrs)
        # [n_dev, n_local, row] sharded on axis 0; slabs are x-major, so
        # flattening the shard axis into the block axis is exact.
        nx_pad = blocks.shape[0] * (n_local // (bdims[1] * bdims[2]))
        dense = _blocks_to_dense(blocks.reshape(-1, row),
                                 blocks.shape[0] * n_local,
                                 (nx_pad, bdims[1], bdims[2]), c)
        return dense[: bdims[0] * LEAF_DIM]  # crop slab padding

    fn = jax.jit(decode_dense, static_argnums=(5, 6))
    cache[mode] = fn
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


def _mesh_dense_encode_fns(codec):
    """Mesh variant of _dense_encode_fns: the dense volume is sharded by
    x-voxel slabs over the 1-D data mesh (the decode path's partition, in
    reverse). Activity reduces shard-locally; each device then gathers and
    encodes ONLY its slab's active blocks — no cross-chip traffic in
    either step, bit-identical to the single-device path (same per-leaf
    math on the same values)."""
    fns = getattr(codec, "_mesh_dense_encode_jit", None)
    if fns is not None:
        return fns

    from jax.sharding import PartitionSpec as P

    from vqvdb_tpu.parallel.mesh import DATA_AXIS, _shard_map

    mesh = codec.mesh
    c = codec.mcfg.in_channels
    ld = LEAF_DIM

    def activity(dense, background, tolerance):
        def local(d, bg, tol):
            rows = _to_blocks(d)
            return jnp.max(jnp.abs(rows - bg), axis=1) > tol

        return _shard_map(local, mesh, in_specs=(P(DATA_AXIS), P(), P()),
                          out_specs=P(DATA_AXIS))(
            dense, background, tolerance)

    def encode(params, dense, bid_steps):
        def local(p, d, bid_s):
            rows = _to_blocks(d)

            def body(_, bid_b):
                leaves = rows[bid_b].reshape(bid_b.shape[0], ld, ld, ld, c)
                return None, codec._encode_step(p, leaves)

            _, idx = jax.lax.scan(body, None, bid_s[0])
            return idx.reshape((1, -1) + codec.mcfg.index_shape)

        return _shard_map(local, mesh,
                          in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
                          out_specs=P(DATA_AXIS))(params, dense, bid_steps)

    fns = (jax.jit(activity), jax.jit(encode))
    codec._mesh_dense_encode_jit = fns
    return fns


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def _residual_mode(scales, residual) -> Optional[str]:
    if residual is None:
        return None
    if residual.dtype == np.int8:
        if scales is None:
            raise VqvdbError("int8 residual stream requires per-leaf scales")
        return "int8"
    if residual.dtype == np.float16:
        return "f16"
    raise VqvdbError(f"unknown residual dtype {residual.dtype}")


def decode_to_dense(
    codec,
    indices: np.ndarray,
    origins: np.ndarray,
    *,
    lo: Optional[Sequence[int]] = None,
    shape: Optional[Tuple[int, int, int]] = None,
    background: float = 0.0,
    scales: Optional[np.ndarray] = None,
    residual: Optional[np.ndarray] = None,
) -> Tuple[Array, np.ndarray]:
    """Decode [N,4,4,4] indices into a device-resident dense volume.

    Returns (dense jax.Array [X,Y,Z,C] f32 — still on device — and the
    bbox lower corner, index space). `lo`/`shape` pin the output frame;
    by default it is the origins' bounding box. Inactive voxels hold
    `background`. `np.asarray(dense)` materializes on the host if needed.

    scales/residual: a v6 near-lossless correction stream (per-leaf f32
    scales + int8 rows, or f16 rows — see runtime/residual.py). The
    correction is applied on device inside the scatter scan, preserving
    the tier's error bound without any host-side leaf materialization.

    With a mesh codec the volume is decoded data-parallel, sharded by
    x-slabs (module docstring); output is bit-identical to single-device.
    """
    indices = np.ascontiguousarray(indices,
                                   np.dtype(codec.mcfg.index_dtype))
    mode = _residual_mode(scales, residual)
    lo_arr, bdims, bids, bi = _block_plan(
        origins, None if lo is None else np.asarray(lo), shape)
    n_blocks = int(np.prod(bdims)) if indices.shape[0] else 0
    if indices.shape[0] == 0:
        c = codec.mcfg.in_channels
        return jnp.zeros((0, 0, 0, c), jnp.float32), lo_arr
    bs = codec.ccfg.batch_size

    if codec.mesh is None:
        idx_steps = _pad_steps(indices, bs, 0)
        # Padded rows scatter into the trash row (index n_blocks).
        bid_steps = _pad_steps(bids, bs, n_blocks)
        sc_steps = res_steps = None
        if mode == "int8":
            sc_steps = jnp.asarray(_pad_steps(
                np.ascontiguousarray(scales, np.float32), bs, 0))
        if mode:
            res_steps = jnp.asarray(_pad_steps(
                np.ascontiguousarray(residual), bs, 0))
        fn = _dense_decode_fn(codec, mode)
        dense = fn(codec.params, jnp.asarray(idx_steps),
                   jnp.asarray(bid_steps), sc_steps, res_steps,
                   n_blocks, bdims, jnp.float32(background))
        return dense, lo_arr

    # Mesh: partition leaves by x-slab owner, pad every shard to the same
    # step count, decode+scatter shard-locally. The partition is built
    # from host-global arrays, so this requires every mesh device to be
    # addressable from this process.
    if getattr(codec, "_multihost", False):
        raise VqvdbError(
            "dense decode builds host-global shard inputs and supports "
            "single-process meshes only; in multi-host runs use the file "
            "codec paths (which are multihost-aware) or a process-local "
            "mesh")
    n_dev = int(codec.mesh.devices.size)
    nx, ny, nz = bdims
    nx_local = -(-nx // n_dev)
    n_local = nx_local * ny * nz
    owner = bi[:, 0] // nx_local
    local_bids = (((bi[:, 0] % nx_local) * ny + bi[:, 1]) * nz
                  + bi[:, 2]).astype(np.int32)
    counts = np.bincount(owner, minlength=n_dev)
    steps = max(1, -(-int(counts.max()) // bs))
    shp = (n_dev, steps * bs)
    idx_dev = np.zeros(shp + indices.shape[1:], indices.dtype)
    bid_dev = np.full(shp, n_local, np.int32)  # trash row
    sc_dev = np.zeros(shp, np.float32) if mode == "int8" else None
    res_dev = (np.zeros(shp + residual.shape[1:], residual.dtype)
               if mode else None)
    for k in range(n_dev):
        sel = owner == k
        m = int(counts[k])
        idx_dev[k, :m] = indices[sel]
        bid_dev[k, :m] = local_bids[sel]
        if sc_dev is not None:
            sc_dev[k, :m] = scales[sel]
        if res_dev is not None:
            res_dev[k, :m] = residual[sel]

    def _steps(a):
        return jnp.asarray(a.reshape((n_dev, steps, bs) + a.shape[2:]))

    fn = _mesh_dense_decode_fn(codec, mode)
    dense = fn(codec.params, _steps(idx_dev), _steps(bid_dev),
               None if sc_dev is None else _steps(sc_dev),
               None if res_dev is None else _steps(res_dev),
               n_local, bdims, jnp.float32(background))
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

    With a mesh codec the volume is sharded by x-voxel slabs (the decode
    partition in reverse): activity reduces shard-locally, every device
    encodes only its slab's active blocks, and the result is bit-identical
    to single-device (same per-leaf math, origin-major order preserved —
    slabs are x-major). Requires a single-process mesh, like decode.
    """
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
    bs = codec.ccfg.batch_size

    if codec.mesh is not None:
        if getattr(codec, "_multihost", False):
            raise VqvdbError(
                "dense encode builds host-global shard inputs and supports "
                "single-process meshes only; in multi-host runs use the "
                "file codec paths (which are multihost-aware) or a "
                "process-local mesh")
        n_dev = int(codec.mesh.devices.size)
        nx_local = -(-(x + pads[0]) // ld // n_dev)
        # Pad x so every device owns an equal slab of leaf blocks.
        pads[0] = nx_local * n_dev * ld - x
    if any(pads):
        dense = jnp.pad(dense,
                        [(0, pads[0]), (0, pads[1]), (0, pads[2]), (0, 0)],
                        constant_values=background)
        x, y, z, _ = dense.shape
    bdims = (x // ld, y // ld, z // ld)

    if codec.mesh is not None:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from vqvdb_tpu.parallel.mesh import DATA_AXIS

        dense = jax.device_put(
            dense, NamedSharding(codec.mesh, P(DATA_AXIS)))
        activity_fn, encode_fn = _mesh_dense_encode_fns(codec)
        act = np.asarray(activity_fn(dense, jnp.float32(background),
                                     jnp.float32(tolerance)))
        (flat,) = np.nonzero(act)
        bi = np.stack(np.unravel_index(flat, bdims), axis=1)
        origins = (bi.astype(np.int32) * ld
                   + np.asarray(origin, np.int32)).astype(np.int32)
        n = flat.shape[0]
        if n == 0:
            return (np.zeros((0,) + codec.mcfg.index_shape,
                             np.dtype(codec.mcfg.index_dtype)), origins)
        nx_local = bdims[0] // n_dev
        n_local = nx_local * bdims[1] * bdims[2]
        owner = bi[:, 0] // nx_local
        local_flat = (flat - owner * n_local).astype(np.int32)
        counts = np.bincount(owner, minlength=n_dev)
        steps = max(1, -(-int(counts.max()) // bs))
        # Padding rows gather local block 0 and are cropped per shard;
        # x-major active order is owner-grouped, so per-shard concatenation
        # preserves the single-device origin order exactly.
        bid_dev = np.zeros((n_dev, steps * bs), np.int32)
        for k in range(n_dev):
            bid_dev[k, : int(counts[k])] = local_flat[owner == k]
        idx = encode_fn(codec.params, dense,
                        jnp.asarray(bid_dev.reshape(n_dev, steps, bs)))
        idx = np.asarray(idx)
        out = np.concatenate([idx[k, : int(counts[k])]
                              for k in range(n_dev)])
        return out, origins

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
    origins, plus the v6 residual stream if present): batches are collected
    per grid (to know the bbox before the buffer is allocated), then
    decoded + scattered in one dispatch. v6 residual grids are corrected on
    device inside the scan — the near-lossless tier's error bound holds on
    this path too (it decoded indices-only through round 3).
    """
    from vqvdb_tpu.format.vqvdb import VqvdbReader
    from vqvdb_tpu.utils.errors import ModelMismatchError

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
            if (meta.residual_mode
                    and meta.residual_channels != codec.mcfg.in_channels):
                raise ModelMismatchError(
                    f"file residual stream has {meta.residual_channels} "
                    f"channels, model decodes {codec.mcfg.in_channels}")
            idx_parts, org_parts, sc_parts, res_parts = [], [], [], []
            while r.has_next():
                idx, org, sc, res = r.next_batch_residual(
                    codec.ccfg.batch_size)
                idx_parts.append(idx)
                org_parts.append(org)
                if sc is not None:
                    sc_parts.append(sc)
                if res is not None:
                    res_parts.append(res)
            indices = (np.concatenate(idx_parts) if idx_parts
                       else np.zeros((0,) + codec.mcfg.index_shape,
                                     np.dtype(codec.mcfg.index_dtype)))
            origins = (np.concatenate(org_parts) if org_parts
                       else np.zeros((0, 3), np.int32))
            scales = np.concatenate(sc_parts) if sc_parts else None
            residual = np.concatenate(res_parts) if res_parts else None
            dense, lo = decode_to_dense(codec, indices, origins,
                                        background=background,
                                        scales=scales, residual=residual)
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

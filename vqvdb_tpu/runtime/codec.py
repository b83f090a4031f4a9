"""Streaming codec engine: leaf batches <-> device <-> `.vqvdb` files.

TPU-first redesign of the reference orchestrator (src/orchestrator/
VQVAECodec.cpp). The reference's hot loop is fully synchronous — gather
batch, run device, write, repeat. Here the loop is pipelined for free by
JAX's async dispatch: we enqueue the next device step before materializing
the previous result on the host, so host IO/scatter overlaps device compute
(a software double-buffer; `PIPELINE_DEPTH` device steps in flight).

Other deliberate departures from the reference:
  * Fixed-shape batches — every device step runs at exactly
    `CodecConfig.batch_size` leaves (the ragged tail is zero-padded and
    cropped on the host), so XLA compiles each graph once. The reference
    re-ran ONNX sessions at whatever batch the file produced.
  * The "backend" concept (ONNX/LibTorch x CPU/CUDA, ref src/backends/)
    collapses to one jitted function per direction; platform selection is
    JAX's. The Pallas fused quantizer is used on TPU, the XLA twin elsewhere.
  * The latent-shape probe at init (ref: OnnxBackend_CPU.cpp
    initialize_latent_shape_impl) is kept as a self-check: a zeros batch is
    traced through the encoder and the result must match config.
"""

from __future__ import annotations

import collections
import time
from pathlib import Path
from typing import Callable, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from vqvdb_tpu.core.config import CodecConfig, LEAF_DIM, ModelConfig
from vqvdb_tpu.format.vqvdb import GridMetadata, VqvdbReader, VqvdbWriter
from vqvdb_tpu.models.vqvae import (
    VQVAEParams,
    decoder_apply,
    encoder_apply,
)
from vqvdb_tpu.models.quantizer import dequantize, nearest_indices
from vqvdb_tpu.ops.quantize import fused_dequantize, fused_nearest_indices
from vqvdb_tpu.utils.errors import ModelMismatchError
from vqvdb_tpu.vdb.grid import LeafGrid

PIPELINE_DEPTH = 2


def _use_pallas(cfg: CodecConfig) -> bool:
    return cfg.use_pallas and jax.default_backend() == "tpu"


class VQCodec:
    """Bidirectional streaming codec around a trained VQVAEParams pytree.

    Equivalent surface to the reference's `VQVAECodec` orchestrator +
    backend stack (compress/decompress/encodeBatch/decodeBatch,
    ref: src/orchestrator/VQVAECodec.hpp:40-49).

    `params` is treated as immutable after construction: the exact-rewrite
    fast paths (folded final conv, fused projection scores, packed down
    conv) precompute constants from it at init. Build a new codec for new
    weights.

    With `mesh` (a 1-D jax.sharding.Mesh), every device step runs
    data-parallel: the padded batch is sharded over the mesh's 'data' axis,
    params/codebook replicated, no cross-chip traffic in the step (SURVEY
    §2.3 DP-inference). File-level compress/decompress then produce output
    byte-identical to the single-device codec — proven by
    tests/test_parallel.py.
    """

    def __init__(
        self,
        params: VQVAEParams,
        model_config: ModelConfig,
        codec_config: Optional[CodecConfig] = None,
        profiler=None,
        mesh=None,
    ) -> None:
        from vqvdb_tpu.utils.profiler import Profiler

        self.params = params
        self.mcfg = model_config
        self.ccfg = codec_config or CodecConfig()
        self._encode_jit = jax.jit(self._encode_step)
        self._decode_jit = jax.jit(self._decode_step)
        self._latent_shape_checked = False
        # Stage profiler (host wall clock); pass your own to aggregate
        # across codecs, or read codec.profiler.report() after a run.
        self.profiler = profiler if profiler is not None else Profiler()
        # Inference-time subpixel folding of the decoder's final conv
        # (exact identity; ~25% of decode time on v5e otherwise).
        self._folded_final = None
        self._folded_tail = None
        if self.ccfg.fuse_decoder_tail:
            from vqvdb_tpu.ops.tail import fold_decoder_tail

            # Must happen eagerly (outside any trace): folding lazily inside
            # a traced _decode_step caches tracers and leaks under shard_map.
            self._folded_tail = fold_decoder_tail(params.decoder, self.mcfg)
        elif self.ccfg.fuse_final_conv:
            from vqvdb_tpu.ops.subpixel import fold_final_conv

            fin = params.decoder["final"]
            self._folded_final = fold_final_conv(
                np.asarray(fin["w"], np.float32), np.asarray(fin["b"], np.float32))
        # Encode-side fusion: the 1x1 projection composes with the quantizer
        # distance matmul into one score GEMM (ops/quantize.py,
        # fold_proj_into_scores) — eliminates the D-dim latent entirely.
        # Residual-VQ needs the explicit latent for stage-2+ residuals, so
        # the fold does not apply there (the plain path is used instead).
        self._score_mc = None
        if self.ccfg.fuse_proj_quantize and self.mcfg.num_quantizers == 1:
            from vqvdb_tpu.ops.quantize import fold_proj_into_scores

            proj = params.encoder["proj"]
            self._score_mc = fold_proj_into_scores(
                np.asarray(proj["w"]), np.asarray(proj["b"]),
                np.asarray(params.vq.embedding))
        # Strided down-conv on the space-to-channel packed grid (exact;
        # ops/packed.py) — the slowest encoder stage otherwise. Applies to
        # the reference encoder only: the packed arch has no strided conv
        # (it lives on the coarse grid from the first layer).
        self._folded_down = None
        if self.ccfg.pack_down_conv and self.mcfg.encoder_arch == "reference":
            from vqvdb_tpu.ops.packed import fold_strided_conv

            down = params.encoder["down"]
            self._folded_down = fold_strided_conv(
                np.asarray(down["w"]), np.asarray(down["b"]))
        # Data-parallel device steps over a mesh (set up last: the sharded
        # steps close over the fold constants computed above). A mesh that
        # spans multiple PROCESSES (a pod slice / the gloo CPU runtime,
        # parallel/distributed.py) flips the codec to multi-host mode:
        # every process reads the same file, feeds its local slice of each
        # global batch, and the step all-gathers its output over the mesh
        # axis so every host holds full batch results — the byte-identity
        # invariant (N-chip == 1-chip .vqvdb output) extends across
        # processes (tests/test_distributed.py).
        self.mesh = mesh
        self._multihost = False
        if mesh is not None:
            from vqvdb_tpu.parallel.mesh import (
                make_sharded_decode, make_sharded_encode, replicate)

            n_dev = int(mesh.devices.size)
            if self.ccfg.batch_size % n_dev:
                raise ValueError(
                    f"batch_size {self.ccfg.batch_size} must divide evenly "
                    f"over the {n_dev}-device mesh")
            self._multihost = jax.process_count() > 1
            self.params = replicate(self.params, mesh)
            self._encode_jit = make_sharded_encode(
                mesh, self, replicate_out=self._multihost)
            self._decode_jit = make_sharded_decode(
                mesh, self, replicate_out=self._multihost)

    # -- device steps (traced once per shape) ----------------------------
    def _encode_step(self, params: VQVAEParams, leaves: jnp.ndarray) -> jnp.ndarray:
        """[B,8,8,8,C] f32 -> [B,4,4,4] uint8."""
        x = leaves.astype(self.ccfg.compute_jnp_dtype)
        b = x.shape[0]
        if self._score_mc is not None:
            from vqvdb_tpu.models.vqvae import (
                encoder_features,
                encoder_features_packed_down,
            )
            from vqvdb_tpu.ops.quantize import fused_score_argmin, score_argmin_xla

            if self._folded_down is not None:
                h = encoder_features_packed_down(
                    params.encoder, self._folded_down, x, self.mcfg,
                    split_in=self.ccfg.split_conv_in,
                    fuse_rb16=(self.ccfg.fuse_rb16
                               and self.mcfg.variant == "scalar"))
            else:
                h = encoder_features(params.encoder, x, self.mcfg)
            flat_h = h.reshape(-1, h.shape[-1])
            m, c = self._score_mc
            if _use_pallas(self.ccfg):
                idx = fused_score_argmin(flat_h, m, c)
            else:
                idx = score_argmin_xla(flat_h, m, c)
        else:
            z = encoder_apply(params.encoder, x, self.mcfg)
            flat = z.reshape(-1, self.mcfg.embedding_dim).astype(jnp.float32)
            if self.mcfg.num_quantizers > 1:
                from vqvdb_tpu.models.quantizer import rvq_indices

                idx = rvq_indices(flat, params.vq)
            elif _use_pallas(self.ccfg):
                idx = fused_nearest_indices(flat, params.vq.embedding)
            else:
                idx = nearest_indices(flat, params.vq.embedding)
        return idx.reshape((b,) + self.mcfg.index_shape).astype(self.mcfg.index_dtype)

    def _decode_step(self, params: VQVAEParams, indices: jnp.ndarray) -> jnp.ndarray:
        """[B,4,4,4] (or [B,4,4,4,S] residual-VQ) uint8 -> [B,8,8,8,C] f32."""
        b = indices.shape[0]
        if self.mcfg.num_quantizers > 1:
            from vqvdb_tpu.models.quantizer import rvq_dequantize

            flat_idx = indices.astype(jnp.int32).reshape(
                -1, self.mcfg.num_quantizers)
            z = rvq_dequantize(flat_idx, params.vq,
                               self.ccfg.compute_jnp_dtype)
        else:
            flat_idx = indices.astype(jnp.int32).reshape(-1)
            codebook = params.vq.embedding.astype(self.ccfg.compute_jnp_dtype)
            if self.ccfg.use_pallas_dequant and jax.default_backend() == "tpu":
                z = fused_dequantize(flat_idx, codebook)
            else:
                z = dequantize(flat_idx, codebook)
        z = z.reshape((b,) + self.mcfg.latent_shape + (self.mcfg.embedding_dim,))
        if self._folded_tail is not None:
            from vqvdb_tpu.models.vqvae import decoder_pre_tail
            from vqvdb_tpu.ops.tail import apply_decoder_tail

            h = decoder_pre_tail(params.decoder, z, self.mcfg,
                                 split_in=self.ccfg.split_conv_in)
            return apply_decoder_tail(self._folded_tail, h, self.mcfg
                                      ).astype(jnp.float32)
        if self._folded_final is not None:
            from vqvdb_tpu.models.vqvae import decoder_tail_folded, decoder_trunk

            h = decoder_trunk(params.decoder, z, self.mcfg)
            return decoder_tail_folded(self._folded_final, h, self.mcfg
                                       ).astype(jnp.float32)
        return decoder_apply(params.decoder, z, self.mcfg).astype(jnp.float32)

    # -- latent-shape self-check (probe, ref cold path 3.3) --------------
    def check_latent_shape(self) -> Tuple[int, ...]:
        # A mesh-backed encode shards the batch axis, so the probe batch
        # must be divisible by the mesh size (a 1-leaf probe would fail
        # shard_map's divisibility check on any multi-device mesh).
        n = self.mesh.devices.size if self.mesh is not None else 1
        probe = np.zeros((n, LEAF_DIM, LEAF_DIM, LEAF_DIM, self.mcfg.in_channels),
                         np.float32)
        out = self._encode_jit(self.params, self._to_device(probe))
        got = tuple(out.shape[1:])
        if got != self.mcfg.index_shape:
            raise ModelMismatchError(
                f"latent-shape probe mismatch: model produced {got}, "
                f"config declares {self.mcfg.index_shape}"
            )
        self._latent_shape_checked = True
        return got

    # -- array-level API -------------------------------------------------
    def encode_leaves(self, leaves: np.ndarray) -> np.ndarray:
        """Encode [N,8,8,8,C] (or [N,8,8,8]) f32 -> [N,4,4,4] u8, batched."""
        leaves = np.asarray(leaves, np.float32)
        if leaves.ndim == 4:
            leaves = leaves[..., None]
        out = np.empty((leaves.shape[0],) + self.mcfg.index_shape,
                       np.dtype(self.mcfg.index_dtype))
        for dev, s, n in self._pipelined(self._encode_jit, leaves):
            self._host_rows(dev, n, out=out[s : s + n])
        return out

    def decode_indices(self, indices: np.ndarray) -> np.ndarray:
        """Decode [N,4,4,4] u8 -> [N,8,8,8,C] f32, batched."""
        indices = np.asarray(indices, np.dtype(self.mcfg.index_dtype))
        out = np.empty(
            (indices.shape[0], LEAF_DIM, LEAF_DIM, LEAF_DIM, self.mcfg.in_channels),
            np.float32,
        )
        for dev, s, n in self._pipelined(self._decode_jit, indices):
            self._host_rows(dev, n, out=out[s : s + n])
        return out

    def _to_device(self, chunk: np.ndarray):
        """Host batch -> device array (sharded over the mesh if present).

        Multi-host: every process sees the same full `chunk` (same file,
        same reader); each contributes only its local rows and JAX stitches
        them into one global sharded array — no host ever transfers another
        host's slice."""
        if self._multihost:
            from vqvdb_tpu.parallel.distributed import (
                global_batch_from_local, local_batch_slice)

            rows = chunk[local_batch_slice(chunk.shape[0])]
            return global_batch_from_local(self.mesh, rows)
        if self.mesh is not None:
            from vqvdb_tpu.parallel.mesh import shard_batch

            return shard_batch(chunk, self.mesh)
        return jnp.asarray(chunk)

    def _host_rows(self, dev, n: int, out: Optional[np.ndarray] = None
                   ) -> np.ndarray:
        """First `n` rows of a (possibly sharded) device batch on the host.

        For a multi-shard result, `np.asarray(dev)` makes JAX reassemble
        all shards into one array first; instead copy each addressable
        shard's buffer straight into its slice of the output (leaf rows
        are independent; `shard.index` fixes placement, so shard
        iteration order is irrelevant). Shards entirely inside the padded
        tail are skipped without transfer — the structural win for ragged
        tails. Measured A/B (benchmarks/dp_host_overhead_r3.json): both
        paths sit at the host memcpy floor at 4-8 shards (~1.4 ms/4.2 MB
        batch on the 1-core CPU-mesh host, per-shard slightly ahead);
        single-shard arrays stay on `np.asarray`, which can alias the
        buffer outright (zero-copy on CPU, one D2H on TPU) — see
        docs/DP_SCALING.md for the full cost model.

        With `out` (a preallocated [n,...] destination, typically a slice
        of the caller's result array), rows are written there directly —
        one host copy total instead of temp-then-assign (the cost model's
        copy floor is per byte *moved*; this halves the moves for the
        array-level API and file decompress).
        """
        shards = (getattr(dev, "addressable_shards", None)
                  if self.mesh is not None else None)
        if not shards or len(shards) == 1:
            rows = np.asarray(dev)[:n]
            if out is None:
                return rows
            out[:] = rows
            return out
        if out is None:
            out = np.empty((n,) + tuple(dev.shape[1:]), dev.dtype)
        from vqvdb_tpu.runtime.native_io import copy_into

        seen = set()  # replicated outputs repeat the same row range on
        # every local device (multihost replicate_out) — copy each once
        for sh in shards:
            r0 = sh.index[0].start or 0
            if r0 >= n or r0 in seen:
                continue
            seen.add(r0)
            data = np.asarray(sh.data)
            rows = min(data.shape[0], n - r0)
            # Threaded native copy (DP_SCALING fix (a)): on multi-core
            # hosts the per-shard materialization splits across workers;
            # falls back to numpy assignment when the lib isn't built.
            copy_into(out[r0 : r0 + rows], data[:rows])
        return out

    def _pipelined(self, step_fn, data: np.ndarray):
        """Fixed-shape batched dispatch with PIPELINE_DEPTH steps in flight.

        Yields (device_result, start, valid_count). Padding keeps every
        traced shape identical; JAX async dispatch overlaps host transfers
        and result materialization with device compute.
        """
        bs = self.ccfg.batch_size
        n_total = data.shape[0]
        pending: collections.deque = collections.deque()
        for s in range(0, max(n_total, 1), bs):
            chunk = data[s : s + bs]
            n = chunk.shape[0]
            if n == 0:
                break
            if n < bs:
                with self.profiler("host/pad"):
                    pad = np.zeros((bs - n,) + chunk.shape[1:], chunk.dtype)
                    chunk = np.concatenate([chunk, pad], axis=0)
            with self.profiler("device/dispatch"):
                dev = step_fn(self.params, self._to_device(chunk))
            pending.append((dev, s, n))
            if len(pending) >= PIPELINE_DEPTH:
                yield pending.popleft()
        while pending:
            yield pending.popleft()

    def _pipelined_residual(self, leaves: np.ndarray):
        """Encode->decode pipelined dispatch for the v6 residual tier.

        Yields (device_indices, device_reconstruction, start, valid_count).
        The reconstruction comes from `_decode_jit` — the SAME compiled
        executable decompress will run — so the stored correction is exact
        against what a decoder reproduces (runtime/residual.py)."""
        bs = self.ccfg.batch_size
        n_total = leaves.shape[0]
        pending: collections.deque = collections.deque()
        for s in range(0, max(n_total, 1), bs):
            chunk = leaves[s : s + bs]
            n = chunk.shape[0]
            if n == 0:
                break
            if n < bs:
                with self.profiler("host/pad"):
                    pad = np.zeros((bs - n,) + chunk.shape[1:], chunk.dtype)
                    chunk = np.concatenate([chunk, pad], axis=0)
            with self.profiler("device/dispatch"):
                dev_i = self._encode_jit(self.params, self._to_device(chunk))
                dev_r = self._decode_jit(self.params, dev_i)
            pending.append((dev_i, dev_r, s, n))
            if len(pending) >= PIPELINE_DEPTH:
                yield pending.popleft()
        while pending:
            yield pending.popleft()

    # -- file-level API (ref: VQVAECodec::compress / ::decompress) -------
    def _resolve_format(self, format_version: Optional[int],
                        residual: Optional[str],
                        residual_tol: Optional[float]) -> int:
        """Container/option semantics shared by compress and
        compress_stream (they must stay byte-identical): residual-mode
        validation and format-version defaulting."""
        if residual is not None:
            from vqvdb_tpu.runtime.residual import RESIDUAL_MODES

            if residual not in RESIDUAL_MODES:
                raise ValueError(f"unknown residual mode {residual!r}")
            if residual_tol is not None and residual != "int8":
                raise ValueError("residual_tol applies to the int8 mode only")
            if format_version is None:
                format_version = 6
            elif format_version != 6:
                raise ValueError(
                    "residual correction requires format version 6")
        if format_version is None:
            # v3 stores 1 byte per index (ref: VQVDB_Reader.cpp chunk layout)
            # and is the byte-identical default; codebooks beyond 256 (e.g.
            # the reference's 4096-code vec3 config, which could not
            # round-trip v3 at all) auto-upgrade to our v4 extension.
            format_version = 3 if self.mcfg.num_embeddings <= 256 else 4
        return format_version

    def _grid_meta(self, name: str, total_blocks: int, transform,
                   channels: int, residual: Optional[str]) -> GridMetadata:
        return GridMetadata(
            name=name,
            num_embeddings=self.mcfg.num_embeddings,
            # (4,4,4) single-stage; (4,4,4,S) residual-VQ — the
            # container's latent shape is dimension-count generic.
            latent_shape=self.mcfg.index_shape,
            total_blocks=total_blocks,
            transform=transform,
            residual_mode=(0 if residual is None else
                           {"int8": 1, "f16": 2}[residual]),
            residual_channels=0 if residual is None else channels,
        )

    @staticmethod
    def _compress_stats(total: int, t0: float,
                        out_path: Union[str, Path]) -> dict:
        dt = time.perf_counter() - t0
        return {
            "leaves": total,
            "seconds": dt,
            "leaves_per_sec": total / dt if dt > 0 else float("inf"),
            "bytes": Path(out_path).stat().st_size,
        }

    def compress(
        self,
        grids: Union[LeafGrid, Sequence[LeafGrid]],
        out_path: Union[str, Path],
        *,
        progress: bool = False,
        format_version: Optional[int] = None,
        compression: str = "zlib",
        residual: Optional[str] = None,
        residual_tol: Optional[float] = None,
        should_stop: Optional[Callable[[], bool]] = None,
    ) -> dict:
        """Encode grids and stream them to a `.vqvdb` v3 file.

        should_stop (checked between batches) requests a graceful abort:
        every batch written so far is kept, the open grid's header is
        patched to its actual block count (VqvdbWriter.abort_grid), later
        grids are skipped, and the stats dict gains "aborted": True — the
        archive stays structurally valid and decodable, mirroring the
        reference's cook-interrupter semantics
        (ref: src/Utils/Utils.hpp:174-209). The CLI wires SIGINT to this.

        compression selects the v5 payload codec (zlib / lzma / lz4;
        ignored for v3/v4): zlib for the smallest files, lz4 for
        several-fold faster reads at a modestly lower ratio.

        residual ("int8" | "f16" | None) turns on the v6 near-lossless
        tier: each leaf's reconstruction error against the actual decode
        executable is quantized and stored next to its indices, and
        decompress adds it back — per-voxel error bounded by the
        quantization step (runtime/residual.py). Forces format v6.
        residual_tol (int8 mode) floors the step at 2*tol: error bound
        becomes max(leaf_max_err/254, tol) and already-good leaves
        quantize to compressible zeros.
        Returns a stats dict (leaves, seconds, leaves/sec, bytes written).
        """
        if isinstance(grids, LeafGrid):
            grids = [grids]
        format_version = self._resolve_format(format_version, residual,
                                              residual_tol)
        stop = should_stop if should_stop is not None else (lambda: False)
        aborted = False
        t0 = time.perf_counter()
        total = 0
        with VqvdbWriter(out_path, version=format_version,
                         compression=compression) as w:
            for grid in grids:
                if aborted:
                    break
                meta = self._grid_meta(grid.name, grid.num_leaves,
                                       grid.transform, grid.channels,
                                       residual)
                w.start_grid(meta)
                if residual is not None:
                    from vqvdb_tpu.runtime.residual import quantize_residual

                    for dev_i, dev_r, s, n in self._pipelined_residual(
                            grid.leaves):
                        if stop():
                            aborted = True
                            break
                        idx = self._host_rows(dev_i, n)
                        rec = self._host_rows(dev_r, n)
                        err = grid.leaves[s : s + n] - rec
                        scales, q = quantize_residual(err, residual,
                                                      residual_tol)
                        w.write_batch(idx, grid.origins[s : s + n], scales, q)
                        total += n
                        if progress:
                            print(f"[compress] {grid.name}: "
                                  f"{s + n}/{grid.num_leaves}")
                    w.abort_grid() if aborted else w.end_grid()
                    continue
                for dev, s, n in self._pipelined(self._encode_jit, grid.leaves):
                    if stop():
                        aborted = True
                        break
                    idx = self._host_rows(dev, n)
                    w.write_batch(idx, grid.origins[s : s + n])
                    total += n
                    if progress:
                        print(f"[compress] {grid.name}: {s + n}/{grid.num_leaves}")
                w.abort_grid() if aborted else w.end_grid()
        stats = self._compress_stats(total, t0, out_path)
        stats["aborted"] = aborted
        return stats

    def compress_stream(
        self,
        streams,
        out_path: Union[str, Path],
        *,
        progress: bool = False,
        format_version: Optional[int] = None,
        compression: str = "zlib",
        residual: Optional[str] = None,
        residual_tol: Optional[float] = None,
        should_stop: Optional[Callable[[], bool]] = None,
    ) -> dict:
        """`compress`, but from lazily-read leaf streams at O(batch) host
        memory — the ingestion side of the bounded-memory story (`.vdb`
        scenes larger than host RAM encode through
        vdb.openvdb_io.open_vdb_leaf_streams; the reference gets the same
        property from OpenVDB's lazy grid access,
        ref: src/Utils/Utils.hpp:361-403).

        `streams` is one object or a sequence of objects exposing
        .name, .transform, .num_leaves, .channels, .origins [N,3] and
        .leaf_batches(batch_size) -> iterator of [n<=bs,8,8,8,C] f32.
        Same container/options semantics as `compress` (including
        should_stop graceful abort); a streamed encode of the same leaves
        produces byte-identical output (tests/test_streaming_vdb.py)."""
        if not isinstance(streams, (list, tuple)):
            streams = [streams]
        format_version = self._resolve_format(format_version, residual,
                                              residual_tol)
        stop = should_stop if should_stop is not None else (lambda: False)
        aborted = False
        bs = self.ccfg.batch_size
        t0 = time.perf_counter()
        total = 0

        def _rechunk(it):
            """Arbitrary-size [n,...] arrays -> exact-bs chunks (+ ragged
            tail), holding at most one extra batch."""
            buf, have = [], 0
            for a in it:
                if not a.shape[0]:
                    continue
                buf.append(np.asarray(a, np.float32))
                have += a.shape[0]
                while have >= bs:
                    cat = np.concatenate(buf) if len(buf) > 1 else buf[0]
                    yield cat[:bs]
                    rest = cat[bs:]
                    buf, have = ([rest] if rest.shape[0] else []), rest.shape[0]
            if have:
                yield np.concatenate(buf) if len(buf) > 1 else buf[0]

        with VqvdbWriter(out_path, version=format_version,
                         compression=compression) as w:
            for stream in streams:
                if aborted:
                    break
                meta = self._grid_meta(
                    stream.name, stream.num_leaves,
                    np.asarray(stream.transform, np.float32),
                    stream.channels, residual)
                w.start_grid(meta)
                pending: collections.deque = collections.deque()
                cursor = 0

                def _flush(item):
                    nonlocal total
                    if residual is not None:
                        from vqvdb_tpu.runtime.residual import quantize_residual

                        dev_i, dev_r, chunk, org, n = item
                        idx = self._host_rows(dev_i, n)
                        rec = self._host_rows(dev_r, n)
                        scales, q = quantize_residual(chunk[:n] - rec,
                                                      residual, residual_tol)
                        w.write_batch(idx, org, scales, q)
                    else:
                        dev, org, n = item
                        w.write_batch(self._host_rows(dev, n), org)
                    total += item[-1]
                    if progress:
                        print(f"[compress] {stream.name}: {total} leaves")

                for chunk in _rechunk(stream.leaf_batches(bs)):
                    if stop():
                        aborted = True
                        break
                    n = chunk.shape[0]
                    org = stream.origins[cursor : cursor + n]
                    cursor += n
                    padded = chunk
                    if n < bs:
                        with self.profiler("host/pad"):
                            pad = np.zeros((bs - n,) + chunk.shape[1:],
                                           chunk.dtype)
                            padded = np.concatenate([chunk, pad], axis=0)
                    with self.profiler("device/dispatch"):
                        dev_i = self._encode_jit(self.params,
                                                 self._to_device(padded))
                        if residual is not None:
                            dev_r = self._decode_jit(self.params, dev_i)
                            pending.append((dev_i, dev_r, chunk, org, n))
                        else:
                            pending.append((dev_i, org, n))
                    if len(pending) >= PIPELINE_DEPTH:
                        _flush(pending.popleft())
                while pending:
                    _flush(pending.popleft())
                if aborted:
                    w.abort_grid()
                    continue
                if cursor != stream.num_leaves:
                    raise ValueError(
                        f"stream '{stream.name}' yielded {cursor} leaves, "
                        f"declared {stream.num_leaves}")
                w.end_grid()
        stats = self._compress_stats(total, t0, out_path)
        stats["aborted"] = aborted
        return stats

    def decode_stream(self, in_path: Union[str, Path], *,
                      grids=None, bbox=None):
        """Memory-bounded streaming decode for arbitrarily large scenes.

        Generator yielding (grid_metadata, leaves_batch [n,8,8,8,C] f32,
        origins_batch [n,3] i32). Only O(batch_size) leaves are resident at
        once — the reference's bounded-buffer streaming (64 MiB reader, lazy
        per-batch reads, ref: VQVDB_Reader.cpp) carried over, with the device
        pipeline keeping PIPELINE_DEPTH batches in flight.

        Selective decode (capability the reference lacks — its decompress
        always materializes every grid, VQVAECodec.cpp:137-208):
          grids: a name or iterable of names; other grids' payloads are
            skipped on disk without decompression or decoding.
          bbox: voxel-space ((x0,y0,z0),(x1,y1,z1)) — lower inclusive,
            upper exclusive; only leaves intersecting the box are decoded
            (filtered chunks are re-packed into full device batches, so
            device work scales with the selection, not the file).

        v6 residual grids are corrected transparently: the stored
        quantized reconstruction error is added to each batch on the host
        (runtime/residual.py), so yielded leaves carry the near-lossless
        tier's error bound.
        """
        from vqvdb_tpu.runtime.residual import apply_residual

        for meta, dev, org, n, sc, res in self._decode_stream_dev(
                in_path, grids=grids, bbox=bbox):
            rows = self._host_rows(dev, n)
            if res is not None:
                if not rows.flags.writeable:
                    rows = rows.copy()  # _host_rows may alias device memory
                apply_residual(rows, sc, res)
            yield meta, rows, org

    def _decode_stream_dev(self, in_path: Union[str, Path], *,
                           grids=None, bbox=None):
        """decode_stream's device-level core: yields (grid_metadata,
        device_batch, origins, valid_count, scales, residual) with the
        result still on device, so consumers that own their destination
        memory (e.g. `decompress`'s preallocated grid arrays) can
        materialize each batch with a single host copy via
        `_host_rows(..., out=)` and apply the v6 residual correction
        there. scales/residual are None for grids without residuals."""
        names = None
        if grids is not None:
            names = {grids} if isinstance(grids, str) else set(grids)
        lo = hi = None
        if bbox is not None:
            lo = np.asarray(bbox[0], np.int64).reshape(3)
            hi = np.asarray(bbox[1], np.int64).reshape(3)
        with VqvdbReader(in_path) as r:
            if r.num_embeddings != self.mcfg.num_embeddings:
                raise ModelMismatchError(
                    f"file has {r.num_embeddings} embeddings, model has "
                    f"{self.mcfg.num_embeddings}"
                )
            while r.has_next_grid():
                meta = r.next_grid_metadata()
                if names is not None and meta.name not in names:
                    r.skip_grid_payload()
                    continue
                if tuple(meta.latent_shape) != self.mcfg.index_shape:
                    raise ModelMismatchError(
                        f"file latent shape {meta.latent_shape} != model "
                        f"{self.mcfg.index_shape}"
                    )
                if (meta.residual_mode
                        and meta.residual_channels != self.mcfg.in_channels):
                    raise ModelMismatchError(
                        f"file residual stream has {meta.residual_channels} "
                        f"channels, model decodes {self.mcfg.in_channels}")
                bs = self.ccfg.batch_size
                mode = meta.residual_mode
                pending: collections.deque = collections.deque()
                carry = None

                def _unpack(hosts):
                    """hosts list -> (origins, scales, residual)."""
                    org = hosts[0]
                    sc = hosts[1] if mode == 1 else None
                    res = hosts[-1] if mode else None
                    return org, sc, res

                def _dispatch(idx, hosts):
                    n = idx.shape[0]
                    chunk = idx
                    if n < bs:
                        chunk = np.concatenate(
                            [idx, np.zeros((bs - n,) + idx.shape[1:], idx.dtype)]
                        )
                    dev = self._decode_jit(self.params, self._to_device(chunk))
                    org, sc, res = _unpack(hosts)
                    pending.append((meta, dev, org, n, sc, res))

                while r.has_next():
                    idx, org, sc, res = r.next_batch_residual(bs)
                    # Host-side per-chunk arrays ride alongside the indices
                    # through filtering/regrouping (they never go to device).
                    hosts = ([org] + ([sc] if mode == 1 else [])
                             + ([res] if mode else []))
                    if lo is not None:
                        keep = (np.all(org < hi, axis=1)
                                & np.all(org + LEAF_DIM > lo, axis=1))
                        idx = idx[keep]
                        hosts = [h[keep] for h in hosts]
                        if idx.shape[0] == 0:
                            continue
                    if carry is not None:
                        idx = np.concatenate([carry[0], idx])
                        hosts = [np.concatenate([a, b])
                                 for a, b in zip(carry[1], hosts)]
                        carry = None
                    while idx.shape[0] >= bs:
                        _dispatch(idx[:bs], [h[:bs] for h in hosts])
                        idx = idx[bs:]
                        hosts = [h[bs:] for h in hosts]
                        if len(pending) >= PIPELINE_DEPTH:
                            yield pending.popleft()
                    if idx.shape[0]:
                        carry = (idx, hosts)
                if carry is not None:
                    _dispatch(carry[0], carry[1])
                while pending:
                    yield pending.popleft()

    def decompress(
        self,
        in_path: Union[str, Path],
        *,
        progress: bool = False,
        grids=None,
        bbox=None,
    ) -> Tuple[List[LeafGrid], dict]:
        """Stream a `.vqvdb` file through the decoder into LeafGrids.

        Materializes whole grids; for scenes too large to hold in host
        memory use `decode_stream` directly. `grids`/`bbox` select a
        subset (see decode_stream) — unselected payloads are skipped on
        disk and device work scales with the selection.
        """
        t0 = time.perf_counter()
        out_grids: List[LeafGrid] = []
        total = 0
        cur_meta = None
        leaves_out = origins_out = None
        cursor = 0
        blk = (LEAF_DIM, LEAF_DIM, LEAF_DIM, self.mcfg.in_channels)

        def _finish():
            if cur_meta is not None:
                # Slice to what actually arrived: total_blocks is
                # metadata, the reader's truncation checks are the
                # authority on the real count.
                out_grids.append(LeafGrid(
                    name=cur_meta.name,
                    origins=origins_out[:cursor],
                    leaves=leaves_out[:cursor],
                    transform=cur_meta.transform,
                ))

        from vqvdb_tpu.runtime.residual import apply_residual

        # Batches land directly in per-grid arrays preallocated from the
        # grid metadata — one host copy per byte (see _host_rows) instead
        # of the gather-then-concatenate two. v6 residual corrections are
        # applied to the destination slice in place.
        for meta, dev, origins, n, sc, res in self._decode_stream_dev(
                in_path, grids=grids, bbox=bbox):
            if meta is not cur_meta:
                _finish()
                cur_meta = meta
                # total_blocks over-allocates under a bbox selection; the
                # cursor slice in _finish trims to what actually decoded.
                leaves_out = np.empty((meta.total_blocks,) + blk, np.float32)
                origins_out = np.empty((meta.total_blocks, 3), np.int32)
                cursor = 0
                if progress:
                    print(f"[decompress] {meta.name}: {meta.total_blocks} leaves")
            dst = leaves_out[cursor : cursor + n]
            self._host_rows(dev, n, out=dst)
            if res is not None:
                apply_residual(dst, sc, res)
            origins_out[cursor : cursor + n] = origins
            cursor += n
            total += n
        _finish()

        dt = time.perf_counter() - t0
        stats = {
            "leaves": total,
            "seconds": dt,
            "leaves_per_sec": total / dt if dt > 0 else float("inf"),
        }
        return out_grids, stats

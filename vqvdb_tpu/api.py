"""High-level user API — the framework's equivalent of the Houdini SOP
surface (ref: src/SOP/SOP_VQVDB_Encoder.cpp / SOP_VQVDB_Decoder.cpp), with
the same semantics expressed as Python calls:

    encode(grids | dense | npy, model, out_path, batch_size, name_filter)
    decode(vqvdb_path, model, batch_size) -> grids

plus model persistence. The SOP parameters map 1:1: `vdbname` ->
name_filter, `outputpath`/`inputfile` -> paths, `batchsize` -> batch_size.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence, Tuple, Union


from vqvdb_tpu.core.artifact import load_model, save_model  # noqa: F401
from vqvdb_tpu.core.config import CodecConfig, ModelConfig
from vqvdb_tpu.models.vqvae import VQVAEParams
from vqvdb_tpu.runtime.codec import VQCodec
from vqvdb_tpu.vdb.grid import LeafGrid

PathLike = Union[str, Path]


def make_codec(
    model: Union[PathLike, Tuple[VQVAEParams, ModelConfig]],
    *,
    batch_size: int = 4096,
    compute_dtype: str = "bfloat16",
    use_pallas: bool = False,
    data_parallel: bool = False,
    mesh=None,
) -> VQCodec:
    """Build a codec from a `.vqmodel` artifact path or (params, cfg).

    data_parallel=True shards every device step over all local devices
    (pass an explicit `mesh` instead for a subset); file-level output is
    byte-identical to the single-device codec.
    """
    if isinstance(model, (str, Path)):
        params, mcfg = load_model(model)
    else:
        params, mcfg = model
    if data_parallel and mesh is None:
        from vqvdb_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    ccfg = CodecConfig(batch_size=batch_size, compute_dtype=compute_dtype,
                       use_pallas=use_pallas)
    return VQCodec(params, mcfg, ccfg, mesh=mesh)


def encode(
    grids: Union[LeafGrid, Sequence[LeafGrid]],
    model: Union[PathLike, Tuple[VQVAEParams, ModelConfig], VQCodec],
    out_path: PathLike,
    *,
    batch_size: int = 4096,
    name_filter: Optional[str] = None,
    progress: bool = False,
    format_version: Optional[int] = None,
    compression: str = "zlib",
    residual: Optional[str] = None,
    residual_tol: Optional[float] = None,
    should_stop=None,
) -> dict:
    """Compress grids to a `.vqvdb` file (SOP encoder cook semantics,
    ref: SOP_VQVDB_Encoder.cpp:84-141). format_version: None = auto
    (v3, or v4 for K>256); 5 = compressed-payload extension (~1.5x
    smaller files, not readable by the reference runtime).
    compression: v5 payload codec — zlib (smallest), lzma, or lz4
    (several-fold faster reads).
    residual: 'int8' / 'f16' enables the v6 near-lossless tier (stored
    reconstruction-error correction; see runtime/residual.py).
    residual_tol: int8-mode target max abs error — floors the
    quantization step so well-fit leaves cost almost nothing.
    should_stop: zero-arg callable checked between batches — a graceful
    abort hook (the reference's cook-interrupter semantics,
    ref: src/Utils/Utils.hpp:174-209): completed batches are kept and the
    archive finalizes structurally valid; stats carry "aborted": True."""
    codec = model if isinstance(model, VQCodec) else make_codec(
        model, batch_size=batch_size)
    if isinstance(grids, LeafGrid):
        grids = [grids]
    if name_filter:
        grids = [g for g in grids if g.name == name_filter]
        if not grids:
            raise ValueError(f"no grid named {name_filter!r}")
    return codec.compress(list(grids), out_path, progress=progress,
                          format_version=format_version,
                          compression=compression, residual=residual,
                          residual_tol=residual_tol,
                          should_stop=should_stop)


def decode(
    in_path: PathLike,
    model: Union[PathLike, Tuple[VQVAEParams, ModelConfig], VQCodec],
    *,
    batch_size: int = 4096,
    progress: bool = False,
    grids=None,
    bbox=None,
) -> Tuple[List[LeafGrid], dict]:
    """Decompress a `.vqvdb` file into LeafGrids (SOP decoder cook
    semantics, ref: SOP_VQVDB_Decoder.cpp:78-115). `grids` (name or
    iterable of names) and `bbox` ((lo, hi) voxel corners, lo inclusive /
    hi exclusive) select a subset; unselected grid payloads are skipped
    on disk and only intersecting leaves are decoded."""
    codec = model if isinstance(model, VQCodec) else make_codec(
        model, batch_size=batch_size)
    return codec.decompress(in_path, progress=progress, grids=grids,
                            bbox=bbox)


def encode_sequence(
    frames: Sequence[Union[LeafGrid, Sequence[LeafGrid]]],
    model: Union[PathLike, Tuple[VQVAEParams, ModelConfig], VQCodec],
    out_dir: PathLike,
    *,
    pattern: str = "frame_{:04d}.vqvdb",
    batch_size: int = 4096,
    format_version: Optional[int] = None,
    compression: str = "zlib",
    residual: Optional[str] = None,
) -> dict:
    """Encode an animated VDB sequence, one `.vqvdb` per frame (the
    reference's per-frame Houdini cook loop). The codec — and its compiled
    graphs — is built once and reused across frames, so steady-state
    per-frame cost is pure pipeline time. format_version / compression /
    residual as in `encode`.
    """
    codec = model if isinstance(model, VQCodec) else make_codec(
        model, batch_size=batch_size)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    per_frame = []
    total_leaves = 0
    for i, frame in enumerate(frames):
        stats = codec.compress(frame, out_dir / pattern.format(i),
                               format_version=format_version,
                               compression=compression, residual=residual)
        per_frame.append(stats["seconds"])
        total_leaves += stats["leaves"]
    return {
        "frames": len(per_frame),
        "leaves": total_leaves,
        "seconds_per_frame": per_frame,
        "mean_frame_seconds": sum(per_frame) / max(len(per_frame), 1),
    }


def decode_sequence(
    in_dir: PathLike,
    model: Union[PathLike, Tuple[VQVAEParams, ModelConfig], VQCodec],
    *,
    pattern: str = "frame_*.vqvdb",
    batch_size: int = 4096,
) -> Tuple[List[List[LeafGrid]], dict]:
    """Decode a directory of per-frame `.vqvdb` files (sorted)."""
    codec = model if isinstance(model, VQCodec) else make_codec(
        model, batch_size=batch_size)
    files = sorted(Path(in_dir).glob(pattern))
    frames = []
    per_frame = []
    for f in files:
        grids, stats = codec.decompress(f)
        frames.append(grids)
        per_frame.append(stats["seconds"])
    return frames, {
        "frames": len(frames),
        "seconds_per_frame": per_frame,
        "mean_frame_seconds": sum(per_frame) / max(len(per_frame), 1),
    }


def decode_dense(
    in_path: PathLike,
    model: Union[PathLike, Tuple[VQVAEParams, ModelConfig], VQCodec],
    *,
    batch_size: int = 4096,
    background: float = 0.0,
) -> List[dict]:
    """Decode a `.vqvdb` file into device-resident dense volumes.

    Returns [{name, dense (jax.Array [X,Y,Z,C], still in HBM), lo,
    transform}] — the zero-host-scatter path for on-device consumers
    (docs/DP_SCALING.md fix (b)); `np.asarray(d["dense"])` materializes.
    """
    from vqvdb_tpu.runtime.dense import decode_file_to_dense

    codec = model if isinstance(model, VQCodec) else make_codec(
        model, batch_size=batch_size)
    return decode_file_to_dense(codec, in_path, background=background)


def encode_dense(
    dense,
    model: Union[PathLike, Tuple[VQVAEParams, ModelConfig], VQCodec],
    out_path: PathLike,
    *,
    name: str = "density",
    batch_size: int = 4096,
    origin: Sequence[int] = (0, 0, 0),
    background: float = 0.0,
    tolerance: float = 0.0,
    format_version: Optional[int] = None,
    compression: str = "zlib",
) -> dict:
    """Sparsify + encode a dense volume (numpy or device-resident
    jax.Array) straight to a `.vqvdb` file; the volume never visits the
    host (see runtime/dense.py)."""
    from vqvdb_tpu.runtime.dense import encode_dense_to_file

    codec = model if isinstance(model, VQCodec) else make_codec(
        model, batch_size=batch_size)
    return encode_dense_to_file(
        codec, dense, out_path, name=name, origin=origin,
        background=background, tolerance=tolerance,
        format_version=format_version, compression=compression)

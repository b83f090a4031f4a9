"""OpenVDB `.vdb` file reader/writer — spec-derived, pure Python/numpy.

Real OpenVDB assets are the universal interchange unit of this domain: the
reference consumes them through Houdini's geometry layer (`loadGrid`,
ref: src/Utils/Utils.hpp:361-403) and walks leaves with a LeafManager
(ref: src/orchestrator/VQVAECodec.cpp:36-59). A TPU host has no
Houdini/OpenVDB build, so this module implements the OpenVDB file format
itself for the codec's needs: FloatGrid and Vec3fGrid over the standard
5-4-3 tree, read AND write.

Like the `.vqvdb` container (format/vqvdb.py), correctness is established
by the pair methodology: a writer and reader derived independently from the
published format, property/fuzz round-trip tested against each other plus
structure-level golden fixtures asserting the exact on-disk byte layout
(tests/test_openvdb_io.py).

On-disk structure (little-endian throughout; file version 224, the format
written by OpenVDB 3.2 through 11.x):

  file header:
      int64   magic = 0x56444220 (" BDV\\0\\0\\0\\0" on disk)
      uint32  file format version (224)
      uint32  library major, uint32 library minor
      u8      hasGridOffsets (1 for seekable archives)
      char[36] uuid (ASCII 8-4-4-4-12)
  file-level metadata (MetaMap):
      uint32 count; per entry: {string name, string type, uint32 size, bytes}
      (strings are uint32 length + raw chars)
  uint32  grid count
  per grid:
      string  unique grid name ('\\x1e'-suffixed when duplicated)
      string  grid type, e.g. "Tree_float_5_4_3"
      string  instance parent name ("" unless instanced)
      int64   gridPos, int64 blockPos, int64 endPos (deferred-finalized)
      uint32  per-grid compression flags (NONE=0, ZIP=1, ACTIVE_MASK=2, BLOSC=4)
      MetaMap grid metadata ("class", stats entries, ...)
      transform: {string map type, map-specific doubles}
                 (AffineMap = 16 doubles; Scale/Translate maps = packed Vec3d
                 member dumps, see _MAP_READERS)
      tree topology:
          int32 bufferCount (always 1)
          root: background value, uint32 numTiles, uint32 numChildren,
                tiles {int32[3] origin, value, bool active},
                children {int32[3] origin, internal-node topology}
          internal node (Log2Dim 5 then 4):
              childMask bits, valueMask bits (DIM^3 bits each, LE u64 words)
              compressed tile-value array (see _read/_write_compressed_values)
              children recurse in child-mask bit order
          leaf (Log2Dim 3): valueMask (64 B)
      tree buffers, leaves in the same DFS order:
          leaf valueMask (64 B), compressed 512-value buffer

Compressed value arrays (io/Compression.h semantics): with ACTIVE_MASK the
stream stores a per-node metadata byte that classifies inactive values
(background / -background / one or two distinct values selected by a stored
mask / no compression), then only the active values; with ZIP or BLOSC each
value payload is framed as {int64 n; n>0: n compressed bytes, n<=0: -n raw
bytes}, zlib-deflate for ZIP and a c-blosc1 chunk for BLOSC (the default
codec of Houdini and blosc-built OpenVDB; implemented spec-derived in
vdb/blosc.py — blosc payloads may decode slightly long because the OpenVDB
writer zero-pads sub-128-byte inputs).

Half-float grids: the `_HalfFloat` grid-type suffix and/or the
`is_saved_as_half_float` metadata flag mark value payloads framed as f16
(Houdini's default VDB export). Both read and write are supported; writing
quantizes values to f16 first so inactive-value classification agrees with
the stored bits.
"""

from __future__ import annotations

import dataclasses
import struct
import uuid as _uuid
import zlib
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from vqvdb_tpu.utils.errors import FormatError, VersionError

PathLike = Union[str, Path]

OPENVDB_MAGIC = 0x56444220
FILE_VERSION = 224
# OPENVDB_FILE_VERSION_NODE_MASK_COMPRESSION: everything OpenVDB has written
# since 3.0 (2014). Older layouts changed per-node value framing in ways we
# choose not to carry unverifiable support for.
MIN_SUPPORTED_VERSION = 222
MAX_KNOWN_VERSION = 224
LIBRARY_VERSION = (10, 0)
HALF_SUFFIX = "_HalfFloat"  # GridDescriptor grid-type suffix for half floats

# Per-grid stream compression flags.
COMPRESS_NONE = 0
COMPRESS_ZIP = 0x1
COMPRESS_ACTIVE_MASK = 0x2
COMPRESS_BLOSC = 0x4
DEFAULT_COMPRESSION = COMPRESS_ZIP | COMPRESS_ACTIVE_MASK  # openvdb sans blosc

# Per-node compressed-value metadata codes (io/Compression.h).
NO_MASK_OR_INACTIVE_VALS = 0   # no inactive vals, or all inactive == +bg
NO_MASK_AND_MINUS_BG = 1       # all inactive == -bg
NO_MASK_AND_ONE_INACTIVE_VAL = 2  # all inactive == one non-bg value
MASK_AND_NO_INACTIVE_VALS = 3  # mask selects -bg (off) vs +bg (on)
MASK_AND_ONE_INACTIVE_VAL = 4  # mask selects other (off) vs +bg (on)
MASK_AND_TWO_INACTIVE_VALS = 5  # mask selects val0 (off) vs val1 (on)
NO_MASK_AND_ALL_VALS = 6       # >2 distinct inactive vals: store everything

# 5-4-3 tree geometry.
I5_LOG2, I4_LOG2, LEAF_LOG2 = 5, 4, 3
I5_DIM, I4_DIM, LEAF_DIM = 1 << I5_LOG2, 1 << I4_LOG2, 1 << LEAF_LOG2
I5_SIZE = I5_DIM**3            # 32768 slots per upper internal node
I4_SIZE = I4_DIM**3            # 4096 slots per lower internal node
LEAF_SIZE = LEAF_DIM**3        # 512 voxels per leaf
LEAF_SPAN = LEAF_DIM           # 8
I4_SPAN = I4_DIM * LEAF_SPAN   # 128
I5_SPAN = I5_DIM * I4_SPAN     # 4096

_GRID_TYPES = {
    "Tree_float_5_4_3": ("float", 1),
    "Tree_vec3s_5_4_3": ("vec3s", 3),
}
_TYPE_NAMES = {v[0]: k for k, v in _GRID_TYPES.items()}

_NAME_SEP = "\x1e"  # GridDescriptor duplicate-name separator


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class VdbTile:
    """A constant-value tile (span 8/128/4096 voxels per side)."""

    origin: np.ndarray  # (3,) int32
    span: int
    value: np.ndarray   # () or (3,) float32
    active: bool


@dataclasses.dataclass
class VdbGrid:
    """One grid parsed from / destined for a .vdb file.

    leaves hold the full dense 8^3 buffers (inactive voxels included, as
    OpenVDB leaf buffers do); leaf_masks carry the per-voxel active bits
    (bit-packed, 64 B per leaf, voxel index x<<6|y<<3|z, little bit order).
    """

    name: str
    value_type: str                 # 'float' | 'vec3s'
    origins: np.ndarray             # (N, 3) int32, multiples of 8
    leaves: np.ndarray              # (N,8,8,8) f32 or (N,8,8,8,3) f32
    leaf_masks: Optional[np.ndarray] = None  # (N, 64) uint8; None = all-active
    transform: Optional[np.ndarray] = None   # 4x4 float64 index->world
    background: Union[float, np.ndarray] = 0.0
    tiles: List[VdbTile] = dataclasses.field(default_factory=list)
    grid_class: str = "unknown"
    metadata: Dict[str, tuple] = dataclasses.field(default_factory=dict)
    saved_as_half: bool = False     # read-side info; writer always saves full

    def __post_init__(self) -> None:
        self.origins = np.ascontiguousarray(self.origins, np.int32).reshape(-1, 3)
        self.leaves = np.ascontiguousarray(self.leaves, np.float32)
        want_ndim = 4 if self.value_type == "float" else 5
        if self.leaves.ndim != want_ndim:
            raise FormatError(
                f"{self.value_type} grid expects {want_ndim}-d leaves, "
                f"got shape {self.leaves.shape}")
        if self.transform is None:
            self.transform = np.eye(4, dtype=np.float64)
        self.transform = np.asarray(self.transform, np.float64).reshape(4, 4)
        bg = np.asarray(self.background, np.float32)
        want = () if self.value_type == "float" else (3,)
        if bg.size == 1:
            # Broadcast a scalar (e.g. the dataclass's 0.0 default) for
            # vec3s grids instead of failing the reshape.
            bg = np.full(want, bg.reshape(()), np.float32)
        self.background = bg.reshape(want)
        if self.leaf_masks is None:
            self.leaf_masks = np.full(
                (self.origins.shape[0], LEAF_SIZE // 8), 0xFF, np.uint8)
        self.leaf_masks = np.ascontiguousarray(self.leaf_masks, np.uint8)

    @property
    def num_leaves(self) -> int:
        return int(self.origins.shape[0])

    @property
    def channels(self) -> int:
        return 1 if self.value_type == "float" else 3


# ---------------------------------------------------------------------------
# Low-level cursor / primitives
# ---------------------------------------------------------------------------

class _Cursor:
    """Sequential reader over an in-memory buffer."""

    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> memoryview:
        if self.pos + n > len(self.buf):
            raise FormatError(
                f"truncated .vdb: wanted {n} bytes at offset {self.pos}, "
                f"file has {len(self.buf)}")
        out = memoryview(self.buf)[self.pos : self.pos + n]
        self.pos += n
        return out

    def u8(self) -> int:
        return self.take(1)[0]

    def u32(self) -> int:
        return struct.unpack("<I", self.take(4))[0]

    def i32(self) -> int:
        return struct.unpack("<i", self.take(4))[0]

    def i64(self) -> int:
        return struct.unpack("<q", self.take(8))[0]

    def string(self) -> str:
        n = self.u32()
        if n > 1 << 24:
            raise FormatError(f"implausible string length {n}")
        return bytes(self.take(n)).decode("utf-8", errors="replace")

    def coord(self) -> np.ndarray:
        return np.frombuffer(self.take(12), "<i4").copy()

    def values(self, count: int, comps: int, half: bool) -> np.ndarray:
        """Read `count` values of `comps` float components (half or full)."""
        itemsize = (2 if half else 4) * comps
        raw = self.take(count * itemsize)
        dt = "<f2" if half else "<f4"
        arr = np.frombuffer(raw, dt).astype(np.float32)
        return arr.reshape(count, comps) if comps > 1 else arr


def _pack_string(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack("<I", len(b)) + b


def _value_bytes(v: np.ndarray, half: bool = False) -> bytes:
    return np.asarray(v, "<f2" if half else "<f4").tobytes()


# ---------------------------------------------------------------------------
# Metadata maps
# ---------------------------------------------------------------------------

_META_DECODERS = {
    "string": lambda b: bytes(b).decode("utf-8", errors="replace"),
    "bool": lambda b: bool(b[0]),
    "int32": lambda b: int(np.frombuffer(b, "<i4")[0]),
    "int64": lambda b: int(np.frombuffer(b, "<i8")[0]),
    "float": lambda b: float(np.frombuffer(b, "<f4")[0]),
    "double": lambda b: float(np.frombuffer(b, "<f8")[0]),
    "vec3i": lambda b: np.frombuffer(b, "<i4").copy(),
    "vec3s": lambda b: np.frombuffer(b, "<f4").copy(),
    "vec3d": lambda b: np.frombuffer(b, "<f8").copy(),
    "mat4s": lambda b: np.frombuffer(b, "<f4").reshape(4, 4).copy(),
    "mat4d": lambda b: np.frombuffer(b, "<f8").reshape(4, 4).copy(),
}

_META_ENCODERS = {
    "string": lambda v: str(v).encode("utf-8"),
    "bool": lambda v: bytes([1 if v else 0]),
    "int32": lambda v: struct.pack("<i", int(v)),
    "int64": lambda v: struct.pack("<q", int(v)),
    "float": lambda v: struct.pack("<f", float(v)),
    "double": lambda v: struct.pack("<d", float(v)),
    "vec3i": lambda v: np.asarray(v, "<i4").tobytes(),
    "vec3s": lambda v: np.asarray(v, "<f4").tobytes(),
    "vec3d": lambda v: np.asarray(v, "<f8").tobytes(),
    "mat4s": lambda v: np.asarray(v, "<f4").tobytes(),
    "mat4d": lambda v: np.asarray(v, "<f8").tobytes(),
}


def _read_metamap(cur: _Cursor) -> Dict[str, tuple]:
    out: Dict[str, tuple] = {}
    count = cur.u32()
    if count > 1 << 20:
        raise FormatError(f"implausible metadata count {count}")
    for _ in range(count):
        name = cur.string()
        type_name = cur.string()
        size = cur.u32()
        raw = bytes(cur.take(size))
        dec = _META_DECODERS.get(type_name)
        out[name] = (type_name, dec(raw) if dec else raw)
    return out


def _write_metamap(parts: list, meta: Dict[str, tuple]) -> None:
    parts.append(struct.pack("<I", len(meta)))
    for name, (type_name, value) in meta.items():
        enc = _META_ENCODERS.get(type_name)
        raw = enc(value) if enc else bytes(value)
        parts.append(_pack_string(name))
        parts.append(_pack_string(type_name))
        parts.append(struct.pack("<I", len(raw)))
        parts.append(raw)


# ---------------------------------------------------------------------------
# Transforms (math/Maps.h serializations)
# ---------------------------------------------------------------------------

# Each reader returns (mat4x4 float64 index->world, bytes consumed handled
# via cursor). Scale/translate maps store their derived members too (voxel
# size, inverses); only the defining members feed the matrix.

def _read_affine(cur: _Cursor) -> np.ndarray:
    return np.frombuffer(cur.take(128), "<f8").reshape(4, 4).copy()


def _read_scale(cur: _Cursor) -> np.ndarray:
    scale = np.frombuffer(cur.take(24), "<f8").copy()
    cur.take(4 * 24)  # voxelSize, scaleInverse, invScaleSqr, invTwiceScale
    m = np.eye(4)
    m[0, 0], m[1, 1], m[2, 2] = scale
    return m


def _read_translation(cur: _Cursor) -> np.ndarray:
    t = np.frombuffer(cur.take(24), "<f8").copy()
    m = np.eye(4)
    m[3, :3] = t  # OpenVDB row-vector convention: translation in last row
    return m


def _read_scale_translate(cur: _Cursor) -> np.ndarray:
    t = np.frombuffer(cur.take(24), "<f8").copy()
    scale = np.frombuffer(cur.take(24), "<f8").copy()
    cur.take(4 * 24)
    m = np.eye(4)
    m[0, 0], m[1, 1], m[2, 2] = scale
    m[3, :3] = t
    return m


_MAP_READERS = {
    "AffineMap": _read_affine,
    "ScaleMap": _read_scale,
    "UniformScaleMap": _read_scale,
    "TranslationMap": _read_translation,
    "ScaleTranslateMap": _read_scale_translate,
    "UniformScaleTranslateMap": _read_scale_translate,
}


def _read_transform(cur: _Cursor) -> np.ndarray:
    map_type = cur.string()
    reader = _MAP_READERS.get(map_type)
    if reader is None:
        raise FormatError(
            f"unsupported transform map '{map_type}' (supported: "
            f"{sorted(_MAP_READERS)})")
    return reader(cur)


def _write_transform(parts: list, mat: np.ndarray) -> None:
    # Always emit an AffineMap: lossless for any affine index->world map and
    # the simplest of the serializations (16 doubles, row-major, translation
    # in the last row).
    parts.append(_pack_string("AffineMap"))
    parts.append(np.asarray(mat, "<f8").tobytes())


# ---------------------------------------------------------------------------
# Compressed value arrays (io/Compression.h)
# ---------------------------------------------------------------------------

def _read_data(cur: _Cursor, count: int, comps: int, half: bool,
               compression: int) -> np.ndarray:
    """readData: {int64 n; n>0 compressed, n<=0 raw -n bytes} framing when
    the ZIP or BLOSC flag is set, raw values otherwise. BLOSC payloads are
    c-blosc1 chunks and may decode long (write-side zero padding of small
    buffers, openvdb io/Compression.cc) — the tail is discarded."""
    if count == 0 and not (compression & (COMPRESS_ZIP | COMPRESS_BLOSC)):
        return np.zeros((0, comps) if comps > 1 else 0, np.float32)
    if compression & (COMPRESS_ZIP | COMPRESS_BLOSC):
        n = cur.i64()
        itemsize = (2 if half else 4) * comps
        expect = count * itemsize
        if n <= 0:
            raw = bytes(cur.take(-n))
        elif compression & COMPRESS_BLOSC:
            from vqvdb_tpu.vdb import blosc as _blosc

            raw = _blosc.openvdb_decompress(bytes(cur.take(n)), expect)
        else:
            raw = zlib.decompress(bytes(cur.take(n)))
        if len(raw) != expect:
            raise FormatError(
                f"compressed payload decodes to {len(raw)} B, expected "
                f"{expect}")
        arr = np.frombuffer(raw, "<f2" if half else "<f4").astype(np.float32)
        return arr.reshape(count, comps) if comps > 1 else arr
    return cur.values(count, comps, half)


def _write_data(parts: list, values: np.ndarray, compression: int,
                half: bool = False) -> None:
    raw = np.asarray(values, "<f2" if half else "<f4").tobytes()
    if compression & COMPRESS_BLOSC:
        from vqvdb_tpu.vdb import blosc as _blosc

        chunk = _blosc.openvdb_compress(raw)
        if chunk is None or len(chunk) >= len(raw):
            # openvdb convention: non-positive count = raw payload follows.
            parts.append(struct.pack("<q", -len(raw)))
            parts.append(raw)
        else:
            parts.append(struct.pack("<q", len(chunk)))
            parts.append(chunk)
    elif compression & COMPRESS_ZIP:
        z = zlib.compress(raw)
        if len(z) >= len(raw):
            parts.append(struct.pack("<q", -len(raw)))
            parts.append(raw)
        else:
            parts.append(struct.pack("<q", len(z)))
            parts.append(z)
    else:
        parts.append(raw)


def _mask_bits(mask_bytes: np.ndarray) -> np.ndarray:
    """Bit-packed node mask -> bool array indexed by node offset."""
    return np.unpackbits(mask_bytes, bitorder="little").astype(bool)


def _pack_bits(bits: np.ndarray) -> np.ndarray:
    return np.packbits(bits.astype(np.uint8), bitorder="little")


def _neg(v: np.ndarray) -> np.ndarray:
    return np.negative(v)


def _read_compressed_values(
    cur: _Cursor, count: int, value_mask_bits: np.ndarray, comps: int,
    half: bool, compression: int, background: np.ndarray,
) -> np.ndarray:
    """io::readCompressedValues — returns the dense `count`-value array."""
    # The metadata byte is present for all version>=222 streams regardless
    # of the ACTIVE_MASK flag (the writer emits NO_MASK_AND_ALL_VALS when
    # mask compression is off).
    metadata = cur.u8()
    bg = np.asarray(background, np.float32).reshape(comps)
    inactive1 = bg.copy()
    inactive0 = bg.copy() if metadata == NO_MASK_OR_INACTIVE_VALS else _neg(bg)
    if metadata in (NO_MASK_AND_ONE_INACTIVE_VAL, MASK_AND_ONE_INACTIVE_VAL,
                    MASK_AND_TWO_INACTIVE_VALS):
        inactive0 = cur.values(1, comps, half).reshape(comps)
        if metadata == MASK_AND_TWO_INACTIVE_VALS:
            inactive1 = cur.values(1, comps, half).reshape(comps)
    selection = None
    if metadata in (MASK_AND_NO_INACTIVE_VALS, MASK_AND_ONE_INACTIVE_VAL,
                    MASK_AND_TWO_INACTIVE_VALS):
        selection = _mask_bits(
            np.frombuffer(cur.take(count // 8), np.uint8))

    mask_compressed = bool(compression & COMPRESS_ACTIVE_MASK)
    temp_count = count
    if mask_compressed and metadata != NO_MASK_AND_ALL_VALS:
        temp_count = int(value_mask_bits.sum())
    data = _read_data(cur, temp_count, comps, half, compression)
    data = data.reshape(temp_count, comps)

    if temp_count == count:
        out = data
    else:
        out = np.empty((count, comps), np.float32)
        if selection is not None:
            out[:] = np.where(selection[:, None], inactive1, inactive0)
        else:
            out[:] = inactive0
        out[value_mask_bits] = data
    return out if comps > 1 else out.reshape(count)


def _write_compressed_values(
    parts: list, values: np.ndarray, value_mask_bits: np.ndarray,
    comps: int, compression: int, background: np.ndarray,
    half: bool = False,
) -> None:
    """io::writeCompressedValues — classify inactive values, emit metadata
    byte (+ optional inactive values + selection mask), then active values.

    When writing half grids the classification runs on f16-quantized
    values, so the stored inactive/selection encoding matches the bits a
    reader will reconstruct."""
    count = value_mask_bits.shape[0]
    store_t = np.float16 if half else np.float32
    word_t = np.uint16 if half else np.uint32
    vals = np.asarray(values, store_t).reshape(count, comps)
    if not (compression & COMPRESS_ACTIVE_MASK):
        parts.append(bytes([NO_MASK_AND_ALL_VALS]))
        _write_data(parts, vals, compression, half)
        return

    bg = np.asarray(background, store_t).reshape(comps)
    inactive = vals[~value_mask_bits]
    # Bitwise-distinct inactive values (handles -0.0/NaN deterministically).
    if inactive.shape[0]:
        uniq_rows, inverse = np.unique(
            inactive.view(word_t).reshape(-1, comps), axis=0,
            return_inverse=True)
        uniq = uniq_rows.view(store_t)
    else:
        uniq = np.zeros((0, comps), store_t)
        inverse = np.zeros(0, np.int64)

    def same(a, b) -> bool:
        return a.tobytes() == np.asarray(b, store_t).tobytes()

    metadata = NO_MASK_AND_ALL_VALS
    extra_vals: list = []
    selection = None
    if uniq.shape[0] == 0:
        metadata = NO_MASK_OR_INACTIVE_VALS
    elif uniq.shape[0] == 1:
        if same(uniq[0], bg):
            metadata = NO_MASK_OR_INACTIVE_VALS
        elif same(uniq[0], _neg(bg)):
            metadata = NO_MASK_AND_MINUS_BG
        else:
            metadata = NO_MASK_AND_ONE_INACTIVE_VAL
            extra_vals = [uniq[0]]
    elif uniq.shape[0] == 2:
        # Selection mask: ON selects inactive1, OFF selects inactive0.
        sel_inactive = np.zeros(inactive.shape[0], bool)
        if same(uniq[0], _neg(bg)) and same(uniq[1], bg):
            metadata = MASK_AND_NO_INACTIVE_VALS
            sel_inactive = inverse == 1  # bg rows -> ON
        elif same(uniq[1], _neg(bg)) and same(uniq[0], bg):
            metadata = MASK_AND_NO_INACTIVE_VALS
            sel_inactive = inverse == 0
        elif same(uniq[0], bg):
            metadata = MASK_AND_ONE_INACTIVE_VAL
            extra_vals = [uniq[1]]
            sel_inactive = inverse == 0  # bg rows -> ON
        elif same(uniq[1], bg):
            metadata = MASK_AND_ONE_INACTIVE_VAL
            extra_vals = [uniq[0]]
            sel_inactive = inverse == 1
        else:
            metadata = MASK_AND_TWO_INACTIVE_VALS
            extra_vals = [uniq[0], uniq[1]]
            sel_inactive = inverse == 1
        selection = np.zeros(count, bool)
        selection[~value_mask_bits] = sel_inactive

    parts.append(bytes([metadata]))
    for v in extra_vals:
        parts.append(_value_bytes(v, half))
    if selection is not None:
        parts.append(_pack_bits(selection).tobytes())
    keep = vals if metadata == NO_MASK_AND_ALL_VALS else vals[value_mask_bits]
    _write_data(parts, keep, compression, half)


# ---------------------------------------------------------------------------
# Tree topology helpers
# ---------------------------------------------------------------------------

def _offset_to_local(off: np.ndarray, log2dim: int) -> np.ndarray:
    """Node offset -> (x, y, z) local coordinates (offset = x<<2L | y<<L | z)."""
    dim_mask = (1 << log2dim) - 1
    x = (off >> (2 * log2dim)) & dim_mask
    y = (off >> log2dim) & dim_mask
    z = off & dim_mask
    return np.stack([x, y, z], axis=-1)


def _local_to_offset(xyz: np.ndarray, log2dim: int) -> np.ndarray:
    dim_mask = (1 << log2dim) - 1
    x, y, z = xyz[..., 0] & dim_mask, xyz[..., 1] & dim_mask, xyz[..., 2] & dim_mask
    return (x << (2 * log2dim)) | (y << log2dim) | z


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------

_COMPRESS_NAMES = {COMPRESS_ZIP: "zip", COMPRESS_ACTIVE_MASK: "active-mask",
                   COMPRESS_BLOSC: "blosc"}


def _compression_names(flags: int) -> List[str]:
    return ([n for bit, n in _COMPRESS_NAMES.items() if flags & bit]
            or ["none"])


def read_vdb_info(path: PathLike) -> dict:
    """Header and per-grid summary of a .vdb file.

    When the archive carries grid offsets (every file OpenVDB/Houdini
    writes, and ours), each grid's tree is skipped via its descriptor
    end position, so inspection stays cheap on multi-GB assets: the
    summary comes from the grid metamap (file_bbox_*, file_voxel_count —
    written by OpenVDB at save time) rather than a tree parse. This is
    the repo's counterpart of OpenVDB's `vdb_print` inspection, which
    the reference gets for free from the library it links
    (ref: src/Utils/Utils.hpp:361-403 loads via io::File).
    Offset-less streams fall back to a full parse.
    """
    buf = Path(path).read_bytes()
    cur = _Cursor(buf)
    magic = cur.i64()
    if magic != OPENVDB_MAGIC:
        raise FormatError(
            f"not an OpenVDB file: magic {magic:#x} != {OPENVDB_MAGIC:#x}")
    version = cur.u32()
    if version < MIN_SUPPORTED_VERSION:
        raise VersionError(
            f"OpenVDB file version {version} predates {MIN_SUPPORTED_VERSION}")
    lib_major, lib_minor = cur.u32(), cur.u32()
    has_offsets = bool(cur.u8())
    uuid = bytes(cur.take(36)).decode("ascii", errors="replace")
    _read_metamap(cur)  # file-level metadata (validity check)
    grid_count = cur.u32()
    if grid_count > 1 << 16:
        raise FormatError(f"implausible grid count {grid_count}")

    info = {
        "file_version": version,
        "library_version": f"{lib_major}.{lib_minor}",
        "uuid": uuid,
        "has_grid_offsets": has_offsets,
        "file_bytes": len(buf),
        "grids": [],
    }

    def _meta_val(meta, key):
        v = meta.get(key)
        if v is None:
            return None
        val = v[1]
        if isinstance(val, np.ndarray):
            return [int(x) if float(x).is_integer() else float(x)
                    for x in val.reshape(-1)]
        return val

    for _ in range(grid_count):
        unique_name = cur.string()
        grid_type = cur.string()
        half = grid_type.endswith(HALF_SUFFIX)
        if half:
            grid_type = grid_type[: -len(HALF_SUFFIX)]
        instance_parent = cur.string()
        end_pos = None
        if has_offsets:
            cur.i64()  # gridPos
            cur.i64()  # blockPos
            end_pos = cur.i64()
        entry = {
            "name": unique_name.split(_NAME_SEP)[0],
            "type": grid_type,
            "half_float": half,
            "supported": grid_type in _GRID_TYPES,
        }
        if instance_parent:
            entry["instance_of"] = instance_parent.split(_NAME_SEP)[0]
            if version >= 222:
                cur.u32()  # compression flags (no tree follows)
            meta = _read_metamap(cur)
            _read_transform(cur)
            entry["class"] = _meta_val(meta, "class") or "unknown"
            info["grids"].append(entry)
            continue
        if not entry["supported"]:
            if end_pos is None:
                raise FormatError(
                    f"cannot skip unsupported grid type '{grid_type}' in a "
                    "stream without grid offsets")
            cur.pos = end_pos
            info["grids"].append(entry)
            continue
        flags = cur.u32()
        meta = _read_metamap(cur)
        _read_transform(cur)
        entry["compression"] = _compression_names(flags)
        entry["class"] = _meta_val(meta, "class") or "unknown"
        for key, out_key in (("file_voxel_count", "active_voxels"),
                             ("file_bbox_min", "bbox_min"),
                             ("file_bbox_max", "bbox_max"),
                             ("file_mem_bytes", "mem_bytes")):
            v = _meta_val(meta, key)
            if v is not None:
                entry[out_key] = v
        if end_pos is not None:
            cur.pos = end_pos
        else:
            value_type, comps = _GRID_TYPES[grid_type]
            g = _read_tree(cur, value_type, comps, half, flags)
            entry["leaves"] = g.num_leaves
            entry.setdefault("active_voxels", _active_voxels(g))
        info["grids"].append(entry)
    return info


def read_vdb(path: PathLike) -> List[VdbGrid]:
    """Parse a .vdb file into VdbGrid objects (FloatGrid/Vec3fGrid only)."""
    buf = Path(path).read_bytes()
    cur = _Cursor(buf)

    magic = cur.i64()
    if magic != OPENVDB_MAGIC:
        raise FormatError(
            f"not an OpenVDB file: magic {magic:#x} != {OPENVDB_MAGIC:#x}")
    version = cur.u32()
    if version < MIN_SUPPORTED_VERSION:
        raise VersionError(
            f"OpenVDB file version {version} predates {MIN_SUPPORTED_VERSION}; "
            "re-save the asset with a current OpenVDB/Houdini build")
    cur.u32()  # library major
    cur.u32()  # library minor
    has_offsets = bool(cur.u8())
    cur.take(36)  # uuid (ASCII)

    file_meta = _read_metamap(cur)
    del file_meta  # parsed for validity; nothing in it affects decoding
    grid_count = cur.u32()
    if grid_count > 1 << 16:
        raise FormatError(f"implausible grid count {grid_count}")

    grids: List[VdbGrid] = []
    by_unique_name: Dict[str, VdbGrid] = {}
    for _ in range(grid_count):
        unique_name = cur.string()
        grid_type = cur.string()
        descriptor_half = grid_type.endswith(HALF_SUFFIX)
        if descriptor_half:
            grid_type = grid_type[: -len(HALF_SUFFIX)]
        instance_parent = cur.string()
        if has_offsets:
            cur.i64()  # gridPos
            cur.i64()  # blockPos
            end_pos = cur.i64()
        else:
            end_pos = None
        name = unique_name.split(_NAME_SEP)[0]

        if instance_parent:
            parent = by_unique_name.get(instance_parent)
            if parent is None:
                raise FormatError(
                    f"grid '{name}' instances unknown parent "
                    f"'{instance_parent}'")
            # Instanced grid: own metadata/transform, shared tree.
            if version >= 222:
                cur.u32()  # compression flags (no tree follows)
            meta = _read_metamap(cur)
            transform = _read_transform(cur)
            g = dataclasses.replace(
                parent, name=name, transform=transform, metadata=meta)
            grids.append(g)
            by_unique_name[unique_name] = g
            continue

        if grid_type not in _GRID_TYPES:
            if end_pos is None:
                raise FormatError(
                    f"cannot skip unsupported grid type '{grid_type}' in a "
                    "stream without grid offsets")
            cur.pos = end_pos  # skip unsupported grid (points, bool, ...)
            continue
        value_type, comps = _GRID_TYPES[grid_type]

        compression = cur.u32()
        meta = _read_metamap(cur)
        half = descriptor_half or bool(
            meta.get("is_saved_as_half_float", (None, False))[1])
        transform = _read_transform(cur)
        grid = _read_tree(cur, value_type, comps, half, compression)
        grid.name = name
        grid.transform = transform
        grid.metadata = meta
        grid.saved_as_half = half
        cls = meta.get("class", (None, "unknown"))[1]
        grid.grid_class = cls if isinstance(cls, str) else "unknown"
        grids.append(grid)
        by_unique_name[unique_name] = grid
    return grids


def _read_tree(cur: _Cursor, value_type: str, comps: int, half: bool,
               compression: int) -> VdbGrid:
    buffer_count = cur.i32()
    if buffer_count != 1:
        raise FormatError(f"multi-buffer trees unsupported ({buffer_count})")

    background = cur.values(1, comps, half).reshape(comps)
    num_tiles = cur.u32()
    num_children = cur.u32()

    tiles: List[VdbTile] = []
    for _ in range(num_tiles):
        origin = cur.coord()
        value = cur.values(1, comps, half).reshape(comps)
        active = bool(cur.u8())
        tiles.append(VdbTile(origin, I5_SPAN, _squeeze(value, comps), active))

    origins: List[np.ndarray] = []
    masks: List[np.ndarray] = []

    # Topology pass: per-I5 child, record internal masks + leaf layout.
    for _ in range(num_children):
        i5_origin = cur.coord()
        _read_internal_topology(
            cur, i5_origin, I5_LOG2, I4_LOG2, comps, half, compression,
            background, tiles, origins, masks)

    n = len(origins)
    origins_arr = (np.stack(origins).astype(np.int32) if n
                   else np.zeros((0, 3), np.int32))
    masks_arr = (np.stack(masks) if n
                 else np.zeros((0, LEAF_SIZE // 8), np.uint8))

    # Buffer pass: same DFS order.
    shape = (n, LEAF_DIM, LEAF_DIM, LEAF_DIM) + ((comps,) if comps > 1 else ())
    leaves = np.zeros(shape, np.float32)
    flat = leaves.reshape(n, LEAF_SIZE, comps) if comps > 1 else \
        leaves.reshape(n, LEAF_SIZE)
    for i in range(n):
        mask_bytes = np.frombuffer(cur.take(LEAF_SIZE // 8), np.uint8)
        bits = _mask_bits(mask_bytes)
        vals = _read_compressed_values(
            cur, LEAF_SIZE, bits, comps, half, compression, background)
        flat[i] = vals
        masks_arr[i] = mask_bytes  # buffer-pass mask is authoritative

    return VdbGrid(
        name="", value_type=value_type, origins=origins_arr, leaves=leaves,
        leaf_masks=masks_arr, background=_squeeze(background, comps),
        tiles=tiles)


def _squeeze(v: np.ndarray, comps: int):
    return float(v[0]) if comps == 1 else v.copy()


def _read_internal_topology(
    cur: _Cursor, node_origin: np.ndarray, log2dim: int, child_log2: int,
    comps: int, half: bool, compression: int, background: np.ndarray,
    tiles: List[VdbTile], origins: List[np.ndarray], masks: List[np.ndarray],
) -> None:
    size = (1 << log2dim) ** 3
    child_mask = _mask_bits(np.frombuffer(cur.take(size // 8), np.uint8))
    value_mask = _mask_bits(np.frombuffer(cur.take(size // 8), np.uint8))
    values = _read_compressed_values(
        cur, size, value_mask, comps, half, compression, background)
    values = values.reshape(size, comps) if comps == 1 else values

    child_span = I4_SPAN if child_log2 == I4_LOG2 else LEAF_SPAN
    # Active tiles at this level.
    (tile_offs,) = np.nonzero(value_mask & ~child_mask)
    if tile_offs.size:
        local = _offset_to_local(tile_offs, log2dim)
        for k, off in enumerate(tile_offs):
            tiles.append(VdbTile(
                node_origin + local[k].astype(np.int32) * child_span,
                child_span,
                _squeeze(np.asarray(values[off], np.float32).reshape(comps),
                         comps),
                True))

    (child_offs,) = np.nonzero(child_mask)
    local = _offset_to_local(child_offs, log2dim)
    for k in range(child_offs.shape[0]):
        child_origin = (node_origin + local[k].astype(np.int32) * child_span)
        if child_log2 == I4_LOG2:
            _read_internal_topology(
                cur, child_origin, I4_LOG2, LEAF_LOG2, comps, half,
                compression, background, tiles, origins, masks)
        else:
            # Leaf topology: just its value mask.
            masks.append(
                np.frombuffer(cur.take(LEAF_SIZE // 8), np.uint8).copy())
            origins.append(child_origin)


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------

def write_vdb(
    path: PathLike,
    grids: Sequence[VdbGrid],
    *,
    compression: int = DEFAULT_COMPRESSION,
    half: Optional[bool] = None,
) -> None:
    """Write grids to an OpenVDB file (version 224, seekable archive).

    compression may include COMPRESS_BLOSC (the ecosystem default codec,
    vdb/blosc.py). half=True stores all value payloads as f16 (Houdini's
    default VDB export — half the file size for ~3 decimal digits);
    half=False forces full floats; None (default) follows each grid's
    `saved_as_half` flag, so a read->write round trip preserves precision
    mode.
    """
    if (compression & COMPRESS_BLOSC) and (compression & COMPRESS_ZIP):
        raise FormatError("choose one of BLOSC or ZIP, not both")
    parts: list = []
    parts.append(struct.pack("<q", OPENVDB_MAGIC))
    parts.append(struct.pack("<I", FILE_VERSION))
    parts.append(struct.pack("<II", *LIBRARY_VERSION))
    parts.append(bytes([1]))  # hasGridOffsets
    parts.append(str(_uuid.uuid4()).encode("ascii"))  # 36-char uuid
    _write_metamap(parts, {})  # file-level metadata
    parts.append(struct.pack("<I", len(grids)))

    # Assemble with explicit offsets: easier than seek-back fixups in memory.
    blob = b"".join(parts)
    out = bytearray(blob)
    seen: Dict[str, int] = {}
    for g in grids:
        n = seen.get(g.name, 0)
        seen[g.name] = n + 1
        unique = g.name if n == 0 else f"{g.name}{_NAME_SEP}{n}"
        g_half = g.saved_as_half if half is None else bool(half)
        out += _grid_blob(g, unique, len(out), compression, g_half)
    Path(path).write_bytes(bytes(out))


def _grid_blob(g: VdbGrid, unique_name: str, base: int,
               compression: int, half: bool = False) -> bytes:
    comps = g.channels
    type_name = _TYPE_NAMES[g.value_type]
    if half:
        type_name += HALF_SUFFIX  # GridDescriptor saveFloatAsHalf marker
    head = _pack_string(unique_name) + _pack_string(type_name) + _pack_string("")

    body_parts: list = []
    body_parts.append(struct.pack("<I", compression))
    meta = dict(g.metadata)
    meta.setdefault("class", ("string", g.grid_class))
    if half:
        meta["is_saved_as_half_float"] = ("bool", True)
    else:
        meta.pop("is_saved_as_half_float", None)
    lo, hi = _grid_bbox(g)
    meta.setdefault("file_bbox_min", ("vec3i", lo))
    meta.setdefault("file_bbox_max", ("vec3i", hi))
    meta.setdefault("file_voxel_count", ("int64", _active_voxels(g)))
    _write_metamap(body_parts, meta)
    _write_transform(body_parts, g.transform)

    topo_parts, buffer_parts = _write_tree(g, comps, compression, half)
    body = b"".join(body_parts)
    topo = b"".join(topo_parts)
    buffers = b"".join(buffer_parts)

    # Offsets are absolute file positions (reference: GridDescriptor
    # stream-pos triple rewritten after the grid is written).
    grid_pos = base + len(head) + 24
    block_pos = grid_pos + len(body) + len(topo)
    end_pos = block_pos + len(buffers)
    offsets = struct.pack("<qqq", grid_pos, block_pos, end_pos)
    return head + offsets + body + topo + buffers


def _grid_bbox(g: VdbGrid) -> Tuple[np.ndarray, np.ndarray]:
    pts = []
    if g.num_leaves:
        pts.append(g.origins)
        pts.append(g.origins + LEAF_SPAN - 1)
    for t in g.tiles:
        if t.active:
            pts.append(t.origin.reshape(1, 3))
            pts.append((t.origin + t.span - 1).reshape(1, 3))
    if not pts:
        z = np.zeros(3, np.int32)
        return z, z
    allp = np.concatenate(pts, axis=0)
    return allp.min(axis=0).astype(np.int32), allp.max(axis=0).astype(np.int32)


def _active_voxels(g: VdbGrid) -> int:
    n = int(np.unpackbits(g.leaf_masks).sum()) if g.num_leaves else 0
    n += sum(int(t.span) ** 3 for t in g.tiles if t.active)
    return n


def _write_tree(g: VdbGrid, comps: int, compression: int,
                half: bool = False) -> Tuple[list, list]:
    bg = np.asarray(g.background, np.float32).reshape(comps)
    origins = g.origins
    if origins.size and np.any(origins % LEAF_SPAN):
        raise FormatError("leaf origins must be multiples of 8")

    # Partition tiles by level.
    root_tiles = [t for t in g.tiles if t.span == I5_SPAN]
    i5_tiles = [t for t in g.tiles if t.span == I4_SPAN]
    i4_tiles = [t for t in g.tiles if t.span == LEAF_SPAN]
    if any(t.span not in (I5_SPAN, I4_SPAN, LEAF_SPAN) for t in g.tiles):
        raise FormatError("tile spans must be one of 8/128/4096")

    # Group leaves: i5 key (floor-div 4096) -> i4 offset -> leaf offset.
    i5_key = origins >> (I5_LOG2 + I4_LOG2 + LEAF_LOG2) if origins.size else \
        np.zeros((0, 3), np.int32)
    i4_off = _local_to_offset(origins >> (I4_LOG2 + LEAF_LOG2), I5_LOG2)
    leaf_off = _local_to_offset(origins >> LEAF_LOG2, I4_LOG2)
    order = np.lexsort((leaf_off, i4_off, i5_key[:, 2], i5_key[:, 1],
                        i5_key[:, 0])) if origins.size else np.zeros(0, int)

    # Nested structure: {i5_key: {i4_off: [(leaf_off, leaf_idx), ...]}}
    tree: Dict[tuple, Dict[int, list]] = {}
    for idx in order:
        k5 = tuple(int(v) for v in i5_key[idx])
        tree.setdefault(k5, {}).setdefault(int(i4_off[idx]), []).append(
            (int(leaf_off[idx]), int(idx)))
    # Tiles create (or join) nodes too.
    i5_tile_map: Dict[tuple, list] = {}
    for t in i5_tiles:
        k5 = tuple(int(v) for v in np.asarray(t.origin) >> 12)
        i5_tile_map.setdefault(k5, []).append(t)
        tree.setdefault(k5, {})
    i4_tile_map: Dict[tuple, Dict[int, list]] = {}
    for t in i4_tiles:
        o = np.asarray(t.origin)
        k5 = tuple(int(v) for v in o >> 12)
        off4 = int(_local_to_offset(o >> (I4_LOG2 + LEAF_LOG2), I5_LOG2))
        i4_tile_map.setdefault(k5, {}).setdefault(off4, []).append(t)
        tree.setdefault(k5, {}).setdefault(off4, [])

    keys5 = sorted(tree.keys())

    topo: list = []
    bufs: list = []
    topo.append(struct.pack("<i", 1))  # TreeBase bufferCount
    topo.append(_value_bytes(bg, half))
    topo.append(struct.pack("<II", len(root_tiles), len(keys5)))
    for t in root_tiles:
        topo.append(np.asarray(t.origin, "<i4").tobytes())
        topo.append(_value_bytes(
            np.asarray(t.value, np.float32).reshape(comps), half))
        topo.append(bytes([1 if t.active else 0]))

    flat_leaves = (g.leaves.reshape(-1, LEAF_SIZE, comps) if comps > 1
                   else g.leaves.reshape(-1, LEAF_SIZE, 1))

    for k5 in keys5:
        node_origin = (np.asarray(k5, np.int64) << 12).astype(np.int32)
        topo.append(node_origin.astype("<i4").tobytes())
        _write_internal(
            topo, bufs, tree[k5], i5_tile_map.get(k5, []),
            i4_tile_map.get(k5, {}), flat_leaves, g.leaf_masks, comps,
            compression, bg, half)
    return topo, bufs


def _write_internal(
    topo: list, bufs: list, i4_children: Dict[int, list],
    i5_tiles: list, i4_tiles: Dict[int, list],
    flat_leaves: np.ndarray, leaf_masks: np.ndarray, comps: int,
    compression: int, bg: np.ndarray, half: bool = False,
) -> None:
    """Emit one I5 node: masks, tile values, then its I4 children (each of
    which emits its own masks/values and leaf topologies/buffers)."""
    child_mask = np.zeros(I5_SIZE, bool)
    value_mask = np.zeros(I5_SIZE, bool)
    values = np.tile(bg, (I5_SIZE, 1))
    child_offs = sorted(i4_children.keys())
    for off in child_offs:
        child_mask[off] = True
    for t in i5_tiles:
        off = int(_local_to_offset(
            np.asarray(t.origin) >> (I4_LOG2 + LEAF_LOG2), I5_LOG2))
        if child_mask[off]:
            raise FormatError("tile and child node overlap at 128-span slot")
        value_mask[off] = t.active
        values[off] = np.asarray(t.value, np.float32).reshape(comps)

    topo.append(_pack_bits(child_mask).tobytes())
    topo.append(_pack_bits(value_mask).tobytes())
    _write_compressed_values(topo, values, value_mask, comps, compression,
                             bg, half)

    for off in child_offs:
        leaf_entries = i4_children[off]
        node_tiles = i4_tiles.get(off, [])
        _write_internal4(topo, bufs, leaf_entries, node_tiles, flat_leaves,
                         leaf_masks, comps, compression, bg, half)


def _write_internal4(
    topo: list, bufs: list, leaf_entries: list, node_tiles: list,
    flat_leaves: np.ndarray, leaf_masks: np.ndarray, comps: int,
    compression: int, bg: np.ndarray, half: bool = False,
) -> None:
    child_mask = np.zeros(I4_SIZE, bool)
    value_mask = np.zeros(I4_SIZE, bool)
    values = np.tile(bg, (I4_SIZE, 1))
    for leaf_off, _ in leaf_entries:
        child_mask[leaf_off] = True
    for t in node_tiles:
        off = int(_local_to_offset(np.asarray(t.origin) >> LEAF_LOG2, I4_LOG2))
        if child_mask[off]:
            raise FormatError("tile and leaf overlap at 8-span slot")
        value_mask[off] = t.active
        values[off] = np.asarray(t.value, np.float32).reshape(comps)

    topo.append(_pack_bits(child_mask).tobytes())
    topo.append(_pack_bits(value_mask).tobytes())
    _write_compressed_values(topo, values, value_mask, comps, compression,
                             bg, half)

    for leaf_off, leaf_idx in sorted(leaf_entries):
        mask_bytes = leaf_masks[leaf_idx].tobytes()
        topo.append(mask_bytes)  # leaf topology = value mask
        # Leaf buffers: mask again, then the 512 values.
        bufs.append(mask_bytes)
        bits = _mask_bits(leaf_masks[leaf_idx])
        vals = flat_leaves[leaf_idx]
        _write_compressed_values(
            bufs, vals if comps > 1 else vals.reshape(LEAF_SIZE),
            bits, comps, compression, bg, half)


# ---------------------------------------------------------------------------
# LeafGrid bridge
# ---------------------------------------------------------------------------

def vdbgrid_to_leafgrid(g: VdbGrid, *, materialize_leaf_tiles: bool = True):
    """VdbGrid -> runtime LeafGrid (dense leaf blocks + origins).

    Inactive voxels keep their stored values (OpenVDB leaf buffers hold all
    512 values; the reference's LeafManager gather copies them verbatim,
    ref: src/orchestrator/VQVAECodec.cpp:50-56). Active 8-span tiles become
    constant leaves; larger active tiles cannot be represented leaf-wise and
    are dropped with a count in the returned grid's name-keyed stats.
    """
    from vqvdb_tpu.vdb.grid import LeafGrid

    origins = g.origins
    leaves = g.leaves if g.channels > 1 else g.leaves[..., None] \
        if g.leaves.ndim == 4 else g.leaves
    leaves = leaves.reshape(-1, LEAF_DIM, LEAF_DIM, LEAF_DIM, g.channels)
    extra_origins, extra_leaves = [], []
    dropped = 0
    for t in g.tiles:
        if not t.active:
            continue
        if t.span == LEAF_SPAN and materialize_leaf_tiles:
            extra_origins.append(np.asarray(t.origin, np.int32))
            extra_leaves.append(np.full(
                (LEAF_DIM, LEAF_DIM, LEAF_DIM, g.channels),
                np.asarray(t.value, np.float32).reshape(g.channels),
                np.float32))
        else:
            dropped += 1
    if extra_origins:
        origins = np.concatenate([origins, np.stack(extra_origins)], axis=0)
        leaves = np.concatenate([leaves, np.stack(extra_leaves)], axis=0)
    bg = g.background
    lg = LeafGrid(
        name=g.name, origins=origins, leaves=leaves,
        transform=g.transform.astype(np.float32),
        background=float(np.asarray(bg).reshape(-1)[0]))
    lg.dropped_tiles = dropped  # surfaced, not silently lost
    return lg


def leafgrid_to_vdbgrid(lg) -> VdbGrid:
    """Runtime LeafGrid -> VdbGrid (all voxels active, the reference's
    decode-scatter semantics: setValuesOn over the whole leaf,
    ref: src/orchestrator/VQVAECodec.cpp:182-192)."""
    c = lg.channels
    leaves = lg.leaves if c > 1 else lg.leaves[..., 0]
    return VdbGrid(
        name=lg.name,
        value_type="float" if c == 1 else "vec3s",
        origins=lg.origins,
        leaves=leaves,
        transform=np.asarray(lg.transform, np.float64),
        background=(float(lg.background) if c == 1
                    else np.full(3, lg.background, np.float32)),
        grid_class="unknown",
    )


def read_vdb_leafgrids(path: PathLike) -> list:
    """Read a .vdb file straight into LeafGrids (the CLI/codec entry)."""
    return [vdbgrid_to_leafgrid(g) for g in read_vdb(path)]


# ---------------------------------------------------------------------------
# Streaming (bounded-memory) leaf reader
# ---------------------------------------------------------------------------

class VdbLeafStream:
    """One grid's leaves, read lazily from an mmapped .vdb.

    `read_vdb` materializes every grid (leaf buffers are 2 KiB/leaf f32) —
    a scene larger than host RAM cannot ingest that way even though the
    `.vqvdb` side streams at O(batch) memory. This class holds only the
    grid's *topology* (origins + masks + tiles, ~76 B/leaf, parsed up
    front) and reads leaf value buffers on demand from the OS page cache —
    the counterpart of the reference's lazy OpenVDB grid access
    (ref: src/Utils/Utils.hpp:361-403). Active 8-span tiles are appended
    as constant leaves at the end of the stream (same policy as
    vdbgrid_to_leafgrid); larger active tiles are counted in
    `dropped_tiles`.

    Leaf order and values match `read_vdb` exactly, so a streamed encode
    produces a byte-identical `.vqvdb` (tests/test_streaming_vdb.py).
    """

    def __init__(self, *, name: str, comps: int, half: bool,
                 compression: int, transform: np.ndarray,
                 background: np.ndarray, origins: np.ndarray,
                 masks: np.ndarray, tiles: List[VdbTile], buffer_pos: int,
                 mm, grid_class: str = "unknown",
                 metadata: Optional[Dict[str, tuple]] = None) -> None:
        self.name = name
        self.transform = np.asarray(transform, np.float32).reshape(4, 4)
        self.grid_class = grid_class
        self.metadata = metadata or {}
        self.background = float(np.asarray(background).reshape(-1)[0])
        self.leaf_masks = masks
        self._comps = comps
        self._half = half
        self._compression = compression
        self._bg_arr = np.asarray(background, np.float32).reshape(comps)
        self._buffer_pos = buffer_pos
        self._mm = mm
        self._n_buffers = int(origins.shape[0])
        tile_origins, tile_values, dropped = [], [], 0
        for t in tiles:
            if not t.active:
                continue
            if t.span == LEAF_SPAN:
                tile_origins.append(np.asarray(t.origin, np.int32))
                tile_values.append(
                    np.asarray(t.value, np.float32).reshape(comps))
            else:
                dropped += 1
        self.dropped_tiles = dropped
        self._tile_values = (np.stack(tile_values) if tile_values
                             else np.zeros((0, comps), np.float32))
        self.origins = (np.concatenate([origins, np.stack(tile_origins)])
                        if tile_origins else origins)

    @property
    def num_leaves(self) -> int:
        return int(self.origins.shape[0])

    @property
    def channels(self) -> int:
        return self._comps

    def leaf_batches(self, batch_size: int):
        """Yield [n<=batch_size, 8, 8, 8, C] f32 arrays covering every leaf
        (buffer leaves first, then 8-span tile leaves), in `origins` order.
        Only O(batch_size) leaf values are resident at once."""
        import mmap as _mmap

        comps = self._comps
        cur = _Cursor(self._mm)
        cur.pos = self._buffer_pos
        # Sequentially-touched mmap pages otherwise stay resident for the
        # life of the map, so peak RSS would scale with file size even
        # though heap is O(batch) (round-4 bounded-RSS failure). Drop
        # consumed pages behind the cursor; they re-fault if re-read.
        page = getattr(_mmap, "PAGESIZE", 4096)
        can_drop = (hasattr(self._mm, "madvise")
                    and hasattr(_mmap, "MADV_DONTNEED"))
        drop_from = self._buffer_pos - (self._buffer_pos % page)
        for s in range(0, self._n_buffers, batch_size):
            m = min(batch_size, self._n_buffers - s)
            out = np.empty((m, LEAF_DIM, LEAF_DIM, LEAF_DIM, comps),
                           np.float32)
            flat = out.reshape(m, LEAF_SIZE, comps)
            for i in range(m):
                bits = _mask_bits(
                    np.frombuffer(cur.take(LEAF_SIZE // 8), np.uint8))
                vals = _read_compressed_values(
                    cur, LEAF_SIZE, bits, comps, self._half,
                    self._compression, self._bg_arr)
                flat[i] = vals.reshape(LEAF_SIZE, comps)
            if can_drop:
                hi = cur.pos - (cur.pos % page)
                if hi > drop_from:
                    try:
                        self._mm.madvise(_mmap.MADV_DONTNEED, drop_from,
                                         hi - drop_from)
                        drop_from = hi
                    except (ValueError, OSError):
                        can_drop = False
            yield out
        for s in range(0, self._tile_values.shape[0], batch_size):
            vals = self._tile_values[s : s + batch_size]
            yield np.broadcast_to(
                vals[:, None, None, None, :],
                (vals.shape[0], LEAF_DIM, LEAF_DIM, LEAF_DIM, comps)
            ).astype(np.float32)


def open_vdb_leaf_streams(path: PathLike, names=None) -> List[VdbLeafStream]:
    """Open a .vdb for streaming leaf ingestion (see VdbLeafStream).

    Parses headers, transforms, and tree *topology* for every float/vec3
    grid (instanced grids share their parent's buffers); leaf value buffers
    stay on disk. The file is mmapped, so host memory stays O(topology +
    read batch) regardless of scene size. `names` filters grids by name.
    """
    import mmap

    f = open(path, "rb")
    try:
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
    finally:
        f.close()  # the mmap keeps its own reference
    cur = _Cursor(mm)

    magic = cur.i64()
    if magic != OPENVDB_MAGIC:
        raise FormatError(
            f"not an OpenVDB file: magic {magic:#x} != {OPENVDB_MAGIC:#x}")
    version = cur.u32()
    if version < MIN_SUPPORTED_VERSION:
        raise VersionError(
            f"OpenVDB file version {version} predates "
            f"{MIN_SUPPORTED_VERSION}; re-save the asset")
    cur.u32()
    cur.u32()
    has_offsets = bool(cur.u8())
    cur.take(36)
    _read_metamap(cur)
    grid_count = cur.u32()
    if grid_count > 1 << 16:
        raise FormatError(f"implausible grid count {grid_count}")

    streams: List[VdbLeafStream] = []
    by_unique: Dict[str, VdbLeafStream] = {}
    want = {names} if isinstance(names, str) else (
        set(names) if names is not None else None)
    for _ in range(grid_count):
        unique_name = cur.string()
        grid_type = cur.string()
        descriptor_half = grid_type.endswith(HALF_SUFFIX)
        if descriptor_half:
            grid_type = grid_type[: -len(HALF_SUFFIX)]
        instance_parent = cur.string()
        end_pos = None
        if has_offsets:
            cur.i64()
            cur.i64()
            end_pos = cur.i64()
        name = unique_name.split(_NAME_SEP)[0]

        if instance_parent:
            parent = by_unique.get(instance_parent)
            if parent is None:
                raise FormatError(
                    f"grid '{name}' instances unknown parent "
                    f"'{instance_parent}'")
            if version >= 222:
                cur.u32()
            meta = _read_metamap(cur)
            transform = _read_transform(cur)
            s = VdbLeafStream(
                name=name, comps=parent._comps, half=parent._half,
                compression=parent._compression, transform=transform,
                background=parent._bg_arr, origins=parent.origins,
                masks=parent.leaf_masks, tiles=[],
                buffer_pos=parent._buffer_pos, mm=mm, metadata=meta)
            # Instances share the parent's buffers/tiles verbatim.
            s._n_buffers = parent._n_buffers
            s._tile_values = parent._tile_values
            s.dropped_tiles = parent.dropped_tiles
            by_unique[unique_name] = s
            if want is None or name in want:
                streams.append(s)
            continue

        if grid_type not in _GRID_TYPES:
            if end_pos is None:
                raise FormatError(
                    f"cannot skip unsupported grid type '{grid_type}' in a "
                    "stream without grid offsets")
            cur.pos = end_pos
            continue
        value_type, comps = _GRID_TYPES[grid_type]

        compression = cur.u32()
        meta = _read_metamap(cur)
        half = descriptor_half or bool(
            meta.get("is_saved_as_half_float", (None, False))[1])
        transform = _read_transform(cur)

        # Tree topology only (the first half of _read_tree).
        buffer_count = cur.i32()
        if buffer_count != 1:
            raise FormatError(
                f"multi-buffer trees unsupported ({buffer_count})")
        background = cur.values(1, comps, half).reshape(comps)
        num_tiles = cur.u32()
        num_children = cur.u32()
        tiles: List[VdbTile] = []
        for _ in range(num_tiles):
            origin = cur.coord()
            value = cur.values(1, comps, half).reshape(comps)
            active = bool(cur.u8())
            tiles.append(VdbTile(origin, I5_SPAN, _squeeze(value, comps),
                                 active))
        origins_l: List[np.ndarray] = []
        masks_l: List[np.ndarray] = []
        for _ in range(num_children):
            i5_origin = cur.coord()
            _read_internal_topology(
                cur, i5_origin, I5_LOG2, I4_LOG2, comps, half, compression,
                background, tiles, origins_l, masks_l)
        n = len(origins_l)
        origins = (np.stack(origins_l).astype(np.int32) if n
                   else np.zeros((0, 3), np.int32))
        masks = (np.stack(masks_l) if n
                 else np.zeros((0, LEAF_SIZE // 8), np.uint8))
        buffer_pos = cur.pos

        cls = meta.get("class", (None, "unknown"))[1]
        s = VdbLeafStream(
            name=name, comps=comps, half=half, compression=compression,
            transform=transform, background=background, origins=origins,
            masks=masks, tiles=tiles, buffer_pos=buffer_pos, mm=mm,
            grid_class=cls if isinstance(cls, str) else "unknown",
            metadata=meta)
        by_unique[unique_name] = s
        if want is None or name in want:
            streams.append(s)

        # Skip the buffer section to reach the next grid.
        if end_pos is not None:
            cur.pos = end_pos
        else:
            for _ in range(n):
                bits = _mask_bits(
                    np.frombuffer(cur.take(LEAF_SIZE // 8), np.uint8))
                _read_compressed_values(cur, LEAF_SIZE, bits, comps, half,
                                        compression, background)
    return streams


def write_vdb_leafgrids(path: PathLike, leaf_grids: Sequence,
                        *, compression: int = DEFAULT_COMPRESSION,
                        half: Optional[bool] = None) -> None:
    write_vdb(path, [leafgrid_to_vdbgrid(g) for g in leaf_grids],
              compression=compression, half=half)

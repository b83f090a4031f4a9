"""Sparse leaf-grid container — the framework's OpenVDB-equivalent volume type.

The reference runtime walks OpenVDB `FloatGrid` trees with a `LeafManager`
and touches leaves by origin coordinate (ref: src/orchestrator/VQVAECodec.cpp
leaf gather / scatter paths, src/Utils/Utils.hpp grid helpers). On a TPU host
there is no Houdini/OpenVDB; the natural equivalent is a flat, vectorized
structure-of-arrays:

    origins : int32 [N, 3]   leaf origins in index space (multiples of 8)
    leaves  : f32  [N, 8, 8, 8, C]  voxel payloads (channels-last)

which is exactly the layout the batched encoder consumes — leaf gather
becomes a no-op view instead of a TBB memcpy loop. Dense <-> sparse
conversion is pure numpy block reshaping (no per-leaf Python loops), and the
same layout round-trips to the reference's `.npy` leaf-dataset convention
(array of [N,8,8,8] blocks + optional `*._origins.npy` sidecar, ref:
python/VQVAE_v2.py:21-62).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional, Tuple, Union

import numpy as np

from vqvdb_tpu.core.config import LEAF_DIM

PathLike = Union[str, Path]


@dataclasses.dataclass
class LeafGrid:
    """A named sparse volume as (origins, leaf blocks) + index->world affine."""

    name: str
    origins: np.ndarray  # (N, 3) int32, multiples of LEAF_DIM
    leaves: np.ndarray  # (N, 8, 8, 8, C) float32
    transform: np.ndarray = dataclasses.field(
        default_factory=lambda: np.eye(4, dtype=np.float32)
    )
    background: float = 0.0

    def __post_init__(self) -> None:
        self.origins = np.ascontiguousarray(self.origins, dtype=np.int32).reshape(-1, 3)
        leaves = np.asarray(self.leaves, dtype=np.float32)
        if leaves.ndim == 4:  # (N, 8, 8, 8) -> scalar channel
            leaves = leaves[..., None]
        if leaves.shape[1:4] != (LEAF_DIM, LEAF_DIM, LEAF_DIM):
            raise ValueError(f"leaves must be (N,8,8,8[,C]); got {leaves.shape}")
        self.leaves = np.ascontiguousarray(leaves)
        self.transform = np.asarray(self.transform, dtype=np.float32).reshape(4, 4)
        if self.origins.shape[0] != self.leaves.shape[0]:
            raise ValueError(
                f"{self.origins.shape[0]} origins vs {self.leaves.shape[0]} leaves"
            )

    # -- properties ------------------------------------------------------
    @property
    def num_leaves(self) -> int:
        return int(self.leaves.shape[0])

    @property
    def channels(self) -> int:
        return int(self.leaves.shape[-1])

    @property
    def active_voxel_count(self) -> int:
        return self.num_leaves * LEAF_DIM**3

    def index_bbox(self) -> Tuple[np.ndarray, np.ndarray]:
        """(min_corner, max_corner_exclusive) over all leaves, index space."""
        if self.num_leaves == 0:
            z = np.zeros(3, np.int32)
            return z, z
        lo = self.origins.min(axis=0)
        hi = self.origins.max(axis=0) + LEAF_DIM
        return lo, hi

    # -- dense conversion ------------------------------------------------
    @classmethod
    def from_dense(
        cls,
        name: str,
        dense: np.ndarray,
        *,
        origin: Tuple[int, int, int] = (0, 0, 0),
        transform: Optional[np.ndarray] = None,
        background: float = 0.0,
        tolerance: float = 0.0,
    ) -> "LeafGrid":
        """Extract active 8^3 leaves from a dense array (X, Y, Z[, C]).

        A leaf is active when any voxel deviates from `background` by more
        than `tolerance` (mirrors OpenVDB's sparsification semantics).
        Vectorized: one reshape + one reduction, no Python per-leaf loop.
        """
        dense = np.asarray(dense, dtype=np.float32)
        if dense.ndim == 3:
            dense = dense[..., None]
        x, y, z, c = dense.shape
        ld = LEAF_DIM
        px, py, pz = (-x) % ld, (-y) % ld, (-z) % ld
        if px or py or pz:
            dense = np.pad(
                dense, ((0, px), (0, py), (0, pz), (0, 0)),
                constant_values=background,
            )
            x, y, z, _ = dense.shape
        nx, ny, nz = x // ld, y // ld, z // ld
        blocks = dense.reshape(nx, ld, ny, ld, nz, ld, c)
        blocks = blocks.transpose(0, 2, 4, 1, 3, 5, 6).reshape(-1, ld, ld, ld, c)
        active = np.abs(blocks - background).max(axis=(1, 2, 3, 4)) > tolerance
        (flat_idx,) = np.nonzero(active)
        bi = np.stack(np.unravel_index(flat_idx, (nx, ny, nz)), axis=1)
        origins = (bi * ld + np.asarray(origin, np.int32)).astype(np.int32)
        return cls(
            name=name,
            origins=origins,
            leaves=blocks[flat_idx],
            transform=np.eye(4, dtype=np.float32) if transform is None else transform,
            background=background,
        )

    def to_dense(self) -> Tuple[np.ndarray, np.ndarray]:
        """Scatter leaves into a dense array over the grid's bounding box.

        Returns (dense (X,Y,Z,C) f32, min_corner (3,) i32). The scatter is a
        single vectorized block assignment — the TPU-host replacement for
        the reference's TBB thread-local-grid merge scatter
        (ref: src/orchestrator/VQVAECodec.cpp decode scatter loop).
        """
        lo, hi = self.index_bbox()
        ext = hi - lo
        ld = LEAF_DIM
        nx, ny, nz = (int(e) // ld for e in ext)
        c = self.channels
        if self.num_leaves == 0:
            return np.zeros((0, 0, 0, c), np.float32), lo
        grid_blocks = np.full((nx, ny, nz, ld, ld, ld, c), self.background, np.float32)
        bi = (self.origins - lo) // ld
        grid_blocks[bi[:, 0], bi[:, 1], bi[:, 2]] = self.leaves
        dense = grid_blocks.transpose(0, 3, 1, 4, 2, 5, 6).reshape(
            nx * ld, ny * ld, nz * ld, c
        )
        return dense, lo

    # -- npy persistence (reference leaf-dataset convention) -------------
    def save_npy(self, path: PathLike, *, with_origins: bool = True) -> None:
        """Save leaves as [N,8,8,8] (scalar) / [N,8,8,8,C] channels-last .npy
        plus an `*._origins.npy` sidecar — the reference training-data layout."""
        path = Path(path)
        arr = self.leaves[..., 0] if self.channels == 1 else self.leaves
        np.save(path, arr)
        if with_origins:
            np.save(path.with_suffix("._origins.npy"), self.origins)
        meta = {
            "name": self.name,
            "background": self.background,
            "transform": self.transform.tolist(),
        }
        path.with_suffix(".gridmeta.json").write_text(json.dumps(meta))

    @classmethod
    def load_npy(
        cls,
        path: PathLike,
        *,
        name: Optional[str] = None,
    ) -> "LeafGrid":
        path = Path(path)
        leaves = np.load(path)
        origins_path = path.with_suffix("._origins.npy")
        if origins_path.exists():
            origins = np.load(origins_path)
        else:
            # Synthetic row-major origins when no sidecar exists (pure
            # training datasets don't need spatial placement).
            n = leaves.shape[0]
            side = int(np.ceil(n ** (1.0 / 3.0)))
            idx = np.arange(n)
            origins = np.stack(
                np.unravel_index(idx, (side, side, side)), axis=1
            ).astype(np.int32) * LEAF_DIM
        meta_path = path.with_suffix(".gridmeta.json")
        transform = np.eye(4, dtype=np.float32)
        background = 0.0
        gname = name or path.stem
        if meta_path.exists():
            meta = json.loads(meta_path.read_text())
            gname = name or meta.get("name", gname)
            transform = np.asarray(meta.get("transform", transform), np.float32)
            background = float(meta.get("background", 0.0))
        return cls(name=gname, origins=origins, leaves=leaves,
                   transform=transform, background=background)


# ---------------------------------------------------------------------------
# Quality metrics (the reference's notebook acceptance criteria,
# ref: notebook_scalar.ipynb cells 2-9)
# ---------------------------------------------------------------------------

def mse(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 1.0) -> float:
    """PSNR with peak=1.0 (ref notebook: PSNR = -10*log10(MSE))."""
    m = mse(a, b)
    if m == 0:
        return float("inf")
    return float(10.0 * np.log10(peak * peak / m))


def split_mse(recon: np.ndarray, target: np.ndarray, atol: float = 0.0
              ) -> Tuple[float, float]:
    """(zero-voxel MSE, non-zero-voxel MSE) — the reference's headline
    quality split (BASELINE.md: 1.21e-05 / 1.79e-04)."""
    target = np.asarray(target, np.float64)
    recon = np.asarray(recon, np.float64)
    zero_mask = np.abs(target) <= atol
    err = (recon - target) ** 2
    zero_mse = float(err[zero_mask].mean()) if zero_mask.any() else 0.0
    nz = ~zero_mask
    nonzero_mse = float(err[nz].mean()) if nz.any() else 0.0
    return zero_mse, nonzero_mse

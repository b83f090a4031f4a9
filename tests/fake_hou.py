"""A fake `hou` module emulating the documented Houdini Python API surface
the shim touches, so both in-Houdini cook paths run under pytest.

Emulated behaviors:
  * hou.primType.VDB / .Volume sentinels
  * hou.Geometry: prims(), saveToFile(path) (writes a real .vdb via
    vqvdb_tpu's own writer — or raises to simulate a blosc-compressed save),
    loadFromFile(path) (reads the .vdb back into prims)
  * VDB prims: type(), activeVoxelBoundingBox() -> minvec()/maxvec(),
    voxelRangeAsFloat(bbox) with Houdini's x-fastest voxel ordering,
    dataType(), name attribute access
  * Volume prims: resolution(), allVoxels() (x fastest)
"""

import numpy as np


class _PrimTypes:
    VDB = "VDB"
    Volume = "Volume"


primType = _PrimTypes()


class BBoxI:
    def __init__(self, lo, hi):
        self._lo, self._hi = np.asarray(lo, np.int64), np.asarray(hi, np.int64)

    def minvec(self):
        return tuple(int(v) for v in self._lo)

    def maxvec(self):
        return tuple(int(v) for v in self._hi)


class _BasePrim:
    """Mirrors the real hou.Prim attribute model: no findAttrib on the
    prim — the 'name' attribute is discovered via the owning geometry's
    findPrimAttrib and read with prim.attribValue."""

    def __init__(self, name):
        self._name = name
        self._geo = None  # set by FakeGeometry

    def geometry(self):
        return self._geo

    def attribValue(self, name):
        assert name == "name"
        return self._name


class FakeVDB(_BasePrim):
    """Wraps a LeafGrid; samples like hou.VDB does (dense over active bbox,
    x index changing fastest in the flat value list)."""

    def __init__(self, leafgrid):
        super().__init__(leafgrid.name)
        self._lg = leafgrid

    def type(self):
        return primType.VDB

    def dataType(self):
        return "Float" if self._lg.channels == 1 else "Vector3"

    def activeVoxelBoundingBox(self):
        lo, hi = self._lg.index_bbox()
        return BBoxI(lo, hi - 1)  # hou bbox is inclusive

    def voxelRangeAsFloat(self, bbox):
        dense, lo = self._lg.to_dense()
        want_lo = np.asarray(bbox.minvec())
        assert np.array_equal(lo, want_lo), "fake expects the active bbox"
        return dense[..., 0].transpose(2, 1, 0).ravel().tolist()

    def voxelRangeAsVector3(self, bbox):
        dense, _ = self._lg.to_dense()
        return dense.transpose(2, 1, 0, 3).reshape(-1, 3).tolist()


class FakeVolume(_BasePrim):
    def __init__(self, name, dense):
        super().__init__(name)
        self._dense = np.asarray(dense, np.float32)

    def type(self):
        return primType.Volume

    def resolution(self):
        return self._dense.shape

    def allVoxels(self):
        return self._dense.transpose(2, 1, 0).ravel().tolist()


class FakeGeometry:
    def __init__(self, prims=(), leafgrids=(), fail_save=False,
                 houdini_default_save=False):
        self._prims = list(prims)
        for pr in self._prims:
            pr._geo = self
        self._leafgrids = list(leafgrids)  # backing store for saveToFile
        self._fail_save = fail_save
        self._houdini_default_save = houdini_default_save
        self.loaded_files = []

    def findPrimAttrib(self, name):
        return object() if name == "name" else None

    def prims(self):
        return list(self._prims)

    def saveToFile(self, path):
        if self._fail_save:
            raise RuntimeError("simulated broken save")
        from vqvdb_tpu.vdb.openvdb_io import (
            COMPRESS_ACTIVE_MASK, COMPRESS_BLOSC, write_vdb_leafgrids)

        if self._houdini_default_save:
            # Houdini's out-of-the-box VDB save: blosc codec + 16-bit floats.
            write_vdb_leafgrids(
                path, self._leafgrids,
                compression=COMPRESS_BLOSC | COMPRESS_ACTIVE_MASK, half=True)
        else:
            write_vdb_leafgrids(path, self._leafgrids)

    def loadFromFile(self, path):
        from vqvdb_tpu.vdb.openvdb_io import read_vdb_leafgrids

        self.loaded_files.append(path)
        for g in read_vdb_leafgrids(path):
            prim = FakeVDB(g)
            prim._geo = self
            self._prims.append(prim)


class FakeNode:
    def __init__(self, geometry, input_geometry=None):
        self._geo = geometry
        self._inputs = []
        if input_geometry is not None:
            self._inputs = [FakeNode(input_geometry)]

    def inputs(self):
        return list(self._inputs)

    def geometry(self):
        return self._geo

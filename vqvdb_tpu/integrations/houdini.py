"""Houdini integration shim — the SOP surface as Python-SOP cook functions.

The reference ships compiled HDK SOP nodes (src/SOP/SOP_VQVDB_Encoder.cpp,
SOP_VQVDB_Decoder.cpp) with parameters vdbname / outputpath / inputfile /
batchsize / execute. Houdini cannot load an HDK DSO built against a TPU
host, but Houdini's Python SOP runs this module directly: drop a Python SOP,
`import vqvdb_tpu.integrations.houdini as vq`, and call `cook_encoder` /
`cook_decoder` from the node's code with the same parameter names.

Both functions degrade gracefully outside Houdini (node=None): they accept /
return LeafGrids, so the module doubles as the reference's verb layer for
any DCC that embeds Python.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from vqvdb_tpu import api
from vqvdb_tpu.vdb.grid import LeafGrid


def _grids_from_hou_node(node) -> List[LeafGrid]:
    """Extract FloatGrid-like VDB prims from a Houdini node's first input
    as LeafGrids (voxel values sampled per active leaf)."""
    import hou  # available only inside Houdini

    grids: List[LeafGrid] = []
    geo = node.inputs()[0].geometry()
    for prim in geo.prims():
        if prim.type() != hou.primType.VDB:
            continue
        name = prim.attribValue("name") if prim.findAttrib("name") else "density"
        res = prim.resolution()
        dense = np.asarray(prim.allVoxels(), dtype=np.float32).reshape(res)
        grids.append(LeafGrid.from_dense(name, dense))
    return grids


def cook_encoder(
    *,
    outputpath: str,
    vdbname: str = "",
    batchsize: int = 4096,
    model: str = "",
    node=None,
    grids: Optional[Sequence[LeafGrid]] = None,
) -> dict:
    """Encoder cook (ref: SOP_VQVDB_EncoderVerb::cook semantics — collect
    grids, filter by name, compress to outputpath)."""
    if grids is None:
        if node is None:
            raise ValueError("pass `grids` outside Houdini, or `node` inside")
        grids = _grids_from_hou_node(node)
    return api.encode(list(grids), model, outputpath,
                      batch_size=batchsize,
                      name_filter=vdbname or None)


def cook_decoder(
    *,
    inputfile: str,
    batchsize: int = 4096,
    model: str = "",
    node=None,
) -> List[LeafGrid]:
    """Decoder cook (ref: SOP_VQVDB_DecoderVerb::cook — generator node:
    read file, decode, build grids). Inside Houdini, writes VDB prims onto
    the node's geometry; always returns the LeafGrids."""
    grids, _ = api.decode(inputfile, model, batch_size=batchsize)
    if node is not None:
        import hou

        geo = node.geometry()
        for g in grids:
            dense, lo = g.to_dense()
            vdb = hou.Geometry.createVolume(geo, dense.shape[:3])  # best-effort
            vdb.setAllVoxels(dense[..., 0].ravel().tolist())
    return grids

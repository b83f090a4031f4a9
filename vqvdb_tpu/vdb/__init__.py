from vqvdb_tpu.vdb.grid import LeafGrid  # noqa: F401

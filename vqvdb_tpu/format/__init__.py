from vqvdb_tpu.format.vqvdb import (  # noqa: F401
    GridMetadata,
    VqvdbReader,
    VqvdbWriter,
    FORMAT_VERSION,
    MAGIC,
)

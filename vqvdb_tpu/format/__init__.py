from vqvdb_tpu.format.vqvdb import (  # noqa: F401
    GridMetadata,
    VqvdbReader,
    VqvdbWriter,
    FORMAT_VERSION,
    MAGIC,
)
from vqvdb_tpu.format.verify import (  # noqa: F401
    verify_container,
    verify_roundtrip,
)

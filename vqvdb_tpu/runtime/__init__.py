from vqvdb_tpu.runtime.codec import VQCodec  # noqa: F401

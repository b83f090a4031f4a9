from vqvdb_tpu.core.config import CodecConfig, ModelConfig  # noqa: F401

from vqvdb_tpu.ops.quantize import fused_nearest_indices, fused_dequantize  # noqa: F401

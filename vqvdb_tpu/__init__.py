"""vqvdb_tpu — TPU-native VQ-VAE volumetric compression framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
ZephirFXEC/VQVDB reference (CUDA/C++/torch): compress OpenVDB-style sparse
volumes by pushing every active 8x8x8 leaf block through a Conv3D VQ-VAE,
store uint8 codebook indices in the `.vqvdb` v3 container, and decompress by
streaming index batches through the decoder.

Layer map (mirrors reference layers, re-imagined TPU-first):
  core/      dtypes, configs, model containers        (ref: src/core/)
  models/    VQ-VAE encoder/decoder/quantizer in JAX  (ref: python/VQVAE_v2.py)
  ops/       Pallas TPU kernels + XLA reference ops   (ref: CUDA via ORT/LibTorch)
  format/    .vqvdb v3 stream reader/writer           (ref: src/Utils/VQVDB_Reader.*)
  runtime/   streaming codec engine (double-buffered) (ref: src/orchestrator/)
  parallel/  mesh / shard_map multi-chip paths        (ref: none — new capability)
  train/     data pipeline, train loop, checkpoints   (ref: python/training.py)
  utils/     profiler, logging
"""

__version__ = "0.1.0"

from vqvdb_tpu.core.config import CodecConfig, ModelConfig  # noqa: F401

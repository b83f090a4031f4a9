from vqvdb_tpu.eval.metrics import evaluate_codec, codebook_report  # noqa: F401

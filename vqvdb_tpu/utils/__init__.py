from vqvdb_tpu.utils.profiler import Profiler, scoped_timer, trace  # noqa: F401

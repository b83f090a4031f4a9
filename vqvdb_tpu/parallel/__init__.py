from vqvdb_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    make_sharded_train_step,
    make_sharded_eval_step,
    make_sharded_encode,
    make_sharded_decode,
)

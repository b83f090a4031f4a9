from vqvdb_tpu.train.data import LeafDataset  # noqa: F401
from vqvdb_tpu.train.train import (  # noqa: F401
    TrainConfig,
    TrainState,
    make_train_state,
    train_step,
    eval_step,
    train as run_training,
)

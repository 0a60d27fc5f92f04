from bliss_gnn_tpu.train.metrics import F1State, f1_update, f1_compute  # noqa: F401
from bliss_gnn_tpu.train.steps import TrainState, make_train_step, make_eval_step  # noqa: F401
from bliss_gnn_tpu.train.trainer import Trainer, TrainConfig  # noqa: F401

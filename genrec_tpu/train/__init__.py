"""Training layer: one Trainer for every pipeline (jit step, optax,
orbax checkpointing with resume, early stopping, metrics)."""

from genrec_tpu.train.optim import make_optimizer  # noqa: F401
from genrec_tpu.train.trainer import Trainer, TrainLoopResult  # noqa: F401

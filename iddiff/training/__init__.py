from .state import TrainState
from .optim import make_optimizer
from .train_step import make_train_step, make_eval_step
from .trainer import Trainer
from .checkpoints import CheckpointKeeper

__all__ = [
    "TrainState",
    "make_optimizer",
    "make_train_step",
    "make_eval_step",
    "Trainer",
    "CheckpointKeeper",
]

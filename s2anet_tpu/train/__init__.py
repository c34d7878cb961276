from .schedule import build_lr_schedule
from .state import TrainState, create_train_state
from .optim import build_optimizer, freeze_mask

__all__ = [
    "build_lr_schedule",
    "TrainState",
    "create_train_state",
    "build_optimizer",
    "freeze_mask",
]

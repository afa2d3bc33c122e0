"""Training: jitted step, state, loss curriculum, self-conditioning."""

from .ema import ema_update, init_ema
from .state import cosine_annealing_schedule, create_train_state
from .step import make_device_data_step, make_loss_fn, make_train_step

__all__ = [
    "create_train_state",
    "cosine_annealing_schedule",
    "make_train_step",
    "make_loss_fn",
    "make_device_data_step",
    "ema_update",
    "init_ema",
]

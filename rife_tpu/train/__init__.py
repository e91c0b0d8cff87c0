from rife_tpu.train.losses import epe_loss, ternary_loss, sobel_loss
from rife_tpu.train.lr import cyclic_lr_schedule, warmup_cosine_schedule
from rife_tpu.train.loop import (TrainState, make_train_step,
                                 make_train_step_chained, make_eval_step,
                                 train_init)

__all__ = [
    "epe_loss",
    "ternary_loss",
    "sobel_loss",
    "warmup_cosine_schedule",
    "cyclic_lr_schedule",
    "TrainState",
    "make_train_step",
    "make_train_step_chained",
    "make_eval_step",
    "train_init",
]

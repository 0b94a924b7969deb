from .losses import dice_loss, cross_entropy_loss, combined_loss, dice_coeff_multi_class
from .schedule import warmup_poly_schedule
from .loop import TrainConfigRuntime, make_train_step, make_eval_step, train_model

__all__ = [
    "dice_loss", "cross_entropy_loss", "combined_loss", "dice_coeff_multi_class",
    "warmup_poly_schedule", "TrainConfigRuntime", "make_train_step",
    "make_eval_step", "train_model",
]

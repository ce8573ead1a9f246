from .optim import make_optimizer, noam_schedule, radanw
from .pp import make_amt_pp_train_step
from .step import (TrainState, create_train_state, make_amt_train_step,
                   make_amt_eval_step, make_regression_train_step,
                   make_regression_eval_step, wire_bf16_batch)

__all__ = [
    "make_optimizer", "noam_schedule", "radanw",
    "TrainState", "create_train_state", "make_amt_train_step",
    "make_amt_eval_step", "make_regression_train_step",
    "make_regression_eval_step", "make_amt_pp_train_step",
    "wire_bf16_batch",
]

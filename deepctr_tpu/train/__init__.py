"""Training: jitted step builders and the epoch/eval/early-stop loop."""

from .loop import FitResult, evaluate, fit, pretrain_snn
from .step import (
    TrainState,
    init_state,
    make_eval_step,
    make_pretrain_step,
    make_train_step,
)

__all__ = [
    "FitResult",
    "evaluate",
    "fit",
    "pretrain_snn",
    "TrainState",
    "init_state",
    "make_eval_step",
    "make_pretrain_step",
    "make_train_step",
]

"""Model family: LR, FM, FNN (FM-init), SNN (DAE/RBM pretrain).

Reference parity: components C4-C8 (SURVEY.md §2.1).
"""

from .base import (
    MlpSpec,
    Model,
    Params,
    apply_mlp,
    apply_model,
    init_mlp,
    lazy_l2,
    weighted_bce_with_logits,
)
from .deepfm import DeepFMModel, make_deepfm
from .pnn import PNNModel, make_pnn
from .fm import FMModel
from .fnn import FNNModel, make_fnn
from .lr import LRModel
from .snn import DaePretrainer, RbmPretrainer, SNNModel, field_sampling, init_pretrain_dense

__all__ = [
    "MlpSpec",
    "Model",
    "Params",
    "apply_mlp",
    "apply_model",
    "init_mlp",
    "lazy_l2",
    "weighted_bce_with_logits",
    "DeepFMModel",
    "make_deepfm",
    "PNNModel",
    "make_pnn",
    "FMModel",
    "FNNModel",
    "make_fnn",
    "LRModel",
    "SNNModel",
    "DaePretrainer",
    "RbmPretrainer",
    "field_sampling",
    "init_pretrain_dense",
]

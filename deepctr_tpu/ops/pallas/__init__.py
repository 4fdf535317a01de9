"""Pallas TPU kernels (each with a pure-jnp oracle in deepctr_tpu.ops).

These are the project's "native components" (SURVEY.md §2.2): the reference
has zero first-party native code, so native depth lands on the TPU side as
Mosaic kernels for the hot ops named in BASELINE.json:5.

Off-TPU (CPU tests) every kernel runs in Pallas interpreter mode so the
exact kernel code path is exercised in CI (SURVEY.md §5 sanitizer row).
"""

from .interaction import fm_score, fm_score_fused
from .mlp import mlp_tower, mlp_tower_fused
from .runtime import default_interpret, set_force_interpret

__all__ = ["fm_score", "fm_score_fused", "mlp_tower", "mlp_tower_fused",
           "default_interpret", "set_force_interpret"]

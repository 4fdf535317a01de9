"""Compute ops: jnp reference implementations + Pallas TPU kernels.

Every Pallas kernel in :mod:`deepctr_tpu.ops.pallas` has a pure-jnp oracle
here, selected via config flag; tests assert bit-level (or tolerance-level)
agreement between the two (SURVEY.md §4).
"""

from .interaction import fm_interaction, fm_interaction_bruteforce
from .scatter import dedupe_grads, scatter_add_dedup, segment_sum_dense

__all__ = [
    "fm_interaction",
    "fm_interaction_bruteforce",
    "dedupe_grads",
    "scatter_add_dedup",
    "segment_sum_dense",
]

"""Optimizers: sparse per-row embedding updates + optax for dense params."""

from .sparse import (
    SparseAdagrad,
    SparseAdagradState,
    SparseSgd,
    SparseSgdState,
    make_sparse_optimizer,
)

__all__ = [
    "SparseAdagrad",
    "SparseAdagradState",
    "SparseSgd",
    "SparseSgdState",
    "make_sparse_optimizer",
]

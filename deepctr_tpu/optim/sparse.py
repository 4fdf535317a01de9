"""Sparse per-row optimizers for embedding tables.

Reference parity: the reference's SGD/Adagrad touch only the embedding rows
active in each minibatch via Theano indexed updates (SURVEY.md C10,
BASELINE.json:5).  Here the same semantics are implemented with the
deduplicating segment-sum scatter of :mod:`deepctr_tpu.ops.scatter`: per
step, cost is O(batch-rows), independent of vocab size — no dense
``[vocab, dim]`` gradient or accumulator traffic.

API mirrors optax (init/update as pure functions) but takes ``(ids, rows)``
occurrence gradients instead of a dense grad pytree, because the dense grad
never exists.  The padding row (``schema.pad_id``) stays frozen as long as
its occurrence gradients are zero — which the models guarantee by masking
pad slots in the forward pass.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.scatter import dedupe_grads


class SparseSgdState(NamedTuple):
    pass


class SparseAdagradState(NamedTuple):
    # per-row accumulator, [vocab] (shared across the row's dim, matching the
    # classic sparse-Adagrad used for embeddings) or [vocab, dim] per-coord.
    acc: jax.Array


@dataclasses.dataclass(frozen=True)
class SparseSgd:
    """Plain SGD on touched rows: ``row -= lr * sum_of_row_grads``."""

    learning_rate: float

    def init(self, table: jax.Array) -> SparseSgdState:
        del table
        return SparseSgdState()

    def update(
        self,
        table: jax.Array,
        state: SparseSgdState,
        ids: jax.Array,
        rows: jax.Array,
        lr_scale: jax.Array | float = 1.0,
    ) -> tuple[jax.Array, SparseSgdState]:
        d = dedupe_grads(ids, rows)
        lr = self.learning_rate * lr_scale
        new_table = table.at[d.ids].add(-lr * d.rows, indices_are_sorted=True)
        return new_table, state


@dataclasses.dataclass(frozen=True)
class SparseAdagrad:
    """Per-coordinate Adagrad on touched rows.

    acc[i] += g_i^2 ; row_i -= lr * g_i / (sqrt(acc[i]) + eps)
    with g_i the DEDUPLICATED per-row gradient (sum over batch occurrences),
    preserving the reference's per-minibatch update semantics.
    """

    learning_rate: float
    eps: float = 1e-6
    initial_accumulator: float = 0.0

    def init(self, table: jax.Array) -> SparseAdagradState:
        return SparseAdagradState(
            acc=jnp.full(table.shape, self.initial_accumulator, dtype=jnp.float32)
        )

    def update(
        self,
        table: jax.Array,
        state: SparseAdagradState,
        ids: jax.Array,
        rows: jax.Array,
        lr_scale: jax.Array | float = 1.0,
    ) -> tuple[jax.Array, SparseAdagradState]:
        d = dedupe_grads(ids, rows)
        # accumulate g^2 only at last-occurrence rows (zeros elsewhere add 0)
        g2 = d.rows * d.rows
        acc = state.acc.at[d.ids].add(g2, indices_are_sorted=True)
        denom = jnp.sqrt(acc[d.ids]) + self.eps
        lr = self.learning_rate * lr_scale
        delta = jnp.where(
            d.is_last[:, None] if d.rows.ndim > 1 else d.is_last,
            -lr * d.rows / denom,
            jnp.zeros_like(d.rows),
        )
        new_table = table.at[d.ids].add(delta, indices_are_sorted=True)
        return new_table, SparseAdagradState(acc=acc)


def make_sparse_optimizer(name: str, learning_rate: float, **kw):
    name = name.lower()
    if name == "sgd":
        return SparseSgd(learning_rate)
    if name == "adagrad":
        return SparseAdagrad(learning_rate, **kw)
    raise ValueError(f"unknown sparse optimizer {name!r} (sgd|adagrad)")

"""Embedding lookup ops (jnp reference path; Pallas fast path in ops/pallas).

Reference parity: the reference gathers rows of a ``theano.shared`` embedding
matrix by the batch's active feature indices (SURVEY.md §3.1 "gather W0 rows
by field-active indices").  TPU-native form: dense ``int32[B, S]`` slot ids
(pad slots = pad_id -> frozen zero row) gathered from an ``[V+1, D]`` table;
XLA lowers this to an efficient dynamic-gather and, under ``jax.grad``, to a
scatter-add — but training steps here bypass autodiff-through-the-table and
route occurrence gradients to :mod:`deepctr_tpu.optim.sparse` instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_rows(table: jax.Array, ids: jax.Array) -> jax.Array:
    """table: [V, D], ids: int32[...]; returns [..., D]."""
    return jnp.take(table, ids, axis=0)


def slot_mask(ids: jax.Array, pad_id: int) -> jax.Array:
    """float32 mask, 1.0 for real slots, 0.0 for padding."""
    return (ids != pad_id).astype(jnp.float32)


def embedding_bag(
    table: jax.Array, ids: jax.Array, pad_id: int
) -> jax.Array:
    """Sum of embedding rows over the slot axis: [B, S] -> [B, D].

    With the pad row frozen at zero no mask multiply is needed, but we mask
    anyway so correctness never depends on the frozen-row invariant.
    """
    emb = gather_rows(table, ids)                       # [B, S, D]
    mask = slot_mask(ids, pad_id)[..., None]            # [B, S, 1]
    return (emb * mask).sum(axis=1)


def field_concat(
    table: jax.Array, ids: jax.Array, pad_id: int, slot_field: jax.Array, num_fields: int
) -> jax.Array:
    """Per-field embedding concat for FNN's bottom layer: [B, S] -> [B, F*D].

    Fields with multiple slots (e.g. user tags) are sum-pooled into one
    D-vector per field, matching the one-hot-per-field contract of the
    reference's bottom layer (SURVEY.md §2.3 FNN) while supporting
    multi-valued fields.
    """
    emb = gather_rows(table, ids) * slot_mask(ids, pad_id)[..., None]  # [B,S,D]
    # sum slots into their owning field: S -> F with a static one-hot matrix
    # (S and F are tiny; this is a [B,S,D] x [S,F] contraction on the MXU)
    onehot = jax.nn.one_hot(slot_field, num_fields, dtype=emb.dtype)   # [S, F]
    pooled = jnp.einsum("bsd,sf->bfd", emb, onehot)                    # [B,F,D]
    return pooled.reshape(pooled.shape[0], -1)                          # [B,F*D]

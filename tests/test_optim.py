"""Sparse optimizer semantics tests (SURVEY.md §7 hard parts: "Adagrad
accumulators ... must dedupe IDs before the update or the update rule
changes semantics")."""

import jax.numpy as jnp
import numpy as np

from deepctr_tpu.optim import SparseAdagrad, SparseSgd


def _np_sparse_adagrad(table, acc, ids, rows, lr, eps):
    """Oracle: per-row dedupe first, then per-coordinate adagrad."""
    table = table.copy()
    acc = acc.copy()
    for uid in np.unique(ids):
        g = rows[ids == uid].sum(axis=0)
        acc[uid] += g * g
        table[uid] -= lr * g / (np.sqrt(acc[uid]) + eps)
    return table, acc


def test_sparse_sgd_matches_dense_oracle():
    rng = np.random.default_rng(0)
    V, D, M = 12, 5, 30
    table = rng.normal(size=(V, D)).astype(np.float32)
    ids = rng.integers(0, V, size=M).astype(np.int32)
    rows = rng.normal(size=(M, D)).astype(np.float32)
    opt = SparseSgd(learning_rate=0.1)
    st = opt.init(jnp.asarray(table))
    new_table, _ = opt.update(jnp.asarray(table), st, jnp.asarray(ids), jnp.asarray(rows))
    want = table.copy()
    for uid in np.unique(ids):
        want[uid] -= 0.1 * rows[ids == uid].sum(axis=0)
    np.testing.assert_allclose(new_table, want, rtol=1e-5, atol=1e-5)


def test_sparse_adagrad_dedupe_semantics():
    rng = np.random.default_rng(1)
    V, D, M = 10, 4, 25
    table = rng.normal(size=(V, D)).astype(np.float32)
    ids = rng.integers(0, V, size=M).astype(np.int32)
    # force duplicates
    ids[:10] = 3
    rows = rng.normal(size=(M, D)).astype(np.float32)
    lr, eps = 0.05, 1e-6
    opt = SparseAdagrad(learning_rate=lr, eps=eps)
    st = opt.init(jnp.asarray(table))
    new_table, new_st = opt.update(
        jnp.asarray(table), st, jnp.asarray(ids), jnp.asarray(rows)
    )
    want_table, want_acc = _np_sparse_adagrad(
        table, np.zeros_like(table), ids, rows, lr, eps
    )
    np.testing.assert_allclose(new_table, want_table, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(new_st.acc, want_acc, rtol=1e-5, atol=1e-5)
    # untouched rows unchanged
    untouched = np.setdiff1d(np.arange(V), np.unique(ids))
    np.testing.assert_array_equal(
        np.asarray(new_table)[untouched], table[untouched]
    )


def test_sparse_adagrad_two_steps_accumulates():
    V, D = 6, 2
    table = np.zeros((V, D), np.float32)
    ids = np.array([1, 1], np.int32)
    rows = np.ones((2, D), np.float32)
    opt = SparseAdagrad(learning_rate=1.0, eps=0.0)
    st = opt.init(jnp.asarray(table))
    t1, st = opt.update(jnp.asarray(table), st, jnp.asarray(ids), jnp.asarray(rows))
    # g=2 -> acc=4 -> delta = -2/2 = -1
    np.testing.assert_allclose(np.asarray(t1)[1], [-1.0, -1.0], rtol=1e-6)
    t2, st = opt.update(t1, st, jnp.asarray(ids), jnp.asarray(rows))
    # acc = 4+4=8 -> delta = -2/sqrt(8)
    np.testing.assert_allclose(
        np.asarray(t2)[1], [-1.0 - 2 / np.sqrt(8)] * 2, rtol=1e-6
    )

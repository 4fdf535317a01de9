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


import pytest


@pytest.mark.parametrize("mode", ["dense", "sorted"])
def test_sparse_adagrad_dedupe_semantics(mode):
    rng = np.random.default_rng(1)
    V, D, M = 10, 4, 25
    table = rng.normal(size=(V, D)).astype(np.float32)
    ids = rng.integers(0, V, size=M).astype(np.int32)
    # force duplicates
    ids[:10] = 3
    rows = rng.normal(size=(M, D)).astype(np.float32)
    lr, eps = 0.05, 1e-6
    opt = SparseAdagrad(learning_rate=lr, eps=eps, mode=mode)
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


@pytest.mark.parametrize("mode", ["dense", "sorted"])
def test_sparse_adagrad_two_steps_accumulates(mode):
    V, D = 6, 2
    table = np.zeros((V, D), np.float32)
    ids = np.array([1, 1], np.int32)
    rows = np.ones((2, D), np.float32)
    opt = SparseAdagrad(learning_rate=1.0, eps=0.0, mode=mode)
    st = opt.init(jnp.asarray(table))
    t1, st = opt.update(jnp.asarray(table), st, jnp.asarray(ids), jnp.asarray(rows))
    # g=2 -> acc=4 -> delta = -2/2 = -1
    np.testing.assert_allclose(np.asarray(t1)[1], [-1.0, -1.0], rtol=1e-6)
    t2, st = opt.update(t1, st, jnp.asarray(ids), jnp.asarray(rows))
    # acc = 4+4=8 -> delta = -2/sqrt(8)
    np.testing.assert_allclose(
        np.asarray(t2)[1], [-1.0 - 2 / np.sqrt(8)] * 2, rtol=1e-6
    )


def test_dense_and_sorted_modes_agree():
    rng = np.random.default_rng(7)
    V, D, M = 40, 5, 200
    table = rng.normal(size=(V, D)).astype(np.float32)
    ids = rng.integers(0, V, size=M).astype(np.int32)
    rows = rng.normal(size=(M, D)).astype(np.float32)
    outs = []
    for mode in ("dense", "sorted"):
        opt = SparseAdagrad(0.1, mode=mode)
        st = opt.init(jnp.asarray(table))
        t2, st2 = opt.update(jnp.asarray(table), st, jnp.asarray(ids), jnp.asarray(rows))
        t3, st3 = opt.update(t2, st2, jnp.asarray(ids[::-1].copy()), jnp.asarray(rows[::-1].copy()))
        outs.append((np.asarray(t3), np.asarray(st3.acc)))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-5, atol=1e-6)


def test_scan_train_step_matches_loop():
    import optax

    from deepctr_tpu.data import make_schema, synthetic
    from deepctr_tpu.models import FMModel
    from deepctr_tpu.train import init_state, make_train_step
    from deepctr_tpu.train.step import make_scan_train_step

    schema = make_schema([("a", 6), ("b", 12)])
    ds = synthetic.generate(schema, num_examples=512, k=2, seed=3)
    model = FMModel(k=2)
    sopt, dopt = SparseAdagrad(0.1), optax.sgd(0.05)
    T, B = 3, 64
    ids = ds.ids[: T * B].reshape(T, B, -1)
    y = ds.labels[: T * B].reshape(T, B)
    w = np.ones((T, B), np.float32)

    st1 = init_state(model, schema, sopt, dopt, seed=0)
    loop = make_train_step(model, schema, sopt, dopt, jit=False)
    losses1 = []
    for t in range(T):
        st1, m = loop(st1, ids[t], y[t], w[t])
        losses1.append(float(m.loss))

    st2 = init_state(model, schema, sopt, dopt, seed=0)
    scan = make_scan_train_step(model, schema, sopt, dopt)
    st2, losses2 = scan(st2, jnp.asarray(ids), jnp.asarray(y), jnp.asarray(w))
    np.testing.assert_allclose(losses1, np.asarray(losses2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(st1.table), np.asarray(st2.table), rtol=1e-5, atol=1e-6
    )

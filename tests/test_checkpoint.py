"""Checkpoint/resume tests (SURVEY.md §5 checkpoint row)."""

import jax
import numpy as np
import optax

from deepctr_tpu.models import FMModel
from deepctr_tpu.optim import SparseAdagrad
from deepctr_tpu.train import fit, init_state, make_train_step
from deepctr_tpu.utils.checkpoint import (
    load_train_state,
    save_train_state,
)


def test_train_state_roundtrip(tmp_path, tiny_schema):
    model = FMModel(k=3)
    opt = SparseAdagrad(0.1)
    dopt = optax.adagrad(0.05)
    st = init_state(model, tiny_schema, opt, dopt, seed=4)
    p = str(tmp_path / "st.npz")
    save_train_state(p, st)
    st2 = load_train_state(p, st)
    for a, b in zip(jax.tree_util.tree_leaves(st), jax.tree_util.tree_leaves(st2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_is_deterministic(tmp_path, tiny_schema, tiny_dataset):
    """Save mid-training, resume, and get bitwise-identical continuation."""
    ds = tiny_dataset
    model = FMModel(k=3)
    opt = SparseAdagrad(0.1)
    dopt = optax.adagrad(0.05)
    step = make_train_step(model, tiny_schema, opt, dopt, jit=False)

    st = init_state(model, tiny_schema, opt, dopt, seed=5)
    B = 128
    batches = [
        (
            ds.ids[i * B : (i + 1) * B],
            ds.labels[i * B : (i + 1) * B],
            np.ones(B, np.float32),
        )
        for i in range(6)
    ]
    for ids, y, w in batches[:3]:
        st, _ = step(st, ids, y, w)
    p = str(tmp_path / "mid.npz")
    save_train_state(p, st)

    # branch A: continue in-process
    stA = st
    for ids, y, w in batches[3:]:
        stA, _ = step(stA, ids, y, w)
    # branch B: reload and continue
    stB = load_train_state(p, init_state(model, tiny_schema, opt, dopt, seed=5))
    for ids, y, w in batches[3:]:
        stB, _ = step(stB, ids, y, w)

    np.testing.assert_array_equal(np.asarray(stA.table), np.asarray(stB.table))
    np.testing.assert_array_equal(
        np.asarray(stA.sparse_state.acc), np.asarray(stB.sparse_state.acc)
    )
    assert int(stA.step) == int(stB.step)

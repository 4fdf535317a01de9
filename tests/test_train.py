"""Training-loop behaviours: LR decay, early stopping, lr_scale plumbing."""

import jax.numpy as jnp
import numpy as np
import optax

from deepctr_tpu.models import FMModel, LRModel
from deepctr_tpu.optim import SparseAdagrad, SparseSgd
from deepctr_tpu.train import fit, init_state, make_train_step


def test_lr_scale_scales_update(tiny_schema, tiny_dataset):
    model = LRModel()
    sopt, dopt = SparseSgd(0.1), optax.sgd(0.1)
    step = make_train_step(model, tiny_schema, sopt, dopt, jit=False)
    ids = tiny_dataset.ids[:64]
    y = tiny_dataset.labels[:64]
    w = np.ones(64, np.float32)

    st = init_state(model, tiny_schema, sopt, dopt, seed=0)
    full, _ = step(st, ids, y, w, 1.0)
    st = init_state(model, tiny_schema, sopt, dopt, seed=0)
    half, _ = step(st, ids, y, w, 0.5)
    st = init_state(model, tiny_schema, sopt, dopt, seed=0)

    d_full = np.asarray(full.table) - np.asarray(st.table)
    d_half = np.asarray(half.table) - np.asarray(st.table)
    np.testing.assert_allclose(d_half, 0.5 * d_full, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(
        float(half.dense["bias"]), 0.5 * float(full.dense["bias"]), rtol=1e-5
    )


def test_fit_with_lr_decay_converges(tiny_schema, tiny_dataset):
    ds = tiny_dataset
    res = fit(
        FMModel(k=3),
        tiny_schema,
        ds.ids[:3000],
        ds.labels[:3000],
        ds.ids[3000:],
        ds.labels[3000:],
        sparse_opt=SparseAdagrad(0.1),
        dense_opt=optax.adagrad(0.05),
        batch_size=256,
        epochs=4,
        lr_decay=0.5,
        prefetch=False,
        early_stop_patience=4,
    )
    assert res.best_auc > 0.6


def test_early_stopping_stops(tiny_schema, tiny_dataset):
    ds = tiny_dataset
    res = fit(
        LRModel(),
        tiny_schema,
        ds.ids[:1000],
        ds.labels[:1000],
        ds.ids[1000:1500],
        ds.labels[1000:1500],
        sparse_opt=SparseSgd(0.0),  # no learning -> AUC exactly flat -> stop
        dense_opt=optax.sgd(0.0),
        batch_size=256,
        epochs=50,
        early_stop_patience=1,
        prefetch=False,
    )
    assert len(res.history) <= 4


def test_scan_chunked_fit_matches_per_step(tiny_schema, tiny_dataset):
    """fit(scan_steps=N) must produce the same trajectory as the per-step
    loop (same shuffles, same math) including the padded final chunk."""
    ds = tiny_dataset
    kw = dict(
        sparse_opt=SparseAdagrad(0.1),
        dense_opt=optax.sgd(0.05),
        batch_size=100,   # 3000/100 = 30 batches; scan_steps=7 -> pad path
        epochs=2,
        prefetch=False,
        early_stop_patience=5,
        seed=4,
    )
    res_a = fit(
        FMModel(k=3), tiny_schema,
        ds.ids[:3000], ds.labels[:3000], ds.ids[3000:], ds.labels[3000:], **kw
    )
    res_b = fit(
        FMModel(k=3), tiny_schema,
        ds.ids[:3000], ds.labels[:3000], ds.ids[3000:], ds.labels[3000:],
        scan_steps=7, **kw
    )
    np.testing.assert_allclose(
        np.asarray(res_a.state.table), np.asarray(res_b.state.table),
        rtol=1e-4, atol=1e-6,
    )
    for ha, hb in zip(res_a.history, res_b.history):
        np.testing.assert_allclose(ha["auc"], hb["auc"], rtol=1e-6)
        np.testing.assert_allclose(ha["train_loss"], hb["train_loss"], rtol=1e-4)

"""Parity vs the NumPy reference reproduction (SURVEY.md §0 protocol: the
mount was empty, so the reproduction IS the parity oracle; §4 "parity" row).

Checks both trajectory-level agreement (same init, same batches, same SGD ->
same parameters) and outcome-level agreement (AUC within tolerance).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deepctr_tpu.models import FMModel, LRModel, make_fnn, MlpSpec
from deepctr_tpu.optim import SparseSgd
from deepctr_tpu.reference_impl import NumpyFM, NumpyFNN, NumpyLR, train_numpy_model
from deepctr_tpu.train import fit, init_state, make_train_step
from deepctr_tpu.utils.metrics import exact_auc


def _batches(ds, B, steps):
    return [
        (ds.ids[i * B : (i + 1) * B], ds.labels[i * B : (i + 1) * B]) for i in range(steps)
    ]


def test_lr_trajectory_matches_numpy(tiny_schema, tiny_dataset):
    lr = 0.1
    ref = NumpyLR(tiny_schema, lr=lr)
    model = LRModel()
    st = init_state(model, tiny_schema, SparseSgd(lr), optax.sgd(lr), seed=0)
    step = make_train_step(model, tiny_schema, SparseSgd(lr), optax.sgd(lr), jit=False)
    B = 128
    for ids, y in _batches(tiny_dataset, B, 5):
        ref.train_batch(ids, y)
        st, _ = step(st, ids, y, np.ones(B, np.float32))
    np.testing.assert_allclose(
        np.asarray(st.table)[:, 0], ref.w, rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(float(st.dense["bias"]), ref.b, rtol=1e-4, atol=1e-6)


def test_fm_trajectory_matches_numpy(tiny_schema, tiny_dataset):
    lr, k = 0.05, 3
    ref = NumpyFM(tiny_schema, k=k, lr=lr, seed=11)
    model = FMModel(k=k)
    st = init_state(model, tiny_schema, SparseSgd(lr), optax.sgd(lr), seed=0)
    # overwrite jax init with the numpy init so trajectories are comparable
    st = st._replace(table=jnp.asarray(ref.table))
    step = make_train_step(model, tiny_schema, SparseSgd(lr), optax.sgd(lr), jit=False)
    B = 128
    for ids, y in _batches(tiny_dataset, B, 5):
        ref.train_batch(ids, y)
        st, _ = step(st, ids, y, np.ones(B, np.float32))
    np.testing.assert_allclose(np.asarray(st.table), ref.table, rtol=2e-4, atol=1e-6)


def test_fnn_trajectory_matches_numpy(tiny_schema, tiny_dataset):
    lr, k = 0.05, 3
    hidden = (16, 8)
    ref = NumpyFNN(tiny_schema, k=k, hidden=hidden, lr=lr, seed=12)
    model = make_fnn(tiny_schema, k=k, mlp=MlpSpec(hidden=hidden, dropout=0.0))
    st = init_state(model, tiny_schema, SparseSgd(lr), optax.sgd(lr), seed=0)
    # .copy(): on CPU jnp.asarray shares the NumPy buffer, and the
    # reference trainer updates its arrays in place
    st = st._replace(table=jnp.asarray(ref.table.copy()))
    layers = [
        {"w": jnp.asarray(W.copy()), "b": jnp.asarray(b.copy())} for W, b in ref.layers
    ]
    st = st._replace(dense={"mlp": {"layers": layers}})
    # dense optimizer state must match the new dense tree
    dopt = optax.sgd(lr)
    st = st._replace(dense_state=dopt.init(st.dense))
    step = make_train_step(model, tiny_schema, SparseSgd(lr), dopt, jit=False)
    B = 128
    for ids, y in _batches(tiny_dataset, B, 5):
        ref.train_batch(ids, y)
        st, _ = step(st, ids, y, np.ones(B, np.float32))
    np.testing.assert_allclose(np.asarray(st.table), ref.table, rtol=3e-4, atol=1e-5)
    for (W, b), layer in zip(ref.layers, st.dense["mlp"]["layers"]):
        np.testing.assert_allclose(np.asarray(layer["w"]), W, rtol=3e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(layer["b"]), b, rtol=3e-4, atol=1e-5)


def test_snn_supervised_trajectory_matches_numpy(tiny_schema, tiny_dataset):
    """SNN fine-tune phase (C7/C8 supervised step): same init, same batches,
    same SGD -> same table, b1 and MLP parameters as the NumPy oracle."""
    from deepctr_tpu.models import SNNModel
    from deepctr_tpu.reference_impl import NumpySnn

    lr, h1, hidden = 0.05, 12, (16, 8)
    ref = NumpySnn(tiny_schema, hidden1=h1, hidden=hidden, lr=lr, seed=13)
    model = SNNModel(hidden1=h1, mlp=MlpSpec(hidden=hidden, dropout=0.0))
    st = init_state(model, tiny_schema, SparseSgd(lr), optax.sgd(lr), seed=0)
    # overwrite jax init with the numpy init (copies: the oracle mutates
    # its arrays in place)
    st = st._replace(table=jnp.asarray(ref.table.copy()))
    layers = [
        {"w": jnp.asarray(W.copy()), "b": jnp.asarray(b.copy())}
        for W, b in ref.layers
    ]
    dense = {"b1": jnp.asarray(ref.b1.copy()), "mlp": {"layers": layers}}
    dopt = optax.sgd(lr)
    st = st._replace(dense=dense, dense_state=dopt.init(dense))
    step = make_train_step(model, tiny_schema, SparseSgd(lr), dopt, jit=False)
    B = 128
    for ids, y in _batches(tiny_dataset, B, 5):
        ref.train_batch(ids, y)
        st, _ = step(st, ids, y, np.ones(B, np.float32))
    np.testing.assert_allclose(np.asarray(st.table), ref.table, rtol=3e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st.dense["b1"]), ref.b1, rtol=3e-4, atol=1e-5)
    for (W, b), layer in zip(ref.layers, st.dense["mlp"]["layers"]):
        np.testing.assert_allclose(np.asarray(layer["w"]), W, rtol=3e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(layer["b"]), b, rtol=3e-4, atol=1e-5)


def test_numpy_pretrainers_reduce_loss(tiny_schema, tiny_dataset):
    """Oracle sanity: the NumPy DAE/RBM pretraining losses go down (the same
    gate the JAX pretrainers pass in test_pretrain.py)."""
    from deepctr_tpu.reference_impl import NumpyDae, NumpyRbm

    ids = tiny_dataset.ids[:2048]
    for cls in (NumpyDae, NumpyRbm):
        pre = cls(tiny_schema, hidden1=12, m=2, lr=0.1, seed=3)
        first, last = [], []
        for ep in range(3):
            losses = [
                pre.train_batch(ids[i : i + 256]) for i in range(0, 2048, 256)
            ]
            if ep == 0:
                first = losses
            last = losses
        assert np.mean(last) < np.mean(first), (cls.__name__, first, last)


def test_auc_parity_with_reference_reproduction(small_dataset):
    """Outcome-level: our FM and the NumPy reference FM reach the same AUC
    (±0.005 — tighter than the ±0.002 target requires many seeds; this is
    the per-run gate) on held-out data after one epoch."""
    ds = small_dataset
    schema = ds.schema
    n = ds.ids.shape[0]
    tr, te = slice(0, int(0.8 * n)), slice(int(0.8 * n), n)
    lr, k, B = 0.05, 4, 256

    ref = NumpyFM(schema, k=k, lr=lr, seed=5)
    train_numpy_model(ref, ds.ids[tr], ds.labels[tr], batch_size=B, epochs=2, seed=0)
    ref_auc = exact_auc(ds.labels[te], _sigmoid_np(ref.forward(ds.ids[te])))

    model = FMModel(k=k)
    res = fit(
        model,
        schema,
        ds.ids[tr],
        ds.labels[tr],
        ds.ids[te],
        ds.labels[te],
        sparse_opt=SparseSgd(lr),
        dense_opt=optax.sgd(lr),
        batch_size=B,
        epochs=2,
        prefetch=False,
        early_stop_patience=5,
        seed=0,
    )
    assert abs(res.history[-1]["auc"] - ref_auc) < 0.005, (
        res.history[-1]["auc"],
        ref_auc,
    )


def _sigmoid_np(x):
    return 1.0 / (1.0 + np.exp(-np.clip(x, -30, 30)))

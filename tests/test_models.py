"""Model-family tests: NumPy forward oracles, learnability/overfit checks,
FM->FNN handoff (SURVEY.md §4 unit-math + integration strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deepctr_tpu.models import (
    FMModel,
    LRModel,
    SNNModel,
    apply_model,
    make_fnn,
)
from deepctr_tpu.optim import SparseAdagrad, SparseSgd
from deepctr_tpu.train import evaluate, fit, init_state, make_eval_step
from deepctr_tpu.utils.checkpoint import init_fnn_from_fm
from deepctr_tpu.utils.metrics import exact_auc


def _np_sigmoid(x):
    return 1 / (1 + np.exp(-x))


def test_lr_forward_vs_numpy(tiny_schema):
    model = LRModel(init_scale=0.01)
    params = model.init_params(jax.random.PRNGKey(0), tiny_schema)
    ids = np.array(
        [[0, 4, 12, tiny_schema.pad_id, tiny_schema.pad_id]], np.int32
    )
    logits = apply_model(model, params, jnp.asarray(ids), tiny_schema.pad_id)
    table = np.asarray(params["table"])[:, 0]
    want = table[[0, 4, 12]].sum() + float(params["dense"]["bias"])
    np.testing.assert_allclose(np.asarray(logits)[0], want, rtol=1e-5)


def test_fm_forward_vs_numpy(tiny_schema):
    model = FMModel(k=3)
    params = model.init_params(jax.random.PRNGKey(1), tiny_schema)
    active = [1, 5, 13, 14]
    ids = np.full((1, tiny_schema.num_slots), tiny_schema.pad_id, np.int32)
    ids[0, : len(active)] = active
    logits = apply_model(model, params, jnp.asarray(ids), tiny_schema.pad_id)
    tab = np.asarray(params["table"])
    w, v = tab[:, 0], tab[:, 1:]
    lin = w[active].sum()
    inter = 0.0
    for i in range(len(active)):
        for j in range(i + 1, len(active)):
            inter += float(v[active[i]] @ v[active[j]])
    want = lin + inter + float(params["dense"]["bias"])
    np.testing.assert_allclose(np.asarray(logits)[0], want, rtol=1e-4)


def test_snn_forward_vs_numpy(tiny_schema):
    model = SNNModel(hidden1=8)
    params = model.init_params(jax.random.PRNGKey(2), tiny_schema)
    active = [0, 6, 12]
    ids = np.full((1, tiny_schema.num_slots), tiny_schema.pad_id, np.int32)
    ids[0, : len(active)] = active
    logits = apply_model(model, params, jnp.asarray(ids), tiny_schema.pad_id)
    tab = np.asarray(params["table"])
    h = _np_sigmoid(tab[active].sum(axis=0) + np.asarray(params["dense"]["b1"]))
    x = h
    layers = params["dense"]["mlp"]["layers"]
    for i, layer in enumerate(layers):
        x = x @ np.asarray(layer["w"]) + np.asarray(layer["b"])
        if i < len(layers) - 1:
            x = np.tanh(x)
    np.testing.assert_allclose(np.asarray(logits)[0], x[0], rtol=1e-4)


def test_pad_row_stays_frozen(tiny_schema, tiny_dataset):
    """The padding row must receive zero gradient through training."""
    model = FMModel(k=3)
    opt = SparseAdagrad(learning_rate=0.1)
    dense_opt = optax.adagrad(0.1)
    res = fit(
        model,
        tiny_schema,
        tiny_dataset.ids[:2000],
        tiny_dataset.labels[:2000],
        tiny_dataset.ids[2000:3000],
        tiny_dataset.labels[2000:3000],
        sparse_opt=opt,
        dense_opt=dense_opt,
        batch_size=256,
        epochs=1,
        prefetch=False,
    )
    pad_row = np.asarray(res.state.table)[tiny_schema.pad_id]
    np.testing.assert_array_equal(pad_row, np.zeros_like(pad_row))


@pytest.mark.parametrize("model_name", ["lr", "fm", "fnn", "snn"])
def test_models_learn_synthetic(model_name, tiny_schema, tiny_dataset):
    """Integration (SURVEY.md §4): every model beats chance clearly on the
    planted-FM synthetic data; FM/FNN beat LR is asserted in test_parity."""
    ds = tiny_dataset
    n = ds.ids.shape[0]
    tr = slice(0, int(0.8 * n))
    te = slice(int(0.8 * n), n)
    if model_name == "lr":
        model = LRModel()
    elif model_name == "fm":
        model = FMModel(k=4)
    elif model_name == "fnn":
        from deepctr_tpu.models import MlpSpec

        model = make_fnn(tiny_schema, k=4, mlp=MlpSpec(hidden=(32, 16), dropout=0.0))
    else:
        from deepctr_tpu.models import MlpSpec

        model = SNNModel(hidden1=16, mlp=MlpSpec(hidden=(16,), dropout=0.0))
    res = fit(
        model,
        tiny_schema,
        ds.ids[tr],
        ds.labels[tr],
        ds.ids[te],
        ds.labels[te],
        sparse_opt=SparseAdagrad(learning_rate=0.1),
        dense_opt=optax.adagrad(0.05),
        batch_size=256,
        epochs=8,
        prefetch=False,
        early_stop_patience=8,
    )
    bayes = exact_auc(ds.labels[te], ds.bayes_logits[te])
    assert res.best_auc > 0.62, (model_name, res.history)
    assert res.best_auc <= bayes + 0.02, (model_name, res.best_auc, bayes)


def test_fm_to_fnn_handoff(tiny_schema, tiny_dataset):
    """FM->FNN init: table copies over and FNN's first eval beats random init
    (integration check per SURVEY.md §4)."""
    from deepctr_tpu.models import MlpSpec

    ds = tiny_dataset
    fm = FMModel(k=4)
    res = fit(
        fm,
        tiny_schema,
        ds.ids[:3000],
        ds.labels[:3000],
        ds.ids[3000:],
        ds.labels[3000:],
        sparse_opt=SparseAdagrad(learning_rate=0.1),
        dense_opt=optax.adagrad(0.05),
        batch_size=256,
        epochs=3,
        prefetch=False,
    )
    fnn = make_fnn(tiny_schema, k=4, mlp=MlpSpec(hidden=(16,), dropout=0.0))
    params = fnn.init_params(jax.random.PRNGKey(3), tiny_schema)
    params2 = init_fnn_from_fm(params, res.state.table)
    np.testing.assert_array_equal(
        np.asarray(params2["table"]), np.asarray(res.state.table)
    )
    # wrong-shape handoff raises
    bad = np.zeros((3, 3), np.float32)
    with pytest.raises(ValueError):
        init_fnn_from_fm(params, bad)


def test_overfit_tiny_sample(tiny_schema, tiny_dataset):
    """Overfit check (SURVEY.md §4): training AUC -> ~1 on 512 rows."""
    from deepctr_tpu.models import MlpSpec

    ds = tiny_dataset
    ids, labels = ds.ids[:256], ds.labels[:256]
    model = make_fnn(tiny_schema, k=4, mlp=MlpSpec(hidden=(128,), dropout=0.0))
    res = fit(
        model,
        tiny_schema,
        ids,
        labels,
        ids,
        labels,
        sparse_opt=SparseAdagrad(learning_rate=0.5),
        dense_opt=optax.adagrad(0.2),
        batch_size=128,
        epochs=150,
        prefetch=False,
        early_stop_patience=150,
    )
    assert res.best_auc > 0.95, res.history[-3:]


def test_deepfm_forward_vs_numpy(tiny_schema):
    from deepctr_tpu.models import MlpSpec, make_deepfm

    model = make_deepfm(tiny_schema, k=3, mlp=MlpSpec(hidden=(8,), dropout=0.0,
                                                      activation="relu"))
    params = model.init_params(jax.random.PRNGKey(5), tiny_schema)
    active = [0, 5, 13]
    ids = np.full((1, tiny_schema.num_slots), tiny_schema.pad_id, np.int32)
    ids[0, : len(active)] = active
    logits = apply_model(model, params, jnp.asarray(ids), tiny_schema.pad_id)

    tab = np.asarray(params["table"])
    w, v = tab[:, 0], tab[:, 1:]
    fm = w[active].sum()
    for i in range(len(active)):
        for j in range(i + 1, len(active)):
            fm += float(v[active[i]] @ v[active[j]])
    F, D = tiny_schema.num_fields, 4
    pooled = np.zeros((F, D), np.float32)
    sf = np.asarray(tiny_schema.slot_field)
    for slot, gid in enumerate(ids[0]):
        if gid != tiny_schema.pad_id:
            pooled[sf[slot]] += tab[gid]
    x = pooled.reshape(-1)
    layers = params["dense"]["mlp"]["layers"]
    for i, layer in enumerate(layers):
        x = x @ np.asarray(layer["w"]) + np.asarray(layer["b"])
        if i < len(layers) - 1:
            x = np.maximum(x, 0)
    want = fm + x[0] + float(params["dense"]["bias"])
    np.testing.assert_allclose(np.asarray(logits)[0], want, rtol=1e-4)


def test_deepfm_learns(tiny_schema, tiny_dataset):
    from deepctr_tpu.models import MlpSpec, make_deepfm

    ds = tiny_dataset
    n = ds.ids.shape[0]
    tr, te = slice(0, int(0.8 * n)), slice(int(0.8 * n), n)
    model = make_deepfm(tiny_schema, k=4, mlp=MlpSpec(hidden=(32,), dropout=0.0,
                                                      activation="relu"))
    res = fit(
        model, tiny_schema, ds.ids[tr], ds.labels[tr], ds.ids[te], ds.labels[te],
        sparse_opt=SparseAdagrad(learning_rate=0.1),
        dense_opt=optax.adagrad(0.05),
        batch_size=256, epochs=8, prefetch=False, early_stop_patience=8,
    )
    assert res.best_auc > 0.65, res.history


def test_pnn_forward_vs_numpy(tiny_schema):
    from deepctr_tpu.models import MlpSpec, make_pnn

    for product in ("inner", "outer"):
        model = make_pnn(tiny_schema, k=3, product=product,
                         mlp=MlpSpec(hidden=(8,), dropout=0.0,
                                     activation="relu"))
        params = model.init_params(jax.random.PRNGKey(6), tiny_schema)
        active = [0, 5, 13]
        ids = np.full((1, tiny_schema.num_slots), tiny_schema.pad_id, np.int32)
        ids[0, : len(active)] = active
        logits = apply_model(model, params, jnp.asarray(ids),
                             tiny_schema.pad_id)

        tab = np.asarray(params["table"])
        F, D = tiny_schema.num_fields, 4
        pooled = np.zeros((F, D), np.float32)
        sf = np.asarray(tiny_schema.slot_field)
        for slot, gid in enumerate(ids[0]):
            if gid != tiny_schema.pad_id:
                pooled[sf[slot]] += tab[gid]
        if product == "inner":
            prods = [float(pooled[i] @ pooled[j])
                     for i in range(F) for j in range(i + 1, F)]
        else:
            s = pooled.sum(axis=0)
            prods = list(0.5 * (s * s - (pooled * pooled).sum(axis=0)))
        x = np.concatenate([pooled.reshape(-1), np.asarray(prods, np.float32)])
        layers = params["dense"]["mlp"]["layers"]
        for i, layer in enumerate(layers):
            x = x @ np.asarray(layer["w"]) + np.asarray(layer["b"])
            if i < len(layers) - 1:
                x = np.maximum(x, 0)
        np.testing.assert_allclose(np.asarray(logits)[0], x[0], rtol=1e-4,
                                   atol=1e-5)


def test_pnn_learns(tiny_schema, tiny_dataset):
    from deepctr_tpu.models import MlpSpec, make_pnn

    ds = tiny_dataset
    n = ds.ids.shape[0]
    tr, te = slice(0, int(0.8 * n)), slice(int(0.8 * n), n)
    model = make_pnn(tiny_schema, k=4, product="inner",
                     mlp=MlpSpec(hidden=(32,), dropout=0.0,
                                 activation="relu"))
    res = fit(
        model, tiny_schema, ds.ids[tr], ds.labels[tr], ds.ids[te], ds.labels[te],
        sparse_opt=SparseAdagrad(learning_rate=0.1),
        dense_opt=optax.adagrad(0.05),
        batch_size=256, epochs=8, prefetch=False, early_stop_patience=8,
    )
    assert res.best_auc > 0.65, res.history

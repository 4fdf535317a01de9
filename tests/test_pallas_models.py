"""use_pallas model flag: fused paths must match jnp paths end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np

from deepctr_tpu.models import FMModel, MlpSpec, SNNModel, apply_model, make_fnn


def test_fm_use_pallas_matches(tiny_schema, tiny_dataset):
    params = FMModel(k=4).init_params(jax.random.PRNGKey(0), tiny_schema)
    ids = jnp.asarray(tiny_dataset.ids[:256])
    a = apply_model(FMModel(k=4), params, ids, tiny_schema.pad_id)
    b = apply_model(FMModel(k=4, use_pallas=True), params, ids, tiny_schema.pad_id)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_fnn_use_pallas_matches(tiny_schema, tiny_dataset):
    spec = MlpSpec(hidden=(32, 16), dropout=0.0)
    m1 = make_fnn(tiny_schema, k=4, mlp=spec)
    m2 = make_fnn(tiny_schema, k=4, mlp=spec, use_pallas=True)
    params = m1.init_params(jax.random.PRNGKey(1), tiny_schema)
    ids = jnp.asarray(tiny_dataset.ids[:256])
    a = apply_model(m1, params, ids, tiny_schema.pad_id)
    b = apply_model(m2, params, ids, tiny_schema.pad_id)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_snn_use_pallas_matches(tiny_schema, tiny_dataset):
    spec = MlpSpec(hidden=(16,), dropout=0.0)
    m1 = SNNModel(hidden1=8, mlp=spec)
    m2 = SNNModel(hidden1=8, mlp=spec, use_pallas=True)
    params = m1.init_params(jax.random.PRNGKey(2), tiny_schema)
    ids = jnp.asarray(tiny_dataset.ids[:256])
    a = apply_model(m1, params, ids, tiny_schema.pad_id)
    b = apply_model(m2, params, ids, tiny_schema.pad_id)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_fnn_use_pallas_dropout_trains(tiny_schema, tiny_dataset):
    """With dropout active in train mode, the flag routes through the fused
    kernel's in-kernel counter-based dropout — the full train step (fwd +
    fused custom-VJP bwd + sparse update) must run, reduce the loss, and be
    deterministic given the state rng."""
    import optax

    from deepctr_tpu.optim import SparseAdagrad
    from deepctr_tpu.train import init_state, make_train_step

    spec = MlpSpec(hidden=(16,), dropout=0.5)
    model = make_fnn(tiny_schema, k=3, mlp=spec, use_pallas=True)
    sopt, dopt = SparseAdagrad(0.1), optax.adagrad(0.05)
    st = init_state(model, tiny_schema, sopt, dopt)
    step = make_train_step(model, tiny_schema, sopt, dopt, jit=False)
    ids = tiny_dataset.ids[:64]
    y = tiny_dataset.labels[:64]
    w = np.ones(64, np.float32)
    losses = []
    st_a = st
    for _ in range(8):
        st_a, m = step(st_a, ids, y, w)
        losses.append(float(m.loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    # same initial state -> identical trajectory (mask = f(rng), no hidden
    # PRNG state)
    st_b = st
    for i in range(3):
        st_b, m2 = step(st_b, ids, y, w)
        assert float(m2.loss) == losses[i]

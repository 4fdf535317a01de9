"""SNN pretraining tests (SURVEY.md C7/C8): DAE/RBM steps run, reduce their
objective, only touch sampled rows, and seed a supervised SNN that learns."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deepctr_tpu.models import (
    DaePretrainer,
    MlpSpec,
    RbmPretrainer,
    SNNModel,
    field_sampling,
    init_pretrain_dense,
)
from deepctr_tpu.models.snn import sample_negatives
from deepctr_tpu.optim import SparseAdagrad, SparseSgd
from deepctr_tpu.train import fit, init_state, pretrain_snn
from deepctr_tpu.train.step import make_pretrain_step
from deepctr_tpu.utils.checkpoint import init_snn_from_pretrain


def test_sample_negatives_in_field_range(tiny_schema):
    fs = field_sampling(tiny_schema)
    ids = sample_negatives(jax.random.PRNGKey(0), fs, 64, m=3)
    F = tiny_schema.num_fields
    assert ids.shape == (64, F * 3)
    ids_np = np.asarray(ids).reshape(64, F, 3)
    offs = np.asarray(tiny_schema.offsets)
    sizes = np.asarray([f.vocab_size for f in tiny_schema.fields])
    for f in range(F):
        assert (ids_np[:, f, :] >= offs[f]).all()
        assert (ids_np[:, f, :] < offs[f] + sizes[f]).all()


def test_sample_negatives_distribution_matches_numpy_oracle(tiny_schema):
    """VERDICT r4 Weak #5: both PARITY pretrain-swap deltas sit same-sign
    near their bands, raising the possibility of a small systematic bias
    between the jax sampler's draw distribution and the NumPy oracle's.
    The two samplers share the exact floor(u * vocab) mapping and differ
    only in the uniform source (threefry vs PCG64), so distributional
    equality of the SAMPLED IDS is the mechanism check: per-field id
    histograms over 200k draws must agree within the multinomial envelope."""
    fs = field_sampling(tiny_schema)
    F = tiny_schema.num_fields
    m, B, reps = 2, 4096, 12
    offs = np.asarray(tiny_schema.offsets)
    sizes = np.asarray([f.vocab_size for f in tiny_schema.fields])
    V = tiny_schema.vocab_size

    def hist(draws):
        h = np.zeros(V + 1, np.int64)
        np.add.at(h, draws.reshape(-1), 1)
        return h

    rng = jax.random.PRNGKey(123)
    jax_draws = []
    for _ in range(reps):
        rng, r = jax.random.split(rng)
        jax_draws.append(np.asarray(sample_negatives(r, fs, B, m)))
    h_jax = hist(np.concatenate(jax_draws))

    nrng = np.random.default_rng(123)
    u = nrng.random((reps * B, F, m))
    np_draws = (offs[None, :, None]
                + np.floor(u * sizes[None, :, None]).astype(np.int64))
    h_np = hist(np_draws)

    n = reps * B * m  # draws per field
    for f in range(F):
        sl = slice(offs[f], offs[f] + sizes[f])
        p = 1.0 / sizes[f]
        sigma = np.sqrt(n * p * (1 - p))
        # each id's count is Binomial(n, 1/vocab) under BOTH samplers; a
        # systematic bias shows as a deviation far outside the envelope
        assert np.abs(h_jax[sl] - n * p).max() < 5 * sigma, f
        assert np.abs(h_np[sl] - n * p).max() < 5 * sigma, f
        # and the two empirical histograms agree with each other
        assert np.abs(h_jax[sl] - h_np[sl]).max() < 7 * sigma, f


def _run_pretrain_steps(pretrainer, schema, ids, steps=30, hidden1=8, lr=0.1):
    rng = jax.random.PRNGKey(0)
    rng, init_rng = jax.random.split(rng)
    table = 0.01 * jax.random.normal(
        init_rng, (schema.padded_vocab_size, hidden1), jnp.float32
    )
    table = table.at[schema.pad_id].set(0.0)
    dense = init_pretrain_dense(schema, hidden1)
    opt = SparseSgd(learning_rate=lr)
    sstate = opt.init(table)
    pstep = make_pretrain_step(pretrainer, schema, opt, dense_lr=lr)
    losses = []
    B = 128
    for i in range(steps):
        sel = np.random.default_rng(i).integers(0, ids.shape[0], B)
        table, sstate, dense, rng, loss = pstep(
            table, sstate, dense, rng, jnp.asarray(ids[sel])
        )
        losses.append(float(loss))
    return table, dense, losses


def test_dae_pretrain_reduces_loss(tiny_schema, tiny_dataset):
    table, dense, losses = _run_pretrain_steps(
        DaePretrainer(m=2, corruption=0.3),
        tiny_schema,
        tiny_dataset.ids,
        steps=120,
        lr=0.3,
    )
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.95, losses
    # pad row untouched
    np.testing.assert_array_equal(
        np.asarray(table)[tiny_schema.pad_id], np.zeros(table.shape[1])
    )


def test_rbm_pretrain_reduces_reconstruction_error(tiny_schema, tiny_dataset):
    table, dense, losses = _run_pretrain_steps(
        RbmPretrainer(m=2), tiny_schema, tiny_dataset.ids, steps=40, lr=0.05
    )
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses


def test_pretrain_to_snn_handoff_and_finetune(tiny_schema, tiny_dataset):
    ds = tiny_dataset
    h1 = 16
    table, b1 = pretrain_snn(
        DaePretrainer(m=2, corruption=0.3),
        tiny_schema,
        h1,
        ds.ids[:2000],
        sparse_opt=SparseSgd(learning_rate=0.1),
        batch_size=256,
        epochs=2,
    )
    model = SNNModel(hidden1=h1, mlp=MlpSpec(hidden=(16,), dropout=0.0))
    st = init_state(model, tiny_schema, SparseAdagrad(0.1), optax.adagrad(0.05))
    params = init_snn_from_pretrain(
        {"table": st.table, "dense": st.dense}, table, b1
    )
    st = st._replace(table=params["table"], dense=params["dense"])
    res = fit(
        model,
        tiny_schema,
        ds.ids[:3000],
        ds.labels[:3000],
        ds.ids[3000:],
        ds.labels[3000:],
        sparse_opt=SparseAdagrad(0.1),
        dense_opt=optax.adagrad(0.05),
        batch_size=256,
        epochs=6,
        state=st,
        prefetch=False,
        early_stop_patience=6,
    )
    assert res.best_auc > 0.62, res.history


def _matched_noise_trajectories(kind, tiny_schema, tiny_dataset, steps=25):
    """Run the jax pretrainer and the NumPy oracle from the SAME init with
    the SAME uniform draws; return their (table, b1, vbias) trajectories."""
    from deepctr_tpu.reference_impl import NumpyDae, NumpyRbm

    schema, ds = tiny_schema, tiny_dataset
    h1, m, lr, B = 8, 2, 0.1, 64
    F = schema.num_fields
    if kind == "dae":
        ref = NumpyDae(schema, hidden1=h1, m=m, lr=lr, seed=3)
        pre = DaePretrainer(m=m)
    else:
        ref = NumpyRbm(schema, hidden1=h1, m=m, lr=lr, seed=3)
        pre = RbmPretrainer(m=m)

    table = jnp.asarray(ref.table.copy())
    dense = {"b1": jnp.asarray(ref.b1.copy()),
             "vbias": jnp.asarray(ref.vbias.copy())}
    opt = SparseSgd(learning_rate=lr)
    sstate = opt.init(table)
    pstep = make_pretrain_step(pre, schema, opt, dense_lr=lr,
                               with_noise=True)
    rng = jax.random.PRNGKey(0)  # consumed but overridden by noise
    noise_rng = np.random.default_rng(77)
    for i in range(steps):
        sel = np.random.default_rng(i).integers(0, ds.ids.shape[0], B)
        ids = ds.ids[sel]
        if kind == "dae":
            noise = {"u_keep": noise_rng.random((B, schema.num_slots)),
                     "u_neg": noise_rng.random((B, F, m))}
        else:
            noise = {"u_neg": noise_rng.random((B, F, m)),
                     "u_h0": noise_rng.random((B, h1))}
        ref.train_batch(ids, noise=noise)
        table, sstate, dense, rng, _ = pstep(
            table, sstate, dense, rng, jnp.asarray(ids),
            jax.tree_util.tree_map(jnp.asarray, noise),
        )
    return ref, np.asarray(table), np.asarray(dense["b1"]), np.asarray(
        dense["vbias"]
    )


def test_dae_matched_noise_matches_numpy_oracle(tiny_schema, tiny_dataset):
    """With identical init and identical uniform draws, the jax DAE
    pretrainer and the NumPy oracle must produce the same trajectory —
    the mechanism behind PARITY.md's 'pretrain-matched' rows: any real
    semantic gap between the pretraining implementations shows here."""
    ref, table, b1, vbias = _matched_noise_trajectories(
        "dae", tiny_schema, tiny_dataset
    )
    np.testing.assert_allclose(table, ref.table, atol=2e-5)
    np.testing.assert_allclose(b1, ref.b1, atol=2e-5)
    np.testing.assert_allclose(vbias, ref.vbias, atol=2e-5)


def test_rbm_matched_noise_matches_numpy_oracle(tiny_schema, tiny_dataset):
    ref, table, b1, vbias = _matched_noise_trajectories(
        "rbm", tiny_schema, tiny_dataset
    )
    np.testing.assert_allclose(table, ref.table, atol=2e-5)
    np.testing.assert_allclose(b1, ref.b1, atol=2e-5)
    np.testing.assert_allclose(vbias, ref.vbias, atol=2e-5)

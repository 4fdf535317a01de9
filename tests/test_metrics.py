"""Metric tests: exact AUC vs sklearn-equivalent oracle, streaming AUC
convergence, logloss (SURVEY.md C9)."""

import jax.numpy as jnp
import numpy as np

from deepctr_tpu.utils.metrics import (
    auc_state_finalize,
    auc_state_init,
    auc_state_update,
    exact_auc,
    logloss,
    rmse,
)


def _auc_bruteforce(y, s):
    pos = s[y == 1]
    neg = s[y == 0]
    wins = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    return (wins + 0.5 * ties) / (len(pos) * len(neg))


def test_exact_auc_matches_bruteforce():
    rng = np.random.default_rng(0)
    y = (rng.random(500) < 0.3).astype(np.float32)
    s = rng.normal(size=500)
    # inject ties
    s[::7] = 0.5
    np.testing.assert_allclose(exact_auc(y, s), _auc_bruteforce(y, s), atol=1e-12)


def test_exact_auc_degenerate():
    assert np.isnan(exact_auc(np.ones(10), np.random.rand(10)))
    assert np.isnan(exact_auc(np.zeros(10), np.random.rand(10)))


def test_streaming_auc_converges_to_exact():
    rng = np.random.default_rng(1)
    n = 20000
    y = (rng.random(n) < 0.25).astype(np.float32)
    logits = rng.normal(size=n).astype(np.float32) + 1.2 * y
    probs = 1 / (1 + np.exp(-logits))
    want = exact_auc(y, probs)

    st = auc_state_init(num_bins=4096)
    for i in range(0, n, 2500):
        sl = slice(i, i + 2500)
        st = auc_state_update(
            st,
            jnp.asarray(logits[sl]),
            jnp.asarray(y[sl]),
            jnp.ones(len(y[sl]), jnp.float32),
        )
    got = auc_state_finalize(st)
    assert abs(got - want) < 2e-3, (got, want)


def test_streaming_auc_respects_weights():
    st = auc_state_init(num_bins=64)
    logits = jnp.asarray([5.0, -5.0, 3.0, -3.0])
    labels = jnp.asarray([1.0, 0.0, 0.0, 1.0])
    # zero weight on the last two (which would otherwise lower AUC)
    st = auc_state_update(st, logits, labels, jnp.asarray([1.0, 1.0, 0.0, 0.0]))
    assert auc_state_finalize(st) == 1.0


def test_logloss_and_rmse():
    y = np.array([1.0, 0.0, 1.0])
    p = np.array([0.9, 0.1, 0.8])
    want = -(np.log(0.9) + np.log(0.9) + np.log(0.8)) / 3
    np.testing.assert_allclose(logloss(y, p), want, rtol=1e-9)
    np.testing.assert_allclose(
        rmse(y, p), np.sqrt(((p - y) ** 2).mean()), rtol=1e-12
    )

"""Pallas kernel tests vs jnp oracles (SURVEY.md §4: kernels vs pure-jnp
reference implementations; interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from deepctr_tpu.ops.interaction import fm_interaction
from deepctr_tpu.ops.pallas import fm_score, mlp_tower
from deepctr_tpu.models.base import MlpSpec, apply_mlp, init_mlp


def _rand_rows(B=256, S=7, k=5, seed=0):
    rng = np.random.default_rng(seed)
    rows = jnp.asarray(rng.normal(size=(B, S, 1 + k)).astype(np.float32))
    mask = jnp.asarray((rng.random((B, S)) < 0.8).astype(np.float32))
    return rows, mask


def test_fm_score_matches_oracle():
    rows, mask = _rand_rows()
    got = fm_score(rows, mask, 5)
    w = rows[..., 0]
    v = rows[..., 1:]
    want = (w * mask).sum(axis=1) + fm_interaction(v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_fm_score_grad_matches_oracle():
    rows, mask = _rand_rows(B=128, S=5, k=3, seed=1)

    def fused_loss(r):
        return (fm_score(r, mask, 3) ** 2).sum()

    def oracle_loss(r):
        w = r[..., 0]
        v = r[..., 1:]
        out = (w * mask).sum(axis=1) + fm_interaction(v, mask)
        return (out**2).sum()

    g1 = jax.grad(fused_loss)(rows)
    g2 = jax.grad(oracle_loss)(rows)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-3)


def test_mlp_tower_matches_oracle():
    rng = jax.random.PRNGKey(0)
    spec = MlpSpec(hidden=(200, 300, 100), activation="tanh", dropout=0.0)
    in_dim = 176
    mlp = init_mlp(rng, in_dim, spec)
    x = jax.random.normal(jax.random.PRNGKey(1), (256, in_dim))
    got = mlp_tower(mlp, x, "tanh")
    want = apply_mlp(mlp, x, spec, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_mlp_tower_grads_match_oracle():
    rng = jax.random.PRNGKey(2)
    spec = MlpSpec(hidden=(32, 16), activation="tanh", dropout=0.0)
    mlp = init_mlp(rng, 24, spec)
    x = jax.random.normal(jax.random.PRNGKey(3), (128, 24))
    y = jax.random.bernoulli(jax.random.PRNGKey(4), 0.3, (128,)).astype(jnp.float32)

    def loss_fused(m, x_):
        logits = mlp_tower(m, x_, "tanh")
        return ((jax.nn.sigmoid(logits) - y) ** 2).mean()

    def loss_oracle(m, x_):
        logits = apply_mlp(m, x_, spec, train=False)
        return ((jax.nn.sigmoid(logits) - y) ** 2).mean()

    gm1, gx1 = jax.grad(loss_fused, argnums=(0, 1))(mlp, x)
    gm2, gx2 = jax.grad(loss_oracle, argnums=(0, 1))(mlp, x)
    for a, b in zip(jax.tree_util.tree_leaves(gm1), jax.tree_util.tree_leaves(gm2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-4, atol=1e-6)


def test_fm_score_odd_batch_sizes():
    # batch not divisible by 128 exercises the TB=B fallback
    rows, mask = _rand_rows(B=100, S=4, k=3, seed=5)
    got = fm_score(rows, mask, 3)
    w, v = rows[..., 0], rows[..., 1:]
    want = (w * mask).sum(axis=1) + fm_interaction(v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


import pytest


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="pltpu.prng_* has no CPU interpreter lowering in this JAX version",
)
@pytest.mark.xfail(
    reason="KNOWN ISSUE: in the multi-layer tower kernel the PRNG seed is "
    "ignored on TPU (identical masks for different seeds), although a "
    "structurally identical minimal kernel honours it — suspected Mosaic "
    "constant-folding of prng_random_bits in this pattern. Models route "
    "dropout through the jnp path until resolved.",
    strict=False,
)
def test_mlp_tower_in_kernel_dropout():
    """In-kernel dropout: deterministic per seed, ~unbiased, grads consistent
    with the regenerated masks (finite differences, same seed)."""
    rng = jax.random.PRNGKey(7)
    spec = MlpSpec(hidden=(64, 32), activation="tanh", dropout=0.0)
    mlp = init_mlp(rng, 48, spec)
    x = jax.random.normal(jax.random.PRNGKey(8), (128, 48))

    out_a = mlp_tower(mlp, x, "tanh", None, 0.5, 3.0)
    out_b = mlp_tower(mlp, x, "tanh", None, 0.5, 3.0)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    out_c = mlp_tower(mlp, x, "tanh", None, 0.5, 4.0)
    assert np.abs(np.asarray(out_a) - np.asarray(out_c)).max() > 1e-6

    # expectation over seeds approximates the no-dropout forward
    no_drop = np.asarray(mlp_tower(mlp, x, "tanh"))
    acc = np.zeros_like(no_drop)
    n_seeds = 16  # each eval costs a full host-fetch RTT through the tunnel
    for s in range(n_seeds):
        acc += np.asarray(mlp_tower(mlp, x, "tanh", None, 0.5, float(s)))
    mean = acc / n_seeds
    corr = np.corrcoef(mean, no_drop)[0, 1]
    assert corr > 0.9, corr

    # gradient check: same seed in f(.) means masks are fixed -> finite
    # differences through a weight must match the custom-vjp gradient
    def loss(m):
        return (mlp_tower(m, x, "tanh", None, 0.5, 11.0) ** 2).sum()

    g = jax.grad(loss)(mlp)
    w0 = mlp["layers"][0]["w"]
    eps = 1e-3
    idx = (3, 5)
    mp = jax.tree_util.tree_map(lambda a: a, mlp)
    mp["layers"][0]["w"] = w0.at[idx].add(eps)
    mm = jax.tree_util.tree_map(lambda a: a, mlp)
    mm["layers"][0]["w"] = w0.at[idx].add(-eps)
    fd = (loss(mp) - loss(mm)) / (2 * eps)
    got = float(g["layers"][0]["w"][idx])
    np.testing.assert_allclose(got, float(fd), rtol=2e-2, atol=1e-3)

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


def _host_counter_mask(shape, keep, seed, layer, row0=0):
    """jnp reimplementation of ops/pallas/mlp._dropout_mask (the oracle)."""
    r = jnp.arange(shape[0], dtype=jnp.uint32)[:, None] + jnp.uint32(row0)
    c = jnp.arange(shape[1], dtype=jnp.uint32)[None, :]
    h = (
        r * jnp.uint32(0x9E3779B9)
        + c * jnp.uint32(0x85EBCA6B)
        + jnp.uint32(seed) * jnp.uint32(0xC2B2AE35)
        + jnp.uint32((layer + 1) * 0x27D4EB2F)
    )
    h = h ^ (h >> jnp.uint32(16)); h = h * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> jnp.uint32(15)); h = h * jnp.uint32(0x846CA68B)
    h = h ^ (h >> jnp.uint32(16))
    thr = jnp.uint32(int(keep * 0xFFFFFFFF))
    return (h < thr).astype(jnp.float32) / keep


def test_mlp_tower_in_kernel_dropout():
    """In-kernel dropout: deterministic per seed, unbiased keep-rate, fwd and
    grads EXACTLY matching a jnp oracle that applies the same counter-based
    masks.

    History (both bugs found on the real chip, see ops/pallas/mlp.py):
    round 1's pltpu.prng path (a) compared int32 random bits against a
    uint32 threshold — a signed compare keeping ~everything, and (b) even
    fixed, the stateful PRNG's draw->element layout differed between the
    fused fwd and bwd kernels, so "re-seed and redraw" gave ~75%-overlap
    masks and gradients off by up to 4x.  The counter-based hash mask is
    layout-independent and pure-jnp-expressible, which is what makes this
    exact oracle test possible (and lets it run in CPU interpret mode)."""
    from deepctr_tpu.ops.pallas.mlp import _pad_params

    rng = jax.random.PRNGKey(7)
    spec = MlpSpec(hidden=(64, 32), activation="tanh", dropout=0.0)
    mlp = init_mlp(rng, 48, spec)
    x = jax.random.normal(jax.random.PRNGKey(8), (128, 48))

    out_a = mlp_tower(mlp, x, "tanh", None, 0.5, 3.0)
    out_b = mlp_tower(mlp, x, "tanh", None, 0.5, 3.0)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    out_c = mlp_tower(mlp, x, "tanh", None, 0.5, 4.0)
    assert np.abs(np.asarray(out_a) - np.asarray(out_c)).max() > 1e-6

    # keep-rate on a rigged tower that exposes the first-layer mask:
    # W1 = 0, b1 = atanh(0.5) -> every hidden activation is exactly 0.5;
    # W2 = ones, b2 = 0 -> logit_j = (0.5/keep) * (#kept units of row j);
    # mean_logit = (0.5/keep) * h1 * keep_hat.  128*64 draws x 8 seeds pins
    # keep_hat to ~+-1% at 3 sigma.
    h1 = 64
    rig = {
        "layers": [
            {"w": jnp.zeros((48, h1)), "b": jnp.full((h1,), np.arctanh(0.5))},
            {"w": jnp.ones((h1, 1)), "b": jnp.zeros((1,))},
        ]
    }
    keep = 0.5
    tot, n_seeds = 0.0, 8
    for s in range(n_seeds):
        logits = np.asarray(mlp_tower(rig, x, "tanh", None, 1 - keep, 100.0 + s))
        tot += logits.mean()
    keep_rate = (tot / n_seeds) * keep / (0.5 * h1)
    assert abs(keep_rate - keep) < 0.015, keep_rate

    # exact oracle: same masks in pure jnp on the padded dims.  (A naive
    # finite-difference check is unsound here: matmuls run at default MXU
    # precision, where a 1e-3 weight perturbation is ~1 bf16 ulp.)
    SEED, DROP = 11, 0.5
    padded, dims, pdims = _pad_params(mlp["layers"], 48)
    x_pad = jnp.pad(x, ((0, 0), (0, pdims[0] - 48)))
    masks = [
        _host_counter_mask((128, pdims[i + 1]), 1 - DROP, SEED, i)
        for i in range(len(padded) - 1)
    ]

    def oracle(m):
        pl_, _, _ = _pad_params(m["layers"], 48)
        h = x_pad
        for i, (W, b) in enumerate(pl_):
            h = h @ W + b
            if i < len(pl_) - 1:
                h = jnp.tanh(h) * masks[i]
        return (h[:, 0] ** 2).sum()

    def loss(m):
        return (mlp_tower(m, x, "tanh", None, DROP, float(SEED)) ** 2).sum()

    np.testing.assert_allclose(float(loss(mlp)), float(oracle(mlp)),
                               rtol=1e-5)
    gk = jax.grad(loss)(mlp)
    go = jax.grad(oracle)(mlp)
    for a, b in zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(go)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

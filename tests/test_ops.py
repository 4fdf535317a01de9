"""Math-op unit tests (SURVEY.md §4: FM identity vs brute force, dedupe
scatter vs dense segment-sum oracle)."""

import jax
import jax.numpy as jnp
import numpy as np

from deepctr_tpu.ops import (
    dedupe_grads,
    fm_interaction,
    fm_interaction_bruteforce,
    scatter_add_dedup,
    segment_sum_dense,
)


def test_fm_identity_vs_bruteforce():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(16, 7, 5)).astype(np.float32))
    mask = jnp.asarray((rng.random((16, 7)) < 0.8).astype(np.float32))
    fast = fm_interaction(v, mask)
    slow = fm_interaction_bruteforce(v, mask)
    np.testing.assert_allclose(fast, slow, rtol=1e-4, atol=1e-4)


def test_fm_interaction_gradients_match():
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.normal(size=(4, 5, 3)).astype(np.float32))
    g_fast = jax.grad(lambda x: fm_interaction(x).sum())(v)
    g_slow = jax.grad(lambda x: fm_interaction_bruteforce(x).sum())(v)
    np.testing.assert_allclose(g_fast, g_slow, rtol=1e-4, atol=1e-4)


def test_dedupe_grads_matches_dense_segment_sum():
    rng = np.random.default_rng(2)
    M, D, V = 64, 6, 20
    ids = jnp.asarray(rng.integers(0, V, size=M).astype(np.int32))
    rows = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32))
    d = dedupe_grads(ids, rows)
    # scattering deduped rows == dense segment sum
    table = jnp.zeros((V, D))
    got = table.at[d.ids].add(d.rows)
    want = segment_sum_dense(ids, rows, V)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # each distinct id flagged exactly once
    uniq = np.unique(np.asarray(ids))
    assert int(d.is_last.sum()) == len(uniq)


def test_scatter_add_dedup():
    rng = np.random.default_rng(3)
    V, D, M = 15, 4, 40
    table = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, V, size=M).astype(np.int32))
    rows = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32))
    got = scatter_add_dedup(table, ids, rows)
    want = table + segment_sum_dense(ids, rows, V)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_dedupe_all_same_id():
    ids = jnp.asarray([7, 7, 7, 7], jnp.int32)
    rows = jnp.ones((4, 3))
    d = dedupe_grads(ids, rows)
    assert int(d.is_last.sum()) == 1
    np.testing.assert_allclose(np.asarray(d.rows).sum(axis=0), [4, 4, 4])


def test_dedupe_grads_sorted_hint_matches_unsorted():
    rng = np.random.default_rng(4)
    M, D, V = 48, 5, 12
    ids = np.sort(rng.integers(0, V, size=M).astype(np.int32))
    rows = rng.normal(size=(M, D)).astype(np.float32)
    a = dedupe_grads(jnp.asarray(ids), jnp.asarray(rows))
    b = dedupe_grads(jnp.asarray(ids), jnp.asarray(rows), ids_sorted=True)
    np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
    np.testing.assert_allclose(np.asarray(a.rows), np.asarray(b.rows),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(a.is_last), np.asarray(b.is_last))

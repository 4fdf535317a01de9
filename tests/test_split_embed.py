"""Split-embedding path (ops/split_embed.py): one-hot-matmul small fields +
gather/scatter big fields must be trajectory-equivalent to the all-scatter
path, with identical pad handling and duplicate-dedup semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deepctr_tpu.data import make_schema, synthetic
from deepctr_tpu.models import FMModel, make_fnn, MlpSpec
from deepctr_tpu.ops.split_embed import (
    assemble_rows,
    gather_big_rows,
    make_split_plan,
    slice_small_tables,
)
from deepctr_tpu.optim import SparseAdagrad, SparseSgd
from deepctr_tpu.train import init_state, make_train_step


@pytest.fixture(scope="module")
def mixed_schema():
    # mix of small fields and one "big" field (threshold below will split it)
    return make_schema(
        [("a", 6), ("big", 500), ("b", 12), ("tags", 9, 3)]
    )


@pytest.fixture(scope="module")
def mixed_data(mixed_schema):
    return synthetic.generate(mixed_schema, num_examples=512, k=3, seed=7)


def test_plan_partition(mixed_schema):
    plan = make_split_plan(mixed_schema, threshold=64)
    assert [f.name for f in plan.small] == ["a", "b", "tags"]
    # "big" occupies slot 1 (after a's single slot)
    assert plan.big_slots == (1,)
    assert plan.num_slots == mixed_schema.num_slots
    # permutation restores packed slot order
    perm = plan.perm_to_slots
    assert sorted(perm.tolist()) == list(range(mixed_schema.num_slots))


def test_assemble_matches_take(mixed_schema, mixed_data):
    plan = make_split_plan(mixed_schema, threshold=64)
    rng = np.random.default_rng(0)
    V = mixed_schema.padded_vocab_size
    table = rng.normal(size=(V, 5)).astype(np.float32)
    table[mixed_schema.pad_id] = 0.0
    table = jnp.asarray(table)
    ids = jnp.asarray(mixed_data.ids[:64])

    rows = assemble_rows(
        slice_small_tables(table, plan),
        gather_big_rows(table, ids, plan),
        ids,
        plan,
    )
    want = jnp.take(table, ids, axis=0)
    np.testing.assert_allclose(np.asarray(rows), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_assemble_all_small():
    schema = make_schema([("a", 4), ("b", 7)])
    plan = make_split_plan(schema, threshold=1000)
    assert not plan.big_slots
    table = jnp.asarray(
        np.random.default_rng(1).normal(size=(schema.padded_vocab_size, 3))
        .astype(np.float32)
    )
    table = table.at[schema.pad_id].set(0.0)
    ids = jnp.asarray([[0, 4], [3, 10], [schema.pad_id, schema.pad_id]],
                      jnp.int32)
    rows = assemble_rows(
        slice_small_tables(table, plan),
        gather_big_rows(table, ids, plan),
        ids,
        plan,
    )
    np.testing.assert_allclose(
        np.asarray(rows), np.asarray(jnp.take(table, ids, axis=0)),
        rtol=1e-6, atol=1e-6,
    )


@pytest.mark.parametrize("opt_name", ["sgd", "adagrad"])
@pytest.mark.parametrize("model_kind", ["fm", "fnn"])
def test_split_trajectory_matches_allscatter(
    mixed_schema, mixed_data, opt_name, model_kind
):
    if model_kind == "fm":
        model = FMModel(k=4)
    else:
        model = make_fnn(mixed_schema, k=4, mlp=MlpSpec(hidden=(16, 8)))
    mkopt = (lambda: SparseSgd(0.1)) if opt_name == "sgd" else (
        lambda: SparseAdagrad(0.1)
    )
    plan = make_split_plan(mixed_schema, threshold=64)
    assert plan.has_small and plan.big_slots

    def run(split):
        sopt, dopt = mkopt(), optax.adagrad(0.05)
        state = init_state(model, mixed_schema, sopt, dopt, seed=3)
        step = make_train_step(
            model, mixed_schema, sopt, dopt, l2=1e-4, split=split
        )
        losses = []
        for i in range(4):
            lo, hi = i * 128, (i + 1) * 128
            state, m = step(
                state,
                jnp.asarray(mixed_data.ids[lo:hi]),
                jnp.asarray(mixed_data.labels[lo:hi]),
                jnp.ones((128,), jnp.float32),
            )
            losses.append(float(m.loss))
        return state, losses

    s_ref, l_ref = run(None)
    s_split, l_split = run(plan)
    np.testing.assert_allclose(l_split, l_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s_split.table), np.asarray(s_ref.table),
        rtol=1e-5, atol=1e-6,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_split.dense),
        jax.tree_util.tree_leaves(s_ref.dense),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_split_pad_row_stays_frozen(mixed_schema):
    model = FMModel(k=4)
    sopt, dopt = SparseAdagrad(0.5), optax.adagrad(0.05)
    plan = make_split_plan(mixed_schema, threshold=64)
    state = init_state(model, mixed_schema, sopt, dopt, seed=0)
    step = make_train_step(model, mixed_schema, sopt, dopt, split=plan)
    ids = np.full((32, mixed_schema.num_slots), mixed_schema.pad_id, np.int32)
    ids[:, 1] = 50  # only the big field has a real id
    state2, _ = step(
        state,
        jnp.asarray(ids),
        jnp.zeros((32,), jnp.float32),
        jnp.ones((32,), jnp.float32),
    )
    np.testing.assert_array_equal(
        np.asarray(state2.table[mixed_schema.pad_id]),
        np.zeros(state2.table.shape[1], np.float32),
    )


@pytest.mark.parametrize("opt_name", ["sgd", "adagrad"])
def test_patches_match_occurrence_updates(opt_name):
    """A dense patch must equal the scatter of its occurrence rows."""
    rng = np.random.default_rng(5)
    V, D, M = 20, 4, 40
    table = rng.normal(size=(V, D)).astype(np.float32)
    ids = rng.integers(3, 11, size=M).astype(np.int32)  # rows 3..10
    rows = rng.normal(size=(M, D)).astype(np.float32)
    opt = SparseSgd(0.1) if opt_name == "sgd" else SparseAdagrad(0.1)
    st = opt.init(jnp.asarray(table))

    want, st_w = opt.update(
        jnp.asarray(table), st, jnp.asarray(ids), jnp.asarray(rows)
    )
    # same gradient expressed as one dense patch over rows [3, 11)
    g = np.zeros((8, D), np.float32)
    for i, r in zip(ids, rows):
        g[i - 3] += r
    empty_ids = jnp.zeros((0,), jnp.int32)
    empty_rows = jnp.zeros((0, D), jnp.float32)
    got, st_g = opt.update(
        jnp.asarray(table), st, empty_ids, empty_rows,
        patches=[(3, jnp.asarray(g))],
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    if opt_name == "adagrad":
        np.testing.assert_allclose(np.asarray(st_g.acc), np.asarray(st_w.acc),
                                   rtol=1e-5, atol=1e-6)

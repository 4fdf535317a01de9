"""Where does the full-vocab FNN step spend its time? (v5e, marginal-scan)

Times variants of the train step, each as one jitted lax.scan over T steps,
reporting the MARGINAL per-step ms (2T vs T difference method, same protocol
as bench.py). Variants:

  full        — the production step (split embedding + dense-scratch Adagrad)
  no_sparse   — skip sparse_opt.update entirely (table never updated)
  no_scatter  — sparse update with patches only (big-field occurrences dropped)
  no_big      — big_rows = zeros, no occurrence scatter (small fields + MLP)
  fwd_only    — eval forward only (no grads, no updates)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deepctr_tpu.data import ipinyou_full_schema, synthetic
from deepctr_tpu.models import MlpSpec, make_fnn
from deepctr_tpu.models.base import weighted_bce_with_logits
from deepctr_tpu.ops.split_embed import (
    assemble_rows,
    gather_big_rows,
    grads_to_patches,
    make_split_plan,
    slice_small_tables,
)
from deepctr_tpu.optim import SparseAdagrad
from deepctr_tpu.train import init_state

BATCH = 8192
T = 40


def build(variant, model, schema, sopt, dopt, split):
    pad_id = schema.pad_id

    def step(state, ids, labels, weights):
        rng, step_rng = jax.random.split(state.rng)
        mask = (ids != pad_id).astype(jnp.float32)
        small_tabs = slice_small_tables(state.table, split)
        if variant == "no_big":
            big_rows = jnp.zeros(
                (ids.shape[0], len(split.big_slots), state.table.shape[1]),
                state.table.dtype,
            )
        else:
            big_rows = gather_big_rows(state.table, ids, split)

        def loss_fn(small_tabs_, big_rows_, dense_):
            rows_ = assemble_rows(small_tabs_, big_rows_, ids, split)
            logits = model.apply_rows(dense_, rows_, mask, train=True, rng=step_rng)
            return weighted_bce_with_logits(logits, labels, weights), logits

        if variant == "fwd_only":
            loss, logits = loss_fn(small_tabs, big_rows, state.dense)
            return state._replace(rng=rng), loss

        (loss, _), (g_small, g_big, g_dense) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(small_tabs, big_rows, state.dense)
        big_slots = jnp.asarray(split.big_slots, jnp.int32)
        occ_ids = ids[:, big_slots].reshape(-1)
        occ_rows = g_big.reshape(-1, g_big.shape[-1])
        patches = grads_to_patches(g_small, split)

        table, sparse_state = state.table, state.sparse_state
        if variant == "full":
            table, sparse_state = sopt.update(
                state.table, state.sparse_state, occ_ids, occ_rows, patches=patches
            )
        elif variant == "no_scatter":
            table, sparse_state = sopt.update(
                state.table,
                state.sparse_state,
                occ_ids[:1],
                occ_rows[:1] * 0.0,
                patches=patches,
            )
        elif variant == "no_sparse":
            pass
        updates, dense_state = dopt.update(g_dense, state.dense_state, state.dense)
        dense = optax.apply_updates(state.dense, updates)
        return (
            state._replace(
                table=table,
                sparse_state=sparse_state,
                dense=dense,
                dense_state=dense_state,
                rng=rng,
            ),
            loss,
        )

    def scan_step(state, ids, labels, weights):
        def body(st, batch):
            st2, loss = step(st, *batch)
            return st2, loss

        return jax.lax.scan(body, state, (ids, labels, weights))

    return jax.jit(scan_step)


def main():
    schema = ipinyou_full_schema()
    split = make_split_plan(schema)
    ds = synthetic.generate(schema, num_examples=2 * T * BATCH, k=4, seed=3)
    model = make_fnn(schema, k=10, mlp=MlpSpec(hidden=(200, 300, 100), dropout=0.5))
    sopt = SparseAdagrad(0.05)
    dopt = optax.adagrad(0.02)

    def stack(count):
        return (
            jnp.asarray(ds.ids[: count * BATCH]).reshape(count, BATCH, -1),
            jnp.asarray(ds.labels[: count * BATCH]).reshape(count, BATCH),
            jnp.ones((count, BATCH), jnp.float32),
        )

    b1, b2 = stack(T), stack(2 * T)
    float(b2[0].sum())

    for variant in ["full", "no_sparse", "no_scatter", "no_big", "fwd_only"]:
        state = init_state(model, schema, sopt, dopt, seed=0)
        fn = build(variant, model, schema, sopt, dopt, split)

        def timed(batch):
            t0 = time.perf_counter()
            st, losses = fn(state, *batch)
            np.asarray(losses)
            return time.perf_counter() - t0

        timed(b1)
        timed(b2)
        t1, t2 = timed(b1), timed(b2)
        ms = (t2 - t1) / T * 1e3
        print(f"{variant:12s} {ms:7.3f} ms/step")


if __name__ == "__main__":
    main()

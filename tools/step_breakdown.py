"""Full-vocab FNN step breakdown on TPU -> feeds BENCH.md's roofline section.

Measures, with the marginal-scan protocol: the full train step, forward
only, forward+backward (no optimizer), and the same full step with the
fused Pallas tower — so the scatter tail, MLP, and gather shares are
attributed with numbers instead of guesses.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

T_SMALL, T_BIG = 10, 20
BATCH = 8192


def main(which=()):
    import jax
    import jax.numpy as jnp
    import optax

    from deepctr_tpu.data import ipinyou_full_schema, synthetic
    from deepctr_tpu.models import MlpSpec, make_fnn
    from deepctr_tpu.models.base import weighted_bce_with_logits
    from deepctr_tpu.ops.split_embed import (
        assemble_rows,
        gather_big_rows_sorted,
        make_split_plan,
        slice_small_tables,
    )
    from deepctr_tpu.optim import SparseAdagrad
    from deepctr_tpu.train import init_state
    from deepctr_tpu.train.step import make_scan_train_step

    schema = ipinyou_full_schema()
    split = make_split_plan(schema)
    ds = synthetic.generate(schema, num_examples=BATCH * T_BIG, k=4, seed=3)
    pad_id = schema.pad_id

    def stacked(c):
        out = (
            jnp.asarray(ds.ids[: c * BATCH]).reshape(c, BATCH, -1),
            jnp.asarray(ds.labels[: c * BATCH]).reshape(c, BATCH),
            jnp.ones((c, BATCH), jnp.float32),
        )
        for x in out:
            float(x.sum())
        return out

    results = {}

    def marginal(run):
        run(T_SMALL)
        run(T_BIG)
        a = run(T_SMALL)
        b = run(T_BIG)
        return max(b - a, 1e-9) / (T_BIG - T_SMALL)

    def bench_scan(name, scan_fn, state0):
        if which and name not in which:
            return

        holder = {"s": state0}

        def run(cnt):
            batch = stacked(cnt)
            t0 = time.perf_counter()
            st, losses = scan_fn(holder["s"], *batch)
            lo = np.asarray(losses)
            assert np.isfinite(lo).all()
            holder["s"] = st
            return time.perf_counter() - t0

        sec = marginal(run)
        results[name] = sec
        print(f"{name:24s} {sec * 1e3:8.3f} ms/step   "
              f"{BATCH / sec / 1e6:6.2f} M ex/s", file=sys.stderr)

    # --- full step (status quo) ----------------------------------------------
    for pallas in (False, True):
        model = make_fnn(schema, k=10,
                         mlp=MlpSpec(hidden=(200, 300, 100), dropout=0.5),
                         use_pallas=pallas)
        sopt, dopt = SparseAdagrad(0.05), optax.adagrad(0.02)
        state = init_state(model, schema, sopt, dopt, seed=0)
        scan_step = make_scan_train_step(model, schema, sopt, dopt, split=split)
        bench_scan("full_step" + ("_pallas" if pallas else ""), scan_step, state)

    # --- precision experiments -------------------------------------------------
    import deepctr_tpu.ops.split_embed as se

    def prec_variant(name, onehot_prec, default_prec):
        if which and name not in which:
            return
        saved = se.ONEHOT_PRECISION
        se.ONEHOT_PRECISION = onehot_prec
        try:
            ctx = (jax.default_matmul_precision(default_prec)
                   if default_prec else None)
            model = make_fnn(schema, k=10,
                             mlp=MlpSpec(hidden=(200, 300, 100), dropout=0.5))
            sopt, dopt = SparseAdagrad(0.05), optax.adagrad(0.02)
            state = init_state(model, schema, sopt, dopt, seed=0)
            if ctx:
                with ctx:
                    scan_step = make_scan_train_step(model, schema, sopt, dopt,
                                                     split=split)
                    bench_scan(name, scan_step, state)
            else:
                scan_step = make_scan_train_step(model, schema, sopt, dopt,
                                                 split=split)
                bench_scan(name, scan_step, state)
        finally:
            se.ONEHOT_PRECISION = saved

    prec_variant("full_step_sel_default", jax.lax.Precision.DEFAULT, None)
    prec_variant("full_step_sel_high", jax.lax.Precision.HIGH, None)
    prec_variant("full_step_all_bf16", jax.lax.Precision.DEFAULT, "bfloat16")

    # --- forward only / forward+backward --------------------------------------
    model = make_fnn(schema, k=10,
                     mlp=MlpSpec(hidden=(200, 300, 100), dropout=0.5))
    sopt, dopt = SparseAdagrad(0.05), optax.adagrad(0.02)
    state0 = init_state(model, schema, sopt, dopt, seed=0)

    def fwd_loss(small_tabs, big_rows, dense, ids, labels, weights, mask, rng):
        rows_ = assemble_rows(small_tabs, big_rows, ids, split)
        logits = model.apply_rows(dense, rows_, mask, train=True, rng=rng)
        return weighted_bce_with_logits(logits, labels, weights)

    @jax.jit
    def scan_fwd(state, ids_s, labels_s, weights_s):
        def body(st, batch):
            ids, labels, weights = batch
            rng, step_rng = jax.random.split(st.rng)
            mask = (ids != pad_id).astype(jnp.float32)
            small_tabs = slice_small_tables(st.table, split)
            big_rows, sorted_ids, order = gather_big_rows_sorted(
                st.table, ids, split)
            loss = fwd_loss(small_tabs, big_rows, st.dense, ids, labels,
                            weights, mask, step_rng)
            # fold loss into rng so successive steps depend on each other
            return st._replace(rng=rng), loss

        st, losses = jax.lax.scan(body, state, (ids_s, labels_s, weights_s))
        return st, losses

    bench_scan("fwd_only", scan_fwd, state0)

    @jax.jit
    def scan_fwd_bwd(state, ids_s, labels_s, weights_s):
        def body(st, batch):
            ids, labels, weights = batch
            rng, step_rng = jax.random.split(st.rng)
            mask = (ids != pad_id).astype(jnp.float32)
            small_tabs = slice_small_tables(st.table, split)
            big_rows, sorted_ids, order = gather_big_rows_sorted(
                st.table, ids, split)
            loss, (g_small, g_big, g_dense) = jax.value_and_grad(
                fwd_loss, argnums=(0, 1, 2))(
                small_tabs, big_rows, st.dense, ids, labels, weights, mask,
                step_rng)
            # consume every gradient (prevent DCE) but apply no update
            tiny = sum(jnp.sum(g) for g in g_small)
            tiny += jnp.sum(g_big)
            tiny += sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g_dense))
            return st._replace(rng=rng), loss + 1e-30 * tiny

        st, losses = jax.lax.scan(body, state, (ids_s, labels_s, weights_s))
        return st, losses

    bench_scan("fwd_bwd_no_update", scan_fwd_bwd, state0)

    print(json.dumps({k: round(v * 1e3, 4) for k, v in results.items()}))


if __name__ == "__main__":
    main(set(sys.argv[1:]))

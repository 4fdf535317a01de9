"""Scatter-tail lab: measure big-field gradient-accumulation variants on TPU.

VERDICT round-1 #4: ~2.4 ms/step of the full-vocab FNN step is big-field
gradient accumulation (scatter-bound).  This lab measures candidate
formulations with the marginal-scan protocol (BENCH.md) so the optimizer
design is driven by numbers, and feeds the roofline section of BENCH.md.

Measurement rules learned the hard way (tunneled runtime):
- barrier = host fetch of an on-device SUM of the carry (fetching a single
  element can return before the full computation finishes);
- force EVERY input's H2D transfer before starting the clock (ids AND rows —
  an unforced 40MB transfer scales with T and pollutes the marginal);
- never let the payload be DCE-able (no ``0.0 *`` tricks — XLA folds them).

Run: python tools/scatter_lab.py [variant ...]   (real TPU)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

T_SMALL, T_BIG = 10, 20
BATCH = 8192
D = 11


def marginal(run):
    run(T_SMALL)
    run(T_BIG)
    a = run(T_SMALL)
    b = run(T_BIG)
    return max(b - a, 1e-9) / (T_BIG - T_SMALL)


def main(which):
    import jax
    import jax.numpy as jnp

    from deepctr_tpu.data import ipinyou_full_schema, synthetic
    from deepctr_tpu.ops.scatter import dedupe_grads
    from deepctr_tpu.ops.split_embed import make_split_plan

    schema = ipinyou_full_schema()
    plan = make_split_plan(schema)
    big_slots = np.asarray(plan.big_slots)
    ds = synthetic.generate(schema, num_examples=BATCH * T_BIG, k=4, seed=3)
    M = BATCH * len(big_slots)
    Vp = schema.padded_vocab_size

    ids_all = ds.ids[:, big_slots].reshape(-1, M).astype(np.int32)  # [T, M]
    uniq_frac = np.mean([len(np.unique(r)) / M for r in ids_all[:4]])
    print(f"M={M} rows/step over [{Vp}, {D}] f32; unique fraction "
          f"{uniq_frac:.3f}", file=sys.stderr)

    rng = np.random.default_rng(0)
    rows_all = rng.normal(size=(ids_all.shape[0], M, D)).astype(np.float32) * 1e-4

    ids_all_jnp_src = ids_all

    def stacked(c):
        out = (jnp.asarray(ids_all_jnp_src[:c]), jnp.asarray(rows_all[:c]))
        for x in out:  # force EVERY H2D transfer before the clock
            float(x.sum())
        return out

    table0 = jnp.asarray(rng.normal(size=(Vp, D)).astype(np.float32) * 0.01)
    acc0 = jnp.zeros((Vp, D), jnp.float32)
    results = {}

    def bench(name, body, carry_init):
        """body(carry, ids, rows) -> carry; scanned T steps."""
        if which and name not in which:
            return

        @jax.jit
        def scan_fn(carry, ids_s, rows_s):
            def f(c, xs):
                return body(c, xs[0], xs[1]), jnp.float32(0)
            c, _ = jax.lax.scan(f, carry, (ids_s, rows_s))
            # fold the carry to one scalar ON DEVICE so the host barrier is
            # a single number that depends on all of it
            return c, sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(c))

        def run(cnt):
            batch = stacked(cnt)
            t0 = time.perf_counter()
            _, s = scan_fn(carry_init, *batch)
            assert np.isfinite(float(s))
            return time.perf_counter() - t0

        sec = marginal(run)
        results[name] = sec
        print(f"{name:22s} {sec * 1e3:8.3f} ms/step   "
              f"{sec / M * 1e9:7.2f} ns/row", file=sys.stderr)

    # --- reference: gather M rows (non-DCE-able: result folds into carry) ---
    def gather(t, ids, rows):
        return t.at[0].add(1e-9 * jnp.take(t, ids, axis=0).sum(axis=0))

    bench("gather", gather, table0)

    # --- scatter variants ----------------------------------------------------
    bench("scatter_plain", lambda t, ids, rows: t.at[ids].add(rows), table0)

    def sorted_scatter(t, ids, rows):
        sid, order = jax.lax.sort(
            (ids, jnp.arange(M, dtype=jnp.int32)), num_keys=1
        )
        return t.at[sid].add(jnp.take(rows, order, axis=0),
                             indices_are_sorted=True)

    bench("scatter_sorted", sorted_scatter, table0)

    def dedup_scatter(t, ids, rows):
        d = dedupe_grads(ids, rows)
        return t.at[d.ids].add(d.rows, indices_are_sorted=True)

    bench("scatter_dedup", dedup_scatter, table0)

    def unique_scatter_into(t_ext, ids, rows):
        """Scatter with UNIQUE sorted indices: last occurrences keep their id,
        others are redirected to scratch rows >= Vp (one per occurrence), so
        XLA can drop the collision-hazard serialisation."""
        d = dedupe_grads(ids, rows)
        iota = jnp.arange(M, dtype=jnp.int32)
        uids = jnp.where(d.is_last, d.ids, Vp + iota)
        suids, sorder = jax.lax.sort((uids, iota), num_keys=1)
        srows = jnp.take(d.rows, sorder, axis=0)
        return t_ext.at[suids].add(srows, indices_are_sorted=True,
                                   unique_indices=True)

    table_ext0 = jnp.concatenate([table0, jnp.zeros((M, D), jnp.float32)])
    bench("scatter_unique", unique_scatter_into, table_ext0)

    def unique_scatter_unsorted(t_ext, ids, rows):
        d = dedupe_grads(ids, rows)
        iota = jnp.arange(M, dtype=jnp.int32)
        uids = jnp.where(d.is_last, d.ids, Vp + iota)
        return t_ext.at[uids].add(d.rows, unique_indices=True)

    bench("scatter_uniq_nosort", unique_scatter_unsorted, table_ext0)

    # --- full optimizer updates ----------------------------------------------
    lr, eps = 0.05, 1e-6

    def dense_update(carry, ids, rows):
        t, acc = carry
        g = jnp.zeros_like(t).at[ids].add(rows)
        acc = acc + g * g
        t = t - lr * g / (jnp.sqrt(acc) + eps)
        return (t, acc)

    bench("dense_update", dense_update, (table0, acc0))

    def dense_update_unique(carry, ids, rows):
        t, acc = carry
        scratch = jnp.zeros((Vp + M, D), jnp.float32)
        g = unique_scatter_into(scratch, ids, rows)[:Vp]
        acc = acc + g * g
        t = t - lr * g / (jnp.sqrt(acc) + eps)
        return (t, acc)

    bench("dense_update_unique", dense_update_unique, (table0, acc0))

    def sorted_update(carry, ids, rows):
        t, acc = carry
        d = dedupe_grads(ids, rows)
        g2 = d.rows * d.rows
        acc = acc.at[d.ids].add(g2, indices_are_sorted=True)
        denom = jnp.sqrt(acc[d.ids]) + eps
        t = t.at[d.ids].add(-lr * d.rows / denom, indices_are_sorted=True)
        return (t, acc)

    bench("sorted_update", sorted_update, (table0, acc0))

    def fulltable_ops(carry, ids, rows):
        t, acc = carry
        g = t * 1e-6  # stand-in for the scattered scratch: pure elementwise
        acc = acc + g * g
        t = t - lr * g / (jnp.sqrt(acc) + eps)
        return (t, acc)

    bench("fulltable_ops", fulltable_ops, (table0, acc0))


    # --- isolation variants ---------------------------------------------------
    def sort_only(t, ids, rows):
        sid, order = jax.lax.sort(
            (ids, jnp.arange(M, dtype=jnp.int32)), num_keys=1
        )
        return t.at[0].add(1e-9 * (sid[:1] + order[:1]).astype(jnp.float32))

    bench("sort_only", sort_only, table0)

    def sort_take(t, ids, rows):
        sid, order = jax.lax.sort(
            (ids, jnp.arange(M, dtype=jnp.int32)), num_keys=1
        )
        srows = jnp.take(rows, order, axis=0)
        return t.at[0].add(1e-9 * srows.sum(axis=0))

    bench("sort_take", sort_take, table0)

    def dedupe_only(t, ids, rows):
        d = dedupe_grads(ids, rows)
        return t.at[0].add(1e-9 * d.rows.sum(axis=0))

    bench("dedupe_only", dedupe_only, table0)

    ids_sorted_all = np.sort(ids_all, axis=1)

    def run_presorted(name, flag_sorted):
        def body(t, ids, rows):
            return t.at[ids].add(rows, indices_are_sorted=flag_sorted)

        # swap in pre-sorted ids for this bench
        nonlocal ids_all_jnp_src
        saved = ids_all_jnp_src
        ids_all_jnp_src = ids_sorted_all
        bench(name, body, table0)
        ids_all_jnp_src = saved

    run_presorted("scatter_presorted_hint", True)
    run_presorted("scatter_presorted_nohint", False)

    print(json.dumps({k: round(v * 1e3, 4) for k, v in results.items()}))


if __name__ == "__main__":
    main(set(sys.argv[1:]))

"""Micro-bench: big-field Adagrad update strategies + patch application.

Isolates the sparse-update portion of the full-vocab FNN step (the 2.5ms/3.2ms
hot spot found by bench_step_breakdown.py) and times each strategy as one
jitted lax.scan over T iterations (marginal 2T-vs-T protocol).

  occ/dense    — current: zeros [V,D] scratch scatter-add, full-table elementwise
  occ/sorted   — sort+segment-scan dedup, per-row gather/scatter updates
  patch/slices — current: per-field dynamic_slice/update pairs (x13 fields)
  patch/fused  — one static index vector over all small rows: gather/scatter once
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from deepctr_tpu.data import ipinyou_full_schema
from deepctr_tpu.ops.scatter import dedupe_grads
from deepctr_tpu.ops.split_embed import make_split_plan

BATCH = 8192
D = 11
T = 40
LR, EPS = 0.05, 1e-6

schema = ipinyou_full_schema()
split = make_split_plan(schema)
V = schema.padded_vocab_size
N_OCC = BATCH * len(split.big_slots)

rng = np.random.default_rng(0)


def occ_ids_for(t):
    # ids drawn from the big fields' ranges, zipf-ish duplicates
    out = []
    for f, off in zip(schema.fields, schema.offsets):
        if f.vocab_size > 8192:
            ids = off + (rng.zipf(1.3, size=BATCH) % f.vocab_size)
            out.append(ids.astype(np.int32))
    return np.stack(out, 1).reshape(-1)


occ_ids = jnp.asarray(np.stack([occ_ids_for(t) for t in range(2 * T)]))
occ_rows = jnp.asarray(rng.standard_normal((2 * T, N_OCC, D), np.float32) * 1e-3)

small_rows = sum(f.vocab for f in split.small)
small_idx = jnp.asarray(
    np.concatenate([np.arange(f.offset, f.offset + f.vocab) for f in split.small]).astype(np.int32)
)
patch_g = jnp.asarray(rng.standard_normal((2 * T, small_rows, D), np.float32) * 1e-3)


def occ_dense(table, acc, ids, rows):
    g = jnp.zeros_like(table).at[ids].add(rows)
    acc = acc + g * g
    return table - LR * g / (jnp.sqrt(acc) + EPS), acc


def occ_sorted(table, acc, ids, rows):
    d = dedupe_grads(ids, rows)
    g2 = d.rows * d.rows
    acc = acc.at[d.ids].add(g2, indices_are_sorted=True)
    denom = jnp.sqrt(acc[d.ids]) + EPS
    return table.at[d.ids].add(-LR * d.rows / denom, indices_are_sorted=True), acc


def patch_slices(table, acc, g):
    o = 0
    for f in split.small:
        gf = jax.lax.dynamic_slice(g, (o, 0), (f.vocab, D))
        acc_f = jax.lax.dynamic_slice(acc, (f.offset, 0), (f.vocab, D)) + gf * gf
        tab_f = jax.lax.dynamic_slice(table, (f.offset, 0), (f.vocab, D))
        tab_f = tab_f - LR * gf / (jnp.sqrt(acc_f) + EPS)
        acc = jax.lax.dynamic_update_slice(acc, acc_f, (f.offset, 0))
        table = jax.lax.dynamic_update_slice(table, tab_f, (f.offset, 0))
        o += f.vocab
    return table, acc


def patch_fused(table, acc, g):
    acc_s = acc[small_idx] + g * g
    tab_s = table[small_idx] - LR * g / (jnp.sqrt(acc_s) + EPS)
    acc = acc.at[small_idx].set(acc_s, indices_are_sorted=True, unique_indices=True)
    table = table.at[small_idx].set(tab_s, indices_are_sorted=True, unique_indices=True)
    return table, acc


def run(name, body, xs):
    @jax.jit
    def scan_fn(table, acc, xs_):
        def step(carry, x):
            t, a = body(carry[0], carry[1], *x)
            return (t, a), t[0, 0]

        (table, acc), out = jax.lax.scan(step, (table, acc), xs_)
        return table, acc, out

    table = jnp.zeros((V, D), jnp.float32)
    acc = jnp.zeros((V, D), jnp.float32)

    def timed(n):
        sub = jax.tree_util.tree_map(lambda x: x[:n], xs)
        t0 = time.perf_counter()
        _, _, out = scan_fn(table, acc, sub)
        np.asarray(out)
        return time.perf_counter() - t0

    timed(T); timed(2 * T)
    t1, t2 = timed(T), timed(2 * T)
    print(f"{name:14s} {(t2 - t1) / T * 1e3:7.3f} ms/step")


run("occ/dense", occ_dense, (occ_ids, occ_rows))
run("occ/sorted", occ_sorted, (occ_ids, occ_rows))
run("patch/slices", patch_slices, (patch_g,))
run("patch/fused", patch_fused, (patch_g,))

"""Serving-forward lab: where do the bf16/int8 Scorer batches spend time?

quant_gather_lab.py falsified BENCH.md's first explanation (sub-32-bit
gathers are FASTER than f32 in isolation: 13.1/10.8 vs 20.1 ns/row), so the
2-2.6x quantized-serving slowdown lives in the surrounding forward.  This lab
times the current Scorer forwards against candidate reformulations:

- bf16-early-cast: cast the small subtables to f32 once per call (~100s of
  KB) and the sorted-gathered big rows on the fly, so the one-hot einsums
  and the tower see exactly the f32-mode graph;
- int8-sorted: use the sorted-gather fast path for the big-field rows (the
  current int8 branch does two unsorted gathers) + the same early-cast.

Run: python tools/serving_lab.py   (real TPU)
"""

import functools
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = 8192
T_SMALL, T_BIG = 6, 12


def main():
    import jax
    import jax.numpy as jnp

    from deepctr_tpu.data import ipinyou_full_schema, synthetic
    from deepctr_tpu.models import MlpSpec, make_fnn
    from deepctr_tpu.ops.split_embed import (
        assemble_rows,
        gather_big_rows,
        gather_big_rows_sorted,
        make_split_plan,
        slice_small_tables,
    )

    schema = ipinyou_full_schema()
    plan = make_split_plan(schema)
    pad_id = schema.pad_id
    ds = synthetic.generate(schema, num_examples=B, k=2, seed=11)
    model = make_fnn(schema, k=10, mlp=MlpSpec(hidden=(200, 300, 100), dropout=0.5))
    params = model.init_params(jax.random.PRNGKey(0), schema)
    ids0 = jnp.asarray(ds.ids)
    dense = jax.tree_util.tree_map(jnp.asarray, params["dense"])

    t32 = jnp.asarray(params["table"], jnp.float32)
    t16 = t32.astype(jnp.bfloat16)
    scales = jnp.maximum(jnp.abs(t32).max(axis=1, keepdims=True), 1e-12) / 127.0
    t8 = jnp.clip(jnp.round(t32 / scales), -127, 127).astype(jnp.int8)

    def tower(rows, ids):
        mask = (ids != pad_id).astype(jnp.float32)
        return model.apply_rows(dense, rows, mask, train=False, rng=None)

    # ---- forwards under test ------------------------------------------------
    def fwd_f32(table, ids):
        rows = assemble_rows(
            slice_small_tables(table, plan),
            gather_big_rows_sorted(table, ids, plan)[0], ids, plan)
        return tower(rows.astype(jnp.float32), ids)

    def fwd_bf16_current(table, ids):   # Scorer's current bf16 branch
        rows = assemble_rows(
            slice_small_tables(table, plan),
            gather_big_rows_sorted(table, ids, plan)[0], ids, plan)
        return tower(rows.astype(jnp.float32), ids)

    def fwd_bf16_early(table, ids):
        small = [s.astype(jnp.float32) for s in slice_small_tables(table, plan)]
        big = gather_big_rows_sorted(table, ids, plan)[0].astype(jnp.float32)
        return tower(assemble_rows(small, big, ids, plan), ids)

    def fwd_int8_current(table, ids):   # Scorer's current int8 branch
        small = [
            q.astype(jnp.float32) * s
            for q, s in zip(slice_small_tables(table, plan),
                            slice_small_tables(scales, plan))
        ]
        big = gather_big_rows(table, ids, plan).astype(jnp.float32) \
            * gather_big_rows(scales, ids, plan)
        return tower(assemble_rows(small, big, ids, plan), ids)

    def fwd_int8_sorted(table, ids):
        small = [
            q.astype(jnp.float32) * s
            for q, s in zip(slice_small_tables(table, plan),
                            slice_small_tables(scales, plan))
        ]
        big = gather_big_rows_sorted(table, ids, plan)[0].astype(jnp.float32) \
            * gather_big_rows_sorted(scales, ids, plan)[0]
        return tower(assemble_rows(small, big, ids, plan), ids)

    # int8 with the scale packed into the row: [V, D+4] int8 where the last
    # 4 bytes are the bitcast f32 row scale -> ONE per-row gather total.
    D = t32.shape[1]
    scale_bytes = jax.lax.bitcast_convert_type(scales, jnp.int8).reshape(-1, 4)
    t8p = jnp.concatenate([t8, scale_bytes], axis=1)

    def _dequant(packed):
        q = packed[..., :D].astype(jnp.float32)
        s = jax.lax.bitcast_convert_type(packed[..., D:], jnp.float32)
        return q * s[..., None]

    def fwd_int8_packed(table, ids):
        small = [_dequant(s) for s in slice_small_tables(table, plan)]
        big = _dequant(gather_big_rows_sorted(table, ids, plan)[0])
        return tower(assemble_rows(small, big, ids, plan), ids)

    # int8 rows packed into int32 WORDS (VERDICT r2 ask #8): row = 11 int8
    # payload + 1 pad byte + 4 scale bytes = 16 bytes = [V, 4] int32, so the
    # big-field gather moves 32-bit lanes; unpack in-register after.
    pad8 = jnp.concatenate(
        [t8, jnp.zeros((t8.shape[0], 1), jnp.int8), scale_bytes], axis=1
    )  # [V, 16] int8
    t8w = jax.lax.bitcast_convert_type(
        pad8.reshape(-1, 4, 4), jnp.int32
    ).reshape(-1, 4)  # [V, 4] int32

    def _dequant_words(words):
        b = jax.lax.bitcast_convert_type(
            words.reshape(*words.shape[:-1], 4, 1), jnp.int8
        ).reshape(*words.shape[:-1], 16)
        q = b[..., :D].astype(jnp.float32)
        s = jax.lax.bitcast_convert_type(b[..., 12:], jnp.float32)
        return q * s[..., None]

    def fwd_int8_words(table, ids):
        small = [_dequant_words(s) for s in slice_small_tables(table, plan)]
        big = _dequant_words(gather_big_rows_sorted(table, ids, plan)[0])
        return tower(assemble_rows(small, big, ids, plan), ids)

    variants = [
        ("f32 (reference)", fwd_f32, t32),
        ("bf16 current", fwd_bf16_current, t16),
        ("bf16 early-cast", fwd_bf16_early, t16),
        ("int8 current", fwd_int8_current, t8),
        ("int8 sorted+early", fwd_int8_sorted, t8),
        ("int8 packed-scale", fwd_int8_packed, t8p),
        ("int8 word-packed", fwd_int8_words, t8w),
    ]
    only = sys.argv[1:]
    if only:
        variants = [v for v in variants if any(k in v[0] for k in only)]

    ref = np.asarray(fwd_f32(t32, ids0))  # eager; also the numerics oracle

    for name, fwd, table in variants:
        @jax.jit
        def loop_n(ids, n, fwd=fwd, table=table):
            def body(_, c):
                logits = fwd(table, c)
                return jnp.where(logits[0] > jnp.float32(1e30), c + 1, c)
            # dynamic trip count -> ONE compile serves both T_SMALL and T_BIG
            return jax.lax.fori_loop(0, n, body, ids)

        def run(c):
            t0 = time.perf_counter()
            o = loop_n(ids0, c)
            np.asarray(o[:1])
            return time.perf_counter() - t0

        run(T_SMALL); run(T_BIG)
        a = run(T_SMALL); b = run(T_BIG)
        per = max(b - a, 1e-9) / (T_BIG - T_SMALL)
        err = float(np.max(np.abs(ref - np.asarray(fwd(table, ids0)))))
        print(f"{name:20s} {per*1e3:7.3f} ms/batch  {B/per:12,.0f} ex/s  "
              f"max|Δlogit| vs f32 = {err:.4f}", flush=True)


if __name__ == "__main__":
    main()

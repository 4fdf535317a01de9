"""Roofline attack lab (VERDICT r2 ask #7): measured variants of the
headline full-vocab FNN train step.

BENCH.md's roofline puts the 2.98 ms step at ~84% of the composite bound,
with the two HBM-bandwidth terms (big-field gather 0.65 ms, full-table
Adagrad elementwise 0.48 ms incl. the materialized-G round trip) as the
attackable gap.  Variants, each an implemented knob (not a mock):

- f32 (baseline)          — the round-2 headline configuration;
- bf16 table              — train.table_dtype=bf16: halves the gather and
                            the elementwise's acc-independent streams;
- bf16 table + bf16 G     — SparseAdagrad(scratch_dtype="bf16"): also
                            halves the scatter's write stream and the
                            elementwise's read of G (bf16 rounding in the
                            duplicate-id accumulation — quality checked).

Each variant reports marginal ms/step (T vs 2T scan protocol, BENCH.md)
and a quality spot check (3-epoch FNN AUC on the mlp-teacher synthetic).

Run: python tools/roofline_lab.py            (real TPU)
     python tools/roofline_lab.py --quality  (also run the AUC checks)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B, T = 8192, 8
K, HIDDEN = 10, (200, 300, 100)


def bench_variant(label, table_dtype, scratch_dtype, results):
    import jax.numpy as jnp
    import optax

    from deepctr_tpu.data import ipinyou_full_schema, synthetic
    from deepctr_tpu.models import MlpSpec, make_fnn
    from deepctr_tpu.ops.split_embed import make_split_plan
    from deepctr_tpu.optim import SparseAdagrad
    from deepctr_tpu.train import init_state
    from deepctr_tpu.train.step import make_scan_train_step

    schema = ipinyou_full_schema()
    ds = synthetic.generate(schema, num_examples=B * 2 * T, k=2, seed=5)
    model = make_fnn(schema, k=K, mlp=MlpSpec(hidden=HIDDEN, dropout=0.5),
                     use_pallas=True)
    sopt = SparseAdagrad(0.05, scratch_dtype=scratch_dtype)
    dopt = optax.adagrad(0.02)
    holder = {"state": init_state(model, schema, sopt, dopt, seed=0,
                                  table_dtype=table_dtype)}
    scan_step = make_scan_train_step(model, schema, sopt, dopt,
                                     split=make_split_plan(schema))

    def run(c):
        sel = slice(0, c * B)
        batch = (
            jnp.asarray(ds.ids[sel]).reshape(c, B, -1),
            jnp.asarray(ds.labels[sel]).reshape(c, B),
            jnp.ones((c, B), jnp.float32),
        )
        float(batch[0].sum())
        t0 = time.perf_counter()
        st, losses = scan_step(holder["state"], *batch)
        np.asarray(losses)
        holder["state"] = st
        return time.perf_counter() - t0

    run(T)
    run(2 * T)
    a, b = run(T), run(2 * T)
    per = max(b - a, 1e-9) / T
    results[label] = per
    print(f"{label:28s} {per*1e3:6.2f} ms/step  {B/per:12,.0f} ex/s",
          flush=True)


def quality_check(label, table_dtype, scratch_dtype):
    import optax

    from deepctr_tpu.data import ipinyou_like_schema, synthetic
    from deepctr_tpu.models import MlpSpec, make_fnn
    from deepctr_tpu.optim import SparseAdagrad
    from deepctr_tpu.train import fit

    schema = ipinyou_like_schema()
    ds = synthetic.generate(schema, num_examples=60_000, k=4, seed=7,
                            teacher="mlp")
    n = len(ds.labels)
    tr, te = slice(0, int(0.85 * n)), slice(int(0.85 * n), n)
    model = make_fnn(schema, k=K, mlp=MlpSpec(hidden=(64, 32), dropout=0.0))
    res = fit(
        model, schema, ds.ids[tr], ds.labels[tr], ds.ids[te], ds.labels[te],
        sparse_opt=SparseAdagrad(0.05, scratch_dtype=scratch_dtype),
        dense_opt=optax.adagrad(0.02), batch_size=1024, epochs=3, seed=0,
        prefetch=False, early_stop_patience=99, table_dtype=table_dtype,
    )
    print(f"quality {label:22s} AUC {res.best_auc:.4f}", flush=True)
    return res.best_auc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quality", action="store_true")
    args = ap.parse_args()

    variants = [
        ("f32 (baseline)", "f32", "f32"),
        ("bf16 table", "bf16", "f32"),
        ("bf16 table + bf16 scratch", "bf16", "bf16"),
    ]
    results = {}
    for label, td, sd in variants:
        bench_variant(label, td, sd, results)
    if args.quality:
        aucs = {label: quality_check(label, td, sd)
                for label, td, sd in variants}
        base = aucs["f32 (baseline)"]
        for label, a in aucs.items():
            print(f"ΔAUC {label:26s} {a - base:+.4f}")


if __name__ == "__main__":
    main()

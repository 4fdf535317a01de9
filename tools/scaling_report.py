"""Generate SCALING.md: comm-volume accounting + ICI/DCN scaling predictions.

BASELINE.json:5 targets >=85% examples/s scaling efficiency from 1 to 2
hosts.  No multi-chip hardware exists in this environment, so the honest
treatment is (a) exact per-step exchange-volume accounting (closed-form in
the step's static shapes, parallel/comm.py — the capacity formula is shared
with the executing step), (b) an ICI/DCN bandwidth model on top, and (c)
validation of the accounting against the all_to_all operand buffers in the
compiled StableHLO of the actual step (wall-clock is NOT a usable validator
on the CPU mesh: its 8 "devices" share one address space, so all_to_all is
a pointer shuffle — measured ~0 marginal cost per MB).

Run: python tools/scaling_report.py          (HLO validation included)
     python tools/scaling_report.py --fast   (skip the HLO section)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the whole report runs on the virtual CPU mesh; force it BEFORE jax
# initialises a backend (the axon boot would otherwise pin the single TPU,
# collapsing the 8-device mesh and eliding every collective from the HLO)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

T_COMP_MS_DEFAULT = 2.84  # measured v5e step, B=8192 (BENCH.json fnn_full_vocab)


_WIDTH = {"f32": 4, "i32": 4, "ui32": 4, "bf16": 2, "f16": 2, "i8": 1,
          "i64": 8, "ui64": 8, "f64": 8, "i16": 2, "ui16": 2, "i1": 1}


def collective_bytes(txt: str) -> dict:
    """Per-collective operand-byte totals + op counts from StableHLO text.

    Region-carrying ops (all_reduce) put their ``: (operands) -> results``
    signature on the region-closing line, so each match scans forward to the
    first line containing the arrow; only the operand side (left of ``->``)
    is summed.  Scalar operands (``tensor<f32>``) don't match the shape
    regex and are deliberately excluded on both sides of the comparison
    (loss/weight/drop-counter psums, a few bytes)."""
    import re

    tensor_re = re.compile(r"tensor<([0-9]+(?:x[0-9]+)*)x([a-z][a-z0-9]*)>")
    ops = ("all_to_all", "all_gather", "all_reduce", "reduce_scatter",
           "collective_permute")
    out = {op: 0 for op in ops}
    counts = {op: 0 for op in ops}
    lines = txt.splitlines()
    i = 0
    while i < len(lines):
        hit = next(
            (op for op in ops if f"stablehlo.{op}" in lines[i]), None
        )
        if hit is None:
            i += 1
            continue
        j = i
        while j < len(lines) and "->" not in lines[j]:
            j += 1
        assert j < len(lines), f"no signature after {lines[i]!r}"
        left = lines[j].split("->")[0]
        # the operand signature is the LAST ': (' before the arrow —
        # attribute tensors (replica_groups dense<..> : tensor<1x8xi64>)
        # come earlier on the line and must not be counted
        sig_at = left.rfind(": (")
        if sig_at >= 0:
            left = left[sig_at:]
        got = 0
        for mt in tensor_re.finditer(left):
            dims = [int(x) for x in mt.group(1).split("x")]
            got += int(np.prod(dims)) * _WIDTH[mt.group(2)]
        out[hit] += got
        counts[hit] += 1
        i = j + 1
    out["counts"] = counts
    return out


def hlo_validation(lines):
    """Pin the accounting to the COMPILED program: lower the sharded train
    AND eval steps — without and WITH the split plan — and compare every
    collective's operand buffers in the StableHLO against comm_volume's
    closed forms (all_to_all payloads, small-field all_gathers, small-field
    + dense-tower psums).  (Wall-clock is not a usable validator on the CPU
    mesh: its 8 "devices" share one address space, so a collective is a
    pointer shuffle — measured ~0 marginal cost per MB.)"""
    import optax

    from deepctr_tpu.data import ipinyou_like_schema, synthetic
    from deepctr_tpu.models import FMModel, MlpSpec, make_fnn
    from deepctr_tpu.ops.split_embed import make_split_plan
    from deepctr_tpu.optim import SparseAdagrad
    from deepctr_tpu.parallel import (
        comm_volume,
        dense_param_bytes,
        init_sharded_state,
        make_data_mesh,
        make_sharded_eval_step,
        make_sharded_train_step,
        shard_batch_arrays,
    )

    assert len(jax.devices()) >= 8, jax.devices()
    schema = ipinyou_like_schema()
    mesh = make_data_mesh()
    sopt, dopt = SparseAdagrad(0.05), optax.adagrad(0.02)
    B = 8192
    ds = synthetic.generate(schema, num_examples=B, k=2, seed=0)
    ids_d, y_d, w_d = shard_batch_arrays(
        mesh, ds.ids, ds.labels, np.ones(B, np.float32)
    )

    lines.append("\n## Validation against the compiled program "
                 "(8-device mesh)\n")
    lines.append("Every non-scalar collective in the lowered StableHLO of "
                 "the ACTUAL steps, per-device operand bytes, accounted "
                 "(`parallel/comm.py` closed forms) vs compiled.  a2a = the "
                 "three all_to_alls (id route + row fwd + grad bwd); ag = "
                 "small-field subtable all_gathers (operand side, i.e. "
                 "result/N); psum = small-field grad + dense-tower grad "
                 "all_reduce operands (scalar psums excluded on both "
                 "sides):\n")
    lines.append("| step / config | collective | ops | accounted bytes/dev "
                 "| compiled bytes/dev | match |")
    lines.append("|---|---|---|---|---|---|")

    def check(label, txt, want_by_op, want_counts):
        got = collective_bytes(txt)
        for op, want in want_by_op.items():
            g = got[op]
            cnt = got["counts"][op]
            wc = want_counts.get(op)
            ok = g == want and (wc is None or cnt == wc)
            lines.append(
                f"| {label} | {op} | {cnt} | {want:,} | {g:,} | "
                f"{'yes' if ok else f'NO'} |"
            )
            print(f"{label} {op}: accounted {want:,} compiled {g:,} "
                  f"({cnt} ops) -> {'ok' if ok else 'MISMATCH'}")
            assert g == want, (label, op, g, want)
            if wc is not None:
                assert cnt == wc, (label, op, cnt, wc)

    def nonscalar_dense_bytes(model):
        """dense-psum bytes visible to the parser: 0-d leaves lower to
        tensor<f32> which the shape regex excludes on both sides."""
        params = model.init_params(jax.random.PRNGKey(0), schema)
        return sum(
            int(np.prod(x.shape)) * x.dtype.itemsize
            for x in jax.tree_util.tree_leaves(params["dense"])
            if getattr(x, "ndim", 0) >= 1
        )

    # ---- no split plan: FM, pure all-to-all path (3 configs) -------------
    model = FMModel(k=10)
    state = init_sharded_state(model, schema, sopt, dopt, mesh, seed=0)
    db_fm = nonscalar_dense_bytes(model)
    for label, cf, dtype, xb in (("train FM no-split cf=2.0 f32", 2.0, "f32", 4),
                                 ("train FM no-split cf=1.0 f32", 1.0, "f32", 4),
                                 ("train FM no-split cf=2.0 bf16", 2.0, "bf16", 2)):
        step = make_sharded_train_step(
            model, schema, sopt, dopt, mesh, capacity_factor=cf,
            exchange_dtype=dtype,
        )
        txt = jax.jit(lambda s, i, y, w: step(s, i, y, w)).lower(
            state, ids_d, y_d, w_d
        ).as_text()
        v = comm_volume(schema, B // 8, 8, cf, split=None,
                        dense_param_bytes=db_fm, exchange_bytes=xb)
        check(label, txt,
              {"all_to_all": v.ids_a2a + v.rows_a2a_fwd + v.rows_a2a_bwd,
               "all_gather": 0,
               "all_reduce": v.dense_psum},
              {"all_to_all": 3, "all_gather": 0})

    # ---- WITH the split plan: FNN tower, small-field ag/psum terms -------
    split = make_split_plan(schema)
    model = make_fnn(schema, k=10, mlp=MlpSpec(hidden=(64, 32), dropout=0.0))
    state = init_sharded_state(model, schema, sopt, dopt, mesh, seed=0)
    db = nonscalar_dense_bytes(model)
    n_small = len(split.small)
    for label, cf, xb in (("train FNN split cf=2.0 f32", 2.0, 4),
                          ("train FNN split cf=1.25 bf16", 1.25, 2)):
        step = make_sharded_train_step(
            model, schema, sopt, dopt, mesh, capacity_factor=cf,
            split=split, exchange_dtype="bf16" if xb == 2 else "f32",
        )
        txt = jax.jit(lambda s, i, y, w: step(s, i, y, w)).lower(
            state, ids_d, y_d, w_d
        ).as_text()
        v = comm_volume(schema, B // 8, 8, cf, split=split,
                        dense_param_bytes=db, exchange_bytes=xb)
        check(label, txt,
              {"all_to_all": v.ids_a2a + v.rows_a2a_fwd + v.rows_a2a_bwd,
               # compiled all_gather records the operand (= result / N)
               "all_gather": v.small_allgather // 8,
               "all_reduce": v.small_psum + v.dense_psum},
              {"all_to_all": 3, "all_gather": n_small})

    # ---- eval steps: forward-only inventory (2 configs) ------------------
    for label, sp in (("eval FNN split cf=2.0 f32", split),
                      ("eval FNN no-split cf=2.0 f32", None)):
        estep = make_sharded_eval_step(model, schema, mesh,
                                       capacity_factor=2.0, split=sp)
        txt = jax.jit(lambda t, d, i: estep(t, d, i)).lower(
            state.table, state.dense, ids_d
        ).as_text()
        v = comm_volume(schema, B // 8, 8, 2.0, split=sp,
                        dense_param_bytes=0, exchange_bytes=4)
        check(label, txt,
              {"all_to_all": v.ids_a2a + v.rows_a2a_fwd,  # no grad leg
               "all_gather": (v.small_allgather // 8) if sp else 0,
               "all_reduce": 0},
              {"all_to_all": 2,
               "all_gather": n_small if sp else 0,
               "all_reduce": 0})
    lines.append("")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--t-comp-ms", type=float, default=None,
                    help="measured single-chip ms/step at B=8192 "
                    "(default: BENCH.json fnn_full_vocab)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.md"))
    args = ap.parse_args()

    from deepctr_tpu.data import ipinyou_full_schema
    from deepctr_tpu.models import MlpSpec, make_fnn
    from deepctr_tpu.ops.split_embed import make_split_plan
    from deepctr_tpu.parallel import (
        comm_volume,
        dense_param_bytes,
        predict_scaling,
    )

    t_comp = args.t_comp_ms
    if t_comp is None:
        import json

        bench = os.path.join(os.path.dirname(args.out), "BENCH.json")
        t_comp = T_COMP_MS_DEFAULT
        if os.path.exists(bench):
            with open(bench) as f:
                r = json.load(f)
            if "train_examples_per_s/fnn_full_vocab" in r:
                t_comp = 8192 / r["train_examples_per_s/fnn_full_vocab"] * 1e3

    schema = ipinyou_full_schema()
    split = make_split_plan(schema)
    model = make_fnn(schema, k=10, mlp=MlpSpec(hidden=(200, 300, 100)))
    db = dense_param_bytes(model, schema)

    lines = []
    lines.append("# SCALING — multi-chip exchange accounting & predicted "
                 "efficiency\n")
    lines.append(
        "Contract: BASELINE.json:5 targets >=85% examples/s weak-scaling "
        "efficiency 1 -> 2 hosts.  This environment has ONE chip, so the "
        "treatment is quantitative: every byte the sharded step exchanges "
        "is accounted in closed form (`parallel/comm.py` — the capacity "
        "formula is IMPORTED by the executing step, so accounting and "
        "execution cannot drift; tests/test_comm.py pins the algebra and "
        "the claims below), combined with interconnect bandwidths into "
        "predicted efficiency, and validated against the all_to_all buffers in the compiled StableHLO of "
        "the actual step on the 8-device CPU mesh.\n")
    lines.append("**Assumptions** (parameters of `predict_scaling`, not "
                 "hidden constants):\n")
    lines.append("- ICI: Cloud TPU v5e lists 1600 Gbps aggregate interchip "
                 "bandwidth per chip -> 200 GB/s, derated to 80%.")
    lines.append("- DCN: one 200 Gbps NIC per host shared by 8 chips -> "
                 "25 GB/s, derated to 80%.")
    lines.append("- Weak scaling: per-chip batch fixed at 8192; compute per "
                 f"chip = measured single-chip step, {t_comp:.2f} ms "
                 "(BENCH.json).")
    lines.append("- all_to_all DCN traffic is per-pair (irreducible id "
                 "routing); psum/all_gather are hierarchical (intra-host "
                 "ICI reduce first, then ~2x/~1x the operand per HOST over "
                 "DCN — what XLA does on host x chip meshes).")
    lines.append("- `efficiency_no_overlap` serializes comm after compute "
                 "(pessimistic floor); `efficiency_overlapped` assumes "
                 "perfect overlap (ceiling). Real runs land between.\n")

    vol = comm_volume(schema, 8192, 16, 2.0, split=split,
                      dense_param_bytes=db)
    lines.append("## Per-step exchange inventory (headline config: "
                 "full-iPinYou FNN, split plan, B=8192/chip, 16 chips, "
                 "capacity_factor=2.0, f32 wire)\n")
    lines.append(vol.table())
    lines.append(f"\nPer-example wire traffic: "
                 f"{vol.bytes_per_example:.0f} bytes/example/device.\n")

    lines.append("## Single-host ICI scaling (chips on one host)\n")
    lines.append("| chips | wire bytes/dev/step | t_ici (ms) | efficiency "
                 "(no overlap) |")
    lines.append("|---|---|---|---|")
    for n in (2, 4, 8):
        v = comm_volume(schema, 8192, n, 2.0, split=split,
                        dense_param_bytes=db)
        pt = predict_scaling(v, t_comp, n_hosts=1)
        lines.append(f"| {n} | {v.total_wire:,} | {pt.t_ici_ms:.3f} | "
                     f"{pt.efficiency_no_overlap:.1%} |")
    lines.append("\nICI is never the constraint at this model shape: the "
                 "whole exchange is a few MB against 160 GB/s.\n")

    lines.append("## Two hosts (8+8 chips) over DCN — the contract point\n")
    lines.append("| config | wire/dev | DCN bytes/host/step | t_dcn (ms) | "
                 "eff (no overlap) | eff (overlapped) |")
    lines.append("|---|---|---|---|---|---|")
    grid = [
        ("default: cf=2.0, f32 wire", 2.0, 4),
        ("cf=1.25, f32 wire", 1.25, 4),
        ("cf=2.0, bf16 wire", 2.0, 2),
        ("**recommended: cf=1.25, bf16 wire**", 1.25, 2),
    ]
    eff_floor = {}
    for label, cf, xb in grid:
        v = comm_volume(schema, 8192, 16, cf, split=split,
                        dense_param_bytes=db, exchange_bytes=xb)
        pt = predict_scaling(v, t_comp, n_hosts=2, chips_per_host=8)
        eff_floor[label] = pt.efficiency_no_overlap
        lines.append(
            f"| {label} | {v.total_wire/1e6:.2f} MB | "
            f"{pt.dcn_bytes_per_host/1e6:.2f} MB | {pt.t_dcn_ms:.3f} | "
            f"{pt.efficiency_no_overlap:.1%} | "
            f"{pt.efficiency_overlapped:.1%} |")
    lines.append(
        "\n**Reading**: the row/grad all_to_all of the big embedding fields "
        "dominates the DCN cross-section (the psum/all_gather terms are "
        "hierarchical and cheap).  Two knobs move it, both implemented and "
        "tested:\n")
    lines.append("- `train.capacity_factor` (default 2.0) directly scales "
                 "the exchange payload; 1.25 still leaves 25% headroom over "
                 "a perfectly balanced shard assignment (drops are counted "
                 "and reported if exceeded).")
    lines.append("- `train.exchange_dtype=bf16` halves the dominant payload "
                 "by casting rows/grads on the wire only (gather -> cast -> "
                 "exchange -> restore; duplicate-id accumulation stays f32; "
                 "trajectory agreement gated in "
                 "tests/test_parallel.py::test_sharded_bf16_exchange_close_to_f32).")
    lines.append("- `train.split_threshold` keeps small fields OFF the "
                 "exchange entirely (all-gathered subtables); without the "
                 "split plan the all_to_all payload grows 6x (18 slots vs "
                 "3 big ones — see tests/test_comm.py).\n")
    rec = eff_floor["**recommended: cf=1.25, bf16 wire**"]
    dfl = eff_floor["default: cf=2.0, f32 wire"]
    lines.append(
        f"**Conclusion**: the defendable number is the ZERO-OVERLAP floor "
        f"of the recommended recipe (cf=1.25 + bf16 wire): "
        f"**{rec:.1%}** at 2 hosts, which meets the >=85% BASELINE target "
        f"without assuming any comm/compute overlap.  The default config "
        f"(cf=2.0, f32 wire) predicts only {dfl:.1%} under the same floor — "
        f"it MISSES the target unless the recipe is applied.  The "
        f"'eff (overlapped)' column is a perfect-overlap CEILING that no "
        f"measurement in this one-chip environment supports; real runs land "
        f"between floor and ceiling.  All of this is model-predicted from "
        f"validated per-step volumes; hardware validation awaits a "
        f"multi-chip environment.\n")

    if not args.fast:
        hlo_validation(lines)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from deepctr_tpu.utils.artifacts import protocol_stamp

    lines.append(f"\nGenerated by tools/scaling_report.py at {time.ctime()} "
                 f"(t_comp={t_comp:.2f} ms from BENCH.json). "
                 f"{protocol_stamp('tools/scaling_report.py')}\n")
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

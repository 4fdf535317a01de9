"""Measure AUC/logloss parity vs the reference reproduction over seeds.

BASELINE.md measurement plan: the reference mount was empty and it publishes
no numbers, so parity is defined against the NumPy-faithful reproduction
(deepctr_tpu/reference_impl) trained on the same data.  This tool trains
both sides over N seeds and writes PARITY.md with mean ± std and the delta.

Usage:  python tools/parity_report.py [--seeds 3] [--examples 100000]
        [--out PARITY.md]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(seeds: int, examples: int, out_path: str,
        models: tuple = ("lr", "fm", "fnn", "snn_dae", "snn_rbm")) -> None:
    import jax
    import optax

    # parity is a MATH-equivalence protocol: pin f32 matmuls to full
    # precision so TPU default-precision (bf16-pass) rounding cannot
    # confound implementation parity (measured: the matched-noise SNN row
    # drifts ~0.002 AUC at DEFAULT precision from rounding alone)
    jax.config.update("jax_default_matmul_precision", "highest")

    from deepctr_tpu.data import ipinyou_like_schema, synthetic
    from deepctr_tpu.models import (
        DaePretrainer,
        FMModel,
        LRModel,
        MlpSpec,
        RbmPretrainer,
        SNNModel,
        make_fnn,
    )
    from deepctr_tpu.optim import SparseSgd
    from deepctr_tpu.reference_impl import (
        NumpyDae,
        NumpyFM,
        NumpyFNN,
        NumpyLR,
        NumpyRbm,
        NumpySnn,
        train_numpy_model,
    )
    from deepctr_tpu.train import fit, pretrain_snn
    from deepctr_tpu.utils.metrics import exact_auc, logloss

    schema = ipinyou_like_schema()
    ds = synthetic.generate(schema, num_examples=examples, k=4, seed=1234)
    n = ds.ids.shape[0]
    tr, te = slice(0, int(0.85 * n)), slice(int(0.85 * n), n)
    bayes_auc = exact_auc(ds.labels[te], ds.bayes_logits[te])

    def sig(x):
        return 1.0 / (1.0 + np.exp(-np.clip(x, -30, 30)))

    # settings chosen so every model learns well clear of chance
    # (AUC ~0.74 against a 0.81 Bayes ceiling); parity at near-chance
    # AUC would be vacuous
    lr_, k, B, epochs = 0.3, 10, 512, 8
    # SNN geometry/pretraining knobs (paper-shaped; SURVEY.md §2.3 SNN row)
    h1, snn_hidden, pre_lr, pre_epochs, pre_m = 200, (300, 100), 0.1, 2, 2
    def finetune_ours_snn(table0, b10, init_layers, seed):
        """Our supervised SNN phase from explicit (table, b1, MLP init)."""
        import jax.numpy as jnp

        from deepctr_tpu.train import init_state

        model = SNNModel(hidden1=h1,
                         mlp=MlpSpec(hidden=snn_hidden, dropout=0.0))
        state = init_state(model, schema, SparseSgd(lr_), optax.sgd(lr_),
                           seed=seed)
        layers = [
            {"w": jnp.asarray(np.asarray(W, np.float32).copy()),
             "b": jnp.asarray(np.asarray(bb, np.float32).copy())}
            for W, bb in init_layers
        ]
        dense = {"b1": jnp.asarray(np.asarray(b10, np.float32).copy()),
                 "mlp": {"layers": layers}}
        state = state._replace(
            table=jnp.asarray(np.asarray(table0, np.float32).copy()),
            dense=dense,
        )
        res = fit(
            model, schema, ds.ids[tr], ds.labels[tr], ds.ids[te],
            ds.labels[te], sparse_opt=SparseSgd(lr_), dense_opt=optax.sgd(lr_),
            batch_size=B, epochs=epochs, seed=seed, prefetch=False,
            early_stop_patience=99, state=state,
        )
        last = res.history[-1]
        return last["auc"], last["logloss"]

    def snn_rows(name):
        """Three tight comparisons instead of one noisy one (see protocol):

        1. <name> supervised: matched pretrain+init on both sides — the
           fine-tune trainers must agree essentially exactly (measured
           ±0.0000 over seeds; any real semantic gap would show here);
        2. <name> pretrain-matched: our jax pretraining runs from the
           oracle's initial table with the oracle's EXACT uniform draws
           (the noise= hook, trajectory-equality gated by
           tests/test_pretrain.py) — the two FULL pipelines, everything
           matched, must agree within the 0.002 band;
        3. <name> pretrain-swap: our jax pretraining with its own jax
           RNG stream under a SHARED trainer+init — the delta reflects
           only the pretraining draw (different streams by construction),
           so its band is the independent-difference envelope
           2*sqrt(σ_ref² + σ_ours²)/√seeds.
        """
        import jax.numpy as jnp

        from deepctr_tpu.models import init_pretrain_dense
        from deepctr_tpu.train.step import make_pretrain_step

        pre_cls = NumpyDae if name == "snn_dae" else NumpyRbm
        pretrainer = (DaePretrainer(m=pre_m) if name == "snn_dae"
                      else RbmPretrainer(m=pre_m))
        F = schema.num_fields
        acc = {k: ([], []) for k in ("ref", "sup", "mat", "swp")}
        for seed in range(seeds):
            pre = pre_cls(schema, hidden1=h1, m=pre_m, lr=pre_lr, seed=seed)
            table0_pre = pre.table.copy()
            noise_rng = np.random.default_rng(9000 + seed)
            batches = []  # (ids, noise) — replayed into the jax pretrainer
            nb = (tr.stop // B) * B
            for ep in range(pre_epochs):
                order = np.random.default_rng(seed + ep).permutation(tr.stop)
                for s in range(0, nb, B):
                    ids_b = ds.ids[order[s : s + B]]
                    if name == "snn_dae":
                        noise = {
                            "u_keep": noise_rng.random(
                                (B, schema.num_slots), dtype=np.float32),
                            "u_neg": noise_rng.random(
                                (B, F, pre_m), dtype=np.float32),
                        }
                    else:
                        noise = {
                            "u_neg": noise_rng.random(
                                (B, F, pre_m), dtype=np.float32),
                            "u_h0": noise_rng.random(
                                (B, h1), dtype=np.float32),
                        }
                    batches.append((ids_b, noise))
                    pre.train_batch(ids_b, noise=noise)
            ref = NumpySnn(schema, hidden1=h1, hidden=snn_hidden, lr=lr_,
                           seed=seed, table=pre.table, b1=pre.b1)
            init_layers = [(W.copy(), b.copy()) for W, b in ref.layers]
            train_numpy_model(ref, ds.ids[tr], ds.labels[tr], batch_size=B,
                              epochs=epochs, seed=seed)
            p = sig(ref.forward(ds.ids[te]))
            acc["ref"][0].append(exact_auc(ds.labels[te], p))
            acc["ref"][1].append(logloss(ds.labels[te], p))

            # (1) supervised: our fine-tune from the oracle's pretrain output
            a, l = finetune_ours_snn(pre.table, pre.b1, init_layers, seed)
            acc["sup"][0].append(a)
            acc["sup"][1].append(l)

            # (2) matched: our jax pretraining replays the oracle's exact
            # draws from the oracle's initial table, then our fine-tune
            import jax as _jax

            sopt_pre = SparseSgd(pre_lr)
            tbl = jnp.asarray(table0_pre)
            dense_pre = init_pretrain_dense(schema, h1)
            sstate = sopt_pre.init(tbl)
            pstep = make_pretrain_step(pretrainer, schema, sopt_pre,
                                       dense_lr=pre_lr, with_noise=True)
            prng = _jax.random.PRNGKey(seed)
            for ids_b, noise in batches:
                tbl, sstate, dense_pre, prng, _ = pstep(
                    tbl, sstate, dense_pre, prng, jnp.asarray(ids_b),
                    {k: jnp.asarray(v) for k, v in noise.items()},
                )
            a, l = finetune_ours_snn(np.asarray(tbl),
                                     np.asarray(dense_pre["b1"]),
                                     init_layers, seed)
            acc["mat"][0].append(a)
            acc["mat"][1].append(l)

            # (3) swap: our jax pretraining with its own jax RNG stream
            t2, b12 = pretrain_snn(
                pretrainer, schema, h1, ds.ids[tr],
                sparse_opt=SparseSgd(pre_lr), dense_lr=pre_lr,
                batch_size=B, epochs=pre_epochs, seed=seed,
            )
            a, l = finetune_ours_snn(np.asarray(t2), np.asarray(b12),
                                     init_layers, seed)
            acc["swp"][0].append(a)
            acc["swp"][1].append(l)
        out = []
        ref_a, ref_l = acc["ref"]
        for label, key in ((f"{name} supervised", "sup"),
                           (f"{name} pretrain-matched", "mat"),
                           (f"{name} pretrain-swap", "swp")):
            oa, ol = acc[key]
            out.append((label, np.mean(ref_a), np.std(ref_a), np.mean(oa),
                        np.std(oa), np.mean(oa) - np.mean(ref_a),
                        np.mean(ref_l), np.mean(ol)))
            print(f"{label}: ref {out[-1][1]:.4f}±{out[-1][2]:.4f}  "
                  f"ours {out[-1][3]:.4f}±{out[-1][4]:.4f}  "
                  f"Δ {out[-1][5]:+.4f}")
        return out

    rows = []
    for name in models:
        if name in ("snn_dae", "snn_rbm"):
            rows.extend(snn_rows(name))
            continue
        ours_auc, ours_ll, ref_auc, ref_ll = [], [], [], []
        for seed in range(seeds):
            # ---- reference reproduction
            if name == "lr":
                ref = NumpyLR(schema, lr=lr_, seed=seed)
            elif name == "fm":
                ref = NumpyFM(schema, k=k, lr=lr_, seed=seed)
            else:
                fm0 = NumpyFM(schema, k=k, lr=lr_, seed=seed)
                train_numpy_model(
                    fm0, ds.ids[tr], ds.labels[tr], batch_size=B, epochs=3, seed=seed
                )
                ref = NumpyFNN(
                    schema, k=k, hidden=(200, 300, 100), lr=lr_, seed=seed,
                    fm_table=fm0.table,
                )
            train_numpy_model(
                ref, ds.ids[tr], ds.labels[tr], batch_size=B, epochs=epochs, seed=seed
            )
            p = sig(ref.forward(ds.ids[te]))
            ref_auc.append(exact_auc(ds.labels[te], p))
            ref_ll.append(logloss(ds.labels[te], p))

            # ---- ours (same SGD optimizer family for apples-to-apples)
            if name == "lr":
                model = LRModel()
                state = None
            elif name == "fm":
                model = FMModel(k=k)
                state = None
            else:
                import jax

                from deepctr_tpu.train import init_state
                from deepctr_tpu.utils.checkpoint import init_fnn_from_fm

                fmm = FMModel(k=k)
                res_fm = fit(
                    fmm, schema, ds.ids[tr], ds.labels[tr], ds.ids[te], ds.labels[te],
                    sparse_opt=SparseSgd(lr_), dense_opt=optax.sgd(lr_),
                    batch_size=B, epochs=3, seed=seed, prefetch=False,
                    early_stop_patience=99,
                )
                model = make_fnn(
                    schema, k=k,
                    mlp=MlpSpec(hidden=(200, 300, 100), dropout=0.0),
                )
                state = init_state(model, schema, SparseSgd(lr_), optax.sgd(lr_),
                                   seed=seed)
                params = init_fnn_from_fm(
                    {"table": state.table, "dense": state.dense}, res_fm.state.table
                )
                state = state._replace(table=params["table"])
            res = fit(
                model, schema, ds.ids[tr], ds.labels[tr], ds.ids[te], ds.labels[te],
                sparse_opt=SparseSgd(lr_),
                dense_opt=optax.sgd(lr_),
                batch_size=B, epochs=epochs, seed=seed, prefetch=False,
                early_stop_patience=99, state=state,
            )
            last = res.history[-1]
            ours_auc.append(last["auc"])
            ours_ll.append(last["logloss"])
        rows.append(
            (name, np.mean(ref_auc), np.std(ref_auc), np.mean(ours_auc),
             np.std(ours_auc), np.mean(ours_auc) - np.mean(ref_auc),
             np.mean(ref_ll), np.mean(ours_ll))
        )
        print(f"{name}: ref {rows[-1][1]:.4f}±{rows[-1][2]:.4f}  "
              f"ours {rows[-1][3]:.4f}±{rows[-1][4]:.4f}  Δ {rows[-1][5]:+.4f}")

    with open(out_path, "w") as f:
        f.write("# PARITY — deepctr_tpu vs reference reproduction\n\n")
        f.write(
            f"Protocol: SURVEY.md §0/§6 — the reference mount was empty, so the "
            f"oracle is the NumPy-faithful reproduction of the reference's "
            f"training procedure (deepctr_tpu/reference_impl). Synthetic "
            f"iPinYou-shaped data, {examples} examples, {seeds} seeds, "
            f"{epochs} epochs, SGD. SNN ({pre_epochs} pretrain epochs, "
            f"m={pre_m}, lr={pre_lr}, hidden1={h1}) decomposes into "
            f"three tight comparisons because one end-to-end comparison is "
            f"noise-bound (per-seed SNN AUC spread ~±0.005 from the "
            f"pretraining RNG draw alone — streams are host-NumPy on the "
            f"reference side and jax.random on ours by construction): "
            f"'supervised' matches pretrain output + MLP init + batch "
            f"order on both sides, so the fine-tune trainers must agree "
            f"essentially exactly; 'pretrain-matched' replays the oracle's "
            f"EXACT uniform draws through OUR jax pretrainer from the "
            f"oracle's initial table (the noise= hook; step-level "
            f"trajectory equality is separately CI-gated in "
            f"tests/test_pretrain.py), so the two full pipelines must "
            f"agree within the 0.002 band; 'pretrain-swap' substitutes "
            f"OUR jax pretraining with its own RNG stream under a shared "
            f"trainer+init — its delta measures only draw luck and its "
            f"band is the independent-difference envelope "
            f"2·sqrt(σ_ref²+σ_ours²)/√seeds rather than 0.002. "
            f"Bayes-ceiling AUC of the planted model: "
            f"{bayes_auc:.4f}. Target band: |Δ AUC| ≤ 0.002 "
            f"(BASELINE.json:5). All jax-side runs execute with "
            f"jax_default_matmul_precision=highest — parity measures "
            f"implementation semantics, not TPU default-precision matmul "
            f"rounding.\n\n"
        )
        f.write("| model | ref AUC (±σ) | ours AUC (±σ) | Δ AUC | band | ok "
                "| ref logloss | ours logloss |\n|---|---|---|---|---|---|"
                "---|---|\n")
        n_bad = 0
        for r in rows:
            # acceptance band declared PER ROW so the table can be checked
            # against itself (tests/test_artifacts.py): matched-everything
            # comparisons carry the BASELINE.json:5 ±0.002 band; the
            # pretrain-swap rows compare different RNG draws by construction,
            # so their band is the 2σ/√seeds seed-noise envelope.
            if "pretrain-swap" in r[0]:
                # difference of INDEPENDENT means (the two pretraining draws
                # share nothing): 2·sqrt(σ_ref² + σ_ours²)/√seeds
                band = max(0.002,
                           2.0 * float(np.hypot(r[2], r[4])) / np.sqrt(seeds))
            else:
                band = 0.002
            ok = abs(r[5]) <= band
            n_bad += not ok
            f.write(
                f"| {r[0].upper()} | {r[1]:.4f} ± {r[2]:.4f} | {r[3]:.4f} ± "
                f"{r[4]:.4f} | {r[5]:+.4f} | {band:.4f} | "
                f"{'yes' if ok else 'NO'} | {r[6]:.4f} | {r[7]:.4f} |\n"
            )
        from deepctr_tpu.utils.artifacts import protocol_stamp

        f.write(f"\nGenerated by tools/parity_report.py at {time.ctime()}. "
                f"{protocol_stamp('tools/parity_report.py')}\n")
    print(f"wrote {out_path}" + (f" ({n_bad} row(s) OUT OF BAND)" if n_bad
                                 else " (all rows in band)"))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--examples", type=int, default=40_000)
    ap.add_argument("--models", default="lr,fm,fnn,snn_dae,snn_rbm",
                    help="comma list (diagnostic runs on a subset)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PARITY.md"))
    args = ap.parse_args()
    run(args.seeds, args.examples, args.out,
        models=tuple(m.strip() for m in args.models.split(",") if m.strip()))

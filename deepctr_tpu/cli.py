"""CLI entry point: ``python -m deepctr_tpu.cli --config configs/fnn.json``.

The TPU-native replacement of the reference's entry layer (SURVEY.md §1:
``python <Model>.py`` with constants edited in-file).  One binary, config
driven, covering the full model family including the two-phase flows
(FM -> FNN init, DAE/RBM pretrain -> SNN fine-tune) and the sharded
multi-device path.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys

import numpy as np


def build_model(cfg, schema):
    from .models import FMModel, LRModel, MlpSpec, SNNModel, make_deepfm, make_fnn

    m = cfg.model
    if m.name == "lr":
        return LRModel()
    if m.name == "fm":
        return FMModel(k=m.k, init_sigma=m.init_sigma, use_pallas=m.use_pallas)
    if m.name == "fnn":
        return make_fnn(
            schema,
            k=m.k,
            mlp=MlpSpec(hidden=tuple(m.hidden), activation=m.activation,
                        dropout=m.dropout),
            init_sigma=m.init_sigma,
            use_pallas=m.use_pallas,
        )
    if m.name == "deepfm":
        return make_deepfm(
            schema,
            k=m.k,
            mlp=MlpSpec(hidden=tuple(m.hidden), activation=m.activation,
                        dropout=m.dropout),
            init_sigma=m.init_sigma,
            use_pallas=m.use_pallas,
        )
    if m.name == "snn":
        return SNNModel(
            hidden1=m.hidden1,
            mlp=MlpSpec(hidden=tuple(m.hidden), activation=m.activation,
                        dropout=m.dropout),
            init_sigma=m.init_sigma,
            use_pallas=m.use_pallas,
        )
    raise ValueError(f"unknown model {m.name!r} (lr|fm|fnn|snn|deepfm)")


def build_optimizers(cfg):
    import optax

    from .optim import make_sparse_optimizer

    sparse = make_sparse_optimizer(cfg.optim.sparse, cfg.optim.sparse_lr)
    dense_factory = getattr(optax, cfg.optim.dense, None)
    if dense_factory is None:
        raise ValueError(f"unknown optax optimizer {cfg.optim.dense!r}")
    return sparse, dense_factory(cfg.optim.dense_lr)


def load_data(cfg):
    """Returns (schema, train_ids, train_labels, test_ids, test_labels)."""
    from .data import Schema, ipinyou_like_schema, synthetic
    from .data.cache import cache_yx_file, read_cache

    d = cfg.data
    if d.schema_path:
        with open(d.schema_path) as f:
            schema = Schema.from_json(f.read())
    else:
        schema = ipinyou_like_schema()

    if d.train_path is None:
        ds = synthetic.generate(
            schema, num_examples=d.synthetic_examples, seed=d.synthetic_seed
        )
        n = ds.ids.shape[0]
        cut = int(n * (1 - d.test_fraction))
        return schema, ds.ids[:cut], ds.labels[:cut], ds.ids[cut:], ds.labels[cut:]

    def read(path):
        if d.use_cache:
            return read_cache(
                cache_yx_file(path, schema, use_native=d.use_native_parser)
            )[:2]
        from .data import parser

        labels, ids = parser.parse_yx_file(path, schema)
        return ids, labels

    tr_ids, tr_labels = read(d.train_path)
    if d.test_path:
        te_ids, te_labels = read(d.test_path)
    else:
        n = tr_ids.shape[0]
        cut = int(n * (1 - d.test_fraction))
        tr_ids, te_ids = tr_ids[:cut], tr_ids[cut:]
        tr_labels, te_labels = tr_labels[:cut], tr_labels[cut:]
    return schema, tr_ids, tr_labels, te_ids, te_labels


def run(cfg) -> dict:
    import jax

    if cfg.train.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if cfg.train.distributed:
        # multi-host: each host runs this same program; the runtime wires
        # ICI within a slice and DCN across hosts (SURVEY.md §2.4/§5 comm
        # rows). Single-host invocation is a no-op failure we tolerate.
        try:
            jax.distributed.initialize()
        except Exception as e:  # not in a multi-host env
            print(f"jax.distributed.initialize() skipped: {e}")

    from .train import fit, init_state, pretrain_snn
    from .utils.checkpoint import (
        init_fnn_from_fm,
        init_snn_from_pretrain,
        load_fm_embeddings,
        save_train_state,
    )
    from .utils.logging import MetricsLogger

    schema, tr_ids, tr_labels, te_ids, te_labels = load_data(cfg)
    model = build_model(cfg, schema)
    sparse_opt, dense_opt = build_optimizers(cfg)
    logger = MetricsLogger(cfg.train.metrics_path, echo=True)

    state = init_state(
        model, schema, sparse_opt, dense_opt, seed=cfg.train.seed
    )
    resumed = False
    if (
        cfg.train.resume
        and cfg.train.checkpoint_path
        and __import__("os").path.exists(cfg.train.checkpoint_path)
    ):
        from .utils.checkpoint import load_train_state

        state = load_train_state(cfg.train.checkpoint_path, state)
        resumed = True
        logger.log({"event": "resumed", "path": cfg.train.checkpoint_path,
                    "step": int(state.step)})

    # two-phase flows (skipped when resuming: the checkpoint already
    # contains the initialised/fine-tuned tables)
    if not resumed and cfg.model.name == "fnn" and cfg.model.init_from:
        fm_table = load_fm_embeddings(cfg.model.init_from)
        params = init_fnn_from_fm(
            {"table": state.table, "dense": state.dense}, fm_table
        )
        state = state._replace(table=params["table"])
        logger.log({"event": "init_from_fm", "path": cfg.model.init_from})
    if not resumed and cfg.model.name == "snn" and cfg.train.pretrain:
        from .models import DaePretrainer, RbmPretrainer

        pre = (
            DaePretrainer(m=cfg.train.pretrain_m,
                          corruption=cfg.train.pretrain_corruption)
            if cfg.train.pretrain == "dae"
            else RbmPretrainer(m=cfg.train.pretrain_m)
        )
        table, b1 = pretrain_snn(
            pre,
            schema,
            cfg.model.hidden1,
            tr_ids,
            sparse_opt=sparse_opt,
            dense_lr=cfg.train.pretrain_lr,
            batch_size=cfg.train.batch_size,
            epochs=cfg.train.pretrain_epochs,
            seed=cfg.train.seed,
            logger=logger,
        )
        params = init_snn_from_pretrain(
            {"table": state.table, "dense": state.dense}, table, b1
        )
        state = state._replace(table=params["table"], dense=params["dense"])
        logger.log({"event": "init_from_pretrain", "kind": cfg.train.pretrain})

    if cfg.train.profile_dir:
        jax.profiler.start_trace(cfg.train.profile_dir)
    if cfg.train.sharded:
        result = _run_sharded(
            cfg, model, schema, sparse_opt, dense_opt,
            tr_ids, tr_labels, te_ids, te_labels, logger, state
        )
    else:
        def on_epoch(epoch, st, rec):
            # heartbeat + periodic checkpoint (restart-from-checkpoint
            # fault tolerance, SURVEY.md §5)
            logger.log({"event": "heartbeat", "epoch": epoch,
                        "step": int(st.step)})
            if (
                cfg.train.checkpoint_path
                and (epoch + 1) % max(cfg.train.checkpoint_every, 1) == 0
            ):
                save_train_state(cfg.train.checkpoint_path, st)

        res = fit(
            model,
            schema,
            tr_ids,
            tr_labels,
            te_ids,
            te_labels,
            sparse_opt=sparse_opt,
            dense_opt=dense_opt,
            batch_size=cfg.train.batch_size,
            epochs=cfg.train.epochs,
            l2=cfg.optim.l2,
            seed=cfg.train.seed,
            early_stop_patience=cfg.train.early_stop_patience,
            lr_decay=cfg.train.lr_decay,
            scan_steps=cfg.train.scan_steps,
            split_threshold=cfg.train.split_threshold,
            state=state,
            logger=logger,
            prefetch=cfg.train.prefetch,
            on_epoch=on_epoch,
        )
        if cfg.train.checkpoint_path:
            save_train_state(cfg.train.checkpoint_path, res.state)
            if cfg.model.name == "fm":
                from .utils.checkpoint import save_fm_embeddings

                save_fm_embeddings(
                    cfg.train.checkpoint_path + ".fm_table", res.state.table
                )
        result = {"best_auc": res.best_auc, "best_epoch": res.best_epoch,
                  "history": res.history}
    if cfg.train.profile_dir:
        jax.profiler.stop_trace()
    logger.log({"event": "done", "best_auc": result["best_auc"]})
    logger.close()
    return result


def _run_sharded(cfg, model, schema, sparse_opt, dense_opt,
                 tr_ids, tr_labels, te_ids, te_labels, logger, _state):
    """Sharded training loop (row-sharded tables over the device mesh)."""
    import time

    from .data.pipeline import minibatches
    from .parallel import (
        init_sharded_state,
        make_data_mesh,
        make_sharded_eval_step,
        make_sharded_train_step,
        shard_batch_arrays,
    )
    from .utils import metrics as M

    from .ops.split_embed import make_split_plan

    split = (
        make_split_plan(schema, cfg.train.split_threshold)
        if cfg.train.split_threshold > 0
        else None
    )
    mesh = make_data_mesh(cfg.train.num_devices)
    state = init_sharded_state(
        model, schema, sparse_opt, dense_opt, mesh, seed=cfg.train.seed
    )
    step = make_sharded_train_step(
        model, schema, sparse_opt, dense_opt, mesh,
        l2=cfg.optim.l2, capacity_factor=cfg.train.capacity_factor,
        split=split,
    )
    eval_step = make_sharded_eval_step(
        model, schema, mesh, capacity_factor=cfg.train.capacity_factor,
        split=split,
    )
    history = []
    best_auc, best_epoch, since = -np.inf, -1, 0
    for epoch in range(cfg.train.epochs):
        t0 = time.perf_counter()
        n_b, loss_sum, dropped_sum = 0, 0.0, 0
        for b in minibatches(
            tr_ids, tr_labels, cfg.train.batch_size, schema=schema,
            shuffle=True, seed=cfg.train.seed + epoch, drop_remainder=True,
        ):
            ids, y, w = shard_batch_arrays(mesh, b.ids, b.labels, b.weights)
            state, (loss, dropped) = step(state, ids, y, w)
            loss_sum += float(loss)
            dropped_sum += int(dropped)
            n_b += 1
        dt = time.perf_counter() - t0
        # on-device streaming AUC: histograms accumulate on the sharded
        # logits and only two [num_bins] vectors ever reach the host
        # (SURVEY.md §5 observability row); logloss accumulates likewise
        import jax
        import jax.numpy as jnp

        auc_state = M.auc_state_init()

        @jax.jit
        def accum(st, logits, labels, weights):
            st2 = M.auc_state_update(st, logits, labels, weights)
            ls = jax.nn.log_sigmoid(logits)
            lns = jax.nn.log_sigmoid(-logits)
            ll = -(labels * ls + (1 - labels) * lns)
            return st2, (ll * weights).sum(), weights.sum()

        ll_sum, w_sum = 0.0, 0.0
        for b in minibatches(
            te_ids, te_labels, cfg.train.batch_size, schema=schema,
            shuffle=False, drop_remainder=False,
        ):
            ids_d, y_d, w_d = shard_batch_arrays(mesh, b.ids, b.labels, b.weights)
            logits = eval_step(state.table, state.dense, ids_d)
            auc_state, ll_b, w_b = accum(auc_state, logits, y_d, w_d)
            ll_sum += float(ll_b)
            w_sum += float(w_b)
        rec = {
            "epoch": epoch,
            "train_loss": loss_sum / max(n_b, 1),
            "dropped_ids": dropped_sum,
            "examples_per_s": n_b * cfg.train.batch_size / max(dt, 1e-9),
            "auc": M.auc_state_finalize(auc_state),
            "logloss": ll_sum / max(w_sum, 1.0),
        }
        history.append(rec)
        logger.log(rec)
        if rec["auc"] > best_auc:
            best_auc, best_epoch, since = rec["auc"], epoch, 0
        else:
            since += 1
            if since > cfg.train.early_stop_patience:
                break
    return {"best_auc": float(best_auc), "best_epoch": best_epoch,
            "history": history}


def main(argv=None):
    from .config import RunConfig

    ap = argparse.ArgumentParser(
        prog="deepctr_tpu",
        description="TPU-native CTR training (LR/FM/FNN/SNN)",
    )
    ap.add_argument("--config", help="JSON config path (defaults applied)")
    ap.add_argument(
        "overrides", nargs="*",
        help="dotted overrides, e.g. model.name=fm train.epochs=3",
    )
    ap.add_argument("--print-config", action="store_true")
    ap.add_argument(
        "--score", metavar="YX_FILE",
        help="score a yx file with the checkpoint at train.checkpoint_path "
        "and print one probability per line",
    )
    args = ap.parse_args(argv)

    cfg = RunConfig.load(args.config) if args.config else RunConfig()
    cfg = cfg.apply_overrides(args.overrides)
    if args.print_config:
        print(cfg.to_json())
        return 0
    if args.score:
        return score(cfg, args.score)
    run(cfg)
    return 0


def score(cfg, yx_path: str) -> int:
    """Offline scoring surface (the reference's pred_fn role)."""
    from .serving import Scorer

    schema, *_ = _load_schema_only(cfg)
    model = build_model(cfg, schema)
    if not cfg.train.checkpoint_path:
        raise SystemExit("--score requires train.checkpoint_path")
    scorer = Scorer.from_checkpoint(
        cfg.train.checkpoint_path, model, schema, batch_size=cfg.train.batch_size
    )
    for chunk in scorer.score_yx_file(yx_path, cfg.data.use_native_parser):
        for p in chunk:
            print(f"{p:.6f}")
    return 0


def _load_schema_only(cfg):
    from .data import Schema, ipinyou_like_schema

    if cfg.data.schema_path:
        with open(cfg.data.schema_path) as f:
            return (Schema.from_json(f.read()),)
    return (ipinyou_like_schema(),)


if __name__ == "__main__":
    sys.exit(main())

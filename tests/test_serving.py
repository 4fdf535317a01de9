"""Serving Scorer tests incl. bf16/int8 table quantization."""

import numpy as np
import optax
import pytest

from deepctr_tpu.models import FMModel
from deepctr_tpu.optim import SparseAdagrad
from deepctr_tpu.serving import Scorer
from deepctr_tpu.train import fit
from deepctr_tpu.utils.metrics import exact_auc


@pytest.fixture(scope="module")
def trained(request, tiny_schema_mod, tiny_dataset_mod):
    ds = tiny_dataset_mod
    res = fit(
        FMModel(k=4),
        tiny_schema_mod,
        ds.ids[:3000],
        ds.labels[:3000],
        ds.ids[3000:],
        ds.labels[3000:],
        sparse_opt=SparseAdagrad(0.1),
        dense_opt=optax.adagrad(0.05),
        batch_size=256,
        epochs=4,
        prefetch=False,
    )
    return res.state


# module-scoped aliases of the session fixtures
@pytest.fixture(scope="module")
def tiny_schema_mod():
    from deepctr_tpu.data import make_schema

    return make_schema([("a", 4), ("b", 8), ("c", 16), ("tags", 10, 3)])


@pytest.fixture(scope="module")
def tiny_dataset_mod(tiny_schema_mod):
    from deepctr_tpu.data import synthetic

    return synthetic.generate(tiny_schema_mod, num_examples=4096, k=3,
                              noise=0.3, seed=1)


@pytest.mark.parametrize("quantize", [None, "bf16", "int8"])
def test_scorer_quantization_accuracy(quantize, trained, tiny_schema_mod,
                                      tiny_dataset_mod):
    ds = tiny_dataset_mod
    scorer = Scorer(
        model=FMModel(k=4),
        schema=tiny_schema_mod,
        table=np.asarray(trained.table),
        dense={k: np.asarray(v) for k, v in trained.dense.items()},
        quantize=quantize,
        batch_size=512,
    )
    probs = scorer.predict(ds.ids[3000:])
    auc = exact_auc(ds.labels[3000:], probs)
    assert auc > 0.6
    if quantize is not None:
        f32 = Scorer(
            model=FMModel(k=4),
            schema=tiny_schema_mod,
            table=np.asarray(trained.table),
            dense={k: np.asarray(v) for k, v in trained.dense.items()},
            batch_size=512,
        )
        auc_f32 = exact_auc(ds.labels[3000:], f32.predict(ds.ids[3000:]))
        assert abs(auc - auc_f32) < 0.01, (quantize, auc, auc_f32)


def test_int8_table_memory(trained, tiny_schema_mod):
    s = Scorer(
        model=FMModel(k=4),
        schema=tiny_schema_mod,
        table=np.asarray(trained.table),
        dense={k: np.asarray(v) for k, v in trained.dense.items()},
        quantize="int8",
    )
    assert s._table.dtype == np.int32
    # word-packed layout: D quantized bytes + pad + 4 scale bytes per row,
    # bitcast to int32 words so the gather moves 32-bit lanes; footprint is
    # within 3 pad bytes of the separate-scales layout, one gather total
    d = np.asarray(trained.table).shape[1]
    assert s._table.shape[1] * 4 == d + (-(d + 4) % 4) + 4


def test_int8_packed_scale_roundtrip(trained, tiny_schema_mod):
    """The f32 row scale must survive the int8 bitcast EXACTLY (it is packed
    as raw bytes, not re-quantized)."""
    t = np.asarray(trained.table, np.float32)
    s = Scorer(
        model=FMModel(k=4),
        schema=tiny_schema_mod,
        table=t,
        dense={k: np.asarray(v) for k, v in trained.dense.items()},
        quantize="int8",
    )
    d = t.shape[1]
    pad = -(d + 4) % 4
    packed = np.asarray(s._table).view(np.int8).reshape(t.shape[0], -1)
    scales = np.maximum(np.abs(t).max(axis=1, keepdims=True), 1e-12) / 127.0
    recovered = packed[:, d + pad:].copy().view(np.float32)
    np.testing.assert_array_equal(recovered, scales.astype(np.float32))
    # and the payload dequantizes to within one quantization step
    deq = packed[:, :d].astype(np.float32) * recovered
    assert np.max(np.abs(deq - t)) <= np.max(scales) * 0.5 + 1e-7


def test_scorer_from_sharded_run_checkpoint(tmp_path, tiny_schema_mod):
    """Checkpoints written by the SHARDED loop are saved in the logical
    single-device layout (host_state_from_sharded), so the Scorer must load
    and score them directly — the serve-from-multichip-training contract
    (VERDICT weak #7)."""
    from deepctr_tpu.cli import run
    from deepctr_tpu.config import RunConfig
    from deepctr_tpu.data import synthetic

    ck = str(tmp_path / "sharded.ckpt")
    cfg = RunConfig().apply_overrides([
        "model.name=fm", "model.k=4",
        "train.epochs=2", "train.batch_size=512", "train.sharded=true",
        "train.scan_steps=0", "train.prefetch=false",
        f"train.checkpoint_path={ck}",
        "data.synthetic_examples=4096",
    ])
    res = run(cfg)
    assert np.isfinite(res["best_auc"])

    from deepctr_tpu.cli import load_data

    schema, tr_ids, _, te_ids, _ = load_data(cfg)
    scorer = Scorer.from_checkpoint(ck, FMModel(k=4), schema, batch_size=512)
    probs = scorer.predict(te_ids)
    assert probs.shape[0] == te_ids.shape[0]
    assert np.all((probs >= 0) & (probs <= 1))
    # oracle: host-side forward on the checkpointed params
    import jax.numpy as jnp

    from deepctr_tpu.models import apply_model
    from deepctr_tpu.utils.checkpoint import load_scoring_params

    import jax

    dense_like = FMModel(k=4).init_params(jax.random.PRNGKey(0), schema)["dense"]
    table, dense = load_scoring_params(ck, dense_like)
    want = apply_model(FMModel(k=4), {"table": table, "dense": dense},
                       jnp.asarray(te_ids), schema.pad_id)
    want = 1.0 / (1.0 + np.exp(-np.clip(np.asarray(want), -30, 30)))
    np.testing.assert_allclose(probs, want, rtol=2e-5, atol=2e-5)

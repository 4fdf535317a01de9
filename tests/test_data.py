"""Data-layer unit tests (SURVEY.md §4: parser on crafted lines, field-offset
packing, parser/native agreement, cache round-trip)."""

import numpy as np
import pytest

from deepctr_tpu.data import (
    Batch,
    make_schema,
    minibatches,
    pack_ids,
    parse_yx_lines,
    synthetic,
)
from deepctr_tpu.data.cache import read_cache, write_cache
from deepctr_tpu.data.pipeline import stream_yx_batches
from deepctr_tpu.data.schema import Schema


def test_schema_offsets():
    s = make_schema([("a", 4), ("b", 8), ("tags", 10, 3)])
    assert s.vocab_size == 22
    assert s.pad_id == 22
    assert list(s.offsets) == [0, 4, 12]
    assert s.num_slots == 5
    assert list(s.slot_field) == [0, 1, 2, 2, 2]
    assert list(s.slot_offsets) == [0, 1, 2]
    fields = s.field_of_global_id(np.array([0, 3, 4, 11, 12, 21]))
    assert list(fields) == [0, 0, 1, 1, 2, 2]


def test_parse_crafted_lines():
    s = make_schema([("a", 4), ("b", 8), ("tags", 10, 3)])
    lines = [
        "1 0:1 5:1 13:1 15:1",
        "0 3:1 4:1",
        "1 2:1 11:1 12:1 14:1 16:1 21:1",  # 4 tag ids; max_len 3 -> drop last
    ]
    labels, ids = parse_yx_lines(lines, s)
    assert labels.tolist() == [1.0, 0.0, 1.0]
    assert ids[0].tolist() == [0, 5, 13, 15, s.pad_id]
    assert ids[1].tolist() == [3, 4, s.pad_id, s.pad_id, s.pad_id]
    assert ids[2].tolist() == [2, 11, 12, 14, 16]


def test_pack_ids_out_of_range_dropped_and_strict():
    s = make_schema([("a", 4)])
    packed = pack_ids([np.array([0, 99])], s)
    assert packed[0, 0] == 0
    with pytest.raises(ValueError):
        pack_ids([np.array([99])], s, strict=True)


def test_yx_roundtrip_and_native_agreement(tmp_path, tiny_schema, tiny_dataset):
    path = str(tmp_path / "sample.yx")
    synthetic.write_yx_file(tiny_dataset, path)
    labels, ids = __import__(
        "deepctr_tpu.data.parser", fromlist=["parse_yx_file"]
    ).parse_yx_file(path, tiny_schema)
    np.testing.assert_array_equal(labels, tiny_dataset.labels)
    np.testing.assert_array_equal(ids, tiny_dataset.ids)

    from deepctr_tpu.data import native

    if not native.available():
        pytest.skip("no g++ toolchain")
    nl, nids = native.parse_yx_file(path, tiny_schema)
    np.testing.assert_array_equal(nl, labels)
    np.testing.assert_array_equal(nids, ids)


def test_minibatch_shapes_and_padding(tiny_schema, tiny_dataset):
    bs = 100
    n = tiny_dataset.ids.shape[0]
    batches = list(
        minibatches(
            tiny_dataset.ids,
            tiny_dataset.labels,
            bs,
            schema=tiny_schema,
            shuffle=True,
            seed=3,
        )
    )
    assert all(b.ids.shape == (bs, tiny_schema.num_slots) for b in batches)
    total_real = sum(int(b.weights.sum()) for b in batches)
    assert total_real == n
    # padding rows are pad_id with weight 0
    last = batches[-1]
    padded = last.weights == 0
    assert (last.ids[padded] == tiny_schema.pad_id).all()


def test_cache_roundtrip(tmp_path, tiny_schema, tiny_dataset):
    p = str(tmp_path / "c.npz")
    write_cache(p, tiny_dataset.ids, tiny_dataset.labels, tiny_schema)
    ids, labels, schema = read_cache(p)
    np.testing.assert_array_equal(ids, tiny_dataset.ids)
    np.testing.assert_array_equal(labels, tiny_dataset.labels)
    assert schema == tiny_schema


def test_stream_yx_batches(tmp_path, tiny_schema, tiny_dataset):
    path = str(tmp_path / "s.yx")
    synthetic.write_yx_file(tiny_dataset, path)
    bs = 256
    got_ids, got_labels = [], []
    for b in stream_yx_batches([path], tiny_schema, bs, chunk_lines=37):
        keep = b.weights > 0
        got_ids.append(b.ids[keep])
        got_labels.append(b.labels[keep])
    np.testing.assert_array_equal(np.concatenate(got_ids), tiny_dataset.ids)
    np.testing.assert_array_equal(np.concatenate(got_labels), tiny_dataset.labels)


def test_schema_json_roundtrip(tiny_schema):
    assert Schema.from_json(tiny_schema.to_json()) == tiny_schema


def test_criteo_parser():
    from deepctr_tpu.data.criteo import (
        criteo_schema,
        fnv1a64,
        parse_criteo_lines,
    )

    schema = criteo_schema(cat_buckets=1000)
    assert schema.num_fields == 39
    lines = [
        b"1\t5\t\t-3\t" + b"\t" * 10 + b"68fd1e64\tabc123\t" + b"\t" * 24,
        b"0" + b"\t" * 39,
        b"",  # blank skipped
    ]
    labels, ids = parse_criteo_lines(lines, schema)
    assert labels.tolist() == [1.0, 0.0]
    offs = schema.offsets
    # I1=5 -> floor(log(6)^2)+3 = floor(3.21)+3 = 6
    assert ids[0, 0] == offs[0] + 6
    assert ids[0, 1] == offs[1] + 0      # missing int
    assert ids[0, 2] == offs[2] + 2      # negative int
    # categorical: deterministic hash
    assert ids[0, 13] == offs[13] + fnv1a64(b"68fd1e64") % 1000
    # same token hashes identically on a fresh parse (restart determinism)
    labels2, ids2 = parse_criteo_lines(lines[:1], schema)
    assert ids2[0, 13] == ids[0, 13]
    # missing categorical -> bucket 0, still a valid id in field range
    assert ids[1, 13] == offs[13]
    # all ids within vocab
    assert (ids < schema.vocab_size).all() and (ids >= 0).all()


def test_criteo_trains():
    """Hashed Criteo-shaped data flows through the standard trainer."""
    import optax

    from deepctr_tpu.data.criteo import criteo_schema, parse_criteo_lines
    from deepctr_tpu.models import FMModel
    from deepctr_tpu.optim import SparseAdagrad
    from deepctr_tpu.train import fit

    rng = np.random.default_rng(0)
    schema = criteo_schema(cat_buckets=500)
    lines = []
    for i in range(800):
        y = rng.integers(0, 2)
        ints = [str(rng.integers(0, 100) + y * 50).encode() for _ in range(13)]
        cats = [f"tok{rng.integers(0, 50) + y * 25:x}".encode() for _ in range(26)]
        lines.append(str(y).encode() + b"\t" + b"\t".join(ints + cats))
    labels, ids = parse_criteo_lines(lines, schema)
    res = fit(
        FMModel(k=4),
        schema,
        ids[:600],
        labels[:600],
        ids[600:],
        labels[600:],
        sparse_opt=SparseAdagrad(0.1),
        dense_opt=optax.adagrad(0.05),
        batch_size=128,
        epochs=4,
        prefetch=False,
        early_stop_patience=4,
    )
    assert res.best_auc > 0.7, res.history


def test_device_prefetcher(tiny_schema, tiny_dataset):
    from deepctr_tpu.data import DevicePrefetcher, minibatches

    it = minibatches(
        tiny_dataset.ids[:1000], tiny_dataset.labels[:1000], 256,
        schema=tiny_schema, shuffle=False, drop_remainder=False,
    )
    batches = list(DevicePrefetcher(it, depth=2))
    assert len(batches) == 4
    import jax

    assert isinstance(batches[0].ids, jax.Array)
    total = sum(int(b.weights.sum()) for b in batches)
    assert total == 1000


def test_device_prefetcher_propagates_errors(tiny_schema):
    from deepctr_tpu.data import Batch, DevicePrefetcher

    def bad_iter():
        yield Batch(
            ids=np.zeros((4, tiny_schema.num_slots), np.int32),
            labels=np.zeros(4, np.float32),
            weights=np.ones(4, np.float32),
        )
        raise RuntimeError("boom")

    it = DevicePrefetcher(bad_iter(), depth=2)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        while True:
            next(it)


def test_criteo_native_matches_python(tmp_path):
    from deepctr_tpu.data import native
    from deepctr_tpu.data.criteo import criteo_schema, parse_criteo_lines

    if not native.available():
        pytest.skip("no g++ toolchain")
    schema = criteo_schema(cat_buckets=997)
    rng = np.random.default_rng(3)
    lines = []
    for i in range(500):
        y = rng.integers(0, 2)
        ints = []
        for _ in range(13):
            r = rng.random()
            if r < 0.2:
                ints.append(b"")                  # missing
            elif r < 0.25:
                ints.append(b"-5")                # negative
            elif r < 0.3:
                ints.append(b"xy")                # malformed
            else:
                ints.append(str(rng.integers(0, 10**6)).encode())
        cats = []
        for _ in range(26):
            if rng.random() < 0.15:
                cats.append(b"")
            else:
                cats.append(f"{rng.integers(0, 2**32):08x}".encode())
        lines.append(str(y).encode() + b"\t" + b"\t".join(ints + cats))
    # short line (missing trailing columns)
    lines.append(b"1\t7\t3")
    data = b"\n".join(lines) + b"\n"

    l_py, i_py = parse_criteo_lines(lines, schema)
    l_na, i_na = native.parse_criteo_bytes(data, schema)
    np.testing.assert_array_equal(l_na, l_py)
    np.testing.assert_array_equal(i_na, i_py)


def test_epoch_iterator(tiny_schema, tiny_dataset):
    from deepctr_tpu.data import epoch_iterator

    it = epoch_iterator(
        tiny_dataset.ids[:512], tiny_dataset.labels[:512], 128,
        schema=tiny_schema, num_epochs=2, seed=1,
    )
    seen = list(it)
    assert len(seen) == 8  # 4 batches x 2 epochs
    assert {e for e, _ in seen} == {0, 1}
    # different epochs shuffle differently
    b0 = seen[0][1].ids
    b4 = seen[4][1].ids
    assert not np.array_equal(b0, b4)


# ---------------------------------------------------------------------------
# featindex importer (make-ipinyou-data on-ramp, data/featindex.py)
# ---------------------------------------------------------------------------


def _write_featindex(path):
    """A miniature make-ipinyou-data featindex: indices assigned in
    first-seen order ACROSS fields (interleaved per-field ranges)."""
    lines = [
        "truncate\t0",
        "weekday:1\t1",
        "hour:0\t2",
        "weekday:3\t3",
        "usertag:10059\t4",
        "hour:12\t5",
        "usertag:10024\t6",
        "weekday:5\t7",
        "usertag:13800\t8",
        "url:a:b:c\t9",       # colons in the value: field = text before LAST colon
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_load_featindex_schema_and_remap(tmp_path):
    from deepctr_tpu.data.featindex import load_featindex

    p = tmp_path / "featindex.txt"
    _write_featindex(str(p))
    fi = load_featindex(str(p), max_len={"usertag": 3})
    names = [f.name for f in fi.schema.fields]
    # first-appearance order
    assert names == ["truncate", "weekday", "hour", "usertag", "url:a:b"]
    vocabs = {f.name: f.vocab_size for f in fi.schema.fields}
    assert vocabs == {"truncate": 1, "weekday": 3, "hour": 2,
                      "usertag": 3, "url:a:b": 1}
    assert {f.name: f.max_len for f in fi.schema.fields}["usertag"] == 3
    # remap: old index -> offsets[field] + first-seen local
    off = dict(zip(names, fi.schema.offsets))
    assert fi.remap[1] == off["weekday"] + 0
    assert fi.remap[3] == off["weekday"] + 1
    assert fi.remap[7] == off["weekday"] + 2
    assert fi.remap[2] == off["hour"] + 0
    assert fi.remap[5] == off["hour"] + 1
    assert fi.remap[4] == off["usertag"] + 0
    assert fi.remap[8] == off["usertag"] + 2
    assert fi.remap[9] == off["url:a:b"] + 0


def test_featindex_parse_and_pack(tmp_path):
    from deepctr_tpu.data.featindex import load_featindex, parse_yx_file

    fp = tmp_path / "featindex.txt"
    _write_featindex(str(fp))
    fi = load_featindex(str(fp), max_len={"usertag": 3})
    yx = tmp_path / "train.yx"
    # row 2 references old id 99 (absent from featindex) -> dropped
    yx.write_text("1 1:1 2:1 4:1 6:1\n0 3:1 5:1 99:1\n")
    labels, ids = parse_yx_file(str(yx), fi)
    np.testing.assert_array_equal(labels, [1.0, 0.0])
    s = fi.schema
    off = dict(zip([f.name for f in s.fields], s.offsets))
    slot = dict(zip([f.name for f in s.fields], s.slot_offsets))
    pad = s.pad_id
    assert ids[0, slot["weekday"]] == off["weekday"] + 0
    assert ids[0, slot["hour"]] == off["hour"] + 0
    # two usertags packed into the 3 usertag slots
    tag_slots = ids[0, slot["usertag"]: slot["usertag"] + 3]
    assert set(tag_slots) == {off["usertag"] + 0, off["usertag"] + 1, pad}
    # row 2: unknown id dropped, no crash
    assert ids[1, slot["weekday"]] == off["weekday"] + 1
    assert ids[1, slot["hour"]] == off["hour"] + 1
    assert (ids[1] == pad).sum() == s.num_slots - 2


def test_featindex_cache_invalidation(tmp_path):
    import os
    import time

    from deepctr_tpu.data.cache import read_cache
    from deepctr_tpu.data.featindex import cache_yx_file, load_featindex

    fp = tmp_path / "featindex.txt"
    _write_featindex(str(fp))
    fi = load_featindex(str(fp))
    yx = tmp_path / "train.yx"
    yx.write_text("1 1:1\n")
    c1 = cache_yx_file(str(yx), fi, str(fp))
    ids1, labels1, schema1 = read_cache(c1)
    assert schema1.vocab_size == fi.schema.vocab_size
    m1 = os.path.getmtime(c1)
    # untouched -> cache reused
    assert cache_yx_file(str(yx), fi, str(fp)) == c1
    assert os.path.getmtime(c1) == m1
    # touching the FEATINDEX (not the yx file) must invalidate
    time.sleep(0.01)
    os.utime(str(fp))
    cache_yx_file(str(yx), fi, str(fp))
    assert os.path.getmtime(c1) >= os.path.getmtime(str(fp))


def test_cli_load_data_featindex(tmp_path):
    from deepctr_tpu.cli import load_data
    from deepctr_tpu.config import RunConfig

    fp = tmp_path / "featindex.txt"
    _write_featindex(str(fp))
    yx = tmp_path / "train.yx"
    yx.write_text("1 1:1 2:1\n0 3:1 5:1\n1 7:1\n0 1:1\n")
    cfg = RunConfig()
    cfg.data.featindex_path = str(fp)
    cfg.data.train_path = str(yx)
    cfg.data.test_fraction = 0.25
    schema, tr_ids, tr_y, te_ids, te_y = load_data(cfg)
    assert [f.name for f in schema.fields][:3] == ["truncate", "weekday", "hour"]
    assert tr_ids.shape[0] == 3 and te_ids.shape[0] == 1
    assert tr_ids.shape[1] == schema.num_slots


def test_ortho_teacher_pairwise_tier_has_zero_first_order_anova():
    """The ortho substrate's central claim, checked mechanically: with the
    linear tier off (ortho_mix a=0), the per-feature conditional means of
    the Bayes logits are ~0 for EVERY feature — no amount of LR training
    can extract the interaction tier, because its first-order ANOVA
    components vanish under the sampling marginals (RESULTS.md substrate
    note; the property the headline ordering rests on)."""
    from deepctr_tpu.data import ipinyou_like_schema

    schema = ipinyou_like_schema()
    n = 200_000
    ds = synthetic.generate(schema, num_examples=n, seed=3, teacher="ortho",
                            ortho_mix=(0.0, 1.0, 0.0))
    z = ds.bayes_logits - ds.bayes_logits.mean()
    sigma_z = z.std()
    V = schema.vocab_size
    sums = np.zeros(V + 1)
    cnts = np.zeros(V + 1)
    np.add.at(sums, ds.ids.reshape(-1), np.repeat(z, schema.num_slots))
    np.add.at(cnts, ds.ids.reshape(-1), 1.0)
    seen = cnts >= 200  # enough observations for a tight mean estimate
    seen[schema.pad_id] = False
    assert seen.sum() > 100
    cond_mean = sums[seen] / cnts[seen]
    # sampling envelope: each conditional mean is ~N(0, sigma_z^2 / n_v)
    bound = 6.0 * sigma_z / np.sqrt(cnts[seen])
    assert (np.abs(cond_mean) < bound).all(), (
        np.abs(cond_mean / bound).max())
    # and the linear tier (a=1, b=0) is NOT centered — the check has power
    ds_lin = synthetic.generate(schema, num_examples=n, seed=3,
                                teacher="ortho", ortho_mix=(1.0, 0.0, 0.0))
    zl = ds_lin.bayes_logits - ds_lin.bayes_logits.mean()
    sums_l = np.zeros(V + 1)
    np.add.at(sums_l, ds_lin.ids.reshape(-1), np.repeat(zl, schema.num_slots))
    cm_l = sums_l[seen] / cnts[seen]
    bound_l = 6.0 * zl.std() / np.sqrt(cnts[seen])
    assert (np.abs(cm_l) > bound_l).mean() > 0.5  # most features carry signal

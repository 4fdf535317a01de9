"""Streaming training ingestion (data/stream.py) — the Criteo-scale path.

SURVEY.md §2.4 host-pipeline row / §7 risk list; VERDICT r2 Missing #3:
training previously required the whole dataset in host RAM.  These tests
gate the three contract points: exact epoch coverage, bounded residency,
and stream-trained quality matching in-RAM training on the same data.
"""

import os

import numpy as np
import pytest

from deepctr_tpu.data import StreamSource, make_schema, synthetic
from deepctr_tpu.data.stream import expand_shards


def _write_shards(tmp_path, ds, n_shards):
    rows = ds.ids.shape[0]
    per = rows // n_shards
    paths = []
    for i in range(n_shards):
        sl = slice(i * per, rows if i == n_shards - 1 else (i + 1) * per)
        p = str(tmp_path / f"shard_{i:02d}.yx")
        synthetic.write_yx_file(
            synthetic.SyntheticDataset(
                ds.schema, ds.ids[sl], ds.labels[sl], ds.bayes_logits[sl]
            ),
            p,
        )
        paths.append(p)
    return paths


def _row_multiset(ids, labels):
    """Order-independent row fingerprint (sorted ids within a row are already
    canonical: slots are schema-ordered)."""
    flat = [tuple(r) + (float(y),) for r, y in zip(ids.tolist(), labels.tolist())]
    return sorted(flat)


@pytest.fixture(scope="module")
def small_ds():
    schema = make_schema([("a", 6), ("b", 12), ("c", 300), ("d", 40)])
    return synthetic.generate(schema, num_examples=9_000, k=3, seed=11)


def test_stream_epoch_covers_every_row_exactly_once(tmp_path, small_ds):
    ds = small_ds
    paths = _write_shards(tmp_path, ds, n_shards=3)
    src = StreamSource(
        paths=paths, schema=ds.schema, batch_size=128, buffer_rows=512,
        chunk_bytes=8192, seed=0, drop_remainder=False,
    )
    got_ids, got_y = [], []
    for b in src.batches(epoch=0):
        keep = b.weights > 0
        got_ids.append(b.ids[keep])
        got_y.append(b.labels[keep])
    got_ids = np.concatenate(got_ids)
    got_y = np.concatenate(got_y)
    assert got_ids.shape[0] == ds.ids.shape[0]
    assert _row_multiset(got_ids, got_y) == _row_multiset(ds.ids, ds.labels)


def test_stream_shuffles_across_epochs_and_vs_file_order(tmp_path, small_ds):
    ds = small_ds
    paths = _write_shards(tmp_path, ds, n_shards=3)

    def first_batch(epoch):
        src = StreamSource(paths=paths, schema=ds.schema, batch_size=256,
                           buffer_rows=2048, seed=5)
        return next(iter(src.batches(epoch))).ids

    b0, b1 = first_batch(0), first_batch(1)
    assert not np.array_equal(b0, b1)              # epoch changes the order
    assert not np.array_equal(b0, ds.ids[:256])    # and it isn't file order
    # determinism: same (seed, epoch) -> identical stream
    assert np.array_equal(b0, first_batch(0))


def test_stream_residency_is_bounded(tmp_path, small_ds):
    ds = small_ds
    paths = _write_shards(tmp_path, ds, n_shards=3)
    src = StreamSource(
        paths=paths, schema=ds.schema, batch_size=64, buffer_rows=256,
        chunk_bytes=4096, seed=0, drop_remainder=False,
    )
    n = sum(int((b.weights > 0).sum()) for b in src.batches(0))
    assert n == ds.ids.shape[0]
    # residency contract: buffer + the prefetch window (each of the
    # prefetch_files workers holds <= prefetch_chunks queued + 1 in-flight
    # chunk, plus the consumer's pending chunk), far below the dataset size
    line_bytes = 24  # lower bound for these rows; 4096-byte chunks < ~200 rows
    chunk_rows = 4096 // line_bytes + 64
    window = (src.prefetch_files * (src.prefetch_chunks + 1) + 1) * chunk_rows
    assert src.stats.peak_resident_rows <= 256 + window
    assert src.stats.peak_resident_rows < ds.ids.shape[0] // 4

    # with inline parsing the old tighter bound holds exactly
    src2 = StreamSource(
        paths=paths, schema=ds.schema, batch_size=64, buffer_rows=256,
        chunk_bytes=4096, seed=0, drop_remainder=False, prefetch_files=0,
    )
    n2 = sum(int((b.weights > 0).sum()) for b in src2.batches(0))
    assert n2 == ds.ids.shape[0]
    assert src2.stats.peak_resident_rows <= 256 + chunk_rows
    assert src2.stats.peak_resident_rows < ds.ids.shape[0] // 10


def test_scan_chunks_shapes_and_padding(tmp_path, small_ds):
    ds = small_ds
    paths = _write_shards(tmp_path, ds, n_shards=2)
    src = StreamSource(paths=paths, schema=ds.schema, batch_size=512,
                       buffer_rows=1024, seed=0)
    total_nb, last_nb = 0, None
    for nb, (ids_t, y_t, w_t) in src.scan_chunks(0, scan_steps=4):
        assert ids_t.shape == (4, 512, ds.schema.num_slots)
        assert y_t.shape == w_t.shape == (4, 512)
        # padded steps carry weight 0 everywhere
        assert np.all(w_t[nb:] == 0.0)
        total_nb += nb
        last_nb = nb
    assert total_nb == ds.ids.shape[0] // 512  # drop_remainder batches
    assert last_nb is not None


def test_scan_chunks_no_drop_covers_every_row(tmp_path, small_ds):
    """drop_remainder=False on the scan path: the <batch drain tail is
    emitted as a weight-0-padded batch, not silently dropped (ADVICE r4)."""
    ds = small_ds
    paths = _write_shards(tmp_path, ds, n_shards=2)
    for T in (4, 3):  # exercise both tail-in-partial-chunk and tail-in-full
        src = StreamSource(paths=paths, schema=ds.schema, batch_size=512,
                           buffer_rows=1024, seed=0, drop_remainder=False)
        got_ids, got_y = [], []
        for nb, (ids_t, y_t, w_t) in src.scan_chunks(0, scan_steps=T):
            keep = w_t.reshape(-1) > 0
            got_ids.append(ids_t.reshape(-1, ds.schema.num_slots)[keep])
            got_y.append(y_t.reshape(-1)[keep])
            assert np.all(w_t[nb:] == 0.0)
        got_ids = np.concatenate(got_ids)
        got_y = np.concatenate(got_y)
        assert got_ids.shape[0] == ds.ids.shape[0]
        assert _row_multiset(got_ids, got_y) == _row_multiset(ds.ids, ds.labels)
        assert src.stats.rows_emitted == ds.ids.shape[0]


def test_stream_glob_and_comma_expansion(tmp_path, small_ds):
    paths = _write_shards(tmp_path, small_ds, n_shards=3)
    by_glob = expand_shards(str(tmp_path / "shard_*.yx"))
    assert by_glob == sorted(paths)
    by_list = expand_shards(",".join(paths[:2]))
    assert by_list == paths[:2]


def test_stream_matches_in_ram_training(tmp_path):
    """The VERDICT r2 contract test: train from a file stream with bounded
    RSS and match in-RAM training AUC on the same data."""
    import optax

    from deepctr_tpu.models import FMModel
    from deepctr_tpu.optim import SparseAdagrad
    from deepctr_tpu.train import fit

    schema = make_schema([("a", 6), ("b", 12), ("c", 300), ("d", 40)])
    ds = synthetic.generate(schema, num_examples=24_000, k=3, seed=3)
    n = ds.ids.shape[0]
    cut = int(n * 0.85)
    tr_ids, tr_y = ds.ids[:cut], ds.labels[:cut]
    te_ids, te_y = ds.ids[cut:], ds.labels[cut:]
    train_ds = synthetic.SyntheticDataset(schema, tr_ids, tr_y,
                                          ds.bayes_logits[:cut])
    paths = _write_shards(tmp_path, train_ds, n_shards=4)

    def train(source=None, ids=None, y=None, scan_steps=0):
        return fit(
            FMModel(k=4), schema, ids, y, te_ids, te_y,
            sparse_opt=SparseAdagrad(0.05), dense_opt=optax.adagrad(0.05),
            batch_size=256, epochs=3, seed=0, prefetch=False,
            early_stop_patience=99, scan_steps=scan_steps,
            train_source=source,
        )

    res_ram = train(ids=tr_ids, y=tr_y)
    src = StreamSource(paths=paths, schema=schema, batch_size=256,
                       buffer_rows=2048, chunk_bytes=32768, seed=0)
    res_stream = train(source=src)
    # RSS bound by construction (buffer + prefetch window; the tight formula
    # is gated in test_stream_residency_is_bounded), asserted via the counter
    max_chunk_rows = 32768 // 20  # >= rows per 32768-byte chunk of these lines
    window = (src.prefetch_files * (src.prefetch_chunks + 1) + 2) * max_chunk_rows
    assert src.stats.peak_resident_rows <= 2048 + window
    assert res_stream.best_auc > 0.70
    assert abs(res_stream.best_auc - res_ram.best_auc) < 0.01

    # scan-fused dispatch over the stream trains equally well
    src2 = StreamSource(paths=paths, schema=schema, batch_size=256,
                        buffer_rows=2048, seed=0)
    res_scan = train(source=src2, scan_steps=4)
    assert abs(res_scan.best_auc - res_ram.best_auc) < 0.01


def test_stream_criteo_format(tmp_path):
    from deepctr_tpu.data.criteo import criteo_schema, parse_criteo_file

    schema = criteo_schema(cat_buckets=1000)
    rng = np.random.default_rng(0)
    p = str(tmp_path / "day0.tsv")
    with open(p, "w") as f:
        for i in range(500):
            ints = [str(rng.integers(0, 100)) if rng.random() > 0.2 else ""
                    for _ in range(13)]
            cats = [f"{rng.integers(0, 50):08x}" if rng.random() > 0.2 else ""
                    for _ in range(26)]
            f.write("\t".join([str(i % 2)] + ints + cats) + "\n")
    labels, ids = parse_criteo_file(p, schema)
    src = StreamSource(paths=[p], schema=schema, batch_size=64, fmt="criteo",
                       buffer_rows=128, chunk_bytes=4096,
                       drop_remainder=False)
    got_ids = np.concatenate(
        [b.ids[b.weights > 0] for b in src.batches(0)]
    )
    got_y = np.concatenate(
        [b.labels[b.weights > 0] for b in src.batches(1)]
    )
    assert got_ids.shape[0] == ids.shape[0]
    assert _row_multiset(got_ids, np.zeros(len(got_ids))) == \
        _row_multiset(ids, np.zeros(len(ids)))
    assert sorted(got_y.tolist()) == sorted(labels.tolist())


def test_stream_npz_cache_shards(tmp_path, small_ds):
    """.npz cache shards stream without re-parsing text (the multi-epoch
    fast lane): same multiset coverage as the text shards."""
    from deepctr_tpu.data.cache import write_cache

    ds = small_ds
    paths = []
    per = 3000
    for i in range(3):
        sl = slice(i * per, (i + 1) * per)
        p = str(tmp_path / f"shard_{i}.cache.npz")
        write_cache(p, ds.ids[sl], ds.labels[sl], ds.schema)
        paths.append(p)
    src = StreamSource(paths=paths, schema=ds.schema, batch_size=128,
                       buffer_rows=512, chunk_bytes=8192,
                       drop_remainder=False)
    got_ids, got_y = [], []
    for b in src.batches(0):
        keep = b.weights > 0
        got_ids.append(b.ids[keep])
        got_y.append(b.labels[keep])
    got_ids = np.concatenate(got_ids)
    got_y = np.concatenate(got_y)
    assert _row_multiset(got_ids, got_y) == _row_multiset(ds.ids, ds.labels)
    # a schema mismatch is an error, not silent garbage
    other = make_schema([("z", 5)])
    bad = StreamSource(paths=paths, schema=other, batch_size=128)
    with pytest.raises(ValueError, match="different"):
        next(iter(bad.batches(0)))


def test_stream_featindex_format(tmp_path):
    """fmt='yx-featindex': raw make-ipinyou-data indices remapped in-stream."""
    from deepctr_tpu.data import featindex as fidx

    fp = tmp_path / "featindex.txt"
    lines = ["truncate\t0"]
    old = 1
    for val in range(5):
        for field in ("weekday", "hour", "region"):
            lines.append(f"{field}:{val}\t{old}")
            old += 1
    fp.write_text("\n".join(lines) + "\n")
    fi = fidx.load_featindex(str(fp))

    rng = np.random.default_rng(7)
    yx = tmp_path / "train.yx"
    with open(yx, "w") as f:
        for _ in range(300):
            picks = [1 + 3 * rng.integers(0, 5) + k for k in range(3)]
            f.write(f"{int(rng.random() < 0.4)} "
                    + " ".join(f"{p}:1" for p in picks) + "\n")
    want_labels, want_ids = fidx.parse_yx_file(str(yx), fi)

    src = StreamSource(paths=[str(yx)], schema=fi.schema, batch_size=64,
                       fmt="yx-featindex", featindex=fi, buffer_rows=128,
                       chunk_bytes=2048, drop_remainder=False)
    got_ids = np.concatenate([b.ids[b.weights > 0] for b in src.batches(0)])
    assert got_ids.shape[0] == want_ids.shape[0]
    assert _row_multiset(got_ids, np.zeros(len(got_ids))) == \
        _row_multiset(want_ids, np.zeros(len(want_ids)))


def test_cli_stream_end_to_end(tmp_path):
    """CLI: data.stream=true trains (scan-fused) and evaluates sanely, in
    both the unsharded and the sharded loop."""
    from deepctr_tpu.cli import run
    from deepctr_tpu.config import RunConfig

    schema = make_schema([("a", 6), ("b", 12), ("c", 300), ("d", 40)])
    sp = str(tmp_path / "schema.json")
    open(sp, "w").write(schema.to_json())
    ds = synthetic.generate(schema, num_examples=12_000, k=3, seed=5)
    cut = 10_000
    _write_shards(
        tmp_path,
        synthetic.SyntheticDataset(schema, ds.ids[:cut], ds.labels[:cut],
                                   ds.bayes_logits[:cut]),
        n_shards=3,
    )
    te = str(tmp_path / "test.yx")
    synthetic.write_yx_file(
        synthetic.SyntheticDataset(schema, ds.ids[cut:], ds.labels[cut:],
                                   ds.bayes_logits[cut:]), te)

    base = [
        "model.name=fm", "model.k=3", f"data.schema_path={sp}",
        "data.stream=true", "data.stream_buffer_rows=2048",
        f"data.train_path={tmp_path}/shard_*.yx", f"data.test_path={te}",
        "data.use_cache=false", "train.batch_size=256", "train.epochs=2",
        "train.scan_steps=4", "train.prefetch=true",
    ]
    res = run(RunConfig().apply_overrides(base))
    assert res["best_auc"] > 0.65

    res_sh = run(RunConfig().apply_overrides(
        base + ["train.sharded=true", "train.num_devices=4"]))
    assert res_sh["best_auc"] > 0.65


def test_process_partition_union_is_exactly_once(tmp_path, small_ds):
    """Multi-host contract: with process_count=P, the per-process streams
    consume DISJOINT shard subsets whose union is the full epoch — every
    row exactly once globally (VERDICT r3 Missing #4)."""
    ds = small_ds
    paths = _write_shards(tmp_path, ds, n_shards=6)
    P = 3
    got_ids, got_y = [], []
    for pid in range(P):
        src = StreamSource(paths=paths, schema=ds.schema, batch_size=128,
                           buffer_rows=512, seed=4, drop_remainder=False,
                           process_index=pid, process_count=P)
        for b in src.batches(epoch=2):
            keep = b.weights > 0
            got_ids.append(b.ids[keep])
            got_y.append(b.labels[keep])
    got_ids = np.concatenate(got_ids)
    got_y = np.concatenate(got_y)
    assert got_ids.shape[0] == ds.ids.shape[0]
    assert _row_multiset(got_ids, got_y) == _row_multiset(ds.ids, ds.labels)


def test_assemble_process_local_single_process_degenerate(small_ds):
    """assemble_process_local == plain sharded device_put when there is
    one process (the code path both modes share)."""
    import jax

    from deepctr_tpu.parallel import assemble_process_local, make_data_mesh
    from deepctr_tpu.parallel.mesh import data_sharding

    ds = small_ds
    mesh = make_data_mesh(8)
    s = data_sharding(mesh)
    ids = ds.ids[:64]
    (out,) = assemble_process_local(s, ids)
    ref = jax.device_put(ids, s)
    assert out.sharding == ref.sharding
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    # scan-chunk shape: batch axis 1 under P(None, DATA)
    from jax.sharding import NamedSharding, PartitionSpec as P
    from deepctr_tpu.parallel import DATA_AXIS

    s2 = NamedSharding(mesh, P(None, DATA_AXIS))
    chunk = ds.ids[:128].reshape(2, 64, -1)
    (out2,) = assemble_process_local(s2, chunk, batch_axis=1)
    np.testing.assert_array_equal(np.asarray(out2), chunk)

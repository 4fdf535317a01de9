"""Streaming training ingestion: bounded-RAM epochs over text/cached shards.

The reference loads the full dataset into host RAM and slices minibatches
(SURVEY.md §1 data layer, §3.1 hot loop) — fine for the bundled iPinYou
sample, impossible for the Criteo-scale stretch (BASELINE.json:11 "1TB-scale
hash space").  This module makes file-backed training honest at scale: an
epoch is a single pass over the shard files, parsed chunk by chunk through
the native C++ parser, with RAM bounded by ``buffer_rows + one chunk``
regardless of dataset size.

Shuffling (the reference shuffles the whole in-RAM dataset per epoch) is
approximated the standard streaming way:

- **shard-level**: the file list is permuted per epoch (write many shard
  files for large datasets — the parser cost is per-byte, not per-file);
- **buffer-level**: a ``buffer_rows`` reservoir is kept full; each batch is
  a uniform sample-without-replacement from the full reservoir, the holes
  are refilled from the stream (the tf.data ``shuffle(buffer_size)``
  algorithm, batch-vectorised).

Epoch coverage is exact: every row of every shard is emitted exactly once
per epoch (a multiset-equality test gates this, tests/test_stream.py).

Wire-up: ``StreamSource`` plugs into both training loops (``fit(...,
train_source=...)`` and the sharded CLI loop) via two iterators —
``batches(epoch)`` for step-per-dispatch training and
``scan_chunks(epoch, scan_steps)`` for lax.scan-fused dispatch.
"""

from __future__ import annotations

import dataclasses
import glob as _glob
from typing import Iterator, Sequence

import numpy as np

from .pipeline import Batch
from .schema import Schema


def expand_shards(pattern_or_paths) -> list[str]:
    """Expand a glob pattern / comma list / list into a sorted shard list."""
    if isinstance(pattern_or_paths, str):
        parts = [p for p in pattern_or_paths.split(",") if p]
    else:
        parts = list(pattern_or_paths)
    out: list[str] = []
    for p in parts:
        hits = sorted(_glob.glob(p))
        out.extend(hits if hits else [p])
    return out


@dataclasses.dataclass
class StreamStats:
    """Observability for the bounded-memory claim (asserted in tests)."""

    rows_emitted: int = 0
    peak_resident_rows: int = 0  # buffer + largest pending chunk, high-water
    chunks_parsed: int = 0


@dataclasses.dataclass
class StreamSource:
    """Epoch iterator over text shards with bounded host memory.

    ``fmt``: "yx" | "criteo" (native C++ parser, Python fallback) or
    "yx-featindex" (make-ipinyou-data raw indices remapped through a
    FeatIndex; Python parser — the remap is id-space-wide).
    """

    paths: Sequence[str]
    schema: Schema
    batch_size: int
    fmt: str = "yx"
    buffer_rows: int = 1 << 18
    chunk_bytes: int = 4 << 20
    seed: int = 0
    use_native: bool = True
    featindex: object = None  # FeatIndex, required for fmt="yx-featindex"
    drop_remainder: bool = True
    stats: StreamStats = dataclasses.field(default_factory=StreamStats)

    def __post_init__(self):
        self.paths = expand_shards(self.paths)
        if not self.paths:
            raise ValueError("StreamSource needs at least one shard path")
        if self.fmt == "yx-featindex" and self.featindex is None:
            raise ValueError("fmt='yx-featindex' requires featindex=")
        if self.fmt not in ("yx", "criteo", "yx-featindex"):
            raise ValueError(f"unknown stream format {self.fmt!r}")

    # ---- parsing ----------------------------------------------------------

    def _parse(self, chunk: bytes):
        """bytes (whole lines) -> (labels float32[N], ids int32[N, S])."""
        if self.fmt == "yx-featindex":
            from . import featindex as fidx
            from .parser import pack_ids, raw_yx_rows

            lines = [ln for ln in chunk.splitlines() if ln.strip()]
            labels, rows = raw_yx_rows(lines)
            fi = self.featindex
            return labels, pack_ids(fi.remap_rows(rows), fi.schema)
        if self.use_native:
            try:
                from . import native

                if self.fmt == "criteo":
                    return native.parse_criteo_bytes(chunk, self.schema)
                return native.parse_yx_bytes(chunk, self.schema)
            except Exception:
                pass
        lines = [ln for ln in chunk.splitlines() if ln.strip()]
        if self.fmt == "criteo":
            from .criteo import parse_criteo_lines

            return parse_criteo_lines(lines, self.schema)
        from .parser import parse_yx_lines

        return parse_yx_lines(lines, self.schema)

    def _chunks(self, paths: Sequence[str]):
        """Stream (labels, ids) arrays, one bounded-size chunk at a time.

        ``.npz`` shards (written by data/cache.py) skip the text parse
        entirely — the multi-epoch fast lane: text is parsed once into cache
        shards, every epoch streams the packed arrays.  Residency for npz
        shards is one shard + the buffer (keep shards reasonably sized)."""
        for path in paths:
            if path.endswith(".npz"):
                from .cache import read_cache

                ids, labels, sch = read_cache(path)
                if sch.num_slots != self.schema.num_slots:
                    raise ValueError(
                        f"cache shard {path} was packed with a different "
                        f"schema ({sch.num_slots} slots vs "
                        f"{self.schema.num_slots})"
                    )
                rows_per_chunk = max(1, self.chunk_bytes // (4 * ids.shape[1]))
                for s in range(0, ids.shape[0], rows_per_chunk):
                    chunk_ids = ids[s : s + rows_per_chunk]
                    self.stats.chunks_parsed += 1
                    yield labels[s : s + rows_per_chunk], chunk_ids
                del ids, labels
                continue
            with open(path, "rb") as f:
                tail = b""
                while True:
                    raw = f.read(self.chunk_bytes)
                    if not raw:
                        if tail.strip():
                            raw, tail = tail, b""
                        else:
                            break
                    else:
                        raw = tail + raw
                        nl = raw.rfind(b"\n")
                        if nl < 0:
                            tail = raw
                            continue
                        raw, tail = raw[: nl + 1], raw[nl + 1 :]
                    if not raw.strip():
                        continue
                    labels, ids = self._parse(raw)
                    if len(labels):
                        self.stats.chunks_parsed += 1
                        yield labels, ids

    # ---- epoch iteration ---------------------------------------------------

    def batches(self, epoch: int) -> Iterator[Batch]:
        """Shard+buffer-shuffled fixed-shape minibatches, one epoch."""
        rng = np.random.default_rng(self.seed + epoch)
        order = rng.permutation(len(self.paths))
        chunk_it = self._chunks([self.paths[i] for i in order])

        B = self.batch_size
        K = max(self.buffer_rows, B)
        S = self.schema.num_slots
        buf_ids = np.empty((K, S), np.int32)
        buf_y = np.empty(K, np.float32)
        filled = 0
        pend_y = pend_ids = None
        pend_off = 0

        def refill() -> bool:
            """Top the buffer up to K; False once the stream is exhausted."""
            nonlocal filled, pend_y, pend_ids, pend_off
            while filled < K:
                if pend_y is None or pend_off >= len(pend_y):
                    try:
                        pend_y, pend_ids = next(chunk_it)
                    except StopIteration:
                        pend_y = pend_ids = None
                        return False
                    pend_off = 0
                    self.stats.peak_resident_rows = max(
                        self.stats.peak_resident_rows, K + len(pend_y)
                    )
                take = min(K - filled, len(pend_y) - pend_off)
                buf_ids[filled : filled + take] = pend_ids[
                    pend_off : pend_off + take
                ]
                buf_y[filled : filled + take] = pend_y[pend_off : pend_off + take]
                filled += take
                pend_off += take
            return True

        live = refill()
        ones = np.ones(B, np.float32)
        # draw several batches per buffer round (at most half the buffer):
        # same uniform sample-without-replacement semantics, but the O(K)
        # sampling/compaction cost amortises over `draws` batches
        draws = max(1, min(4, K // (2 * B)))
        R = draws * B
        while live and filled == K:
            sel = rng.choice(K, R, replace=False)
            for j in range(draws):
                pick = sel[j * B : (j + 1) * B]
                self.stats.rows_emitted += B
                yield Batch(buf_ids[pick].copy(), buf_y[pick].copy(),
                            ones.copy())
            # compact: move non-emitted tail rows into the holes below K-R
            sel.sort()
            tail = np.setdiff1d(np.arange(K - R, K), sel, assume_unique=True)
            holes = sel[sel < K - R]
            buf_ids[holes] = buf_ids[tail[: len(holes)]]
            buf_y[holes] = buf_y[tail[: len(holes)]]
            filled = K - R
            live = refill()

        # drain: the residual buffer gets a full shuffle, then emits in order
        perm = rng.permutation(filled)
        for start in range(0, filled, B):
            sel = perm[start : start + B]
            b = len(sel)
            if b < B:
                if self.drop_remainder:
                    break
                pad = B - b
                self.stats.rows_emitted += b
                yield Batch(
                    ids=np.concatenate(
                        [buf_ids[sel],
                         np.full((pad, S), self.schema.pad_id, np.int32)]
                    ),
                    labels=np.concatenate([buf_y[sel], np.zeros(pad, np.float32)]),
                    weights=np.concatenate(
                        [np.ones(b, np.float32), np.zeros(pad, np.float32)]
                    ),
                )
            else:
                self.stats.rows_emitted += B
                yield Batch(buf_ids[sel].copy(), buf_y[sel].copy(), ones.copy())

    def scan_chunks(
        self, epoch: int, scan_steps: int
    ) -> Iterator[tuple[int, tuple[np.ndarray, np.ndarray, np.ndarray]]]:
        """Stack ``scan_steps`` batches per dispatch: (nb, (ids, y, w)) with
        ids [T, B, S]; the last chunk is padded to T with weight-0 steps."""
        B, S = self.batch_size, self.schema.num_slots
        stack: list[Batch] = []

        def emit(stack):
            nb = len(stack)
            ids_t = np.stack([b.ids for b in stack])
            y_t = np.stack([b.labels for b in stack])
            w_t = np.stack([b.weights for b in stack])
            if nb < scan_steps:
                padb = scan_steps - nb
                ids_t = np.concatenate(
                    [ids_t, np.full((padb, B, S), self.schema.pad_id, np.int32)]
                )
                y_t = np.concatenate([y_t, np.zeros((padb, B), np.float32)])
                w_t = np.concatenate([w_t, np.zeros((padb, B), np.float32)])
            return nb, (ids_t, y_t, w_t)

        for b in self.batches(epoch):
            stack.append(b)
            if len(stack) == scan_steps:
                yield emit(stack)
                stack = []
        if stack:
            yield emit(stack)

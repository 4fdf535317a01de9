"""Criteo raw-format parser with hash-trick encoding.

The stretch config (BASELINE.json:11, "DeepFM-style FNN on Criteo 1TB-scale
hash space") needs data the reference never handled: Criteo's raw TSV
(``label \\t I1..I13 \\t C1..C26``, integer + hex-categorical columns, blanks
allowed).  Encoding follows the standard Criteo recipe:

- integer features: log-squash bucketing ``floor(log(x+1)^2)`` (negative /
  blank -> dedicated bucket), one small vocab per column;
- categorical features: deterministic 64-bit FNV-1a hash of the raw token
  modulo a per-column bucket count (the "hash trick") — the same hash on
  every host/restart, which the row-sharded tables rely on.

Produces a :class:`deepctr_tpu.data.schema.Schema` (13 int + 26 cat fields)
and packed ``int32[B, 39]`` id tensors, directly consumable by every model
and by the sharded trainer.
"""

from __future__ import annotations

import math

import numpy as np

from .schema import FieldSpec, Schema

NUM_INT = 13
NUM_CAT = 26

_INT_BUCKETS = 64          # covers floor(log(x+1)^2) for x up to ~1e9, plus specials
_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = (1 << 64) - 1


def criteo_schema(cat_buckets: int = 100_000) -> Schema:
    """13 bucketised integer fields + 26 hashed categorical fields."""
    fields = [FieldSpec(f"I{i+1}", _INT_BUCKETS) for i in range(NUM_INT)]
    fields += [FieldSpec(f"C{i+1}", cat_buckets) for i in range(NUM_CAT)]
    return Schema(tuple(fields))


def _int_bucket(tok: bytes) -> int:
    if not tok:
        return 0                      # missing
    try:
        v = int(tok)
    except ValueError:
        return 1                      # malformed
    if v < 0:
        return 2
    b = int(math.floor(math.log(v + 1.0) ** 2)) + 3
    return min(b, _INT_BUCKETS - 1)


def fnv1a64(data: bytes) -> int:
    """Deterministic 64-bit FNV-1a (stable across hosts/restarts/versions)."""
    h = _FNV_OFFSET
    for byte in data:
        h ^= byte
        h = (h * _FNV_PRIME) & _MASK64
    return h


def parse_criteo_lines(
    lines: list[bytes], schema: Schema
) -> tuple[np.ndarray, np.ndarray]:
    """Parse raw Criteo TSV lines -> (labels float32[B], ids int32[B, 39])."""
    cat_buckets = schema.fields[NUM_INT].vocab_size
    offsets = schema.offsets
    B = len(lines)
    labels = np.zeros(B, np.float32)
    ids = np.full((B, NUM_INT + NUM_CAT), schema.pad_id, np.int32)
    r = 0
    for line in lines:
        if isinstance(line, str):
            line = line.encode()
        line = line.rstrip(b"\r\n")
        if not line:
            continue
        cols = line.split(b"\t")
        labels[r] = float(cols[0] or 0)
        for i in range(NUM_INT):
            tok = cols[1 + i] if 1 + i < len(cols) else b""
            ids[r, i] = offsets[i] + _int_bucket(tok)
        for j in range(NUM_CAT):
            tok = cols[1 + NUM_INT + j] if 1 + NUM_INT + j < len(cols) else b""
            f = NUM_INT + j
            if tok:
                ids[r, f] = offsets[f] + fnv1a64(tok) % cat_buckets
            else:
                ids[r, f] = offsets[f]  # missing -> bucket 0
        r += 1
    return labels[:r], ids[:r]


def parse_criteo_file(
    path: str, schema: Schema, use_native: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    if use_native:
        try:
            from . import native

            return native.parse_criteo_file(path, schema)
        except Exception:
            pass
    with open(path, "rb") as f:
        return parse_criteo_lines(f.read().splitlines(), schema)

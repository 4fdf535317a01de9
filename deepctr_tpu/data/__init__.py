"""Data layer: schemas, parsers, synthetic data, streaming pipeline, cache.

Reference parity: component C3 (SURVEY.md §2.1) — yx/libsvm parsing, one-hot
index utilities, batch slicing — redesigned as packed per-field int32 ID
tensors with a prefetching host pipeline (BASELINE.json:5).
"""

from .schema import FieldSpec, Schema, ipinyou_full_schema, ipinyou_like_schema, make_schema
from .parser import parse_yx_file, parse_yx_lines, pack_ids
from .featindex import FeatIndex, load_featindex
from .pipeline import Batch, DevicePrefetcher, epoch_iterator, minibatches
from .stream import StreamSource, expand_shards
from .synthetic import SyntheticDataset, generate, write_yx_file

__all__ = [
    "FieldSpec",
    "Schema",
    "ipinyou_full_schema",
    "ipinyou_like_schema",
    "make_schema",
    "parse_yx_file",
    "parse_yx_lines",
    "pack_ids",
    "FeatIndex",
    "load_featindex",
    "Batch",
    "DevicePrefetcher",
    "epoch_iterator",
    "minibatches",
    "StreamSource",
    "expand_shards",
    "SyntheticDataset",
    "generate",
    "write_yx_file",
]

"""Synthetic multi-field CTR data with a planted FM ground truth.

The environment ships no iPinYou data and the reference mount was empty
(SURVEY.md §0), so parity targets are established by reproduction: this
module generates iPinYou-shaped data from a *known* factorization-machine
process, giving every model a learnable signal and a measurable AUC ceiling
(the Bayes-optimal score is the planted model itself).

Used by tests (overfit/learnability checks, SURVEY.md §4) and by bench.py.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .schema import Schema, ipinyou_like_schema


@dataclasses.dataclass
class SyntheticDataset:
    schema: Schema
    ids: np.ndarray        # int32[N, S]
    labels: np.ndarray     # float32[N]
    bayes_logits: np.ndarray  # float32[N] — planted-model logits (AUC ceiling)


def _zipf_probs(n: int, alpha: float, rng: np.random.Generator) -> np.ndarray:
    """Zipf-ish categorical distribution (CTR vocabularies are heavy-tailed)."""
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks ** (-alpha)
    rng.shuffle(p)
    return p / p.sum()


def generate(
    schema: Schema | None = None,
    num_examples: int = 100_000,
    k: int = 4,
    base_ctr: float = 0.08,
    noise: float = 0.5,
    zipf_alpha: float = 1.05,
    seed: int = 0,
) -> SyntheticDataset:
    """Sample ids per field (Zipf marginals) and labels from a planted FM.

    The planted process: y ~ Bernoulli(sigmoid(b0 + sum w_g + sum <v_i,v_j> + eps)),
    matching the FM functional form of SURVEY.md §2.3 so LR underfits it and
    FM/FNN can close the gap — the same qualitative ordering the reference
    paper reports on iPinYou.
    """
    schema = schema or ipinyou_like_schema()
    rng = np.random.default_rng(seed)
    S = schema.num_slots
    V = schema.vocab_size

    ids = np.full((num_examples, S), schema.pad_id, dtype=np.int32)
    slot_base = schema.slot_offsets
    offsets = schema.offsets
    for fi, field in enumerate(schema.fields):
        probs = _zipf_probs(field.vocab_size, zipf_alpha, rng)
        # multi-value fields: 1 + Binomial(max_len-1, 0.6) values, packed
        # contiguously from the field's first slot (canonical packed form)
        count = 1 + rng.binomial(field.max_len - 1, 0.6, size=num_examples)
        for j in range(field.max_len):
            col = slot_base[fi] + j
            vals = rng.choice(field.vocab_size, size=num_examples, p=probs)
            gids = (offsets[fi] + vals).astype(np.int32)
            present = count > j
            ids[present, col] = gids[present]

    # Planted FM parameters over the global vocab.
    w = rng.normal(0.0, 0.35, size=V + 1).astype(np.float32)
    v = rng.normal(0.0, 0.35 / np.sqrt(k), size=(V + 1, k)).astype(np.float32)
    w[schema.pad_id] = 0.0
    v[schema.pad_id] = 0.0

    lin = w[ids].sum(axis=1)
    vv = v[ids]                      # [N, S, k]
    s = vv.sum(axis=1)               # [N, k]
    sq = (vv * vv).sum(axis=1)       # [N, k]
    inter = 0.5 * (s * s - sq).sum(axis=1)
    logits = lin + inter
    logits = (logits - logits.mean()) / (logits.std() + 1e-9)
    b0 = float(np.log(base_ctr / (1 - base_ctr)))
    bayes = (b0 + 1.5 * logits).astype(np.float32)
    noisy = bayes + rng.normal(0.0, noise, size=num_examples).astype(np.float32)
    labels = (rng.random(num_examples) < 1.0 / (1.0 + np.exp(-noisy))).astype(
        np.float32
    )
    return SyntheticDataset(schema=schema, ids=ids, labels=labels, bayes_logits=bayes)


def write_yx_file(ds: SyntheticDataset, path: str) -> None:
    """Serialise to the reference's yx text format (for parser round-trips)."""
    pad = ds.schema.pad_id
    with open(path, "w") as f:
        for y, row in zip(ds.labels, ds.ids):
            toks = [str(int(y))]
            toks += [f"{g}:1" for g in row if g != pad]
            f.write(" ".join(toks) + "\n")

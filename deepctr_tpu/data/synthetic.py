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
    teacher: str = "fm",
) -> SyntheticDataset:
    """Sample ids per field (Zipf marginals) and labels from a planted model.

    ``teacher`` selects the planted process:

    - ``"fm"`` (default): y ~ Bernoulli(sigmoid(b0 + Σ w_g + Σ <v_i,v_j> + ε)),
      the FM functional form of SURVEY.md §2.3.  LR underfits it; FM/FNN can
      close the gap — but by construction NO model can beat FM on it, so it
      anchors parity, not the paper's deep-beats-shallow claim.
    - ``"mlp"``: a standardized mix of linear + FM-pairwise + a random tanh-MLP
      over concatenated per-field teacher embeddings.  The MLP tier carries
      genuinely higher-order structure (any *pairwise* value function is
      rank-limited FM-representable — e.g. XOR parity h(v1)·h(v2) is rank 1 —
      so discriminating deep from shallow requires >2-way interactions).  On
      this process the reference paper's qualitative ordering (FNN/SNN above
      LR, FM in between; arXiv:1601.02376, SURVEY.md §6) is reproducible:
      see tools/reproduce.py and tests/test_reproduce.py's ordering gate.
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

    def std(x):
        return (x - x.mean()) / (x.std() + 1e-9)

    if teacher == "fm":
        logits = std(lin + inter)
    elif teacher == "mlp":
        # Higher-order tier: random 2-hidden-layer tanh MLP over concatenated
        # per-field teacher embeddings (field-pooled for multi-value fields).
        d, h1, h2 = 6, 64, 32
        F = schema.num_fields
        E = rng.normal(0.0, 1.0, size=(V + 1, d)).astype(np.float32)
        E[schema.pad_id] = 0.0
        emb = E[ids]                                   # [N, S, d]
        pooled = np.zeros((num_examples, F, d), np.float32)
        sf = schema.slot_field
        for col in range(S):
            pooled[:, sf[col], :] += emb[:, col, :]
        u = pooled.reshape(num_examples, F * d)
        W1 = rng.normal(0.0, np.sqrt(2.0 / (F * d)), size=(F * d, h1))
        b1 = rng.normal(0.0, 0.5, size=h1)
        W2 = rng.normal(0.0, np.sqrt(2.0 / h1), size=(h1, h2))
        b2 = rng.normal(0.0, 0.5, size=h2)
        W3 = rng.normal(0.0, np.sqrt(2.0 / h2), size=(h2,))
        deep = np.tanh(np.tanh(u @ W1 + b1) @ W2 + b2) @ W3
        # standardize each tier so the mix is controlled: enough linear for
        # LR to be clearly above chance, enough pairwise for FM to beat LR,
        # and a dominant deep tier only deep models can capture
        # mix tuned so the gaps are measurable under an 8-epoch SGD budget:
        # LR +0.004 below FM, FM +0.004 below FNN, ~0.008 LR->FNN (the paper
        # reports 0.5-2 AUC points LR->FNN on iPinYou; SURVEY.md §6)
        logits = std(0.4 * std(lin) + 0.5 * std(inter) + 1.5 * std(deep))
    else:
        raise ValueError(f"unknown teacher {teacher!r} (fm|mlp)")
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

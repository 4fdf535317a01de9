"""NumPy reimplementation of the reference's SNN trainers (C7/C8).

Functional spec per SURVEY.md §2.3/§3.4 (paper-derived): the bottom layer is
fully connected over the ENTIRE one-hot vector (a [V+1, h1] weight matrix,
i.e. an embedding-bag sum over active ids), sigmoid activation, pretrained
unsupervised as a denoising auto-encoder (SNN-DAE) or an RBM via CD-1
contrastive divergence (SNN-RBM), with **per-field negative sampling**
(touch the active unit of each field plus m sampled units of the same
field).  The supervised phase fine-tunes like FNN's top stack.

Faithful to the reference's execution model: negative sampling and
corruption run in host NumPy RNG per batch (SURVEY.md §3.4 "per-field
negative sampling done in NumPy on the host per batch"), minibatch SGD with
``np.add.at`` sparse updates (Theano ``inc_subtensor`` semantics).

The supervised phase mirrors deepctr_tpu.models.snn.SNNModel exactly
(trajectory-tested in tests/test_parity.py); the pretraining phases mirror
DaePretrainer/RbmPretrainer math with host RNG (outcome-level AUC parity in
PARITY.md, since the RNG streams cannot match across frameworks).
"""

from __future__ import annotations

import numpy as np

from ..data.schema import Schema
from .numpy_ref import _sigmoid


def _field_arrays(schema: Schema):
    offsets = np.asarray(schema.offsets, np.int64)
    vocabs = np.asarray([f.vocab_size for f in schema.fields], np.int64)
    return offsets, vocabs


def _sample_negatives(rng, offsets, vocabs, batch: int, m: int) -> np.ndarray:
    """m uniform ids per field per example -> int64[B, F*m] (mirrors
    models.snn.sample_negatives: uniform over the field's vocab; may rarely
    hit the active unit, which is harmless)."""
    F = len(offsets)
    u = rng.random((batch, F, m))
    ids = offsets[None, :, None] + np.floor(u * vocabs[None, :, None]).astype(
        np.int64
    )
    return ids.reshape(batch, F * m)


class NumpyDae:
    """Denoising auto-encoder pretrainer, tied weights, sampled decoder
    (reference C7).  Mirrors models.snn.DaePretrainer's math with host RNG."""

    def __init__(self, schema: Schema, hidden1: int = 200, m: int = 2,
                 corruption: float = 0.3, lr: float = 0.1, seed: int = 0):
        rng = np.random.default_rng(seed)
        V = schema.padded_vocab_size
        self.schema, self.m, self.corruption, self.lr = schema, m, corruption, lr
        self.table = (0.01 * rng.standard_normal((V, hidden1))).astype(np.float32)
        self.table[schema.pad_id] = 0.0
        self.b1 = np.zeros(hidden1, np.float32)
        self.vbias = np.zeros(V, np.float32)
        self.rng = rng
        self.offsets, self.vocabs = _field_arrays(schema)

    def train_batch(self, ids, noise=None) -> float:
        """``noise`` = {"u_keep": [B,S], "u_neg": [B,F,m]} uniforms override
        the host draws (matched-noise parity vs models.snn.DaePretrainer)."""
        B, S = ids.shape
        mask = (ids != self.schema.pad_id).astype(np.float32)
        if noise is None:
            u_keep = self.rng.random((B, S))
            u_neg = self.rng.random((B, len(self.offsets), self.m))
        else:
            u_keep, u_neg = noise["u_keep"], noise["u_neg"]
        keep = (u_keep < 1.0 - self.corruption).astype(np.float32) * mask
        neg = (
            self.offsets[None, :, None]
            + np.floor(u_neg * self.vocabs[None, :, None]).astype(np.int64)
        ).reshape(B, len(self.offsets) * self.m)
        cand = np.concatenate([ids, neg], axis=1)                  # [B, C]
        targets = np.concatenate([mask, np.zeros_like(neg, np.float32)], 1)
        cweight = np.concatenate([mask, np.ones_like(neg, np.float32)], 1)

        enc_rows = self.table[ids]                                  # [B, S, h]
        cand_rows = self.table[cand]                                # [B, C, h]
        h = _sigmoid((enc_rows * keep[..., None]).sum(1) + self.b1)  # [B, h]
        logits = np.einsum("bh,bch->bc", h, cand_rows) + self.vbias[cand]
        p = _sigmoid(logits)
        denom = max(cweight.sum(), 1.0)
        # weighted-mean BCE over candidates (pad slots weight 0)
        with np.errstate(over="ignore"):
            per = np.logaddexp(0.0, logits) - targets * logits
        loss = float((per * cweight).sum() / denom)

        dlogit = ((p - targets) * cweight / denom).astype(np.float32)  # [B, C]
        g_cand = dlogit[..., None] * h[:, None, :]                   # [B, C, h]
        g_h = np.einsum("bc,bch->bh", dlogit, cand_rows)
        g_z = g_h * h * (1.0 - h)
        g_enc = g_z[:, None, :] * keep[..., None]                    # [B, S, h]

        lr = self.lr
        np.add.at(self.table, ids.reshape(-1),
                  -lr * g_enc.reshape(-1, g_enc.shape[-1]))
        np.add.at(self.table, cand.reshape(-1),
                  -lr * g_cand.reshape(-1, g_cand.shape[-1]))
        np.add.at(self.vbias, cand.reshape(-1), -lr * dlogit.reshape(-1))
        self.b1 -= lr * g_z.sum(axis=0)
        self.table[self.schema.pad_id] = 0.0
        return loss


class NumpyRbm:
    """RBM CD-1 pretrainer restricted to sampled visible units (reference
    C8).  Mirrors models.snn.RbmPretrainer's statistics with host RNG."""

    def __init__(self, schema: Schema, hidden1: int = 200, m: int = 2,
                 lr: float = 0.1, seed: int = 0):
        rng = np.random.default_rng(seed)
        V = schema.padded_vocab_size
        self.schema, self.m, self.lr = schema, m, lr
        self.table = (0.01 * rng.standard_normal((V, hidden1))).astype(np.float32)
        self.table[schema.pad_id] = 0.0
        self.b1 = np.zeros(hidden1, np.float32)
        self.vbias = np.zeros(V, np.float32)
        self.rng = rng
        self.offsets, self.vocabs = _field_arrays(schema)

    def train_batch(self, ids, noise=None) -> float:
        """``noise`` = {"u_neg": [B,F,m], "u_h0": [B,h1]} uniforms override
        the host draws (matched-noise parity vs models.snn.RbmPretrainer)."""
        B, S = ids.shape
        mask = (ids != self.schema.pad_id).astype(np.float32)
        if noise is None:
            u_neg = self.rng.random((B, len(self.offsets), self.m))
        else:
            u_neg = noise["u_neg"]
        neg = (
            self.offsets[None, :, None]
            + np.floor(u_neg * self.vocabs[None, :, None]).astype(np.int64)
        ).reshape(B, len(self.offsets) * self.m)
        cand = np.concatenate([ids, neg], axis=1)                   # [B, C]
        v0 = np.concatenate([mask, np.zeros_like(neg, np.float32)], 1)
        cweight = np.concatenate([mask, np.ones_like(neg, np.float32)], 1)

        W = self.table[cand]                                        # [B, C, h]
        c = self.vbias[cand]                                        # [B, C]
        h0p = _sigmoid(np.einsum("bc,bch->bh", v0 * cweight, W) + self.b1)
        u_h0 = self.rng.random(h0p.shape) if noise is None else noise["u_h0"]
        h0 = (u_h0 < h0p).astype(np.float32)
        v1p = _sigmoid(np.einsum("bh,bch->bc", h0, W) + c) * cweight
        h1p = _sigmoid(np.einsum("bc,bch->bh", v1p, W) + self.b1)

        pos = (v0 * cweight)[..., None] * h0p[:, None, :]
        negs = v1p[..., None] * h1p[:, None, :]
        gW = -(pos - negs) / B                                       # descent
        g_vb = -((v0 - v1p) * cweight) / B
        g_b1 = -(h0p - h1p).mean(axis=0)

        lr = self.lr
        np.add.at(self.table, cand.reshape(-1),
                  -lr * gW.reshape(-1, gW.shape[-1]).astype(np.float32))
        np.add.at(self.vbias, cand.reshape(-1), -lr * g_vb.reshape(-1))
        self.b1 -= lr * g_b1.astype(np.float32)
        self.table[self.schema.pad_id] = 0.0
        return float(((v0 - v1p) ** 2 * cweight).sum() / max(cweight.sum(), 1.0))


class NumpySnn:
    """Supervised SNN fine-tune phase: sigmoid embedding-bag bottom layer +
    tanh MLP, minibatch SGD (mirrors models.snn.SNNModel + SparseSgd +
    optax.sgd exactly; trajectory-tested)."""

    def __init__(self, schema: Schema, hidden1: int = 200,
                 hidden: tuple = (300, 100), lr: float = 0.01, seed: int = 0,
                 table: np.ndarray | None = None, b1: np.ndarray | None = None):
        rng = np.random.default_rng(seed)
        V = schema.padded_vocab_size
        self.schema, self.lr = schema, lr
        if table is not None:
            assert table.shape == (V, hidden1)
            self.table = np.asarray(table, np.float32).copy()
        else:
            self.table = (0.01 * rng.standard_normal((V, hidden1))).astype(
                np.float32
            )
            self.table[schema.pad_id] = 0.0
        self.b1 = (np.zeros(hidden1, np.float32) if b1 is None
                   else np.asarray(b1, np.float32).copy())
        dims = (hidden1,) + tuple(hidden) + (1,)
        self.layers = []
        for i in range(len(dims) - 1):
            lim = np.sqrt(6.0 / (dims[i] + dims[i + 1]))
            self.layers.append(
                [rng.uniform(-lim, lim, (dims[i], dims[i + 1])).astype(np.float32),
                 np.zeros(dims[i + 1], np.float32)]
            )

    def forward(self, ids, return_cache=False):
        mask = (ids != self.schema.pad_id).astype(np.float32)
        rows = self.table[ids] * mask[..., None]                    # [B, S, h1]
        z = rows.sum(axis=1) + self.b1
        h = _sigmoid(z)
        acts = [h]
        a = h
        for i, (W, b) in enumerate(self.layers):
            zz = a @ W + b
            a = np.tanh(zz) if i < len(self.layers) - 1 else zz
            acts.append(a)
        logit = a[:, 0]
        if return_cache:
            return logit, (acts, mask, h)
        return logit

    def train_batch(self, ids, y):
        logit, (acts, mask, h) = self.forward(ids, return_cache=True)
        p = _sigmoid(logit)
        B = len(y)
        gh = ((p - y) / B).astype(np.float32)[:, None]
        for i in reversed(range(len(self.layers))):
            W, b = self.layers[i]
            gW = acts[i].T @ gh
            gb = gh.sum(axis=0)
            ga = gh @ W.T
            if i > 0:
                ga = ga * (1.0 - acts[i] * acts[i])
            W -= self.lr * gW
            b -= self.lr * gb
            gh = ga
        # through the sigmoid bottom: dL/dz = gh * h * (1 - h)
        g_z = gh * h * (1.0 - h)                                     # [B, h1]
        g_rows = g_z[:, None, :] * mask[..., None]                   # [B, S, h1]
        np.add.at(self.table, ids.reshape(-1),
                  -self.lr * g_rows.reshape(-1, g_rows.shape[-1]))
        self.b1 -= self.lr * g_z.sum(axis=0)
        self.table[self.schema.pad_id] = 0.0

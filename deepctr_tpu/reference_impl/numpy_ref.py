"""NumPy reimplementation of the reference's LR/FM/FNN trainers.

Functional spec per SURVEY.md §2.3 (paper-derived): one-hot multi-field
input, binary cross-entropy, minibatch SGD touching only active rows
(Theano ``inc_subtensor`` semantics), tanh MLP for FNN with FM-initialised
bottom embeddings.  Used to establish measured AUC/logloss baselines
(SURVEY.md §6) and the bench.py throughput reference.
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np

from ..data.schema import Schema


def _sigmoid(x):
    out = np.empty_like(x)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    ex = np.exp(x[~pos])
    out[~pos] = ex / (1.0 + ex)
    return out


class NumpyLR:
    """σ(Σ w_i + b), sparse SGD with L2 (reference C4)."""

    def __init__(self, schema: Schema, lr=0.01, l2=0.0, seed=0):
        self.schema = schema
        self.w = np.zeros(schema.padded_vocab_size, np.float32)
        self.b = 0.0
        self.lr, self.l2 = lr, l2

    def forward(self, ids):
        mask = ids != self.schema.pad_id
        return (self.w[ids] * mask).sum(axis=1) + self.b

    def train_batch(self, ids, y):
        mask = ids != self.schema.pad_id
        p = _sigmoid(self.forward(ids))
        g = (p - y) / len(y)                      # dL/dlogit
        # scatter-add per active occurrence (duplicates accumulate, as Theano
        # inc_subtensor does)
        gw = np.where(mask, g[:, None], 0.0)
        np.add.at(self.w, ids, -self.lr * (gw + self.l2 * self.w[ids] * mask))
        self.b -= self.lr * g.sum()


class NumpyFM:
    """w0 + Σw_i + sum-of-squares interaction, sparse SGD (reference C5)."""

    def __init__(self, schema: Schema, k=10, lr=0.01, l2=0.0, sigma=0.01, seed=0):
        rng = np.random.default_rng(seed)
        V = schema.padded_vocab_size
        self.schema, self.k, self.lr, self.l2 = schema, k, lr, l2
        self.w = np.zeros(V, np.float32)
        self.v = (sigma * rng.standard_normal((V, k))).astype(np.float32)
        self.v[schema.pad_id] = 0.0
        self.b = 0.0

    def forward(self, ids, return_cache=False):
        mask = (ids != self.schema.pad_id).astype(np.float32)
        vv = self.v[ids] * mask[..., None]        # [B, S, k]
        s = vv.sum(axis=1)                        # [B, k]
        sq = (vv * vv).sum(axis=1)
        inter = 0.5 * (s * s - sq).sum(axis=1)
        lin = (self.w[ids] * mask).sum(axis=1)
        logit = lin + inter + self.b
        if return_cache:
            return logit, (mask, vv, s)
        return logit

    def train_batch(self, ids, y):
        logit, (mask, vv, s) = self.forward(ids, return_cache=True)
        p = _sigmoid(logit)
        g = ((p - y) / len(y)).astype(np.float32)
        gw = np.where(mask > 0, g[:, None], 0.0)
        # d inter / d v_i = s - v_i  (standard FM gradient)
        gv = g[:, None, None] * (s[:, None, :] - vv) * mask[..., None]
        np.add.at(self.w, ids, -self.lr * (gw + self.l2 * self.w[ids] * mask))
        flat = ids.reshape(-1)
        np.add.at(
            self.v,
            flat,
            -self.lr
            * (gv + self.l2 * vv).reshape(len(flat), self.k),
        )
        self.v[self.schema.pad_id] = 0.0
        self.b -= self.lr * g.sum()

    @property
    def table(self) -> np.ndarray:
        """(w|v) packed like FMModel's table — for FNN init and parity."""
        return np.concatenate([self.w[:, None], self.v], axis=1)


class NumpyFNN:
    """FM-initialised tanh MLP (reference C6). Sum-pools multi-slot fields."""

    def __init__(self, schema: Schema, k=10, hidden=(200, 300, 100), lr=0.01,
                 seed=0, fm_table: np.ndarray | None = None):
        rng = np.random.default_rng(seed)
        V = schema.padded_vocab_size
        D = 1 + k
        self.schema, self.k, self.lr = schema, k, lr
        if fm_table is not None:
            assert fm_table.shape == (V, D)
            self.table = fm_table.astype(np.float32).copy()
        else:
            self.table = (0.01 * rng.standard_normal((V, D))).astype(np.float32)
            self.table[schema.pad_id] = 0.0
        self.slot_field = np.asarray(schema.slot_field)
        F = schema.num_fields
        dims = (F * D,) + tuple(hidden) + (1,)
        self.layers = []
        for i in range(len(dims) - 1):
            lim = np.sqrt(6.0 / (dims[i] + dims[i + 1]))
            self.layers.append(
                [
                    rng.uniform(-lim, lim, (dims[i], dims[i + 1])).astype(np.float32),
                    np.zeros(dims[i + 1], np.float32),
                ]
            )

    def _bottom(self, ids):
        mask = (ids != self.schema.pad_id).astype(np.float32)
        rows = self.table[ids] * mask[..., None]          # [B, S, D]
        F = self.schema.num_fields
        B, S, D = rows.shape
        pooled = np.zeros((B, F, D), np.float32)
        np.add.at(pooled.transpose(1, 0, 2), self.slot_field, rows.transpose(1, 0, 2))
        return pooled.reshape(B, F * D), mask

    def forward(self, ids, return_cache=False):
        x0, mask = self._bottom(ids)
        acts = [x0]
        h = x0
        for i, (W, b) in enumerate(self.layers):
            z = h @ W + b
            h = np.tanh(z) if i < len(self.layers) - 1 else z
            acts.append(h)
        logit = h[:, 0]
        if return_cache:
            return logit, (acts, mask)
        return logit

    def train_batch(self, ids, y):
        logit, (acts, mask) = self.forward(ids, return_cache=True)
        p = _sigmoid(logit)
        B = len(y)
        gh = ((p - y) / B).astype(np.float32)[:, None]     # [B, 1]
        for i in reversed(range(len(self.layers))):
            W, b = self.layers[i]
            a_in = acts[i]
            gW = a_in.T @ gh
            gb = gh.sum(axis=0)
            ga = gh @ W.T
            if i > 0:                                      # through tanh
                ga = ga * (1.0 - acts[i] * acts[i])
            W -= self.lr * gW
            b -= self.lr * gb
            gh = ga
        # gh: [B, F*D] -> route back to slots -> sparse table update
        F = self.schema.num_fields
        D = 1 + self.k
        g_pooled = gh.reshape(B, F, D)
        g_rows = g_pooled[:, self.slot_field, :] * mask[..., None]
        flat = ids.reshape(-1)
        np.add.at(self.table, flat, -self.lr * g_rows.reshape(len(flat), D))
        self.table[self.schema.pad_id] = 0.0


def train_numpy_model(
    model, ids, labels, *, batch_size=1024, epochs=1, seed=0, shuffle=True,
    max_seconds: float | None = None,
):
    """Reference-style epoch loop. Returns (examples_seen, elapsed_s)."""
    n = ids.shape[0]
    seen = 0
    t0 = time.perf_counter()
    for epoch in range(epochs):
        order = np.arange(n)
        if shuffle:
            np.random.default_rng(seed + epoch).shuffle(order)
        for s in range(0, n - batch_size + 1, batch_size):
            sel = order[s : s + batch_size]
            model.train_batch(ids[sel], labels[sel])
            seen += batch_size
            if max_seconds is not None and time.perf_counter() - t0 > max_seconds:
                return seen, time.perf_counter() - t0
    return seen, time.perf_counter() - t0

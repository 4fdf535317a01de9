"""Prototype: measure mixed small-field-onehot-matmul / big-field-scatter
gradient accumulation vs the all-scatter status quo."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

B = 8192
D = 11
T = 8

from deepctr_tpu.data.schema import ipinyou_full_schema

schema = ipinyou_full_schema()
S = schema.num_slots
V = schema.padded_vocab_size


def marginal(run):
    run(T); run(2 * T)
    a = run(T); b = run(2 * T)
    return max(b - a, 1e-9) / T


def main():
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (V, D), jnp.float32)
    # realistic ids: each slot uniform over its own field vocab
    rng = np.random.default_rng(0)
    offs = schema.offsets
    cols = []
    for f, off in zip(schema.fields, offs):
        for _ in range(f.max_len):
            cols.append(rng.integers(off, off + f.vocab_size,
                                     size=(2 * T, B)).astype(np.int32))
    ids = jnp.asarray(np.stack(cols, axis=-1))  # [2T, B, S]
    g_rows = jax.random.normal(key, (2 * T, B, S, D), jnp.float32)
    for x in (table, ids, g_rows):
        x.block_until_ready()
    float(table.sum())

    for thresh in (512, 1024, 8192, 16384):
        small, big = [], []
        slot = 0
        for f, off in zip(schema.fields, offs):
            sl = list(range(slot, slot + f.max_len))
            (small if f.vocab_size <= thresh else big).append((f, int(off), sl))
            slot += f.max_len
        big_slots = jnp.asarray(sum((sl for _, _, sl in big), []), jnp.int32)

        @partial(jax.jit, static_argnums=0)
        def mixed_scan(c, table, ids, g_rows):
            def body(tbl, batch):
                idx, g = batch
                scratch = jnp.zeros_like(tbl)
                # big fields: occurrence scatter
                bi = idx[:, big_slots].reshape(-1)
                bg = g[:, big_slots].reshape(-1, D)
                scratch = scratch.at[bi].add(bg)
                # small fields: one-hot matmul per field, dense patch
                for f, off, sl in small:
                    local = idx[:, jnp.asarray(sl)] - off  # [B, L]
                    oh = (local[..., None] ==
                          jnp.arange(f.vocab_size)[None, None, :]).astype(
                              jnp.float32)  # [B, L, Vf]
                    gf = jnp.einsum("blv,bld->vd", oh, g[:, jnp.asarray(sl)],
                                    precision=jax.lax.Precision.HIGHEST)
                    scratch = jax.lax.dynamic_update_slice(scratch, gf, (off, 0))
                return tbl + 1e-12 * scratch, None
            out, _ = jax.lax.scan(body, table, (ids[:c], g_rows[:c]))
            return out

        def m_run(c):
            t0 = time.perf_counter()
            out = mixed_scan(c, table, ids, g_rows)
            float(out[0, 0])
            return time.perf_counter() - t0

        ms = marginal(m_run) * 1e3
        nbig = len(big_slots) * B
        print(f"thresh {thresh:6d}: grad-accum {ms:7.3f} ms "
              f"({len(big)} big fields, {nbig} scatter rows)")

    # status quo for comparison: all-scatter
    @partial(jax.jit, static_argnums=0)
    def allscatter_scan(c, table, ids, g_rows):
        def body(tbl, batch):
            idx, g = batch
            scratch = jnp.zeros_like(tbl).at[idx.reshape(-1)].add(
                g.reshape(-1, D))
            return tbl + 1e-12 * scratch, None
        out, _ = jax.lax.scan(body, table, (ids[:c], g_rows[:c]))
        return out

    def s_run(c):
        t0 = time.perf_counter()
        out = allscatter_scan(c, table, ids, g_rows)
        float(out[0, 0])
        return time.perf_counter() - t0
    print(f"all-scatter       : grad-accum {marginal(s_run)*1e3:7.3f} ms")

    # gather comparison: full take vs big-only take + small onehot matmul fwd
    @partial(jax.jit, static_argnums=0)
    def take_scan(c, table, ids):
        def body(carry, idx):
            return carry + jnp.take(table, idx, axis=0).sum(), None
        out, _ = jax.lax.scan(body, 0.0, ids[:c])
        return out

    def t_run(c):
        t0 = time.perf_counter()
        out = take_scan(c, table, ids)
        float(out)
        return time.perf_counter() - t0
    print(f"gather all-take   : {marginal(t_run)*1e3:7.3f} ms")


if __name__ == "__main__":
    main()

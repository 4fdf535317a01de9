"""Quantized-serving gather lab: can packing beat XLA's sub-32-bit gather?

BENCH.md (serving table): the bf16/int8 Scorer paths run at ~2.6x / ~2x
SLOWER than f32 because XLA's TPU gather from sub-32-bit tables takes a
per-element slow path.  Hypothesis: bitcast the quantized table rows into
int32 words ([V, 12] bf16 -> [V, 6] int32; [V, 12] int8 -> [V, 3] int32),
gather 32-bit words on the fast path, and unpack the (small) gathered rows.

Run: python tools/quant_gather_lab.py   (real TPU)
Prints ns/row per variant with the marginal-scan protocol (BENCH.md).
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

T_SMALL, T_BIG = 10, 20
BATCH = 8192
NBIG = 3          # big slots per example at full-iPinYou scale
D = 11
V = 927_658


def main():
    import jax
    import jax.numpy as jnp

    M = BATCH * NBIG
    rng = np.random.default_rng(0)
    table_f32 = jnp.asarray(rng.standard_normal((V, D)), jnp.float32)
    # padded to an even / mult-of-4 D for the packed variants
    Dp = 12
    tpad = jnp.pad(table_f32, ((0, 0), (0, Dp - D)))
    table_bf16 = tpad.astype(jnp.bfloat16)
    table_bf16_packed = jax.lax.bitcast_convert_type(
        table_bf16.reshape(V, Dp // 2, 2), jnp.int32
    ).reshape(V, Dp // 2)
    scales = jnp.maximum(jnp.abs(tpad).max(axis=1, keepdims=True), 1e-12) / 127.0
    table_i8 = jnp.clip(jnp.round(tpad / scales), -127, 127).astype(jnp.int8)
    table_i8_packed = jax.lax.bitcast_convert_type(
        table_i8.reshape(V, Dp // 4, 4), jnp.int32
    ).reshape(V, Dp // 4)

    ids_steps = jnp.asarray(
        np.sort(rng.integers(0, V, size=(T_BIG, M)), axis=1), jnp.int32
    )

    def bench(name, fn, *operands):
        from functools import partial

        @partial(jax.jit, static_argnums=2)
        def run_steps(t, ids_all, n):
            def body(c, ids):
                rows = fn(t, ids)
                return c + rows.sum(), 0
            out, _ = jax.lax.scan(body, jnp.float32(0), ids_all[:n])
            return out

        def run(n):
            t0 = time.perf_counter()
            float(run_steps(*operands, ids_steps, n))
            return time.perf_counter() - t0

        run(T_SMALL); run(T_BIG)
        a = run(T_SMALL); b = run(T_BIG)
        per_step = max(b - a, 1e-9) / (T_BIG - T_SMALL)
        print(f"{name:28s} {per_step*1e9/M:7.1f} ns/row   {per_step*1e3:.3f} ms")

    for t in (table_f32, table_bf16, table_bf16_packed, table_i8,
              table_i8_packed, scales, ids_steps):
        t.block_until_ready()

    bench("f32 gather", lambda t, ids: jnp.take(t, ids, axis=0).sum(1),
          table_f32)
    bench("bf16 gather", lambda t, ids: jnp.take(t, ids, axis=0)
          .astype(jnp.float32).sum(1), table_bf16)

    def bf16_packed(t, ids):
        w = jnp.take(t, ids, axis=0)                        # [M, 6] int32
        rows = jax.lax.bitcast_convert_type(
            w.reshape(-1, Dp // 2, 1), jnp.bfloat16
        ).reshape(-1, Dp)
        return rows.astype(jnp.float32).sum(1)

    bench("bf16 packed-int32 gather", bf16_packed, table_bf16_packed)

    bench("int8 gather", lambda t, ids: jnp.take(t, ids, axis=0)
          .astype(jnp.float32).sum(1), table_i8)

    def i8_packed(t, ids):
        w = jnp.take(t, ids, axis=0)                        # [M, 3] int32
        rows = jax.lax.bitcast_convert_type(
            w.reshape(-1, Dp // 4, 1), jnp.int8
        ).reshape(-1, Dp)
        return rows.astype(jnp.float32).sum(1)

    bench("int8 packed-int32 gather", i8_packed, table_i8_packed)


if __name__ == "__main__":
    main()

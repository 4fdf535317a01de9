"""Raw scatter-add micro-bench: what does a 24.6k-row scatter into a
[927k, D] scratch really cost, and does sorting / dtype / per-field
decomposition / row width change the rate?  Marginal 2T-vs-T scan protocol.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

V = 920_071
D = 11
N = 8192 * 3
T = 40

rng = np.random.default_rng(0)
ids_np = (rng.zipf(1.3, size=(2 * T, N)) % V).astype(np.int32)
ids = jnp.asarray(ids_np)
ids_sorted = jnp.asarray(np.sort(ids_np, axis=1))
rows = jnp.asarray(rng.standard_normal((2 * T, N, D), np.float32) * 1e-3)
rows128 = jnp.asarray(rng.standard_normal((2 * T, N, 128), np.float32) * 1e-3)


def bench(name, body, xs):
    @jax.jit
    def scan_fn(xs_):
        def step(carry, x):
            out = body(*x)
            return carry + out, carry

        return jax.lax.scan(step, jnp.zeros((), jnp.float32), xs_)

    def timed(n):
        sub = jax.tree_util.tree_map(lambda x: x[:n], xs)
        t0 = time.perf_counter()
        s, _ = scan_fn(sub)
        np.asarray(s)
        return time.perf_counter() - t0

    timed(T); timed(2 * T)
    t1, t2 = timed(T), timed(2 * T)
    ms = (t2 - t1) / T * 1e3
    print(f"{name:26s} {ms:7.3f} ms/step  ({ms * 1e6 / N:6.1f} ns/row)")


bench("scatter f32 unsorted", lambda i, r: jnp.zeros((V, D), jnp.float32).at[i].add(r)[0].sum(), (ids, rows))
bench("scatter f32 sorted-flag", lambda i, r: jnp.zeros((V, D), jnp.float32).at[i].add(r, indices_are_sorted=True)[0].sum(), (ids_sorted, rows))
bench("sort + scatter f32", lambda i, r: jnp.zeros((V, D), jnp.float32).at[jnp.sort(i)].add(r, indices_are_sorted=True)[0].sum(), (ids, rows))
bench("segment_sum", lambda i, r: jax.ops.segment_sum(r, i, num_segments=V)[0].sum(), (ids, rows))
bench("scatter f32 D=128", lambda i, r: jnp.zeros((V, 128), jnp.float32).at[i].add(r)[0].sum(), (ids, rows128))
bench(
    "scatter 3x per-field",
    lambda i, r: sum(
        jnp.zeros((V // 3 + 1, D), jnp.float32).at[i[k * 8192:(k + 1) * 8192] % (V // 3)].add(r[k * 8192:(k + 1) * 8192])[0].sum()
        for k in range(3)
    ),
    (ids, rows),
)
bench("scatter N=8192 only", lambda i, r: jnp.zeros((V, D), jnp.float32).at[i[:8192]].add(r[:8192])[0].sum(), (ids, rows))
bench("zeros+elementwise only", lambda i, r: (jnp.zeros((V, D), jnp.float32) + 1.0)[0].sum(), (ids, rows))

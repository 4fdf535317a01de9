"""Fused FM scorer Pallas kernel: linear + sum-of-squares interaction.

BASELINE.json:5: "FM pairwise-interaction term -> a single fused Pallas
sum-of-squares kernel".  One VMEM pass over the gathered (w|v) rows produces
the full FM logit contribution — no [B, k] / [B, S, k] intermediates ever
reach HBM.

TPU mapping: the per-example math
    lin   = sum_s w[s]
    s_f   = sum_s v[s, f]            (per factor f)
    sq_f  = sum_s v[s, f]^2
    out   = lin + 0.5 * sum_f (s_f^2 - sq_f)
is phrased as two MXU matmuls with a static selection matrix A
([S*D, k], A[s*D+1+f, f] = 1) and a w-selector a_w ([S*D, 1]):
    X  : [TB, S*D]   (rows flattened, mask pre-applied)
    S_ = X  @ A      -> [TB, k]
    Q_ = X² @ A      -> [TB, k]
    out = X @ a_w + 0.5 * rowsum(S_² - Q_)
so the hot loop is dense matmul on the systolic array with a lane-aligned
[TB, pad(S*D)] layout, not a sublane-hostile [TB, S, k] reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _selectors(S: int, D: int, k: int, padded: int) -> tuple[np.ndarray, np.ndarray]:
    """Static selection matrices: A picks v columns per factor, a_w picks w."""
    A = np.zeros((padded, k), np.float32)
    a_w = np.zeros((padded, 1), np.float32)
    for s in range(S):
        a_w[s * D, 0] = 1.0
        for f in range(k):
            A[s * D + 1 + f, f] = 1.0
    return A, a_w


def _kernel(x_ref, a_ref, aw_ref, out_ref):
    # selection "matmuls" must run in full f32 (HIGHEST): with the MXU's
    # default bf16 multiplies the squared sums lose ~3 decimal digits
    x = x_ref[:]                                   # [TB, P]
    hi = jax.lax.Precision.HIGHEST
    s_ = jnp.dot(x, a_ref[:], preferred_element_type=jnp.float32, precision=hi)
    q_ = jnp.dot(x * x, a_ref[:], preferred_element_type=jnp.float32, precision=hi)
    lin = jnp.dot(x, aw_ref[:], preferred_element_type=jnp.float32, precision=hi)
    inter = 0.5 * jnp.sum(s_ * s_ - q_, axis=1, keepdims=True)
    out_ref[:] = lin + inter                        # [TB, 1]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fm_scorer_fwd(x: jax.Array, A: jax.Array, a_w: jax.Array, interpret: bool):
    B, P = x.shape
    TB = 512 if B % 512 == 0 else (128 if B % 128 == 0 else B)
    grid = (B // TB,)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((TB, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((P, A.shape[1]), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TB, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * P * (2 * A.shape[1] + 1),
            bytes_accessed=4 * (B * P + P * A.shape[1] + B),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, A, a_w)
    return out[:, 0]


def fm_score_fused(
    rows: jax.Array,
    mask: jax.Array,
    k: int,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused linear + FM-interaction logits from packed (w|v) rows.

    rows: f32[B, S, 1+k] gathered table rows; mask: f32[B, S].
    Returns f32[B] = sum_s w_s + 0.5 sum_f[(sum_s v_sf)^2 - sum_s v_sf^2].

    Differentiable (custom VJP below).  ``interpret=None`` auto-selects
    interpreter mode off-TPU so CPU tests exercise the same code path.
    """
    if interpret is None:
        from .runtime import default_interpret

        interpret = default_interpret()
    B, S, D = rows.shape
    assert D == 1 + k, (D, k)
    x = (rows * mask[..., None]).reshape(B, S * D)
    padded = _round_up(S * D, 128)
    if padded != S * D:
        x = jnp.pad(x, ((0, 0), (0, padded - S * D)))
    A_np, aw_np = _selectors(S, D, k, padded)
    return _fm_scorer_fwd(x, jnp.asarray(A_np), jnp.asarray(aw_np), interpret)


# --- custom VJP: grads w.r.t. rows (mask is non-diff) -----------------------
#
# d out / d w_s  = 1
# d out / d v_sf = (sum_s' v_s'f) - v_sf
# both masked by mask_s.


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fm_score(rows, mask, k, interpret=None):
    return fm_score_fused(rows, mask, k, interpret)


def _fm_score_fwd_rule(rows, mask, k, interpret):
    out = fm_score_fused(rows, mask, k, interpret)
    return out, (rows, mask)


def _fm_score_bwd_rule(k, interpret, res, g):
    rows, mask = res
    v = rows[..., 1:] * mask[..., None]
    s = v.sum(axis=1, keepdims=True)                  # [B, 1, k]
    gv = (s - v) * g[:, None, None]                   # [B, S, k]
    gw = jnp.broadcast_to(g[:, None, None], rows[..., :1].shape)
    grows = jnp.concatenate([gw, gv], axis=-1) * mask[..., None]
    return grows, None


fm_score.defvjp(_fm_score_fwd_rule, _fm_score_bwd_rule)

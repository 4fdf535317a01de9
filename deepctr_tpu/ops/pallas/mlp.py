"""Fused dense-tower forward Pallas kernel.

BASELINE.json:5 "fused dense-tower forward/backward": the FNN/SNN hidden
stack is a chain of small matmuls (e.g. 176->200->300->100->1) whose
intermediates are tiny; one kernel keeps every activation in VMEM and all
weights resident, so a batch tile makes a single HBM round trip
(read x, write logits) instead of one per layer.

Exactness under padding: all dims are zero-padded up to lane multiples of
128.  Because tanh(0) = 0 and padded weight rows/cols and biases are zero,
padded activation columns stay exactly 0 through the chain, so results
equal the unpadded math bit-for-bit (up to normal f32 reassociation).

Backward: rematerialised standard jnp backprop (XLA-fused); the forward
kernel is the HBM win and inference fast path.  ``interpret=None``
auto-selects interpreter mode off-TPU.
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


def _pad_params(layers: list[dict], in_dim: int):
    """Zero-pad [W, b] chain to lane-aligned dims. Returns (padded arrays,
    padded dims)."""
    dims = [in_dim] + [int(l["w"].shape[1]) for l in layers]
    pdims = [_round_up(d, 128) for d in dims]
    padded = []
    for i, layer in enumerate(layers):
        W = jnp.asarray(layer["w"], jnp.float32)
        b = jnp.asarray(layer["b"], jnp.float32)
        W = jnp.pad(W, ((0, pdims[i] - dims[i]), (0, pdims[i + 1] - dims[i + 1])))
        b = jnp.pad(b, (0, pdims[i + 1] - dims[i + 1]))
        padded.append((W, b.reshape(1, -1)))
    return padded, dims, pdims


def _make_kernel(num_layers: int, activation: str):
    def kernel(*refs):
        x_ref = refs[0]
        out_ref = refs[-1]
        h = x_ref[:]
        for i in range(num_layers):
            w_ref = refs[1 + 2 * i]
            b_ref = refs[2 + 2 * i]
            # default (bf16-multiply) MXU precision: matches what the jnp
            # training path uses on TPU; HIGHEST costs ~6x here for no
            # training-quality benefit
            h = (
                jnp.dot(h, w_ref[:], preferred_element_type=jnp.float32)
                + b_ref[:]
            )
            if i < num_layers - 1:
                if activation == "tanh":
                    h = jnp.tanh(h)
                elif activation == "relu":
                    h = jnp.maximum(h, 0.0)
                elif activation == "sigmoid":
                    h = jax.nn.sigmoid(h)
        out_ref[:] = h

    return kernel


@functools.partial(
    jax.jit, static_argnames=("activation", "interpret", "tile")
)
def _tower_fwd(x_pad, flat_params, activation, interpret, tile):
    B, P0 = x_pad.shape
    num_layers = len(flat_params) // 2
    grid = (B // tile,)
    in_specs = [pl.BlockSpec((tile, P0), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    for j, p in enumerate(flat_params):
        in_specs.append(
            pl.BlockSpec(p.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    out_dim = flat_params[-1].shape[-1]
    flops = 0
    d_prev = P0
    for j in range(num_layers):
        d_next = flat_params[2 * j].shape[1]
        flops += 2 * B * d_prev * d_next
        d_prev = d_next
    out = pl.pallas_call(
        _make_kernel(num_layers, activation),
        out_shape=jax.ShapeDtypeStruct((B, out_dim), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (tile, out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=4 * (B * P0 + B * out_dim), transcendentals=0
        ),
        interpret=interpret,
    )(x_pad, *flat_params)
    return out


def mlp_tower_fused(
    mlp: dict,
    x: jax.Array,
    activation: str = "tanh",
    interpret: bool | None = None,
) -> jax.Array:
    """Fused forward through ``{"layers": [{"w", "b"}, ...]}`` -> [B] logits."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, in_dim = x.shape
    layers = mlp["layers"]
    padded, dims, pdims = _pad_params(layers, in_dim)
    x_pad = jnp.pad(x, ((0, 0), (0, pdims[0] - in_dim)))
    tile = 512 if B % 512 == 0 else (128 if B % 128 == 0 else B)
    flat = []
    for W, b in padded:
        flat.extend([W, b])
    out = _tower_fwd(x_pad, tuple(flat), activation, interpret, tile)
    return out[:, 0]


# --- differentiable wrapper: fused fwd, rematerialised jnp bwd -------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def mlp_tower(mlp, x, activation="tanh", interpret=None):
    return mlp_tower_fused(mlp, x, activation, interpret)


def _act(activation, z):
    if activation == "tanh":
        return jnp.tanh(z)
    if activation == "relu":
        return jnp.maximum(z, 0.0)
    if activation == "sigmoid":
        return jax.nn.sigmoid(z)
    raise ValueError(activation)


def _tower_fwd_rule(mlp, x, activation, interpret):
    out = mlp_tower_fused(mlp, x, activation, interpret)
    return out, (mlp, x)


def _tower_bwd_rule(activation, interpret, res, g):
    mlp, x = res

    def ref_fwd(mlp_, x_):
        h = x_
        n = len(mlp_["layers"])
        for i, layer in enumerate(mlp_["layers"]):
            h = h @ layer["w"] + layer["b"]
            if i < n - 1:
                h = _act(activation, h)
        return h[:, 0]

    _, vjp = jax.vjp(ref_fwd, mlp, x)
    gm, gx = vjp(g)
    return gm, gx


mlp_tower.defvjp(_tower_fwd_rule, _tower_bwd_rule)

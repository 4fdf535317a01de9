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

Backward: a fused Pallas kernel as well (``_tower_bwd`` below) — each batch
tile rematerialises the forward chain in VMEM (activations never touch HBM)
and backprops through it, accumulating weight/bias gradients across the
sequential grid; wired up via ``jax.custom_vjp``.  ``interpret=None``
auto-selects interpreter mode off-TPU.

In-kernel dropout: masks are a counter-based hash of (seed, layer, global
row, column) — see ``_dropout_mask`` for why the stateful ``pltpu.prng_*``
path was abandoned (two distinct bugs on this toolchain).  The seed rides
as a scalar-prefetch argument; forward and backward compute bit-identical
masks by construction.
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


def _apply_act(activation: str, h: jax.Array) -> jax.Array:
    if activation == "tanh":
        return jnp.tanh(h)
    if activation == "relu":
        return jnp.maximum(h, 0.0)
    if activation == "sigmoid":
        return jax.nn.sigmoid(h)
    raise ValueError(activation)


def _dropout_mask(shape, keep_prob: float, seed, layer: int,
                  row_offset) -> jax.Array:
    """Counter-based (stateless) dropout mask: hash(seed, layer, row, col).

    Two hard-won lessons from round 1/2 drove this design (see
    tests/test_pallas.py::test_mlp_tower_in_kernel_dropout):

    1. ``pltpu.prng_random_bits`` returns **int32** in this JAX version;
       comparing those signed bits against a uint32 threshold is a signed
       compare that keeps ~every lattice point — an all-ones,
       seed-independent "mask".
    2. Even with that fixed, the stateful per-core PRNG draw → element
       assignment is a compiler layout decision: the fused backward kernel
       re-seeding identically and redrawing in the same order does NOT
       reproduce the forward kernel's masks once Mosaic schedules the two
       kernels differently (measured: ~75% element overlap, gradients off
       by up to 4x vs finite differences).

    A murmur3-finalizer hash of the (global row, column, seed, layer)
    counter is layout-independent — forward and backward regenerate
    bit-identical masks by construction — and pure integer VPU ops, so it
    also lowers in interpreter mode on CPU (no pltpu.prng needed).
    """
    r = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) + row_offset).astype(
        jnp.uint32
    )
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.uint32)
    x = (
        r * jnp.uint32(0x9E3779B9)
        + c * jnp.uint32(0x85EBCA6B)
        + seed.astype(jnp.uint32) * jnp.uint32(0xC2B2AE35)
        + jnp.uint32((layer + 1) * 0x27D4EB2F)
    )
    # murmur3 fmix32: full avalanche, so consecutive counters decorrelate
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> jnp.uint32(15))
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> jnp.uint32(16))
    threshold = jnp.uint32(int(keep_prob * 0xFFFFFFFF))
    return (x < threshold).astype(jnp.float32) / keep_prob


def _make_kernel(num_layers: int, activation: str, dropout: float = 0.0,
                 tile: int = 0):
    has_drop = dropout > 0.0

    def kernel(*refs):
        if has_drop:
            seed_ref = refs[0]  # scalar-prefetch: int32[1]
            refs = refs[1:]
            row0 = pl.program_id(0) * tile
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
                h = _apply_act(activation, h)
                if has_drop:
                    h = h * _dropout_mask(h.shape, 1.0 - dropout,
                                          seed_ref[0], i, row0)
        out_ref[:] = h

    return kernel


@functools.partial(
    jax.jit, static_argnames=("activation", "interpret", "tile", "dropout")
)
def _tower_fwd(x_pad, flat_params, activation, interpret, tile, dropout=0.0,
               seed=None):
    B, P0 = x_pad.shape
    num_layers = len(flat_params) // 2
    grid = (B // tile,)
    # with scalar prefetch, index maps receive the scalar ref as a leading
    # argument — select the right arity up front
    if dropout > 0.0:
        tile_map = lambda i, s_: (i, 0)      # noqa: E731
        const_map = lambda i, s_: (0, 0)     # noqa: E731
    else:
        tile_map = lambda i: (i, 0)          # noqa: E731
        const_map = lambda i: (0, 0)         # noqa: E731
    in_specs = [
        pl.BlockSpec((tile, P0), tile_map, memory_space=pltpu.VMEM)
    ]
    args = [x_pad]
    for j, p in enumerate(flat_params):
        in_specs.append(
            pl.BlockSpec(p.shape, const_map, memory_space=pltpu.VMEM)
        )
        args.append(p)
    out_dim = flat_params[-1].shape[-1]
    out_spec = pl.BlockSpec((tile, out_dim), tile_map,
                            memory_space=pltpu.VMEM)
    flops = 0
    d_prev = P0
    for j in range(num_layers):
        d_next = flat_params[2 * j].shape[1]
        flops += 2 * B * d_prev * d_next
        d_prev = d_next
    if dropout > 0.0:
        # seed rides as a scalar-prefetch argument (the supported way to
        # feed per-call scalars into a gridded TPU kernel; a (1,1) SMEM
        # block silently read a stale value here)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
            out_specs=out_spec,
        )
        seed_arg = (jnp.asarray(seed, jnp.float32).astype(jnp.int32)
                    .reshape(1),)
    else:
        grid_spec = pl.GridSpec(grid=grid, in_specs=in_specs,
                                out_specs=out_spec)
        seed_arg = ()
    out = pl.pallas_call(
        _make_kernel(num_layers, activation, dropout, tile),
        out_shape=jax.ShapeDtypeStruct((B, out_dim), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=4 * (B * P0 + B * out_dim), transcendentals=0
        ),
        interpret=interpret,
    )(*seed_arg, *args)
    return out


def mlp_tower_fused(
    mlp: dict,
    x: jax.Array,
    activation: str = "tanh",
    interpret: bool | None = None,
    dropout: float = 0.0,
    seed: int | jax.Array = 0,
) -> jax.Array:
    """Fused forward through ``{"layers": [{"w", "b"}, ...]}`` -> [B] logits.

    ``dropout > 0`` enables in-kernel dropout; masks are a stateless
    counter-based hash of ``(seed, layer, row, col)``, so the fused
    backward regenerates them bit-exactly (and interpreter mode works).
    """
    if interpret is None:
        from .runtime import default_interpret

        interpret = default_interpret()
    B, in_dim = x.shape
    layers = mlp["layers"]
    padded, dims, pdims = _pad_params(layers, in_dim)
    x_pad = jnp.pad(x, ((0, 0), (0, pdims[0] - in_dim)))
    tile = 512 if B % 512 == 0 else (128 if B % 128 == 0 else B)
    flat = []
    for W, b in padded:
        flat.extend([W, b])
    out = _tower_fwd(x_pad, tuple(flat), activation, interpret, tile,
                     dropout=dropout, seed=seed)
    return out[:, 0]


# --- fused backward kernel --------------------------------------------------
#
# One kernel per batch tile recomputes the forward chain in VMEM
# (rematerialisation: activations never touch HBM) and backprops through it,
# writing the x-gradient tile and ACCUMULATING weight/bias gradients across
# the sequential grid (constant-index output blocks keep their VMEM buffer
# between iterations; initialised at program 0).


def _act_deriv(activation: str, a: jax.Array) -> jax.Array:
    """Derivative of the activation expressed via its OUTPUT a = act(z)."""
    if activation == "tanh":
        return 1.0 - a * a
    if activation == "relu":
        return (a > 0.0).astype(a.dtype)
    if activation == "sigmoid":
        return a * (1.0 - a)
    raise ValueError(activation)


def _make_bwd_kernel(num_layers: int, activation: str, dropout: float = 0.0,
                     tile: int = 0):
    has_drop = dropout > 0.0

    def kernel(*refs):
        # refs: [seed?], x, (W, b) * L, g, -> gx, (gW, gb) * L
        if has_drop:
            seed_ref = refs[0]  # scalar-prefetch: int32[1]
            refs = refs[1:]
            # counter-based masks: same (seed, layer, row, col) counters as
            # the forward kernel -> bit-identical masks by construction
            row0 = pl.program_id(0) * tile
        x_ref = refs[0]
        g_ref = refs[1 + 2 * num_layers]
        out_base = 2 + 2 * num_layers
        gx_ref = refs[out_base]
        first = pl.program_id(0) == 0

        # forward recompute, keeping PRE-dropout activations and the masks
        # (draw order matches the forward kernel exactly)
        acts = [x_ref[:]]
        masks = [None]
        h = x_ref[:]
        for i in range(num_layers):
            w_ref = refs[1 + 2 * i]
            b_ref = refs[2 + 2 * i]
            h = jnp.dot(h, w_ref[:], preferred_element_type=jnp.float32) + b_ref[:]
            mask = None
            if i < num_layers - 1:
                h = _apply_act(activation, h)
                a_pre = h
                if has_drop:
                    mask = _dropout_mask(h.shape, 1.0 - dropout,
                                         seed_ref[0], i, row0)
                    h = h * mask
            else:
                a_pre = h
            acts.append(a_pre)
            masks.append(mask)

        gh = g_ref[:]  # [TB, out_dim]
        for i in reversed(range(num_layers)):
            w_ref = refs[1 + 2 * i]
            gw_ref = refs[out_base + 1 + 2 * i]
            gb_ref = refs[out_base + 2 + 2 * i]
            a_in = acts[i]
            if i > 0 and masks[i] is not None:
                a_in = a_in * masks[i]
            gw_part = jax.lax.dot_general(
                a_in, gh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [P_in, P_out]
            gb_part = jnp.sum(gh, axis=0, keepdims=True)

            @pl.when(first)
            def _():
                gw_ref[:] = gw_part
                gb_ref[:] = gb_part

            @pl.when(jnp.logical_not(first))
            def _():
                gw_ref[:] = gw_ref[:] + gw_part
                gb_ref[:] = gb_ref[:] + gb_part

            gh = jax.lax.dot_general(
                gh, w_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [TB, P_in]
            if i > 0:
                if masks[i] is not None:
                    gh = gh * masks[i]
                gh = gh * _act_deriv(activation, acts[i])
        gx_ref[:] = gh

    return kernel


@functools.partial(jax.jit, static_argnames=("activation", "interpret", "tile",
                                              "dropout"))
def _tower_bwd(x_pad, flat_params, g2d, activation, interpret, tile,
               dropout=0.0, seed=None):
    B, P0 = x_pad.shape
    num_layers = len(flat_params) // 2
    grid = (B // tile,)
    # with scalar prefetch, index maps receive the scalar ref as a leading
    # argument — same arity handling as _tower_fwd
    if dropout > 0.0:
        tile_map = lambda i, s_: (i, 0)      # noqa: E731
        const_map = lambda i, s_: (0, 0)     # noqa: E731
        pre_args = (jnp.asarray(seed, jnp.float32).astype(jnp.int32)
                    .reshape(1),)
    else:
        tile_map = lambda i: (i, 0)          # noqa: E731
        const_map = lambda i: (0, 0)         # noqa: E731
        pre_args = ()
    in_specs = [
        pl.BlockSpec((tile, P0), tile_map, memory_space=pltpu.VMEM)
    ]
    for p in flat_params:
        in_specs.append(pl.BlockSpec(p.shape, const_map,
                                     memory_space=pltpu.VMEM))
    out_dim = flat_params[-1].shape[-1]
    in_specs.append(
        pl.BlockSpec((tile, out_dim), tile_map, memory_space=pltpu.VMEM)
    )
    out_shapes = [jax.ShapeDtypeStruct((B, P0), jnp.float32)]
    out_specs = [pl.BlockSpec((tile, P0), tile_map,
                              memory_space=pltpu.VMEM)]
    for p in flat_params:
        out_shapes.append(jax.ShapeDtypeStruct(p.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(p.shape, const_map,
                                      memory_space=pltpu.VMEM))
    if dropout > 0.0:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
            out_specs=tuple(out_specs),
        )
    else:
        grid_spec = pl.GridSpec(grid=grid, in_specs=in_specs,
                                out_specs=tuple(out_specs))
    outs = pl.pallas_call(
        _make_bwd_kernel(num_layers, activation, dropout, tile),
        out_shape=tuple(out_shapes),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*pre_args, x_pad, *flat_params, g2d)
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def mlp_tower(mlp, x, activation="tanh", interpret=None, dropout=0.0,
              seed=0.0):
    """Differentiable fused tower; ``dropout``/``seed`` enable in-kernel
    dropout (seed is a traced f32 scalar with zero gradient)."""
    return mlp_tower_fused(mlp, x, activation, interpret, dropout, seed)


def _tower_fwd_rule(mlp, x, activation, interpret, dropout, seed):
    out = mlp_tower_fused(mlp, x, activation, interpret, dropout, seed)
    return out, (mlp, x, seed)


def _tower_bwd_rule(activation, interpret, dropout, res, g):
    mlp, x, seed = res
    if interpret is None:
        from .runtime import default_interpret

        interpret = default_interpret()
    B, in_dim = x.shape
    layers = mlp["layers"]
    padded, dims, pdims = _pad_params(layers, in_dim)
    x_pad = jnp.pad(x, ((0, 0), (0, pdims[0] - in_dim)))
    tile = 512 if B % 512 == 0 else (128 if B % 128 == 0 else B)
    flat = []
    for W, b in padded:
        flat.extend([W, b])
    # upstream grad arrives for output column 0 only; padded cols get 0
    g2d = jnp.zeros((B, pdims[-1]), jnp.float32).at[:, 0].set(g)
    outs = _tower_bwd(x_pad, tuple(flat), g2d, activation, interpret, tile,
                      dropout=dropout, seed=seed)
    gx = outs[0][:, :in_dim]
    glayers = []
    for i in range(len(layers)):
        gW = outs[1 + 2 * i][: dims[i], : dims[i + 1]]
        gb = outs[2 + 2 * i][0, : dims[i + 1]]
        glayers.append({"w": gW, "b": gb})
    return {"layers": glayers}, gx, jnp.zeros_like(jnp.asarray(seed, jnp.float32))


mlp_tower.defvjp(_tower_fwd_rule, _tower_bwd_rule)

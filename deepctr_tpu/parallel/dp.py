"""Pure data-parallel step (replicated table) via GSPMD sharding annotations.

For vocabularies that fit per-chip, the simplest scaling path: batch sharded
over the ``data`` axis, every parameter replicated; ``jax.jit`` +
``NamedSharding`` lets the XLA SPMD partitioner insert the psum gradient
sync and the scatter-update collectives automatically (SURVEY.md §2.4 DP
row).  Use :mod:`deepctr_tpu.parallel.sharded` when tables outgrow a chip.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.schema import Schema
from ..models.base import Model
from ..train.step import TrainState, make_train_step
from .mesh import DATA_AXIS


def make_dp_train_step(
    model: Model,
    schema: Schema,
    sparse_opt,
    dense_opt,
    mesh: Mesh,
    l2: float = 0.0,
):
    """jit-with-shardings wrapper around the single-device step.

    The returned step expects host batches; it places them sharded over the
    data axis and keeps the state replicated.
    """
    base = make_train_step(model, schema, sparse_opt, dense_opt, l2=l2, jit=False)
    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P(DATA_AXIS))

    jitted = jax.jit(
        base,
        in_shardings=(
            None,  # state: leave as-is (placed replicated by caller/init)
            shd,
            shd,
            shd,
        ),
        donate_argnums=(0,),
    )

    def step(state: TrainState, ids, labels, weights):
        return jitted(state, ids, labels, weights)

    return step


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)

"""Device mesh construction and sharding helpers.

The reference is single-process/single-device (SURVEY.md §2.4); every
parallel concept here is the TPU-native capability mapping mandated by
BASELINE.json:5: a 1-D ``data`` mesh axis over all chips, with

- dense tower params REPLICATED, gradients synced by ``psum`` (pure DP);
- embedding tables ROW-SHARDED over the same axis (DLRM-style model
  parallelism for the memory-heavy state), lookups/updates exchanged with
  ``all_to_all`` — see :mod:`deepctr_tpu.parallel.sharded`.

Multi-host: ``jax.distributed.initialize()`` before mesh creation makes the
same code span hosts (ICI within a slice, DCN across); nothing else changes.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_data_mesh(num_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over ``num_devices`` (default: all addressable devices)."""
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding: leading axis split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_arrays(mesh: Mesh, *arrays):
    """device_put host arrays with the batch axis sharded over the mesh."""
    s = data_sharding(mesh)
    return tuple(jax.device_put(a, s) for a in arrays)

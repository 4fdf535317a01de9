"""Per-step communication-volume accounting + ICI/DCN scaling model.

BASELINE.json:5 sets a >=85% examples/s scaling-efficiency target for 1->2
hosts, but this environment has ONE chip — so the only honest treatment is
quantitative: account every byte the sharded step exchanges (the volumes are
closed-form in the step's static shapes) and combine them with interconnect
bandwidths into a predicted efficiency.  tools/scaling_report.py renders
SCALING.md from these functions; tests/test_comm.py pins the formulas to the
actual arrays the step exchanges (same capacity formula — imported by
parallel/sharded.py, so the two cannot drift).

Exchange inventory of one sharded train step (parallel/sharded.py):

================  =========================  ==========================
collective        payload (per device)       purpose
================  =========================  ==========================
all_to_all        [N, C] int32               big-field id requests
all_to_all        [N, C, D] f32              gathered rows, owner->user
all_to_all        [N, C, D] f32              occurrence grads, user->owner
all_gather x F_s  [cnt_f, D] f32 -> n*cnt_f  small-field subtables
psum x F_s        [n*cnt_f, D] f32           small-field dense grads
psum              dense params               tower grad sync
psum              2 scalars                  loss, drop counter
================  =========================  ==========================

with N = mesh size, C = exchange capacity, D = row width, F_s = number of
small fields under the split plan.  Eval steps run only the first two rows
plus the all_gathers.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def exchange_capacity(m: int, n: int, capacity_factor: float) -> int:
    """Per-owner bucket capacity C for m local occurrences over n shards.

    THE formula used by the sharded step (parallel/sharded.py imports this),
    so the accounting below is definitionally in sync with execution.
    """
    return max(1, min(max(m, 1), int(capacity_factor * _cdiv(max(m, 1), n))))


def _small_field_rows(schema, split, n: int) -> list[int]:
    """Resident rows per shard for each small field (mirrors
    sharded._small_field_geometry)."""
    if split is None or not split.has_small:
        return []
    r_plus_1 = _cdiv(schema.padded_vocab_size, n) + 1
    return [min(_cdiv(f.vocab, n), r_plus_1) for f in split.small]


@dataclasses.dataclass(frozen=True)
class CommVolume:
    """Per-device, per-step exchanged bytes, split by collective.

    ``*_wire`` fields apply the cross-device fraction: an all_to_all keeps
    1/N of the payload local; a ring all-reduce (psum) moves 2*(N-1)/N of
    the operand size per device; an all_gather moves (N-1)/N of the gathered
    result per device.
    """

    n_devices: int
    batch_per_device: int
    capacity: int
    ids_a2a: int            # [N, C] int32, one direction
    rows_a2a_fwd: int       # [N, C, D] f32
    rows_a2a_bwd: int       # [N, C, D] f32
    small_allgather: int    # sum_f (n*cnt_f) * D * 4 (gathered result size)
    small_psum: int         # sum_f (n*cnt_f) * D * 4 (operand size)
    dense_psum: int         # dense param bytes (operand size)

    @property
    def a2a_wire(self) -> int:
        f = (self.n_devices - 1) / self.n_devices
        return int((self.ids_a2a + self.rows_a2a_fwd + self.rows_a2a_bwd) * f)

    @property
    def allgather_wire(self) -> int:
        f = (self.n_devices - 1) / self.n_devices
        return int(self.small_allgather * f)

    @property
    def psum_wire(self) -> int:
        f = 2 * (self.n_devices - 1) / self.n_devices
        return int((self.small_psum + self.dense_psum) * f)

    @property
    def total_wire(self) -> int:
        return self.a2a_wire + self.allgather_wire + self.psum_wire

    @property
    def bytes_per_example(self) -> float:
        return self.total_wire / max(self.batch_per_device, 1)

    def table(self) -> str:
        rows = [
            ("id all_to_all [N,C] i32", self.ids_a2a),
            ("row all_to_all fwd [N,C,D] f32", self.rows_a2a_fwd),
            ("grad all_to_all bwd [N,C,D] f32", self.rows_a2a_bwd),
            ("small-field all_gather", self.small_allgather),
            ("small-field grad psum (operand)", self.small_psum),
            ("dense tower grad psum (operand)", self.dense_psum),
        ]
        out = ["| collective | payload bytes/device | wire bytes/device |",
               "|---|---|---|"]
        f_a2a = (self.n_devices - 1) / self.n_devices
        f_ps = 2 * (self.n_devices - 1) / self.n_devices
        for name, b in rows:
            wire = b * (f_ps if "psum" in name else f_a2a)
            out.append(f"| {name} | {b:,} | {int(wire):,} |")
        out.append(f"| **total wire** |  | **{self.total_wire:,}** |")
        return "\n".join(out)


def comm_volume(
    schema,
    batch_per_device: int,
    n_devices: int,
    capacity_factor: float = 2.0,
    split=None,
    dense_param_bytes: int = 0,
    row_dim: int = 11,
    exchange_bytes: int = 4,
    table_bytes: int = 4,
) -> CommVolume:
    """Closed-form per-device per-step exchange volumes of the sharded step.

    ``split=None`` models the all-exchange path (every slot rides the
    all_to_all); with a SplitPlan only ``split.big_slots`` do.
    ``exchange_bytes``: per-element width of the row/grad all_to_all payload
    (4 = f32, 2 = the bf16 exchange knob ``train.exchange_dtype=bf16``).
    ``table_bytes``: storage width of the table shards (train.table_dtype) —
    the small-field subtables all_gather in the STORED dtype (the step
    promotes to f32 after the gather), while their psum'd gradients are
    always f32.
    """
    n = n_devices
    s_exch = (
        len(split.big_slots) if (split is not None and split.has_small)
        else schema.num_slots
    )
    m = batch_per_device * s_exch
    cap = exchange_capacity(m, n, capacity_factor) if s_exch else 0
    d = row_dim
    small_rows = _small_field_rows(schema, split, n)
    small_bytes = sum(n * cnt * d * table_bytes for cnt in small_rows)
    small_psum_bytes = sum(n * cnt * d * 4 for cnt in small_rows)
    return CommVolume(
        n_devices=n,
        batch_per_device=batch_per_device,
        capacity=cap,
        ids_a2a=n * cap * 4,
        rows_a2a_fwd=n * cap * d * exchange_bytes,
        rows_a2a_bwd=n * cap * d * exchange_bytes,
        small_allgather=small_bytes,
        small_psum=small_psum_bytes,
        dense_psum=dense_param_bytes,
    )


def dense_param_bytes(model, schema) -> int:
    """Byte size of the replicated dense pytree (psum'd every step)."""
    import jax

    params = model.init_params(jax.random.PRNGKey(0), schema)
    return sum(
        int(np.prod(x.shape)) * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(params["dense"])
    )


@dataclasses.dataclass(frozen=True)
class ScalingPoint:
    """Predicted weak-scaling efficiency at one topology point."""

    n_devices: int
    n_hosts: int
    wire_bytes: int          # per device per step (ICI view)
    dcn_bytes_per_host: int  # per host per step crossing DCN
    t_comp_ms: float
    t_ici_ms: float
    t_dcn_ms: float
    efficiency_no_overlap: float   # t_comp / (t_comp + t_comm)
    efficiency_overlapped: float   # t_comp / max(t_comp, t_comm)


def predict_scaling(
    vol: CommVolume,
    t_comp_ms: float,
    n_hosts: int = 1,
    chips_per_host: int | None = None,
    ici_bytes_per_s: float = 1600e9 / 8 * 0.8,
    dcn_bytes_per_s_per_host: float = 200e9 / 8 * 0.8,
) -> ScalingPoint:
    """Combine volumes with link bandwidths into predicted efficiency.

    Defaults (stated assumptions, parameterise to taste):
    - ICI: Cloud TPU v5e spec lists 1600 Gbps aggregate interchip bandwidth
      per chip -> 200 GB/s, derated to 80% achievable.
    - DCN: one 200 Gbps NIC per host shared by its chips -> 25 GB/s,
      derated to 80%.  Cross-host traffic of collective ops transits the
      NIC once per step in each direction; we charge the full per-host
      cross-section.

    Weak scaling: ``t_comp_ms`` is the measured single-chip step time at the
    same per-device batch (compute per chip is constant as devices grow; the
    exchange volumes grow as accounted in ``vol``).

    ``efficiency_no_overlap`` serializes comm after compute (pessimistic);
    ``efficiency_overlapped`` assumes perfect overlap (optimistic).  Real
    systems land between; XLA overlaps collectives with independent compute
    where the schedule allows.
    """
    n = vol.n_devices
    chips_per_host = chips_per_host or _cdiv(n, n_hosts)
    t_ici = vol.total_wire / ici_bytes_per_s * 1e3

    # DCN accounting is per-collective:
    # - all_to_all is per-PAIR traffic: each device's payload to the
    #   (n - chips_per_host) remote peers transits the NIC; the host carries
    #   chips_per_host devices' worth.  Irreducible — ids really must reach
    #   their owner shard.
    # - psum / all_gather are HIERARCHICAL over a host x chip mesh (XLA
    #   reduces intra-host over ICI first): DCN carries ~2x / ~1x the
    #   operand per HOST per step, independent of chips_per_host.
    if n_hosts > 1 and n > chips_per_host:
        remote_frac = (n - chips_per_host) / n  # all_to_all remote share
        a2a_payload = vol.ids_a2a + vol.rows_a2a_fwd + vol.rows_a2a_bwd
        dcn_a2a = a2a_payload * remote_frac * chips_per_host
        dcn_psum = 2 * (vol.small_psum + vol.dense_psum)
        dcn_ag = vol.small_allgather
        dcn_per_host = int(dcn_a2a + dcn_psum + dcn_ag)
        t_dcn = dcn_per_host / dcn_bytes_per_s_per_host * 1e3
    else:
        dcn_per_host = 0
        t_dcn = 0.0
    t_comm = t_ici + t_dcn
    return ScalingPoint(
        n_devices=n,
        n_hosts=n_hosts,
        wire_bytes=vol.total_wire,
        dcn_bytes_per_host=dcn_per_host,
        t_comp_ms=t_comp_ms,
        t_ici_ms=t_ici,
        t_dcn_ms=t_dcn,
        efficiency_no_overlap=t_comp_ms / (t_comp_ms + t_comm),
        efficiency_overlapped=t_comp_ms / max(t_comp_ms, t_comm),
    )

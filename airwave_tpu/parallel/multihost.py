"""Multi-host scale-out: DCN carries batches, never carries DSP state.

SURVEY.md §5 "Distributed communication backend": per-stream carries stay
chip-local, so multi-host scaling is pure data placement — each host feeds
the streams that live on its chips; no collective ever crosses DCN in steady
state. This module provides:

  - `initialize()` — jax.distributed bootstrap (coordinator/process wiring)
  - `global_mesh()` — a streams mesh spanning all processes' devices
  - `HostShardSpec` — which global stream rows this host owns and feeds
  - `host_local_batch()/make_global_array()` — build a globally-sharded
    [B_global, ...] array from each host's local rows
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed bootstrap; no-op for single-process runs."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis_name: str = "streams") -> Mesh:
    return Mesh(np.array(jax.devices()), (axis_name,))


@dataclasses.dataclass(frozen=True)
class HostShardSpec:
    """This process's slice of the global stream axis."""

    global_batch: int
    local_start: int
    local_count: int

    @property
    def local_slice(self) -> slice:
        return slice(self.local_start, self.local_start + self.local_count)


def host_shard_spec(global_batch: int, mesh: Mesh,
                    axis_name: str = "streams") -> HostShardSpec:
    """Rows this host feeds: the contiguous block mapped to its addressable
    devices (global sharding is row-contiguous over the device order)."""
    devices = list(mesh.devices.flat)
    n_devices = len(devices)
    assert global_batch % n_devices == 0, (global_batch, n_devices)
    per_device = global_batch // n_devices
    local_indices = [
        i for i, d in enumerate(devices) if d.process_index == jax.process_index()
    ]
    assert local_indices, "mesh contains no local devices"
    start = min(local_indices) * per_device
    count = len(local_indices) * per_device
    # Contiguity assumption: a host's devices are consecutive in the mesh.
    assert max(local_indices) - min(local_indices) + 1 == len(local_indices)
    return HostShardSpec(global_batch, start, count)


def make_global_array(local_rows: np.ndarray, spec: HostShardSpec,
                      mesh: Mesh, axis_name: str = "streams"):
    """Assemble a [B_global, ...] jax.Array from this host's local rows.

    Uses make_array_from_single_device_arrays: each addressable device gets
    its contiguous row block; the result is one global array usable directly
    by the stream-sharded step.
    """
    assert local_rows.shape[0] == spec.local_count
    sharding = NamedSharding(mesh, P(axis_name))
    per_device = spec.global_batch // len(list(mesh.devices.flat))
    local_devices = [
        d for d in mesh.devices.flat if d.process_index == jax.process_index()
    ]
    shards = []
    for j, device in enumerate(local_devices):
        rows = local_rows[j * per_device:(j + 1) * per_device]
        shards.append(jax.device_put(rows, device))
    global_shape = (spec.global_batch,) + tuple(local_rows.shape[1:])
    return jax.make_array_from_single_device_arrays(
        global_shape, sharding, shards
    )

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


def _axis_index(mesh: Mesh, axis_name: str) -> int:
    names = list(mesh.axis_names)
    assert axis_name in names, (axis_name, names)
    return names.index(axis_name)


def _local_axis_coords(mesh: Mesh, axis_name: str) -> list:
    """Sorted coordinates along `axis_name` that this process's devices
    cover (on a multi-axis mesh the batch is sharded over this axis only
    and replicated over the others)."""
    ax = _axis_index(mesh, axis_name)
    coords = sorted({
        idx[ax] for idx, d in np.ndenumerate(mesh.devices)
        if d.process_index == jax.process_index()
    })
    assert coords, "mesh contains no local devices"
    # Contiguity assumption: a host's axis coordinates are consecutive.
    assert coords[-1] - coords[0] + 1 == len(coords), coords
    return coords


def host_shard_spec(global_batch: int, mesh: Mesh,
                    axis_name: str = "streams") -> HostShardSpec:
    """Rows this host feeds: the contiguous block mapped to its devices'
    coordinates along `axis_name` (global sharding is row-contiguous over
    that axis; other mesh axes replicate)."""
    axis_size = mesh.shape[axis_name]
    assert global_batch % axis_size == 0, (global_batch, axis_size)
    per_coord = global_batch // axis_size
    coords = _local_axis_coords(mesh, axis_name)
    return HostShardSpec(global_batch, coords[0] * per_coord,
                         len(coords) * per_coord)


def make_global_array(local_rows: np.ndarray, spec: HostShardSpec,
                      mesh: Mesh, axis_name: str = "streams"):
    """Assemble a [B_global, ...] jax.Array from this host's local rows.

    Uses make_array_from_single_device_arrays: each addressable device gets
    its contiguous row block; the result is one global array usable directly
    by the stream-sharded step.
    """
    assert local_rows.shape[0] == spec.local_count
    sharding = NamedSharding(mesh, P(axis_name))
    ax = _axis_index(mesh, axis_name)
    per_coord = spec.global_batch // mesh.shape[axis_name]
    shards = []
    for idx, device in np.ndenumerate(mesh.devices):
        if device.process_index != jax.process_index():
            continue
        # Each device holds the row block of its axis coordinate (replicas
        # along other mesh axes receive the same block).
        off = idx[ax] * per_coord - spec.local_start
        rows = local_rows[off:off + per_coord]
        shards.append(jax.device_put(rows, device))
    global_shape = (spec.global_batch,) + tuple(local_rows.shape[1:])
    return jax.make_array_from_single_device_arrays(
        global_shape, sharding, shards
    )

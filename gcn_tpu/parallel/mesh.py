"""Device mesh setup.

The reference is single-GPU (SURVEY.md §2d) — multi-chip scaling is new
capability: the graph is partitioned by row windows across a 1-D mesh axis
("data"), features/labels are sharded by the same rows, and layer
aggregations exchange boundary information with XLA collectives over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh


def create_mesh(n_devices: Optional[int] = None,
                axis_names: Sequence[str] = ("data",)) -> Mesh:
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices, have {len(devices)}; for CPU "
            "testing set XLA_FLAGS=--xla_force_host_platform_device_count=N")
    return jax.make_mesh((n_devices,), tuple(axis_names),
                         devices=devices[:n_devices])


def create_mesh_2d(n_data: int, n_model: int,
                   axis_names: Sequence[str] = ("data", "model")) -> Mesh:
    """2-D mesh: row bands ("data" — the graph partition) x feature/hidden
    columns ("model" — tensor parallelism for the dense matmuls and the
    layer-2 SpMM). See make_sharded_gcn_train_step(model_axis=...)."""
    devices = jax.devices()
    need = n_data * n_model
    if need > len(devices):
        raise ValueError(
            f"requested {n_data}x{n_model} devices, have {len(devices)}")
    return jax.make_mesh((n_data, n_model), tuple(axis_names),
                         devices=devices[:need])


def create_mesh_hier(n_hosts: int, n_chips: int,
                     axis_names: Sequence[str] = ("host", "chip")) -> Mesh:
    """2-level mesh for the hierarchical halo exchange: the row partition
    spans BOTH axes (shard = host*n_chips + chip) so that the "chip" axis
    maps to ICI and the "host" axis to DCN on a real pod. Boundary rows
    then move intra-host first, and only per-host UNIONS cross DCN
    (build_halo_plan_hier). On a real slice, order `devices` so same-host
    chips share a "host" index; the fake CPU mesh just reshapes."""
    devices = jax.devices()
    need = n_hosts * n_chips
    if need > len(devices):
        raise ValueError(
            f"requested {n_hosts}x{n_chips} devices, have {len(devices)}")
    return jax.make_mesh((n_hosts, n_chips), tuple(axis_names),
                         devices=devices[:need])


def create_mesh_hier_model(
        n_hosts: int, n_chips: int, n_model: int,
        axis_names: Sequence[str] = ("host", "chip", "model")) -> Mesh:
    """3-D mesh: hierarchical row partition (host x chip — the halo_hier
    exchange's DCN/ICI levels) x tensor parallelism ("model"). The model
    axis should map to the fastest links (same-host chips), so on a real
    slice order devices host-major with model-axis neighbors adjacent;
    the fake CPU mesh just reshapes. See
    make_sharded_gcn_train_step(exchange="halo_hier", model_axis=...)."""
    devices = jax.devices()
    need = n_hosts * n_chips * n_model
    if need > len(devices):
        raise ValueError(
            f"requested {n_hosts}x{n_chips}x{n_model} devices, "
            f"have {len(devices)}")
    return jax.make_mesh((n_hosts, n_chips, n_model), tuple(axis_names),
                         devices=devices[:need])


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> Mesh:
    """Multi-host setup: jax.distributed + a global 1-D mesh.

    On a TPU pod slice the arguments come from the environment and may be
    omitted (jax.distributed auto-detects); elsewhere pass them explicitly.
    Collectives then ride ICI within a slice and DCN across hosts — the
    same shard_map train step works unchanged because it only names the
    mesh axis. Each host feeds its own row bands to ``shard_fn``
    (jax.make_array_from_process_local_data for host-local loading).
    """
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return create_mesh()

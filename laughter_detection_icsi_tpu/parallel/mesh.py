"""Mesh construction + sharding helpers.

One flat ``data`` axis is the right mesh for this workload: the flagship
model is a ~221K-parameter CNN (SURVEY.md §2.4), far too small for tensor or
pipeline parallelism to pay for their collectives, while both training
batches and inference channel/time-block batches are embarrassingly shardable
(SURVEY.md §2.2).  Parameters are replicated; batch dims are sharded; XLA
turns the mean-loss gradient into an ICI all-reduce.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PyTree = Any

DATA_AXIS = "data"


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = DATA_AXIS
) -> Mesh:
    """A 1-D mesh over the first ``n_devices`` devices (all by default)."""
    devices = jax.devices()
    n = len(devices) if n_devices is None else n_devices
    if n < 1:
        raise ValueError(f"n_devices must be >= 1, got {n}")
    if n > len(devices):
        raise ValueError(f"requested {n} devices, only {len(devices)} available")
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def process_span(mesh: Mesh) -> int:
    """Number of distinct host processes the mesh's devices live on (1 on
    any single-controller mesh; > 1 only under ``jax.distributed``)."""
    return len({d.process_index for d in mesh.devices.flat})


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def addressable_row_block(sharding, global_shape) -> tuple:
    """[lo, hi) rows of a row-sharded global array owned by THIS process.

    Derived from the sharding's own device→index map (never from assumed
    device ordering), and required to be one contiguous block — true for a
    1-D ``data``-axis mesh built over ``jax.devices()`` (globally ordered by
    process), and asserted rather than trusted.  The host-side planning
    primitive behind every "each process loads only its own rows" path
    (data.ResidentLadDataset, ShardedPipeline's multi-host channel batches).
    """
    mine = [
        idx[0]
        for d, idx in sharding.devices_indices_map(tuple(global_shape)).items()
        if d.process_index == jax.process_index()
    ]
    if not mine:
        raise ValueError("sharding places no rows on this process")
    n_rows = global_shape[0]
    spans = sorted(
        (s.start or 0, n_rows if s.stop is None else s.stop) for s in mine
    )
    lo, hi = spans[0][0], spans[-1][1]
    covered = sum(b - a for a, b in spans)
    if covered != hi - lo:
        raise ValueError(
            f"this process's rows are not one contiguous block: {spans} "
            "(build the mesh over jax.devices() so device order follows "
            "process order)"
        )
    return lo, hi


def shard_batch(batch: PyTree, mesh: Mesh, axis_name: str = DATA_AXIS) -> PyTree:
    """Place a host batch onto the mesh, leading dim sharded over ``data``.

    Leading dims must be divisible by the mesh size — pad or bucket upstream
    (static shapes keep XLA happy, SURVEY.md §7.1).
    """
    sharding = data_sharding(mesh, axis_name)
    n = mesh.devices.size

    def put(x):
        # Device-resident leaves reshard device-to-device: np.asarray on a
        # jax.Array would silently pay a blocking D2H download + re-upload
        # (the mistake data_parallel._prep's comments warn about) — handle
        # it HERE so every caller gets the cheap path.
        arr = x if isinstance(x, jax.Array) else np.asarray(x)
        if arr.ndim == 0:
            return jax.device_put(arr, replicated(mesh))
        if arr.shape[0] % n:
            raise ValueError(
                f"leading dim {arr.shape[0]} not divisible by mesh size {n}"
            )
        return jax.device_put(arr, sharding)

    return jax.tree_util.tree_map(put, batch)


def shard_local_batch(
    local_batch: PyTree, mesh: Mesh, axis_name: str = DATA_AXIS
) -> PyTree:
    """Assemble a GLOBAL batch from per-process LOCAL rows (multi-host).

    The multi-host twin of :func:`shard_batch`: each participating process
    passes only the rows it loaded itself, and the global batch is their
    concatenation in process order (``jax.make_array_from_process_local_data``
    semantics) — process ``i``'s rows land directly on its addressable
    shards, so no cross-host data movement happens at placement time.
    Leaves must be host arrays (each process's local rows); scalars
    replicate.  On a single-process mesh this degenerates to
    :func:`shard_batch` exactly.

    This is the idiomatic feed for ``jax.distributed``-initialized training
    (each host reads its own slice of the dataset); see
    parallel/distributed.py for the runtime entry hook.
    """
    if process_span(mesh) == 1:
        return shard_batch(local_batch, mesh, axis_name)
    sharding = data_sharding(mesh, axis_name)

    def put(x):
        arr = np.asarray(x)
        if arr.ndim == 0:
            return jax.device_put(arr, replicated(mesh))
        return jax.make_array_from_process_local_data(sharding, arr)

    return jax.tree_util.tree_map(put, local_batch)

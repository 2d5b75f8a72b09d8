"""Multi-host / multi-slice initialization.

The reference's only "distributed backend" is Slurm array jobs + rsync
(SURVEY.md §5.8 — no NCCL/MPI/torch.distributed anywhere).  Here multi-host
scale-out is XLA-native: each host process calls :func:`initialize`, after
which ``jax.devices()`` spans the pod and the existing mesh helpers
(parallel/mesh.py) and sharded graphs work unchanged — gradient all-reduce
rides ICI within a slice and DCN across slices, inserted by XLA from the
same sharding annotations used single-host.

Single-chip and CPU-mesh runs never need this module; it is the entry hook
for real pods (cannot be exercised in a 1-chip environment — kept minimal
and side-effect free until called).
"""

from __future__ import annotations

from typing import Optional


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-host JAX runtime (``jax.distributed.initialize``).

    With no arguments, relies on the TPU pod metadata/env autodetection
    (the normal path on Cloud TPU VMs).  Explicit arguments support
    non-TPU-metadata clusters: a coordinator ``host:port``, world size, and
    this process's rank.
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def is_multi_process() -> bool:
    import jax

    return jax.process_count() > 1


def process_info() -> str:
    import jax

    return (
        f"process {jax.process_index()}/{jax.process_count()}, "
        f"{jax.local_device_count()} local of {jax.device_count()} global devices"
    )

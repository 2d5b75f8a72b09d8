"""Multi-host / multi-slice initialization.

The reference's only "distributed backend" is Slurm array jobs + rsync
(SURVEY.md §5.8 — no NCCL/MPI/torch.distributed anywhere).  Here multi-host
scale-out is XLA-native: each host process calls :func:`initialize`, after
which ``jax.devices()`` spans the pod and the existing mesh helpers
(parallel/mesh.py) and sharded graphs work unchanged — gradient all-reduce
rides ICI within a slice and DCN across slices, inserted by XLA from the
same sharding annotations used single-host.

Single-chip and CPU-mesh runs never need this module; it is the entry hook
for real pods.  The path IS exercised end-to-end in this environment:
tests/test_distributed_multiprocess.py spawns two coordinator-joined
processes over XLA's Gloo TCP CPU collectives (``cpu_collectives='gloo'``)
and pins a cross-process data-parallel training step numerically equal to
the single-process big-batch step.
"""

from __future__ import annotations

from typing import Optional


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    cpu_collectives: Optional[str] = None,
) -> None:
    """Join the multi-host JAX runtime (``jax.distributed.initialize``).

    With no arguments, relies on the TPU pod metadata/env autodetection
    (the normal path on Cloud TPU VMs).  Explicit arguments support
    non-TPU-metadata clusters: a coordinator ``host:port``, world size, and
    this process's rank.

    ``cpu_collectives`` selects the CPU backend's cross-process collectives
    implementation (``'gloo'`` or ``'mpi'``) — the substrate that lets the
    full multi-host path (coordinator, global mesh, psum over process
    boundaries) run on CPU hosts, e.g. for pre-pod integration testing.  It
    must be set before the first backend touch, so pass it here rather than
    flipping the config flag after the fact.  TPU pods ignore it (their
    collectives ride ICI/DCN natively).
    """
    import jax

    if cpu_collectives is not None:
        jax.config.update("jax_cpu_collectives_implementation", cpu_collectives)

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

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
tests/test_distributed_multiprocess.py spawns coordinator-joined processes
over XLA's Gloo TCP CPU collectives (``cpu_collectives='gloo'``) and pins

- a cross-process data-parallel training step numerically equal to the
  single-process big-batch step (each process feeding only its local rows),
- the full TrainLoop story: coordinator-only artifact writes, preemption
  AGREED across processes (:func:`make_preemption_sync`), resume broadcast
  from the coordinator's checkpoint (:func:`sync_resume`), and
  interrupted+resumed == uninterrupted on the same topology,
- the device-resident dataset (--device_cache) with each host uploading
  only its addressable row block.
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


def add_cli_args(parser) -> None:
    """The multi-host flag set shared by every CLI (train, sweep).

    One definition so the flags, their help text, and the validation in
    :func:`initialize_from_args` cannot drift between entry points.
    """
    parser.add_argument(
        "--distributed",
        action="store_true",
        help="multi-host: join the pod runtime via "
        "jax.distributed.initialize() autodetection (TPU pod metadata / "
        "SLURM env); use the explicit flags below on clusters without it",
    )
    parser.add_argument(
        "--coordinator_address",
        type=str,
        default=None,
        help="multi-host: coordinator host:port for "
        "jax.distributed.initialize (the mesh then spans the pod; "
        "SURVEY §5.8)",
    )
    parser.add_argument(
        "--num_processes",
        type=int,
        default=None,
        help="multi-host: world size (omit on TPU pods with metadata "
        "autodetection)",
    )
    parser.add_argument(
        "--process_id", type=int, default=None,
        help="multi-host: this process's rank",
    )
    parser.add_argument(
        "--cpu_collectives",
        type=str,
        default=None,
        choices=("gloo", "mpi"),
        help="multi-host on CPU hosts: cross-process collectives "
        "implementation (TPU pods ignore this — their collectives ride "
        "ICI/DCN)",
    )


def initialize_from_args(args, parser) -> bool:
    """Validate the :func:`add_cli_args` flags and join the pod runtime.

    Returns True when the runtime was initialized.  Must run BEFORE the
    first backend touch (jax.devices()/jit), so call it straight after
    parse_args.  Validation failures go through ``parser.error`` so the
    user sees a usage message, not a deep jax internal error:

    - --num_processes/--process_id need --coordinator_address (without it,
      jax.distributed autodetection fails with a confusing internal error);
    - --cpu_collectives alone is rejected rather than silently ignored: it
      only takes effect when the runtime is actually joined, so accepting
      it without --coordinator_address/--distributed would leave the user
      believing Gloo/MPI collectives are active when nothing happened;
    - bare --distributed runs jax.distributed.initialize() autodetection
      (the normal path on Cloud TPU pods).
    """
    explicit = (
        args.coordinator_address is not None or args.process_id is not None
    )
    if (
        args.num_processes is not None or args.process_id is not None
    ) and args.coordinator_address is None:
        parser.error("--num_processes/--process_id require --coordinator_address")
    if args.cpu_collectives is not None and not (explicit or args.distributed):
        parser.error(
            "--cpu_collectives has no effect without --coordinator_address "
            "or --distributed (the runtime is never joined)"
        )
    if not (explicit or args.distributed):
        return False
    initialize(
        coordinator_address=args.coordinator_address,
        num_processes=args.num_processes,
        process_id=args.process_id,
        cpu_collectives=args.cpu_collectives,
    )
    print(process_info(), flush=True)
    return True


def is_multi_process() -> bool:
    import jax

    return jax.process_count() > 1


def make_preemption_sync():
    """A ``TrainLoop.sync_preempt`` hook: processes AGREE on preemption.

    SIGTERM lands on one host; if that process alone stopped at a step
    boundary while the others entered the next step's collectives, the pod
    would deadlock inside XLA's all-reduce.  The returned callable
    all-gathers each process's local flag and returns the disjunction, so
    every process observes the stop at the SAME step boundary and the
    checkpoint the coordinator writes is the state all of them hold.

    Cost: one tiny cross-process all-gather + HOST sync per vote.  The
    host block is why TrainLoop votes every ``preempt_vote_every`` steps
    (default 10) rather than every step: between votes the dispatch
    pipeline stays async, and detection latency is bounded at K steps —
    far inside any scheduler's grace period.
    """
    import jax
    import numpy as np
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return lambda flag: flag

    def sync(flag: bool) -> bool:
        flags = multihost_utils.process_allgather(
            np.asarray(bool(flag), dtype=np.bool_)
        )
        return bool(np.asarray(flags).any())

    return sync


def sync_resume(loop, params, state, opt_state):
    """Align a multi-host resume on the COORDINATOR's checkpoint.

    Each process calls ``TrainLoop.resume_if_possible`` against its own
    checkpoint_dir; on pods with host-local disks only the coordinator
    (which is the one process that writes artifacts) finds a checkpoint, and
    without agreement the processes would enter the epoch loop at different
    steps — divergent collectives, deadlock.  This broadcasts process 0's
    entire resume state — params, model state, optimizer state, and the
    loop counters (epoch / global_step / epoch_step / best_val_loss) — so
    every process continues from the coordinator's checkpoint exactly.
    Single-process: identity.

    Returns the (params, state, opt_state) to train with; mutates ``loop``'s
    counters in place.
    """
    import jax
    import numpy as np
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return params, state, opt_state

    counters = np.asarray(
        [loop.epoch, loop.global_step, loop.epoch_step], dtype=np.int32
    )
    # float32 round-trip is lossless here: best_val_loss originates as a
    # float32 device loss (or +inf before any validation).
    best = np.asarray(loop.best_val_loss, dtype=np.float32)
    params, state, opt, counters, best = multihost_utils.broadcast_one_to_all(
        (
            params,
            state,
            (opt_state.step, opt_state.mu, opt_state.nu),
            counters,
            best,
        )
    )
    from laughter_detection_icsi_tpu.train.optim import AdamState

    opt_state = AdamState(step=opt[0], mu=opt[1], nu=opt[2])
    loop.epoch = int(counters[0])
    loop.global_step = int(counters[1])
    loop.epoch_step = int(counters[2])
    loop.best_val_loss = float(best)
    return params, state, opt_state


def process_info() -> str:
    import jax

    return (
        f"process {jax.process_index()}/{jax.process_count()}, "
        f"{jax.local_device_count()} local of {jax.device_count()} global devices"
    )

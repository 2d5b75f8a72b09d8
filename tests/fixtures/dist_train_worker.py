"""Worker for the multi-process TrainLoop integration test.

Drives the REAL TrainLoop (not just a bare step) across two
coordinator-joined processes, exercising the full multi-host training
contract:

- each process feeds only its local rows (dist_common.local_rows — the
  CLI's LadDataset local_rows path in miniature),
- only the coordinator persists checkpoints/metrics (write_artifacts),
- preemption is AGREED across processes (sync_preempt): phase 1 raises the
  flag on process 1 only, mid-epoch, and both processes must stop at the
  same step boundary,
- resume is broadcast from the coordinator (sync_resume): phase 2 starts
  fresh processes where only process 0's checkpoint_dir has a checkpoint,
  and both must re-enter the interrupted epoch at the same step and finish
  the run.

Phase 3 is the control: the same two-process run with NO preemption, in
one go.  The parent test pins interrupted+resumed == uninterrupted on the
same topology (tight — the checkpoint round-trip and broadcast are exact),
and both against a single-process twin (loose — cross-topology collective
reduction order accumulates float noise over the run's optimizer steps).

Usage: dist_train_worker.py <pid> <nproc> <port> <out_json> <ckpt_dir> <phase>
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))


PREEMPT_AT_BATCH = 5  # phase 1: flag raised before this (0-based) batch trains


def main() -> None:
    pid, nproc, port, out_path, ckpt_dir, phase = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
        sys.argv[5],
        int(sys.argv[6]),
    )

    import jax

    jax.config.update("jax_platforms", "cpu")

    from tests.fixtures import dist_common as C

    from laughter_detection_icsi_tpu.parallel import (
        DataParallelTrainer,
        distributed,
        make_mesh,
    )
    from laughter_detection_icsi_tpu.train import TrainLoop

    distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
        cpu_collectives="gloo",
    )

    trainer = DataParallelTrainer(model=C.build_model(), mesh=make_mesh())
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0))

    loop = TrainLoop(
        trainer=trainer,
        checkpoint_dir=ckpt_dir,
        log_frequency=3,
        val_batches_per_log=C.N_VAL_BATCHES,
        metrics_path=str(Path(ckpt_dir) / "metrics.csv"),
        write_artifacts=pid == 0,
        sync_preempt=distributed.make_preemption_sync(),
        # Tightest cadence: this fixture pins boundary-exact agreement (the
        # test asserts both processes stop at PREEMPT_AT_BATCH + 1); the
        # cadence/epoch-end-vote mechanics have their own unit tests
        # (test_train.py test_preempt_vote_cadence*).
        preempt_vote_every=1,
    )
    params, state, opt_state = loop.resume_if_possible(params, state, opt_state)
    params, state, opt_state = distributed.sync_resume(
        loop, params, state, opt_state
    )
    resumed_at = {"epoch": loop.epoch, "global_step": loop.global_step,
                  "epoch_step": loop.epoch_step}

    def local_epoch_batches(epoch: int, preempt_on_this_process: bool):
        for i, b in enumerate(C.epoch_batches(epoch)):
            if preempt_on_this_process and i == PREEMPT_AT_BATCH:
                # As if SIGTERM landed on this host right now: the local
                # flag flips here; the OTHER process only learns of it
                # through sync_preempt.
                loop.preempted = True
            yield C.local_rows(b, pid, nproc)

    def val_fn(n: int):
        return [C.local_rows(b, pid, nproc) for b in C.val_batches()[:n]]

    mean_losses = []
    target_epochs = 2
    while loop.epoch < target_epochs and not loop.preempted:
        params, state, opt_state, mean_loss = loop.run_epoch(
            params,
            state,
            opt_state,
            local_epoch_batches(
                loop.epoch,
                preempt_on_this_process=(phase == 1 and pid == 1
                                         and loop.epoch == 0),
            ),
            val_batches_fn=val_fn,
            verbose=False,
        )
        mean_losses.append(float(mean_loss))

    report = {
        "resumed_at": resumed_at,
        "stopped": {"epoch": loop.epoch, "global_step": loop.global_step,
                    "epoch_step": loop.epoch_step, "preempted": loop.preempted},
        "mean_losses": mean_losses,
        "param_checksum": C.param_checksum(params),
        "best_val_loss": float(loop.best_val_loss),
    }
    with open(out_path, "w") as f:
        json.dump(report, f)


if __name__ == "__main__":
    main()

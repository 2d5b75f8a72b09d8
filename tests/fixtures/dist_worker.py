"""Worker for the two-process jax.distributed integration test.

Each process joins the coordinator over Gloo TCP CPU collectives (the
CPU-host stand-in for a TPU pod's ICI/DCN — parallel/distributed.py), sees
a GLOBAL device view (2 local x 2 processes = 4 devices), builds the
framework's own mesh/trainer, feeds only ITS OWN rows of a deterministic
global batch through ``DataParallelTrainer.train_batch`` (whose multi-host
contract is local rows per process), and writes
its observed losses + a parameter checksum to a JSON file for the parent
test to compare across processes and against the single-process big-batch
run.

Usage: dist_worker.py <process_id> <num_processes> <port> <out_json>
"""

import json
import sys
from pathlib import Path

# Script-dir sys.path[0] is tests/fixtures — the framework import needs the
# repo root regardless of how the parent launched us.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))


def main() -> None:
    pid, nproc, port, out_path = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )

    import jax

    # Pin the platform before first backend touch (the parent already
    # scrubbed the axon tunnel plugin out of the environment).
    jax.config.update("jax_platforms", "cpu")

    from laughter_detection_icsi_tpu.parallel import (
        DataParallelTrainer,
        distributed,
        make_mesh,
    )
    from tests.fixtures import dist_common as C

    distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
        cpu_collectives="gloo",
    )
    assert distributed.is_multi_process()
    info = distributed.process_info()

    n_global = jax.device_count()
    n_local = jax.local_device_count()
    mesh = make_mesh()  # all GLOBAL devices

    dp = DataParallelTrainer(model=C.build_model(), mesh=mesh)
    params, state, opt_state = dp.init(jax.random.PRNGKey(0))

    import numpy as np

    # The SAME deterministic global batches the parent computes its
    # single-process expectation from (dist_common recipe, seed 123); this
    # worker feeds only its rows.
    rng = np.random.default_rng(123)
    losses = []
    for _ in range(2):
        batch = C.toy_batch(rng)
        local = C.local_rows(batch, pid, nproc)
        params, state, opt_state, m = dp.train_batch(
            params, state, opt_state, local, None
        )
        losses.append(float(m["loss"]))

    ev = dp.eval_batch(params, state, local)
    checksum = C.param_checksum(params)
    with open(out_path, "w") as f:
        json.dump(
            {
                "process_info": info,
                "n_global_devices": n_global,
                "n_local_devices": n_local,
                "losses": losses,
                "eval_loss": float(ev["loss"]),
                "eval_acc": float(ev["acc"]),
                "param_checksum": checksum,
            },
            f,
        )


if __name__ == "__main__":
    main()

"""Worker for the multi-process device-resident dataset test.

Builds a ResidentLadDataset over a 2-process global mesh: each process
assembles and uploads ONLY its addressable row block
(data.dataset._addressable_row_block + jax.make_array_from_process_local_data),
then runs fused resident train steps where the batch gather crosses process
boundaries over the interconnect (the multi-host twin of --device_cache).
Losses must equal the single-process resident run.

Usage: dist_resident_worker.py <pid> <nproc> <port> <out_json>
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

N_ROWS = 32
BATCH = 8
STEPS = 3


def main() -> None:
    pid, nproc, port, out_path = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from tests.fixtures import dist_common as C

    from laughter_detection_icsi_tpu.data.dataset import ResidentLadDataset
    from laughter_detection_icsi_tpu.parallel import (
        DataParallelTrainer,
        distributed,
        make_mesh,
    )
    from laughter_detection_icsi_tpu.parallel import mesh as mesh_lib

    distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
        cpu_collectives="gloo",
    )

    mesh = make_mesh()
    resident = ResidentLadDataset(
        C.toy_lad_dataset(N_ROWS),
        sharding=mesh_lib.data_sharding(mesh),
        pad_rows_to=int(mesh.devices.size),
    )
    # Each process uploaded only its block; the global arrays span the mesh.
    assert resident.feats.shape[0] == N_ROWS
    local_rows = sum(
        s.data.shape[0] for s in resident.feats.addressable_shards
    )
    assert local_rows == N_ROWS // nproc, local_rows

    trainer = DataParallelTrainer(model=C.build_model(), mesh=mesh)
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(5)
    losses = []
    for step in range(STEPS):
        idx = rng.permutation(N_ROWS)[:BATCH]  # global indices, same everywhere
        params, state, opt_state, m = trainer.train_batch_resident(
            params, state, opt_state, resident, idx, jax.random.PRNGKey(9), step
        )
        losses.append(float(m["loss"]))
    ev = trainer.eval_batch(
        params, state, {"resident": resident, "idx": np.arange(BATCH)}
    )

    with open(out_path, "w") as f:
        json.dump(
            {
                "losses": losses,
                "eval_loss": float(ev["loss"]),
                "param_checksum": C.param_checksum(params),
            },
            f,
        )


if __name__ == "__main__":
    main()

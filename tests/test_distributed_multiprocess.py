"""Real multi-process jax.distributed integration (SURVEY.md §5.8).

The reference's only "distributed backend" is Slurm arrays of independent
processes; ours is the XLA-native runtime — and unlike round 1's
argument-forwarding stub test, this spawns TWO coordinator-joined processes
over Gloo TCP CPU collectives (the CPU-host stand-in for a pod's ICI/DCN)
and runs the framework's own DataParallelTrainer across them: global mesh
spanning both processes, each feeding only its local rows
(``train_batch_local`` / ``shard_local_batch``), gradients and global-BN
batch stats reduced ACROSS PROCESS BOUNDARIES by XLA's inserted
collectives.  The observed losses must equal the single-process big-batch
run — the same invariant test_parallel.py pins within one process.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
WORKER = REPO / "tests" / "fixtures" / "dist_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_expectation():
    """The 4-device single-process twin of the workers' 2-step run."""
    from laughter_detection_icsi_tpu import models
    from laughter_detection_icsi_tpu.parallel import DataParallelTrainer, make_mesh

    model = models.MLPModel(
        linear_layer_size=12 * 8, hid_dim1=32, hid_dim2=16, dropout_rate=0.0
    )
    dp = DataParallelTrainer(model=model, mesh=make_mesh(4))
    params, state, opt_state = dp.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(123)
    losses = []
    for _ in range(2):
        y = (rng.uniform(size=16) > 0.5).astype(np.float32)
        x = rng.standard_normal((16, 12, 8)).astype(np.float32) * 0.1
        x[y > 0.5, :, :3] += 2.0
        params, state, opt_state, m = dp.train_batch(
            params, state, opt_state, {"inputs": x, "is_laugh": y}, None
        )
        losses.append(float(m["loss"]))
    return losses


def test_two_process_gloo_dp_training_matches_single_process(tmp_path):
    env = {
        k: v
        for k, v in os.environ.items()
        # Strip the axon tunnel plugin (registers via sitecustomize when
        # PALLAS_AXON_POOL_IPS is set, overrides JAX_PLATFORMS, and blocks
        # backend init while the tunnel is unreachable).
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PALLAS_AXON_POOL_IPS")
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    port = _free_port()

    outs = [tmp_path / f"w{i}.json" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(i), "2", str(port), str(outs[i])],
            env=env,
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append((p.returncode, out, err))
    assert all(rc == 0 for rc, _, _ in logs), logs

    reports = [json.loads(o.read_text()) for o in outs]
    for r in reports:
        assert r["n_global_devices"] == 4
        assert r["n_local_devices"] == 2
    assert "process 0/2" in reports[0]["process_info"]
    assert "process 1/2" in reports[1]["process_info"]

    # Replicated outputs: both processes observed the IDENTICAL losses and
    # ended with bit-identical replicated parameters.
    assert reports[0]["losses"] == reports[1]["losses"]
    assert reports[0]["param_checksum"] == reports[1]["param_checksum"]
    assert reports[0]["eval_loss"] == reports[1]["eval_loss"]

    # And the cross-process run equals the single-process big-batch run
    # (global BN stats + grad all-reduce make them the same computation;
    # rel tolerance for cross-device reduction-order float noise, as in
    # test_parallel.test_dp_step_matches_single_device).
    expected = _single_process_expectation()
    for got, want in zip(reports[0]["losses"], expected):
        assert got == pytest.approx(want, rel=1e-5)

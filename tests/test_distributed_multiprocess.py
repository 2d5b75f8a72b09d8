"""Real multi-process jax.distributed integration (SURVEY.md §5.8).

The reference's only "distributed backend" is Slurm arrays of independent
processes; ours is the XLA-native runtime — and unlike round 1's
argument-forwarding stub test, this spawns TWO coordinator-joined processes
over Gloo TCP CPU collectives (the CPU-host stand-in for a pod's ICI/DCN)
and runs the framework's own DataParallelTrainer across them: global mesh
spanning both processes, each feeding only its local rows
(``train_batch``'s multi-host contract / ``shard_local_batch``), gradients and global-BN
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


TRAIN_WORKER = REPO / "tests" / "fixtures" / "dist_train_worker.py"
RESIDENT_WORKER = REPO / "tests" / "fixtures" / "dist_resident_worker.py"
SWEEP_WORKER = REPO / "tests" / "fixtures" / "dist_sweep_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn_workers(worker, n, extra_args, local_devices=2, timeout=600):
    """Run ``n`` coordinator-joined worker processes to completion.

    Returns [(rc, stdout, stderr), ...]; asserts nothing — callers own the
    checks so failures print the logs they need.
    """
    env = {
        k: v
        for k, v in os.environ.items()
        # Strip the axon tunnel plugin (registers via sitecustomize when
        # PALLAS_AXON_POOL_IPS is set, overrides JAX_PLATFORMS, and blocks
        # backend init while the tunnel is unreachable).
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PALLAS_AXON_POOL_IPS")
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={local_devices}"
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(n), str(port)]
            + [str(a) for a in extra_args(i)],
            env=env,
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(n)
    ]
    logs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append((p.returncode, out, err))
    return logs


def _single_process_expectation():
    """The 4-device single-process twin of the workers' 2-step run (the
    SAME dist_common batch recipe and seed the worker uses — one source of
    truth for the batch bytes)."""
    from tests.fixtures import dist_common as C

    from laughter_detection_icsi_tpu.parallel import DataParallelTrainer, make_mesh

    dp = DataParallelTrainer(model=C.build_model(), mesh=make_mesh(4))
    params, state, opt_state = dp.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(123)
    losses = []
    for _ in range(2):
        batch = C.toy_batch(rng)
        params, state, opt_state, m = dp.train_batch(
            params, state, opt_state, batch, None
        )
        losses.append(float(m["loss"]))
    return losses


def test_two_process_gloo_dp_training_matches_single_process(tmp_path):
    outs = [tmp_path / f"w{i}.json" for i in range(2)]
    logs = _spawn_workers(WORKER, 2, lambda i: [outs[i]])
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


def _uninterrupted_twin(tmp_path):
    """Single-process TrainLoop twin of the workers' 2-epoch run."""
    from tests.fixtures import dist_common as C

    from laughter_detection_icsi_tpu.parallel import DataParallelTrainer, make_mesh
    from laughter_detection_icsi_tpu.train import TrainLoop

    trainer = DataParallelTrainer(model=C.build_model(), mesh=make_mesh(4))
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0))
    loop = TrainLoop(
        trainer=trainer,
        checkpoint_dir=str(tmp_path / "twin"),
        log_frequency=3,
        val_batches_per_log=C.N_VAL_BATCHES,
        metrics_path=str(tmp_path / "twin" / "metrics.csv"),
    )
    (tmp_path / "twin").mkdir(exist_ok=True)
    mean_losses = []
    for epoch in range(2):
        params, state, opt_state, mean_loss = loop.run_epoch(
            params, state, opt_state,
            C.epoch_batches(epoch),
            val_batches_fn=lambda n: C.val_batches()[:n],
            verbose=False,
        )
        mean_losses.append(float(mean_loss))
    return {
        "mean_losses": mean_losses,
        "param_checksum": C.param_checksum(params),
        "best_val_loss": float(loop.best_val_loss),
    }


def test_multihost_trainloop_preempt_resume_equals_uninterrupted(tmp_path):
    """The full multi-host TrainLoop story in one run: phase 1 preempts ONE
    process mid-epoch (sync_preempt must stop both at the same boundary,
    write_artifacts must confine persistence to the coordinator); phase 2
    starts fresh processes where only the coordinator's dir holds the
    checkpoint (sync_resume must broadcast it) and finishes the run.  The
    result must equal the uninterrupted single-process twin."""
    from tests.fixtures.dist_train_worker import PREEMPT_AT_BATCH
    from tests.fixtures import dist_common as C

    ckpts = [tmp_path / f"ckpt_p{i}" for i in range(2)]
    for d in ckpts:
        d.mkdir()

    # ---- phase 1: preemption lands on process 1 only ----
    outs1 = [tmp_path / f"p1_w{i}.json" for i in range(2)]
    logs = _spawn_workers(
        TRAIN_WORKER, 2, lambda i: [outs1[i], ckpts[i], 1]
    )
    assert all(rc == 0 for rc, _, _ in logs), logs
    r1 = [json.loads(o.read_text()) for o in outs1]
    # Both processes stopped at the SAME step boundary, one past the flag.
    for r in r1:
        assert r["stopped"]["preempted"] is True
        assert r["stopped"]["global_step"] == PREEMPT_AT_BATCH + 1
        assert r["stopped"]["epoch"] == 0
    # Only the coordinator persisted anything.
    assert any(ckpts[0].iterdir()), "coordinator wrote no checkpoint"
    assert not any(ckpts[1].iterdir()), "non-coordinator wrote artifacts"

    # ---- phase 2: fresh processes; only ckpts[0] holds the checkpoint ----
    outs2 = [tmp_path / f"p2_w{i}.json" for i in range(2)]
    logs = _spawn_workers(
        TRAIN_WORKER, 2, lambda i: [outs2[i], ckpts[i], 2]
    )
    assert all(rc == 0 for rc, _, _ in logs), logs
    r2 = [json.loads(o.read_text()) for o in outs2]
    # sync_resume broadcast the coordinator's checkpoint: BOTH processes
    # re-entered the interrupted epoch at the same mid-epoch position.
    for r in r2:
        assert r["resumed_at"] == {
            "epoch": 0,
            "global_step": PREEMPT_AT_BATCH + 1,
            "epoch_step": PREEMPT_AT_BATCH + 1,
        }
        assert r["stopped"]["epoch"] == 2
        assert r["stopped"]["preempted"] is False
    assert r2[0]["param_checksum"] == r2[1]["param_checksum"]

    # ---- phase 3 (control): same two-process run, never interrupted ----
    ckpts3 = [tmp_path / f"ckpt3_p{i}" for i in range(2)]
    for d in ckpts3:
        d.mkdir()
    outs3 = [tmp_path / f"p3_w{i}.json" for i in range(2)]
    logs = _spawn_workers(
        TRAIN_WORKER, 2, lambda i: [outs3[i], ckpts3[i], 3]
    )
    assert all(rc == 0 for rc, _, _ in logs), logs
    r3 = [json.loads(o.read_text()) for o in outs3]

    # interrupted + resumed == uninterrupted ON THE SAME TOPOLOGY: the
    # checkpoint round-trip and the resume broadcast are exact, so this
    # comparison is tight — it isolates the multi-host resume machinery
    # from cross-topology collective float noise.
    assert r2[0]["param_checksum"] == pytest.approx(
        r3[0]["param_checksum"], rel=1e-6
    )
    assert r2[0]["best_val_loss"] == pytest.approx(
        r3[0]["best_val_loss"], rel=1e-6
    )
    assert r2[0]["mean_losses"][-1] == pytest.approx(
        r3[0]["mean_losses"][-1], rel=1e-6
    )

    # ---- and both equal the single-process twin, within the float noise
    # cross-topology reduction order accumulates over 16 Adam steps ----
    twin = _uninterrupted_twin(tmp_path)
    assert r2[0]["param_checksum"] == pytest.approx(
        twin["param_checksum"], rel=2e-3
    )
    assert r2[0]["best_val_loss"] == pytest.approx(
        twin["best_val_loss"], rel=1e-3
    )
    # Epoch 1 (the post-resume full epoch) mean loss matches the twin's.
    assert r2[0]["mean_losses"][-1] == pytest.approx(
        twin["mean_losses"][-1], rel=1e-3
    )
    # The coordinator's metrics.csv carries the merged run's log points.
    metrics = (ckpts[0] / "metrics.csv").read_text().strip().splitlines()
    twin_metrics = (
        (tmp_path / "twin" / "metrics.csv").read_text().strip().splitlines()
    )
    steps = [line.split(",")[0] for line in metrics[1:]]
    twin_steps = [line.split(",")[0] for line in twin_metrics[1:]]
    assert steps == twin_steps


def _single_process_resident_expectation():
    """4-device single-process twin of the resident workers' run."""
    import numpy as np

    from tests.fixtures import dist_common as C
    from tests.fixtures.dist_resident_worker import BATCH, N_ROWS, STEPS

    from laughter_detection_icsi_tpu.data.dataset import ResidentLadDataset
    from laughter_detection_icsi_tpu.parallel import DataParallelTrainer, make_mesh
    from laughter_detection_icsi_tpu.parallel import mesh as mesh_lib

    mesh = make_mesh(4)
    resident = ResidentLadDataset(
        C.toy_lad_dataset(N_ROWS),
        sharding=mesh_lib.data_sharding(mesh),
        pad_rows_to=int(mesh.devices.size),
    )
    trainer = DataParallelTrainer(model=C.build_model(), mesh=mesh)
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    losses = []
    for step in range(STEPS):
        idx = rng.permutation(N_ROWS)[:BATCH]
        params, state, opt_state, m = trainer.train_batch_resident(
            params, state, opt_state, resident, idx, jax.random.PRNGKey(9), step
        )
        losses.append(float(m["loss"]))
    ev = trainer.eval_batch(
        params, state, {"resident": resident, "idx": np.arange(BATCH)}
    )
    return losses, float(ev["loss"])


def test_multihost_resident_dataset_matches_single_process(tmp_path):
    """--device_cache across processes: each host uploads only its
    addressable row block; the fused gather+step crosses process boundaries
    over the interconnect and must equal the single-process resident run."""
    outs = [tmp_path / f"w{i}.json" for i in range(2)]
    logs = _spawn_workers(RESIDENT_WORKER, 2, lambda i: [outs[i]])
    assert all(rc == 0 for rc, _, _ in logs), logs

    reports = [json.loads(o.read_text()) for o in outs]
    assert reports[0]["losses"] == reports[1]["losses"]
    assert reports[0]["param_checksum"] == reports[1]["param_checksum"]

    losses, eval_loss = _single_process_resident_expectation()
    for got, want in zip(reports[0]["losses"], losses):
        assert got == pytest.approx(want, rel=1e-5)
    assert reports[0]["eval_loss"] == pytest.approx(eval_loss, rel=1e-5)


def test_multihost_sharded_inference_matches_single_process(tmp_path):
    """Meeting sweep across processes: each host decodes only its channel
    block and postprocesses only its rows; together they must cover every
    channel exactly once, with probabilities and swept instances equal to
    the single-process run."""
    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    outs = [tmp_path / f"w{i}.json" for i in range(2)]
    logs = _spawn_workers(
        SWEEP_WORKER, 2, lambda i: [outs[i], audio_dir], timeout=900
    )
    assert all(rc == 0 for rc, _, _ in logs), logs
    reports = [json.loads(o.read_text()) for o in outs]

    # Channel partition: disjoint, together covering all channels.
    from tests.fixtures.dist_sweep_worker import (
        N_CHANNELS,
        run_pipeline,
        write_meeting,
    )

    rows0, rows1 = set(reports[0]), set(reports[1])
    assert rows0.isdisjoint(rows1)
    assert rows0 | rows1 == {str(i) for i in range(N_CHANNELS)}

    # Single-process twin over the same meeting files.
    from laughter_detection_icsi_tpu.parallel import make_mesh

    paths = write_meeting(str(audio_dir))  # overwrite with identical bytes
    single = run_pipeline(make_mesh(4), paths)
    assert set(single) == rows0 | rows1
    merged = {**reports[0], **reports[1]}
    for ch, want in single.items():
        got = merged[ch]
        assert got["t"] == want["t"]
        assert got["duration"] == pytest.approx(want["duration"])
        for a, b in zip(got["probs_head"], want["probs_head"]):
            assert a == pytest.approx(b, abs=1e-5)
        assert got["probs_sum"] == pytest.approx(want["probs_sum"], rel=1e-4)
        # The swept (threshold, min_length) instance tables — the sweep's
        # actual product — must agree exactly at TextGrid rounding.
        assert got["instances"] == want["instances"]


def test_local_rows_partition_reassembles_global_batches():
    """dist_common.local_rows / LadDataset.batches(local_rows=...): the
    process slices concatenated in process order ARE the global batch —
    the contract shard_local_batch's reassembly relies on."""
    import numpy as np

    from tests.fixtures import dist_common as C

    ds = C.toy_lad_dataset(n_rows=32)
    full = list(ds.batches(8, shuffle=True, seed=3, drop_remainder=True,
                           prefetch=0))
    parts = [
        list(ds.batches(8, shuffle=True, seed=3, drop_remainder=True,
                        prefetch=0, local_rows=(pid, 2)))
        for pid in range(2)
    ]
    assert len(full) == len(parts[0]) == len(parts[1]) == 4
    for b_full, b0, b1 in zip(full, parts[0], parts[1]):
        for k in ("inputs", "input_lens", "is_laugh"):
            np.testing.assert_array_equal(
                b_full[k], np.concatenate([b0[k], b1[k]], axis=0)
            )

    with pytest.raises(ValueError, match="drop_remainder"):
        next(ds.batches(8, drop_remainder=False, local_rows=(0, 2)))
    with pytest.raises(ValueError, match="divisible"):
        next(ds.batches(9, drop_remainder=True, local_rows=(0, 2)))
    with pytest.raises(ValueError, match="bad process id"):
        next(ds.batches(8, drop_remainder=True, local_rows=(2, 2)))


# --------------------------------------------------------------------------- #
# Real CLI entry points, two coordinator-joined processes
# --------------------------------------------------------------------------- #


def _spawn_cli(argv_fn, n, local_devices=2, timeout=600):
    """Spawn ``n`` processes of a real CLI (sweep.py / train.py) joined via
    explicit coordinator flags — the SPMD 'every host runs the SAME
    command' contract the docs promise, driven end-to-end."""
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PALLAS_AXON_POOL_IPS")
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={local_devices}"
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable] + [str(a) for a in argv_fn(i, port)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(n)
    ]
    logs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append((p.returncode, out, err))
    return logs


def _sweep_cli_setup(synthetic_corpus, root):
    """Btr001 audio (2 equal channels) + a random flagship checkpoint."""
    from laughter_detection_icsi_tpu import models
    from laughter_detection_icsi_tpu.config import MODEL_MAP
    from laughter_detection_icsi_tpu.data import audio
    from laughter_detection_icsi_tpu.train import checkpoint as ckpt_lib

    rng = np.random.default_rng(5)
    audio_dir = root / "audio" / "Btr001"
    audio_dir.mkdir(parents=True)
    for ch in ("chan0", "chan1"):
        audio.write_wav(
            str(audio_dir / f"{ch}.wav"),
            (rng.standard_normal(16000 * 6) * 0.05).astype(np.float32),
            16000,
        )
    preset = MODEL_MAP["resnet_base"]
    model = models.build(
        preset.model, dropout_rate=0.0,
        linear_layer_size=preset.linear_layer_size,
        filter_sizes=preset.filter_sizes,
    )
    params, state = model.init(jax.random.PRNGKey(3))
    ckpt_lib.save_checkpoint(str(root / "ck"), params, state, is_best=True)
    return root / "audio", root / "ck" / "best.ckpt.npz"


def _sweep_argv(audio_dir, tdir, out, ckpt, i, port, nproc=2):
    return [
        REPO / "sweep.py",
        "--audio_dir", audio_dir, "--transcript_dir", tdir,
        "--output_dir", out, "--split", "all", "--meetings", "Btr001",
        "--model_path", ckpt, "--thresholds", "0.2", "--min_lengths", "0.1",
        "--chunk", "512", "--bucket_frames", "1024", "--analyse",
        "--coordinator_address", f"127.0.0.1:{port}",
        "--num_processes", nproc, "--process_id", i,
        "--cpu_collectives", "gloo",
    ]


def test_two_process_sweep_cli_end_to_end(synthetic_corpus, tmp_path):
    """The documented multi-host sweep invocation — every host runs the
    SAME sweep.py command — through the REAL CLI: pod join via the shared
    flag set, up-front selection agreement, per-host channel decode/upload,
    process-local TextGrid writes into shared storage, barrier, and the
    coordinator-chained analyse."""
    audio_dir, ckpt = _sweep_cli_setup(synthetic_corpus, tmp_path)
    out = tmp_path / "preds"
    logs = _spawn_cli(
        lambda i, port: _sweep_argv(
            audio_dir, synthetic_corpus.transcript_dir, out, ckpt, i, port
        ),
        2,
    )
    assert all(rc == 0 for rc, _, _ in logs), logs

    grids = sorted(out.rglob("*.TextGrid"))
    names = {g.name for g in grids}
    assert names == {"chan0.TextGrid", "chan1.TextGrid"}, logs
    stats_files = sorted(out.glob("*sum_stats*.csv"))
    assert stats_files, logs
    import pandas as pd

    stats = pd.read_csv(stats_files[0])
    assert np.isfinite(stats["precision"]).all()
    # Process-local postprocessing: each process reports owning ONE of the
    # two channels (the ownership partition), and both reached the summary.
    assert all("swept" in out_ for _, out_, _ in logs), logs


def test_two_process_sweep_cli_header_divergence_fails_loudly(
    synthetic_corpus, tmp_path
):
    """Same command, but host 1 sees a TRUNCATED copy of chan1 under its
    own --audio_dir: the up-front agreement check must abort BOTH
    processes with the diagnostic — not deadlock inside mismatched
    collectives (the failure mode the digest exists to prevent)."""
    from laughter_detection_icsi_tpu.data import audio

    audio_a, ckpt = _sweep_cli_setup(synthetic_corpus, tmp_path / "a")
    audio_b = tmp_path / "b" / "audio" / "Btr001"
    audio_b.mkdir(parents=True)
    for ch in ("chan0", "chan1"):
        w, sr = audio.read(str(tmp_path / "a" / "audio" / "Btr001" / f"{ch}.wav"))
        if ch == "chan1":
            w = w[: len(w) // 2]  # truncated twin, same name
        audio.write_wav(str(audio_b / f"{ch}.wav"), w, sr)

    dirs = [audio_a, tmp_path / "b" / "audio"]
    logs = _spawn_cli(
        lambda i, port: _sweep_argv(
            dirs[i], synthetic_corpus.transcript_dir,
            tmp_path / "preds", ckpt, i, port,
        ),
        2,
        timeout=300,
    )
    assert all(rc != 0 for rc, _, _ in logs), logs
    assert any("differ across processes" in err for _, _, err in logs), logs


def test_two_process_train_cli_end_to_end(tmp_path):
    """The documented multi-host training invocation through the REAL CLI:
    pod join, coordinator-first featurization behind the barrier,
    local-row feeding under --data_parallel, coordinator-only artifact
    writes into the shared checkpoint dir."""
    import pandas as pd  # noqa: F811 (module-level import exists)

    from laughter_detection_icsi_tpu.data import audio

    root = tmp_path / "root"
    (root / "signals" / "M0").mkdir(parents=True)
    (root / "data_dfs").mkdir()
    rng = np.random.default_rng(0)
    audio.write_wav(
        str(root / "signals" / "M0" / "chan0.wav"),
        (rng.standard_normal(16000 * 6) * 0.1).astype(np.float32),
        16000,
    )
    rows = [
        dict(start=0.0, duration=1.0,
             sub_start=round(float(rng.uniform(0, 4.9)), 2),
             sub_duration=1.0, audio_path="x", meeting_id="M0",
             chan_id="chan0", label=i % 2)
        for i in range(16)
    ]
    pd.DataFrame(rows).to_csv(root / "data_dfs" / "train_df.csv", index=False)
    pd.DataFrame(rows[:8]).to_csv(root / "data_dfs" / "dev_df.csv", index=False)
    ckpt = tmp_path / "ck"

    logs = _spawn_cli(
        lambda i, port: [
            REPO / "train.py",
            "--config", "resnet_base",
            "--checkpoint_dir", ckpt,
            "--data_root", root,
            "--num_epochs", "1",
            "--batch_size", "8",
            "--data_parallel",
            "--coordinator_address", f"127.0.0.1:{port}",
            "--num_processes", "2",
            "--process_id", i,
            "--cpu_collectives", "gloo",
        ],
        2,
    )
    assert all(rc == 0 for rc, _, _ in logs), logs
    # Coordinator-only artifacts in the shared dir.  (metrics.csv is NOT
    # expected: rows are logged every log_frequency=900 steps, and this run
    # is 2 steps — reference cadence, train.py:303.)
    assert (ckpt / "last.ckpt.npz").exists(), logs
    assert (ckpt / "train_params.csv").exists(), logs
    # Both processes joined the pod (4 global devices) and finished epoch 1.
    for rc, out, err in logs:
        assert "process" in out and "4" in out, (out, err)

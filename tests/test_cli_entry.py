"""Subprocess smoke tests for the reference-compatible CLI wrappers.

The library surface is covered by the unit suites; these pin the actual
``python segment_laughter.py ...`` entry (reference segment_laughter.py's
contract: flags in, TextGrid/wavs out) end-to-end in a fresh process —
argument plumbing, env setup, and output layout included.
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _cpu_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)  # drop any accelerator-plugin site dir
    return env


def test_segment_laughter_cli_writes_textgrid(tmp_path):
    from laughter_detection_icsi_tpu.data import audio

    wav = tmp_path / "meeting.wav"
    rng = np.random.default_rng(11)
    # 1.5 s with a loud burst so some threshold can fire either way
    w = (rng.standard_normal(24000) * 0.05).astype(np.float32)
    w[8000:12000] += 0.3
    audio.write_wav(str(wav), np.clip(w, -1, 1), 16000)
    out_dir = tmp_path / "out"

    res = subprocess.run(
        [
            sys.executable,
            str(REPO / "segment_laughter.py"),
            "--input_audio_file", str(wav),
            "--output_dir", str(out_dir),
            "--random_init",
            "--thresholds", "0.2,0.9",
            "--min_lengths", "0.0,0.2",
            "--save_to_textgrid", "True",
            "--save_to_audio_files", "False",
            "--chunk", "64",
            "--bucket_frames", "128",
            "--transfer_codec", "packed",
        ],
        cwd=REPO,
        env=_cpu_env(),
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    # Reference layout: <out>/t_<thr>/l_<minlen>/<name>.TextGrid, written
    # only for settings with >= 1 instance (reference
    # segment_laughter.py:132-133 gates on len(instances) > 0; the random
    # init's sigmoid output hovers near 0.5, so t_0.2 fires and t_0.9
    # cannot).  Empty settings still get their directory (mkdir parity).
    grids = sorted(out_dir.rglob("*.TextGrid"))
    rels = {g.relative_to(out_dir).parts[:2] for g in grids}
    assert rels == {("t_0.2", "l_0.0"), ("t_0.2", "l_0.2")}, (
        res.stdout,
        res.stderr[-500:],
    )
    assert (out_dir / "t_0.9" / "l_0.2").is_dir()


def _mini_train_root(tmp_path):
    import pandas as pd

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
        dict(start=0.0, duration=1.0, sub_start=round(float(rng.uniform(0, 4.9)), 2),
             sub_duration=1.0, audio_path="x", meeting_id="M0", chan_id="chan0",
             label=i % 2)
        for i in range(16)
    ]
    pd.DataFrame(rows).to_csv(root / "data_dfs" / "train_df.csv", index=False)
    pd.DataFrame(rows[:8]).to_csv(root / "data_dfs" / "dev_df.csv", index=False)
    return root


def _run_train(root, ckpt_dir, epochs):
    res = subprocess.run(
        [
            sys.executable, str(REPO / "train.py"),
            "--config", "resnet_base",
            "--checkpoint_dir", str(ckpt_dir),
            "--data_root", str(root),
            "--num_epochs", str(epochs),
            "--batch_size", "8",
        ],
        cwd=REPO, env=_cpu_env(), capture_output=True, text=True, timeout=560,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    return res


def test_train_cli_interrupted_resume_equals_continuous(tmp_path):
    """The reference scales training as N single-epoch jobs that resume
    each other's checkpoints (reference cluster_scripts/gen_train_exp.py:
    49-62).  Two one-epoch runs resuming from disk must produce EXACTLY
    the checkpoint of one two-epoch run — params, optimizer state, and
    counters — or resume is silently lossy."""
    root = _mini_train_root(tmp_path)

    _run_train(root, tmp_path / "ck_cont", 2)
    _run_train(root, tmp_path / "ck_resume", 1)
    out = _run_train(root, tmp_path / "ck_resume", 1)
    assert "resumed from step" in out.stdout, out.stdout

    a = np.load(tmp_path / "ck_cont" / "last.ckpt.npz", allow_pickle=True)
    b = np.load(tmp_path / "ck_resume" / "last.ckpt.npz", allow_pickle=True)
    assert set(a.files) == set(b.files)
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_train_cli_precision_bfloat16(tmp_path):
    """--precision bfloat16 (the TPU mixed-precision mode, PARITY.md #24)
    through the full CLI: one epoch trains, and the checkpoint's params
    are still float32 masters."""
    root = _mini_train_root(tmp_path)
    ckpt = tmp_path / "ck_bf16"
    res = subprocess.run(
        [
            sys.executable, str(REPO / "train.py"),
            "--config", "resnet_base",
            "--checkpoint_dir", str(ckpt),
            "--data_root", str(root),
            "--num_epochs", "1",
            "--batch_size", "8",
            "--precision", "bfloat16",
        ],
        cwd=REPO, env=_cpu_env(), capture_output=True, text=True, timeout=560,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    ck = np.load(ckpt / "last.ckpt.npz", allow_pickle=True)
    float_params = [
        k for k in ck.files
        if k.startswith("params/") and np.issubdtype(ck[k].dtype, np.floating)
    ]
    assert float_params, list(ck.files)[:8]
    for k in float_params:
        assert ck[k].dtype == np.float32, (k, ck[k].dtype)


def test_create_data_df_and_compute_features_cli(synthetic_corpus, tmp_path):
    """Fresh-process drives of the data-prep entry points (reference
    create_data_df.py / compute_features.py): sample tables for all three
    splits, then whole-track features for the sampled channels."""
    import pandas as pd

    from laughter_detection_icsi_tpu.data import audio as audio_lib
    from laughter_detection_icsi_tpu.eval.transcript import TranscriptStore

    dfs_dir = tmp_path / "data_dfs"
    res = subprocess.run(
        [
            sys.executable, str(REPO / "create_data_df.py"),
            "--data_dfs_dir", str(dfs_dir),
            "--transcript_dir", str(synthetic_corpus.transcript_dir),
            "--num_laugh_samples", "1",
            "--num_non_laugh_samples", "3",
        ],
        cwd=REPO, env=_cpu_env(), capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    train_df = pd.read_csv(dfs_dir / "train_df.csv")
    assert {"sub_start", "sub_duration", "meeting_id", "chan_id", "label"} <= set(
        train_df.columns
    )
    assert set(train_df["label"].unique()) == {0, 1}

    # audio for every (meeting, chan) the tables reference
    store = TranscriptStore(str(synthetic_corpus.transcript_dir))
    audio_dir = tmp_path / "audio"
    rng = np.random.default_rng(1)
    for _, row in store.info_df.iterrows():
        d = audio_dir / row.meeting_id
        d.mkdir(parents=True, exist_ok=True)
        audio_lib.write_wav(
            str(d / f"{row.chan_id}.wav"),
            (rng.standard_normal(int(row.length * 16000)) * 0.05).astype(np.float32),
            16000,
        )

    feats_dir = tmp_path / "feats"
    res = subprocess.run(
        [
            sys.executable, str(REPO / "compute_features.py"),
            "--audio_dir", str(audio_dir),
            "--transcript_dir", str(synthetic_corpus.transcript_dir),
            "--output_dir", str(feats_dir),
            "--splits", "train",
        ],
        cwd=REPO, env=_cpu_env(), capture_output=True, text=True, timeout=540,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    tracks = sorted(feats_dir.rglob("*.npy"))
    assert tracks, res.stdout
    # the cache is readable and shaped [T, num_filters]
    from laughter_detection_icsi_tpu.data.feature_cache import FeatureCache

    cache = FeatureCache(str(feats_dir))
    m, c = train_df.iloc[0][["meeting_id", "chan_id"]]
    track = cache.track(m, c)
    assert track.ndim == 2 and track.shape[1] == 44


def test_create_data_df_rejects_invalid_random_selection_env(
    tmp_path, monkeypatch
):
    """RANDOM_SELECTION=1/yes must fail naming the variable (like the
    integer env vars), not silently mean False — a user who believes they
    enabled random selection would otherwise get the deterministic
    structured mix with no warning."""
    from cli import create_data_df as cdd

    monkeypatch.setenv("RANDOM_SELECTION", "1")
    with pytest.raises(SystemExit, match="RANDOM_SELECTION='1'"):
        cdd.main(
            [
                "--data_dfs_dir", str(tmp_path / "dfs"),
                "--transcript_dir", str(tmp_path),  # never reached
            ]
        )


def test_train_cli_arg_validation():
    """Unknown preset, non-positive/non-integer --batch_size, and
    multi-host flags without a coordinator must die as named argparse
    errors before any heavy import — not as raw KeyErrors or range()
    crashes deep in training."""
    from cli import train as train_cli

    base = ["--checkpoint_dir", "/tmp/nope", "--data_root", "/tmp/nope"]
    cases = [
        ["--config", "resnet_bsae"] + base,
        ["--config", "resnet_base", "--batch_size", "0"] + base,
        ["--config", "resnet_base", "--batch_size", "-8"] + base,
        ["--config", "resnet_base", "--batch_size", "eight"] + base,
        ["--config", "resnet_base", "--num_processes", "4"] + base,
        ["--config", "resnet_base", "--process_id", "0"] + base,
        # --cpu_collectives only takes effect when the runtime is joined;
        # accepting it alone would silently configure nothing.
        ["--config", "resnet_base", "--cpu_collectives", "gloo"] + base,
    ]
    for argv in cases:
        with pytest.raises(SystemExit) as ei:
            train_cli.main(argv)
        assert ei.value.code == 2, argv  # argparse error exit


def test_sweep_and_compute_features_reject_empty_selection(synthetic_corpus, tmp_path):
    """A selection that matches nothing (typo'd meeting, or a meeting
    outside the requested split) must error, not run zero work and exit 0
    looking successful."""
    from cli import compute_features as cf
    from cli import sweep as sweep_cli

    tdir = str(synthetic_corpus.transcript_dir)
    with pytest.raises(SystemExit, match="unknown meetings"):
        sweep_cli.main(
            ["--audio_dir", str(tmp_path), "--transcript_dir", tdir,
             "--output_dir", str(tmp_path / "o"), "--model_path",
             str(tmp_path / "nope"), "--meetings", "Zzz999"]
        )
    with pytest.raises(SystemExit, match="no meetings selected"):
        sweep_cli.main(
            ["--audio_dir", str(tmp_path), "--transcript_dir", tdir,
             "--output_dir", str(tmp_path / "o"), "--model_path",
             str(tmp_path / "nope"), "--meetings", "Btr001",
             "--split", "dev"]  # Btr001 is train
        )
    with pytest.raises(SystemExit, match="belong to splits"):
        cf.main(
            ["--audio_dir", str(tmp_path), "--transcript_dir", tdir,
             "--output_dir", str(tmp_path / "f"), "--meetings", "Btr001",
             "--splits", "dev"]  # Btr001 is train
        )


def test_sweep_selection_fingerprint_covers_headers(tmp_path):
    """The multi-host agreement fingerprint must change when a same-named
    audio file differs in LENGTH or encoding across hosts (per-host headers
    drive jitted-graph shapes; a name-only fingerprint would pass and the
    pod would hang in mismatched collectives), and must be stable for
    identical files."""
    from cli.sweep import selection_fingerprint
    from laughter_detection_icsi_tpu.data import audio as audio_io

    rng = np.random.default_rng(0)
    a = tmp_path / "hostA" / "chan0.wav"
    b = tmp_path / "hostB" / "chan0.wav"
    a.parent.mkdir()
    b.parent.mkdir()
    w = (rng.standard_normal(16000) * 0.05).astype(np.float32)
    audio_io.write_wav(str(a), w, 16000)
    audio_io.write_wav(str(b), w, 16000)

    fp = selection_fingerprint([("M0", ["chan0"], [str(a)])])
    same = selection_fingerprint([("M0", ["chan0"], [str(b)])])
    assert fp == same  # identical bytes, different paths: paths don't leak

    audio_io.write_wav(str(b), w[:8000], 16000)  # truncated twin
    truncated = selection_fingerprint([("M0", ["chan0"], [str(b)])])
    assert truncated != fp

    missing = selection_fingerprint([("M0", [], [])])
    assert missing != fp


def test_train_cli_multihost_requires_data_parallel_before_featurize(
    tmp_path, monkeypatch
):
    """A multi-host run missing --data_parallel must fail BEFORE the
    featurization pass (cold-cache featurize can take hours; the
    misconfiguration is knowable immediately after the pod joins)."""
    import jax

    from cli import train as train_cli

    root = _mini_train_root(tmp_path)
    featurize_calls = []
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(
        train_cli, "_ensure_features",
        lambda *a, **k: featurize_calls.append(a),
    )
    with pytest.raises(SystemExit, match="require --data_parallel"):
        train_cli.main(
            [
                "--config", "resnet_base",
                "--checkpoint_dir", str(tmp_path / "ck"),
                "--data_root", str(root),
            ]
        )
    assert featurize_calls == []  # validated before any featurize work

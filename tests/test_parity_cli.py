"""Drill of the parity-protocol harness (cli/parity.py, BASELINE.md): the
day real ICSI data + the reference checkpoint appear, one command must
execute the whole protocol.  Here the harness is exercised end-to-end on the
synthetic corpus with (a) self-generated goldens (all five checks pass and a
perturbed golden fails) and (b) a probs golden computed by an ACTUAL torch
model through reference window semantics (feats[i:i+100], zero tail pad —
reference datasets.py:72-93) against our converted checkpoint."""

import json

import numpy as np
import pytest
import torch

from cli import parity as parity_cli
from laughter_detection_icsi_tpu.config import MODEL_MAP
from laughter_detection_icsi_tpu.data import audio as audio_io
from laughter_detection_icsi_tpu.eval import transcript as transcript_lib

from tests.test_model_parity import TorchResNetBigger


@pytest.fixture(scope="module")
def corpus(synthetic_corpus, tmp_path_factory):
    """Audio + transcripts + a torch-format checkpoint (.pth.tar) whose
    weights exist in BOTH frameworks (TorchResNetBigger twin)."""
    root = tmp_path_factory.mktemp("parity")
    store = transcript_lib.TranscriptStore(str(synthetic_corpus.transcript_dir))
    rng = np.random.default_rng(13)
    audio_dir = root / "audio"
    info = store.info_df[store.info_df.meeting_id == "Btr001"]
    for _, row in info.iterrows():
        d = audio_dir / row.meeting_id
        d.mkdir(parents=True, exist_ok=True)
        n = int(min(row.length, 10.0) * 16000)
        wave = (rng.standard_normal(n) * 0.05).astype(np.float32)
        audio_io.write_wav(str(d / f"{row.chan_id}.wav"), wave, 16000)

    preset = MODEL_MAP["resnet_base"]
    tm = TorchResNetBigger(
        linear_layer_size=preset.linear_layer_size,
        filter_sizes=preset.filter_sizes,
    )
    tm.eval()
    ckpt_path = root / "best.pth.tar"
    torch.save(
        {"state_dict": tm.state_dict(), "epoch": 0, "global_step": 0,
         "best_val_loss": 1.0, "optim_dict": {}},
        ckpt_path,
    )
    return {
        "root": root,
        "audio_dir": audio_dir,
        "transcript_dir": synthetic_corpus.transcript_dir,
        "ckpt": ckpt_path,
        "torch_model": tm,
        "goldens": root / "goldens",
    }


def _base_args(corpus):
    return [
        "--goldens", str(corpus["goldens"]),
        "--audio_dir", str(corpus["audio_dir"]),
        "--model_path", str(corpus["ckpt"]),
        "--transcript_dir", str(corpus["transcript_dir"]),
        "--chunk", "512",
        "--bucket_frames", "1024",
        "--train_steps", "4",
    ]


@pytest.fixture(scope="module")
def goldens_written(corpus):
    rc = parity_cli.main(_base_args(corpus) + ["--write_goldens"])
    assert rc == 0
    g = corpus["goldens"]
    assert (g / "manifest.json").is_file()
    assert list((g / "features").glob("*.npy"))
    assert list((g / "probs").glob("*.npy"))
    assert list((g / "textgrids").glob("*.TextGrid"))
    assert (g / "sum_stats.csv").is_file()
    assert (g / "train" / "batches.npz").is_file()
    assert (g / "train" / "loss_curve.csv").is_file()
    return g


def test_full_protocol_passes_on_own_goldens(corpus, goldens_written, tmp_path):
    report_path = tmp_path / "report.json"
    rc = parity_cli.main(_base_args(corpus) + ["--out", str(report_path)])
    assert rc == 0
    report = json.loads(report_path.read_text())
    assert report["pass"] is True
    assert report["n_fail"] == 0 and report["n_skipped"] == 0
    assert set(report["configs"]) == {
        "features", "probs", "textgrids", "analyse", "loss_curve",
    }
    for name, r in report["configs"].items():
        assert r["status"] == "pass", (name, r)
    # self-goldens must agree essentially exactly
    assert report["configs"]["probs"]["max_abs_diff"] < 1e-6
    assert report["configs"]["analyse"]["max_metric_diff"] == 0.0


def test_perturbed_golden_fails(corpus, goldens_written, tmp_path):
    g = sorted((goldens_written / "probs").glob("*.npy"))[0]
    orig = np.load(g)
    try:
        np.save(g, np.clip(orig + 0.05, 0, 1))
        report_path = tmp_path / "report.json"
        rc = parity_cli.main(
            _base_args(corpus) + ["--configs", "probs", "--out", str(report_path)]
        )
        assert rc == 1
        report = json.loads(report_path.read_text())
        assert report["configs"]["probs"]["status"] == "fail"
    finally:
        np.save(g, orig)


def test_torch_generated_probs_golden_passes(corpus, goldens_written):
    """The real-protocol shape: a golden produced by the torch model itself
    (reference windowing: one 100-frame window per output frame, zero tail
    pad) must match our pipeline's probabilities within --prob_atol."""
    from laughter_detection_icsi_tpu.data.feature_cache import (
        compute_track_features,
    )

    tm = corpus["torch_model"]
    stem, path = sorted(
        (
            str(f.relative_to(corpus["audio_dir"]).with_suffix("")).replace(
                "/", "__"
            ),
            str(f),
        )
        for f in corpus["audio_dir"].rglob("*.wav")
    )[0]
    wave, _sr = audio_io.read(path)
    feats = compute_track_features(wave)
    t = feats.shape[0]
    padded = np.concatenate(
        [feats, np.zeros((99, feats.shape[1]), dtype=feats.dtype)]
    )
    wins = np.stack([padded[i : i + 100] for i in range(t)])
    probs = []
    with torch.no_grad():
        for lo in range(0, t, 256):
            chunk = torch.from_numpy(wins[lo : lo + 256][:, None])
            probs.append(tm(chunk).numpy().squeeze(-1))
    torch_probs = np.concatenate(probs)

    g = goldens_written / "probs" / f"{stem}.npy"
    orig = np.load(g)
    try:
        np.save(g, torch_probs)
        rc = parity_cli.main(_base_args(corpus) + ["--configs", "probs"])
        assert rc == 0
    finally:
        np.save(g, orig)


def test_missing_goldens_skip_not_fail(corpus, tmp_path):
    empty = tmp_path / "empty_goldens"
    empty.mkdir()
    (empty / "manifest.json").write_text("{}")
    rc = parity_cli.main(
        [
            "--goldens", str(empty),
            "--audio_dir", str(corpus["audio_dir"]),
            "--chunk", "512",
            "--bucket_frames", "1024",
        ]
    )
    assert rc == 0  # nothing failed; everything skipped


def test_probs_check_fails_on_missing_audio(corpus, goldens_written, tmp_path):
    """A golden with no matching audio is an EVIDENCE GAP: the check must
    fail (exit 1) and name the unmatched stems — a 'pass' computed from a
    partial comparison would claim parity that was never established."""
    ghost = goldens_written / "probs" / "Zzz999__chanZ.npy"
    try:
        np.save(ghost, np.asarray([0.5], np.float32))
        report_path = tmp_path / "report.json"
        rc = parity_cli.main(
            _base_args(corpus) + ["--configs", "probs", "--out", str(report_path)]
        )
        assert rc == 1
        report = json.loads(report_path.read_text())
        assert report["configs"]["probs"]["status"] == "fail"
        assert report["configs"]["probs"]["missing_audio"] == ["Zzz999__chanZ"]
        assert "partial comparison" in report["configs"]["probs"]["reason"]
    finally:
        ghost.unlink()


def test_analyse_join_tolerates_float_repr_noise(corpus, goldens_written, tmp_path):
    """Reference exports may carry np.arange float noise in the grid keys
    (0.30000000000000004); the join must still find every row."""
    import pandas as pd

    csv = goldens_written / "sum_stats.csv"
    orig = csv.read_text()
    try:
        df = pd.read_csv(csv)
        df["threshold"] = df["threshold"] + 1e-12  # sub-rounding repr noise
        df["min_len"] = df["min_len"] + 1e-12
        df.to_csv(csv, index=False)
        report_path = tmp_path / "report.json"
        rc = parity_cli.main(
            _base_args(corpus) + ["--configs", "analyse", "--out", str(report_path)]
        )
        assert rc == 0
        report = json.loads(report_path.read_text())
        assert report["configs"]["analyse"]["status"] == "pass"
    finally:
        csv.write_text(orig)


def test_features_check_rejects_wrong_sample_rate(tmp_path):
    """A wrong-rate file must fail with the rate named — 16 kHz Kaldi
    geometry silently applied to 8 kHz audio would surface only as a
    confusing numeric mismatch (the probs/textgrids checks already get
    this guard from probs_for_file; features featurizes directly)."""
    gdir = tmp_path / "g"
    (gdir / "features").mkdir(parents=True)
    np.save(gdir / "features" / "m__c.npy", np.zeros((10, 44), np.float32))
    wav = tmp_path / "m" / "c.wav"
    wav.parent.mkdir()
    audio_io.write_wav(str(wav), np.zeros(8000, np.float32), 8000)
    r = parity_cli._check_features(gdir, {"m__c": str(wav)}, atol=1e-3)
    assert r["status"] == "fail"
    assert "8000 Hz" in r["reason"] and "16000" in r["reason"]


def test_write_goldens_rejects_wrong_sample_rate(corpus, tmp_path):
    """--write_goldens on wrong-rate audio must abort, not write garbage
    goldens that later self-consistently 'pass'."""
    bad_dir = tmp_path / "bad_audio" / "Xxx000"
    bad_dir.mkdir(parents=True)
    audio_io.write_wav(
        str(bad_dir / "chanA.wav"), np.zeros(44100, np.float32), 44100
    )
    with pytest.raises(SystemExit, match="44100 Hz"):
        parity_cli.main(
            [
                "--goldens", str(tmp_path / "g2"),
                "--audio_dir", str(tmp_path / "bad_audio"),
                "--write_goldens",
            ]
        )


def test_analyse_fails_on_headered_empty_golden(corpus, monkeypatch, tmp_path):
    """A header-only sum_stats.csv golden (failed reference export) must
    fail, not pass vacuously with rows: 0."""
    import pandas as pd

    gdir = tmp_path / "g3"
    gdir.mkdir()
    pd.DataFrame(
        columns=["threshold", "min_len", "precision", "recall"]
    ).to_csv(gdir / "sum_stats.csv", index=False)
    ours = tmp_path / "ours.csv"
    pd.DataFrame(
        {"threshold": [0.5], "min_len": [0.2],
         "precision": [0.5], "recall": [0.5]}
    ).to_csv(ours, index=False)
    # The expensive sweep is irrelevant to the guard under test.
    monkeypatch.setattr(
        parity_cli, "_run_sweep_stats", lambda *a, **k: ours
    )
    args = parity_cli.build_parser().parse_args(
        _base_args(corpus) + ["--goldens", str(gdir)]
    )
    r = parity_cli._check_analyse(args, gdir, {}, 1e-3, tmp_path)
    assert r["status"] == "fail"
    assert "no data rows" in r["reason"]


def test_parity_cli_rejects_unknown_config(corpus):
    with pytest.raises(SystemExit, match="unknown preset 'resnet_bsae'"):
        parity_cli.main(
            _base_args(corpus) + ["--config", "resnet_bsae"]
        )

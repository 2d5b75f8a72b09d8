"""Visualisation + tool CLIs: plots render headless; laughs_to_wav cuts and
concatenates; audio probe reports; downloader lists URLs offline."""

import os
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from laughter_detection_icsi_tpu import viz  # noqa: E402
from laughter_detection_icsi_tpu.data import audio  # noqa: E402
from laughter_detection_icsi_tpu.eval import textgrid as tg  # noqa: E402


@pytest.fixture()
def metrics_csv(tmp_path):
    p = tmp_path / "metrics.csv"
    pd.DataFrame(
        {
            "global_step": [5, 10, 15],
            "epoch": [0, 1, 1],
            "train_loss": [0.7, 0.6, 0.5],
            "train_acc": [0.5, 0.6, 0.7],
            "train_precision": [0.6, 0.7, 0.75],
            "train_recall": [0.4, 0.5, 0.6],
            "val_loss": [0.72, 0.65, 0.6],
            "val_acc": [0.48, 0.55, 0.6],
            "val_precision": [0.55, 0.6, 0.65],
            "val_recall": [0.38, 0.45, 0.5],
        }
    ).to_csv(p, index=False)
    return str(p)


@pytest.fixture()
def sum_stats_csv(tmp_path):
    p = tmp_path / "sum_stats.csv"
    pd.DataFrame(
        {
            "threshold": [0.2, 0.5, 0.8, 0.2, 0.5, 0.8],
            "min_len": [0.1, 0.1, 0.1, 0.2, 0.2, 0.2],
            "precision": [0.3, 0.5, 0.8, 0.35, 0.55, 0.85],
            "recall": [0.9, 0.6, 0.2, 0.85, 0.55, 0.15],
        }
    ).to_csv(p, index=False)
    return str(p)


@pytest.fixture()
def eval_df_csv(tmp_path):
    p = tmp_path / "eval_df.csv"
    pd.DataFrame(
        {
            "meeting": ["Bmr021", "Bmr021", "Btr001", "Btr001"],
            "threshold": [0.2, 0.5, 0.2, 0.5],
            "min_len": [0.2, 0.2, 0.2, 0.2],
            # Real eval_df rows (EVAL_COLS) carry per-meeting precision and
            # recall too — which is exactly why 'pr' needs the per-type-FP
            # fingerprint to reject them.
            "precision": [0.4, 0.6, 0.5, 1.0],
            "recall": [0.8, 0.5, 0.4, 0.2],
            "corr_pred_time": [8.0, 5.0, 2.0, 1.0],
            "tot_pred_time": [20.0, 8.3, 4.0, 1.0],
            # Btr001 at t=0.5 has no transcribed laughter: ratiodist must
            # drop it from the ratio instead of dividing by zero.
            "tot_transc_laugh_time": [10.0, 10.0, 5.0, 0.0],
            "tot_fp_speech_time": [3.0, 1.5, 1.0, 0.0],
            "tot_fp_noise_time": [0.5, 0.2, 0.0, 0.0],
            "tot_fp_silence_time": [8.0, 1.6, 1.0, 0.0],
        }
    ).to_csv(p, index=False)
    return str(p)


def test_plots_render(metrics_csv, sum_stats_csv, eval_df_csv, tmp_path):
    for fn, args in (
        (viz.plot_train_metrics, (metrics_csv,)),
        (viz.plot_precision_recall, (sum_stats_csv,)),
        (viz.plot_fp_confusion, (eval_df_csv,)),
        (viz.plot_experiment_comparison, ({"a": sum_stats_csv, "b": sum_stats_csv},)),
    ):
        out = tmp_path / f"{fn.__name__}.png"
        fn(*args, out_path=str(out))
        assert out.stat().st_size > 10_000


def test_aux_dist_plots_render(eval_df_csv, tmp_path):
    """Aggregated-length and pred/transc-ratio distributions (reference
    analyse.py:303-411) render headless; out-of-grid thresholds and
    all-zero-transcription filters fail loudly instead of saving a blank
    figure."""
    out1 = tmp_path / "lengthdist.png"
    viz.plot_aggregated_laughter_length_dist(eval_df_csv, 0.5, out_path=str(out1))
    assert out1.stat().st_size > 10_000
    out2 = tmp_path / "ratiodist.png"
    viz.plot_agg_pred_time_ratio_dist(eval_df_csv, 0.5, out_path=str(out2))
    assert out2.stat().st_size > 10_000
    with pytest.raises(ValueError, match="threshold=0.9"):
        viz.plot_aggregated_laughter_length_dist(
            eval_df_csv, 0.9, out_path=str(tmp_path / "x.png")
        )
    with pytest.raises(ValueError, match="threshold=0.9"):
        viz.plot_agg_pred_time_ratio_dist(
            eval_df_csv, 0.9, out_path=str(tmp_path / "x.png")
        )


def test_aux_dist_plots_refuse_pooled_min_lens(eval_df_csv, tmp_path):
    """A multi-min_len eval_df with no min_len filter must raise, not pool:
    pooling counts every meeting once per grid value and mixes smoothing
    parametrizations (review finding, round 4).  Passing min_len= selects
    one setting and renders."""
    import pandas as pd

    df = pd.read_csv(eval_df_csv)
    df2 = df.copy()
    df2["min_len"] = 0.4
    multi = tmp_path / "multi.csv"
    pd.concat([df, df2]).to_csv(multi, index=False)
    for fn in (
        viz.plot_aggregated_laughter_length_dist,
        viz.plot_agg_pred_time_ratio_dist,
    ):
        with pytest.raises(ValueError, match="min_len settings"):
            fn(str(multi), 0.5, out_path=str(tmp_path / "y.png"))
        out = tmp_path / f"{fn.__name__}_picked.png"
        fn(str(multi), 0.5, out_path=str(out), min_len=0.4)
        assert out.stat().st_size > 10_000
    # a threshold slice where NO meeting has transcribed laughter
    p = tmp_path / "no_gt.csv"
    df = pd.read_csv(eval_df_csv)
    df["tot_transc_laugh_time"] = 0.0
    df.to_csv(p, index=False)
    with pytest.raises(ValueError, match="transcribed laughter"):
        viz.plot_agg_pred_time_ratio_dist(str(p), 0.5, out_path=str(tmp_path / "y.png"))


def test_visualise_cli_dist_modes(eval_df_csv, sum_stats_csv, tmp_path):
    """CLI wiring for lengthdist/ratiodist: --threshold is required there
    and rejected elsewhere; sum_stats input is rejected by the column
    fingerprint (it has no per-meeting time columns)."""
    from cli.visualise import main

    out = tmp_path / "ld.png"
    assert main(["lengthdist", eval_df_csv, "--out", str(out),
                 "--threshold", "0.5"]) == 0
    assert out.exists()
    out2 = tmp_path / "rd.png"
    assert main(["ratiodist", eval_df_csv, "--out", str(out2),
                 "--threshold", "0.2", "--min_len", "0.2"]) == 0
    assert out2.exists()
    with pytest.raises(SystemExit, match="--threshold"):
        main(["lengthdist", eval_df_csv, "--out", str(out)])
    with pytest.raises(SystemExit, match="--threshold"):
        main(["pr", sum_stats_csv, "--out", str(out), "--threshold", "0.5"])
    with pytest.raises(SystemExit, match="tot_pred_time"):
        main(["ratiodist", sum_stats_csv, "--out", str(out),
              "--threshold", "0.5"])


def test_visualise_cli(metrics_csv, tmp_path):
    from cli.visualise import main

    out = tmp_path / "t.png"
    assert main(["train", metrics_csv, "--out", str(out)]) == 0
    assert out.exists()


def test_visualise_cli_rejects_wrong_input_kind(
    metrics_csv, sum_stats_csv, eval_df_csv, tmp_path
):
    """Each mode names the CSV kind it expects instead of a raw pandas
    KeyError (confusion <- sum_stats) or a silently-wrong figure
    (pr <- per-meeting eval_df)."""
    from cli.visualise import main

    out = str(tmp_path / "x.png")
    for argv, needle in (
        (["pr", eval_df_csv, "--out", out], "per-meeting eval_df"),
        (["confusion", sum_stats_csv, "--out", out], "tot_fp_speech_time"),
        (["train", sum_stats_csv, "--out", out], "metrics.csv"),
        (["compare", f"a={eval_df_csv}", "--out", out], "per-meeting eval_df"),
    ):
        with pytest.raises(SystemExit, match=needle.replace("(", r"\(")):
            main(argv)
        assert not os.path.exists(out)


def test_visualise_cli_min_len_filtering(sum_stats_csv, metrics_csv, tmp_path):
    """--min_len filters the PR sweep (out-of-grid fails loudly) and is
    rejected by modes that would silently ignore it."""
    from cli.visualise import main

    out = tmp_path / "pr.png"
    assert main(["pr", sum_stats_csv, "--out", str(out), "--min_len", "0.2"]) == 0
    assert out.exists()
    with pytest.raises(ValueError, match="min_len=99"):
        main(["pr", sum_stats_csv, "--out", str(out), "--min_len", "99"])
    with pytest.raises(ValueError, match="experiment 'a'"):
        main(["compare", f"a={sum_stats_csv}", "--out", str(out),
              "--min_len", "99"])
    with pytest.raises(SystemExit, match="--min_len"):
        main(["train", metrics_csv, "--out", str(out), "--min_len", "0.2"])
    with pytest.raises(SystemExit, match="--title"):
        main(["pr", sum_stats_csv, "--out", str(out), "--title", "t"])


def test_min_len_filter_tolerates_float_repr_noise(tmp_path):
    """Reference-exported grids may carry np.arange float noise
    (min_len 0.30000000000000004); --min_len 0.3 must still match the row
    instead of raising 'no sweep rows' (same 6-decimal normalization as
    the parity harness's grid join)."""
    from cli.visualise import main

    p = tmp_path / "noisy_stats.csv"
    pd.DataFrame(
        {
            "threshold": [0.2, 0.5],
            "min_len": [0.30000000000000004, 0.30000000000000004],
            "precision": [0.4, 0.6],
            "recall": [0.8, 0.5],
        }
    ).to_csv(p, index=False)
    out = tmp_path / "pr.png"
    assert main(["pr", str(p), "--out", str(out), "--min_len", "0.3"]) == 0
    assert out.is_file()


def test_laughs_to_wav_cli(tmp_path, rng):
    from cli.laughs_to_wav import main

    sr = 16000
    wav = (rng.standard_normal(sr * 5) * 0.1).astype(np.float32)
    src = tmp_path / "chan0.sph"
    audio.write_sphere(str(src), wav, sr)
    grid = tmp_path / "chan0.TextGrid"
    tg.write_textgrid(str(grid), [(0.5, 1.0), (2.0, 3.5)], xmax=5.0)
    out = tmp_path / "wavs"
    assert main(
        ["--textgrid", str(grid), "--audio_file", str(src),
         "--output_dir", str(out), "--concat", "--break_s", "0.25"]
    ) == 0
    files = sorted(os.listdir(out))
    assert len([f for f in files if f.startswith("laugh_")]) == 2
    concat, csr = audio.read(str(out / "all_laughs.wav"))
    assert csr == sr
    # 0.5 + 1.5 of laughs + 0.25 gap
    assert len(concat) == int(sr * (0.5 + 1.5 + 0.25))


def test_probe_audio_cli(tmp_path, rng, capsys):
    from cli.probe_audio_loading import main

    src = tmp_path / "a.sph"
    audio.write_sphere(str(src), (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32), 16000)
    assert main([str(src), "--duration", "1.0", "--offsets", "0,1"]) == 0
    outp = capsys.readouterr().out
    assert "RTF" in outp


def test_get_icsi_data_print_urls(capsys):
    from cli.get_icsi_data import main

    assert main(["--audio_dir", "/tmp/never", "--meetings", "Btr001", "--print_urls"]) == 0
    out = capsys.readouterr().out
    assert "Btr001/chan0.sph" in out and "transcripts" in out


def test_get_icsi_unknown_meeting_rejected(capsys):
    """A typo'd meeting ID must fail loudly — every channel URL would 404
    and the tool would print done having fetched nothing."""
    import pytest

    from cli import get_icsi_data

    with pytest.raises(SystemExit, match="unknown meeting"):
        get_icsi_data.main(
            ["--audio_dir", "/tmp/x", "--meetings", "Bzz999", "--print_urls"]
        )
    # strip(): 'Bmr021, Bns001' must parse as two valid IDs
    rc = get_icsi_data.main(
        ["--audio_dir", "/tmp/x", "--meetings", "Bmr021, Bns001", "--print_urls"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "Bmr021/chan0.sph" in out and "Bns001/chan0.sph" in out


def test_get_icsi_mirrored_zip_is_extracted(tmp_path):
    """Air-gapped workflow: a manually mirrored transcript zip must be
    EXTRACTED on the next run, not treated as a done-marker while the
    transcript dir holds zero .mrt files."""
    import zipfile

    from cli.get_icsi_data import main

    tdir = tmp_path / "transcripts"
    tdir.mkdir()
    with zipfile.ZipFile(tdir / "ICSI_original_transcripts.zip", "w") as z:
        z.writestr("transcripts/Bmr021.mrt", "<Meeting/>")
    audio = tmp_path / "audio" / "Bmr021"
    audio.mkdir(parents=True)
    for c in list(range(10)) + list("ABCDEF"):
        (audio / f"chan{c}.sph").write_bytes(b"x")  # nothing to fetch
    rc = main(["--audio_dir", str(tmp_path / "audio"), "--meetings",
               "Bmr021", "--transcript_dir", str(tdir)])
    assert rc == 0
    assert list(tdir.rglob("*.mrt"))

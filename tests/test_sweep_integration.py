"""End-to-end sweep -> analyse integration in a fresh process.

Drives the workflow that replaces the reference's entire Slurm machinery
(reference cluster_scripts/gen_eval_exp.py + analysis/analyse.py) with one
command: `sweep.py --analyse` over a synthetic meeting — checkpoint load,
sharded multi-channel inference, the threshold x min_length sweep, the
reference TextGrid layout, and the time-weighted evaluator, all through
the real CLI surface.
"""

import os
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pandas as pd
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def sweep_corpus(synthetic_corpus, tmp_path_factory):
    """Synthetic transcripts + matching audio + a random checkpoint."""
    from laughter_detection_icsi_tpu import models
    from laughter_detection_icsi_tpu.config import MODEL_MAP
    from laughter_detection_icsi_tpu.data import audio
    from laughter_detection_icsi_tpu.eval import transcript as transcript_lib
    from laughter_detection_icsi_tpu.train import checkpoint as ckpt_lib

    root = tmp_path_factory.mktemp("sweep")
    store = transcript_lib.TranscriptStore(str(synthetic_corpus.transcript_dir))
    rng = np.random.default_rng(0)
    audio_dir = root / "audio"
    info = store.info_df[store.info_df.meeting_id == "Btr001"]
    for _, row in info.iterrows():
        d = audio_dir / row.meeting_id
        d.mkdir(parents=True, exist_ok=True)
        # 20 s of audio against the 60 s transcript keeps CPU runtime sane;
        # the evaluator copes with predictions covering a prefix of the
        # meeting (recall just reflects the uncovered tail).
        n = int(min(row.length, 20.0) * 16000)
        wave = (rng.standard_normal(n) * 0.05).astype(np.float32)
        audio.write_wav(str(d / f"{row.chan_id}.wav"), wave, 16000)

    preset = MODEL_MAP["resnet_base"]
    model = models.build(
        preset.model,
        dropout_rate=0.0,
        linear_layer_size=preset.linear_layer_size,
        filter_sizes=preset.filter_sizes,
    )
    params, state = model.init(jax.random.PRNGKey(3))
    ckpt_dir = root / "ck"
    ckpt_lib.save_checkpoint(str(ckpt_dir), params, state, is_best=True)
    return {
        "audio_dir": audio_dir,
        "transcript_dir": synthetic_corpus.transcript_dir,
        "ckpt": ckpt_dir / "best.ckpt.npz",
        "out": root / "preds",
    }


def test_sweep_cli_end_to_end_with_analyse(sweep_corpus):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    res = subprocess.run(
        [
            sys.executable,
            str(REPO / "sweep.py"),
            "--audio_dir", str(sweep_corpus["audio_dir"]),
            "--transcript_dir", str(sweep_corpus["transcript_dir"]),
            "--output_dir", str(sweep_corpus["out"]),
            "--split", "all",
            "--meetings", "Btr001",
            "--model_path", str(sweep_corpus["ckpt"]),
            "--thresholds", "0.2,0.6",
            "--min_lengths", "0.1",
            "--chunk", "512",
            "--bucket_frames", "1024",
            "--analyse",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert res.returncode == 0, res.stderr[-3000:]

    out_root = sweep_corpus["out"] / "all"
    grids = sorted(out_root.rglob("*.TextGrid"))
    assert grids, res.stdout
    # Reference layout: <out>/<split>/<meeting>/t_<thr>/l_<minlen>/<chan>.TextGrid
    parts = {g.relative_to(out_root).parts[:3] for g in grids}
    assert all(p[0] == "Btr001" and p[1].startswith("t_") for p in parts)

    # analyse chained: corpus-weighted sum stats per (threshold, min_len),
    # written next to the split dir (eval/analyse.py sum_stats_path)
    stats_files = sorted(sweep_corpus["out"].glob("*sum_stats*.csv"))
    assert stats_files, (res.stdout, sorted(os.listdir(sweep_corpus["out"])))
    stats = pd.read_csv(stats_files[0])
    assert {"threshold", "precision", "recall"} <= set(stats.columns)
    assert len(stats) >= 2  # one row per threshold
    assert np.isfinite(stats["precision"]).all()
    assert np.isfinite(stats["recall"]).all()

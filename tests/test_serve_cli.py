"""Streaming serving CLI (cli/serve.py): NDJSON events out of PCM in, with
the streaming==offline exactness guarantee checked at the CLI boundary
(events equal segment_laughter's on the same audio)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

from laughter_detection_icsi_tpu import inference, models
from laughter_detection_icsi_tpu.config import MODEL_MAP
from laughter_detection_icsi_tpu.data import audio
from laughter_detection_icsi_tpu.train import checkpoint as ckpt_lib

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    rng = np.random.default_rng(3)
    wave = (rng.standard_normal(16000 * 8) * 0.1).astype(np.float32)
    wav_path = root / "in.wav"
    audio.write_wav(str(wav_path), wave, 16000)

    preset = MODEL_MAP["resnet_base"]
    model = models.build(
        preset.model,
        dropout_rate=0.0,
        linear_layer_size=preset.linear_layer_size,
        filter_sizes=preset.filter_sizes,
    )
    params, state = model.init(jax.random.PRNGKey(7))
    ckpt_lib.save_checkpoint(str(root / "ck"), params, state, is_best=True)

    pipe = inference.LaughterPipeline(
        model, params, state,
        settings=inference.InferenceSettings(chunk=512, bucket_frames=1024),
    )
    probs, _dur = pipe.probs_for_file(str(wav_path))
    thr = float(np.quantile(probs, 0.7))  # guarantees events exist
    inst, _ = pipe.segment_file(
        str(wav_path), thresholds=[thr], min_lengths=[0.1]
    )
    return {
        "root": root,
        "wav": wav_path,
        "ckpt": root / "ck" / "best.ckpt.npz",
        "threshold": thr,
        "offline_events": inst[(thr, 0.1)],
        "probs": np.asarray(probs),
    }


def test_file_replay_events_match_offline(served, tmp_path, capsys):
    from cli import serve as serve_cli

    probs_path = tmp_path / "probs.npy"
    rc = serve_cli.main(
        [
            "--model_path", str(served["ckpt"]),
            "--input", str(served["wav"]),
            "--threshold", str(served["threshold"]),
            "--min_length", "0.1",
            "--chunk", "512",
            "--bucket_frames", "1024",
            "--chunk_ms", "173",  # odd size: exercises re-chunking
            "--save_probs", str(probs_path),
        ]
    )
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    kinds = [l["type"] for l in lines]
    assert kinds[0] == "ready" and kinds[-1] == "done"
    events = [(l["start"], l["end"]) for l in lines if l["type"] == "event"]
    want = [(round(s, 3), round(e, 3)) for s, e in served["offline_events"]]
    assert events == want and events  # non-empty and identical
    assert lines[-1]["seconds"] == 8.0
    # full probability stream matches offline bit-for-bit
    got = np.load(probs_path)
    np.testing.assert_array_equal(got[0], served["probs"])


def test_stdin_short_reads_stay_frame_aligned(served, capsys, monkeypatch):
    """An unbuffered/non-blocking stdin can short-read MID-SAMPLE (and
    return None when no bytes are momentarily available); dropping the
    partial frame would misalign every later 16-bit sample, and treating
    None as EOF would truncate the stream at the first producer stall.
    The loop must keep the stream aligned AND keep waiting: same events
    and total seconds as the aligned offline run."""
    import types

    from cli import serve as serve_cli

    wave16, _sr = audio.read_int16(str(served["wav"]))
    data = wave16.astype("<i2").tobytes()

    class ShortReader:
        def __init__(self, buf):
            self.buf, self.pos, self.calls = buf, 0, 0

        def read(self, size):
            if self.pos >= len(self.buf):
                return b""
            self.calls += 1
            if self.calls % 3 == 0:
                return None  # O_NONBLOCK stall: data coming, not EOF
            take = min(size, len(self.buf) - self.pos)
            if self.calls % 2 and take > 1 and take % 2 == 0:
                take -= 1  # odd byte count: splits a sample mid-read
            out = self.buf[self.pos : self.pos + take]
            self.pos += take
            return out

    monkeypatch.setattr(
        serve_cli.sys, "stdin", types.SimpleNamespace(buffer=ShortReader(data))
    )
    rc = serve_cli.main(
        [
            "--model_path", str(served["ckpt"]),
            "--input", "-",
            "--threshold", str(served["threshold"]),
            "--min_length", "0.1",
            "--chunk", "512",
            "--bucket_frames", "1024",
        ]
    )
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    events = [(l["start"], l["end"]) for l in lines if l["type"] == "event"]
    want = [(round(s, 3), round(e, 3)) for s, e in served["offline_events"]]
    assert events == want and events
    assert lines[-1]["seconds"] == 8.0


def test_stdin_multichannel_subprocess(served):
    """Raw interleaved s16le on stdin with --channels 2: the mesh-sharded
    streaming path, end-to-end through the process boundary."""
    wave16, _sr = audio.read_int16(str(served["wav"]))
    ch0, ch1 = wave16, np.roll(wave16, 160)
    interleaved = np.stack([ch0, ch1], axis=1).astype("<i2").tobytes()

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    res = subprocess.run(
        [
            sys.executable, str(REPO / "cli" / "serve.py"),
            "--model_path", str(served["ckpt"]),
            "--channels", "2",
            "--threshold", str(served["threshold"]),
            "--min_length", "0.1",
            "--chunk", "512",
            "--bucket_frames", "1024",
        ],
        input=interleaved,
        env=env,
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        timeout=560,
    )
    assert res.returncode == 0, res.stderr[-2000:].decode()
    lines = [json.loads(l) for l in res.stdout.decode().splitlines()]
    assert lines[0]["type"] == "ready" and lines[0]["channels"] == 2
    ch0_events = [
        (l["start"], l["end"]) for l in lines
        if l["type"] == "event" and l["channel"] == 0
    ]
    want = [(round(s, 3), round(e, 3)) for s, e in served["offline_events"]]
    assert ch0_events == want
    assert lines[-1]["type"] == "done" and lines[-1]["events"] >= len(want)


def test_file_replay_unaligned_length_matches_offline(served, tmp_path, capsys):
    """A replayed file whose sample count is NOT frame-aligned: event times
    must still equal segment_laughter's (offline converts frames at
    fps = T/duration, not exactly 100) — fixed-100 fps drifted every
    boundary by ~0.06%."""
    from cli import serve as serve_cli

    rng = np.random.default_rng(9)
    wave = (rng.standard_normal(16000 * 8 + 80) * 0.1).astype(np.float32)
    wav_path = tmp_path / "odd.wav"
    audio.write_wav(str(wav_path), wave, 16000)

    loaded = ckpt_lib.load_checkpoint(str(served["ckpt"]))
    preset = MODEL_MAP["resnet_base"]
    model = models.build(
        preset.model,
        dropout_rate=0.0,
        linear_layer_size=preset.linear_layer_size,
        filter_sizes=preset.filter_sizes,
    )
    pipe = inference.LaughterPipeline(
        model, loaded["params"], loaded["state"],
        settings=inference.InferenceSettings(chunk=512, bucket_frames=1024),
    )
    probs, _ = pipe.probs_for_file(str(wav_path))
    thr = float(np.quantile(probs, 0.7))
    inst, _ = pipe.segment_file(str(wav_path), thresholds=[thr], min_lengths=[0.1])

    rc = serve_cli.main(
        [
            "--model_path", str(served["ckpt"]),
            "--input", str(wav_path),
            "--threshold", str(thr),
            "--min_length", "0.1",
            "--chunk", "512",
            "--bucket_frames", "1024",
        ]
    )
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    events = [(l["start"], l["end"]) for l in lines if l["type"] == "event"]
    want = [(round(s, 3), round(e, 3)) for s, e in inst[(thr, 0.1)]]
    assert events == want and events


def test_file_replay_non_int16_falls_back(served, tmp_path, capsys):
    """A valid non-16-bit file (float WAV) must replay through the float
    decode path instead of dying on read_int16's PCM requirement."""
    from cli import serve as serve_cli

    import struct

    rng = np.random.default_rng(11)
    wave = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    f32_path = tmp_path / "f32.wav"
    data = wave.tobytes()
    f32_path.write_bytes(
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 3, 1, 16000, 16000 * 4, 4, 32)
        + b"data" + struct.pack("<I", len(data)) + data
    )

    rc = serve_cli.main(
        [
            "--model_path", str(served["ckpt"]),
            "--input", str(f32_path),
            "--threshold", "0.9",
            "--chunk", "512",
            "--bucket_frames", "1024",
        ]
    )
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert lines[-1]["type"] == "done"
    assert lines[-1]["seconds"] == 2.0


def test_file_replay_rejects_multichannel_flag(served, capsys):
    from cli import serve as serve_cli

    with pytest.raises(SystemExit, match="channel"):
        serve_cli.main(
            [
                "--model_path", str(served["ckpt"]),
                "--input", str(served["wav"]),
                "--channels", "2",
            ]
        )


def test_rejects_nonpositive_channels():
    """--channels 0 must fail at argument handling (before the model load),
    not with a ZeroDivisionError deep in the stdin loop after warmup."""
    from cli import serve as serve_cli

    for bad in ("0", "-1"):
        with pytest.raises(SystemExit, match="--channels must be >= 1"):
            serve_cli.main(["--model_path", "/nonexistent", "--channels", bad])


def test_rejects_nonpositive_chunk_flags():
    """--chunk/--bucket_frames 0 or negative must fail at argument handling
    (0 must not be silently swapped for the default; negatives would crash
    deep in the jitted featurize after the model load)."""
    from cli import serve as serve_cli

    with pytest.raises(SystemExit, match="--bucket_frames must be >= 1"):
        serve_cli.main(
            ["--model_path", "/nonexistent", "--bucket_frames", "0"]
        )
    with pytest.raises(SystemExit, match="--chunk must be >= 1"):
        serve_cli.main(["--model_path", "/nonexistent", "--chunk", "-4"])


def test_file_replay_events_carry_source_channel(served, tmp_path, capsys):
    """Replaying channel N of a multichannel file must label events with N
    — the raw session index would attribute every event to channel 0."""
    from cli import serve as serve_cli

    rng = np.random.default_rng(5)
    stereo = np.zeros((16000 * 4, 2), np.float32)
    stereo[:, 1] = (rng.standard_normal(16000 * 4) * 0.1).astype(np.float32)
    p = tmp_path / "stereo.wav"
    audio.write_wav(str(p), stereo, 16000)
    rc = serve_cli.main(
        [
            "--model_path", str(served["ckpt"]),
            "--input", str(p),
            "--channel", "1",
            # sigmoid probs are always > 0, so threshold 0 guarantees at
            # least one event without depending on the random weights
            "--threshold", "0.0",
            "--min_length", "0.0",
            "--chunk", "512",
            "--bucket_frames", "1024",
        ]
    )
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    events = [l for l in lines if l["type"] == "event"]
    assert events and all(e["channel"] == 1 for e in events)

"""StableHLO export artifacts: window classifier (symbolic batch) and the
fused e2e bucket graph match the live pipeline; CLI writes a loadable file."""

import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

from laughter_detection_icsi_tpu import export as export_lib  # noqa: E402
from laughter_detection_icsi_tpu import inference, models  # noqa: E402


@pytest.fixture(scope="module")
def small_model():
    model = models.build("ResNetBigger", dropout_rate=0.0, linear_layer_size=48)
    params, state = model.init(jax.random.PRNGKey(0))
    return model, params, state


def test_window_classifier_symbolic_batch_roundtrip(small_model, tmp_path):
    model, params, state = small_model
    exported = export_lib.export_window_classifier(model, params, state)
    path = tmp_path / "cls.stablehlo"
    n = export_lib.save(exported, str(path))
    assert path.stat().st_size == n > 1000
    back = export_lib.load(str(path))

    rng = np.random.default_rng(7)
    for b in (5, 9):  # two batch sizes through ONE symbolic-dim artifact
        x = rng.standard_normal((b, 1, 100, 44)).astype(np.float32)
        got = np.asarray(back.call(x))
        ref, _ = model.apply(params, state, x, train=False)
        np.testing.assert_allclose(got, np.asarray(ref), atol=1e-6)
        assert got.shape == (b,)


def test_bucket_pipeline_artifact_matches_offline(small_model, tmp_path):
    """The fused e2e artifact reproduces LaughterPipeline.probs_for_waveform
    on a bucket's worth of int16 PCM (same buffer prep as the bucket loop)."""
    model, params, state = small_model
    settings = inference.InferenceSettings(chunk=512, bucket_frames=1024)
    pipe = inference.LaughterPipeline(model, params, state, settings=settings)

    exported, wave_len = export_lib.export_bucket_pipeline(pipe, int16_in=True)
    path = tmp_path / "e2e.stablehlo"
    export_lib.save(exported, str(path))
    back = export_lib.load(str(path))

    rng = np.random.default_rng(3)
    wave = (rng.standard_normal(16000 * 8) * 3000).astype(np.int16)
    ref = pipe.probs_for_waveform(wave)
    t = len(ref)
    assert 0 < t <= settings.bucket_frames  # single-bucket fixture

    padded, t2 = inference.host_pad_waveform(wave, pipe.feat_cfg)
    assert t2 == t
    buf = np.zeros(wave_len, dtype=np.int16)
    src = padded[:wave_len]
    buf[: len(src)] = src
    valid = min(t, settings.bucket_frames + settings.window - 1)
    got = np.asarray(back.call(buf, np.int32(valid)))
    assert got.shape == (settings.bucket_frames,)
    np.testing.assert_allclose(got[:t], ref, atol=1e-6)


def test_cross_platform_artifact(small_model):
    """One artifact lowered for BOTH tpu and cpu ahead-of-time (no TPU
    present here) still executes on the cpu side after a roundtrip."""
    model, params, state = small_model
    exported = export_lib.export_window_classifier(
        model, params, state, batch=4, platforms=("tpu", "cpu")
    )
    assert set(exported.platforms) == {"tpu", "cpu"}
    back = export_lib.load_bytes(exported.serialize())
    x = np.zeros((4, 1, 100, 44), np.float32)
    assert np.asarray(back.call(x)).shape == (4,)


def test_export_cli_writes_loadable_artifact(tmp_path, capsys):
    from cli.export_model import main

    out = tmp_path / "model.stablehlo"
    rc = main([
        "--random_init", "--what", "windows", "--batch", "4",
        "--out", str(out),
    ])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "wrote" in printed and "signature" in printed
    back = export_lib.load(str(out))
    x = np.zeros((4, 1, 100, 44), np.float32)
    probs = np.asarray(back.call(x))
    assert probs.shape == (4,) and np.all((probs >= 0) & (probs <= 1))


def test_export_cli_rejects_missing_checkpoint(tmp_path):
    from cli.export_model import main

    with pytest.raises(SystemExit, match="--model_path is required"):
        main(["--out", str(tmp_path / "x.stablehlo")])
    with pytest.raises(SystemExit, match="not found"):
        main(["--model_path", str(tmp_path / "nope"),
              "--out", str(tmp_path / "x.stablehlo")])

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
    """The fused e2e artifact + the numpy-only bucket_inputs host prep
    reproduce LaughterPipeline.probs_for_waveform across MULTIPLE buckets
    (16 s of int16 PCM through a 1024-frame-bucket graph = 2 buckets)."""
    model, params, state = small_model
    settings = inference.InferenceSettings(chunk=512, bucket_frames=1024)
    pipe = inference.LaughterPipeline(model, params, state, settings=settings)

    exported, wave_len = export_lib.export_bucket_pipeline(pipe, int16_in=True)
    path = tmp_path / "e2e.stablehlo"
    export_lib.save(exported, str(path))
    back = export_lib.load(str(path))

    rng = np.random.default_rng(3)
    wave = (rng.standard_normal(16000 * 16) * 3000).astype(np.int16)
    ref = pipe.probs_for_waveform(wave)
    assert len(ref) > settings.bucket_frames  # really spans two buckets

    pieces = []
    for buf, valid, n_out in export_lib.bucket_inputs(
        wave, pipe.feat_cfg, settings
    ):
        assert buf.shape == (wave_len,) and buf.dtype == np.int16
        pieces.append(np.asarray(back.call(buf, valid))[:n_out])
    got = np.concatenate(pieces)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_bucket_inputs_edge_cases():
    assert list(export_lib.bucket_inputs(np.zeros(0, np.int16))) == []
    with pytest.raises(TypeError, match="int16 or float32"):
        list(export_lib.bucket_inputs(np.zeros(10, np.int32)))


def test_export_rejects_fused_conv_pipeline(small_model):
    """fused_conv probs are documented non-bit-parity with windows mode;
    exporting its pipeline must fail loudly, not emit a mismatched
    artifact (same guard as the streaming sessions)."""
    model, params, state = small_model
    pipe = inference.LaughterPipeline(
        model, params, state,
        settings=inference.InferenceSettings(
            chunk=512, bucket_frames=1024, mode="fused_conv"
        ),
    )
    with pytest.raises(ValueError, match="mode='windows'"):
        export_lib.export_bucket_pipeline(pipe)


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


def test_export_cli_rejects_inapplicable_flags_and_bad_platforms(tmp_path):
    """Per-mode flag validation (visualise-CLI convention) and early,
    named rejection of malformed --platforms values."""
    from cli.export_model import main

    out = str(tmp_path / "x.stablehlo")
    with pytest.raises(SystemExit, match="--chunk only applies"):
        main(["--random_init", "--what", "windows", "--chunk", "512",
              "--out", out])
    with pytest.raises(SystemExit, match="--batch only applies"):
        main(["--random_init", "--what", "e2e", "--batch", "8", "--out", out])
    with pytest.raises(SystemExit, match="unknown platform"):
        main(["--random_init", "--platforms", "tpu, cpu x", "--out", out])
    with pytest.raises(SystemExit, match="unknown platform"):
        main(["--random_init", "--platforms", ",", "--out", out])
    # 'tpu, cpu' with a space is natural shell quoting — normalized, not
    # forwarded to jax.export as ' cpu'.
    rc = main(["--random_init", "--batch", "2", "--platforms", "tpu, cpu",
               "--out", out])
    assert rc == 0
    assert set(export_lib.load(out).platforms) == {"tpu", "cpu"}

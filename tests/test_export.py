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


def test_save_concurrent_same_path_publishes_intact_artifact(
    small_model, tmp_path
):
    """Two threads saving to the SAME path must each write their own tmp
    file (per-call unique suffix): a shared tmp would interleave writes and
    publish a corrupt blob.  Whichever replace wins, the published file
    must deserialize and its size match one saver's full blob."""
    import threading

    model, params, state = small_model
    exported = export_lib.export_window_classifier(model, params, state)
    path = tmp_path / "race.stablehlo"
    errs = []

    sizes = []

    def worker():
        try:
            for _ in range(5):
                sizes.append(export_lib.save(exported, str(path)))
        except BaseException as e:  # pragma: no cover - failure path
            errs.append(e)

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    # The published file is ONE complete save's blob (sizes are collected
    # from save's return value rather than re-serializing, in case
    # serialization is not byte-deterministic across calls).
    assert path.stat().st_size in set(sizes)
    export_lib.load(str(path))  # deserializes => not interleaved
    leftovers = [p.name for p in tmp_path.iterdir() if p.name != path.name]
    assert leftovers == []  # every tmp was renamed or cleaned up


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


def test_bucket_inputs_input_guards_match_pipeline():
    """bucket_inputs claims to mirror probs_for_waveform_device exactly, so
    it must share that method's INPUT contract too: 2-D PCM fails loudly
    (not an opaque np.pad broadcast error) and float64 — which the live
    pipeline accepts and narrows — is narrowed the same way."""
    with pytest.raises(ValueError, match="1-D PCM"):
        list(export_lib.bucket_inputs(np.zeros((100, 2), np.float32)))
    rng = np.random.default_rng(11)
    w32 = rng.standard_normal(16000).astype(np.float32)
    got64 = list(export_lib.bucket_inputs(w32.astype(np.float64)))
    got32 = list(export_lib.bucket_inputs(w32))
    assert len(got64) == len(got32) > 0
    for (b64, v64, n64), (b32, v32, n32) in zip(got64, got32):
        assert b64.dtype == np.float32  # narrowed, like the pipeline
        np.testing.assert_array_equal(b64, b32)
        assert (v64, n64) == (v32, n32)


def test_bucket_geometry_defaults_match_inference_settings():
    """host_prep.BucketGeometry is the jax-free stand-in for
    InferenceSettings in bucket_inputs; if their (window, bucket_frames)
    defaults ever diverged, a JAX-less serving host would silently build
    buffers of the wrong length for a default-exported artifact."""
    from laughter_detection_icsi_tpu import host_prep

    g = host_prep.BucketGeometry()
    s = inference.InferenceSettings()
    assert (g.window, g.bucket_frames) == (s.window, s.bucket_frames)
    assert export_lib.bucket_inputs is host_prep.bucket_inputs


def test_host_prep_imports_without_jax():
    """The documented serving-host contract: the host-prep arithmetic is
    importable and usable with jax UNINSTALLED.  Simulated by poisoning
    sys.modules['jax'] in a fresh interpreter (any `import jax` then
    raises), then running the full bucket_inputs prep."""
    import os
    import subprocess

    env = {
        k: v
        for k, v in os.environ.items()
        # The axon plugin's sitecustomize registration imports jax at
        # interpreter start when PALLAS_AXON_POOL_IPS is set — strip it so
        # the child starts genuinely jax-free.
        if k not in ("JAX_PLATFORMS", "PALLAS_AXON_POOL_IPS")
    }
    code = (
        "import sys\n"
        f"sys.path.insert(0, {str(REPO)!r})\n"
        "assert 'jax' not in sys.modules\n"
        "sys.modules['jax'] = None  # simulate a JAX-less serving host\n"
        "from laughter_detection_icsi_tpu import host_prep\n"
        "import numpy as np\n"
        "wave = (np.linspace(-1, 1, 16000 * 3) * 20000).astype(np.int16)\n"
        "geom = host_prep.BucketGeometry(bucket_frames=128)\n"
        "bufs = list(host_prep.bucket_inputs(wave, settings=geom))\n"
        "assert len(bufs) == 3, len(bufs)\n"
        "wl = host_prep.bucket_wave_len(geom)\n"
        "assert all(b.shape == (wl,) and b.dtype == np.int16"
        " for b, _, _ in bufs)\n"
        "print('JAXFREE_OK')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env, capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, f"stdout={proc.stdout}\nstderr={proc.stderr}"
    assert "JAXFREE_OK" in proc.stdout


def test_export_rejects_empty_platforms(small_model):
    """platforms=[] must fail at export, not silently lower a current-
    backend-only artifact a TPU deployment then can't load."""
    model, params, state = small_model
    with pytest.raises(ValueError, match="platforms"):
        export_lib.export_window_classifier(
            model, params, state, batch=2, platforms=[]
        )


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
    # --platforms "" (an unset $TARGET_PLATFORMS shell var) must error,
    # not silently export a current-backend-only artifact.
    with pytest.raises(SystemExit, match="unknown platform"):
        main(["--random_init", "--platforms", "", "--out", out])
    # Unknown preset: named arg-only error BEFORE the jax import and
    # checkpoint load, not a raw KeyError at MODEL_MAP lookup.
    with pytest.raises(SystemExit, match="unknown preset 'resnet_bsae'"):
        main(["--random_init", "--config", "resnet_bsae", "--out", out])
    # Explicit 0 / negatives are rejected loudly — not silently swapped
    # for the default (0) or crashed deep in tracing (negative).
    with pytest.raises(SystemExit, match="--chunk must be >= 1"):
        main(["--random_init", "--what", "e2e", "--chunk", "0", "--out", out])
    with pytest.raises(SystemExit, match="--batch must be >= 1"):
        main(["--random_init", "--batch", "-3", "--out", out])
    # Arg-only validation precedes the checkpoint load: with BOTH a bad
    # flag and a missing checkpoint, the flag error wins (no multi-GB
    # load just to report an argparse-level mistake).
    with pytest.raises(SystemExit, match="--chunk only applies"):
        main(["--model_path", str(tmp_path / "definitely-missing"),
              "--what", "windows", "--chunk", "512", "--out", out])
    # 'tpu, cpu' with a space is natural shell quoting — normalized, not
    # forwarded to jax.export as ' cpu'.
    rc = main(["--random_init", "--batch", "2", "--platforms", "tpu, cpu",
               "--out", out])
    assert rc == 0
    assert set(export_lib.load(out).platforms) == {"tpu", "cpu"}


def test_bucket_geometry_and_inputs_validate_eagerly():
    """BucketGeometry rejects non-positive geometry at construction (like
    its jax-side twin), and bucket_inputs validates its input at CALL time
    — a lazy generator deferred the 2-D error to first iteration, after
    the expensive artifact load (or never)."""
    from laughter_detection_icsi_tpu import host_prep

    with pytest.raises(ValueError, match="bucket_frames must be >= 1"):
        host_prep.BucketGeometry(bucket_frames=0)
    with pytest.raises(ValueError, match="window must be >= 1"):
        host_prep.BucketGeometry(window=-1)
    with pytest.raises(ValueError, match="1-D PCM"):
        host_prep.bucket_inputs(np.zeros((100, 2), np.float32))  # no iteration

"""End-to-end inference pipeline: bucketed single-graph probs must match the
unbucketed reference computation (exact fbank + per-window model eval)."""

import jax
import numpy as np
import pytest

from laughter_detection_icsi_tpu import inference, models
from laughter_detection_icsi_tpu.data import audio
from laughter_detection_icsi_tpu.ops import fbank as fb


@pytest.fixture(scope="module")
def small_model():
    # tiny filter plan: the pipeline invariants under test (bucketing,
    # masking, dtype paths) are architecture-size independent, and the
    # sandbox CPU is 1 core
    model = models.build(
        "ResNetBigger", dropout_rate=0.0, linear_layer_size=24,
        filter_sizes=(8, 8, 8, 8),
    )
    params, state = model.init(jax.random.PRNGKey(7))
    return model, params, state


@pytest.fixture(scope="module")
def pipeline(small_model):
    model, params, state = small_model
    return inference.LaughterPipeline(
        model,
        params,
        state,
        settings=inference.InferenceSettings(chunk=256, bucket_frames=512),
    )


@pytest.fixture(scope="module")
def wave():
    # 3.3 s of noise with a loud burst, not a multiple of the bucket
    gen = np.random.default_rng(23)  # module-local: independent of `rng`
    w = (gen.standard_normal(16000 * 3 + 5000) * 0.05).astype(np.float32)
    w[20000:28000] += (gen.standard_normal(8000) * 0.4).astype(np.float32)
    return np.clip(w, -1, 1)


def reference_probs(model, params, state, wave):
    """Unbucketed oracle: exact fbank, explicit per-window batch."""
    feats = np.asarray(fb.fbank_jit(wave))
    t = feats.shape[0]
    padded = np.concatenate([feats, np.zeros((100, feats.shape[1]), np.float32)])
    wins = np.stack([padded[i : i + 100] for i in range(t)])
    probs, _ = model.apply(params, state, wins[:, None, :, :], train=False)
    return np.asarray(probs)


def test_probs_match_reference_computation(pipeline, small_model, wave):
    model, params, state = small_model
    got = pipeline.probs_for_waveform(wave)
    want = reference_probs(model, params, state, wave)
    assert got.shape == want.shape == (fb.num_frames(len(wave)),)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_probs_file_roundtrip(pipeline, wave, tmp_path):
    path = str(tmp_path / "x.sph")
    audio.write_sphere(path, wave, 16000)
    probs, duration = pipeline.probs_for_file(path)
    assert duration == pytest.approx(len(wave) / 16000)
    direct = pipeline.probs_for_waveform(
        (np.clip(wave, -1, 1) * 32767).astype(np.int16).astype(np.float32) / 32768
    )
    np.testing.assert_allclose(probs, direct, atol=1e-5)


def test_segment_file_produces_instances(pipeline, wave, tmp_path):
    path = str(tmp_path / "x.wav")
    audio.write_wav(path, wave, 16000)
    instances, took = pipeline.segment_file(
        path, thresholds=[0.0, 0.5], min_lengths=[0.0, 0.2]
    )
    assert set(instances) == {(0.0, 0.0), (0.0, 0.2), (0.5, 0.0), (0.5, 0.2)}
    # threshold 0 fires everywhere -> one long instance spanning the file
    inst = instances[(0.0, 0.0)]
    assert len(inst) == 1
    assert inst[0][0] == 0.0
    assert took > 0


def test_short_wave_padding_and_probs(pipeline):
    """Waves shorter than the pad amounts: symmetric padding must stay
    full-length (naive edge slicing silently produced a SHORT pad and
    shifted every frame — round-2 review finding), and the pipeline must
    classify them without error."""
    gen = np.random.default_rng(3)
    for n in (100, 250, 399):
        w = (gen.standard_normal(n) * 0.1).astype(np.float32)
        padded, t = inference.host_pad_waveform(w)
        cfg = inference._snip_cfg(inference.FEAT)
        assert len(padded) == (t - 1) * cfg.frame_shift_samples + cfg.frame_length_samples
        np.testing.assert_array_equal(
            padded, np.pad(w, (fb.pad_amounts(n, inference.FEAT)[0],
                               fb.pad_amounts(n, inference.FEAT)[1]),
                           mode="symmetric"),
        )
        probs = pipeline.probs_for_waveform(w)
        assert probs.shape == (t,)
        assert np.all((probs >= 0) & (probs <= 1))


def test_snip_edges_config_rejected():
    import dataclasses

    with pytest.raises(ValueError, match="snip_edges"):
        inference.host_pad_waveform(
            np.zeros(16000, np.float32),
            dataclasses.replace(inference.FEAT, snip_edges=True),
        )


def test_unsupported_pcm_dtype_rejected(pipeline):
    """int32/int8 PCM must raise (same contract as the streaming path) —
    silently casting fed +-30000-range values to the featurizer."""
    for dtype in (np.int32, np.int8, np.uint8):
        with pytest.raises(TypeError, match="dtype"):
            pipeline.probs_for_waveform(np.zeros(16000, dtype=dtype))


def test_bucket_reuse_consistency(pipeline, wave):
    # same input twice -> identical output (jit cache reuse)
    a = pipeline.probs_for_waveform(wave)
    b = pipeline.probs_for_waveform(wave)
    np.testing.assert_array_equal(a, b)
    # shorter input uses the same bucket; must still be exact vs oracle
    short = wave[:8000]
    got = pipeline.probs_for_waveform(short)
    assert got.shape == (fb.num_frames(8000),)


def test_multi_bucket_streaming_exact(pipeline, small_model, wave):
    """A bucket smaller than the input forces the streaming path with
    window halos; output must equal the single-bucket pipeline's."""
    model, params, state = small_model
    small = inference.LaughterPipeline(
        model,
        params,
        state,
        settings=inference.InferenceSettings(chunk=64, bucket_frames=128),
    )
    got = small.probs_for_waveform(wave)  # t=335 -> 3 buckets
    want = pipeline.probs_for_waveform(wave)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_int16_input_matches_float(pipeline, wave):
    pcm = (np.clip(wave, -1, 1) * 32767).astype(np.int16)
    as_float = pcm.astype(np.float32) / 32768.0
    a = pipeline.probs_for_waveform(pcm)
    b = pipeline.probs_for_waveform(as_float)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_bfloat16_pipeline_close(small_model, wave):
    model, params, state = small_model
    bf = inference.LaughterPipeline(
        model,
        params,
        state,
        settings=inference.InferenceSettings(
            chunk=256, bucket_frames=512, precision="bfloat16"
        ),
    )
    f32 = inference.LaughterPipeline(
        model,
        params,
        state,
        settings=inference.InferenceSettings(chunk=256, bucket_frames=512),
    )
    a = bf.probs_for_waveform(wave)
    b = f32.probs_for_waveform(wave)
    assert a.shape == b.shape
    # bf16 probabilities stay close on [0,1]
    assert np.abs(a - b).max() < 0.05


def test_host_numpy_trees_match_device_trees(small_model, wave):
    """Pipelines built from HOST numpy trees (load_checkpoint(host=True),
    the export path) must match device-tree pipelines bit-for-bit — in
    bf16 the BN eval branch once ran `var + eps` under NUMPY promotion
    (ml_dtypes bf16 + python float -> float32) and crashed the next conv."""
    model, params, state = small_model
    hp, hs = jax.device_get((params, state))
    assert all(
        isinstance(l, np.ndarray) for l in jax.tree_util.tree_leaves((hp, hs))
    )
    for precision in ("float32", "bfloat16"):
        settings = inference.InferenceSettings(
            chunk=256, bucket_frames=512, precision=precision
        )
        a = inference.LaughterPipeline(
            model, hp, hs, settings=settings
        ).probs_for_waveform(wave)
        b = inference.LaughterPipeline(
            model, params, state, settings=settings
        ).probs_for_waveform(wave)
        np.testing.assert_array_equal(a, b)


def test_packed_transfer_codec_bit_exact(small_model, wave):
    """'packed' (on-device pcm_pack decode) must give EXACTLY the probs of
    'raw' int16 upload — the codec is lossless, so the featurize graph sees
    identical samples."""
    model, params, state = small_model
    pcm = (np.clip(wave, -1, 1) * 32767).astype(np.int16)
    mk = lambda codec: inference.LaughterPipeline(
        model, params, state,
        settings=inference.InferenceSettings(
            chunk=256, bucket_frames=512, transfer_codec=codec
        ),
    )
    a = mk("packed").probs_for_waveform(pcm)
    b = mk("raw").probs_for_waveform(pcm)
    np.testing.assert_array_equal(a, b)


def test_packed_featurize_cache_keyed_on_blocks(small_model, wave):
    """The packed decoder bakes n_blocks into its closure (split_wire's
    width-table offset), and WORD_PAD padding lets different buffer lengths
    share a padded wire_len — so n_blocks must be part of the cache key or
    a collision silently decodes garbage."""
    model, params, state = small_model
    pipe = inference.LaughterPipeline(
        model, params, state,
        settings=inference.InferenceSettings(
            chunk=256, bucket_frames=512, transfer_codec="packed"
        ),
    )
    pcm = (np.clip(wave, -1, 1) * 32767).astype(np.int16)
    pipe.probs_for_waveform(pcm)  # populate the "body" entry
    f2 = pipe._packed_featurize(16384, 2, False)
    f3 = pipe._packed_featurize(16384, 3, False)
    assert f2 is not f3
    assert pipe._packed_featurize(16384, 2, False) is f2  # still cached


def test_auto_codec_matches_raw_on_speechlike_pcm(small_model):
    """'auto' packs quiet speech-like PCM (savings >= 10%) and must still
    be bit-exact; a float32 input bypasses packing entirely."""
    model, params, state = small_model
    rng = np.random.default_rng(3)
    n = 16000 * 2
    e = rng.standard_normal(n) * 60
    x = np.empty(n)
    acc = 0.0
    for i in range(n):
        acc = 0.96 * acc + e[i]
        x[i] = acc
    pcm = np.clip(x, -32768, 32767).astype(np.int16)
    mk = lambda codec: inference.LaughterPipeline(
        model, params, state,
        settings=inference.InferenceSettings(
            chunk=256, bucket_frames=512, transfer_codec=codec
        ),
    )
    auto = mk("auto")
    a = auto.probs_for_waveform(pcm)
    b = mk("raw").probs_for_waveform(pcm)
    np.testing.assert_array_equal(a, b)
    # the auto pipeline actually compiled a packed featurize variant
    assert any(isinstance(k, tuple) and k[0] == "pk" for k in auto._jitted)


def test_transfer_codec_validation():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        inference.InferenceSettings(transfer_codec="zip")


def test_packed_codec_conflicts_and_warnings(small_model, wave):
    import warnings as _warnings

    with pytest.raises(ValueError):
        inference.InferenceSettings(transfer_codec="packed", mode="fused_conv")

    model, params, state = small_model
    pipe = inference.LaughterPipeline(
        model, params, state,
        settings=inference.InferenceSettings(
            chunk=256, bucket_frames=512, transfer_codec="packed"
        ),
    )
    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        pipe.probs_for_waveform(wave.astype(np.float32))
    assert any("int16" in str(w.message) for w in rec)


def test_pipeline_rejects_wrong_sample_rate(pipeline, tmp_path, rng):
    from laughter_detection_icsi_tpu.data import audio

    p = tmp_path / "sr44.wav"
    audio.write_wav(str(p), (rng.standard_normal(44100) * 0.1).astype(np.float32), 44100)
    with pytest.raises(ValueError, match="sample rate"):
        pipeline.probs_for_file(str(p))


def test_pipeline_rejects_2d_waveform(pipeline):
    with pytest.raises(ValueError, match="1-D PCM"):
        pipeline.probs_for_waveform(np.zeros((2, 16000), np.float32))
    with pytest.raises(ValueError, match="1-D PCM"):
        pipeline.probs_for_waveform(np.zeros((16000, 2), np.float32))


def test_settings_reject_nonpositive_geometry():
    """chunk/bucket_frames/window < 1 must fail at construction with the
    field named — not far away as an opaque jnp.pad/IndexError crash after
    the model already loaded."""
    import pytest

    for kw in ({"chunk": 0}, {"bucket_frames": -1}, {"window": 0}):
        (name,) = kw
        with pytest.raises(ValueError, match=f"{name} must be >= 1"):
            inference.InferenceSettings(**kw)


def test_graphs_share_chunk_probs_across_input_dtypes(pipeline):
    """chunk_probs is dtype-independent (int16 scaling lives in featurize):
    the int16 and float graph keys must share ONE jitted closure, or a
    pipeline that sees both input dtypes pays the whole conv-net cold
    compile twice."""
    assert pipeline._graphs(True)[1] is pipeline._graphs(False)[1]

"""Sharded multi-channel inference must match the single-channel pipeline
exactly, on an 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

from laughter_detection_icsi_tpu import inference, models
from laughter_detection_icsi_tpu.parallel import ShardedPipeline, make_mesh


@pytest.fixture(scope="module")
def small_model():
    # tiny filter plan — sharding equivalence is size-independent (1-core CPU)
    model = models.build(
        "ResNetBigger", dropout_rate=0.0, linear_layer_size=24,
        filter_sizes=(8, 8, 8, 8),
    )
    params, state = model.init(jax.random.PRNGKey(7))
    return model, params, state


@pytest.fixture(scope="module")
def settings():
    return inference.InferenceSettings(chunk=128, bucket_frames=256)


def test_sharded_matches_single(small_model, settings, rng):
    model, params, state = small_model
    single = inference.LaughterPipeline(model, params, state, settings=settings)
    sharded = ShardedPipeline(
        model=model, params=params, state=state, mesh=make_mesh(8), settings=settings
    )
    # 3 channels (pads to 8), unequal lengths; the longest exceeds the
    # 256-frame bucket -> exercises multi-bucket streaming with halos
    waves = [
        (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32),
        (rng.standard_normal(16000 * 1 + 800) * 0.1).astype(np.float32),
        (rng.standard_normal(16000 * 3 + 5000) * 0.1).astype(np.float32),
    ]
    got = sharded.probs_for_waveforms(waves)
    assert len(got) == 3
    for w, g in zip(waves, got):
        want = single.probs_for_waveform(w)
        assert g.shape == want.shape
        np.testing.assert_allclose(g, want, rtol=1e-4, atol=1e-5)


def test_sharded_empty_and_zero(small_model, settings):
    model, params, state = small_model
    sharded = ShardedPipeline(
        model=model, params=params, state=state, mesh=make_mesh(8), settings=settings
    )
    assert sharded.probs_for_waveforms([]) == []
    out = sharded.probs_for_waveforms([np.zeros(40, np.float32)])
    assert out[0].shape == (0,)
    # empty meeting: the all-int16-eligible check is vacuously true and must
    # not reach ThreadPoolExecutor(max_workers=0)
    assert sharded.probs_for_meeting_device([]) == ((None, []), [])


def test_sharded_meeting_from_files(small_model, settings, rng, tmp_path):
    from laughter_detection_icsi_tpu.data import audio

    model, params, state = small_model
    paths = []
    for i in range(2):
        w = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
        p = str(tmp_path / f"chan{i}.sph")
        audio.write_sphere(p, w, 16000)
        paths.append(p)
    sharded = ShardedPipeline(
        model=model, params=params, state=state, mesh=make_mesh(8), settings=settings
    )
    probs, durations = sharded.probs_for_meeting(paths)
    assert len(probs) == 2
    assert durations == [pytest.approx(2.0), pytest.approx(2.0)]
    assert all(p.shape == (200,) for p in probs)


def test_sharded_int16_matches_float(small_model, settings, rng):
    model, params, state = small_model
    sharded = ShardedPipeline(
        model=model, params=params, state=state, mesh=make_mesh(8), settings=settings
    )
    w = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    pcm = (np.clip(w, -1, 1) * 32767).astype(np.int16)
    as_float = pcm.astype(np.float32) / 32768.0
    a = sharded.probs_for_waveforms([pcm])[0]
    b = sharded.probs_for_waveforms([as_float])[0]
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_sharded_respects_transfer_int16_setting(
    small_model, rng, tmp_path, monkeypatch
):
    """transfer_int16=False must force the float decode path on the sharded
    pipeline too (it was silently a no-op there — round-2 review finding);
    results are identical either way."""
    from laughter_detection_icsi_tpu.data import audio

    model, params, state = small_model
    w = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    p = str(tmp_path / "c.sph")
    audio.write_sphere(p, w, 16000)

    calls = []
    real = audio.read_int16
    monkeypatch.setattr(
        audio, "read_int16", lambda *a, **k: calls.append(a) or real(*a, **k)
    )

    def run(transfer_int16):
        sharded = ShardedPipeline(
            model=model, params=params, state=state, mesh=make_mesh(8),
            settings=inference.InferenceSettings(
                chunk=128, bucket_frames=256, transfer_int16=transfer_int16
            ),
        )
        (probs, ts), _dur = sharded.probs_for_meeting_device([p])
        return np.asarray(probs[0, : ts[0]])

    a = run(transfer_int16=True)
    assert calls  # int16 path actually used
    calls.clear()
    b = run(transfer_int16=False)
    assert not calls  # float path respected the setting
    np.testing.assert_allclose(a, b, atol=1e-6)


@pytest.mark.parametrize("mode", ["windows", "fused_conv"])
def test_sharded_pallas_fbank_matches_xla(small_model, rng, mode):
    # The fused Pallas featurizer mapped over the mesh (shard_map, interpret
    # mode on CPU) must reproduce the XLA-featurizer sharded pipeline.
    model, params, state = small_model
    base = inference.InferenceSettings(chunk=128, bucket_frames=256, mode=mode)
    xla = ShardedPipeline(
        model=model, params=params, state=state, mesh=make_mesh(8),
        settings=base,
    )
    pallas = ShardedPipeline(
        model=model, params=params, state=state, mesh=make_mesh(8),
        settings=inference.InferenceSettings(
            chunk=128, bucket_frames=256, mode=mode, use_pallas_fbank=True
        ),
    )
    waves = [
        (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32),
        (rng.standard_normal(16000 + 800) * 0.1).astype(np.float32),
    ]
    want = xla.probs_for_waveforms(waves)
    got = pallas.probs_for_waveforms(waves)
    for w, g in zip(want, got):
        assert g.shape == w.shape
        np.testing.assert_allclose(g, w, rtol=1e-4, atol=1e-5)


def test_sharded_many_channels_per_device(small_model, rng):
    # 4 channels on a 2-device mesh -> 2 channels/device: each local
    # channel runs its own settings.chunk conv batch inside one dispatch
    # (r05 per-channel loop formulation; the pre-r05 divide-by-c_local
    # sizing survives only on the non-shared path and as the
    # _MAX_WINDOWS_PER_DISPATCH overflow guard), and results still match
    # the single-channel pipeline exactly.
    model, params, state = small_model
    settings = inference.InferenceSettings(chunk=128, bucket_frames=256)
    single = inference.LaughterPipeline(model, params, state, settings=settings)
    sharded = ShardedPipeline(
        model=model, params=params, state=state, mesh=make_mesh(2),
        settings=settings,
    )
    waves = [
        (rng.standard_normal(16000 + 1000 * i) * 0.1).astype(np.float32)
        for i in range(4)
    ]
    got = sharded.probs_for_waveforms(waves)
    for w, g in zip(waves, got):
        want = single.probs_for_waveform(w)
        assert g.shape == want.shape
        np.testing.assert_allclose(g, want, rtol=1e-4, atol=1e-5)


def test_sharded_windows_cap_shrinks_chunk(small_model, rng, monkeypatch):
    """When c_local channels at the tuned settings.chunk would exceed the
    _MAX_WINDOWS_PER_DISPATCH activation guard, the per-channel chunk
    shrinks (the r05 shared-stem path's only shrink trigger) and the
    results still match the single-channel pipeline exactly."""
    from laughter_detection_icsi_tpu.parallel import sharded_inference as si

    # 4 channels / 2 devices -> c_local=2; cap 64 forces chunk
    # min(128, 64 // 2) = 32, i.e. 8 chunk dispatches per 256-frame bucket.
    monkeypatch.setattr(si, "_MAX_WINDOWS_PER_DISPATCH", 64)
    model, params, state = small_model
    settings = inference.InferenceSettings(chunk=128, bucket_frames=256)
    single = inference.LaughterPipeline(model, params, state, settings=settings)
    sharded = ShardedPipeline(
        model=model, params=params, state=state, mesh=make_mesh(2),
        settings=settings,
    )
    assert sharded._use_shared_stem(), "cap branch requires the shared path"
    waves = [
        (rng.standard_normal(16000 + 777 * i) * 0.1).astype(np.float32)
        for i in range(4)
    ]
    got = sharded.probs_for_waveforms(waves)
    for w, g in zip(waves, got):
        want = single.probs_for_waveform(w)
        assert g.shape == want.shape
        np.testing.assert_allclose(g, want, rtol=1e-4, atol=1e-5)


def test_sharded_mixed_dtype_waveforms(small_model, settings, rng):
    # A batch mixing int16 PCM and float32 channels must scale the int16
    # ones (a bare astype would feed +-32768-range values to the featurizer).
    model, params, state = small_model
    sharded = ShardedPipeline(
        model=model, params=params, state=state, mesh=make_mesh(8),
        settings=settings,
    )
    f = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    pcm = (np.clip(f, -1, 1) * 32767).astype(np.int16)
    mixed = sharded.probs_for_waveforms([pcm, f.copy()])
    pure = sharded.probs_for_waveforms([pcm])[0]
    np.testing.assert_allclose(mixed[0], pure, atol=1e-5)
    np.testing.assert_allclose(
        mixed[1], sharded.probs_for_waveforms([f])[0], atol=1e-6
    )


def test_sharded_packed_codec_bit_exact(small_model, rng):
    """The sharded packed-PCM path (one wire batch, per-shard decode) must
    reproduce the raw int16 upload exactly for every channel."""
    model, params, state = small_model
    mk = lambda codec: ShardedPipeline(
        model=model, params=params, state=state, mesh=make_mesh(8),
        settings=inference.InferenceSettings(
            chunk=128, bucket_frames=256, transfer_codec=codec
        ),
    )
    waves = [
        (rng.standard_normal(16000 * 2) * 1500).astype(np.int16),
        np.zeros(16000, dtype=np.int16),  # silent channel: near-empty wire
        (np.cumsum(rng.integers(-80, 81, 16000 * 3 + 700))
         .clip(-32768, 32767).astype(np.int16)),
    ]
    got = mk("packed").probs_for_waveforms(waves)
    want = mk("raw").probs_for_waveforms(waves)
    assert len(got) == len(want) == 3
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_sharded_device_probs_and_smoothing(small_model, settings, rng):
    """probs_for_waveforms_device + on-device smoothing must reproduce the
    host path: same probabilities row-for-row and the same instance dicts."""
    from laughter_detection_icsi_tpu.ops import smoothing

    model, params, state = small_model
    sharded = ShardedPipeline(
        model=model, params=params, state=state, mesh=make_mesh(8),
        settings=settings,
    )
    waves = [
        (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32),
        (rng.standard_normal(16000 + 700) * 0.1).astype(np.float32),
    ]
    host = sharded.probs_for_waveforms(waves)
    dev, ts = sharded.probs_for_waveforms_device(waves)
    assert ts == [len(h) for h in host]
    for i, h in enumerate(host):
        np.testing.assert_array_equal(np.asarray(dev[i, : ts[i]]), h)
        want = smoothing.get_laughter_instances(
            h, thresholds=[0.2, 0.6], min_lengths=[0.0, 0.1], fps=100.0
        )
        got = smoothing.instances_from_device_probs(
            dev[i, : ts[i]], thresholds=[0.2, 0.6],
            min_lengths=[0.0, 0.1], fps=100.0,
        )
        assert got == want


def test_sharded_guards_and_fused_conv_shape(tmp_path, rng):
    """Sharded twin keeps the single-channel pipeline's contracts: sample
    rate validated on the meeting path, 1-D channels enforced, and
    fused_conv returns the documented [C, t_max] (the bucket-rounded tail
    carries a bias-leak constant, not zeros)."""
    import jax

    from laughter_detection_icsi_tpu import inference, models
    from laughter_detection_icsi_tpu.data import audio
    from laughter_detection_icsi_tpu.parallel import ShardedPipeline, make_mesh

    model = models.build(
        "ResNetBigger", dropout_rate=0.0, linear_layer_size=24,
        filter_sizes=(8, 8, 8, 8),
    )
    params, state = model.init(jax.random.PRNGKey(7))
    sp = ShardedPipeline(
        model=model, params=params, state=state, mesh=make_mesh(8),
        settings=inference.InferenceSettings(
            chunk=256, bucket_frames=256, mode="fused_conv"
        ),
    )
    w = (rng.standard_normal(16000) * 0.1).astype(np.float32)  # 100 frames
    probs, ts = sp.probs_for_waveforms_device([w])
    assert probs.shape == (1, 100) and ts == [100]

    p8 = tmp_path / "sr8.wav"
    audio.write_wav(str(p8), (rng.standard_normal(8000) * 0.1).astype(np.float32), 8000)
    with pytest.raises(ValueError, match="sample rate"):
        sp.probs_for_meeting([str(p8)])
    with pytest.raises(ValueError, match="1-D PCM"):
        sp.probs_for_waveforms([np.zeros((2, 32000), np.float32)])


def test_sharded_accepts_2d_ndarray_channel_batch(small_model, settings, rng):
    """A [C, n] ndarray — the shape LaughterPipeline's 2-D error steers
    users here with — must work like the equivalent list of rows, not die
    on an ambiguous-truth-value emptiness check."""
    sharded = ShardedPipeline(
        model=small_model[0], params=small_model[1], state=small_model[2],
        mesh=make_mesh(8), settings=settings,
    )
    batch = (rng.standard_normal((2, 16000)) * 0.1).astype(np.float32)
    got = sharded.probs_for_waveforms(batch)
    want = sharded.probs_for_waveforms([batch[0], batch[1]])
    assert len(got) == 2
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_sharded_graphs_share_chunk_probs_across_dtypes(small_model, settings):
    """Same guard as the single-channel pipeline: chunk_probs depends only
    on c_local, so int16 and float graph keys must share one jitted
    closure instead of recompiling the conv net."""
    sharded = ShardedPipeline(
        model=small_model[0], params=small_model[1], state=small_model[2],
        mesh=make_mesh(8), settings=settings,
    )
    assert sharded._graphs(True, 1)[1] is sharded._graphs(False, 1)[1]
    # ...but a different c_local is a genuinely different graph
    assert sharded._graphs(True, 2)[1] is not sharded._graphs(True, 1)[1]


def test_shard_batch_reshards_device_resident_leaves():
    """A jax.Array leaf must reshard device-to-device, not bounce through
    np.asarray (blocking D2H + re-upload)."""
    import jax as _jax

    from laughter_detection_icsi_tpu.parallel import mesh as mesh_lib

    mesh = make_mesh(8)
    resident = _jax.device_put(
        np.arange(32, dtype=np.float32).reshape(8, 4),
        mesh_lib.replicated(mesh),
    )
    out = mesh_lib.shard_batch({"x": resident}, mesh)["x"]
    assert out.sharding == mesh_lib.data_sharding(mesh)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(resident))


def test_local_channel_indices_ownership_partition(small_model, settings):
    """The ownership partition: single-process owns every row; multi-host
    owns exactly the contiguous block the channel sharding places here —
    disjoint across processes, covering each real channel once."""
    sharded = ShardedPipeline(
        model=small_model[0], params=small_model[1], state=small_model[2],
        mesh=make_mesh(8), settings=settings,
    )
    assert sharded.local_channel_indices(3) == [0, 1, 2]

    # Simulate a 2-process / 8-shard pipeline: rows [4, 8) live here.
    sharded._multi = True
    sharded._rows_slice = lambda c_pad: (4, 8)
    # 6 real channels pad to 8; this process owns rows 4 and 5 only (6, 7
    # are padding).
    assert sharded.local_channel_indices(6) == [4, 5]
    # With <= 4 real channels every owned row is padding -> owns nothing.
    assert sharded.local_channel_indices(4) == []


def test_local_channels_enforces_ownership(small_model, settings):
    """local_channels must return exactly the OWNED rows (not whatever is
    addressable) and fail loudly when an owned row moved off-host."""
    import types

    sharded = ShardedPipeline(
        model=small_model[0], params=small_model[1], state=small_model[2],
        mesh=make_mesh(8), settings=settings,
    )
    sharded._multi = True
    sharded._rows_slice = lambda c_pad: (2, 4)

    def fake_probs(rows):
        shards = [
            types.SimpleNamespace(
                index=(slice(r, r + 1), slice(None)),
                data=np.full((1, 5), float(r), np.float32),
            )
            for r in rows
        ]
        return types.SimpleNamespace(addressable_shards=shards)

    # Addressable rows are a superset of owned (resharding replicated row 0
    # here too): only owned rows 2 and 3 come back, in order.
    got = sharded.local_channels(fake_probs([0, 2, 3, 2]), 4)
    assert [r for r, _ in got] == [2, 3]
    assert all(float(row[0]) == r for r, row in got)

    # An owned row missing from the addressable shards is a hard error.
    with pytest.raises(RuntimeError, match="owned by this process"):
        sharded.local_channels(fake_probs([0, 2]), 4)


def test_sharded_matches_single_without_shared_stem(small_model, rng):
    """The non-shared-stem sharded path (vmapped full-window classifier)
    must also match the single-channel pipeline.  This is the path whose
    per-channel chunk keeps the divide-by-c_local sizing (its live
    footprint is full windows + stage-1 activations, unlike the shared
    path's band/half-res tensors — _graphs docstring), so pin both its
    numerics and that the chunk shrink still covers every window."""
    model, params, state = small_model
    settings_off = inference.InferenceSettings(
        chunk=128, bucket_frames=256, shared_stem=False
    )
    single = inference.LaughterPipeline(
        model, params, state, settings=settings_off
    )
    sharded = ShardedPipeline(
        model=model, params=params, state=state, mesh=make_mesh(8),
        settings=settings_off,
    )
    waves = [
        (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32),
        (rng.standard_normal(16000 + 640) * 0.1).astype(np.float32),
    ]
    got = sharded.probs_for_waveforms(waves)
    assert len(got) == 2
    for w, g in zip(waves, got):
        want = single.probs_for_waveform(w)
        assert g.shape == want.shape
        np.testing.assert_allclose(g, want, rtol=1e-4, atol=1e-5)

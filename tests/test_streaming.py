"""Streaming (online) inference must be bit-exact against the offline
pipeline: StreamingSession evaluates a shape bucket only once every sample
its windows read is final, and applies the end-of-stream reflection pad in
finish() — so chunked feeding reproduces probs_for_waveform on the
concatenated audio sample for sample.

No reference analogue (the reference is strictly offline, one file per
process — reference segment_laughter.py:79-122); this is the serving path.
"""

import jax
import numpy as np
import pytest

from laughter_detection_icsi_tpu import inference, models


@pytest.fixture(scope="module")
def pipeline():
    model = models.build(
        "ResNetBigger", dropout_rate=0.0, linear_layer_size=24,
        filter_sizes=(8, 8, 8, 8),
    )
    params, state = model.init(jax.random.PRNGKey(7))
    return inference.LaughterPipeline(
        model, params, state,
        settings=inference.InferenceSettings(chunk=256, bucket_frames=512),
    )


def _stream(pipeline, wave, chunks):
    sess = inference.StreamingSession(pipeline)
    got = []
    lo = 0
    for size in chunks:
        got.append(sess.feed(wave[lo : lo + size]))
        lo += size
    assert lo >= len(wave)
    got.append(sess.finish())
    return np.concatenate(got)


@pytest.mark.parametrize("chunk_size", [1000, 16000, 16384, 100_000])
def test_streaming_matches_offline(pipeline, rng, chunk_size):
    n = 16000 * 7 + 1234  # several buckets + ragged tail
    wave = (rng.standard_normal(n) * 0.1).astype(np.float32)
    want = pipeline.probs_for_waveform(wave)
    sizes = [chunk_size] * (-(-n // chunk_size))
    got = _stream(pipeline, wave, sizes)
    np.testing.assert_array_equal(got, want)


def test_streaming_int16_matches_offline(pipeline, rng):
    n = 16000 * 6
    wave = (rng.standard_normal(n) * 3000).astype(np.int16)
    want = pipeline.probs_for_waveform(wave)
    got = _stream(pipeline, wave, [7000] * (-(-n // 7000)))
    np.testing.assert_array_equal(got, want)


def test_streaming_emits_incrementally(pipeline, rng):
    # 512-frame buckets = 81920 samples + halo; after ~2 buckets of audio
    # the first bucket's probs must already be out.
    sess = inference.StreamingSession(pipeline)
    wave = (rng.standard_normal(16000 * 12) * 0.1).astype(np.float32)
    out = sess.feed(wave)
    assert len(out) >= 512  # at least one bucket finalized before finish()
    tail = sess.finish()
    total = np.concatenate([out, tail])
    np.testing.assert_array_equal(total, pipeline.probs_for_waveform(wave))


def test_streaming_tiny_and_empty_streams(pipeline, rng):
    for n in (0, 50, 119, 120, 121, 4000):
        wave = (rng.standard_normal(n) * 0.1).astype(np.float32)
        want = pipeline.probs_for_waveform(wave)
        sess = inference.StreamingSession(pipeline)
        a = sess.feed(wave[: n // 2])
        b = sess.feed(wave[n // 2 :])
        c = sess.finish()
        np.testing.assert_array_equal(np.concatenate([a, b, c]), want)


def test_streaming_mixed_dtype_rules(pipeline, rng):
    # int16 into a float stream: exact (scaled); float into int16: rejected
    f = (rng.standard_normal(30000) * 0.1).astype(np.float32)
    i = (rng.standard_normal(30000) * 3000).astype(np.int16)
    sess = inference.StreamingSession(pipeline)
    sess.feed(f)
    sess.feed(i)
    got = sess.finish()
    want = pipeline.probs_for_waveform(
        np.concatenate([f, i.astype(np.float32) / 32768.0])
    )
    np.testing.assert_array_equal(got, want)

    sess = inference.StreamingSession(pipeline)
    sess.feed(i)
    with pytest.raises(TypeError):
        sess.feed(f)


def test_streaming_lifecycle_errors(pipeline):
    sess = inference.StreamingSession(pipeline)
    sess.finish()
    with pytest.raises(RuntimeError):
        sess.feed(np.zeros(10, np.float32))
    with pytest.raises(RuntimeError):
        sess.finish()
    fc = inference.LaughterPipeline(
        pipeline.model, pipeline.params, pipeline.state,
        settings=inference.InferenceSettings(
            chunk=256, bucket_frames=512, mode="fused_conv"
        ),
    )
    with pytest.raises(ValueError):
        inference.StreamingSession(fc)


def test_many_sessions_share_one_pipeline(pipeline, rng):
    """Sessions hold no compiled state of their own, so one pipeline serves
    many concurrent streams (a meeting's channels live): interleaved feeds
    must not cross-contaminate, and each stream matches its offline run."""
    waves = [
        (rng.standard_normal(16000 * 6 + i * 777) * 0.1).astype(np.float32)
        for i in range(3)
    ]
    sessions = [inference.StreamingSession(pipeline) for _ in waves]
    outs = [[] for _ in waves]
    lo = 0
    while any(lo < len(w) for w in waves):
        for s, w, o in zip(sessions, waves, outs):
            if lo < len(w):
                o.append(s.feed(w[lo : lo + 9000]))
        lo += 9000
    for s, w, o in zip(sessions, waves, outs):
        o.append(s.finish())
        np.testing.assert_array_equal(
            np.concatenate(o), pipeline.probs_for_waveform(w)
        )


def test_streaming_with_packed_codec_matches_offline(rng):
    """The streaming path shares the offline bucket executor, including the
    packed-PCM wire branch: streaming with transfer_codec='packed' must be
    bit-exact vs the offline packed pipeline."""
    model = models.build(
        "ResNetBigger", dropout_rate=0.0, linear_layer_size=24,
        filter_sizes=(8, 8, 8, 8),
    )
    params, state = model.init(jax.random.PRNGKey(3))
    pk = inference.LaughterPipeline(
        model, params, state,
        settings=inference.InferenceSettings(
            chunk=256, bucket_frames=512, transfer_codec="packed"
        ),
    )
    wave = (np.cumsum(rng.integers(-90, 91, 16000 * 5))
            .clip(-32768, 32767).astype(np.int16))
    want = pk.probs_for_waveform(wave)
    got = _stream(pk, wave, [11000] * (-(-len(wave) // 11000)))
    np.testing.assert_array_equal(got, want)


def test_streaming_rejects_unknown_dtype(pipeline):
    sess = inference.StreamingSession(pipeline)
    with pytest.raises(TypeError):
        sess.feed(np.zeros(100, dtype=np.int32))
    sess2 = inference.StreamingSession(pipeline)
    sess2.feed(np.zeros(1000, dtype=np.float32))
    with pytest.raises(TypeError):
        sess2.feed(np.zeros(100, dtype=np.int64))


def test_sharded_streaming_matches_offline_batch(rng):
    """ShardedStreamingSession over a virtual mesh: synchronized chunked
    feeding of N channels must be bit-identical to the offline sharded
    batch on the concatenated audio."""
    from laughter_detection_icsi_tpu.parallel import (
        ShardedPipeline,
        ShardedStreamingSession,
        make_mesh,
    )

    model = models.build(
        "ResNetBigger", dropout_rate=0.0, linear_layer_size=24,
        filter_sizes=(8, 8, 8, 8),
    )
    params, state = model.init(jax.random.PRNGKey(7))
    pipe = ShardedPipeline(
        model=model, params=params, state=state, mesh=make_mesh(8),
        settings=inference.InferenceSettings(chunk=256, bucket_frames=512),
    )
    n = 16000 * 7 + 900
    waves = [
        (rng.standard_normal(n) * 0.1).astype(np.float32) for _ in range(3)
    ]
    want = pipe.probs_for_waveforms(waves)

    sess = ShardedStreamingSession(pipe, n_channels=3)
    got = []
    for lo in range(0, n, 20000):
        out = sess.feed([w[lo : lo + 20000] for w in waves])
        if out.shape[1]:
            got.append(out)
    got.append(sess.finish())
    full = np.concatenate(got, axis=1)
    assert full.shape == (3, len(want[0]))
    for i, w in enumerate(want):
        np.testing.assert_array_equal(full[i], w)


def test_sharded_streaming_validation(rng):
    from laughter_detection_icsi_tpu.parallel import (
        ShardedPipeline,
        ShardedStreamingSession,
        make_mesh,
    )

    model = models.build(
        "ResNetBigger", dropout_rate=0.0, linear_layer_size=24,
        filter_sizes=(8, 8, 8, 8),
    )
    params, state = model.init(jax.random.PRNGKey(7))
    pipe = ShardedPipeline(
        model=model, params=params, state=state, mesh=make_mesh(8),
        settings=inference.InferenceSettings(chunk=256, bucket_frames=512),
    )
    sess = ShardedStreamingSession(pipe, n_channels=2)
    with pytest.raises(ValueError):
        sess.feed([np.zeros(100, np.float32)])  # wrong channel count
    with pytest.raises(ValueError):
        sess.feed([np.zeros(100, np.float32), np.zeros(99, np.float32)])
    with pytest.raises(ValueError):  # 2-D (stereo) chunks rejected up front
        sess.feed([np.zeros((100, 2), np.float32), np.zeros((100, 2), np.float32)])
    sess.finish()
    with pytest.raises(RuntimeError):
        sess.feed([np.zeros(4, np.float32), np.zeros(4, np.float32)])


def test_streaming_memory_stays_bounded(pipeline, rng):
    """The session drops consumed samples after each bucket: over a long
    stream the buffer must stay ~one bucket span, never grow with the
    stream (a leak here would OOM live deployments)."""
    sess = inference.StreamingSession(pipeline)
    frames = 0
    max_buf = 0
    for _ in range(60):  # 1 minute of audio through 5.12 s buckets
        out = sess.feed((rng.standard_normal(16000) * 0.1).astype(np.float32))
        frames += len(out)
        held = (sess._bufs[0].nbytes if sess._bufs else 0) + sum(
            c.nbytes for c in sess._pending[0]
        )
        max_buf = max(max_buf, held)
    frames += len(sess.finish())
    assert frames == 6000
    # bucket span (512 frames) is ~82k samples + chunk slack; 2 MB is far
    # below the 3.8 MB a minute of unbounded float32 audio would reach.
    assert max_buf < 2_000_000, max_buf


def test_streaming_rejects_snip_edges_cfg(pipeline):
    """The streaming pads implement snip_edges=False framing; a
    snip_edges=True cfg must be rejected up front (the offline path raises
    in host_pad_waveform) instead of silently shifting every frame."""
    import dataclasses

    bad = inference.LaughterPipeline(
        pipeline.model, pipeline.params, pipeline.state,
        feat_cfg=dataclasses.replace(pipeline.feat_cfg, snip_edges=True),
        settings=pipeline.settings,
    )
    with pytest.raises(ValueError, match="snip_edges"):
        inference.StreamingSession(bad)


def test_streaming_tiny_chunks_match_offline(pipeline, rng):
    """Microphone-sized chunks (~10 ms) exercise the pending-chunk append
    path heavily: many feeds per bucket, consolidation only at execute/trim
    boundaries — output must stay bit-exact."""
    n = 16000 * 7 + 37
    wave = (rng.standard_normal(n) * 0.1).astype(np.float32)
    want = pipeline.probs_for_waveform(wave)
    got = _stream(pipeline, wave, [163] * (-(-n // 163)))
    np.testing.assert_array_equal(got, want)


def test_feed_does_not_alias_reused_buffer(pipeline, rng):
    """The standard audio-callback pattern reuses ONE capture buffer across
    feeds; retained chunks must be copies or every buffered chunk silently
    decodes as the last chunk's data."""
    n = 16000 * 7
    wave = (rng.standard_normal(n) * 0.1).astype(np.float32)
    want = pipeline.probs_for_waveform(wave)
    sess = inference.StreamingSession(pipeline)
    buf = np.empty(4000, dtype=np.float32)
    outs = []
    for lo in range(0, n, 4000):
        buf[:] = wave[lo : lo + 4000]
        outs.append(sess.feed(buf))
    outs.append(sess.finish())
    np.testing.assert_array_equal(np.concatenate(outs), want)

"""On-device run-length smoothing vs. a naive Python reimplementation of the
reference scan (reference laugh_segmenter.py:74-111)."""

import numpy as np
import pytest

from laughter_detection_icsi_tpu.ops import smoothing, windows


def naive_instances(probs, thresholds, min_lengths, fps):
    def fix(p):
        if p > 1:
            return 1.0
        if p <= 0:
            return 1e-7
        return p

    out = {}
    for thr in thresholds:
        for min_l in min_lengths:
            instances, current = [], []
            for i, p in enumerate(map(fix, probs)):
                if p > thr:
                    current.append(i)
                else:
                    if current:
                        instances.append(current)
                        current = []
            if current:
                instances.append(current)
            spans = [(c[0] / fps, c[-1] / fps) for c in instances]
            out[(thr, min_l)] = [s for s in spans if s[1] - s[0] > min_l]
    return out


@pytest.mark.parametrize("seed", range(5))
def test_matches_naive_scan(seed):
    rng = np.random.default_rng(seed)
    probs = rng.uniform(-0.1, 1.1, size=500)  # includes out-of-range values
    thresholds = [0.0, 0.2, 0.5, 0.9, 1.0]
    min_lengths = [0.0, 0.1, 0.2]
    got = smoothing.get_laughter_instances(probs, thresholds, min_lengths, fps=100.0)
    want = naive_instances(probs, thresholds, min_lengths, fps=100.0)
    assert set(got) == set(want)
    for key in want:
        np.testing.assert_allclose(got[key], want[key], atol=1e-9)


def test_overflow_semantics():
    # p <= 0 becomes 1e-7 which still fires at threshold 0
    probs = np.array([-1.0, 0.0, 0.5])
    got = smoothing.get_laughter_instances(probs, [0.0], [0.0], fps=100.0)
    assert got[(0.0, 0.0)] == [(0.0, 0.02)]
    # p > 1 clamps to 1, which does NOT fire at threshold 1
    probs = np.array([2.0, 2.0])
    got = smoothing.get_laughter_instances(probs, [1.0], [0.0], fps=100.0)
    assert got[(1.0, 0.0)] == []


def test_single_frame_run_has_zero_length():
    # a single frame yields span (i/fps, i/fps) -> filtered by min_length > 0
    probs = np.zeros(10)
    probs[4] = 0.9
    got = smoothing.get_laughter_instances(probs, [0.5], [0.0, 0.1], fps=100.0)
    assert got[(0.5, 0.0)] == []  # 0-length: e - s = 0 is not > 0
    assert got[(0.5, 0.1)] == []


def test_windowed_map_covers_all_frames():
    feats = np.arange(25, dtype=np.float32)[:, None] * np.ones(
        (1, 3), dtype=np.float32
    )

    def fn(wins):
        # identify each window by its first frame value
        return wins[:, 0, 0]

    out = np.asarray(windows.windowed_map(fn, feats, window=4, chunk=8))
    np.testing.assert_allclose(out, np.arange(25))


def test_windowed_map_tail_is_zero_padded():
    feats = np.ones((10, 2), dtype=np.float32)

    def fn(wins):
        return wins.sum(axis=(1, 2))

    out = np.asarray(windows.windowed_map(fn, feats, window=4, chunk=4))
    # window starting at frame 9 sees frames [9, 0pad, 0pad, 0pad]
    np.testing.assert_allclose(out[9], 2.0)
    np.testing.assert_allclose(out[0], 8.0)


def test_streaming_event_detector_matches_offline(rng):
    """StreamingEventDetector over random chunkings must produce exactly
    get_laughter_instances' events for the same (threshold, min_length),
    including runs spanning chunk boundaries and a run open at stream end."""
    from laughter_detection_icsi_tpu.ops.smoothing import (
        StreamingEventDetector,
        get_laughter_instances,
    )

    for case in range(30):
        t = int(rng.integers(5, 400))
        probs = rng.uniform(0, 1, t).astype(np.float32)
        if case % 3 == 0:
            probs[-max(1, t // 5):] = 0.9  # run open at end of stream
        if case % 4 == 0:
            probs[: max(1, t // 7)] = 0.9  # run open at start
        thr = float(rng.choice([0.2, 0.5, 0.8]))
        min_l = float(rng.choice([0.0, 0.05, 0.2]))
        want = get_laughter_instances(
            probs, thresholds=[thr], min_lengths=[min_l], fps=100.0
        )[(thr, min_l)]

        det = StreamingEventDetector(thr, min_l, fps=100.0)
        got = []
        lo = 0
        while lo < t:
            size = int(rng.integers(1, 60))
            got.extend(det.feed(probs[lo : lo + size]))
            lo += size
        got.extend(det.finish())
        assert got == pytest.approx(want), (case, thr, min_l)


def test_streaming_event_detector_lifecycle():
    from laughter_detection_icsi_tpu.ops.smoothing import StreamingEventDetector

    det = StreamingEventDetector(0.5)
    det.feed(np.asarray([0.9, 0.9]))
    assert det.finish() == []  # 2 frames = 0.01 s, not > 0.2
    with pytest.raises(RuntimeError):
        det.feed(np.asarray([0.1]))
    with pytest.raises(RuntimeError):
        det.finish()


def test_instances_from_device_probs_matches_host(rng):
    """On-device smoothing (jitted run scan + tiny run tables) must return
    exactly the host scan's instance dict, including threshold 0.0 against
    the zero padding and t==0."""
    import jax.numpy as jnp

    from laughter_detection_icsi_tpu.ops.smoothing import (
        get_laughter_instances,
        instances_from_device_probs,
    )

    for case in range(12):
        t = int(rng.integers(0, 900))
        probs = rng.uniform(0, 1, t).astype(np.float32)
        thresholds = [0.0, 0.3, 0.7]
        min_lengths = [0.0, 0.1]
        want = get_laughter_instances(
            probs, thresholds=thresholds, min_lengths=min_lengths, fps=100.0
        )
        got = instances_from_device_probs(
            jnp.asarray(probs), thresholds=thresholds,
            min_lengths=min_lengths, fps=100.0,
        )
        assert got == want, case


def test_instances_from_device_probs_overflow_fallback(rng):
    """More runs than max_events -> that threshold falls back to the
    unbounded host scan (still exact)."""
    import jax.numpy as jnp

    from laughter_detection_icsi_tpu.ops.smoothing import (
        get_laughter_instances,
        instances_from_device_probs,
    )

    probs = np.tile(np.asarray([0.9, 0.9, 0.1], np.float32), 300)  # 300 runs
    want = get_laughter_instances(probs, thresholds=[0.5], min_lengths=[0.0])
    got = instances_from_device_probs(
        jnp.asarray(probs), thresholds=[0.5], min_lengths=[0.0], max_events=64
    )
    assert got == want
    assert len(got[(0.5, 0.0)]) == 300  # 2-frame runs survive strict > 0.0


def test_host_threshold_comparison_is_float32():
    """A prob bit-equal to float32(thr) must classify the same whatever
    numeric type the threshold arrives as: the device path compares in
    float32, so the host paths must too (float64 promotion made
    float32(0.3) read as above-threshold on host only, shifting run
    boundaries for the max_events overflow fallback)."""
    p = np.float32(0.3)  # == float32(0.3); > 0.3 when promoted to float64
    probs = np.array([0.0, p, p, p, 0.0], np.float32)
    for t in (0.3, np.float64(0.3), np.float32(0.3)):
        inst = smoothing.get_laughter_instances(
            probs, thresholds=[t], min_lengths=[0.0], fps=100.0
        )
        assert inst[(float(t), 0.0)] == []  # strict >, equal in float32
        det = smoothing.StreamingEventDetector(t, min_length=0.0, fps=100.0)
        events = det.feed(probs) + det.finish()
        assert events == []

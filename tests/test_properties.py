"""Randomized property tests against brute-force oracles.

The eval core's precision/recall numbers hinge on exact integer interval
algebra at 1 ms resolution (reference analysis/preprocess.py:27-46 built on
the `portion` library; SURVEY.md §7.3 "off-by-one at boundaries shifts
precision/recall"), and the segmenter's run-length scan must match a naive
frame loop (reference laugh_segmenter.py:74-111).  These tests compare both
against set-of-integers / pure-Python oracles over hundreds of random cases.
"""

import numpy as np
import pytest

from laughter_detection_icsi_tpu.eval.intervals import IntervalSet
from laughter_detection_icsi_tpu.ops import smoothing

UNIVERSE = 60


def _random_set(rng) -> IntervalSet:
    n = int(rng.integers(0, 6))
    pairs = []
    for _ in range(n):
        a = int(rng.integers(0, UNIVERSE))
        b = int(rng.integers(0, UNIVERSE))
        if a != b:
            pairs.append((min(a, b), max(a, b)))
    return IntervalSet.from_pairs(pairs)


def _as_points(s: IntervalSet) -> set:
    return {p for a, b in s.pairs() for p in range(a, b)}


def test_interval_algebra_vs_integer_sets(rng):
    for case in range(300):
        a, b = _random_set(rng), _random_set(rng)
        pa, pb = _as_points(a), _as_points(b)
        assert _as_points(a.union(b)) == pa | pb, (a, b)
        assert _as_points(a.intersection(b)) == pa & pb, (a, b)
        assert _as_points(a.difference(b)) == pa - pb, (a, b)
        assert a.length() == len(pa)
        assert a.overlaps(b) == bool(pa & pb)
        assert a.contains(b) == (pb <= pa)
        # canonicalization: atoms are disjoint, sorted, non-empty
        pairs = list(a.pairs())
        assert all(x < y for x, y in pairs)
        assert all(pairs[i][1] < pairs[i + 1][0] for i in range(len(pairs) - 1))


def _oracle_instances(probs, threshold, min_length, fps):
    """Frame-by-frame transliteration of reference laugh_segmenter.py:74-111:
    strict > threshold grouping, an instance spans (first_frame, LAST_frame)
    / fps (not last+1 — reference collapse_to_start_and_end_frame), and a
    strict > min_length filter."""
    instances = []
    start = None
    for i, p in enumerate(probs):
        if p > threshold and start is None:
            start = i
        elif p <= threshold and start is not None:
            instances.append((start / fps, (i - 1) / fps))
            start = None
    if start is not None:
        instances.append((start / fps, (len(probs) - 1) / fps))
    return [
        (round(a, 4), round(b, 4))
        for a, b in instances
        if (b - a) > min_length
    ]


def test_run_length_instances_vs_frame_loop(rng):
    fps = 100.0
    for case in range(120):
        n = int(rng.integers(1, 400))
        probs = rng.uniform(0, 1, n).astype(np.float32)
        # sprinkle exact-threshold values to pin the strict-> semantics
        probs[rng.uniform(size=n) < 0.1] = 0.5
        got = smoothing.get_laughter_instances(
            probs, thresholds=[0.5], min_lengths=[0.0, 0.2], fps=fps
        )
        for min_len in (0.0, 0.2):
            want = _oracle_instances(probs, 0.5, min_len, fps)
            have = [(round(a, 4), round(b, 4)) for a, b in got[(0.5, min_len)]]
            assert have == want, (case, min_len)


def test_fix_over_underflow_matches_reference(rng):
    # reference laugh_segmenter.py:57-71: p <= 0 -> 1e-7, p > 1 -> exactly 1
    probs = np.asarray([-0.5, 0.0, 1e-9, 0.3, 1.0, 1.5], np.float32)
    fixed = np.asarray(smoothing.fix_over_underflow(probs))
    assert fixed[0] == pytest.approx(1e-7)
    assert fixed[1] == pytest.approx(1e-7)
    assert fixed[2] == pytest.approx(1e-9)  # > 0 passes through untouched
    assert fixed[3] == pytest.approx(0.3)
    assert fixed[4] == 1.0
    assert fixed[5] == 1.0
    assert np.all((fixed > 0) & (fixed <= 1))


def test_pcm_pack_roundtrip_property(rng):
    """Packed-PCM codec (ops/pcm_pack.py): for random mixed-regime signals,
    every mode x packer combination must round-trip bit-exactly, the
    stream must be exactly word-aligned per block (sum(widths) * BLOCK/32
    words), and 'auto' must never be larger than the better forced mode."""
    import jax

    from laughter_detection_icsi_tpu.ops import pcm_pack
    from laughter_detection_icsi_tpu.runtime import native

    have_native = native._get_pack_lib() is not None
    for case in range(40):
        n = int(rng.integers(1, 3 * pcm_pack.BLOCK))
        kind = case % 4
        if kind == 0:
            wave = rng.integers(-32768, 32768, n)
        elif kind == 1:
            wave = np.cumsum(rng.integers(-200, 201, n)).clip(-32768, 32767)
        elif kind == 2:
            wave = np.zeros(n)
            lo = int(rng.integers(0, n))
            wave[lo:] = rng.integers(-50, 50, n - lo)
        else:
            wave = np.full(n, int(rng.integers(-32768, 32768)))
        wave = wave.astype(np.int16)

        sizes = {}
        for mode in ("auto", "delta", "direct"):
            for use_native in ([True, False] if have_native else [False]):
                p = pcm_pack.pack_pcm(wave, mode=mode, use_native=use_native)
                n_words = int(p.widths.sum()) * pcm_pack.BLOCK // 32
                assert n_words + 1 <= len(p.words)
                assert not p.words[n_words:].any()
                out = jax.jit(
                    lambda w, wd, d=p.delta: pcm_pack.unpack_pcm(
                        w, wd, n=len(wave), delta=d
                    )
                )(p.words, p.widths)
                np.testing.assert_array_equal(np.asarray(out), wave.astype(np.int32))
                sizes[(mode, use_native)] = int(p.widths.sum())
        for use_native in ([True, False] if have_native else [False]):
            assert sizes[("auto", use_native)] == min(
                sizes[("delta", use_native)], sizes[("direct", use_native)]
            )


def test_textgrid_roundtrip_property(rng, tmp_path):
    """Random disjoint (sometimes touching) laugh instances round-trip
    through write_textgrid/read_laughter_intervals with counts and times
    preserved (touching events stay distinct; only overlaps merge)."""
    from laughter_detection_icsi_tpu.eval import textgrid as tg

    for case in range(60):
        # build sorted disjoint instances with random gaps (gap 0 = touching)
        cursor = 0.0
        instances = []
        for _ in range(int(rng.integers(0, 6))):
            gap = float(rng.choice([0.0, 0.25, 1.0]))
            cursor += gap
            dur = float(rng.integers(1, 30)) / 10.0
            instances.append((round(cursor, 2), round(cursor + dur, 2)))
            cursor += dur
        xmax = cursor + float(rng.uniform(0, 2))
        path = tmp_path / f"p{case}.TextGrid"
        tg.write_textgrid(str(path), instances, xmax=round(xmax, 2))
        got = tg.read_laughter_intervals(str(path))
        # the first instance may start at 0 (no leading gap interval)
        assert len(got) == len(instances), (case, instances, got)
        for (a, b), (ga, gb) in zip(instances, got):
            assert abs(a - ga) < 1e-9 and abs(b - gb) < 1e-9


def test_frame_waveform_matches_manual_striding(rng):
    """For random legal Kaldi geometries (incl. odd shifts and short-frame
    flen <= 2*shift), frame i of the featurizer equals the manual slice of
    the symmetric-padded (and tail-truncated) waveform."""
    import dataclasses

    import jax.numpy as jnp

    from laughter_detection_icsi_tpu.config import FEAT
    from laughter_detection_icsi_tpu.ops import fbank as fb

    for fps in (50, 100, 200, 320, 3200):
        cfg = dataclasses.replace(FEAT, num_samples=fps)
        shift = cfg.frame_shift_samples
        flen = cfg.frame_length_samples
        for _ in range(4):
            n = int(rng.integers(flen, flen + 40 * shift))
            wave = (rng.standard_normal(n) * 0.1).astype(np.float32)
            t = fb.num_frames(n, cfg)
            left, right = fb.pad_amounts(n, cfg)
            manual = np.pad(
                wave[: n + right] if right < 0 else wave,
                (left, max(right, 0)),
                mode="symmetric",
            )
            frames = np.asarray(fb.frame_waveform(jnp.asarray(wave), cfg))
            assert frames.shape == (t, flen)
            for i in (0, t // 2, t - 1):
                np.testing.assert_array_equal(
                    frames[i], manual[i * shift : i * shift + flen], err_msg=f"fps={fps} n={n} i={i}"
                )


def test_laugh_match_accounting_closure_property(rng):
    """For RANDOM ground-truth partitions and prediction sets, laugh_match's
    false-positive attribution must close: correct + speech + noise +
    silence == predicted time (after invalid subtraction), to < 1 ms."""
    from laughter_detection_icsi_tpu.eval import analyse as an
    from laughter_detection_icsi_tpu.eval.indices import Index, IndexStore

    U = 2000  # frames (2 s at 1 ms)
    for case in range(40):
        # random ground truth: partition [0, U) into laugh/speech/noise,
        # silence = remainder; plus a random invalid set
        marks = sorted(set(int(rng.integers(0, U)) for _ in range(8)) | {0, U})
        kinds = [int(rng.integers(0, 4)) for _ in range(len(marks) - 1)]
        sets = {k: [] for k in range(4)}  # 0 laugh, 1 speech, 2 noise, 3 silence
        for (a, b), k in zip(zip(marks, marks[1:]), kinds):
            if a < b:
                sets[k].append((a, b))

        def mk(pairs):
            idx = Index()
            idx.ensure_meeting("M")
            if pairs:
                idx.add_many("M", "p", [(a / 1000.0, b / 1000.0) for a, b in pairs])
            return idx

        inv_pairs = [
            (int(x), int(x) + int(rng.integers(1, 50)))
            for x in rng.integers(0, U - 50, size=int(rng.integers(0, 3)))
        ]
        idx = IndexStore(
            laugh=mk(sets[0]), invalid=mk(inv_pairs), speech=mk(sets[1]),
            noise=mk(sets[2]), silence=mk(sets[3]),
        )
        pred_pairs = []
        for _ in range(int(rng.integers(0, 5))):
            a = int(rng.integers(0, U - 1))
            b = a + int(rng.integers(1, 200))
            pred_pairs.append((min(a, U), min(b, U)))
        pred = IntervalSet.from_pairs(pred_pairs)
        corr, incorr, speech, noise, silence = an.laugh_match(pred, "M", "p", idx)
        # invalid-subtracted prediction time fully attributed
        assert corr + incorr >= -1e-9
        assert abs(incorr - (speech + noise + silence)) < 0.001, case


def test_streaming_random_chunk_splits(rng):
    """Streaming == offline for RANDOM chunk split points (not just uniform
    sizes), including empty chunks."""
    import jax

    from laughter_detection_icsi_tpu import inference, models

    model = models.build(
        "ResNetBigger", dropout_rate=0.0, linear_layer_size=24,
        filter_sizes=(8, 8, 8, 8),
    )
    params, state = model.init(jax.random.PRNGKey(7))
    pipe = inference.LaughterPipeline(
        model, params, state,
        settings=inference.InferenceSettings(chunk=256, bucket_frames=512),
    )
    n = 16000 * 7 + 531
    wave = (rng.standard_normal(n) * 0.1).astype(np.float32)
    want = pipe.probs_for_waveform(wave)
    for case in range(3):
        cuts = sorted(set(int(x) for x in rng.integers(0, n, size=12)) | {0, n})
        sess = inference.StreamingSession(pipe)
        outs = []
        for a, b in zip(cuts, cuts[1:]):
            outs.append(sess.feed(wave[a:b]))
            if case == 0:
                outs.append(sess.feed(wave[0:0]))  # empty chunks are no-ops
        outs.append(sess.finish())
        np.testing.assert_array_equal(np.concatenate(outs), want, err_msg=str(cuts))

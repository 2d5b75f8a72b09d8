"""Shared-stem sliding-window inference (models/shared_stem.py) must be
bit-exact against the naive per-window forward: the whole-track stems only
replace computation at rows whose values are mathematically identical
(window interiors), and the per-window edge bands reproduce the window's
own zero padding conv-for-conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laughter_detection_icsi_tpu import inference, models
from laughter_detection_icsi_tpu.models import shared_stem
from laughter_detection_icsi_tpu.ops import windows

CASES = [
    ("ResNetBigger", dict(linear_layer_size=24, filter_sizes=(8, 8, 8, 8))),
    # (8,...) plan puts a 1x1 shortcut in stage 1 (64 -> 8 at stride 1);
    # NoBN covers the bn-free family member.
    ("ResNetNoBN", dict(linear_layer_size=48)),
]


def _model_with_stats(name, kw, rng):
    model = models.build(name, dropout_rate=0.0, **kw)
    params, state = model.init(jax.random.PRNGKey(0))
    # Randomize BN running stats so eval-mode BN is non-trivial.
    state = jax.tree_util.tree_map(
        lambda x: x + 0.1 * jnp.asarray(rng.standard_normal(x.shape), x.dtype)
        if x.ndim
        else x,
        state,
    )
    return model, params, state


@pytest.mark.parametrize("name,kw", CASES)
def test_track1_matches_naive(rng, name, kw):
    model, params, state = _model_with_stats(name, kw, rng)
    T, count = 300, 16
    feats = jnp.asarray(rng.standard_normal((T, 44)), jnp.float32)
    track1 = shared_stem.stem_track(params, state, feats)
    for start in (0, 7, T - 100 - count):  # includes track-edge windows
        got = shared_stem.chunk_probs_from_track(
            params, state, track1, feats, jnp.asarray(start), count
        )
        wins = windows.extract_windows(feats, jnp.asarray(start), count)[:, None]
        want, _ = model.apply(params, state, wins, train=False)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("name,kw", CASES)
def test_track2_matches_naive(rng, name, kw):
    model, params, state = _model_with_stats(name, kw, rng)
    T, count = 300, 16
    feats = jnp.asarray(rng.standard_normal((T, 44)), jnp.float32)
    track1 = shared_stem.stem_track(params, state, feats)
    track2 = shared_stem.stem_track2(params, state, track1)
    assert shared_stem.supports_track2(100)
    for start in (0, 7, T - 100 - count):
        got = shared_stem.chunk_probs_from_track2(
            params, state, track1, track2, feats, jnp.asarray(start), count
        )
        wins = windows.extract_windows(feats, jnp.asarray(start), count)[:, None]
        want, _ = model.apply(params, state, wins, train=False)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_supports_track2_guards():
    assert not shared_stem.supports_track2(99)  # odd: stride-2 phase varies
    assert not shared_stem.supports_track2(24)  # no interior at half res
    assert shared_stem.supports_track2(26)


def test_pipeline_shared_vs_naive(rng):
    # End-to-end: the pipeline with shared_stem on (the default) must match
    # the naive window batch bit-for-bit in float32.
    model = models.build(
        "ResNetBigger", dropout_rate=0.0, linear_layer_size=24,
        filter_sizes=(8, 8, 8, 8),
    )
    params, state = model.init(jax.random.PRNGKey(1))
    wave = (rng.standard_normal(16000 * 2 + 777) * 0.1).astype(np.float32)
    base = dict(chunk=128, bucket_frames=256)
    fast = inference.LaughterPipeline(
        model, params, state,
        settings=inference.InferenceSettings(**base, shared_stem=True),
    )
    naive = inference.LaughterPipeline(
        model, params, state,
        settings=inference.InferenceSettings(**base, shared_stem=False),
    )
    a = fast.probs_for_waveform(wave)
    b = naive.probs_for_waveform(wave)
    np.testing.assert_array_equal(a, b)


def test_nobn_empty_state_tree(rng):
    """A torch-imported (or checkpoint-round-tripped) ResNetNoBN has state
    == {} — no buffers, and flatten_tree drops empty skeletons.  The
    shared-stem fast path (auto-enabled for ResNetNoBN) must handle it
    like zoo.apply_fn does, not KeyError."""
    # ResNetNoBN has the fixed reference filter plan -> 48 flat features
    model = models.build("ResNetNoBN", dropout_rate=0.0, linear_layer_size=48)
    params, _skel = model.init(jax.random.PRNGKey(0))
    state = {}  # what from_torch_state_dict / load_checkpoint give for NoBN
    T, count = 260, 12
    feats = jnp.asarray(rng.standard_normal((T, 44)), jnp.float32)
    track1 = shared_stem.stem_track(params, state, feats)
    got = shared_stem.chunk_probs_from_track(
        params, state, track1, feats, jnp.asarray(3), count
    )
    wins = windows.extract_windows(feats, jnp.asarray(3), count)[:, None]
    want, _ = model.apply(params, state, wins, train=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # stage-2 sharing too
    track2 = shared_stem.stem_track2(params, state, track1)
    got2 = shared_stem.chunk_probs_from_track2(
        params, state, track1, track2, feats, jnp.asarray(3), count
    )
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(want))


def test_forced_shared_stem_validates():
    # Explicit True on an unsupported configuration must raise clearly, not
    # crash mid-trace or compute garbage bands.
    with pytest.raises(ValueError, match="shared_stem=True requires"):
        shared_stem.resolve_shared_stem(True, "MLPModel", 100)
    with pytest.raises(ValueError, match="window"):
        shared_stem.resolve_shared_stem(True, "ResNetBigger", 10)
    assert shared_stem.resolve_shared_stem(True, "ResNetBigger", 100)
    assert not shared_stem.resolve_shared_stem(None, "MLPModel", 100)
    assert not shared_stem.resolve_shared_stem(False, "ResNetBigger", 100)


def _flat_size(window: int, c: int = 8) -> int:
    """Head linear size for a ResNetBigger with (8,8,8,8) at this window."""
    h = window
    for s in (1, 2, 2, 2):
        h = (h - 1) // s + 1
    return c * (h // 4)


@pytest.mark.parametrize("window", [26, 28, 34])
def test_track2_matches_naive_general_windows(rng, window):
    """The band/splice formulas are window-dependent (blo, strip lengths,
    t0pad phase); pinning only window=100 would let an edit that is right
    at 100 but wrong elsewhere ship silently-wrong probabilities."""
    model = models.build(
        "ResNetBigger", dropout_rate=0.0,
        linear_layer_size=_flat_size(window), filter_sizes=(8, 8, 8, 8),
    )
    params, state = model.init(jax.random.PRNGKey(1))
    assert shared_stem.supports_track2(window)
    T, count = 120, 8
    feats = jnp.asarray(rng.standard_normal((T, 44)), jnp.float32)
    track1 = shared_stem.stem_track(params, state, feats)
    track2 = shared_stem.stem_track2(params, state, track1)
    for start in (0, 3, T - window - count):
        got = shared_stem.chunk_probs_from_track2(
            params, state, track1, track2, feats,
            jnp.asarray(start), count, window=window,
        )
        wins = windows.extract_windows(
            feats, jnp.asarray(start), count, window
        )[:, None]
        want, _ = model.apply(params, state, wins, train=False)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_track1_matches_naive_odd_window(rng):
    """track1 sharing has no evenness requirement; pin an odd window."""
    window = 27
    model = models.build(
        "ResNetBigger", dropout_rate=0.0,
        linear_layer_size=_flat_size(window), filter_sizes=(8, 8, 8, 8),
    )
    params, state = model.init(jax.random.PRNGKey(2))
    T, count = 90, 8
    feats = jnp.asarray(rng.standard_normal((T, 44)), jnp.float32)
    track1 = shared_stem.stem_track(params, state, feats)
    got = shared_stem.chunk_probs_from_track(
        params, state, track1, feats, jnp.asarray(5), count, window
    )
    wins = windows.extract_windows(feats, jnp.asarray(5), count, window)[:, None]
    want, _ = model.apply(params, state, wins, train=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_track2_rejects_unsupported_windows(rng):
    """An odd window runs CLEAN through track2 splicing (shapes coincide)
    and returns silently wrong probabilities; small even windows wrap the
    bottom-strip gather to the track end — both must raise."""
    model = models.build(
        "ResNetBigger", dropout_rate=0.0,
        linear_layer_size=24, filter_sizes=(8, 8, 8, 8),
    )
    params, state = model.init(jax.random.PRNGKey(3))
    feats = jnp.asarray(rng.standard_normal((200, 44)), jnp.float32)
    track1 = shared_stem.stem_track(params, state, feats)
    track2 = shared_stem.stem_track2(params, state, track1)
    for bad in (27, 24):
        with pytest.raises(ValueError, match="supports_track2"):
            shared_stem.chunk_probs_from_track2(
                params, state, track1, track2, feats,
                jnp.asarray(0), 4, window=bad,
            )


@pytest.mark.parametrize("name,kw", CASES)
def test_multichannel_matches_per_channel(rng, name, kw):
    """chunk_probs_multichannel_from_track == per-channel single-track
    calls, channel-major order — the contract the sharded batched graph
    relies on (the per-channel gather formulation exists because TPU
    gathers collapse 13.6x on channel-flattened operands)."""
    model, params, state = _model_with_stats(name, kw, rng)
    C, T, chunk = 3, 260, 8
    feats = jnp.asarray(rng.standard_normal((C, T, 44)), jnp.float32)
    tracks = jnp.stack(
        [shared_stem.stem_track(params, state, feats[c]) for c in range(C)]
    )
    for start in (0, 5, T - 100 - chunk):
        got = shared_stem.chunk_probs_multichannel_from_track(
            params, state, tracks, feats, jnp.asarray(start), chunk
        )
        want = jnp.concatenate(
            [
                shared_stem.chunk_probs_from_track(
                    params, state, tracks[c], feats[c], jnp.asarray(start), chunk
                )
                for c in range(C)
            ]
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
        )


def test_multichannel_track2_matches_per_channel(rng):
    model, params, state = _model_with_stats(*CASES[0], rng)
    C, T, chunk = 2, 260, 8
    feats = jnp.asarray(rng.standard_normal((C, T, 44)), jnp.float32)
    t1 = jnp.stack(
        [shared_stem.stem_track(params, state, feats[c]) for c in range(C)]
    )
    t2 = jnp.stack(
        [shared_stem.stem_track2(params, state, t1[c]) for c in range(C)]
    )
    got = shared_stem.chunk_probs_multichannel_from_track2(
        params, state, t1, t2, feats, jnp.asarray(3), chunk
    )
    want = jnp.concatenate(
        [
            shared_stem.chunk_probs_from_track2(
                params, state, t1[c], t2[c], feats[c], jnp.asarray(3), chunk
            )
            for c in range(C)
        ]
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
    )


def test_multichannel_track2_rejects_unsupported_window():
    import jax.numpy as jnp2

    with pytest.raises(ValueError, match="supports_track2"):
        shared_stem.chunk_probs_multichannel_from_track2(
            {}, {}, jnp2.zeros((1, 50, 8, 44)), jnp2.zeros((1, 25, 8, 22)),
            jnp2.zeros((1, 50, 44)), jnp2.asarray(0), 4, window=13
        )

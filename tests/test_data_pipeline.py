"""Data pipeline: feature cache bucketing parity, cut/pad semantics,
data_df sampling invariants, dataset batching."""

import numpy as np
import pandas as pd
import pytest

from laughter_detection_icsi_tpu.config import ANALYSIS, PARTITIONS
from laughter_detection_icsi_tpu.data import (
    DataFrameSampler,
    FeatureCache,
    LadDataset,
    audio,
    compute_track_features,
    write_data_dfs,
)
from laughter_detection_icsi_tpu.eval import indices as indices_lib
from laughter_detection_icsi_tpu.eval import transcript as transcript_lib
from laughter_detection_icsi_tpu.eval.intervals import IntervalSet, to_frames
from laughter_detection_icsi_tpu.ops import fbank as fb


@pytest.fixture(scope="module")
def store(synthetic_corpus):
    return transcript_lib.TranscriptStore(str(synthetic_corpus.transcript_dir))


@pytest.fixture(scope="module")
def idx(store):
    return indices_lib.build_indices(store)


# --------------------------------------------------------------------------- #
# Feature cache
# --------------------------------------------------------------------------- #


def test_bucketed_features_match_direct(rng):
    wave = (rng.standard_normal(16000 * 4 + 321) * 0.1).astype(np.float32)
    direct = np.asarray(fb.fbank_jit(wave))
    bucketed = compute_track_features(wave, bucket_frames=150)
    assert bucketed.shape == direct.shape
    np.testing.assert_allclose(bucketed, direct, rtol=1e-4, atol=1e-5)


def test_cache_roundtrip_and_cut(tmp_path, rng):
    cache = FeatureCache(str(tmp_path / "cache"))
    wave = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    feats = cache.add_track("Btr001", "chan0", wave)
    assert cache.has("Btr001", "chan0")
    # fresh instance reads the manifest from disk
    cache2 = FeatureCache(str(tmp_path / "cache"))
    track = cache2.track("Btr001", "chan0")
    np.testing.assert_array_equal(np.asarray(track), feats)

    # interior cut: exact slice
    cut = cache2.cut("Btr001", "chan0", 1.0, 1.0, pad_to_frames=100)
    np.testing.assert_array_equal(cut, feats[100:200])
    # short cut: right-padded with zeros (reference 1.0 s pad semantics)
    cut = cache2.cut("Btr001", "chan0", 2.5, 0.3, pad_to_frames=100)
    np.testing.assert_array_equal(cut[:30], feats[250:280])
    assert np.all(cut[30:] == 0)
    # cut at the very end of the track: track exhausts, pad the rest
    cut = cache2.cut("Btr001", "chan0", 2.95, 1.0, pad_to_frames=100)
    assert cut.shape == (100, feats.shape[1])


def test_cache_retrack_invalidates_mmap(tmp_path, rng):
    """Re-adding a track must drop the cached mmap — a stale view keeps the
    old shape and silently reads zeros/garbage past the new file's end."""
    cache = FeatureCache(str(tmp_path / "cache"))
    wave = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    cache.add_track("Btr001", "chan0", wave)
    _ = cache.track("Btr001", "chan0")  # populate the mmap cache
    short = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    feats = cache.add_track("Btr001", "chan0", short)
    track = cache.track("Btr001", "chan0")
    assert track.shape == feats.shape
    np.testing.assert_array_equal(np.asarray(track), feats)


def test_track_features_snip_edges_cfg(rng):
    """A cfg already in snip_edges=True mode needs no padding — pad_amounts
    would return a negative right pad and crash np.pad."""
    import dataclasses

    from laughter_detection_icsi_tpu.config import FEAT

    cfg = dataclasses.replace(FEAT, snip_edges=True)
    wave = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    got = compute_track_features(wave, cfg, bucket_frames=37)
    direct = np.asarray(fb.fbank_jit(wave, cfg))
    assert got.shape == direct.shape
    np.testing.assert_allclose(got, direct, rtol=1e-4, atol=1e-5)


def test_cache_missing_track_raises(tmp_path):
    cache = FeatureCache(str(tmp_path / "empty"))
    with pytest.raises(KeyError, match="not in feature cache"):
        cache.track("Bxx001", "chan0")


def test_cache_rejects_wrong_sample_rate(tmp_path, rng):
    p = str(tmp_path / "x.wav")
    audio.write_wav(p, rng.standard_normal(8000).astype(np.float32) * 0.1, 8000)
    cache = FeatureCache(str(tmp_path / "cache"))
    with pytest.raises(ValueError, match="sample rate"):
        cache.add_audio_file("Bxx001", "chan0", p)


# --------------------------------------------------------------------------- #
# Sampler
# --------------------------------------------------------------------------- #


def test_sampler_structured(store, idx):
    sampler = DataFrameSampler(store, idx)
    dfs = sampler.create_data_dfs(num_laugh_samples=2, num_non_laugh_samples=10)
    # Samples are drawn per laugh_only_df row — which includes breath-laughs
    # and too-short laughs (the reference samples the raw laugh table, not
    # the validity-filtered index; reference create_data_df.py:110):
    # Btr001 (train) has 4 LAUGH-typed segments, Bmr021 (dev) has 2.
    assert len(dfs["test"]) == 0
    for split, n_laughs in (("train", 4), ("dev", 2)):
        df = dfs[split]
        laugh = df[df.label == 1]
        non = df[df.label == 0]
        assert len(laugh) == n_laughs * 2
        assert len(non) == n_laughs * 10
        # every subsample lies inside its segment and is <= 1 s
        assert (df.sub_start >= df.start - 0.005).all()
        assert (
            df.sub_start + df.sub_duration <= df.start + df.duration + 0.005
        ).all()
        assert (df.sub_duration <= ANALYSIS.subsample_duration + 1e-9).all()


def test_sampler_silence_really_silent(store, idx):
    sampler = DataFrameSampler(store, idx)
    dfs = sampler.create_data_dfs(num_laugh_samples=1, num_non_laugh_samples=10)
    # 7 of 10 non-laugh samples are silence; ALL non-laugh rows must avoid
    # the laugh index entirely
    for split in ("train", "dev"):
        non = dfs[split][dfs[split].label == 0]
        for _, row in non.iterrows():
            part = store.chan_to_part[row.meeting_id][row.chan_id]
            seg = IntervalSet.closed(
                to_frames(row.sub_start), to_frames(row.sub_start + row.sub_duration)
            )
            laughs = idx.laugh.get(row.meeting_id, part)
            assert not laughs.overlaps(seg), (row.meeting_id, part, row.sub_start)


def test_sampler_deterministic(store, idx):
    a = DataFrameSampler(store, idx).create_data_dfs(1, 3)
    b = DataFrameSampler(store, idx).create_data_dfs(1, 3)
    for split in PARTITIONS:
        pd.testing.assert_frame_equal(a[split], b[split])


def test_sampler_random_mode(store, idx):
    """RANDOM_SELECTION mode (reference create_data_df.py:32-63,144-147):
    every negative is a rejection-sampled segment that avoids the laugh AND
    invalid indices of its own channel, duration floored at the 1 s
    subsample, deterministic under the fixed seed."""
    sampler = DataFrameSampler(store, idx)
    dfs = sampler.create_data_dfs(
        num_laugh_samples=1, num_non_laugh_samples=5, random=True
    )
    for split, n_laughs in (("train", 4), ("dev", 2)):
        df = dfs[split]
        non = df[df.label == 0]
        assert len(non) == n_laughs * 5
        assert (non.duration >= ANALYSIS.subsample_duration - 1e-9).all()
        for _, row in non.iterrows():
            part = store.chan_to_part[row.meeting_id][row.chan_id]
            # 0.01 inset: the emitted floats are rounded to 2 decimals, so
            # the nominal boundary can sit up to 5 ms past the segment the
            # rejection test actually cleared.
            seg = IntervalSet.closed(
                to_frames(row.start + 0.01),
                to_frames(row.start + row.duration - 0.01),
            )
            assert not idx.laugh.get(row.meeting_id, part).overlaps(seg)
            assert not idx.invalid.get(row.meeting_id, part).overlaps(seg)
    again = DataFrameSampler(store, idx).create_data_dfs(1, 5, random=True)
    for split in PARTITIONS:
        pd.testing.assert_frame_equal(dfs[split], again[split])


def test_sampler_noise_bug_parity_flag(store, idx):
    """noise_from_speech_bug=True reproduces the reference's accidental
    noise-sampled-from-speech draws (SURVEY.md §2.5-3): table shapes match
    the fixed sampler's, but the noise rows come from a different source
    table, so the train split must differ."""
    a = DataFrameSampler(store, idx).create_data_dfs(1, 10)
    b = DataFrameSampler(store, idx, noise_from_speech_bug=True).create_data_dfs(
        1, 10
    )
    for split in ("train", "dev"):
        assert len(a[split]) == len(b[split])
        assert list(a[split].label) == list(b[split].label)
    # Btr001 (train) has real noise segments; the bug swaps them for speech
    assert not a["train"].equals(b["train"])


def test_sampler_meeting_filter(store, idx):
    dfs = DataFrameSampler(store, idx).create_data_dfs(1, 1, meeting_id="Bmr021")
    assert len(dfs["train"]) == 0
    assert len(dfs["dev"]) > 0


def test_write_data_dfs(store, idx, tmp_path):
    dfs = DataFrameSampler(store, idx).create_data_dfs(1, 1)
    write_data_dfs(dfs, str(tmp_path))
    got = pd.read_csv(tmp_path / "dev_df.csv")
    assert list(got.columns) == [
        "start", "duration", "sub_start", "sub_duration",
        "audio_path", "meeting_id", "chan_id", "label",
    ]


# --------------------------------------------------------------------------- #
# Dataset batching
# --------------------------------------------------------------------------- #


@pytest.fixture(scope="module")
def populated_cache(tmp_path_factory, store, idx):
    root = tmp_path_factory.mktemp("feats")
    cache = FeatureCache(str(root))
    gen = np.random.default_rng(5)
    for _, row in store.info_df.iterrows():
        wave = (gen.standard_normal(int(row.length * 16000)) * 0.1).astype(np.float32)
        cache.add_track(row.meeting_id, row.chan_id, wave)
    return cache


def test_dataset_batches(store, idx, populated_cache):
    dfs = DataFrameSampler(store, idx).create_data_dfs(2, 4)
    ds = LadDataset(dfs["train"], populated_cache)
    batches = list(ds.batches(batch_size=4, seed=1))
    assert sum(b["inputs"].shape[0] for b in batches) == len(ds)
    b = batches[0]
    assert b["inputs"].shape[1:] == (100, 44)
    assert b["inputs"].dtype == np.float32
    assert set(np.unique(b["is_laugh"])) <= {0.0, 1.0}
    assert (b["input_lens"] > 0).all() and (b["input_lens"] <= 100).all()

    # drop_remainder yields only full batches
    full = list(ds.batches(batch_size=4, drop_remainder=True))
    assert all(b["inputs"].shape[0] == 4 for b in full)

    # deterministic under the same seed, different under another
    again = list(ds.batches(batch_size=4, seed=1))
    np.testing.assert_array_equal(batches[0]["inputs"], again[0]["inputs"])


def test_dataset_features_match_cache(store, idx, populated_cache):
    dfs = DataFrameSampler(store, idx).create_data_dfs(1, 1)
    ds = LadDataset(dfs["dev"], populated_cache)
    ex = ds.example(0)
    row = ds.df.iloc[0]
    want = populated_cache.cut(
        row.meeting_id, row.chan_id, row.sub_start, row.sub_duration, pad_to_frames=100
    )
    np.testing.assert_array_equal(ex["inputs"], want)


def test_vectorized_batches_match_examples(tmp_path, rng):
    # The fancy-indexed batch assembly must equal the per-row example()
    # path exactly, including short cuts, track-end clipping, and padding.
    from laughter_detection_icsi_tpu.data.dataset import LadDataset
    from laughter_detection_icsi_tpu.data.feature_cache import FeatureCache

    cache = FeatureCache(cache_dir=str(tmp_path / "fc"))
    cache.add_track("M0", "chan0", (rng.standard_normal(16000 * 4) * 0.1).astype(np.float32))
    cache.add_track("M0", "chan1", (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32))
    rows = []
    for i in range(37):
        rows.append(dict(
            meeting_id="M0", chan_id=f"chan{i % 2}",
            sub_start=float(rng.uniform(0, 3.8)),
            sub_duration=float(rng.choice([1.0, 0.45, 2.0])),  # short + long cuts
            label=int(rng.integers(2)), start=0.0, duration=1.0,
        ))
    ds = LadDataset(pd.DataFrame(rows), cache)
    for prefetch in (0, 2):
        got = list(ds.batches(8, shuffle=True, seed=3, prefetch=prefetch))
        order = np.arange(len(ds.df))
        np.random.default_rng(3).shuffle(order)
        flat_i = 0
        for batch in got:
            for j in range(len(batch["is_laugh"])):
                e = ds.example(int(order[flat_i]))
                np.testing.assert_array_equal(batch["inputs"][j], e["inputs"])
                assert batch["input_lens"][j] == e["input_lens"]
                assert batch["is_laugh"][j] == e["is_laugh"]
                flat_i += 1
        assert flat_i == len(ds.df)


def test_resident_dataset_matches_streamed(tmp_path, rng):
    """ResidentLadDataset (features gathered in device HBM) must yield the
    exact same batches, in the same order, as the streamed LadDataset —
    resident and streamed training are the same run."""
    from laughter_detection_icsi_tpu.data.dataset import (
        LadDataset,
        ResidentLadDataset,
    )
    from laughter_detection_icsi_tpu.data.feature_cache import FeatureCache

    cache = FeatureCache(cache_dir=str(tmp_path / "fc"))
    cache.add_track(
        "M0", "chan0", (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    )
    rows = [
        dict(
            meeting_id="M0", chan_id="chan0",
            sub_start=float(rng.uniform(0, 1.9)),
            sub_duration=float(rng.choice([1.0, 0.5])),
            label=int(rng.integers(2)), start=0.0, duration=1.0,
        )
        for _ in range(21)
    ]
    ds = LadDataset(pd.DataFrame(rows), cache)
    est = ResidentLadDataset.estimated_nbytes(ds)
    resident = ResidentLadDataset(ds, assemble_chunk=8)
    assert resident.feats.nbytes == est

    streamed = list(ds.batches(8, shuffle=True, seed=4, prefetch=0))
    dev = list(resident.batches(8, shuffle=True, seed=4))
    assert len(streamed) == len(dev)
    for s, d in zip(streamed, dev):
        np.testing.assert_array_equal(s["inputs"], np.asarray(d["inputs"]))
        np.testing.assert_array_equal(s["input_lens"], np.asarray(d["input_lens"]))
        np.testing.assert_array_equal(s["is_laugh"], np.asarray(d["is_laugh"]))

    # bf16 residency: inputs round-trip through one bfloat16 rounding
    import ml_dtypes

    res16 = ResidentLadDataset(ds, transfer_dtype="bfloat16")
    d16 = next(res16.batches(8, shuffle=False))
    want = streamed_first = next(ds.batches(8, shuffle=False, prefetch=0))
    rounded = want["inputs"].astype(ml_dtypes.bfloat16).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(d16["inputs"]), rounded)


def test_trainer_accepts_resident_batches(tmp_path, rng):
    """A train step fed device-resident batches must match the same step fed
    the streamed numpy batch (same params in, same loss out)."""
    import jax

    from laughter_detection_icsi_tpu import models
    from laughter_detection_icsi_tpu.data.dataset import (
        LadDataset,
        ResidentLadDataset,
    )
    from laughter_detection_icsi_tpu.data.feature_cache import FeatureCache
    from laughter_detection_icsi_tpu.train.loop import Trainer

    cache = FeatureCache(cache_dir=str(tmp_path / "fc"))
    cache.add_track(
        "M0", "chan0", (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    )
    rows = [
        dict(meeting_id="M0", chan_id="chan0", sub_start=0.1 * i,
             sub_duration=1.0, label=i % 2, start=0.0, duration=1.0)
        for i in range(8)
    ]
    ds = LadDataset(pd.DataFrame(rows), cache)
    model = models.build(
        "ResNetBigger", dropout_rate=0.0, linear_layer_size=24,
        filter_sizes=(8, 8, 8, 8),
    )
    trainer = Trainer(model)
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0))
    rng_step = jax.random.PRNGKey(1)

    sb = next(ds.batches(8, shuffle=False, prefetch=0))
    resident = ResidentLadDataset(ds)
    db = next(resident.batches(8, shuffle=False))
    _, _, _, m_stream = trainer.train_batch(params, state, opt_state, sb, rng_step)
    _, _, _, m_dev = trainer.train_batch(params, state, opt_state, db, rng_step)
    np.testing.assert_allclose(
        float(m_stream["loss"]), float(m_dev["loss"]), rtol=0, atol=0
    )

    # Eval: the fused resident gather+eval dispatch (index_batches through
    # eval_batches — the --device_cache online-validation path) must give
    # the streamed batches' metrics exactly.
    ev_stream = trainer.eval_batches(
        params, state, ds.batches(8, shuffle=False, prefetch=0)
    )
    ev_fused = trainer.eval_batches(
        params, state, resident.index_batches(8, shuffle=False)
    )
    for k in ev_stream:
        assert ev_stream[k] == pytest.approx(ev_fused[k], abs=1e-6), k


def test_zero_frame_track_assembles_as_zeros(tmp_path, rng):
    """A sub-frame-length audio file caches as a (0, F) track; batches
    containing its rows must be all-zero windows (example()'s contract),
    not an IndexError, and ResidentLadDataset must build."""
    from laughter_detection_icsi_tpu.data.dataset import (
        LadDataset,
        ResidentLadDataset,
    )
    from laughter_detection_icsi_tpu.data.feature_cache import FeatureCache

    cache = FeatureCache(cache_dir=str(tmp_path / "fc"))
    cache.add_track("M0", "tiny", np.zeros(50, dtype=np.float32))  # 0 frames
    cache.add_track(
        "M0", "chan0", (rng.standard_normal(16000) * 0.1).astype(np.float32)
    )
    rows = [
        dict(meeting_id="M0", chan_id="tiny", sub_start=0.0,
             sub_duration=1.0, label=1, start=0.0, duration=1.0),
        dict(meeting_id="M0", chan_id="chan0", sub_start=0.0,
             sub_duration=1.0, label=0, start=0.0, duration=1.0),
    ]
    ds = LadDataset(pd.DataFrame(rows), cache)
    batch = next(ds.batches(2, shuffle=False, prefetch=0))
    assert batch["inputs"].shape[0] == 2
    np.testing.assert_array_equal(batch["inputs"][0], 0.0)
    # contract: identical to the per-row example() path
    ex = ds.example(0)
    np.testing.assert_array_equal(batch["inputs"][0], ex["inputs"])
    assert batch["input_lens"][0] == ex["input_lens"]
    assert np.any(batch["inputs"][1] != 0.0)
    res = ResidentLadDataset(ds)  # must build without IndexError
    np.testing.assert_array_equal(np.asarray(res.feats[0]), 0.0)


def test_sampler_missing_meeting_raises_clear_error(synthetic_corpus):
    from laughter_detection_icsi_tpu.data.sampler import DataFrameSampler
    from laughter_detection_icsi_tpu.eval import indices as indices_lib
    from laughter_detection_icsi_tpu.eval import transcript as transcript_lib

    store = transcript_lib.TranscriptStore(str(synthetic_corpus.transcript_dir))
    idx = indices_lib.build_indices(store)
    sampler = DataFrameSampler(store, idx)
    with pytest.raises(RuntimeError, match="Zz9999"):
        sampler.random_non_laugh(1.0, "Zz9999")


def test_trainloop_fused_resident_path(tmp_path, rng):
    """index_batches -> TrainLoop.run_epoch uses the fused single-dispatch
    resident step: losses must be finite, params must move, and the step
    counter must advance once per batch."""
    import jax

    from laughter_detection_icsi_tpu import models
    from laughter_detection_icsi_tpu.data.dataset import (
        LadDataset,
        ResidentLadDataset,
    )
    from laughter_detection_icsi_tpu.data.feature_cache import FeatureCache
    from laughter_detection_icsi_tpu.train.loop import Trainer, TrainLoop

    cache = FeatureCache(cache_dir=str(tmp_path / "fc"))
    cache.add_track(
        "M0", "chan0", (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    )
    rows = [
        dict(meeting_id="M0", chan_id="chan0", sub_start=0.05 * i,
             sub_duration=1.0, label=i % 2, start=0.0, duration=1.0)
        for i in range(12)
    ]
    res = ResidentLadDataset(
        LadDataset(pd.DataFrame(rows), cache)
    )
    model = models.build(
        "ResNetBigger", dropout_rate=0.5, linear_layer_size=24,
        filter_sizes=(8, 8, 8, 8),
    )
    trainer = Trainer(model)
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0))
    p0 = np.asarray(params["conv1"]["weight"]).copy()
    loop = TrainLoop(trainer=trainer, checkpoint_dir=str(tmp_path / "ck"),
                     log_frequency=0)
    params, state, opt_state, mean_loss = loop.run_epoch(
        params, state, opt_state,
        res.index_batches(4, shuffle=True, seed=2),
        rng=jax.random.PRNGKey(3), verbose=False,
    )
    assert loop.global_step == 3  # 12 rows / batch 4
    assert np.isfinite(mean_loss)
    assert not np.array_equal(p0, np.asarray(params["conv1"]["weight"]))


def test_dataset_plan_invalidated_on_retrack(tmp_path, rng):
    """A recomputed track (cache.add_track) must invalidate LadDataset's
    cached gather plan — a stale plan fed old mmaps to batch assembly while
    example() served the new features."""
    import pandas as pd

    from laughter_detection_icsi_tpu.data.dataset import LadDataset

    cache = FeatureCache(str(tmp_path / "fc"))
    w1 = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    cache.add_track("Btr001", "chan0", w1)
    df = pd.DataFrame(
        {
            "start": [0.0], "duration": [1.0], "sub_start": [0.2],
            "sub_duration": [1.0], "audio_path": ["Btr001/chan0.sph"],
            "meeting_id": ["Btr001"], "chan_id": ["chan0"], "label": [1],
        }
    )
    ds = LadDataset(df=df, cache=cache)
    b1 = next(iter(ds.batches(batch_size=1, shuffle=False)))
    w2 = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    feats2 = cache.add_track("Btr001", "chan0", w2)
    b2 = next(iter(ds.batches(batch_size=1, shuffle=False)))
    np.testing.assert_array_equal(b2["inputs"][0], feats2[20:120])
    assert not np.array_equal(b1["inputs"][0], b2["inputs"][0])


def test_cache_has_is_dtype_aware(tmp_path, rng):
    """cache.has(dtype=...) must not treat a float32 cache as satisfying a
    float16 request (rerunning compute_features --dtype float16 silently
    no-op'd)."""
    cache = FeatureCache(str(tmp_path / "fc"))
    wave = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    cache.add_track("Btr001", "chan0", wave)  # float32 default
    assert cache.has("Btr001", "chan0")
    assert cache.has("Btr001", "chan0", dtype=np.float32)
    assert not cache.has("Btr001", "chan0", dtype=np.float16)
    cache.add_track("Btr001", "chan0", wave, dtype=np.float16)
    assert cache.has("Btr001", "chan0", dtype=np.float16)


def test_resident_rejects_unknown_transfer_dtype(store, idx, populated_cache):
    from laughter_detection_icsi_tpu.data.dataset import ResidentLadDataset

    dfs = DataFrameSampler(store, idx).create_data_dfs(1, 1)
    ds = LadDataset(dfs["train"], populated_cache)
    with pytest.raises(ValueError, match="transfer_dtype"):
        ResidentLadDataset(ds, transfer_dtype="bf16")
    with pytest.raises(ValueError, match="transfer_dtype"):
        ResidentLadDataset.estimated_nbytes(ds, transfer_dtype="float16")


def test_sampler_rejects_chan_without_meeting(store, idx):
    with pytest.raises(ValueError, match="meeting_id"):
        DataFrameSampler(store, idx).create_data_dfs(chan_id="chan0")


def test_batches_skip_assembly_placeholders(store, idx, populated_cache):
    """Mid-epoch resume path: skip_assembly yields cheap None placeholders
    for the already-trained prefix, then EXACTLY the batches a full epoch
    would produce from that point (same seed => same order)."""
    dfs = DataFrameSampler(store, idx).create_data_dfs(2, 4)
    ds = LadDataset(dfs["train"], populated_cache)
    for prefetch in (0, 2):
        full = list(ds.batches(4, seed=3, prefetch=prefetch))
        skipped = list(ds.batches(4, seed=3, prefetch=prefetch, skip_assembly=2))
        assert skipped[0] is None and skipped[1] is None
        assert len(skipped) == len(full)
        for a, b in zip(full[2:], skipped[2:]):
            np.testing.assert_array_equal(a["inputs"], b["inputs"])
            np.testing.assert_array_equal(a["is_laugh"], b["is_laugh"])


def test_sampler_group_cache_guards_id_reuse(synthetic_corpus):
    """The per-df group cache keys on id(df); a freed frame's address can
    be reused by a NEW frame, so the cache must verify identity (and pin
    the source df) instead of trusting the bare id."""
    from laughter_detection_icsi_tpu.eval import indices as indices_lib
    from laughter_detection_icsi_tpu.eval import transcript as transcript_lib

    store = transcript_lib.load(str(synthetic_corpus.transcript_dir))
    idx = indices_lib.load(store)
    sampler = DataFrameSampler(store, idx)
    df = store.speech_df
    meeting = df["meeting_id"].iloc[0]
    rows = sampler._meeting_rows(df, meeting)
    assert len(rows)
    # simulate an address collision: a DIFFERENT frame under df's id
    other = df[df["meeting_id"] != meeting]
    sampler._group_cache[id(other)] = (df, {meeting: rows.iloc[0:0]})
    fresh = sampler._meeting_rows(other, meeting)
    # identity check must reject the stale entry and regroup from `other`
    assert fresh.empty
    assert sampler._group_cache[id(other)][0] is other


def test_feature_cache_rejects_other_num_filters(tmp_path, rng):
    """A cache built under one mel-filter count must not satisfy a request
    under another FeatConfig: has() returning True would silently no-op
    the re-featurization and feed wrong-width features downstream."""
    import dataclasses

    from laughter_detection_icsi_tpu.config import FEAT
    from laughter_detection_icsi_tpu.data.feature_cache import FeatureCache

    cache = FeatureCache(str(tmp_path))
    wave = (rng.standard_normal(16000) * 0.05).astype(np.float32)
    cache.add_track("Bxx001", "chan0", wave)
    assert cache.has("Bxx001", "chan0")
    other = FeatureCache(str(tmp_path), cfg=dataclasses.replace(FEAT, num_filters=40))
    assert not other.has("Bxx001", "chan0")


def test_load_env_skips_empty_keys(tmp_path, monkeypatch):
    """'=value' lines (empty key) must be skipped like python-dotenv does —
    os.environ[''] raises OSError and would abort every CLI."""
    from laughter_detection_icsi_tpu.config import load_env

    f = tmp_path / ".env"
    f.write_text("=oops\nexport = x\nGOOD_KEY=fine\n")
    monkeypatch.delenv("GOOD_KEY", raising=False)
    parsed = load_env(str(f))
    assert parsed.get("GOOD_KEY") == "fine"
    assert "" not in parsed

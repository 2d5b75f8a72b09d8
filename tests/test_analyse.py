"""Evaluator: golden hand-computed precision/recall on the synthetic corpus.

Layout driven: <preds>/<meeting>/t_<thr>/l_<minlen>/chanN.TextGrid
(reference analyse.py:64-96, 227-266).
"""

import numpy as np
import pandas as pd
import pytest

from laughter_detection_icsi_tpu.eval import analyse as an
from laughter_detection_icsi_tpu.eval import indices as indices_lib
from laughter_detection_icsi_tpu.eval import textgrid as tg
from laughter_detection_icsi_tpu.eval import transcript as transcript_lib


@pytest.fixture(scope="module")
def store(synthetic_corpus):
    return transcript_lib.TranscriptStore(str(synthetic_corpus.transcript_dir))


@pytest.fixture(scope="module")
def idx(store):
    return indices_lib.build_indices(store)


@pytest.fixture(scope="module")
def preds_dir(tmp_path_factory):
    """Hand-built predictions with known outcomes.

    Bmr021 (no invalid regions):
      chan0 (me001, GT laugh [10,13]):  preds [10,12] (correct 2.0) and
        [15,16] (incorrect, silence 1.0)
      chan1 (me004, GT laugh [50,50.5]): preds [50,50.5] (correct 0.5) and
        [25,25.5] (incorrect, speech 0.5)
      -> corr 2.5, pred 4.0, prec 0.625, transc 3.5, recall 5/7

    Btr001:
      chan0 (me001): pred [20,21] lies fully in the invalid index
        (breath-laugh) -> stripped, not counted valid; pred [10,11] correct
      -> corr 1.0, pred 1.0, prec 1.0, transc 3.5, recall 2/7,
         num_pred 2, valid 1
    """
    root = tmp_path_factory.mktemp("preds") / "dev"
    d = root / "Bmr021" / "t_0.5" / "l_0.2"
    d.mkdir(parents=True)
    tg.write_textgrid(str(d / "chan0.TextGrid"), [(10.0, 12.0), (15.0, 16.0)], xmax=100.0)
    tg.write_textgrid(str(d / "chan1.TextGrid"), [(50.0, 50.5), (25.0, 25.5)], xmax=100.0)
    # unmapped channel -> must be ignored
    tg.write_textgrid(str(d / "chan7.TextGrid"), [(1.0, 2.0)], xmax=100.0)
    # empty file -> warn + skip
    (d / "chan3.TextGrid").write_text("")

    d2 = root / "Btr001" / "t_0.5" / "l_0.2"
    d2.mkdir(parents=True)
    tg.write_textgrid(str(d2 / "chan0.TextGrid"), [(20.0, 21.0), (10.0, 11.0)], xmax=60.0)
    return root


def test_get_params_from_path():
    p = an.get_params_from_path("preds/Bmr021/t_0.5/l_0.2/chan0.TextGrid")
    assert p == {
        "chan_id": "chan0",
        "min_len": 0.2,  # float like threshold — str next to float breaks
        "threshold": 0.5,  # numeric filters on pred_df
        "meeting_id": "Bmr021",
    }
    with pytest.raises(NameError):
        an.get_params_from_path("preds/Bmr021/t_0.5/l_0.2/track0.TextGrid")
    with pytest.raises(NameError):
        an.get_params_from_path("preds/meeting_too_long/t_0.5/l_0.2/chan0.TextGrid")


def test_textgrid_to_df_filters(preds_dir, store):
    df = an.textgrid_to_df(str(preds_dir / "Bmr021" / "t_0.5" / "l_0.2"), store)
    # chan7 unmapped and chan3 empty are dropped; 2+2 predictions remain
    assert len(df) == 4
    assert set(df["part_id"]) == {"me001", "me004"}


def test_eval_preds_bmr021(preds_dir, store, idx):
    df = an.textgrid_to_df(str(preds_dir / "Bmr021" / "t_0.5" / "l_0.2"), store)
    row = an.eval_preds(df, "Bmr021", 0.5, 0.2, store, idx)
    row = dict(zip(an.EVAL_COLS, row))
    assert row["precision"] == pytest.approx(0.625)
    assert row["recall"] == pytest.approx(2.5 / 3.5)
    assert row["corr_pred_time"] == pytest.approx(2.5)
    assert row["tot_pred_time"] == pytest.approx(4.0)
    assert row["tot_transc_laugh_time"] == pytest.approx(3.5)
    assert row["num_of_pred_laughs"] == 4
    assert row["valid_pred_laughs"] == 4
    assert row["num_of_transc_laughs"] == 2
    assert row["tot_fp_speech_time"] == pytest.approx(0.5)
    assert row["tot_fp_silence_time"] == pytest.approx(1.0)
    assert row["tot_fp_noise_time"] == pytest.approx(0.0)


def test_eval_preds_invalid_regions(preds_dir, store, idx):
    df = an.textgrid_to_df(str(preds_dir / "Btr001" / "t_0.5" / "l_0.2"), store)
    row = dict(zip(an.EVAL_COLS, an.eval_preds(df, "Btr001", 0.5, 0.2, store, idx)))
    # the [20,21] prediction is inside the breath-laugh invalid region:
    # removed from matching and not counted as a valid prediction
    assert row["precision"] == pytest.approx(1.0)
    assert row["corr_pred_time"] == pytest.approx(1.0)
    assert row["tot_pred_time"] == pytest.approx(1.0)
    assert row["num_of_pred_laughs"] == 2
    assert row["valid_pred_laughs"] == 1
    assert row["recall"] == pytest.approx(1.0 / 3.5)


def test_eval_preds_empty_meeting(store, idx):
    empty = pd.DataFrame([], columns=an.PRED_COLS)
    row = dict(zip(an.EVAL_COLS, an.eval_preds(empty, "Bmr021", 0.1, 0.2, store, idx)))
    assert row["precision"] == 1.0  # nothing predicted
    assert row["recall"] == pytest.approx(0.0)


def test_create_evaluation_df_and_sum_stats(preds_dir, store, idx, tmp_path):
    eval_df = an.create_evaluation_df(
        str(preds_dir), store, idx, out_path=str(tmp_path / "eval.csv"), verbose=False
    )
    assert len(eval_df) == 2  # two meetings x one parameter set
    stats = an.calc_sum_stats(eval_df)
    assert len(stats) == 1
    s = stats.iloc[0]
    # corpus-weighted: corr 3.5 / pred 5.0; transc 7.0
    assert s["precision"] == pytest.approx(0.7)
    assert s["recall"] == pytest.approx(0.5)
    assert s["threshold"] == 0.5
    assert s["min_len"] == 0.2


def test_create_evaluation_df_ignores_stray_entries(preds_dir, store, idx):
    """A polluted preds tree (.DS_Store, logs, foreign dirs) must evaluate
    exactly like a clean one — the reference crashed on any stray entry in
    its os.listdir walk (reference analyse.py:239-252)."""
    (preds_dir / ".DS_Store").write_bytes(b"\x00\x01")
    (preds_dir / "Bmr021" / "run.log").write_text("noise\n")
    (preds_dir / "Bmr021" / "notes").mkdir()
    (preds_dir / "Bmr021" / "t_0.5" / "summary.txt").write_text("x\n")
    (preds_dir / "Bmr021" / "t_0.5" / "extra_dir").mkdir()
    # Stray .TextGrid files INSIDE an l_ dir: a non-chan name must not
    # NameError the run, and a chanN_backup must not double-count chanN.
    l_dir = preds_dir / "Bmr021" / "t_0.5" / "l_0.2"
    tg.write_textgrid(str(l_dir / "notes.TextGrid"), [(1.0, 2.0)], xmax=100.0)
    tg.write_textgrid(
        str(l_dir / "chan0_backup.TextGrid"), [(10.0, 12.0)], xmax=100.0
    )
    eval_df = an.create_evaluation_df(str(preds_dir), store, idx, verbose=False)
    assert len(eval_df) == 2
    s = an.calc_sum_stats(eval_df).iloc[0]
    assert s["precision"] == pytest.approx(0.7)


def test_calc_sum_stats_f1_and_average_precision():
    """Hand-computed F1 per sweep row and step-integrated AP over the
    threshold sweep (BASELINE.md's quality-parity target names F1/AP; the
    reference CSVs carry only precision/recall)."""
    eval_df = pd.DataFrame(
        {
            "min_len": [0.2] * 3,
            "threshold": [0.8, 0.5, 0.2],
            "corr_pred_time": [2.0, 5.0, 8.0],
            "tot_pred_time": [2.0, 10.0, 20.0],
            "tot_transc_laugh_time": [10.0, 10.0, 10.0],
        }
    )
    stats = an.calc_sum_stats(eval_df)
    f1 = dict(zip(stats.threshold, stats.f1))
    assert f1[0.8] == pytest.approx(2 * 1.0 * 0.2 / 1.2)
    assert f1[0.5] == pytest.approx(0.5)
    assert f1[0.2] == pytest.approx(2 * 0.4 * 0.8 / 1.2)
    # AP = sum (R_i - R_{i-1}) P_i over descending thresholds:
    # 0.2*1.0 + 0.3*0.5 + 0.3*0.4
    assert an.average_precision(stats, 0.2) == pytest.approx(0.47)
    with pytest.raises(ValueError, match="min_len"):
        an.average_precision(stats, 0.3)


def test_f1_and_ap_degenerate_rows():
    """P+R == 0 yields F1 = 0 (not NaN); a split with zero transcribed
    laugh time yields NaN recall, NaN F1, and NaN AP."""
    import math

    eval_df = pd.DataFrame(
        {
            "min_len": [0.2, 0.2],
            "threshold": [0.5, 0.9],
            "corr_pred_time": [0.0, 0.0],
            "tot_pred_time": [4.0, 0.0],
            "tot_transc_laugh_time": [10.0, 0.0],
        }
    )
    stats = an.calc_sum_stats(eval_df)
    by_thr = stats.set_index("threshold")
    assert by_thr.loc[0.5, "f1"] == 0.0  # P=0, R=0
    assert math.isnan(by_thr.loc[0.9, "recall"])
    assert math.isnan(by_thr.loc[0.9, "f1"])
    assert math.isnan(an.average_precision(stats, 0.2))


def test_sum_stats_f1_integration(preds_dir, store, idx):
    eval_df = an.create_evaluation_df(str(preds_dir), store, idx, verbose=False)
    s = an.calc_sum_stats(eval_df).iloc[0]
    assert s["f1"] == pytest.approx(2 * 0.7 * 0.5 / 1.2)


def test_unparseable_param_dirs_skipped(preds_dir, store, idx):
    """'t_0.5_backup' passes a bare startswith('t_') check but crashes the
    float parse; same for 'l_0.2old'.  Both must be skipped like any other
    stray entry, and their contents must not be double-counted."""
    d = preds_dir / "Bmr021" / "t_0.5_backup" / "l_0.2"
    d.mkdir(parents=True)
    tg.write_textgrid(str(d / "chan0.TextGrid"), [(10.0, 12.0)], xmax=100.0)
    d2 = preds_dir / "Bmr021" / "t_0.5" / "l_0.2old"
    d2.mkdir()
    tg.write_textgrid(str(d2 / "chan0.TextGrid"), [(10.0, 12.0)], xmax=100.0)
    eval_df = an.create_evaluation_df(str(preds_dir), store, idx, verbose=False)
    assert len(eval_df) == 2
    assert an.calc_sum_stats(eval_df).iloc[0]["precision"] == pytest.approx(0.7)


def test_letter_channels_are_predictions(tmp_path):
    """Real ICSI meetings carry letter channels (chanA..chanF — the
    inventory cli/get_icsi_data.py probes); a digits-only filename filter
    silently dropped their predictions from the corpus stats."""
    tdir = tmp_path / "transcripts"
    tdir.mkdir()
    (tdir / "preambles.mrt").write_text(
        '<?xml version="1.0" encoding="UTF-8"?>\n<Preambles>\n'
        '  <Meeting Session="Bxx001" DateTimeStamp="2000-01-03">\n'
        "    <Preamble>\n      <Participants>\n"
        '        <Participant Name="me001" Channel="chanA"/>\n'
        "      </Participants>\n      <Channels>\n"
        '        <Channel Name="chanA" AudioFile="chanA.sph"/>\n'
        "      </Channels>\n    </Preamble>\n  </Meeting>\n</Preambles>\n"
    )
    (tdir / "Bxx001.mrt").write_text(
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<Meeting Session="Bxx001">\n'
        '  <Transcript StartTime="0.0" EndTime="60.0">\n'
        '    <Segment StartTime="10.0" EndTime="12.0" Participant="me001">'
        '<VocalSound Description="laugh"/></Segment>\n'
        "  </Transcript>\n</Meeting>\n"
    )
    lstore = transcript_lib.TranscriptStore(str(tdir))
    lidx = indices_lib.build_indices(lstore)
    d = tmp_path / "dev" / "Bxx001" / "t_0.5" / "l_0.2"
    d.mkdir(parents=True)
    tg.write_textgrid(str(d / "chanA.TextGrid"), [(10.0, 12.0)], xmax=60.0)
    df = an.textgrid_to_df(str(d), lstore)
    assert len(df) == 1 and df.iloc[0]["chan"] == "chanA"
    out = an.create_evaluation_df(str(tmp_path / "dev"), lstore, lidx, verbose=False)
    assert len(out) == 1
    assert out.iloc[0]["precision"] == pytest.approx(1.0)
    assert out.iloc[0]["corr_pred_time"] == pytest.approx(2.0)


def test_meeting_without_transcript_skipped(preds_dir, synthetic_corpus, tmp_path):
    """A meeting present in preambles.mrt but whose .mrt transcript is absent
    (subset corpus) has no index coverage; its predictions would trip the
    FP-accounting closure assert.  Skip the meeting, keep the rest."""
    import shutil

    tdir = tmp_path / "transcripts"
    shutil.copytree(synthetic_corpus.transcript_dir, tdir)
    (tdir / "Btr001.mrt").unlink()
    sub_store = transcript_lib.load(str(tdir))
    assert "Btr001" in sub_store.chan_to_part  # preambles still know it
    sub_idx = indices_lib.build_indices(sub_store)
    out = an.create_evaluation_df(str(preds_dir), sub_store, sub_idx, verbose=False)
    assert sorted(out.meeting.unique()) == ["Bmr021"]


def test_analyse_end_to_end(preds_dir, synthetic_corpus):
    stats = an.analyse(
        str(preds_dir), transcript_dir=str(synthetic_corpus.transcript_dir), force=True
    )
    assert stats.iloc[0]["precision"] == pytest.approx(0.7)
    # cache files written next to the preds dir, named by split
    parent = preds_dir.parent
    assert (parent / "dev_sum_stats.csv").is_file()
    assert (parent / "dev_eval_df_per_meeting.csv").is_file()
    # second call uses the cache (no force)
    again = an.analyse(str(preds_dir))
    assert again.iloc[0]["precision"] == pytest.approx(0.7)


def test_index_cache_key_covers_config(synthetic_corpus):
    """Changing the analysis config (min_length moves laughs between the
    laugh and invalid indices) must miss the index cache."""
    import dataclasses

    from laughter_detection_icsi_tpu.config import ANALYSIS
    from laughter_detection_icsi_tpu.eval import indices as idx_lib

    tdir = str(synthetic_corpus.transcript_dir)
    a = idx_lib._cache_key(tdir)
    b = idx_lib._cache_key(tdir, dataclasses.replace(ANALYSIS, min_length=0.5))
    assert a != b


def test_prediction_past_transcript_end_does_not_abort(store, idx, tmp_path):
    """Audio channels run slightly longer than their transcripts; a
    prediction sticking past the transcript EndTime lies in NO index and
    crashed the reference's closure assert (analyse.py:147).  We clamp the
    time accounting to the transcribed extent (PARITY #23)."""
    info = store.info_df
    row = info[(info["meeting_id"] == "Bmr021")].iloc[0]
    length = float(row["length"])
    d = tmp_path / "dev" / "Bmr021" / "t_0.5" / "l_0.2"
    d.mkdir(parents=True)
    # one in-range incorrect pred + one sticking 2 s past the transcript end
    tg.write_textgrid(
        str(d / "chan0.TextGrid"),
        [(15.0, 16.0), (length - 1.0, length + 2.0)],
        xmax=length + 2.0,
    )
    out = an.create_evaluation_df(str(tmp_path / "dev"), store, idx, verbose=False)
    r = out[out.meeting == "Bmr021"].iloc[0]
    # clamped: only the in-transcript second of the long pred counts
    assert r["tot_pred_time"] == pytest.approx(2.0)
    assert r["num_of_pred_laughs"] == 2


def test_foreign_meeting_dir_skipped(preds_dir, store, idx):
    """A non-meeting directory (archive/, backup/) containing a copied
    t_*/l_* tree must be skipped, not NameError the whole run."""
    d = preds_dir / "archive" / "t_0.5" / "l_0.2"
    d.mkdir(parents=True)
    tg.write_textgrid(str(d / "chan0.TextGrid"), [(1.0, 2.0)], xmax=10.0)
    out = an.create_evaluation_df(str(preds_dir), store, idx, verbose=False)
    assert sorted(out.meeting.unique()) == ["Bmr021", "Btr001"]


def test_min_length_cfg_threads_into_indices(store):
    """analyse(cfg=...) must evaluate WITH that cfg: a larger min_length
    moves short laughs into the invalid index (they stop counting toward
    recall's denominator)."""
    from laughter_detection_icsi_tpu.config import AnalysisConfig

    base = indices_lib.build_indices(store)
    strict = indices_lib.build_indices(
        store, cfg=AnalysisConfig(min_length=1.0)
    )
    assert strict.laugh.tot_len["Bmr021"] < base.laugh.tot_len["Bmr021"]
    # and load() keys its caches on the cfg
    a = indices_lib.load(store, cfg=AnalysisConfig(min_length=1.0))
    b = indices_lib.load(store)
    assert a.laugh.tot_len["Bmr021"] != b.laugh.tot_len["Bmr021"]


def test_analyse_rejects_unsupported_frame_duration(preds_dir, synthetic_corpus):
    from laughter_detection_icsi_tpu.config import AnalysisConfig

    with pytest.raises(NotImplementedError, match="1 ms"):
        an.analyse(
            str(preds_dir),
            transcript_dir=str(synthetic_corpus.transcript_dir),
            cfg=AnalysisConfig(frame_duration_ms=10),
            force=True,
        )


def test_transcript_load_sees_content_changes(synthetic_corpus, tmp_path):
    """load() is content-keyed: editing an .mrt on disk must yield a fresh
    parse, not the memoized stale store (whose indices would then be cached
    under the NEW content hash)."""
    import shutil

    tdir = tmp_path / "transcripts"
    shutil.copytree(synthetic_corpus.transcript_dir, tdir)
    s1 = transcript_lib.load(str(tdir))
    # rewrite one transcript with different content (mtime_ns + size change)
    mrt = sorted(p for p in tdir.glob("*.mrt") if p.name != "preambles.mrt")[0]
    mrt.write_text(mrt.read_text() + "\n<!-- edited -->\n")
    s2 = transcript_lib.load(str(tdir))
    assert s2 is not s1


def test_negative_start_prediction_does_not_abort(store, idx, tmp_path):
    """Praat permits negative xmin; a hand-edited/foreign TextGrid starting
    below zero lies in NO index for the negative span and must be clamped
    like frames past EndTime, not abort the run via the closure assert."""
    d = tmp_path / "dev" / "Bmr021" / "t_0.5" / "l_0.2"
    d.mkdir(parents=True)
    (d / "chan0.TextGrid").write_text(
        'File type = "ooTextFile"\n'
        'Object class = "TextGrid"\n'
        "xmin = -0.5\nxmax = 20\ntiers? <exists>\nsize = 1\n"
        "item []:\n    item [1]:\n"
        '        class = "IntervalTier"\n        name = "laughter"\n'
        "        xmin = -0.5\n        xmax = 20\n"
        "        intervals: size = 1\n"
        "        intervals [1]:\n"
        "            xmin = -0.5\n            xmax = 1.0\n"
        '            text = "laugh"\n'
    )
    out = an.create_evaluation_df(str(tmp_path / "dev"), store, idx, verbose=False)
    r = out[out.meeting == "Bmr021"].iloc[0]
    # only the non-negative second of the prediction is accounted
    assert r["tot_pred_time"] == pytest.approx(1.0)


def test_nan_param_dirs_skipped(preds_dir, store, idx):
    """'l_nan' parses as float but its eval rows would silently vanish from
    calc_sum_stats' groupby — the walk must skip it loudly instead."""
    d = preds_dir / "Bmr021" / "t_0.5" / "l_nan"
    d.mkdir(parents=True, exist_ok=True)
    tg.write_textgrid(str(d / "chan0.TextGrid"), [(1.0, 2.0)], xmax=10.0)
    try:
        out = an.create_evaluation_df(str(preds_dir), store, idx, verbose=False)
        assert not out["min_len"].isna().any()
    finally:
        import shutil

        shutil.rmtree(d)


def test_pred_df_min_len_is_float(preds_dir, store):
    """min_len must be parsed like threshold: a str column next to a float
    one silently breaks numeric filters on pred_df."""
    d = sorted((preds_dir / "Bmr021").glob("t_*/l_*"))[0]
    df = an.textgrid_to_df(str(d), store)
    assert df["min_len"].dtype.kind == "f"
    assert df["threshold"].dtype.kind == "f"


def test_seg_is_invalid_matches_invalid_mask():
    """The scalar and vectorized validity predicates must be THE same rule."""
    import pandas as pd

    from laughter_detection_icsi_tpu.eval import indices as ind

    df = pd.DataFrame(
        {
            "length": [0.1, 0.5, 3.0, 2.0],
            "laugh_type": ["laugh", "breath-laugh", "laugh", "breath-laugh"],
        }
    )
    mask = ind.invalid_mask(df)
    for i, (_, row) in enumerate(df.iterrows()):
        assert ind.seg_is_invalid(row) == bool(mask.iloc[i])


def test_build_indices_rejects_unsupported_frame_duration(store):
    from laughter_detection_icsi_tpu.config import AnalysisConfig
    from laughter_detection_icsi_tpu.eval import indices as ind

    with pytest.raises(NotImplementedError, match="1 ms"):
        ind.build_indices(store, cfg=AnalysisConfig(frame_duration_ms=10))


def test_index_cache_evicts_superseded_entries(synthetic_corpus, tmp_path):
    """A corpus update must not leak the previous IndexStore in the
    module-global cache (same eviction discipline as the store cache)."""
    import shutil

    from laughter_detection_icsi_tpu.eval import indices as ind
    from laughter_detection_icsi_tpu.eval import transcript as tr

    tdir = tmp_path / "transcripts"
    shutil.copytree(synthetic_corpus.transcript_dir, tdir)
    before = {k for k in ind._INDEX_CACHE}
    store1 = tr.TranscriptStore(str(tdir))
    ind.load(store1)
    mine = [k for k in ind._INDEX_CACHE if k not in before]
    assert len(mine) == 1
    # touch a transcript -> new content key; old entry must be evicted
    mrt = sorted(tdir.glob("*.mrt"))[0]
    mrt.write_text(mrt.read_text())
    import os as _os

    _os.utime(mrt, ns=(123456789, 987654321123456789))
    store2 = tr.TranscriptStore(str(tdir))
    ind.load(store2)
    after = [k for k in ind._INDEX_CACHE if k not in before]
    assert len(after) == 1 and after != mine


# --------------------------------------------------------------------------- #
# Auxiliary analysis surface (reference analyse.py:420-506)
# --------------------------------------------------------------------------- #


def test_laugh_df_to_csv(store, tmp_path):
    """Breath-laugh subset export (reference analyse.py:420-428).  The
    synthetic corpus carries exactly one breath-laugh (Btr001 me001
    [20,21])."""
    out = tmp_path / "breath_laugh.csv"
    n = an.laugh_df_to_csv(store.laugh_only_df, str(out))
    assert n == 1
    df = pd.read_csv(out)
    assert len(df) == 1
    assert df.iloc[0]["meeting_id"] == "Btr001"
    assert df.iloc[0]["laugh_type"] == "breath-laugh"
    assert df.iloc[0]["start"] == pytest.approx(20.0)
    # other laugh types select their own subsets
    out2 = tmp_path / "plain.csv"
    n2 = an.laugh_df_to_csv(store.laugh_only_df, str(out2), laugh_type="laugh")
    assert n2 == len(store.laugh_only_df) - 1
    with pytest.raises(ValueError, match="laugh_type"):
        an.laugh_df_to_csv(pd.DataFrame({"x": [1]}), str(out))


def test_create_csvs_for_meeting(preds_dir, store, tmp_path):
    """Per-meeting transc/preds CSV export (reference analyse.py:481-506);
    missing threshold dirs are skipped with a warning instead of crashing
    (the reference hard-codes four t_ dirs and dies on the first absent
    one)."""
    transc_path, preds_path = an.create_csvs_for_meeting(
        "Bmr021", str(preds_dir), store, out_dir=str(tmp_path),
        thresholds=(0.2, 0.5), min_len=0.2,  # t_0.2 absent -> warn+skip
    )
    transc = pd.read_csv(transc_path)
    assert len(transc) == 2  # [10,13] and [50,50.5]
    assert set(transc["meeting_id"]) == {"Bmr021"}
    preds = pd.read_csv(preds_path)
    assert len(preds) == 4  # chan0 x2 + chan1 x2 at t_0.5
    assert set(preds["threshold"]) == {0.5}
    with pytest.raises(ValueError, match="unknown meeting"):
        an.create_csvs_for_meeting("Zzz999", str(preds_dir), store)


def test_stats_for_different_min_lengths(preds_dir, store, tmp_path):
    """WORKING min-length sensitivity sweep: indices are genuinely rebuilt
    per grid point (the reference's version is broken — its index
    recreation is commented out and it reads a cached eval_df, so every
    iteration repeats the same numbers; reference analyse.py:431-479).

    Hand-computed on the synthetic corpus at t_0.5 preds:
      ml=0.05: the 0.1 s Btr001 laugh becomes VALID -> laugh total 7.1 s
      ml=0.2 (default): 7.0 s (fixture baseline)
      ml=0.6: Bmr021 [50,50.5] moves to invalid -> 6.5 s; the [50,50.5]
        prediction is stripped by the invalid index, so corr=3.0,
        pred=4.5 -> precision 2/3, recall 3.0/6.5
    """
    out = tmp_path / "ml_sweep.csv"
    res = an.stats_for_different_min_lengths(
        str(preds_dir), store, min_lengths=[0.05, 0.2, 0.6],
        out_path=str(out),
    )
    assert out.is_file()
    assert list(res["min_length"]) == [0.05, 0.2, 0.6]
    by_ml = res.set_index("min_length")
    assert by_ml.loc[0.05, "laugh_tot_len"] == pytest.approx(7.1)
    assert by_ml.loc[0.2, "laugh_tot_len"] == pytest.approx(7.0)
    assert by_ml.loc[0.6, "laugh_tot_len"] == pytest.approx(6.5)
    # valid + invalid mass is conserved across the grid (laughs only move
    # between the two indices; the typed-invalid segments never move)
    total = res["laugh_tot_len"] + res["invalid_tot_len"]
    assert total.nunique() == 1
    # events conserved too
    ev = res["laugh_events"] + res["invalid_events"]
    assert ev.nunique() == 1
    # stats recomputed against the rebuilt indices, not cached
    assert by_ml.loc[0.2, "precision"] == pytest.approx(0.7)
    assert by_ml.loc[0.2, "recall"] == pytest.approx(0.5)
    assert by_ml.loc[0.6, "precision"] == pytest.approx(2.0 / 3.0)
    assert by_ml.loc[0.6, "recall"] == pytest.approx(3.0 / 6.5)
    assert by_ml.loc[0.05, "recall"] == pytest.approx(3.5 / 7.1)


def test_analyse_cli_aux_exports(preds_dir, synthetic_corpus, tmp_path, capsys):
    """CLI wiring for the three aux exports (cli/analyse.py)."""
    from cli import analyse as analyse_cli

    tdir = str(synthetic_corpus.transcript_dir)
    # breath-laugh export (no preds_dir needed)
    bl = tmp_path / "bl.csv"
    rc = analyse_cli.main(
        ["--breath_laugh_csv", str(bl), "--transcript_dir", tdir]
    )
    assert rc == 0 and bl.is_file()
    assert len(pd.read_csv(bl)) == 1
    # per-meeting CSVs
    rc = analyse_cli.main(
        ["--meeting_csvs", "Bmr021", str(preds_dir), "--transcript_dir", tdir,
         "--out_dir", str(tmp_path)]
    )
    assert rc == 0
    assert (tmp_path / "Bmr021_transc.csv").is_file()
    assert (tmp_path / "Bmr021_preds.csv").is_file()
    # min-length sweep
    rc = analyse_cli.main(
        ["--min_length_sweep", "0.2,0.6", str(preds_dir),
         "--transcript_dir", tdir]
    )
    assert rc == 0
    out = preds_dir.parent / (
        preds_dir.name + "_sum_stats_for_different_min_lengths.csv"
    )
    assert out.is_file()
    swept = pd.read_csv(out)
    assert sorted(swept["min_length"].unique()) == [0.2, 0.6]
    capsys.readouterr()

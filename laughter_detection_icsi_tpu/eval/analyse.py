"""Prediction evaluation: TextGrids -> time-weighted precision/recall.

Rebuild of reference analysis/analyse.py:49-298,508-539 on top of our exact
integer-interval algebra (eval/intervals.py) instead of the portion library —
``overlap_length`` is O(atoms), not the reference's O(duration_ms) ``p_len``
iteration (reference analysis/utils.py:28-37).

Semantics mirrored:
- Prediction dir layout ``<preds_dir>/<meeting>/t_<thr>/l_<minlen>/chanN.TextGrid``
  (reference analyse.py:64-96); channels with no participant mapping and empty
  files are skipped (reference analyse.py:23-35).
- ``laugh_match`` (reference analyse.py:120-149): predicted time inside
  invalid regions is removed before matching; correct = overlap with the
  laugh index; false-positive time is attributed to speech/silence/noise,
  and the accounting must close to <1 ms.
- Per-meeting precision := 1 when nothing was predicted; recall := NaN when
  the meeting has no transcribed laughter (reference analyse.py:203-216).
- Corpus stats: sum times over meetings per (min_len, threshold), then
  divide (reference analyse.py:269-298).
- A prediction counts as "valid" unless it lies fully inside an invalid
  region (reference analyse.py:183-187).
"""

from __future__ import annotations

import math
import os
import re
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import pandas as pd

from laughter_detection_icsi_tpu.config import ANALYSIS, AnalysisConfig
from laughter_detection_icsi_tpu.eval import indices as indices_lib
from laughter_detection_icsi_tpu.eval import textgrid as tg
from laughter_detection_icsi_tpu.eval import transcript as transcript_lib
from laughter_detection_icsi_tpu.eval.indices import Index, IndexStore
from laughter_detection_icsi_tpu.eval.intervals import IntervalSet, to_frames, to_sec
from laughter_detection_icsi_tpu.eval.transcript import TranscriptStore

PRED_COLS = [
    "meeting_id",
    "part_id",
    "chan",
    "start",
    "end",
    "length",
    "threshold",
    "min_len",
    "laugh_type",
]

EVAL_COLS = [
    "meeting",
    "threshold",
    "min_len",
    "precision",
    "recall",
    "corr_pred_time",
    "tot_pred_time",
    "tot_transc_laugh_time",
    "num_of_pred_laughs",
    "valid_pred_laughs",
    "num_of_transc_laughs",
    "tot_fp_speech_time",
    "tot_fp_noise_time",
    "tot_fp_silence_time",
]


# --------------------------------------------------------------------------- #
# Prediction loading
# --------------------------------------------------------------------------- #


def get_params_from_path(path: str) -> Dict[str, object]:
    """Parse (meeting_id, threshold, min_len, chan_id) from a prediction path
    ``<meeting>/t_<thr>/l_<minlen>/chanN[...].TextGrid``
    (reference analyse.py:64-96)."""
    parts = os.path.normpath(path).replace(".TextGrid", "").split(os.sep)
    chan_id = parts[-1].split("_")[0]
    if not chan_id.startswith("chan"):
        raise NameError(
            "channel .TextGrid files must be named 'chanN.TextGrid'"
        )
    meeting_id = parts[-4]
    if len(meeting_id) != 6:
        raise NameError(
            "chanN.TextGrid files must live under a 6-char meeting-ID dir "
            "(<meeting>/t_<thr>/l_<minlen>/)"
        )
    return {
        "chan_id": chan_id,
        # float like threshold below: a str min_len next to a float
        # threshold makes pred_df[pred_df['min_len'] == 0.2] silently
        # match nothing.
        "min_len": float(parts[-2].replace("l_", "")),
        "threshold": float(parts[-3].replace("t_", "")),
        "meeting_id": meeting_id,
    }


def textgrid_to_df(textgrid_dir: str, store: TranscriptStore) -> pd.DataFrame:
    """All laughter predictions in one ``l_<minlen>`` dir as a DataFrame
    (reference analyse.py:49-61)."""
    rows: List[List[object]] = []
    for filename in sorted(os.listdir(textgrid_dir)):
        if not filename.endswith(".TextGrid"):
            continue
        # Only exact chanN.TextGrid names are predictions: a stray
        # 'notes.TextGrid' must not NameError the whole evaluation, and a
        # 'chan0_backup.TextGrid' must not silently double-count alongside
        # chan0.TextGrid (get_params_from_path would parse it as chan0 —
        # hence no underscore in the class).  Letter channels are REAL ICSI
        # (chanA..chanF; cli/get_icsi_data.py probes that inventory and
        # sweep writes them) — a digits-only filter silently dropped their
        # predictions from the corpus stats.  Unmapped names still skip via
        # the chan_to_part check below.
        stem = filename[: -len(".TextGrid")]
        if not re.fullmatch(r"chan[0-9A-Za-z]+", stem):
            print(f"WARNING: skipping non-prediction file {filename}")
            continue
        full_path = os.path.join(textgrid_dir, filename)
        params = get_params_from_path(full_path)
        chan_map = store.chan_to_part.get(params["meeting_id"], {})
        if params["chan_id"] not in chan_map:
            continue  # unmapped channel (reference analyse.py:23-28)
        if os.stat(full_path).st_size == 0:
            print(
                f"WARNING: empty .TextGrid for "
                f"{params['meeting_id']}:{params['chan_id']}"
            )
            continue
        part_id = chan_map[params["chan_id"]]
        for start, end in tg.read_laughter_intervals(full_path):
            rows.append(
                [
                    params["meeting_id"],
                    part_id,
                    params["chan_id"],
                    start,
                    end,
                    end - start,
                    params["threshold"],
                    params["min_len"],
                    "laugh",
                ]
            )
    return pd.DataFrame(rows, columns=PRED_COLS)


# --------------------------------------------------------------------------- #
# Matching
# --------------------------------------------------------------------------- #


def _overlap_sec(index: Index, pred: IntervalSet, meeting_id: str, part_id: str) -> float:
    if not index.has_part(meeting_id, part_id):
        return 0.0
    return to_sec(index.get(meeting_id, part_id).overlap_length(pred))


def laugh_match(
    pred_laugh: IntervalSet,
    meeting_id: str,
    part_id: str,
    idx: IndexStore,
) -> Tuple[float, float, float, float, float]:
    """(correct, incorrect, fp_speech, fp_noise, fp_silence) in seconds
    (reference analyse.py:120-149).  Missing-participant defaults live in ONE
    place — Index.get returns the empty set and _overlap_sec returns 0.0 —
    so no has_part guards are repeated here."""
    pred_laugh = pred_laugh - idx.invalid.get(meeting_id, part_id)
    pred_length = to_sec(pred_laugh.length())
    correct = _overlap_sec(idx.laugh, pred_laugh, meeting_id, part_id)
    incorrect = pred_length - correct
    speech = _overlap_sec(idx.speech, pred_laugh, meeting_id, part_id)
    silence = _overlap_sec(idx.silence, pred_laugh, meeting_id, part_id)
    noise = _overlap_sec(idx.noise, pred_laugh, meeting_id, part_id)
    remain = incorrect - speech - silence - noise
    # One-sided on purpose: NEGATIVE remainders are expected and correct-by-
    # parity — ICSI transcribes overlapping segments for one participant
    # (see indices.Index.add on tot_len double counting), so a prediction
    # frame can be counted against several fp_* categories at once, exactly
    # as the reference's per-index overlap sums do (analyse.py:120-149).
    # Only a POSITIVE remainder (predicted frames no ground-truth index
    # covers) indicates broken accounting.
    assert remain < 0.001, (
        f"false-positive accounting does not close for {meeting_id}/{part_id}: "
        f"remainder {remain}"
    )
    return correct, incorrect, speech, noise, silence


def eval_preds(
    pred_df: pd.DataFrame,
    meeting_id: str,
    threshold: object,
    min_len: object,
    store: TranscriptStore,
    idx: IndexStore,
) -> List[object]:
    """Evaluation row for one (meeting, threshold, min_len)
    (reference analyse.py:152-225)."""
    tot_corr, tot_incorr = 0.0, 0.0
    fp_speech = fp_noise = fp_silence = 0.0
    tot_transc = idx.laugh.tot_len.get(meeting_id, 0.0)
    laugh_df = store.laugh_only_df
    # PARITY: counts EVERY transcribed laugh row for the meeting, including
    # short/breath-laughs the index build routes to the invalid index —
    # exactly the reference (analyse.py:163-165).  tot_transc (the recall
    # denominator) covers only VALID laugh time, so the two columns measure
    # different populations by design.
    num_transc = (
        int((laugh_df["meeting_id"] == meeting_id).sum()) if not laugh_df.empty else 0
    )
    num_pred = int(pred_df.shape[0])
    num_valid_pred = 0

    if pred_df.size != 0:
        info = store.info_df
        for part_id, part_df in pred_df.groupby("part_id"):
            invalid = idx.invalid.get(meeting_id, part_id)
            has_invalid = idx.invalid.has_part(meeting_id, part_id)
            # Frames past the transcript's EndTime belong to NO ground-truth
            # index (the silence index stops at info_df length), so a
            # prediction sticking past it — audio files run slightly longer
            # than transcripts — would break the FP-accounting closure
            # assert and abort the whole evaluation.  Clamp the TIME
            # accounting to the transcribed extent (the reference crashes
            # here; divergence documented in laugh_match's contract).
            lens = info[
                (info["meeting_id"] == meeting_id) & (info["part_id"] == part_id)
            ]["length"]
            limit = to_frames(float(lens.iloc[0])) if len(lens) else None
            pairs = []
            for _, row in part_df.iterrows():
                a, b = to_frames(row["start"]), to_frames(row["end"])
                pred = IntervalSet.openclosed(a, b)
                if not has_invalid or not invalid.contains(pred):
                    num_valid_pred += 1
                if limit is not None:
                    a, b = min(a, limit), min(b, limit)
                # Mirror clamp at 0: Praat permits negative xmin, so a
                # hand-edited/foreign TextGrid can start below time zero —
                # those frames belong to no ground-truth index and would
                # break the closure assert exactly like frames past EndTime.
                a, b = max(a, 0), max(b, 0)
                pairs.append((a, b))
            # Union once over all pairs (O(n log n)) — an incremental
            # per-row `|` re-normalizes the accumulated set every step
            # (quadratic per participant at low thresholds).
            part_pred = IntervalSet.from_pairs(pairs)
            corr, incorr, speech, noise, silence = laugh_match(
                part_pred, meeting_id, part_id, idx
            )
            tot_corr += corr
            tot_incorr += incorr
            fp_speech += speech
            fp_noise += noise
            fp_silence += silence

    tot_pred = tot_corr + tot_incorr
    prec = 1.0 if tot_pred == 0 else tot_corr / tot_pred
    recall = float("nan") if tot_transc == 0 else tot_corr / tot_transc
    return [
        meeting_id,
        threshold,
        min_len,
        prec,
        recall,
        tot_corr,
        tot_pred,
        tot_transc,
        num_pred,
        num_valid_pred,
        num_transc,
        fp_speech,
        fp_noise,
        fp_silence,
    ]


# --------------------------------------------------------------------------- #
# Corpus-level driver
# --------------------------------------------------------------------------- #


def _prefixed_float(name: str, prefix: str) -> Optional[float]:
    """FINITE float from ``<prefix><value>`` dir names; None otherwise.

    nan/inf parse as floats but must not pass the gate: a ``l_nan`` dir
    would be evaluated and then silently dropped by calc_sum_stats'
    groupby (NaN group keys vanish) — the eval CSV and sum stats would
    disagree with no warning, the opposite of the loud-skip policy here.
    """
    if not name.startswith(prefix):
        return None
    try:
        v = float(name[len(prefix):])
    except ValueError:
        return None
    return v if math.isfinite(v) else None


def create_evaluation_df(
    preds_dir: str,
    store: TranscriptStore,
    idx: IndexStore,
    out_path: Optional[str] = None,
    use_cache: bool = False,
    verbose: bool = True,
) -> pd.DataFrame:
    """Walk ``<preds_dir>/<meeting>/t_<thr>/l_<minlen>/`` and evaluate every
    parameter set (reference analyse.py:227-266)."""
    if use_cache and out_path and os.path.isfile(out_path):
        return pd.read_csv(out_path)
    all_rows: List[List[object]] = []
    # Hoisted: meeting_ids is a recomputing property (unique+sort per
    # access) and list membership is O(n) — per-iteration cost for nothing.
    known_meetings = set(store.meeting_ids)
    for meeting in sorted(os.listdir(preds_dir)):
        meeting_path = os.path.join(preds_dir, meeting)
        if not os.path.isdir(meeting_path):
            continue
        if len(meeting) != 6:
            # Same rule get_params_from_path enforces per file: a foreign
            # directory (archive/, backup/) containing copied t_*/l_* trees
            # must be skipped, not NameError the whole run.
            if verbose:
                print(f"skipping non-meeting entry {meeting_path}", flush=True)
            continue
        if meeting not in known_meetings:
            # Meeting known to preambles but its .mrt transcript absent
            # (subset corpus): no index covers it, so every prediction would
            # trip the FP-accounting closure assert and abort the whole run.
            if verbose:
                print(
                    f"skipping {meeting}: no transcript in the store", flush=True
                )
            continue
        for thr_name in sorted(os.listdir(meeting_path)):
            thr_dir = os.path.join(meeting_path, thr_name)
            # Stray files (.DS_Store, logs) or foreign directories must not
            # abort a whole evaluation — the reference crashed on these
            # (reference analyse.py:239-252); skip anything that is not a
            # t_<float>/l_<float> directory (a bare startswith would still
            # crash on 't_0.5_backup' when the float parse runs).
            if not (
                os.path.isdir(thr_dir)
                and _prefixed_float(thr_name, "t_") is not None
            ):
                if verbose:
                    print(f"skipping non-threshold entry {thr_dir}", flush=True)
                continue
            for min_len_name in sorted(os.listdir(thr_dir)):
                tg_dir = os.path.join(thr_dir, min_len_name)
                if not (
                    os.path.isdir(tg_dir)
                    and _prefixed_float(min_len_name, "l_") is not None
                ):
                    if verbose:
                        print(f"skipping non-min-length entry {tg_dir}", flush=True)
                    continue
                if verbose:
                    print(
                        f"meeting={meeting} thr={thr_name} min_len={min_len_name}",
                        flush=True,
                    )
                pred_df = textgrid_to_df(tg_dir, store)
                all_rows.append(
                    eval_preds(
                        pred_df,
                        meeting,
                        float(thr_name.replace("t_", "")),
                        float(min_len_name.replace("l_", "")),
                        store,
                        idx,
                    )
                )
    eval_df = pd.DataFrame(all_rows, columns=EVAL_COLS)
    if out_path:
        eval_df.to_csv(out_path, index=False)
    return eval_df


def calc_sum_stats(eval_df: pd.DataFrame) -> pd.DataFrame:
    """Corpus-weighted precision/recall/F1 per (min_len, threshold): sum the
    times across meetings, then divide (reference analyse.py:269-298).

    ``f1`` is ours (the reference reports only precision/recall in its CSVs;
    its thesis-level F1 numbers are derived from them) — the quality-parity
    target is stated as F1/AP (BASELINE.md), so the framework computes both.
    F1 is 0 where precision+recall is 0 and NaN where recall is NaN (no
    transcribed laugh time in the split).
    """
    sums = (
        eval_df.groupby(["min_len", "threshold"])[
            ["corr_pred_time", "tot_pred_time", "tot_transc_laugh_time"]
        ]
        .sum()
        .reset_index()
    )
    sums["precision"] = sums["corr_pred_time"] / sums["tot_pred_time"]
    sums.loc[sums.tot_pred_time == 0, "precision"] = 1.0
    sums["recall"] = sums["corr_pred_time"] / sums["tot_transc_laugh_time"]
    pr = sums["precision"] + sums["recall"]
    sums["f1"] = (2.0 * sums["precision"] * sums["recall"] / pr).where(pr != 0, 0.0)
    return sums[["threshold", "min_len", "precision", "recall", "f1"]]


def average_precision(sum_stats: pd.DataFrame, min_len: float) -> float:
    """Step-integrated average precision over the threshold sweep at one
    ``min_len``: AP = sum_i (R_i - R_{i-1}) * P_i with thresholds ordered
    descending (recall ascending from the R_0 = 0 anchor) — the standard
    interpolation-free AP definition (sklearn average_precision_score
    convention), computed from the corpus-weighted sweep rows.

    The BASELINE.md quality-parity target names F1/AP; the reference has no
    AP code (thesis-only numbers).  NaN when the split has no transcribed
    laugh time (recall undefined).  A one-row sweep degenerates to R * P.
    """
    rows = sum_stats[sum_stats["min_len"] == min_len]
    if rows.empty:
        raise ValueError(
            f"no sum-stats rows at min_len={min_len!r} "
            f"(have {sorted(sum_stats['min_len'].unique())})"
        )
    rows = rows.sort_values("threshold", ascending=False)
    if rows["recall"].isna().any():
        return float("nan")
    ap = 0.0
    r_prev = 0.0
    for _, row in rows.iterrows():
        ap += (float(row["recall"]) - r_prev) * float(row["precision"])
        r_prev = float(row["recall"])
    return ap


# --------------------------------------------------------------------------- #
# Auxiliary analysis surface (reference analyse.py:420-506)
# --------------------------------------------------------------------------- #


def laugh_df_to_csv(
    df: pd.DataFrame, out_path: str, laugh_type: str = "breath-laugh"
) -> int:
    """Export the subset of laughter events of one ``laugh_type`` to CSV
    (reference analyse.py:420-428, which hard-codes 'breath-laugh' and the
    output name; ours takes both).  Typical input: a TranscriptStore's
    ``laugh_only_df``.  Returns the number of rows written so callers can
    tell an empty subset from a populated one (the reference wrote silently).

    The CSV feeds ``cli/laughs_to_wav.py`` for listening audits, same as the
    reference's output_processing workflow.
    """
    if "laugh_type" not in df.columns:
        raise ValueError(
            "laugh_df_to_csv needs a 'laugh_type' column (got "
            f"{list(df.columns)}) — pass a transcript segment DataFrame"
        )
    subset = df[df["laugh_type"] == laugh_type]
    subset.to_csv(out_path, index=False)
    return int(subset.shape[0])


def create_csvs_for_meeting(
    meeting_id: str,
    preds_dir: str,
    store: TranscriptStore,
    out_dir: str = ".",
    thresholds: Tuple[float, ...] = (0.2, 0.4, 0.6, 0.8),
    min_len: float = 0.2,
) -> Tuple[str, str]:
    """Write ``<meeting>_transc.csv`` (transcribed laughs) and
    ``<meeting>_preds.csv`` (predictions at several thresholds, duplicates
    across thresholds possible by design) for external analysis
    (reference analyse.py:481-506).

    Differences from the reference: thresholds/min_len are parameters
    instead of hard-coded path strings, missing sweep directories are
    skipped with a warning instead of crashing the export, and the output
    dir is explicit.  Returns ``(transc_path, preds_path)``.
    """
    known = set(store.meeting_ids)
    if meeting_id not in known:
        raise ValueError(
            f"unknown meeting {meeting_id!r} (transcript store has "
            f"{sorted(known)})"
        )
    os.makedirs(out_dir, exist_ok=True)
    transc_path = os.path.join(out_dir, f"{meeting_id}_transc.csv")
    laugh_df = store.laugh_only_df
    transc = (
        laugh_df[laugh_df["meeting_id"] == meeting_id]
        if not laugh_df.empty
        else laugh_df
    )
    transc.to_csv(transc_path, index=False)

    frames: List[pd.DataFrame] = []
    for thr in thresholds:
        tg_dir = os.path.join(
            preds_dir, meeting_id, f"t_{thr}", f"l_{min_len}"
        )
        if not os.path.isdir(tg_dir):
            print(f"WARNING: no prediction dir {tg_dir}; skipping", flush=True)
            continue
        frames.append(textgrid_to_df(tg_dir, store))
    preds = (
        pd.concat(frames, ignore_index=True)
        if frames
        else pd.DataFrame(columns=PRED_COLS)
    )
    preds_path = os.path.join(out_dir, f"{meeting_id}_preds.csv")
    preds.to_csv(preds_path, index=False)
    return transc_path, preds_path


def stats_for_different_min_lengths(
    preds_dir: str,
    store: TranscriptStore,
    min_lengths: Optional[List[float]] = None,
    cfg: AnalysisConfig = ANALYSIS,
    out_path: Optional[str] = None,
    verbose: bool = False,
) -> pd.DataFrame:
    """Sensitivity of the corpus sweep stats to the laugh-VALIDITY
    ``min_length`` (the transcript-side rule that routes short laughs into
    the invalid index — indices.invalid_mask), not the prediction-side
    ``min_len`` smoothing parameter.

    Working redesign of reference analyse.py:431-479, which is broken two
    ways: the index-recreation lines are commented out ("NEED TO CHANGED THE
    FOLLOWING TWO LINES", :447-449) so mutating the global MIN_LENGTH never
    reaches preprocess, and create_evaluation_df reads the cached eval_df,
    so every iteration returns identical numbers.  Here each ``min_length``
    rebuilds the interval indices via :func:`indices.build_indices` with a
    replaced config and re-evaluates the predictions with caching OFF.

    Default grid: 0.1..1.0 s in 0.1 steps (the reference's 5.2..8.0 s range
    is far outside any plausible validity rule — its own default is 0.2 s —
    and looks like leftover experiment state).

    Output columns: the calc_sum_stats sweep (threshold, min_len, precision,
    recall, f1) plus ``min_length`` and the per-grid-point corpus totals the
    reference printed to stdout (:460-475): ``laugh_tot_len``,
    ``laugh_events``, ``invalid_tot_len``, ``invalid_events``.
    """
    if min_lengths is None:
        min_lengths = [round(0.1 * k, 1) for k in range(1, 11)]
    import dataclasses as _dc

    frames: List[pd.DataFrame] = []
    for ml in min_lengths:
        cfg_ml = _dc.replace(cfg, min_length=float(ml))
        idx = indices_lib.build_indices(store, cfg=cfg_ml)
        eval_df = create_evaluation_df(
            preds_dir, store, idx, out_path=None, use_cache=False, verbose=verbose
        )
        stats = calc_sum_stats(eval_df)
        stats["min_length"] = float(ml)
        stats["laugh_tot_len"] = sum(idx.laugh.tot_len.values())
        stats["laugh_events"] = int(sum(idx.laugh.tot_events.values()))
        stats["invalid_tot_len"] = sum(idx.invalid.tot_len.values())
        stats["invalid_events"] = int(sum(idx.invalid.tot_events.values()))
        frames.append(stats)
        if verbose:
            print(
                f"min_length={ml}: laugh={stats['laugh_tot_len'].iloc[0]:.2f}s/"
                f"{stats['laugh_events'].iloc[0]} events, invalid="
                f"{stats['invalid_tot_len'].iloc[0]:.2f}s/"
                f"{stats['invalid_events'].iloc[0]} events",
                flush=True,
            )
    result = pd.concat(frames, ignore_index=True)
    if out_path:
        result.to_csv(out_path, index=False)
    return result


def analyse(
    preds_dir: str,
    transcript_dir: Optional[str] = None,
    cfg: AnalysisConfig = ANALYSIS,
    force: bool = False,
) -> pd.DataFrame:
    """Evaluate a prediction dir; writes ``<split>_sum_stats.csv`` and
    ``<split>_eval_df_per_meeting.csv`` next to it (reference
    analyse.py:508-539).  Returns the summary stats."""
    if cfg.frame_duration_ms != 1:
        # Every to_frames/to_sec call in this module and indices.py runs at
        # the reference's fixed 1 ms resolution (reference config.py:46);
        # accepting another value would change only the cache key while the
        # computation stayed at 1 ms — fail loudly instead.  BEFORE the
        # cache check: returning a cached 1 ms CSV to a 10 ms cfg would
        # bypass this guard exactly when it matters.
        raise NotImplementedError(
            f"analyse() evaluates at 1 ms frames (reference semantics); got "
            f"cfg.frame_duration_ms={cfg.frame_duration_ms}"
        )
    preds_path = Path(preds_dir)
    split = preds_path.name
    sum_stats_path = preds_path.parent / f"{split}_{cfg.sum_stats_cache_file}"
    eval_df_path = preds_path.parent / f"{split}_{cfg.eval_df_cache_file}"
    if not force and sum_stats_path.is_file():
        return pd.read_csv(sum_stats_path)
    store = transcript_lib.load(transcript_dir)
    idx = indices_lib.load(
        store, force_recompute=cfg.force_index_recompute, cfg=cfg
    )
    eval_df = create_evaluation_df(
        str(preds_path), store, idx, out_path=str(eval_df_path), use_cache=not force
    )
    sum_stats = calc_sum_stats(eval_df)
    sum_stats.to_csv(sum_stats_path, index=False)
    return sum_stats

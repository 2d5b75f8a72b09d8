"""Per-meeting / per-participant interval indices over the ground truth.

Fresh implementation of reference analysis/preprocess.py:13-167: turn the
transcript segment tables into laugh / invalid / speech / noise / silence
interval indices at 1 ms frame resolution, using our exact
:class:`~laughter_detection_icsi_tpu.eval.intervals.IntervalSet` algebra
instead of the portion library.

Validity rule (reference preprocess.py:13-24): a transcribed laugh shorter
than ``min_length`` (0.2 s) or typed 'breath-laugh' is INVALID — it is moved
into the invalid index and excluded from evaluation.

Index structure: ``index.sets[meeting_id][part_id] -> IntervalSet`` plus
per-meeting ``tot_len`` (seconds) and ``tot_events`` counters (reference
preprocess.py:27-46).

Unlike the reference this module has no import-time side effects; build via
:func:`build_indices` or the cached :func:`load`.
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
import pickle
from pathlib import Path
from typing import Dict, Optional

import pandas as pd

from laughter_detection_icsi_tpu.config import ANALYSIS, AnalysisConfig
from laughter_detection_icsi_tpu.eval.intervals import IntervalSet, to_frames, to_sec
from laughter_detection_icsi_tpu.eval.transcript import TranscriptStore


@dataclasses.dataclass
class Index:
    """Interval index per (meeting, participant) with per-meeting totals."""

    sets: Dict[str, Dict[str, IntervalSet]] = dataclasses.field(default_factory=dict)
    tot_len: Dict[str, float] = dataclasses.field(default_factory=dict)  # seconds
    tot_events: Dict[str, int] = dataclasses.field(default_factory=dict)

    def get(self, meeting_id: str, part_id: str) -> IntervalSet:
        """Empty set if the (meeting, participant) has no entries (reference
        preprocess.py:123-130)."""
        return self.sets.get(meeting_id, {}).get(part_id, IntervalSet.empty())

    def has_part(self, meeting_id: str, part_id: str) -> bool:
        return part_id in self.sets.get(meeting_id, {})

    def ensure_meeting(self, meeting_id: str) -> None:
        self.sets.setdefault(meeting_id, {})
        self.tot_len.setdefault(meeting_id, 0.0)
        self.tot_events.setdefault(meeting_id, 0)

    def add(self, meeting_id: str, part_id: str, start_s: float, end_s: float) -> None:
        """Append one segment (reference preprocess.py:27-46).  The reference
        accumulates tot_len per appended segment *before* union-merging, so
        overlapping transcriptions are double counted there too — we keep that
        accounting (sum of segment lengths, not union length)."""
        self.ensure_meeting(meeting_id)
        seg = IntervalSet.openclosed(to_frames(start_s), to_frames(end_s))
        cur = self.sets[meeting_id].get(part_id, IntervalSet.empty())
        self.sets[meeting_id][part_id] = cur | seg
        self.tot_len[meeting_id] += to_sec(seg.length())
        self.tot_events[meeting_id] += 1

    def add_many(self, meeting_id: str, part_id: str, spans_s) -> None:
        """Bulk :meth:`add`: one normalize pass over all of a participant's
        segments instead of one union per row (the per-row union rebuilds
        the full sorted set each time — O(n^2) per participant, material on
        the thousands-of-segments speech index).  Accounting is identical:
        per-segment tot_len (pre-union, PARITY #16) and one event per row."""
        self.ensure_meeting(meeting_id)
        pairs = []
        for start_s, end_s in spans_s:
            a, b = to_frames(start_s), to_frames(end_s)
            if b > a:
                pairs.append((a, b))
                self.tot_len[meeting_id] += to_sec(b - a)
            self.tot_events[meeting_id] += 1
        new = IntervalSet.from_pairs(pairs)
        cur = self.sets[meeting_id].get(part_id)
        self.sets[meeting_id][part_id] = (
            new if cur is None or cur.is_empty else cur | new
        )


@dataclasses.dataclass
class IndexStore:
    laugh: Index
    invalid: Index
    speech: Index
    noise: Index
    silence: Index


def invalid_mask(df: pd.DataFrame, cfg: AnalysisConfig = ANALYSIS) -> pd.Series:
    """THE laugh-validity rule, vectorized (reference preprocess.py:13-24):
    a laugh is invalid when too short or a breath-laugh.  One definition —
    ``seg_is_invalid`` and the index builder both evaluate this expression,
    so the rule cannot silently diverge between the scalar and bulk paths.
    """
    return (df["length"] < cfg.min_length) | (df["laugh_type"] == "breath-laugh")


def seg_is_invalid(row, cfg: AnalysisConfig = ANALYSIS) -> bool:
    """Scalar twin of :func:`invalid_mask` (reference preprocess.py:13-24)."""
    return bool(invalid_mask(pd.DataFrame([dict(row)]), cfg).iloc[0])


def index_from_df(df: pd.DataFrame) -> Index:
    """Reference preprocess.py:91-120."""
    index = Index()
    if df.empty:
        return index
    for meeting_id, meeting_df in df.groupby("meeting_id"):
        index.ensure_meeting(meeting_id)
        for part_id, part_df in meeting_df.sort_values("start").groupby("part_id"):
            index.add_many(
                meeting_id, part_id, zip(part_df["start"], part_df["end"])
            )
    return index


def laugh_index_from_df(
    df: pd.DataFrame, invalid_index: Index, cfg: AnalysisConfig = ANALYSIS
) -> Index:
    """Reference preprocess.py:49-88: invalid laughs (too short /
    breath-laugh) go to the invalid index instead."""
    index = Index()
    if df.empty:
        return index
    for meeting_id, meeting_df in df.groupby("meeting_id"):
        index.ensure_meeting(meeting_id)
        for part_id, part_df in meeting_df.sort_values("start").groupby("part_id"):
            # The reference pre-creates an (empty) entry per participant
            # (preprocess.py:76); matters for `part_id in index` checks.
            index.sets[meeting_id].setdefault(part_id, IntervalSet.empty())
            # vectorized (one Python call per corpus laugh row adds up;
            # add_many was rewritten for the same reason)
            bad = invalid_mask(part_df, cfg)
            if bool(bad.any()):
                inv = part_df[bad]
                invalid_index.add_many(
                    meeting_id, part_id, zip(inv["start"], inv["end"])
                )
            good = part_df[~bad]
            if len(good):
                index.add_many(
                    meeting_id, part_id, zip(good["start"], good["end"])
                )
    return index


def silence_index_from(
    store: TranscriptStore,
    laugh: Index,
    invalid: Index,
    noise: Index,
    speech: Index,
) -> Index:
    """Whole channel minus every transcribed segment (reference
    preprocess.py:133-167)."""
    index = Index()
    for _, row in store.info_df.iterrows():
        meeting_id, part_id = row["meeting_id"], row["part_id"]
        index.ensure_meeting(meeting_id)
        full = IntervalSet.openclosed(0, to_frames(row["length"]))
        silence = (
            full
            - laugh.get(meeting_id, part_id)
            - invalid.get(meeting_id, part_id)
            - speech.get(meeting_id, part_id)
            - noise.get(meeting_id, part_id)
        )
        index.sets[meeting_id][part_id] = silence
        index.tot_len[meeting_id] += to_sec(silence.length())
    return index


def build_indices(store: TranscriptStore, cfg: AnalysisConfig = ANALYSIS) -> IndexStore:
    if cfg.frame_duration_ms != 1:
        # to_frames is fixed at 1 ms; building anyway would return 1 ms
        # indices PRESENTED as another resolution — wrong results with no
        # error for any caller bypassing analyse()'s identical guard.
        raise NotImplementedError(
            "index construction is fixed at 1 ms interval resolution; "
            f"got frame_duration_ms={cfg.frame_duration_ms}"
        )
    invalid = index_from_df(store.invalid_df)
    laugh = laugh_index_from_df(store.laugh_only_df, invalid_index=invalid, cfg=cfg)
    speech = index_from_df(store.speech_df)
    noise = index_from_df(store.noise_df)
    # Evaluation walks every meeting dir and reads laugh totals
    # (reference analyse.py:159-161); make sure every known meeting exists.
    for meeting_id in store.meeting_ids:
        for idx in (laugh, invalid, speech, noise):
            idx.ensure_meeting(meeting_id)
    silence = silence_index_from(store, laugh, invalid, noise, speech)
    return IndexStore(
        laugh=laugh, invalid=invalid, speech=speech, noise=noise, silence=silence
    )


# --------------------------------------------------------------------------- #
# Disk cache (reference preprocess.py:170-213 caches to
# .cache/preprocessed_indices.pkl; ours is keyed by the transcript dir content
# so a changed corpus never reads a stale cache).
# --------------------------------------------------------------------------- #


def _cache_key(transcript_dir: str, cfg: AnalysisConfig = None) -> str:
    cfg = cfg if cfg is not None else ANALYSIS
    h = hashlib.sha1()
    # The indices depend on the analysis config as well as the corpus:
    # min_length moves laughs between the laugh and invalid indices — a
    # config change must miss the cache or evaluation silently runs on the
    # wrong split.  (frame_duration_ms stays in the key for forward compat,
    # but build_indices currently rejects anything but 1 ms.)
    h.update(f"cfg:{cfg.min_length}:{cfg.frame_duration_ms}".encode())
    tdir = Path(transcript_dir)
    for p in sorted(tdir.glob("*.mrt")):
        st = p.stat()
        h.update(f"{p.name}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


_INDEX_CACHE: Dict[str, IndexStore] = {}


def load(
    store: TranscriptStore,
    cache_dir: Optional[str] = None,
    force_recompute: bool = False,
    cfg: AnalysisConfig = ANALYSIS,
) -> IndexStore:
    key = _cache_key(store.transcript_dir, cfg)
    # Same eviction discipline as transcript._STORE_CACHE: entries for the
    # same transcript dir whose content key was superseded are dropped,
    # otherwise every corpus update in a long-running process leaks a
    # whole corpus-wide IndexStore in this module-global dict forever.
    mem_prefix = f"{Path(store.transcript_dir).resolve()}#"
    mem_key = mem_prefix + key
    if not force_recompute and mem_key in _INDEX_CACHE:
        return _INDEX_CACHE[mem_key]

    def _publish(indices: IndexStore) -> None:
        for old in [k for k in _INDEX_CACHE if k.startswith(mem_prefix)]:
            del _INDEX_CACHE[old]
        _INDEX_CACHE[mem_key] = indices

    cache_file = None
    if cache_dir is not None:
        cache_file = Path(cache_dir) / f"indices_{key}.pkl"
        if not force_recompute and cache_file.is_file():
            with open(cache_file, "rb") as f:
                indices = pickle.load(f)
            _publish(indices)
            return indices
    indices = build_indices(store, cfg=cfg)
    _publish(indices)
    if cache_file is not None:
        cache_file.parent.mkdir(parents=True, exist_ok=True)
        # Atomic publish: a crash mid-dump must not leave a truncated pickle
        # that poisons every later load for this key.
        tmp = cache_file.with_name(cache_file.name + f".tmp.{os.getpid()}")
        with open(tmp, "wb") as f:
            pickle.dump(indices, f)
        os.replace(tmp, cache_file)
    return indices

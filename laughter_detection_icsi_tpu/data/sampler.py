"""Training-sample generation: laugh + matched non-laugh segment tables.

Rebuild of reference create_data_df.py:32-206 without import-time globals:
takes an explicit TranscriptStore + IndexStore and produces the
train/dev/test ``*_df.csv`` tables with the reference schema
[start, duration, sub_start, sub_duration, audio_path, meeting_id, chan_id,
label].

Sampling semantics mirrored:
- seeded ``np.random.seed(23)`` (reference create_data_df.py:109; config.py:57);
- per transcribed laugh, ``num_laugh`` 1 s subsamples inside the laugh
  (reference :160-168) and ``num_non_laugh`` matched non-laugh segments;
- structured mode: 70% silence (rejection-sampled against the silence
  index), 10% noise, remainder speech (reference :139-156).  The reference
  accidentally draws its "noise" rows from speech_df (SURVEY.md §2.5-3);
  we sample noise_df, with ``noise_from_speech_bug=True`` restoring the
  reference behavior for parity runs;
- random mode: any segment not overlapping laugh/invalid (reference :32-63);
- non-laugh durations floored at the 1 s subsample duration (reference :40);
- all floats rounded to 2 decimals; sanity asserts kept (reference :170-203).
"""

from __future__ import annotations

import math
import os
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

from laughter_detection_icsi_tpu.config import ANALYSIS, PARTITIONS, AnalysisConfig, split_of_meeting
from laughter_detection_icsi_tpu.eval.indices import IndexStore
from laughter_detection_icsi_tpu.eval.intervals import IntervalSet, to_frames
from laughter_detection_icsi_tpu.eval.transcript import TranscriptStore

COLS = [
    "start",
    "duration",
    "sub_start",
    "sub_duration",
    "audio_path",
    "meeting_id",
    "chan_id",
    "label",
]


def _audio_path(meeting_id: str, chan_id: str) -> str:
    """data_df audio_path column: always '/'-separated (the reference's CSV
    format and _sanity_check's split both assume it, even on Windows)."""
    return f"{meeting_id}/{chan_id}.sph"


def get_subsample(start: float, duration: float, subsample_duration: float, rng) -> tuple:
    """Uniform subsample of ``subsample_duration`` within [start, start+duration]
    (reference create_data_df.py:84-95)."""
    sub_dur = min(duration, subsample_duration)
    sub_start = rng.uniform(start, start + duration - sub_dur)
    return sub_start, sub_dur


class DataFrameSampler:
    """Stateful sampler bound to one corpus (store + indices)."""

    def __init__(
        self,
        store: TranscriptStore,
        idx: IndexStore,
        cfg: AnalysisConfig = ANALYSIS,
        noise_from_speech_bug: bool = False,
    ):
        self.store = store
        self.idx = idx
        self.cfg = cfg
        self.noise_from_speech_bug = noise_from_speech_bug
        self.rng = np.random  # reference uses the global numpy RNG, seeded
        # Per-meeting sub-frames, grouped once per source DataFrame: the
        # O(|df|) boolean filter per sampled row dominated table generation
        # (laughs x samples x |speech_df| scans).  Grouping preserves
        # within-meeting row order, so iloc-based draws are unchanged.
        # Each entry holds the SOURCE df alongside the groups: a bare
        # id(df) key does not keep df alive, and CPython reuses freed
        # addresses — a caller looping over temporary filtered frames could
        # silently draw rows from a PREVIOUS iteration's table.  Storing
        # the df pins the id, and the identity check below makes the key
        # collision impossible even across unrelated caches.
        self._group_cache: Dict[
            int, Tuple[pd.DataFrame, Dict[str, pd.DataFrame]]
        ] = {}

    def _meeting_rows(self, df: pd.DataFrame, meeting_id: str) -> pd.DataFrame:
        hit = self._group_cache.get(id(df))
        if hit is None or hit[0] is not df:
            groups = {k: g for k, g in df.groupby("meeting_id")}
            self._group_cache[id(df)] = (df, groups)
        else:
            groups = hit[1]
        return groups.get(meeting_id, df.iloc[0:0])

    # ------------------------------------------------------------------ #

    def random_non_laugh(
        self, duration: float, meeting_id: str, silence: bool = False
    ) -> List:
        """A random segment from any channel of the meeting that does not
        overlap laugh/invalid (and, for ``silence=True``, lies fully inside
        the silence index) — rejection sampling (reference
        create_data_df.py:32-63).  A loop, not recursion: at rejection rates
        near 1, recursion would hit Python's stack limit (RecursionError
        from pandas internals) before any attempt cap and lose this clear
        diagnostic."""
        duration = max(duration, self.cfg.subsample_duration)
        info = self._meeting_rows(self.store.info_df, meeting_id)
        if info.empty:
            # Without this, randint(0, 0) raises a context-free ValueError.
            raise RuntimeError(
                f"no channel info for meeting {meeting_id} "
                "(meeting absent from the transcript info table)"
            )
        for _attempt in range(1001):
            row = info.iloc[self.rng.randint(0, info.shape[0])]
            if row.length <= duration:
                continue
            start = self.rng.uniform(0, row.length - duration)
            seg = IntervalSet.closed(to_frames(start), to_frames(start + duration))
            part_id = row.part_id
            if silence:
                if not self.idx.silence.get(meeting_id, part_id).contains(seg):
                    continue
            elif self.idx.laugh.get(meeting_id, part_id).overlaps(seg) or (
                self.idx.invalid.get(meeting_id, part_id).overlaps(seg)
            ):
                continue
            sub_start, sub_dur = get_subsample(
                start, duration, self.cfg.subsample_duration, self.rng
            )
            audio_path = _audio_path(meeting_id, row.chan_id)
            return [
                start, duration, sub_start, sub_dur, audio_path,
                meeting_id, row.chan_id, 0,
            ]
        raise RuntimeError(
            f"rejection sampling failed for meeting {meeting_id} "
            f"(duration {duration}s)"
        )

    def random_from_df(self, duration: float, meeting_id: str, df: pd.DataFrame) -> List:
        """A random transcribed segment of the given kind (reference
        create_data_df.py:65-81).

        Note the reference clamps ``duration`` and then never uses it —
        speech/noise negatives are NOT duration-matched to their laugh; the
        sampled row's own span is used.  Matched deliberately (PARITY #21).
        """
        duration = max(duration, self.cfg.subsample_duration)
        rows = self._meeting_rows(df, meeting_id)
        if rows.empty:
            # The reference crashes here (df.sample on empty); meetings with
            # no transcribed segments of a kind fall back to random non-laugh.
            return self.random_non_laugh(duration, meeting_id)
        row = rows.iloc[self.rng.randint(0, rows.shape[0])]
        sub_start, sub_dur = get_subsample(
            row.start, row.length, self.cfg.subsample_duration, self.rng
        )
        audio_path = _audio_path(row.meeting_id, row.chan_id)
        return [
            row.start,
            row.length,
            sub_start,
            sub_dur,
            audio_path,
            meeting_id,
            row.chan_id,
            0,
        ]

    # ------------------------------------------------------------------ #

    def create_data_dfs(
        self,
        num_laugh_samples: int = 1,
        num_non_laugh_samples: int = 1,
        meeting_id: Optional[str] = None,
        chan_id: Optional[str] = None,
        random: bool = False,
    ) -> Dict[str, pd.DataFrame]:
        """The three split tables (reference create_data_df.py:98-206)."""
        self.rng.seed(self.cfg.random_seed)
        if chan_id and not meeting_id:
            # chan ids are only meaningful within a meeting; silently
            # dropping the filter would sample the full corpus.
            raise ValueError("chan_id filter requires meeting_id")
        laughs = self.store.laugh_only_df
        if meeting_id:
            laughs = laughs[laughs.meeting_id == meeting_id]
            if chan_id:
                laughs = laughs[laughs.chan_id == chan_id]

        non_laugh: Dict[str, List] = {s: [] for s in PARTITIONS}
        laugh_rows: Dict[str, List] = {s: [] for s in PARTITIONS}

        if not random:
            silence_n = math.floor(num_non_laugh_samples * 0.7)
            noise_n = math.floor(num_non_laugh_samples * 0.1)
            speech_n = num_non_laugh_samples - silence_n - noise_n
            noise_df = (
                self.store.speech_df
                if self.noise_from_speech_bug
                else self.store.noise_df
            )

        for mid, meeting_laughs in laughs.groupby("meeting_id"):
            split = split_of_meeting(mid)
            for _, seg in meeting_laughs.iterrows():
                if random:
                    for _ in range(num_non_laugh_samples):
                        non_laugh[split].append(self.random_non_laugh(seg.length, mid))
                else:
                    for _ in range(speech_n):
                        non_laugh[split].append(
                            self.random_from_df(seg.length, mid, self.store.speech_df)
                        )
                    for _ in range(noise_n):
                        non_laugh[split].append(
                            self.random_from_df(seg.length, mid, noise_df)
                        )
                    for _ in range(silence_n):
                        non_laugh[split].append(
                            self.random_non_laugh(seg.length, mid, silence=True)
                        )
                audio_path = _audio_path(mid, seg.chan_id)
                for _ in range(num_laugh_samples):
                    sub_start, sub_dur = get_subsample(
                        seg.start, seg.length, self.cfg.subsample_duration, self.rng
                    )
                    laugh_rows[split].append(
                        [seg.start, seg.length, sub_start, sub_dur, audio_path, mid, seg.chan_id, 1]
                    )

        out: Dict[str, pd.DataFrame] = {}
        for split in PARTITIONS:
            df = pd.concat(
                [
                    pd.DataFrame(non_laugh[split], columns=COLS),
                    pd.DataFrame(laugh_rows[split], columns=COLS),
                ],
                ignore_index=True,
            ).round(self.cfg.float_decimals)
            _sanity_check(df, split)
            out[split] = df
        return out


def _sanity_check(df: pd.DataFrame, split: str) -> None:
    """reference create_data_df.py:185-203."""
    if df.empty:
        return
    assert (df.start < 0).sum() == 0, "negative start-time"
    assert (df.duration < 0).sum() == 0, "negative duration"
    assert (df.sub_start < 0).sum() == 0, "negative sub_start"
    assert (df.sub_duration < 0).sum() == 0, "negative sub_duration"
    assert (~df.label.isin([0, 1])).sum() == 0, "labels must be 0/1"
    meeting_ids = {p.split("/")[0] for p in df.audio_path.unique()}
    mismatched = meeting_ids - set(PARTITIONS[split])
    assert not mismatched, f"meetings {mismatched} not in split {split}"


def write_data_dfs(dfs: Dict[str, pd.DataFrame], data_dir: str) -> None:
    Path(data_dir).mkdir(parents=True, exist_ok=True)
    for split, df in dfs.items():
        df.to_csv(os.path.join(data_dir, f"{split}_df.csv"), index=False)

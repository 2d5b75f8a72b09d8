"""Corpus featurization CLI (reference compute_features.py:266-294).

Reads configuration from flags or the reference's ``.env`` variables
(AUDIO_DIR, TRANSCRIPT_DIR, OUTPUT_DIR/SPLIT_FEAT_DIR — reference
sample.env:1-7) and computes on-device log-mel features for every
(meeting, channel) track the transcripts know about, into the framework's
FeatureCache.  The reference's stage 2 (per-sample manifest surgery,
compute_features.py:114-195) has no equivalent step here by design: cuts are
resolved directly against the cache at batch time (data/dataset.py).
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import List, Optional

from pathlib import Path

# Allow running as a script from a clean checkout (sys.path[0] is cli/)
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--audio_dir", type=str, default=None,
                   help="root with <meeting>/<chan>.sph (env AUDIO_DIR)")
    p.add_argument("--transcript_dir", type=str, default=None,
                   help="dir with preambles.mrt + <meeting>.mrt (env TRANSCRIPT_DIR)")
    p.add_argument("--output_dir", type=str, default=None,
                   help="feature cache dir (env OUTPUT_DIR / SPLIT_FEAT_DIR)")
    p.add_argument("--splits", type=str, default="train,dev,test",
                   help="comma-separated splits to featurize")
    p.add_argument("--meetings", type=str, default=None,
                   help="comma-separated meeting IDs (default: all in splits)")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "float16"])
    p.add_argument("--env_file", type=str, default=".env")
    return p


def main(argv: Optional[List[str]] = None) -> int:
    from laughter_detection_icsi_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    args = build_parser().parse_args(argv)

    import numpy as np

    from laughter_detection_icsi_tpu.config import load_env, split_of_meeting
    from laughter_detection_icsi_tpu.data import FeatureCache
    from laughter_detection_icsi_tpu.eval import transcript as transcript_lib

    load_env(args.env_file)
    audio_dir = args.audio_dir or os.environ.get("AUDIO_DIR")
    transcript_dir = args.transcript_dir or os.environ.get("TRANSCRIPT_DIR")
    output_dir = (
        args.output_dir
        or os.environ.get("OUTPUT_DIR")
        or os.environ.get("SPLIT_FEAT_DIR")
    )
    if not (audio_dir and transcript_dir and output_dir):
        raise SystemExit(
            "need --audio_dir/--transcript_dir/--output_dir (or AUDIO_DIR/"
            "TRANSCRIPT_DIR/OUTPUT_DIR in the environment or .env)"
        )

    # strip(): "train, dev" must mean train+dev, not silently match nothing
    splits = {s.strip() for s in args.splits.split(",") if s.strip()}
    bad = splits - {"train", "dev", "test"}
    if bad:
        # a typo ('val') would filter every meeting and exit 0 having
        # featurized nothing
        raise SystemExit(
            f"unknown splits: {', '.join(sorted(bad))} (use train/dev/test)"
        )
    store = transcript_lib.TranscriptStore(transcript_dir)
    wanted_meetings = (
        {m.strip() for m in args.meetings.split(",") if m.strip()}
        if args.meetings
        else None
    )
    if wanted_meetings:
        unknown = wanted_meetings - set(store.meeting_ids)
        if unknown:
            # same reasoning as the --splits guard above: a typo'd meeting
            # ID must not featurize nothing and exit 0
            raise SystemExit(
                f"unknown meetings: {', '.join(sorted(unknown))} "
                f"(known: {', '.join(store.meeting_ids)})"
            )
        # A KNOWN meeting outside the selected splits is the same silent
        # no-op (e.g. --meetings Bmr021 --splits train when Bmr021 is dev):
        # the guard must check the split-filtered set, not just existence.
        in_splits = {
            m for m in wanted_meetings if split_of_meeting(m) in splits
        }
        if not in_splits:
            raise SystemExit(
                f"none of the requested meetings belong to splits "
                f"{sorted(splits)}; pass --splits all or the right split"
            )
    cache = FeatureCache(output_dir)
    dtype = np.float16 if args.dtype == "float16" else np.float32

    done = skipped = missing = 0
    for _, row in store.info_df.iterrows():
        if split_of_meeting(row.meeting_id) not in splits:
            continue
        if wanted_meetings and row.meeting_id not in wanted_meetings:
            continue
        # dtype-aware: rerunning with --dtype float16 against a float32
        # cache must re-featurize, not silently no-op
        if cache.has(row.meeting_id, row.chan_id, dtype=dtype):
            skipped += 1
            continue
        from laughter_detection_icsi_tpu.data.audio import find_track_audio

        path = find_track_audio(audio_dir, row.meeting_id, row.chan_id)
        if path is None:
            print(f"missing audio: {row.meeting_id}/{row.chan_id}.sph (and .wav)")
            missing += 1
            continue
        print(f"featurizing {row.meeting_id}/{row.chan_id} ...", flush=True)
        cache.add_audio_file(row.meeting_id, row.chan_id, path, dtype=dtype)
        done += 1
    print(f"done: {done} featurized, {skipped} cached, {missing} missing")
    return 0 if missing == 0 else 1


if __name__ == "__main__":
    sys.exit(main())

"""Evaluation CLI (reference analysis/analyse.py:541-547):
``python analyse.py <preds_dir>`` with optional transcript override."""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

from pathlib import Path

# Allow running as a script from a clean checkout (sys.path[0] is cli/)
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("preds_dir", type=str, nargs="?", default=None,
                   help="dir of <meeting>/t_<thr>/l_<minlen>/chanN.TextGrid")
    p.add_argument("--transcript_dir", type=str, default=None,
                   help="defaults to $TRANSCRIPT_DIR (via --env_file) or "
                        "the repo-local corpus layout")
    p.add_argument("--env_file", type=str, default=".env",
                   help="dotenv file for TRANSCRIPT_DIR (reference "
                        "sample.env workflow, like compute_features)")
    p.add_argument("--force", action="store_true",
                   help="ignore cached eval CSVs")
    p.add_argument("--laugh_counts", action="store_true",
                   help="print per-meeting laugh-segment counts (all vs "
                        "laugh-only) from the transcripts and exit — the "
                        "reference's filter_all_laughs.sh / "
                        "filter_laugh_only.sh xmllint sweeps")
    return p


def main(argv: Optional[List[str]] = None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.transcript_dir is None:
        # Honor the .env/TRANSCRIPT_DIR convention the other CLIs follow
        # (reference sample.env workflow) before falling back to the
        # repo-local default inside the library.
        import os

        from laughter_detection_icsi_tpu.config import load_env

        load_env(args.env_file)
        args.transcript_dir = os.environ.get("TRANSCRIPT_DIR")
    if args.laugh_counts:
        import os

        from laughter_detection_icsi_tpu.config import ANALYSIS
        from laughter_detection_icsi_tpu.eval.transcript import count_laugh_segments

        tdir = args.transcript_dir or ANALYSIS.transcript_dir
        if not os.path.isdir(tdir):
            parser.error(f"transcript dir not found: {tdir}")
        counts = count_laugh_segments(tdir)
        if not counts:
            parser.error(f"no .mrt transcripts under {tdir}")
        all_sum = only_sum = 0
        for meeting, (n_all, n_only) in counts.items():
            print(f"{meeting}: all={n_all} laugh_only={n_only}")
            all_sum += n_all
            only_sum += n_only
        print(f"total: all={all_sum} laugh_only={only_sum}")
        return 0
    if args.preds_dir is None:
        parser.error("preds_dir is required unless --laugh_counts")
    from laughter_detection_icsi_tpu.eval.analyse import analyse, average_precision

    stats = analyse(
        args.preds_dir, transcript_dir=args.transcript_dir, force=args.force
    )
    print(stats.to_string(index=False))
    if "f1" in stats.columns and len(stats):
        # Summary quality numbers (BASELINE.md's parity target is F1/AP).
        f1 = stats["f1"]
        if f1.notna().any():
            best = stats.loc[f1.idxmax()]
            print(
                f"best F1 = {best['f1']:.4f} at threshold={best['threshold']} "
                f"min_len={best['min_len']}"
            )
        for ml in sorted(stats["min_len"].unique()):
            ap = average_precision(stats, ml)
            print(f"AP(min_len={ml}) = {ap:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

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
    p.add_argument("--min_length_sweep", type=str, default=None,
                   metavar="L1,L2,...",
                   help="re-evaluate the sweep at each laugh-validity "
                        "min_length (comma list of seconds, or 'default' "
                        "for 0.1..1.0 step 0.1), rebuilding the interval "
                        "indices per value; writes "
                        "<split>_sum_stats_for_different_min_lengths.csv "
                        "next to preds_dir (working redesign of reference "
                        "analyse.py:431-479, which is broken)")
    p.add_argument("--meeting_csvs", type=str, default=None, metavar="MEETING",
                   help="export <meeting>_transc.csv + <meeting>_preds.csv "
                        "for one meeting (reference analyse.py:481-506); "
                        "needs preds_dir")
    p.add_argument("--breath_laugh_csv", type=str, default=None, metavar="PATH",
                   help="export transcribed breath-laugh events to PATH "
                        "for listening audits via laughs_to_wav "
                        "(reference analyse.py:420-428); no preds_dir needed")
    p.add_argument("--out_dir", type=str, default=".",
                   help="output dir for --meeting_csvs exports")
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
    if args.breath_laugh_csv is not None:
        from laughter_detection_icsi_tpu.eval import transcript as transcript_lib
        from laughter_detection_icsi_tpu.eval.analyse import laugh_df_to_csv

        store = transcript_lib.load(args.transcript_dir)
        n = laugh_df_to_csv(store.laugh_only_df, args.breath_laugh_csv)
        print(f"wrote {n} breath-laugh rows to {args.breath_laugh_csv}")
        if args.preds_dir is None and args.meeting_csvs is None:
            return 0
    if args.preds_dir is None:
        parser.error(
            "preds_dir is required unless --laugh_counts/--breath_laugh_csv"
        )
    if args.meeting_csvs is not None:
        from laughter_detection_icsi_tpu.eval import transcript as transcript_lib
        from laughter_detection_icsi_tpu.eval.analyse import create_csvs_for_meeting

        store = transcript_lib.load(args.transcript_dir)
        transc_path, preds_path = create_csvs_for_meeting(
            args.meeting_csvs, args.preds_dir, store, out_dir=args.out_dir
        )
        print(f"wrote {transc_path} and {preds_path}")
        return 0
    if args.min_length_sweep is not None:
        from pathlib import Path as _Path

        from laughter_detection_icsi_tpu.eval import transcript as transcript_lib
        from laughter_detection_icsi_tpu.eval.analyse import (
            stats_for_different_min_lengths,
        )

        if args.min_length_sweep.strip().lower() == "default":
            lengths = None
        else:
            try:
                lengths = [float(s) for s in args.min_length_sweep.split(",")]
            except ValueError:
                parser.error(
                    f"--min_length_sweep must be a comma list of floats or "
                    f"'default' (got {args.min_length_sweep!r})"
                )
        store = transcript_lib.load(args.transcript_dir)
        preds_path = _Path(args.preds_dir)
        out = (
            preds_path.parent
            / f"{preds_path.name}_sum_stats_for_different_min_lengths.csv"
        )
        df = stats_for_different_min_lengths(
            args.preds_dir, store, min_lengths=lengths,
            out_path=str(out), verbose=True,
        )
        print(df.to_string(index=False))
        print(f"wrote {out}")
        return 0
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

"""Visualisation CLI (reference visualise.py): plots from training metrics
and evaluation CSVs."""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

from pathlib import Path

# Allow running as a script from a clean checkout (sys.path[0] is cli/)
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("what", choices=["train", "pr", "confusion", "compare"])
    p.add_argument("inputs", nargs="+",
                   help="train: metrics.csv | pr/confusion: eval CSVs | "
                        "compare: name=path pairs of sum_stats CSVs")
    p.add_argument("--out", type=str, required=True, help="output PNG path")
    p.add_argument("--min_len", type=float, default=None)
    p.add_argument("--title", type=str, default=None)
    return p


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    from laughter_detection_icsi_tpu import viz

    if args.what != "compare" and len(args.inputs) > 1:
        # Only compare consumes multiple inputs; silently plotting just the
        # first would report success for a figure missing the others.
        raise SystemExit(
            f"{args.what} takes exactly one input CSV "
            f"(got {len(args.inputs)}); use 'compare' for multiple runs"
        )
    if args.what == "train":
        viz.plot_train_metrics(args.inputs[0], out_path=args.out, title=args.title)
    elif args.what == "pr":
        viz.plot_precision_recall(args.inputs[0], out_path=args.out)
    elif args.what == "confusion":
        viz.plot_fp_confusion(
            args.inputs[0], out_path=args.out, min_len=args.min_len
        )
    else:
        bad = [s for s in args.inputs if "=" not in s]
        if bad:
            raise SystemExit(
                f"compare inputs must be name=path pairs (got {bad[0]!r})"
            )
        pairs = dict(s.split("=", 1) for s in args.inputs)
        if len(pairs) != len(args.inputs):
            # dict() keeps only the LAST duplicate — the 'comparison' would
            # silently contain one experiment labeled as two.
            raise SystemExit("compare experiment names must be unique")
        viz.plot_experiment_comparison(pairs, out_path=args.out, min_len=args.min_len)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

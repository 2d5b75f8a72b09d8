"""Evaluation CLI (reference analysis/analyse.py:541-547):
``python analyse.py <preds_dir>`` with optional transcript override."""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("preds_dir", type=str,
                   help="dir of <meeting>/t_<thr>/l_<minlen>/chanN.TextGrid")
    p.add_argument("--transcript_dir", type=str, default=None)
    p.add_argument("--force", action="store_true",
                   help="ignore cached eval CSVs")
    return p


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    from laughter_detection_icsi_tpu.eval.analyse import analyse

    stats = analyse(
        args.preds_dir, transcript_dir=args.transcript_dir, force=args.force
    )
    print(stats.to_string(index=False))
    return 0


if __name__ == "__main__":
    sys.exit(main())

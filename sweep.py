#!/usr/bin/env python
"""Corpus-scale sweep wrapper: delegates to cli/sweep.py (replaces the
reference's cluster_scripts Slurm fan-out)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from cli.sweep import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Reference-compatible wrapper: delegates to cli/compute_features.py
(same flags as the reference's compute_features.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from cli.compute_features import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Reference-compatible wrapper: delegates to cli/segment_laughter.py
(same flags as the reference's segment_laughter.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from cli.segment_laughter import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main())

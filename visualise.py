#!/usr/bin/env python
"""Reference-compatible wrapper: delegates to cli/visualise.py."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from cli.visualise import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main())

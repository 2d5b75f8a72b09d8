#!/usr/bin/env python
"""Wrapper: delegates to cli/laughs_to_wav.py."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from cli.laughs_to_wav import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main())

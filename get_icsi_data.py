#!/usr/bin/env python
"""Wrapper: delegates to cli/get_icsi_data.py."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from cli.get_icsi_data import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Wrapper: delegates to cli/probe_audio_loading.py."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from cli.probe_audio_loading import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main())

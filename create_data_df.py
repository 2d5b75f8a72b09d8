#!/usr/bin/env python
"""Reference-compatible wrapper: delegates to cli/create_data_df.py
(same flags as the reference's create_data_df.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from cli.create_data_df import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main())

"""Audio decode timing probe (reference
misc_scripts/check_librosa_loading_times.py:6-31): measures decode
real-time-factor at several offsets — our ranged reads are O(segment), the
point the reference's probe was making about librosa's O(file) decodes.
"""

from __future__ import annotations

import argparse
import sys
import time
from typing import List, Optional

from pathlib import Path

# Allow running as a script from a clean checkout (sys.path[0] is cli/)
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("audio_file", type=str)
    p.add_argument("--duration", type=float, default=5.0)
    p.add_argument("--offsets", type=str, default="0,60,600,1800")
    p.add_argument("--channel", type=int, default=0)
    return p


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    from laughter_detection_icsi_tpu.data import audio
    from laughter_detection_icsi_tpu.runtime import native

    meta = audio.info(args.audio_file)
    # Time what the pipeline actually runs: the native decoder when it
    # builds (runtime/native.py falls back to the Python codec itself, but
    # timing the Python path on a machine WITH the native library would
    # overstate decode cost by an order of magnitude).
    print(f"{args.audio_file}: {meta.duration:.1f}s @ {meta.sample_rate} Hz "
          f"({meta.container}/{meta.encoding}; "
          f"decoder {'native' if native.available() else 'python'})")
    for off in (float(o) for o in args.offsets.split(",")):
        if off >= meta.duration:
            # Say so: with the default offsets (0,60,600,1800) a short
            # file would otherwise print one row and silently drop three
            # probe points.
            print(f"offset {off:7.1f}s: skipped (past end of file)")
            continue
        t0 = time.perf_counter()
        wav, _ = native.read(
            args.audio_file, offset=off, duration=args.duration, channel=args.channel
        )
        dt = time.perf_counter() - t0
        rtf = dt / max(len(wav) / meta.sample_rate, 1e-9)
        print(f"offset {off:7.1f}s: {dt * 1e3:7.2f} ms for "
              f"{len(wav) / meta.sample_rate:.2f}s audio (RTF {rtf:.5f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""ICSI corpus downloader (reference get_icsi_data.py:1-9).

The reference wraps Lhotse's ``download_icsi``; this is a dependency-free
equivalent fetching the same public groups.inf.ed.ac.uk mirror: per-meeting
channel ``.sph`` audio plus the transcript bundle.  Gated on network access —
in air-gapped environments it prints the URL list (``--print_urls``) so the
corpus can be mirrored in manually.
"""

from __future__ import annotations

import argparse
import sys
import urllib.error
import urllib.request
from pathlib import Path
from typing import List, Optional


# Allow running as a script from a clean checkout (sys.path[0] is cli/)
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MIRROR = "https://groups.inf.ed.ac.uk/ami/ICSIsignals/SPH"
TRANSCRIPTS_URL = (
    "https://groups.inf.ed.ac.uk/ami/ICSICorpusAnnotations/ICSI_original_transcripts.zip"
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--audio_dir", type=str, required=True)
    p.add_argument("--transcript_dir", type=str, default=None)
    p.add_argument("--meetings", type=str, default=None,
                   help="comma-separated meeting IDs (default: all 75)")
    p.add_argument("--print_urls", action="store_true",
                   help="list download URLs without fetching")
    p.add_argument("--mirror", type=str, default=MIRROR)
    return p


def _is_network_error(e: BaseException) -> bool:
    """URLError covers only connect-time failures; a body-read stall raises
    socket.timeout/OSError inside copyfileobj and a premature server close
    raises http.client.IncompleteRead — all of them are 'network
    unavailable', not programming errors to traceback on.

    LOCAL filesystem OSErrors (disk full, permission, read-only fs) are
    carved back out: reporting ENOSPC as 'network unavailable' sends the
    user debugging the wrong thing.
    """
    import errno
    import http.client

    local = {errno.ENOSPC, errno.EACCES, errno.EROFS, errno.EDQUOT}
    if isinstance(e, OSError) and e.errno in local:
        return False
    return isinstance(
        e, (urllib.error.URLError, OSError, http.client.HTTPException)
    )


def _fetch(url: str, part: Path, timeout: float = 60.0) -> None:
    """Download ``url`` to ``part`` with a socket timeout — urlretrieve has
    none, so one stalled connection would hang the whole sequential
    download forever."""
    import shutil

    with urllib.request.urlopen(url, timeout=timeout) as resp:
        with open(part, "wb") as f:
            shutil.copyfileobj(resp, f)


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    from laughter_detection_icsi_tpu.config import PARTITIONS

    known = sorted(m for ms in PARTITIONS.values() for m in ms)
    if args.meetings:
        meetings = [m.strip() for m in args.meetings.split(",") if m.strip()]
        unknown = [m for m in meetings if m not in known]
        if unknown:
            # A typo'd ID would 404 on every channel and exit 0 having
            # fetched nothing — fail loudly instead.
            raise SystemExit(
                f"unknown meeting IDs: {', '.join(unknown)} "
                f"(known: {', '.join(known[:5])}, ...)"
            )
    else:
        meetings = known
    # Channel inventory differs per meeting; probe chan0..chanF.
    chan_names = [f"chan{i}" for i in range(10)] + [f"chan{c}" for c in "ABCDEF"]
    urls = [TRANSCRIPTS_URL] + [
        f"{args.mirror}/{m}/{c}.sph" for m in meetings for c in chan_names
    ]
    if args.print_urls:
        import os

        try:
            print("\n".join(urls))
        except BrokenPipeError:
            # `... --print_urls | head -3` is the invited usage; exit
            # quietly with the conventional SIGPIPE code instead of a
            # traceback (stdout redirected to devnull so the shutdown
            # flush can't raise again).
            os.dup2(os.open(os.devnull, os.O_WRONLY), sys.stdout.fileno())
            return 141
        return 0

    audio_dir = Path(args.audio_dir)
    fetched = missing = 0
    for m in meetings:
        (audio_dir / m).mkdir(parents=True, exist_ok=True)
        for c in chan_names:
            dest = audio_dir / m / f"{c}.sph"
            if dest.exists():
                continue
            url = f"{args.mirror}/{m}/{c}.sph"
            # Fetch to a temp name, rename on success: urlretrieve writing
            # the final name directly would leave a TRUNCATED .sph on any
            # interruption (Ctrl-C, kill, timeout), which every rerun then
            # skips as complete.
            part = dest.with_suffix(".sph.part")
            try:
                _fetch(url, part)
                part.replace(dest)
                fetched += 1
                print(f"fetched {url}")
            except BaseException as e:
                part.unlink(missing_ok=True)
                if isinstance(e, urllib.error.HTTPError) and e.code == 404:
                    missing += 1
                    continue  # channel doesn't exist for this meeting
                if not _is_network_error(e):
                    raise
                print(
                    f"network unavailable ({e}); rerun with --print_urls and "
                    "mirror the corpus in manually"
                )
                return 1
    if args.transcript_dir:
        import zipfile

        tdir = Path(args.transcript_dir)
        tdir.mkdir(parents=True, exist_ok=True)
        dest = tdir / "ICSI_original_transcripts.zip"

        def _extract(zip_path: Path) -> None:
            with zipfile.ZipFile(zip_path) as z:
                z.extractall(tdir)

        if dest.exists() and not any(tdir.rglob("*.mrt")):
            # A manually mirrored zip (the --print_urls air-gapped
            # workflow) is not a done-marker until its transcripts are
            # extracted: skipping on mere existence left zero .mrt files
            # behind a 'done' message.  Extraction errors here are local
            # and traceback as themselves.
            _extract(dest)
            print(f"transcripts (from mirrored zip) -> {tdir}")
        elif not dest.exists():
            part = dest.with_suffix(".zip.part")
            try:
                _fetch(TRANSCRIPTS_URL, part)
            except BaseException as e:
                # Only the DOWNLOAD can be a network problem; discard the
                # partial file so a rerun restarts cleanly.
                part.unlink(missing_ok=True)
                if not _is_network_error(e):
                    raise
                print(f"network unavailable for transcripts ({e})")
                return 1
            # Extraction failures (disk full, Ctrl-C) are LOCAL: keep the
            # fully-downloaded archive under its final name so the rerun
            # re-enters the extract-only branch above without re-fetching
            # hundreds of MB, and let the real error traceback instead of
            # a bogus 'network unavailable' diagnosis.
            try:
                _extract(part)
            except BaseException:
                part.replace(dest)
                raise
            part.replace(dest)
            print(f"transcripts -> {tdir}")
    print(f"done ({fetched} files fetched, {missing} absent channels skipped)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

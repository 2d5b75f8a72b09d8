"""Smoke-run the example walkthroughs (reference Demo.ipynb's role).

The demos are the framework's only runnable end-to-end narratives; without
a test they can rot silently (round-2 verdict).  Each runs as a real
subprocess — exactly what a user would type — on forced CPU, and the
documented outputs must exist afterwards.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(args, timeout):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, *args],
        cwd=str(REPO),
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


def test_demo_runs_end_to_end(tmp_path):
    r = _run(["examples/demo.py", str(tmp_path)], timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    # Documented artifacts: synthesized corpus audio, prediction TextGrids,
    # and the final corpus-weighted evaluation table.
    assert list(tmp_path.glob("signals/*/*.sph"))
    grids = list(tmp_path.glob("preds/dev/*/t_0.3/l_0.2/*.TextGrid"))
    assert grids, r.stdout[-3000:]
    assert "corpus-weighted evaluation:" in r.stdout
    assert "trained" in r.stdout


def test_streaming_demo_runs_and_matches_offline():
    # 900 s: the demo needs ~530 s of pure compute on the 1-core host
    # (measured 2026-08-20), so a 600 s cap flakes whenever ambient load
    # stretches it — exactly what a full-suite run does.
    r = _run(["examples/streaming_demo.py"], timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "bit-identical to the offline pipeline" in r.stdout

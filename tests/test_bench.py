"""bench.py plumbing tests (the measurement itself needs the real chip).

Pins the backend pre-probe contract: retry while the subprocess probe
hangs/fails, exit 3 (the watchdog's code) at the deadline, return silently
the moment a probe succeeds — a flapping tunnel must not forfeit a round's
measurement, and a dead one must fail loudly instead of hanging.
"""

import subprocess
import sys
import types

import pytest

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def test_wait_for_backend_exits_3_at_deadline(monkeypatch):
    attempts = []

    def fake_run(cmd, timeout, capture_output):
        attempts.append(timeout)
        raise subprocess.TimeoutExpired(cmd=cmd, timeout=timeout)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    with pytest.raises(SystemExit) as ei:
        bench._wait_for_backend(total_wait_s=0.01)
    assert ei.value.code == 3
    assert len(attempts) >= 1


def test_wait_for_backend_returns_on_success(monkeypatch):
    calls = []

    def fake_run(cmd, timeout, capture_output):
        calls.append(cmd)
        return types.SimpleNamespace(returncode=0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._wait_for_backend(total_wait_s=5.0) is None
    assert len(calls) == 1


def test_wait_for_backend_retries_failures_then_succeeds(monkeypatch):
    state = {"n": 0}

    def fake_run(cmd, timeout, capture_output):
        state["n"] += 1
        if state["n"] < 3:
            return types.SimpleNamespace(returncode=1)
        return types.SimpleNamespace(returncode=0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    bench._wait_for_backend(total_wait_s=60.0)
    assert state["n"] == 3

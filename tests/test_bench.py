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


# --------------------------------------------------------------------------- #
# Round-3 emission guarantee: a JSON record on EVERY exit path (the round-2
# artifact was lost to a driver timeout — BENCH_r02.json rc=124, parsed null).
# --------------------------------------------------------------------------- #

import json
import os
import signal
import subprocess as sp
import time


@pytest.fixture(autouse=True)
def _isolate_bench_history(tmp_path, monkeypatch):
    """No test may touch the committed bench_runs.jsonl: in-process
    _emit_final calls would otherwise append junk records to the repo
    artifact on every (smoke) run."""
    monkeypatch.setenv("BENCH_HISTORY_PATH", str(tmp_path / "bench_runs.jsonl"))


def _reset_state():
    bench._STATE.update(
        phase="startup",
        emitted=False,
        record=None,
        metric="e2e_inference_throughput",
        unit="x_realtime_per_chip",
    )


def test_emit_final_diagnostic_when_no_record(capsys):
    _reset_state()
    bench._STATE["phase"] = "warmup"
    bench._emit_final()
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["value"] is None
    assert "warmup" in rec["error"]
    assert rec["metric"] == "e2e_inference_throughput"
    # Idempotent: the first emitter wins, later calls print nothing.
    bench._emit_final({"metric": "x", "value": 1})
    assert capsys.readouterr().out == ""
    _reset_state()


def test_emit_final_prefers_stored_record(capsys):
    _reset_state()
    bench._STATE["record"] = {"metric": "e2e_inference_throughput", "value": 42.0}
    bench._emit_final()
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["value"] == 42.0
    _reset_state()


def _last_json_line(out: bytes):
    lines = [ln for ln in out.decode().strip().splitlines() if ln.strip()]
    return json.loads(lines[-1])


def test_budget_exhaustion_emits_diagnostic_record():
    """Guard thread fires at the (tiny) budget while the main thread is
    still importing jax: the process must still print a parsable record."""
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        BENCH_TOTAL_BUDGET_S="3",
        BENCH_HISTORY="off",
    )
    r = sp.run(
        [sys.executable, "bench.py"],
        cwd="/root/repo",
        env=env,
        capture_output=True,
        timeout=120,
    )
    assert r.returncode == 3
    rec = _last_json_line(r.stdout)
    assert rec["value"] is None
    assert "budget 3s" in rec["error"]


def test_sigterm_emits_diagnostic_record():
    """An external kill (the driver's timeout sends SIGTERM) must still
    yield a parsable record, not an empty artifact."""
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        BENCH_TOTAL_BUDGET_S="600",
        BENCH_HISTORY="off",
    )
    p = sp.Popen(
        [sys.executable, "bench.py"],
        cwd="/root/repo",
        env=env,
        stdout=sp.PIPE,
        stderr=sp.DEVNULL,
    )
    time.sleep(8)
    p.send_signal(signal.SIGTERM)
    out, _ = p.communicate(timeout=60)
    assert p.returncode == 3
    rec = _last_json_line(out)
    assert rec["value"] is None
    assert "no measurement" in rec["error"]


def test_cpu_end_to_end_emits_decomposed_record():
    """Full forced-CPU bench run: ONE JSON line carrying the e2e number plus
    the decomposed fields (upload_s, device_x_realtime,
    fused_conv_device_x_realtime) the driver artifact records."""
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        BENCH_TOTAL_BUDGET_S="450",
        BENCH_HISTORY="off",
    )
    # The inner budget (450 s) sits comfortably below the outer timeout
    # (550 s): a slow run must yield bench's own diagnostic record, never
    # a TimeoutExpired test error.
    r = sp.run(
        [sys.executable, "bench.py"],
        cwd="/root/repo",
        env=env,
        capture_output=True,
        timeout=550,
    )
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    rec = _last_json_line(r.stdout)
    assert rec["metric"] == "e2e_inference_throughput"
    assert rec["value"] > 0
    assert rec["platform"] == "cpu"
    # The decomposed fields are legitimately omitted when the per-stage
    # _remaining() guards trip inside the budget (a loaded 1-core host):
    # bench marks that case explicitly.  Assert the invariant either way —
    # decomposition present and positive, or the skip marked loudly —
    # instead of KeyErroring on a slow host.
    skip_keys = (
        "decompose_skipped", "decompose_error",
        "device_x_realtime_skipped", "fused_conv_skipped",
    )
    hit = [k for k in skip_keys if k in rec]
    if hit:
        pytest.skip(
            f"host too slow for the full decomposition within the budget: "
            f"{ {k: rec[k] for k in hit} }"
        )
    assert rec["upload_s"] >= 0
    assert rec["device_x_realtime"] > 0
    assert rec["fused_conv_device_x_realtime"] > 0


def test_emit_final_appends_history(tmp_path, monkeypatch, capsys):
    """Emissions append a timestamped copy to the history file so bench
    numbers are artifacts, not README lore; BENCH_HISTORY=off disables."""
    hist = tmp_path / "runs.jsonl"
    monkeypatch.setenv("BENCH_HISTORY_PATH", str(hist))
    _reset_state()
    bench._emit_final({"metric": "e2e_inference_throughput", "value": 7.0})
    capsys.readouterr()
    (entry,) = [json.loads(ln) for ln in hist.read_text().splitlines()]
    assert entry["value"] == 7.0
    assert "ts" in entry
    _reset_state()
    monkeypatch.setenv("BENCH_HISTORY", "off")
    bench._emit_final({"metric": "e2e_inference_throughput", "value": 8.0})
    capsys.readouterr()
    assert len(hist.read_text().splitlines()) == 1
    _reset_state()


def test_cpu_train_loop_mode_emits_record():
    """bench.py --train-loop on forced CPU: the real TrainLoop epoch
    throughput record (the VERDICT-1 artifact path), cheap K grid."""
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        BENCH_TOTAL_BUDGET_S="400",
        BENCH_HISTORY="off",
        BENCH_TRAIN_LOOP_KS="1",
        # Pin explicitly: an inherited BENCH_TRAIN_PRECISION=bfloat16 in the
        # outer environment would fail the precision assert spuriously.
        BENCH_TRAIN_PRECISION="float32",
    )
    r = sp.run(
        [sys.executable, "bench.py", "--train-loop"],
        cwd="/root/repo", env=env, capture_output=True, timeout=500,
    )
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    rec = _last_json_line(r.stdout)
    assert rec["metric"] == "train_loop_throughput"
    assert rec["platform"] == "cpu"
    assert rec["precision"] == "float32"
    # Either the K=1 loop measured, or its skip is marked loudly.
    assert ("loop_k1_samples_per_s" in rec) or ("loop_k1_skipped" in rec), rec
    if "loop_k1_samples_per_s" in rec:
        assert rec["value"] and rec["value"] > 0


def test_cpu_sharded_mode_emits_record():
    """bench.py --sharded on forced CPU: multi-channel aggregate record
    (the VERDICT-2 artifact path) with the device decomposition marked
    either way."""
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        BENCH_TOTAL_BUDGET_S="400",
        BENCH_HISTORY="off",
    )
    r = sp.run(
        [sys.executable, "bench.py", "--sharded"],
        cwd="/root/repo", env=env, capture_output=True, timeout=500,
    )
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    rec = _last_json_line(r.stdout)
    assert rec["metric"] == "sharded_inference_throughput"
    assert rec["platform"] == "cpu"
    assert rec["value"] > 0
    assert rec["n_channels"] >= 2
    assert ("sharded_device_x_realtime" in rec) or any(
        k.startswith("sharded_device") or k.startswith("device_decompose")
        for k in rec
    ), rec


def test_bench_import_defaults_cache_dir_to_repo_local():
    """Importing bench roots the persistent compile cache inside the repo
    worktree (which survives between rounds) unless the user already chose
    a dir — the home-dir default is wiped with the container, so the
    round's bench always paid the ~46 s cold compile (r05)."""
    code = "import bench, os; print(os.environ['LAD_JAX_CACHE_DIR'])"
    env = {k: v for k, v in os.environ.items() if k != "LAD_JAX_CACHE_DIR"}
    r = sp.run(
        [sys.executable, "-c", code],
        cwd="/root/repo", env=env, capture_output=True, timeout=60,
    )
    assert r.returncode == 0, r.stderr.decode()[-500:]
    assert r.stdout.decode().strip() == "/root/repo/.cache/jax_cache"
    # An explicit user choice is never overridden.
    env["LAD_JAX_CACHE_DIR"] = "/tmp/elsewhere"
    r = sp.run(
        [sys.executable, "-c", code],
        cwd="/root/repo", env=env, capture_output=True, timeout=60,
    )
    assert r.stdout.decode().strip() == "/tmp/elsewhere"


def test_mutually_exclusive_mode_flags_rejected():
    r = sp.run(
        [sys.executable, "bench.py", "--train", "--sharded"],
        cwd="/root/repo", capture_output=True, timeout=60,
    )
    assert r.returncode == 2
    assert b"mutually exclusive" in r.stderr

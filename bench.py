"""Headline benchmark: end-to-end inference throughput (featurize + classify).

Measures audio-seconds processed per wall-second per chip through the full
pipeline — PCM upload, on-device Kaldi fbank, sliding-window gather, the
resnet_base ResNetBigger over every 10 ms window, probabilities back to host
(the reference's segment_laughter.py path, which it times with
calc_real_time_factor; reference segment_laughter.py:178-197).

Prints ONE JSON line:
  value        — x realtime per chip (audio-seconds / wall-second)
  vs_baseline  — value / 500 (fraction of the BASELINE.json north-star target
                 of >=500x realtime; the reference publishes no RTF of its
                 own — BASELINE.md)
plus decomposed fields when the budget allows (all in the SAME object):
  upload_s                     — host->device PCM transfer for the measured
                                 clip (the tunnel-dominated term)
  device_x_realtime            — windows-mode featurize+classify with the
                                 PCM already device-resident
  fused_conv_device_x_realtime — same for the fused_conv whole-track graph

Budget contract (why round 2's record was lost, BENCH_r02.json rc=124):
the whole process — backend probe, d2h probe, warmup, measurement — shares
ONE wall-clock budget, default 420 s, env-overridable via
BENCH_TOTAL_BUDGET_S.  A guard THREAD (not a signal handler: the main
thread can block indefinitely inside a tunnel RPC where Python signal
handlers never run) prints the final JSON and exits at the deadline, so a
sick tunnel yields a diagnostic record instead of an empty round artifact.
Exit code 3 == no measurement (diagnostic record emitted).

Optional modes (informational; the driver runs the default):
  python bench.py --train      — jitted train-step throughput (samples/s/chip)
  python bench.py --train-loop — REAL resident TrainLoop epoch throughput at
                                 several --steps_per_dispatch K (the K-step
                                 scan amortizes the per-dispatch link floor)
                                 + a streamed-loop row
  python bench.py --sharded    — multi-channel ShardedPipeline aggregate
                                 x-realtime (the Slurm-fan-out replacement)
Every mode emits through the same guard/history machinery, so their rows
land in bench_runs.jsonl alongside the round record.
"""

import argparse
import atexit
import json
import os
import signal
import sys
import threading
import time

import numpy as np

# Root the persistent compile cache INSIDE the repo worktree unless the
# user already chose one.  Measured 2026-08-21: the bench's first jit costs
# ~64 s cold vs ~18 s warm, and the home-dir default (~/.cache) is wiped
# with the container between rounds while the worktree persists — so the
# round artifact always paid the ~46 s cold compile.  `.cache/` is
# gitignored; entries stay host/platform-fingerprinted (compile_cache.py),
# so a stale or foreign-host cache is never offered to this backend.
os.environ.setdefault(
    "LAD_JAX_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache", "jax_cache"),
)

_T0 = time.monotonic()
# Default raised 240 -> 420 (r05): a degraded tunnel window can block a
# single warmup upload/readback for 150+ s (observed 2026-08-21: warmup
# alone ate a full 240 s budget and the round artifact was a diagnostic).
# A longer budget is safe under the guard contract — partial records are
# stored progressively and the guard/SIGTERM paths emit whatever is stored,
# so an outer driver timeout shorter than the budget still yields the best
# record so far, while a healthy run finishes and exits long before either.
_BUDGET_S = float(os.environ.get("BENCH_TOTAL_BUDGET_S", "420"))

# Reentrant: a SIGTERM can land while the main thread is INSIDE
# _emit_final (holding the lock during the final print / history append);
# the handler then re-enters, sees 'emitted', and returns instead of
# deadlocking on its own lock.
_EMIT_LOCK = threading.RLock()
_STATE = {
    "phase": "startup",
    "emitted": False,
    "record": None,
    "metric": "e2e_inference_throughput",
    "unit": "x_realtime_per_chip",
}


def _elapsed() -> float:
    return time.monotonic() - _T0


def _remaining() -> float:
    return _BUDGET_S - _elapsed()


def _set_phase(name: str) -> None:
    _STATE["phase"] = name
    print(
        f"bench: phase={name} elapsed={_elapsed():.0f}s "
        f"remaining={_remaining():.0f}s",
        file=sys.stderr,
        flush=True,
    )


def _emit_final(record: dict = None) -> dict:
    """Print the round's ONE JSON line, exactly once, on any exit path.

    Thread-safe and idempotent: called from atexit, from signal handlers,
    from the budget guard thread, and from the normal end of main() — the
    first caller wins.  With no measurement stored, emits a diagnostic
    record (value null + error naming the phase that was interrupted) so
    the driver artifact always parses.

    Returns the record that WAS (or already had been) emitted — exit codes
    must key on this return, not on a pre-call peek at _STATE['record']:
    the main thread can store the real measurement between the peek and
    the emission, and an rc=3 paired with a non-null value would make the
    driver discard a valid reading (the documented contract is exit 3 ==
    value null)."""
    with _EMIT_LOCK:
        if _STATE["emitted"]:
            return _STATE.get("emitted_record")
        _STATE["emitted"] = True
        rec = record if record is not None else _STATE["record"]
        if rec is None:
            rec = {
                "metric": _STATE["metric"],
                "value": None,
                "unit": _STATE["unit"],
                "vs_baseline": None,
                "error": (
                    f"no measurement: stopped in phase "
                    f"'{_STATE['phase']}' after {_elapsed():.0f}s "
                    f"(budget {_BUDGET_S:.0f}s)"
                ),
            }
        _STATE["emitted_record"] = rec
        print(json.dumps(rec), flush=True)
        if os.environ.get("BENCH_HISTORY", "on") == "off":
            return rec
        try:
            # Every reading (including diagnostics) also lands in the
            # repo-local history file, so bench numbers are committed
            # artifacts instead of README lore.  Best-effort: history
            # must never break the stdout contract.  BENCH_HISTORY=off
            # disables it (the test suite's subprocess runs set this so
            # synthetic CPU/diagnostic records never pollute the file).
            import datetime

            entry = {
                "ts": datetime.datetime.now(datetime.timezone.utc).isoformat(
                    timespec="seconds"
                ),
                **rec,
            }
            path = os.environ.get(
                "BENCH_HISTORY_PATH",
                os.path.join(os.path.dirname(__file__) or ".", "bench_runs.jsonl"),
            )
            with open(path, "a") as f:
                f.write(json.dumps(entry) + "\n")
        except Exception:
            pass
        return rec


def _budget_guard() -> None:
    """Daemon thread: heartbeat to stderr, hard-stop at the budget.

    This is the emission guarantee.  Signal handlers are not enough — the
    observed failure mode (2026-08-17/20) is the main thread blocked inside
    the axon plugin's C tunnel RPC, where Python never gets to run a
    handler; a thread watching the clock can still print and _exit."""
    last_beat = 0.0
    while True:
        if _remaining() <= 0:
            print(
                f"bench: budget {_BUDGET_S:.0f}s exhausted in phase "
                f"'{_STATE['phase']}' — emitting record and exiting",
                file=sys.stderr,
                flush=True,
            )
            rec = _emit_final()
            os._exit(0 if rec and rec.get("value") is not None else 3)
        if _elapsed() - last_beat >= 15.0:
            last_beat = _elapsed()
            print(
                f"bench: heartbeat phase={_STATE['phase']} "
                f"elapsed={_elapsed():.0f}s remaining={_remaining():.0f}s",
                file=sys.stderr,
                flush=True,
            )
        time.sleep(1.0)


def _on_signal(signum, frame) -> None:
    print(
        f"bench: signal {signum} in phase '{_STATE['phase']}' at "
        f"{_elapsed():.0f}s — emitting record",
        file=sys.stderr,
        flush=True,
    )
    rec = _emit_final()
    os._exit(0 if rec and rec.get("value") is not None else 3)


def _arm_guard() -> None:
    """Arm the always-emit machinery.  Only from __main__ — importing this
    module (tests) must not install handlers or threads."""
    atexit.register(_emit_final)
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    threading.Thread(target=_budget_guard, daemon=True).start()


def speech_like_pcm(seconds: int, sr: int = 16000, seed: int = 23) -> np.ndarray:
    """Synthetic close-talk meeting audio with ICSI-like structure: mostly
    near-silence (a personal mic picks up its wearer rarely) broken by
    speech bursts, plus occasional loud (laughter-like) events.

    Spectrally tilted segments (2-pole resonator around 500 Hz) rather than
    white noise: white noise is both unrepresentative of speech and the
    adversarial worst case for the lossless packed-PCM transfer codec
    (ops/pcm_pack.py) that real meeting audio benefits from.  Deterministic
    (seeded) so every round measures the same waveform.
    """
    n = sr * seconds
    rng = np.random.default_rng(seed)
    # 2-pole resonator: poles at r=0.92, f0=500 Hz -> speech-like tilt.
    # Applied as FFT convolution with the (rapidly decaying) impulse
    # response so the benchmark needs nothing beyond numpy.
    theta = 2 * np.pi * 500 / sr
    a1, a2 = -2 * 0.92 * np.cos(theta), 0.92**2
    e = rng.standard_normal(n).astype(np.float32)
    taps = 1024  # |h| < 1e-7 past ~200 taps at r=0.92
    h = np.zeros(taps)
    h[0] = 1.0
    h[1] = -a1
    for i in range(2, taps):
        h[i] = -a1 * h[i - 1] - a2 * h[i - 2]
    size = 1 << int(n + taps - 1).bit_length()
    x = np.fft.irfft(np.fft.rfft(e, size) * np.fft.rfft(h, size), size)[:n]
    x = x.astype(np.float32)
    x /= np.abs(x).max()
    # Segment gains per 250 ms: 60% silence floor, 35% speech, 5% loud.
    seg = sr // 4
    n_segs = -(-n // seg)
    kind = rng.choice(3, size=n_segs, p=[0.60, 0.35, 0.05])
    gain_by_kind = np.array([0.002, 0.08, 0.30], dtype=np.float32)
    gains = np.repeat(gain_by_kind[kind], seg)[:n]
    # Smooth 10 ms ramps between segments so deltas stay speech-like.
    ramp = np.ones(sr // 100, dtype=np.float32) / (sr // 100)
    gains = np.convolve(gains, ramp, mode="same")
    mic_floor = rng.standard_normal(n).astype(np.float32) * 0.0015
    wave = np.clip(x * gains + mic_floor, -1.0, 1.0)
    return (wave * 32767.0).astype(np.int16)


def _wait_for_healthy_d2h(max_wait_s: float = None) -> bool:
    """The tunneled-TPU device->host path intermittently degrades to ~190 s
    per transfer (any size).  Probe it and wait (bounded) for recovery so a
    flaky window doesn't masquerade as a framework regression; returns
    whether the path looked healthy.  Bounded by the shared budget: never
    eats the time the measurement itself needs."""
    import jax
    import jax.numpy as jnp

    if max_wait_s is None:
        # Callers in this file pass explicit caps (the probe's only job
        # since r05 is to size the measurement and set link_degraded —
        # waiting for recovery starved the decomposition in r04); this
        # default only guards direct/test callers.
        max_wait_s = max(0.0, min(45.0, _remaining() - 150.0))

    probe = jax.jit(lambda v: v + 1)
    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        # Per-attempt watchdog around the WHOLE attempt — upload, dispatch,
        # block_until_ready AND the value readback: on a sick link every
        # one of those can block for the ~190 s degraded-transfer time
        # (observed 2026-08-21: an attempt stalled inside
        # block_until_ready, before the old readback-only watchdog even
        # armed, and a 300 s budget died in phase d2h_probe).  The attempt
        # runs in a daemon thread joined with a cap; a timed-out thread is
        # abandoned (it unblocks whenever the tunnel does) and the probe
        # reports unhealthy immediately, leaving the budget to the
        # tunnel-independent device metrics.  Distinct content per attempt
        # (the tunnel dedups identical transfers/executions, which would
        # make a sick link probe healthy).
        result = {}

        def _attempt(a=attempt, out=result):
            t0 = time.perf_counter()
            np.asarray(probe(jnp.full(256, float(a))))
            out["dt"] = time.perf_counter() - t0

        cap = max(6.0, min(20.0, (deadline - time.monotonic()) / 3.0,
                           _remaining() / 3.0))
        th = threading.Thread(target=_attempt, daemon=True)
        th.start()
        th.join(cap)
        if result.get("dt") is not None and result["dt"] < 5.0:
            return True
        if time.monotonic() > deadline:
            return False
        attempt += 1
        time.sleep(min(30.0, max(1.0, deadline - time.monotonic())))


# Measured torch-reference train-step throughput on THIS host, keyed by
# batch size (tools/torch_train_baseline.py, 2026-08-21: 1-core CPU,
# torch 2.13.0+cpu, reference train.py:261-297 semantics + reference init;
# full protocol + caveats in BASELINE.md "Measured reference baselines").
# The reference trained on a GPU this environment lacks, so torch-CPU here
# is the only hardware both stacks can run on — vs_baseline on train rows
# therefore reads "ours vs the reference stack on this host".
_TORCH_TRAIN_SAMPLES_PER_S = {32: 11.3, 1024: 6.0}


def _train_vs_baseline(samples_per_s: float, batch: int):
    ref = _TORCH_TRAIN_SAMPLES_PER_S.get(batch)
    return round(samples_per_s / ref, 1) if ref else None


def bench_train() -> None:
    """Jitted train-step throughput on the flagship model (resnet_base
    ResNetBigger, BCE+Adam, dropout 0.5 — the reference train.py hot loop).
    Reported as samples/sec/chip; one sample = one 1 s log-mel window, so the
    number is also audio-seconds trained per second."""
    import jax
    import jax.numpy as jnp

    from laughter_detection_icsi_tpu import models
    from laughter_detection_icsi_tpu.config import MODEL_MAP
    from laughter_detection_icsi_tpu.train.loop import Trainer

    # metric/unit are set in __main__ BEFORE imports; repeated here only
    # for direct callers (tests import and call bench_train()).
    _STATE["metric"] = "train_step_throughput"
    _STATE["unit"] = "samples_per_sec_per_chip"

    preset = MODEL_MAP["resnet_base"]
    model = models.build(
        preset.model,
        dropout_rate=0.5,
        linear_layer_size=preset.linear_layer_size,
        filter_sizes=preset.filter_sizes,
    )
    # Measurement twin of cli/train.py --precision (f32 is the reference-
    # parity default; bfloat16 is the HBM-bound step's 1.63x lever).
    precision = os.environ.get("BENCH_TRAIN_PRECISION", "float32")
    trainer = Trainer(
        model, compute_dtype=None if precision == "float32" else precision
    )
    _wait_for_backend()
    _set_phase("backend_init")
    _apply_platform_env()
    disarm = _backend_watchdog()
    on_accel = jax.devices()[0].platform not in ("cpu",)
    disarm()
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0))
    batch = 1024 if on_accel else 32
    iters = 50 if on_accel else 5

    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.standard_normal((batch, 100, 44)), jnp.float32)[:, None]
    y = jnp.asarray(rng.integers(0, 2, batch), jnp.float32)
    key = jax.random.PRNGKey(1)
    keys = [jax.random.fold_in(key, i) for i in range(4 * iters)]  # off clock

    _set_phase("warmup")
    p, s, o, m = trainer._train_step(params, state, opt_state, x, y, key)
    float(np.asarray(m["loss"]))  # compile + REAL completion off the clock

    # Slope (marginal-cost) timing with a VALUE-readback barrier: on the
    # tunneled backend block_until_ready acks at DISPATCH (measured
    # 2026-08-20: 64 chained steps "done" in 65 ms, real execution 8.5 s),
    # so the old loop-and-block timing reported the RPC enqueue rate — the
    # committed 1.0M samples/s reading was that artifact.  t(n) at two n
    # with a final loss readback; the slope cancels dispatch+RTT overhead.
    # Params evolve through the chain, so every execution has distinct
    # content (transport-level dedup cannot fake it).
    _set_phase("measure")
    ki = iter(keys)

    def run(n: int) -> None:
        nonlocal p, s, o
        for _ in range(n):
            p, s, o, mm = trainer._train_step(p, s, o, x, y, next(ki))
        float(np.asarray(mm["loss"]))

    from laughter_detection_icsi_tpu.utils.timing import slope_time

    n_lo, n_hi = (2, iters) if on_accel else (1, iters)
    per_step_s, overhead_s = slope_time(run, n_lo=n_lo, n_hi=n_hi)
    if per_step_s <= 0:
        # A tunnel stall on the n_lo readback but not the n_hi one inverts
        # the slope; emitting a negative samples/s as a valid rc-0 record
        # would poison bench_runs.jsonl.  Same guard as every other slope
        # consumer here.
        _set_phase("done")
        _emit_final(
            {
                "metric": "train_step_throughput",
                "value": None,
                "unit": "samples_per_sec_per_chip",
                "vs_baseline": None,
                "precision": precision,
                "error": f"nonpositive slope {per_step_s:.4f}s/step "
                "(readback stall during the short run?)",
            }
        )
        sys.exit(3)

    samples_per_s = batch / per_step_s
    _set_phase("done")
    # Store BEFORE emitting: a signal/budget expiry racing the final print
    # must report the completed measurement (exit 0), not 'no measurement'.
    _STATE["record"] = {
        "metric": "train_step_throughput",
        "value": round(samples_per_s, 1),
        "unit": "samples_per_sec_per_chip",
        # vs the measured torch reference at the same batch size on this
        # host (see _TORCH_TRAIN_SAMPLES_PER_S / BASELINE.md).
        "vs_baseline": _train_vs_baseline(samples_per_s, batch),
        "baseline_ref": "torch_cpu_this_host_same_batch",
        "per_step_ms": round(per_step_s * 1e3, 3),
        "precision": precision,
        # Constant per-measurement cost the slope cancelled (dispatch/RTT/
        # readback) — the number the OLD methodology was dominated by.
        "link_overhead_s": round(max(overhead_s, 0.0), 4),
        # See the inference record: mark what actually ran.
        "platform": jax.devices()[0].platform,
    }
    _emit_final()


def bench_train_loop() -> None:
    """The REAL resident training loop, measured end to end: TrainLoop's
    epoch driver over a device-resident dataset, at several
    steps_per_dispatch values.  Timing here is honest by construction:
    run_epoch keeps losses on device and forces ONE value readback at
    epoch end, so the wall-clock covers real execution (unlike the retired
    block_until_ready step timings — the old 1.0M samples/s "step" reading
    was the RPC enqueue rate; the honest slope-measured step is ~7.7k
    samples/s at B=1024, HBM-bandwidth-bound).  One epoch per K; a
    streamed-loop row (host batches uploaded per step) when budget allows.

    Record: value = best resident loop samples/s across K; per-K fields
    loop_k<K>_samples_per_s; streamed_samples_per_s."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from laughter_detection_icsi_tpu import models
    from laughter_detection_icsi_tpu.config import MODEL_MAP
    from laughter_detection_icsi_tpu.train.loop import Trainer, TrainLoop
    from laughter_detection_icsi_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    _STATE["metric"] = "train_loop_throughput"
    _STATE["unit"] = "samples_per_sec_per_chip"
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() != "cpu":
        enable_compilation_cache()

    preset = MODEL_MAP["resnet_base"]
    model = models.build(
        preset.model,
        dropout_rate=0.5,
        linear_layer_size=preset.linear_layer_size,
        filter_sizes=preset.filter_sizes,
    )
    precision = os.environ.get("BENCH_TRAIN_PRECISION", "float32")
    trainer = Trainer(
        model, compute_dtype=None if precision == "float32" else precision
    )
    _wait_for_backend()
    _set_phase("backend_init")
    _apply_platform_env()
    disarm = _backend_watchdog()
    platform = jax.devices()[0].platform
    disarm()
    on_accel = platform not in ("cpu",)
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0))

    batch = 1024 if on_accel else 32
    n_rows = 8192 if on_accel else 128
    steps_target = 128 if on_accel else 8
    # K grid override (comma list): the scanned conv body compiles MUCH
    # slower than the per-step graph (the conv-in-scan cliff — minutes on
    # the 1-core CPU host), so self-tests pin a cheap grid.
    ks_env = os.environ.get("BENCH_TRAIN_LOOP_KS")
    if ks_env:
        ks = tuple(int(s) for s in ks_env.split(","))
    else:
        ks = (1, 8, 64) if on_accel else (1, 4)

    # Synthetic resident split generated ON DEVICE — no upload at all, so
    # the loop measurement isolates dispatch/loop cost from data staging.
    class _Res:
        pass

    res = _Res()
    kf, kl = jax.random.split(jax.random.PRNGKey(23))
    res.feats = jax.jit(
        lambda k: jax.random.normal(k, (n_rows, 100, 44), jnp.float32) * 0.1
    )(kf)
    res.labels = jax.jit(
        lambda k: jax.random.bernoulli(k, 0.5, (n_rows,)).astype(jnp.float32)
    )(kl)
    jax.block_until_ready((res.feats, res.labels))

    idx_rng = np.random.default_rng(7)

    def make_batches(steps):
        # Fresh random indices per batch from a STATEFUL generator: every
        # epoch (warmup and timed alike) dispatches distinct content — the
        # tunnel dedups identical executions (same rule as the inference
        # bench).
        return [
            {
                "resident": res,
                "idx": idx_rng.integers(0, n_rows, batch).astype(np.int32),
            }
            for _ in range(steps)
        ]

    out = {
        "metric": "train_loop_throughput",
        "value": None,
        "unit": "samples_per_sec_per_chip",
        "vs_baseline": None,  # set with `value` below (torch-CPU anchor)
        "baseline_ref": "torch_cpu_this_host_same_batch",
        "platform": platform,
        "batch_size": batch,
        "precision": precision,
    }
    tmpdir = tempfile.mkdtemp(prefix="bench_train_loop_")
    for k in ks:
        if _remaining() < 30.0:
            out[f"loop_k{k}_skipped"] = f"only {_remaining():.0f}s left"
            continue
        _set_phase(f"train_loop_k{k}")
        # Provisional marker (same policy as the decompose blocks): a
        # budget-guard emission mid-compile or mid-epoch must still say
        # loudly that this K leg was cut short.
        out[f"loop_k{k}_skipped"] = "budget expired mid-leg"
        _STATE["record"] = dict(out)
        loop = TrainLoop(
            trainer=trainer,
            checkpoint_dir=tmpdir,
            log_frequency=0,
            steps_per_dispatch=k,
        )
        # Warmup epoch of exactly K steps: compiles the (K, B) scan off
        # the clock (the conv-in-scan compile cost is real — document it,
        # don't bill it to the loop).
        t0 = time.perf_counter()
        params, state, opt_state, _ = loop.run_epoch(
            params, state, opt_state, make_batches(k),
            rng=jax.random.PRNGKey(100 + k), verbose=False,
        )
        out[f"loop_k{k}_compile_s"] = round(time.perf_counter() - t0, 1)
        if _remaining() < 20.0:
            out[f"loop_k{k}_skipped"] = "compile ate the window"
            continue
        steps = max(k, (steps_target // k) * k)
        t0 = time.perf_counter()
        params, state, opt_state, _ = loop.run_epoch(
            params, state, opt_state, make_batches(steps),
            rng=jax.random.PRNGKey(200 + k), verbose=False,
        )
        dt = time.perf_counter() - t0
        rate = steps * batch / dt
        out.pop(f"loop_k{k}_skipped", None)
        out[f"loop_k{k}_samples_per_s"] = round(rate, 1)
        out["value"] = max(out["value"] or 0.0, round(rate, 1))
        out["vs_baseline"] = _train_vs_baseline(out["value"], batch)
        _STATE["record"] = dict(out)

    # Streamed twin (host batches uploaded per step): the round-3 README
    # lore number, now measured by the same artifact.
    if _remaining() > 30.0:
        _set_phase("train_loop_streamed")
        out["streamed_skipped"] = "budget expired mid-leg"
        _STATE["record"] = dict(out)
        host_rng = np.random.default_rng(11)
        n_stream = 8 if on_accel else 4

        def stream_batches(n):
            # FRESH content per batch, including vs the warmup epoch: the
            # tunnel dedups identical transfers, and upload is precisely
            # the cost the streamed twin measures (same rule as
            # make_batches above).
            return [
                {
                    "inputs": host_rng.standard_normal(
                        (batch, 100, 44)
                    ).astype(np.float32),
                    "is_laugh": host_rng.integers(0, 2, batch).astype(
                        np.float32
                    ),
                }
                for _ in range(n)
            ]

        loop = TrainLoop(trainer=trainer, checkpoint_dir=tmpdir, log_frequency=0)
        params, state, opt_state, _ = loop.run_epoch(
            params, state, opt_state, stream_batches(1),
            rng=jax.random.PRNGKey(300), verbose=False,
        )  # warm
        timed_batches = stream_batches(n_stream)  # generation off the clock
        t0 = time.perf_counter()
        params, state, opt_state, _ = loop.run_epoch(
            params, state, opt_state, timed_batches,
            rng=jax.random.PRNGKey(301), verbose=False,
        )
        dt = time.perf_counter() - t0
        out.pop("streamed_skipped", None)
        out["streamed_samples_per_s"] = round(n_stream * batch / dt, 1)
        _STATE["record"] = dict(out)
    _set_phase("done")
    if out["value"] is None:
        # Every K leg AND the streamed leg skipped inside the budget (slow
        # backend init / compile ate the window without the guard thread
        # firing): this is a diagnostic, not a measurement — exit 3 per
        # the documented contract (exit 3 == value null), or a driver
        # keying on rc=0 records a null reading as a successful round.
        out["error"] = "all loop legs skipped within the budget"
        _emit_final(out)
        sys.exit(3)
    _emit_final(out)


def bench_sharded() -> None:
    """Multi-channel sharded inference (parallel.ShardedPipeline): C
    synthetic channels through ONE batched windows-mode graph on this
    host's mesh — the Slurm-fan-out replacement
    (reference cluster_scripts/gen_eval_exp.py:91-114 runs one process per
    channel).  Reported as AGGREGATE x realtime (sum of channel audio
    seconds / wall second); per-channel = aggregate / C."""
    import jax

    from laughter_detection_icsi_tpu import models
    from laughter_detection_icsi_tpu.config import MODEL_MAP
    from laughter_detection_icsi_tpu.inference import InferenceSettings
    from laughter_detection_icsi_tpu.parallel import ShardedPipeline
    from laughter_detection_icsi_tpu.parallel import mesh as mesh_lib
    from laughter_detection_icsi_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    _STATE["metric"] = "sharded_inference_throughput"
    _STATE["unit"] = "x_realtime_aggregate_per_chip"
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() != "cpu":
        enable_compilation_cache()

    preset = MODEL_MAP["resnet_base"]
    model = models.build(
        preset.model,
        dropout_rate=0.0,
        linear_layer_size=preset.linear_layer_size,
        filter_sizes=preset.filter_sizes,
    )
    _wait_for_backend()
    _set_phase("backend_init")
    _apply_platform_env()
    disarm = _backend_watchdog()
    platform = jax.devices()[0].platform
    disarm()
    on_accel = platform not in ("cpu",)
    params, state = model.init(jax.random.PRNGKey(0))

    n_channels = 8 if on_accel else 2
    channel_seconds = 300 if on_accel else 8
    settings = InferenceSettings(
        chunk=6144 if on_accel else 512,
        bucket_frames=6144 if on_accel else 1024,
        precision="bfloat16" if on_accel else "float32",
    )
    mesh = mesh_lib.make_mesh()  # all local devices (1 on the tunnel)
    pipe = ShardedPipeline(
        model, params, state, mesh=mesh, settings=settings
    )

    def channel_waves(base_seed):
        # Distinct content per channel AND per pass (tunnel dedup rule).
        return [
            speech_like_pcm(channel_seconds, seed=base_seed + i)
            for i in range(n_channels)
        ]

    # Same phase order as main() (the r04 lesson): short-capped probe, one
    # e2e pass for the provisional value, the tunnel-independent device
    # decomposition NEXT, best-of-N e2e refinement last.
    _set_phase("d2h_probe")
    healthy = (
        _wait_for_healthy_d2h(
            max_wait_s=max(0.0, min(45.0, _remaining() - 150.0))
        )
        if on_accel
        else True
    )
    if not healthy and on_accel:
        # Same 1/5 scaling as main(): a degraded window may still move the
        # smaller set inside the budget.  Full-size channels (8 x 300 s =
        # 76.8 MB of PCM per pass, plus the decompose's device sets) stall
        # every phase on a sick link — observed 2026-08-21 evening: three
        # consecutive runs lost the decomposition to upload time, each
        # reporting 'budget expired mid-decompose'.  channel_waves closes
        # over this local, so warmup/measure/decompose/refinement and the
        # channel_audio_s record field all follow.
        channel_seconds //= 5
    _set_phase("warmup")
    pipe.probs_for_waveforms(channel_waves(40))

    _set_phase("measure")
    waves = channel_waves(50)  # off the clock
    t0 = time.perf_counter()
    probs = pipe.probs_for_waveforms(waves)
    dt = time.perf_counter() - t0
    assert len(probs) == n_channels
    assert probs[0].shape[0] == channel_seconds * 100

    aggregate_x = n_channels * channel_seconds / dt
    out = {
        "metric": "sharded_inference_throughput",
        "value": round(aggregate_x, 2),
        "unit": "x_realtime_aggregate_per_chip",
        "vs_baseline": round(aggregate_x / 500.0, 4),
        "platform": platform,
        "n_channels": n_channels,
        "channel_audio_s": channel_seconds,
        "per_channel_x_realtime": round(aggregate_x / n_channels, 2),
        "mesh_devices": int(mesh.devices.size),
    }
    if not on_accel:
        out["cpu_fallback"] = True
    if not healthy:
        out["link_degraded"] = True
    # The e2e aggregate above is transfer-bound through a tunneled chip
    # (C x channel_seconds of PCM crosses the link every pass); store it,
    # then add a tunnel-independent device-side aggregate when budget
    # remains — same slope + value-readback methodology as
    # _device_metrics (see utils/timing.py for why block_until_ready
    # cannot time this).
    _STATE["record"] = dict(out)
    if _remaining() > 60.0:
        _set_phase("device_decompose")
        # Provisional marker FIRST: if the budget guard (or SIGTERM) fires
        # mid-decomposition, the emitted record still says loudly that the
        # decomposition was attempted and cut short, instead of silently
        # lacking the device fields (observed: a loaded 1-core host pushed
        # warmup+measure past the budget and the guard emitted an unmarked
        # record).
        out["device_decompose_skipped"] = "budget expired mid-decompose"
        _STATE["record"] = dict(out)
        try:
            out.update(
                _sharded_device_metrics(pipe, n_channels, channel_seconds)
            )
            out.pop("device_decompose_skipped", None)
        except Exception as e:  # pragma: no cover - defensive
            out["device_decompose_error"] = f"{type(e).__name__}: {e}"
            out.pop("device_decompose_skipped", None)
        _STATE["record"] = dict(out)
    else:
        out["device_decompose_skipped"] = f"only {_remaining():.0f}s left"
    if _remaining() > 20.0:
        _set_phase("measure_refine")
        min_iters = 1 if healthy else 0
        max_iters = 5 if healthy else 1
        budget_s = max(5.0, _remaining() - 15.0)
        since_improve = 0
        t_budget0 = time.perf_counter()
        for i in range(max_iters):
            if time.perf_counter() - t_budget0 > budget_s:
                break
            waves = channel_waves(60 + 10 * i)  # off the clock
            t0 = time.perf_counter()
            probs = pipe.probs_for_waveforms(waves)
            d = time.perf_counter() - t0
            assert len(probs) == n_channels
            since_improve = 0 if d < dt * 0.98 else since_improve + 1
            if d < dt:
                dt = d
                aggregate_x = n_channels * channel_seconds / dt
                out["value"] = round(aggregate_x, 2)
                out["vs_baseline"] = round(aggregate_x / 500.0, 4)
                out["per_channel_x_realtime"] = round(
                    aggregate_x / n_channels, 2
                )
                _STATE["record"] = dict(out)
            if i + 1 >= min_iters and since_improve >= 2:
                break
    _set_phase("done")
    _emit_final(out)


def _sharded_device_metrics(pipe, n_channels: int, channel_seconds: int) -> dict:
    """Device-side aggregate x-realtime of the batched multi-channel
    windows graph, with every bucket batch pre-uploaded AND pre-sharded so
    the link is off the clock.  Bucket batches come from the pipeline's
    OWN plan (ShardedPipeline.bucket_batches, the generator
    _probs_padded_device itself iterates) so the decomposition can never
    desynchronize from the measured path.  Slope over (1, 3) passes of
    distinct content; one checksum readback per timed run is the
    execution barrier.

    The fused_conv leg runs FIRST: its sets are raw PCM tracks (~half the
    bytes of the bucketized window sets), so it is the cheaper metric to
    land — the same sick-link lesson the e2e bench learned in r05 phase
    reordering.  Observed 2026-08-21 22:5x: the windows-leg uploads ate
    the budget and the fused leg died with 'only 27s left' despite being
    the cheaper of the two."""
    import jax as _jax
    import jax.numpy as jnp

    from laughter_detection_icsi_tpu.inference import host_pad_waveform
    from laughter_detection_icsi_tpu.utils.timing import hard_block

    c_pad = -(-n_channels // pipe.n_shards) * pipe.n_shards
    c_local = c_pad // pipe.n_shards
    bucket = pipe.settings.bucket_frames

    out = {}

    # ---- fused_conv leg (FIRST): ONE batched whole-track dilated graph
    # over all C channels — the fastest multi-channel formulation (no
    # window gathers at all).  Same 5-distinct-set slope.  Accelerators
    # only: XLA:CPU compiles the whole-track dilated graph pathologically
    # slowly (~6 min observed in the CPU self-test for zero signal — the
    # CPU path exists to validate plumbing, not to measure).
    def _fc_dims(sec: int):
        t_frames = sec * 100
        total = max(bucket, -(-t_frames // bucket) * bucket)
        graph, wave_len = pipe._fc_graph(total, True)  # lazy jit
        return graph, wave_len, t_frames

    def _build_fset(set_i: int, sec: int, wave_len: int, t_frames: int):
        batch = np.zeros((c_pad, wave_len), dtype=np.int16)
        for r in range(n_channels):
            w = speech_like_pcm(sec, seed=970 + set_i * 16 + r)
            batch[r, : len(w)] = w
        valid = np.zeros(c_pad, dtype=np.int32)
        valid[:n_channels] = t_frames
        return pipe._shard({"w": batch, "v": valid}, pipe.mesh)

    if _jax.devices()[0].platform in ("cpu",):
        out["sharded_fused_skipped"] = "cpu self-test"
    elif _remaining() > 60.0:
        _set_phase("device_decompose_fused")
        fc_seconds = int(channel_seconds)
        graph, fc_wave_len, t_frames = _fc_dims(fc_seconds)
        t0 = time.perf_counter()
        first_f = _build_fset(0, fc_seconds, fc_wave_len, t_frames)
        hard_block([first_f])
        t_fset = time.perf_counter() - t0
        # The fused metric is NOT audio-length-invariant: a fixed
        # ~170-190 ms/pass cost dominates short tracks (measured
        # 2026-08-21 23:20: shrinking to 60 s collapsed the reading
        # 14,000x -> 2,530x while the per-pass time stayed ~190 ms), so
        # a tight budget shrinks the NUMBER of distinct sets (5 -> 3,
        # indexed modulo so every within-run slope pass still sees
        # distinct content — the tunnel-dedup discipline is per batch)
        # instead of the audio seconds.  Reserve ~140 s for the windows
        # leg below, which has its own shrink.
        n_fsets = 5
        if 4 * t_fset > max(0.0, _remaining() - 140.0):
            n_fsets = 3
            out["fused_decompose_sets"] = n_fsets
        if (n_fsets - 1) * t_fset <= max(0.0, _remaining() - 120.0):
            fsets = [first_f] + [
                _build_fset(i, fc_seconds, fc_wave_len, t_frames)
                for i in range(1, n_fsets)
            ]
            hard_block(fsets)
            hard_block(graph(fsets[0]["w"], fsets[0]["v"]))  # compile off clock
            if _remaining() > 25.0:
                dt, _ = _slope_sets(
                    lambda i: graph(
                        fsets[i % n_fsets]["w"], fsets[i % n_fsets]["v"]
                    )
                )
                if dt > 0:
                    out["sharded_fused_device_x_realtime"] = round(
                        n_channels * fc_seconds / dt, 2
                    )
                else:
                    out["sharded_fused_skipped"] = (
                        f"nonpositive slope {dt:.4f}"
                    )
            else:
                out["sharded_fused_skipped"] = f"only {_remaining():.0f}s left"
            del fsets
        else:
            out["sharded_fused_skipped"] = (
                f"upload too slow for {n_fsets} full-length sets "
                f"({t_fset:.1f}s/set)"
            )
        del first_f  # free HBM before the window sets upload
    else:
        out["sharded_fused_skipped"] = f"only {_remaining():.0f}s left"

    # ---- windows leg: the batched bucketized graph the e2e measure runs.
    _set_phase("device_decompose")
    featurize, chunk_probs, _wave_len, chunk = pipe._graphs(True, c_local)

    def build_set(set_i: int, sec: int):
        padded_list, ts = [], []
        for ch in range(n_channels):
            padded, t_ch = host_pad_waveform(
                speech_like_pcm(sec, seed=900 + set_i * 16 + ch),
                pipe.feat_cfg,
            )
            padded_list.append(padded)
            ts.append(t_ch)
        return [
            pipe._shard({"w": batch, "v": valid}, pipe.mesh)
            for batch, valid, _k in pipe.bucket_batches(
                padded_list, ts, int16_in=True
            )
        ]

    # 5 distinct content sets: warmup + n_lo=1 + n_hi=3.  The full-size
    # sets are 5 x C x channel_seconds of PCM (384 MB at 8 x 300 s) —
    # more than every timed e2e pass combined — and on a slow tunnel
    # window their upload starved the decomposition three runs in a row
    # (2026-08-21 evening, each ending 'budget expired mid-decompose').
    # So: time the FIRST set's upload; if four more at that rate don't
    # fit in the remaining budget (less a reserve for the slope runs —
    # the fused leg already ran above), shrink the decompose channels to
    # 60 s.  60 s keeps
    # the metric comparable: one 6144-frame bucket at 6000 valid frames
    # has the same 97.66% occupancy as 300 s across five buckets, and
    # the per-audio-second normalization divides the size back out.
    dec_seconds = int(channel_seconds)
    t0 = time.perf_counter()
    first = build_set(0, dec_seconds)
    hard_block([first])
    t_set = time.perf_counter() - t0
    if 4 * t_set > max(0.0, _remaining() - 40.0) and dec_seconds > 60:
        dec_seconds = 60
        out["decompose_channel_audio_s"] = dec_seconds
        first = build_set(0, dec_seconds)
        hard_block([first])
    sets = [first] + [build_set(i, dec_seconds) for i in range(1, 5)]
    hard_block(sets)  # uploads complete, off the clock

    n_chunks = -(-bucket // chunk)
    starts = [jnp.asarray(i * chunk, jnp.int32) for i in range(n_chunks)]

    def device_pass(set_i: int):
        outs = []
        for sh in sets[set_i]:
            feats = featurize(sh["w"], sh["v"])
            outs.extend(chunk_probs(feats, s) for s in starts)
        return outs

    hard_block(device_pass(0))  # compile/warm off the clock
    if _remaining() > 30.0:
        dt, _ = _slope_sets(device_pass)
        if dt > 0:
            out["sharded_device_x_realtime"] = round(
                n_channels * dec_seconds / dt, 2
            )
        else:
            out["sharded_device_skipped"] = f"nonpositive slope {dt:.4f}"
    else:
        out["sharded_device_skipped"] = f"only {_remaining():.0f}s left"
    return out


def _apply_platform_env() -> None:
    """Honor JAX_PLATFORMS even under the axon plugin (shared helper —
    lets the CPU self-test run without touching the real chip)."""
    from laughter_detection_icsi_tpu.utils.platform_env import (
        apply_platform_env,
    )

    apply_platform_env()


def _wait_for_backend(total_wait_s: float = None) -> None:
    """Probe backend init in a SUBPROCESS and retry (bounded) while it hangs.

    The in-process watchdog below can only fail fast: once the axon plugin's
    ``make_c_api_client`` blocks on a dead tunnel, that thread never returns
    and the process is unrecoverable.  Probing in a child first makes an
    outage retryable — a tunnel that flaps back within the window still
    yields a measurement instead of a forfeited round.  Exits 3 (same
    contract as the guard) when the deadline passes without a live
    backend.  No-op overhead on healthy platforms: one extra child init.

    Bounded by the SHARED budget: the probe may use at most the remaining
    wall-clock minus a reserve for the rest of the run, so it can never
    starve the measurement of its window (the round-2 failure mode)."""
    import subprocess

    _set_phase("backend_probe")
    if total_wait_s is None:
        env_wait = float(os.environ.get("BENCH_BACKEND_WAIT_S", "600"))
        total_wait_s = max(5.0, min(env_wait, _remaining() - 45.0))
    deadline = time.monotonic() + total_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [
                    sys.executable,
                    "-c",
                    # Respect JAX_PLATFORMS in the probe child too (the
                    # axon plugin ignores the env var; see
                    # _apply_platform_env) so a forced-CPU bench never
                    # waits on the tunnel.
                    "import os, jax; p = os.environ.get('JAX_PLATFORMS'); "
                    "p and jax.config.update('jax_platforms', p); "
                    "jax.devices()",
                ],
                timeout=max(10.0, min(300.0, deadline - time.monotonic())),
                capture_output=True,
            )
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() >= deadline:
            print(
                f"bench: backend probe failed for {total_wait_s:.0f}s "
                f"({attempt} attempts) — accelerator tunnel unreachable. "
                "No measurement taken.",
                file=sys.stderr,
                flush=True,
            )
            raise SystemExit(3)
        print(
            f"bench: backend probe attempt {attempt} failed; retrying "
            f"({deadline - time.monotonic():.0f}s left)",
            file=sys.stderr,
            flush=True,
        )
        time.sleep(min(20.0, max(1.0, deadline - time.monotonic())))


def _backend_watchdog(timeout_s: float = None):
    """Fail fast instead of hanging if backend init blocks.

    The axon tunnel plugin's ``make_c_api_client`` blocks INDEFINITELY when
    the tunnel is unreachable (observed 2026-08-17: first ``jax.devices()``
    never returns while the pool is down).  A silent hang would stall the
    whole benchmark run; a loud fast failure lets the driver record the
    outage and retry.  Returns a callable to disarm the watchdog once the
    backend is live."""
    if timeout_s is None:
        timeout_s = max(10.0, min(300.0, _remaining() - 30.0))

    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            print(
                f"bench: JAX backend init did not complete within "
                f"{timeout_s:.0f}s — accelerator tunnel unreachable? "
                f"No measurement taken.",
                file=sys.stderr,
                flush=True,
            )
            _emit_final()
            os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()
    return done.set


def _slope_sets(make_pass, first_set: int = 1, n_lo: int = 1, n_hi: int = 3):
    """Slope-time ``make_pass(set_index)`` over DISTINCT pre-staged content
    sets — the one shape every device decomposition here needs
    (utils/timing.slope_time underneath): run(n) executes n passes on
    fresh set indices and ends in ONE value-readback barrier whose
    checksum data-depends on all their outputs, so neither transport
    dedup nor a lying block_until_ready can fake it.  Returns
    (per_pass_s, overhead_s); callers keep their own nonpositive-slope
    guards."""
    from laughter_detection_icsi_tpu.utils.timing import hard_block, slope_time

    counter = {"i": first_set}

    def run(n):
        i0 = counter["i"]
        counter["i"] += n
        hard_block([make_pass(i0 + j) for j in range(n)])

    return slope_time(run, n_lo=n_lo, n_hi=n_hi)


def _device_metrics(pipe, audio_seconds: int) -> dict:
    """Decompose the e2e number: upload cost vs device-side compute.

    Returns fields to merge into the ONE output record:
      upload_s                     — host->device transfer of the PCM
      device_x_realtime            — windows-mode featurize+classify with
                                     device-resident input (tunnel excluded)
      fused_conv_device_x_realtime — the whole-track fused_conv graph ditto

    Methodology (utils/timing.py): slope timing with VALUE-readback
    barriers.  block_until_ready acks at DISPATCH on the tunneled backend
    (measured 2026-08-20: an 8.5 s K=64 train scan "completed" in 1.5 ms),
    so the old time-one-pass-and-block numbers here reported RPC enqueue
    rates, not hardware — the committed 1650x/9098x device readings carry
    that suspicion.  Now: t(n passes + checksum readback) at n_lo/n_hi
    over DISTINCT content per pass (the tunnel also dedups identical
    executions); the slope is the honest per-pass device cost with
    dispatch+RTT cancelled."""
    import jax
    import jax.numpy as jnp

    from laughter_detection_icsi_tpu.inference import host_pad_waveform
    from laughter_detection_icsi_tpu.utils.timing import hard_block

    out = {}
    # 5 distinct same-length contents: warmup + n_lo=1 + n_hi=3 passes.
    seeds = (97, 98, 99, 100, 101)
    padded_sets, t = [], 0
    for sd in seeds:
        padded, t = host_pad_waveform(
            speech_like_pcm(audio_seconds, seed=sd), pipe.feat_cfg
        )
        padded_sets.append(padded)
    bucket = pipe.settings.bucket_frames

    # The pipeline's OWN bucket plan (shared with probs_for_waveform), so
    # the decomposition can never desynchronize from the measured path.
    # Upload timed by slope too: device_put+block_until_ready can ack
    # before bytes land, so time k sets ending in a checksum readback (the
    # checksum reads every uploaded byte on device) at k=1 and k=4.
    dev_sets, dvalid_sets = [], []
    plans = []
    for padded in padded_sets:
        bufs, valids = [], []
        for buf, valid, _keep in pipe.bucket_buffers(padded, t):
            bufs.append(buf)
            valids.append(valid)
        plans.append((bufs, valids))

    def upload_set(i):
        bufs, valids = plans[i]
        devs = [jax.device_put(b) for b in bufs]
        dev_sets.append(devs)
        dvalid_sets.append([jnp.asarray(v, jnp.int32) for v in valids])
        return devs

    # Warm the timing checksum for BOTH slope leaf structures (a 1-set and
    # a 4-set hard_block) off the clock: the first hard_block on a new
    # structure traces/compiles its reduction, and billing that to the
    # n_lo run biases the upload slope low (ADVICE r04).  Zero-content
    # buffers of the plan's shapes — distinct from every timed upload, so
    # transport dedup cannot make a timed set ride this warmup.
    warm = [jax.device_put(np.zeros_like(b)) for b in plans[0][0]]
    hard_block([warm])
    hard_block([warm, warm, warm, warm])

    # Slope over (1, 4) sets cancels the checksum dispatch/RTT constant.
    per_upload, _ = _slope_sets(upload_set, first_set=0, n_lo=1, n_hi=4)
    out["upload_s"] = round(max(per_upload, 0.0), 4)

    featurize, chunk_probs, _ = pipe._graphs(True)
    chunk = pipe.settings.chunk
    n_chunks = -(-bucket // chunk)
    starts = [jnp.asarray(i * chunk, jnp.int32) for i in range(n_chunks)]

    def windows_device_pass(set_i: int):
        outs = []
        for dev, dv in zip(dev_sets[set_i], dvalid_sets[set_i]):
            feats = featurize(dev, dv)
            outs.extend(chunk_probs(feats, s) for s in starts)
        return jnp.concatenate(outs)

    hard_block(windows_device_pass(0))  # compile/warm off the clock
    if _remaining() > 20.0:
        dt, over = _slope_sets(windows_device_pass)
        if dt > 0:
            out["device_x_realtime"] = round(audio_seconds / dt, 2)
            out["device_pass_overhead_s"] = round(max(over, 0.0), 4)
        else:
            out["device_x_realtime_skipped"] = f"nonpositive slope {dt:.4f}"
    else:
        # Mark the omission loudly (same policy as decompose_skipped): an
        # absent field with no marker reads as a parsing/driver bug.
        out["device_x_realtime_skipped"] = f"only {_remaining():.0f}s left"

    # fused_conv: featurize + dilated conv stack in ONE jit over the track.
    # _fc_graph is keyed only on (total_frames, dtype) — it reads
    # precision/window but not settings.mode — so the windows-mode pipeline
    # builds it directly; no second pipeline needed.
    if _remaining() > 40.0:
        total = max(bucket, -(-t // bucket) * bucket)
        graph, fc_wave_len = pipe._fc_graph(total, True)
        fdevs = []
        for padded in padded_sets:
            fbuf = np.zeros(fc_wave_len, dtype=np.int16)
            fbuf[: len(padded)] = padded
            fdevs.append(jax.device_put(fbuf))
        # Force ALL uploads off the clock (warming via fdevs[0] alone
        # would leave sets 1-4 possibly still in flight when timing
        # starts, contaminating the link-independent metric with
        # transfer time on a slow tunnel).
        hard_block(fdevs)
        tt = jnp.asarray(t, jnp.int32)
        hard_block(graph(fdevs[0], tt))  # compile/warm off the clock
        if _remaining() > 15.0:
            dt, _ = _slope_sets(lambda i: graph(fdevs[i], tt))
            if dt > 0:
                out["fused_conv_device_x_realtime"] = round(
                    audio_seconds / dt, 2
                )
            else:
                out["fused_conv_skipped"] = f"nonpositive slope {dt:.4f}"
        else:
            out["fused_conv_skipped"] = f"only {_remaining():.0f}s left"
    else:
        out["fused_conv_skipped"] = f"only {_remaining():.0f}s left"
    return out


def main() -> None:
    import jax

    from laughter_detection_icsi_tpu import inference, models
    from laughter_detection_icsi_tpu.config import MODEL_MAP
    from laughter_detection_icsi_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    # Persistent compile cache: repeat rounds skip the 20-40 s jit, which is
    # most of a healthy run's budget.  Safe across hosts since the cache dir
    # is fingerprinted by platform+CPU features (utils/compile_cache.py).
    # NOT on forced-CPU runs: XLA:CPU AOT cache hits warn 'could lead to
    # SIGILL' on every load even same-host (see __graft_entry__), and the
    # CPU path is the self-test, not the round record.
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() != "cpu":
        enable_compilation_cache()

    preset = MODEL_MAP["resnet_base"]
    model = models.build(
        preset.model,
        dropout_rate=0.0,
        linear_layer_size=preset.linear_layer_size,
        filter_sizes=preset.filter_sizes,
    )
    _wait_for_backend()
    _set_phase("backend_init")
    _apply_platform_env()
    disarm = _backend_watchdog()
    platform = jax.devices()[0].platform
    disarm()
    params, state = model.init(jax.random.PRNGKey(0))
    on_accel = platform not in ("cpu",)
    audio_seconds = 600 if on_accel else 12  # 10 min on TPU; tiny on (1-core) CPU
    settings = inference.InferenceSettings(
        chunk=6144 if on_accel else 512,
        bucket_frames=6144 if on_accel else 1024,  # ~61 s/bucket, streamed
        precision="bfloat16" if on_accel else "float32",
    )
    pipe = inference.LaughterPipeline(model, params, state, settings=settings)

    # Raw int16 PCM, like the ICSI .sph decode hands over (16-bit sources
    # transfer as int16, are packed losslessly for the wire when that wins,
    # and are scaled on device).  ICSI-like synthetic meeting audio — see
    # speech_like_pcm.  (Rounds 1a-1c used full-scale white noise; numbers
    # before/after are not directly comparable.)
    #
    # Phase order (the r04 lesson, BENCH_r04.json): the probe's ONLY job is
    # to pick the measurement size and set the link_degraded flag, so its
    # wait is capped HARD; the tunnel-independent device decomposition runs
    # right after the first e2e pass — BEFORE any best-of-N e2e refinement —
    # so a sick link can never again spend the whole budget on the
    # link-bound metric and skip the stable one (r04 shipped 700x with the
    # decomposition skipped in the same round those metrics hit
    # 1,781x/14,611x).
    _set_phase("d2h_probe")
    healthy = (
        _wait_for_healthy_d2h(
            max_wait_s=max(0.0, min(45.0, _remaining() - 150.0))
        )
        if on_accel
        else True
    )
    if not healthy:
        # One-fifth the bytes on a degraded link: a sick window may still
        # move ~2 MB inside the budget, and a 120 s reading flagged
        # link_degraded (plus the device decomposition on one-fifth the
        # staging) beats a pure diagnostic record — observed 2026-08-21:
        # with 600 s audio the warmup alone ate a 300 s budget.
        audio_seconds = min(audio_seconds, 120)
    # Distinct waveform CONTENTS per run (different seeds, same generator and
    # length): the tunnel dedups repeated identical uploads/executions, so
    # re-timing one wave can report the cache, not the hardware.  Waves are
    # generated off the clock (before each timed run starts).
    _set_phase("warmup")
    t_warm = time.perf_counter()
    pipe.probs_for_waveform(speech_like_pcm(audio_seconds, seed=23))  # warmup
    warmup_s = time.perf_counter() - t_warm

    # ONE timed e2e pass establishes the provisional round value cheaply;
    # best-of-N refinement happens LAST, with whatever budget the
    # decomposition leaves.
    _set_phase("measure")
    wave = speech_like_pcm(audio_seconds, seed=24)  # off the clock
    t0 = time.perf_counter()
    probs = pipe.probs_for_waveform(wave)
    dt = time.perf_counter() - t0
    assert probs.shape[0] == audio_seconds * 100

    x_realtime = audio_seconds / dt
    out = {
        "metric": "e2e_inference_throughput",
        "value": round(x_realtime, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(x_realtime / 500.0, 4),
        # Always record WHAT ran: a fast-failing accelerator plugin leaves
        # jax on the CPU fallback with returncode 0, and a CPU number with
        # no platform marker would read as a catastrophic framework
        # regression rather than a fallback run.
        "platform": platform,
        # Observability for the warmup-cost chase (VERDICT r04 #1): how much
        # of the budget the first (compile + stage) pass ate.
        "warmup_s": round(warmup_s, 1),
    }
    if not on_accel:
        out["cpu_fallback"] = True
    if not healthy:
        # Surface a sick tunnel in the record: without this flag a
        # degraded-link number is indistinguishable from a framework
        # regression — exactly what the health probe exists to prevent.
        out["link_degraded"] = True
    # The e2e number above is the round record; store it NOW so the
    # decomposition below can never cost us the measurement.
    _STATE["record"] = dict(out)

    if _remaining() > 40.0:
        _set_phase("decompose")
        # Provisional marker FIRST (same policy as the sharded path): a
        # guard/SIGTERM emission mid-decompose must still carry a loud
        # decompose_* field rather than silently lacking the device metrics.
        out["decompose_skipped"] = "budget expired mid-decompose"
        _STATE["record"] = dict(out)
        try:
            out.update(_device_metrics(pipe, audio_seconds))
            out.pop("decompose_skipped", None)
        except Exception as e:  # pragma: no cover - defensive
            out["decompose_error"] = f"{type(e).__name__}: {e}"
            out.pop("decompose_skipped", None)
        _STATE["record"] = dict(out)
    else:
        out["decompose_skipped"] = f"only {_remaining():.0f}s left"

    # Best-of-N e2e refinement, LAST: the tunneled link's transfer rate
    # fluctuates by >10x minute to minute; the fastest run reflects the
    # hardware, the mean reflects the tunnel's mood.  Keep measuring — up
    # to max_iters or the leftover budget — until the best time has gone
    # two consecutive runs without improving.  Every improvement is stored
    # immediately, so a pass that blocks on a sick link costs nothing but
    # its own slot (the guard emits the stored record).
    if _remaining() > 20.0:
        _set_phase("measure_refine")
        min_iters = 2 if healthy else 1
        max_iters = 9 if healthy else 2
        budget_s = max(5.0, _remaining() - 15.0)
        since_improve = 0
        t_budget0 = time.perf_counter()
        for i in range(max_iters):
            if time.perf_counter() - t_budget0 > budget_s:
                break
            wave = speech_like_pcm(audio_seconds, seed=25 + i)  # off clock
            t0 = time.perf_counter()
            probs = pipe.probs_for_waveform(wave)
            d = time.perf_counter() - t0
            assert probs.shape[0] == audio_seconds * 100
            since_improve = 0 if d < dt * 0.98 else since_improve + 1
            if d < dt:
                dt = d
                x_realtime = audio_seconds / dt
                out["value"] = round(x_realtime, 2)
                out["vs_baseline"] = round(x_realtime / 500.0, 4)
                _STATE["record"] = dict(out)
            if i + 1 >= min_iters and since_improve >= 2:
                break
    _set_phase("done")
    _emit_final(out)


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--train",
        action="store_true",
        help="measure train-step throughput instead of inference RTF",
    )
    ap.add_argument(
        "--train-loop",
        action="store_true",
        help="measure the REAL resident training loop (TrainLoop epoch "
        "driver) at several --steps_per_dispatch K values",
    )
    ap.add_argument(
        "--sharded",
        action="store_true",
        help="measure multi-channel sharded inference (parallel."
        "ShardedPipeline): C synthetic channels in one batched graph",
    )
    args = ap.parse_args()
    if sum((args.train, args.train_loop, args.sharded)) > 1:
        ap.error("--train / --train-loop / --sharded are mutually exclusive")
    # Label the record BEFORE any heavy import: a budget expiry or SIGTERM
    # during jax/model import must emit a diagnostic under the requested
    # mode's metric, not mislabel the history entry as an e2e-inference
    # run (observed risk: bench_train set these only after its imports).
    if args.train:
        _STATE["metric"] = "train_step_throughput"
        _STATE["unit"] = "samples_per_sec_per_chip"
    elif args.train_loop:
        _STATE["metric"] = "train_loop_throughput"
        _STATE["unit"] = "samples_per_sec_per_chip"
    elif args.sharded:
        _STATE["metric"] = "sharded_inference_throughput"
        _STATE["unit"] = "x_realtime_aggregate_per_chip"
    _arm_guard()
    if args.train:
        bench_train()
    elif args.train_loop:
        bench_train_loop()
    elif args.sharded:
        bench_sharded()
    else:
        main()

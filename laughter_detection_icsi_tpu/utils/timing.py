"""Honest device timing through an asynchronous (possibly tunneled) backend.

``jax.block_until_ready`` is NOT a reliable execution barrier on every
backend.  Measured on the tunneled TPU backend this framework targets
(2026-08-20): a K=64-step ``lax.scan`` train dispatch whose real execution
takes ~8.5 s "completed" ``block_until_ready`` in 1.5 ms, and 64 chained
single train steps "completed" at almost exactly 1 ms per call — the RPC
*enqueue* rate, not the hardware.  Any wall-clock measurement that ends at
``block_until_ready`` on such a backend reports dispatch throughput, an
illusion that can overstate real throughput by >100x (a committed 1.0M
samples/s train-step reading was exactly this artifact; the honest rate,
re-measured with the barriers below, is ~7.7k samples/s — the step is HBM-
bandwidth-bound).

The ONLY honest barrier is a device->host *value* readback of data that
depends on the computation: the host cannot hold the bytes before the
device produced them.  This module provides that barrier plus a slope
(marginal-cost) timer that cancels the readback's round-trip latency out
of per-execution costs:

- ``hard_block(*trees)``     — tiny-scalar readback forcing real completion
                               of every array in the given pytrees.
- ``slope_time(run, n_lo, n_hi)`` — time ``run(n)`` (n chained executions +
                               ONE hard barrier) at two n; the slope
                               ``(t_hi - t_lo) / (n_hi - n_lo)`` is the
                               honest per-execution device cost with the
                               constant dispatch+readback overhead
                               cancelled.

The reference times CUDA work with ``time.time()`` around synchronous
torch calls (reference segment_laughter.py:178-197, train.py:517-535),
which is honest there because torch's ``.cpu()``/``.item()`` readbacks
synchronize; these helpers restore the same honesty under JAX's async
dispatch + a tunnel that acks before executing.
"""

from __future__ import annotations

from typing import Callable, Tuple

import numpy as np

__all__ = ["hard_block", "checksum", "slope_time"]

_SUM = None  # lazily-jitted leaf reduction, shared so repeated checksums
# on the same shapes hit the jit cache instead of re-tracing per call


def _get_sum():
    global _SUM
    if _SUM is None:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def _sum(leaves):
            return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

        _SUM = _sum
    return _SUM


def checksum(*trees):
    """One scalar (device array) data-dependent on every array leaf of the
    given pytrees.  Scheduling it after a computation and reading its VALUE
    is the only barrier an ack-before-execute tunnel cannot fake.  The sum
    runs on device (one extra dispatch, O(bytes-read) work) and only 4
    bytes cross the link."""
    import jax

    leaves = [
        x
        for t in trees
        for x in jax.tree_util.tree_leaves(t)
        if hasattr(x, "dtype")
    ]
    if not leaves:
        raise ValueError("checksum: no array leaves in arguments")
    return _get_sum()(leaves)


def hard_block(*trees) -> float:
    """Force REAL completion of everything the given pytrees depend on, and
    return the checksum value.  Unlike ``jax.block_until_ready`` (which the
    tunneled backend acks at dispatch), this cannot return before the
    device executed: the returned float is read out of the result bytes."""
    return float(np.asarray(checksum(*trees)))


def slope_time(
    run: Callable[[int], None],
    n_lo: int = 1,
    n_hi: int = 8,
    repeats: int = 1,
) -> Tuple[float, float]:
    """Honest per-execution cost of whatever ``run`` does, by marginal
    timing: ``run(n)`` must perform n back-to-back executions ending in ONE
    ``hard_block``.  Returns ``(per_exec_s, overhead_s)`` where

        t(n) = overhead + n * per_exec
        per_exec = (t(n_hi) - t(n_lo)) / (n_hi - n_lo)   [best of repeats]
        overhead = t(n_lo) - n_lo * per_exec             [dispatch + RTT]

    The subtraction cancels the constant costs a tunneled readback adds
    (RPC round-trip, d2h of the checksum scalar), so per_exec reflects the
    hardware.  ``run`` should vary content across calls if the transport
    dedups identical executions.  Executions on one core serialize, so the
    linear model holds as long as n_hi stays small enough not to overflow
    queues."""
    import time

    if n_hi <= n_lo:
        raise ValueError(f"need n_hi > n_lo, got {n_lo} >= {n_hi}")
    best_lo = best_hi = float("inf")
    for _ in range(max(1, repeats)):
        t0 = time.perf_counter()
        run(n_lo)
        best_lo = min(best_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        run(n_hi)
        best_hi = min(best_hi, time.perf_counter() - t0)
    per_exec = (best_hi - best_lo) / (n_hi - n_lo)
    overhead = best_lo - n_lo * per_exec
    return per_exec, overhead

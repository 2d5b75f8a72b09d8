"""utils/timing.py — the honest-barrier timing primitives every bench and
probe measurement path now routes through (block_until_ready acks at
dispatch on the tunneled backend when the queue is deep; see the module
docstring's measured evidence)."""

import time

import numpy as np
import pytest

from laughter_detection_icsi_tpu.utils.timing import (
    checksum,
    hard_block,
    slope_time,
)


def test_checksum_rejects_no_arrays():
    with pytest.raises(ValueError, match="no array leaves"):
        checksum({"a": None}, [])


def test_hard_block_reads_real_values():
    import jax.numpy as jnp

    tree = {"a": jnp.arange(4, dtype=jnp.float32), "b": (jnp.ones((2, 3)),)}
    # 0+1+2+3 + 6*1 = 12 — the returned float is read out of device bytes,
    # so a wrong value here would mean the barrier returned garbage.
    assert hard_block(tree) == pytest.approx(12.0)


def test_hard_block_multiple_trees_and_dtype_cast():
    import jax.numpy as jnp

    a = jnp.asarray([1, 2], jnp.int32)
    b = jnp.asarray([0.5], jnp.bfloat16)
    assert hard_block(a, b) == pytest.approx(3.5)


def test_slope_time_recovers_per_execution_cost():
    # Synthetic timer: t(n) = overhead + n*per_exec, from real sleeps so
    # the measurement path (perf_counter around run) is exercised.
    per, over = 0.02, 0.05

    def run(n):
        time.sleep(over + n * per)

    per_exec, overhead = slope_time(run, n_lo=1, n_hi=5)
    # Generous bounds: the 1-core CI host jitters sleeps upward.
    assert per * 0.8 <= per_exec <= per * 3.0
    assert overhead >= over * 0.5


def test_slope_time_validates_n():
    with pytest.raises(ValueError, match="n_hi > n_lo"):
        slope_time(lambda n: None, n_lo=4, n_hi=4)


def test_slope_time_on_device_work():
    """End to end on the test backend: slope of a jitted matmul chain is
    positive and the barrier actually forces values."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones((256, 256), jnp.float32)

    @jax.jit
    def step(a, i):
        return a @ a * 1e-3 + i

    def run(n):
        a = x
        for i in range(n):
            a = step(a, jnp.float32(i))
        hard_block(a)

    run(1)  # compile off the clock
    per_exec, _ = slope_time(run, n_lo=1, n_hi=8)
    assert per_exec > 0

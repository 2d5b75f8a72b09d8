"""Shared utilities: profiling, throughput counters, timing."""

from laughter_detection_icsi_tpu.utils.profiling import (  # noqa: F401
    ThroughputMeter,
    annotate,
    epoch_time,
    trace,
)

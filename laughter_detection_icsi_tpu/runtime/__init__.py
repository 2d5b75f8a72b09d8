"""Native (C++) host runtime: fast audio decode + threaded batch IO."""

from laughter_detection_icsi_tpu.runtime import native  # noqa: F401

"""Persistent JAX compilation cache for the CLI entry points.

The first jit of the inference/training graphs costs 20-40 s on TPU (and
more on CPU); the reference pays its analogous startup cost (lhotse
manifest parsing + CUDA context) on every one of its hundreds of Slurm
job invocations (reference cluster_scripts/gen_eval_exp.py:91-114).  Here
one process compiles, every later CLI invocation on the same machine
reuses the compiled executables from disk.
"""

from __future__ import annotations

import os
from typing import Optional

_DISABLED = ("", "0", "off", "none")


def enable_compilation_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Default: ``$LAD_JAX_CACHE_DIR`` or ``~/.cache/laughter_detection_icsi_tpu/
    jax_cache``.  Set ``LAD_JAX_CACHE_DIR=off`` to disable.  Returns the
    directory used, or None when disabled/unavailable (never raises — a
    broken cache must not take down inference)."""
    if cache_dir is None:
        cache_dir = os.environ.get(
            "LAD_JAX_CACHE_DIR",
            os.path.join(
                os.path.expanduser("~"),
                ".cache",
                "laughter_detection_icsi_tpu",
                "jax_cache",
            ),
        )
    if cache_dir.lower() in _DISABLED:
        return None
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None
    return cache_dir

"""Persistent JAX compilation cache for the CLI entry points.

The first jit of the inference/training graphs costs 20-40 s on TPU (and
more on CPU); the reference pays its analogous startup cost (lhotse
manifest parsing + CUDA context) on every one of its hundreds of Slurm
job invocations (reference cluster_scripts/gen_eval_exp.py:91-114).  Here
one process compiles, every later CLI invocation on the same machine
reuses the compiled executables from disk.

The cache directory is FINGERPRINTED by platform hint + host CPU features
+ jax version.  XLA:CPU AOT artifacts bake in the compiling host's CPU
features (``+amx-*``, ``+avx512fp16``, ...); loading one on a host without
those features is at best a warning and at worst SIGILL (observed:
``cpu_aot_loader.cc:210`` feature-mismatch errors throughout
MULTICHIP_r02.json's tail, from a shared un-fingerprinted directory).
Distinct fingerprints get distinct subdirectories, so an artifact compiled
on an AMX host can never be offered to a non-AMX host, and forced-CPU
re-exec children (``__graft_entry__``) never share entries with the TPU
parent.
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional

_DISABLED = ("", "0", "off", "none")


def host_fingerprint() -> str:
    """Short stable id for (platform selection, host CPU features, jax).

    Uses the JAX_PLATFORMS env hint rather than ``jax.devices()`` so the
    fingerprint never triggers backend init (which can hang on a dead
    tunnel and must stay lazy for the CLI entry points)."""
    parts = [os.environ.get("JAX_PLATFORMS", "")]
    try:
        import jax

        parts.append(jax.__version__)
    except Exception:
        pass
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    parts.append(line.strip())
                    break
    except OSError:
        pass
    return hashlib.sha1("\n".join(parts).encode()).hexdigest()[:10]


def enable_compilation_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at a fingerprinted
    subdirectory of ``cache_dir``.

    Default root: ``$LAD_JAX_CACHE_DIR`` or
    ``~/.cache/laughter_detection_icsi_tpu/jax_cache``.  Set
    ``LAD_JAX_CACHE_DIR=off`` to disable.  Returns the directory actually
    used (``<root>/<fingerprint>``), or None when disabled/unavailable
    (never raises — a broken cache must not take down inference)."""
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
    cache_dir = os.path.join(cache_dir, host_fingerprint())
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None
    return cache_dir

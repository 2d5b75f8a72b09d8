"""On-device threshold + min-length run-length smoothing of frame probs.

Replaces the reference's Python scan over probability lists
(reference laugh_segmenter.py:74-111) with a vectorized, jit-compatible
run-length extraction so the whole threshold x min_length sweep happens on
device before anything crosses back to host (BASELINE.json north_star:
"on-device smoothing").

Semantics mirrored exactly:
- ``fix_over_underflow`` (reference laugh_segmenter.py:57-71): p > 1 -> 1,
  p <= 0 -> 1e-7 (so threshold 0 still fires on zero-prob frames).
- A run of consecutive frames with prob > threshold becomes the span
  (first_frame / fps, last_frame / fps) — note the *last* frame index, not
  last+1 (reference laugh_segmenter.py:19-24, 92-105).
- Instances kept only if ``end - start > min_length`` strictly
  (reference laugh_segmenter.py:108).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

OVERFLOW_EPS = 1e-7


def fix_over_underflow(probs: jnp.ndarray) -> jnp.ndarray:
    """Vectorized reference laugh_segmenter.py:57-71."""
    probs = jnp.minimum(probs, 1.0)
    return jnp.where(probs <= 0.0, OVERFLOW_EPS, probs)


def _runs_from_mask(mask: jnp.ndarray, max_events: int):
    """Run starts/last-indices of True runs in a boolean [T] mask.

    Returns (starts, lasts, count): int32 [max_events] arrays padded with -1,
    and the number of valid runs (clipped to max_events).
    """
    t = mask.shape[0]
    prev = jnp.concatenate([jnp.zeros(1, dtype=mask.dtype), mask[:-1]])
    nxt = jnp.concatenate([mask[1:], jnp.zeros(1, dtype=mask.dtype)])
    start_mask = mask & ~prev
    end_mask = mask & ~nxt
    count = jnp.sum(start_mask)
    (starts,) = jnp.nonzero(start_mask, size=max_events, fill_value=-1)
    (lasts,) = jnp.nonzero(end_mask, size=max_events, fill_value=-1)
    return starts.astype(jnp.int32), lasts.astype(jnp.int32), count


@functools.partial(jax.jit, static_argnames=("max_events",))
def laughter_runs(
    probs: jnp.ndarray,
    thresholds: jnp.ndarray,
    max_events: int = 2048,
):
    """All runs above each threshold, vectorized over thresholds.

    probs: [T] float; thresholds: [K] float.
    Returns (starts [K, max_events], lasts [K, max_events], counts [K]).
    """
    fixed = fix_over_underflow(probs)

    def per_thr(thr):
        return _runs_from_mask(fixed > thr, max_events)

    return jax.vmap(per_thr)(thresholds)


def get_laughter_instances(
    probs: np.ndarray,
    thresholds: Sequence[float] = (0.5,),
    min_lengths: Sequence[float] = (0.2,),
    fps: float = 100.0,
    max_events: int = 2048,
) -> Dict[Tuple[float, float], List[Tuple[float, float]]]:
    """Drop-in equivalent of reference laugh_segmenter.py:74-111.

    Runs the threshold sweep on device once; the (cheap) min-length filtering
    fans out on host into the same ``{(threshold, min_length): [(start_s,
    end_s), ...]}`` dict the reference returns.
    """
    probs = jnp.asarray(np.asarray(probs, dtype=np.float32))
    thr_arr = jnp.asarray(np.asarray(thresholds, dtype=np.float32))
    starts, lasts, counts = laughter_runs(probs, thr_arr, max_events=max_events)
    starts = np.asarray(starts)
    lasts = np.asarray(lasts)
    counts = np.asarray(counts)

    out: Dict[Tuple[float, float], List[Tuple[float, float]]] = {}
    for k, thr in enumerate(thresholds):
        n = int(counts[k])
        if n > max_events:
            raise ValueError(
                f"{n} laughter runs exceed max_events={max_events}; "
                "raise max_events"
            )
        spans = [
            (starts[k, i] / fps, lasts[k, i] / fps) for i in range(n)
        ]
        for min_l in min_lengths:
            out[(float(thr), float(min_l))] = [
                (float(s), float(e)) for s, e in spans if e - s > min_l
            ]
    return out

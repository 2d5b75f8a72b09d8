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


def _fix_over_underflow_np(probs: np.ndarray) -> np.ndarray:
    """Host twin of :func:`fix_over_underflow` (reference
    laugh_segmenter.py:57-71): p > 1 -> 1, p <= 0 -> eps.  One definition
    shared by every host path so the streaming detector's pinned agreement
    with the offline scan can't drift."""
    probs = np.where(probs > 1.0, 1.0, probs)
    return np.where(probs <= 0.0, OVERFLOW_EPS, probs)


class StreamingEventDetector:
    """Incremental run-length smoothing for one (threshold, min_length).

    The online companion of :func:`get_laughter_instances` (which needs the
    whole probability vector): feed frame probabilities chunk by chunk —
    e.g. straight from ``inference.StreamingSession`` — and laughter events
    come back the moment their run CLOSES (the next frame drops below the
    threshold); ``finish()`` closes a run still open at end of stream.
    Event list over any chunking equals the offline function's for the same
    setting (pinned by tests): same fix_over_underflow, (first, LAST)/fps
    spans, and strict ``>`` min-length filtering.
    """

    def __init__(self, threshold: float, min_length: float = 0.2, fps: float = 100.0):
        self.threshold = float(threshold)
        self.min_length = float(min_length)
        self.fps = float(fps)
        self._f = 0  # global frame index of the next fed frame
        self._open: "int | None" = None  # start frame of the open run
        self._done = False

    def _emit(self, start_f: int, last_f: int) -> "Tuple[float, float] | None":
        s, e = start_f / self.fps, last_f / self.fps
        return (s, e) if e - s > self.min_length else None

    def feed(self, probs: np.ndarray) -> List[Tuple[float, float]]:
        """Add frame probabilities; returns the events that closed."""
        if self._done:
            raise RuntimeError("detector already finished")
        probs = _fix_over_underflow_np(np.asarray(probs, dtype=np.float32))
        # float32 compare, matching get_laughter_instances and the device
        # path (see the comment there).
        mask = probs > np.float32(self.threshold)
        prev = np.int8(0 if self._open is None else 1)
        d = np.diff(np.concatenate([[prev], mask.astype(np.int8)]))
        starts = list(self._f + np.nonzero(d == 1)[0])
        lasts = list(self._f + np.nonzero(d == -1)[0] - 1)
        events: List[Tuple[float, float]] = []
        for last_f in lasts:  # transitions alternate: each close pairs in order
            start_f = self._open if self._open is not None else starts.pop(0)
            self._open = None
            ev = self._emit(start_f, int(last_f))
            if ev is not None:
                events.append(ev)
        if starts:  # a run is still running at chunk end
            self._open = int(starts[0])
        self._f += len(mask)
        return events

    def finish(self) -> List[Tuple[float, float]]:
        """End of stream: close and (maybe) emit the open run."""
        if self._done:
            raise RuntimeError("detector already finished")
        self._done = True
        if self._open is None:
            return []
        ev = self._emit(self._open, self._f - 1)
        self._open = None
        return [ev] if ev is not None else []


def fix_over_underflow(probs: jnp.ndarray) -> jnp.ndarray:
    """Vectorized reference laugh_segmenter.py:57-71."""
    probs = jnp.minimum(probs, 1.0)
    return jnp.where(probs <= 0.0, OVERFLOW_EPS, probs)


def _runs_from_mask(mask: jnp.ndarray, max_events: int):
    """Run starts/last-indices of True runs in a boolean [T] mask.

    Returns (starts, lasts, count): int32 [max_events] arrays padded with -1,
    and the TRUE (unclipped) run count — the tables hold at most max_events
    runs, but ``count`` deliberately reports the full total so callers
    (instances_from_device_probs' ``counts[k] > max_events`` fallback) can
    detect table overflow.  Do not clip it here.
    """
    prev = jnp.concatenate([jnp.zeros(1, dtype=mask.dtype), mask[:-1]])
    nxt = jnp.concatenate([mask[1:], jnp.zeros(1, dtype=mask.dtype)])
    start_mask = mask & ~prev
    end_mask = mask & ~nxt
    count = jnp.sum(start_mask)
    (starts,) = jnp.nonzero(start_mask, size=max_events, fill_value=-1)
    (lasts,) = jnp.nonzero(end_mask, size=max_events, fill_value=-1)
    return starts.astype(jnp.int32), lasts.astype(jnp.int32), count


def laughter_runs(
    probs: jnp.ndarray,
    thresholds: jnp.ndarray,
    max_events: int = 2048,
):
    """All runs above each threshold, vectorized over thresholds.

    probs: [T] float; thresholds: [K] float.
    Returns (starts [K, max_events], lasts [K, max_events], counts [K]).
    Thin wrapper over the padded-buffer kernel with the whole buffer valid
    (one jitted implementation to keep in sync).
    """
    return _padded_runs(
        probs, thresholds, jnp.asarray(probs.shape[0], jnp.int32), max_events
    )


#: probs pad granularity for the jitted run scan: one compiled shape per
#: ~82 s of audio instead of one per track length.
_RUNS_PAD = 8192


@functools.partial(jax.jit, static_argnames=("max_events",))
def _padded_runs(probs, thresholds, valid, max_events: int):
    """laughter_runs over a zero-padded probs buffer: frames >= ``valid``
    are masked out (zero pads would otherwise fire at threshold 0.0)."""
    fixed = fix_over_underflow(probs)
    in_range = jnp.arange(probs.shape[0]) < valid

    def per_thr(thr):
        return _runs_from_mask((fixed > thr) & in_range, max_events)

    return jax.vmap(per_thr)(thresholds)


def instances_from_device_probs(
    probs_dev,
    thresholds: Sequence[float] = (0.5,),
    min_lengths: Sequence[float] = (0.2,),
    fps: float = 100.0,
    max_events: int = 2048,
) -> Dict[Tuple[float, float], List[Tuple[float, float]]]:
    """On-device smoothing for a DEVICE-resident probability vector
    (BASELINE.json north_star: "threshold + min-length smoothing
    on-device"): the [T]-length threshold scan and run-length extraction
    run as one jitted graph (:func:`laughter_runs`), and only tiny
    [K, max_events] integer run tables cross back to host, where the
    min-length filter applies in float64 — so the result is EXACTLY
    :func:`get_laughter_instances`' (pinned by tests).  If a threshold
    overflows ``max_events`` runs (a near-random checkpoint at a low
    threshold), that threshold falls back to the unbounded host scan.
    """
    t = int(probs_dev.shape[0])
    padded_len = max(_RUNS_PAD, -(-t // _RUNS_PAD) * _RUNS_PAD)
    probs_p = jnp.pad(probs_dev, (0, padded_len - t))
    thr_arr = jnp.asarray(np.asarray(thresholds, dtype=np.float32))
    starts, lasts, counts = _padded_runs(
        probs_p, thr_arr, jnp.asarray(t, jnp.int32), max_events
    )
    # One batched D2H transfer for all three tiny tables: on a tunneled
    # device each blocking np.asarray pays the full per-RPC latency.
    starts, lasts, counts = jax.device_get((starts, lasts, counts))

    out: Dict[Tuple[float, float], List[Tuple[float, float]]] = {}
    # counts holds TRUE (unclipped) run counts; the tables are complete up
    # to and including exactly max_events runs.  Overflowing thresholds
    # (typical at low thresholds on a near-random checkpoint, usually MANY
    # at once) fall back to ONE batched host pass instead of re-running the
    # O(T) clamp+cast per threshold.
    overflowed = [thr for k, thr in enumerate(thresholds) if counts[k] > max_events]
    if overflowed:
        host_probs = np.asarray(probs_dev)
        out.update(
            get_laughter_instances(
                host_probs, thresholds=overflowed, min_lengths=min_lengths, fps=fps
            )
        )
    for k, thr in enumerate(thresholds):
        if counts[k] > max_events:
            continue  # already handled by the batched host fallback
        n = int(counts[k])
        spans = [
            (int(s) / fps, int(e) / fps)
            for s, e in zip(starts[k, :n], lasts[k, :n])
        ]
        for min_l in min_lengths:
            out[(float(thr), float(min_l))] = [
                (float(s), float(e)) for s, e in spans if e - s > min_l
            ]
    return out


def get_laughter_instances(
    probs: np.ndarray,
    thresholds: Sequence[float] = (0.5,),
    min_lengths: Sequence[float] = (0.2,),
    fps: float = 100.0,
    max_events: int = 0,  # unused; kept for call compatibility
) -> Dict[Tuple[float, float], List[Tuple[float, float]]]:
    """Drop-in equivalent of reference laugh_segmenter.py:74-111.

    Pure-host numpy: the [T] probability vector already lives on host after
    inference, a jitted scan would recompile per track length, and a host
    diff-scan has no run-count ceiling (a near-random underfit checkpoint at
    a low threshold can legally produce tens of thousands of runs).  The
    in-graph equivalent for on-device smoothing is :func:`laughter_runs`.
    """
    probs = _fix_over_underflow_np(np.asarray(probs, dtype=np.float32))

    out: Dict[Tuple[float, float], List[Tuple[float, float]]] = {}
    for thr in thresholds:
        # Compare in float32 like the device path (instances_from_device_probs
        # casts its thr table to float32): a raw Python/np.float64 threshold
        # would promote the comparison to float64, and a prob bit-equal to
        # float32(thr) would then classify differently on host vs device —
        # breaking the documented exact equivalence (and making the
        # max_events overflow fallback disagree with device-computed
        # thresholds in the same result dict).
        mask = probs > np.float32(thr)
        d = np.diff(mask.astype(np.int8))
        starts = np.nonzero(d == 1)[0] + 1
        lasts = np.nonzero(d == -1)[0]
        if mask.size and mask[0]:
            starts = np.concatenate([[0], starts])
        if mask.size and mask[-1]:
            lasts = np.concatenate([lasts, [mask.size - 1]])
        # (first_frame, LAST_frame)/fps spans, like the reference's
        # collapse_to_start_and_end_frame (laugh_segmenter.py:19-24).
        spans = [(s / fps, e / fps) for s, e in zip(starts, lasts)]
        for min_l in min_lengths:
            out[(float(thr), float(min_l))] = [
                (float(s), float(e)) for s, e in spans if e - s > min_l
            ]
    return out

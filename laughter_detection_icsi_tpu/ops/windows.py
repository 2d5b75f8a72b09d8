"""Sliding-window extraction over feature maps, as jit-friendly gathers.

The reference materializes one 100-frame window per output frame via a torch
Dataset (reference datasets.py:72-93: ``feats[i:i+100]`` with right zero-pad at
the tail) and streams them through a size-32 DataLoader (reference
load_data.py:52-53).  Here the same windows are produced inside the XLA graph:
the feature array stays in HBM and windows are gathered chunk-by-chunk, so the
440x data amplification (SURVEY.md §7.3) is never materialized at once.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def extract_windows(
    feats: jnp.ndarray, start: jnp.ndarray, count: int, window: int = 100
) -> jnp.ndarray:
    """Gather ``count`` consecutive sliding windows from ``feats``
    (one window per feature frame, reference datasets.py:82-92).

    feats: [T, F] with every gathered index in range: the last one is
    ``start + count + window - 2``, so the caller must supply a
    ``window - 1`` zero-padded tail (the bucket graphs size their feature
    buffers with exactly that slack — see inference._graphs feat_rows).
    Returns [count, window, F].
    """
    idx = start + jnp.arange(count)[:, None] + jnp.arange(window)[None, :]
    return feats[idx]


def windowed_map(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    feats: jnp.ndarray,
    window: int = 100,
    chunk: int = 4096,
) -> jnp.ndarray:
    """Apply ``fn`` ([B, window, F] -> [B]) over all sliding windows of
    ``feats`` [T, F], chunked so at most ``chunk`` windows are live at once.

    Returns [T] with one output per window.  T is padded up to a multiple of
    ``chunk`` internally; outputs for the padding are dropped.

    Note: the chunks run under ``lax.scan``, which XLA compiles very slowly
    when ``fn`` is a large conv net (~60x the standalone compile, measured on
    CPU).  For model-sized ``fn``, jit ``fn``+``extract_windows`` once and
    loop over chunk starts on host instead (see inference.LaughterPipeline).
    """
    t = feats.shape[0]
    n_chunks = -(-t // chunk)
    padded_t = n_chunks * chunk
    # Tail zero-pad: enough frames so the last window of the last chunk reads
    # in-bounds.
    feats_p = jnp.pad(feats, ((0, padded_t - t + window - 1), (0, 0)))

    def body(carry, start):
        wins = extract_windows(feats_p, start, chunk, window)
        return carry, fn(wins)

    starts = jnp.arange(n_chunks) * chunk
    _, outs = jax.lax.scan(body, None, starts)
    return outs.reshape(-1)[:t]

"""Serialized model export: versioned StableHLO artifacts via ``jax.export``.

The reference's deployment artifact is a torch ``.pth.tar`` plus the model
source — reference segment_laughter.py:79-101 reconstructs the network in
Python before every use.  The TPU-native deployment story is an
ahead-of-time SERIALIZED COMPUTATION instead: ``jax.export`` lowers the
jitted function to versioned StableHLO, which any PJRT-based runtime (a TPU
serving binary, an IFRT proxy, a CPU fallback) can execute without this
package installed — or which loads straight back into JAX via :func:`load`.

Two artifact kinds:

- **window classifier** — ``[B, 1, window, n_feats]`` log-mel windows →
  ``[B]`` laughter probabilities.  ``B`` may be SYMBOLIC (the default), so
  one artifact serves every batch size.
- **e2e bucket pipeline** — one bucket's raw PCM (``[wave_len]`` int16 or
  float32 plus the bucket's valid-frame count) → per-10 ms-frame
  probabilities ``[bucket_frames]``: featurizer, shared-stem windowing and
  classifier fused into ONE graph.  It inlines the very jitted bodies the
  live pipeline dispatches (``LaughterPipeline._graphs``), so its output is
  numerically identical to ``LaughterPipeline.probs_for_waveform`` on a
  bucket's worth of audio (pinned by tests/test_export.py).

Cross-platform notes: pass ``platforms=("tpu", "cpu")`` to emit one
artifact loadable on both (ahead-of-time lowering; no TPU needed to
export).  The e2e artifact embeds the pipeline's configured featurizer —
export with ``use_pallas_fbank=False`` (the matmul featurizer) when the
artifact must run on platforms without the Pallas TPU kernel.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export


def _export_jit(fn, args_spec: Sequence, platforms: Optional[Sequence[str]]):
    kwargs = {}
    if platforms:
        kwargs["platforms"] = [str(p) for p in platforms]
    return jax_export.export(jax.jit(fn), **kwargs)(*args_spec)


def export_window_classifier(
    model,
    params,
    state,
    *,
    window: int = 100,
    n_feats: int = 44,
    batch: Optional[int] = None,
    precision: str = "float32",
    platforms: Optional[Sequence[str]] = None,
):
    """Export ``[B, 1, window, n_feats] -> [B]`` inference (train=False).

    ``batch=None`` exports a SYMBOLIC batch dimension; an int pins it.
    ``precision='bfloat16'`` casts params/state and computes in bf16 (the
    artifact still takes float32 windows and returns float32 probs).
    """
    from laughter_detection_icsi_tpu.inference import cast_tree_bf16

    if precision == "bfloat16":
        params, state = cast_tree_bf16(params), cast_tree_bf16(state)
    elif precision != "float32":
        raise ValueError(f"unknown precision {precision!r}")
    compute_dtype = jnp.bfloat16 if precision == "bfloat16" else jnp.float32

    def fn(x):
        probs, _ = model.apply(params, state, x.astype(compute_dtype), train=False)
        return probs.astype(jnp.float32)

    if batch is None:
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = int(batch)
    spec = jax.ShapeDtypeStruct((b, 1, window, n_feats), jnp.float32)
    return _export_jit(fn, (spec,), platforms)


def export_bucket_pipeline(
    pipeline,
    *,
    int16_in: bool = True,
    platforms: Optional[Sequence[str]] = None,
):
    """Export one bucket of ``pipeline`` as a single serialized graph.

    Signature of the artifact: ``(wave [wave_len] int16|float32,
    valid_frames scalar int32) -> probs [bucket_frames] float32``.  Rows at
    index >= valid_frames are computed from zero-masked features — slice
    them off exactly like ``LaughterPipeline.probs_for_waveform_device``
    does (inference.py bucket loop).  Returns ``(exported, wave_len)``.
    """
    featurize, chunk_probs, wave_len = pipeline._graphs(int16_in)
    bucket = pipeline.settings.bucket_frames
    chunk = pipeline.settings.chunk
    n_chunks = -(-bucket // chunk)

    def fn(wave, valid_frames):
        feats = featurize(wave, valid_frames)
        outs = [
            chunk_probs(feats, jnp.asarray(i * chunk, dtype=jnp.int32))
            for i in range(n_chunks)
        ]
        return jnp.concatenate(outs)[:bucket]

    wave_dtype = jnp.int16 if int16_in else jnp.float32
    spec = (
        jax.ShapeDtypeStruct((wave_len,), wave_dtype),
        jax.ShapeDtypeStruct((), jnp.int32),
    )
    return _export_jit(fn, spec, platforms), wave_len


def save(exported, path: str) -> int:
    """Serialize an ``jax.export.Exported`` to ``path``; returns the byte
    count.  Atomic (tmp + rename): a crashed export must not leave a
    truncated artifact that a serving binary would half-load."""
    import os
    import tempfile

    blob = exported.serialize()
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    return len(blob)


def load(path: str):
    """Deserialize an artifact file; invoke it via ``.call(*args)``."""
    with open(path, "rb") as f:
        return load_bytes(f.read())


def load_bytes(blob: bytes):
    """Deserialize an in-memory artifact; invoke it via ``.call(*args)``."""
    return jax_export.deserialize(blob)

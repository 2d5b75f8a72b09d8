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
- **e2e bucket pipeline** — one bucket's PCM buffer (``[wave_len]`` int16
  or float32 plus the bucket's valid-frame count) → per-10 ms-frame
  probabilities ``[bucket_frames]``: featurizer, shared-stem windowing and
  classifier fused into ONE graph.  It inlines the very jitted bodies the
  live pipeline dispatches (``LaughterPipeline._graphs``), so its output is
  numerically identical to ``LaughterPipeline.probs_for_waveform``
  (pinned by tests/test_export.py).  The buffer is NOT the raw recording —
  it carries the Kaldi edge padding and bucket offset; build it with the
  numpy-only :func:`bucket_inputs` helper (contract documented there).

Cross-platform notes: pass ``platforms=("tpu", "cpu")`` to emit one
artifact loadable on both (ahead-of-time lowering; no TPU needed to
export).  The e2e artifact embeds the pipeline's configured featurizer —
export with ``use_pallas_fbank=False`` (the matmul featurizer) when the
artifact must run on platforms without the Pallas TPU kernel.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export

# Host-side prep for the e2e artifact, re-exported for discoverability.
# It lives in the JAX-FREE host_prep module so a serving host that only
# executes artifacts can `from laughter_detection_icsi_tpu import
# host_prep` without jax installed — importing THIS module needs jax.
from laughter_detection_icsi_tpu.host_prep import bucket_inputs  # noqa: F401


def _export_jit(fn, args_spec: Sequence, platforms: Optional[Sequence[str]]):
    kwargs = {}
    if platforms is not None:
        if not platforms:
            # Falling through would silently lower for the exporting host's
            # platform only — a TPU-targeted deployment would get a
            # cpu-only artifact that fails at serving load, not at export.
            raise ValueError(
                "platforms=[] is ambiguous; pass None for "
                "'current backend only' or name the targets"
            )
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
    valid_frames scalar int32) -> probs [bucket_frames] float32``.

    ``wave`` is NOT the raw recording: it is one bucket's slice of the
    Kaldi-padded waveform (reflection pad of ``flen//2 - shift//2`` samples
    on the left, mirrored tail on the right), offset by
    ``k * bucket_frames * frame_shift`` for bucket k and zero-filled to
    ``wave_len`` — exactly the buffers the live bucket loop builds.  Use
    :func:`host_prep.bucket_inputs` for the host-side prep (that module is
    importable WITHOUT jax — a serving host needs neither JAX nor this
    package's model code, only the prep arithmetic); rows at index >= the
    returned ``n_out`` are computed from zero-masked features, slice them
    off.  Returns ``(exported, wave_len)``.
    """
    if pipeline.settings.mode != "windows":
        # fused_conv probs route through a different graph with documented
        # non-bit-parity numerics (inference.py _probs_fused_conv_device);
        # exporting windows-mode bodies for such a pipeline would break
        # this function's artifact==pipeline identity promise silently.
        # Same guard as the streaming sessions (_StreamingBase).
        raise ValueError(
            f"export_bucket_pipeline supports mode='windows' only "
            f"(pipeline has mode={pipeline.settings.mode!r})"
        )
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
    count.  Atomic and durable (named tmp + fsync + rename, same pattern as
    train/checkpoint.py): a crash or power loss mid-export must not leave
    a truncated artifact that a serving binary would half-load."""
    import os

    blob = exported.serialize()
    # A named tmp opened with open() gets umask-honoring modes natively —
    # no mkstemp 0600 + fchmod dance (mutating the process-wide umask to
    # read it is thread-unsafe: any concurrent file creation, e.g. a
    # training checkpoint in a sibling thread, would land world-writable).
    # pid alone is NOT unique within a process: two threads saving to the
    # same path would interleave writes in one shared tmp and publish a
    # corrupt blob — the random suffix restores mkstemp's per-call
    # uniqueness (last replace wins, each with a complete artifact).
    tmp = f"{path}.tmp.{os.getpid()}.{os.urandom(4).hex()}"
    try:
        with open(tmp, "wb") as f:
            f.write(blob)
            f.flush()
            os.fsync(f.fileno())
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

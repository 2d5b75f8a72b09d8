"""JAX-free host-side prep: framing geometry and serving-input builders.

This module is importable WITHOUT jax on purpose (numpy + config only): a
serving host that executes an exported StableHLO artifact (export.py) via
some non-JAX PJRT runtime needs exactly the arithmetic here — Kaldi frame
counts, snip_edges=False reflection padding, and the per-bucket buffer
slicing — and nothing else from this package.  tests/test_export.py pins
the no-jax import property in a fresh subprocess.

The geometry follows Kaldi's feature-window semantics, which the reference
inherits through Lhotse (reference utils/utils.py:25 builds the Lhotse
Fbank with frame_shift=0.01 on 16 kHz audio; see ops/fbank.py for the
full spec provenance).  The bucket slicing mirrors the live pipeline's
bucket loop (inference.LaughterPipeline.probs_for_waveform_device) exactly
— the identity is pinned by tests/test_export.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from laughter_detection_icsi_tpu.config import FEAT, FeatConfig

# --------------------------------------------------------------------------- #
# Frame-count / padding geometry (Kaldi semantics)
# --------------------------------------------------------------------------- #


def num_frames(num_samples: int, cfg: FeatConfig = FEAT) -> int:
    """Frame count for a waveform of ``num_samples`` samples."""
    shift = cfg.frame_shift_samples
    if cfg.snip_edges:
        if num_samples < cfg.frame_length_samples:
            return 0
        return 1 + (num_samples - cfg.frame_length_samples) // shift
    return (num_samples + shift // 2) // shift


def pad_amounts(num_samples: int, cfg: FeatConfig = FEAT) -> Tuple[int, int]:
    """(left, right) symmetric padding for snip_edges=False framing.

    ``left`` follows Kaldi's FirstSampleOfFrame with PER-TERM integer
    truncation: frame 0 begins at ``shift/2 - flen/2``, so the left pad is
    ``flen//2 - shift//2`` — NOT ``(flen - shift)//2``, which is one sample
    short when flen is even and shift odd (e.g. 400/5) and would shift
    every frame vs Kaldi.

    ``right`` may be NEGATIVE for short-frame geometries (flen <= 2*shift,
    e.g. num_samples=50 -> shift 320 / flen 400): the last frame then ends
    BEFORE the waveform does and Kaldi simply never reads the tail samples —
    consumers must truncate to ``num_samples + right``, not pad.
    """
    shift = cfg.frame_shift_samples
    flen = cfg.frame_length_samples
    t = num_frames(num_samples, cfg)
    new_len = (t - 1) * shift + flen
    npad = new_len - num_samples
    npad_left = flen // 2 - shift // 2
    return npad_left, npad - npad_left


def snip_cfg(cfg: FeatConfig) -> FeatConfig:
    """The snip_edges=True twin of ``cfg`` (bucket graphs frame pre-padded
    waves with simple strides, so they use snip geometry internally)."""
    return dataclasses.replace(cfg, snip_edges=True)


def host_pad_waveform(
    wave: np.ndarray, cfg: FeatConfig = FEAT
) -> Tuple[np.ndarray, int]:
    """Apply Kaldi's snip_edges=False symmetric padding on host.

    Returns (padded_wave, num_frames): framing the padded wave with simple
    strides reproduces the exact reference frames.  Dtype-preserving (int16
    PCM stays int16 for the cheap device transfer).
    """
    if cfg.snip_edges:
        raise ValueError(
            "host_pad_waveform implements snip_edges=False reflection "
            "padding; a snip_edges=True FeatConfig must not reach it"
        )
    n = len(wave)
    t = num_frames(n, cfg)
    if t == 0:
        return np.zeros(0, dtype=wave.dtype), 0
    left, right = pad_amounts(n, cfg)
    if right < 0:
        # Short-frame geometry (flen <= 2*shift): the last frame ends before
        # the waveform; Kaldi never reads the tail (see pad_amounts).
        wave = wave[: n + right]
        right = 0
    # mode='symmetric' == Kaldi's edge mirroring (index -j-1 / 2n-1-j) for
    # the normal case, and stays well-defined (repeated mirroring) when a
    # pad exceeds the wave length — naive slicing (wave[:left][::-1]) would
    # silently produce a SHORT pad for waves under ~frame_length and shift
    # every frame.
    padded = np.pad(wave, (left, right), mode="symmetric")
    return padded, t


# --------------------------------------------------------------------------- #
# Bucket geometry + serving-input prep
# --------------------------------------------------------------------------- #


@dataclasses.dataclass(frozen=True)
class BucketGeometry:
    """The two knobs of bucket shape, jax-free.

    Defaults MUST equal inference.InferenceSettings' (window, bucket_frames)
    defaults — an exported artifact and its host prep have to agree on the
    buffer length with neither side importing the other.  Pinned by
    tests/test_export.py.  Any object with these two attributes (e.g. an
    ``InferenceSettings``) is accepted wherever a BucketGeometry is.
    """

    window: int = 100
    bucket_frames: int = 6144

    def __post_init__(self):
        # Same guard its jax-side twin InferenceSettings has: 0/negatives
        # would crash far away (ZeroDivisionError in the bucket loop, a
        # silently wrong wave_len buffer) instead of at construction.
        for name in ("window", "bucket_frames"):
            v = getattr(self, name)
            if v < 1:
                raise ValueError(f"{name} must be >= 1, got {v}")


def bucket_wave_len(settings, feat_cfg: FeatConfig = FEAT) -> int:
    """Samples one bucket's featurize graph reads: ``bucket + window - 1``
    frames (the bucket plus its window-1 halo) under snip_edges geometry.

    THE single owner of the halo formula.  The compiled graphs
    (LaughterPipeline._graphs, parallel ShardedPipeline._graphs) size their
    input buffers with it, and the streaming readiness check
    (_StreamingBase) decides bucket finality with it — if the two ever
    disagreed, streaming would zero-fill missing tail samples and the
    documented streaming==offline bit-exactness would break silently.

    ``settings`` is anything with ``bucket_frames``/``window`` attributes
    (InferenceSettings or :class:`BucketGeometry`).
    """
    cfg = snip_cfg(feat_cfg)
    ext = settings.bucket_frames + settings.window - 1
    return (ext - 1) * cfg.frame_shift_samples + cfg.frame_length_samples


def bucket_inputs(
    wave, feat_cfg: Optional[FeatConfig] = None, settings=None
):
    """Host-side prep for the e2e artifact: yield ``(buf, valid, n_out)``
    per bucket for a whole recording.

    Pure numpy — mirrors ``LaughterPipeline.probs_for_waveform_device``'s
    bucket loop exactly (Kaldi reflection padding via
    :func:`host_pad_waveform`, ``k * bucket * shift`` slicing, zero-fill to
    ``wave_len``), so ``concat(artifact.call(buf, valid)[:n_out] for each
    bucket)`` equals the live pipeline's probabilities (pinned by
    tests/test_export.py).

    Input contract (same as the live pipeline's): 1-D PCM, int16 or
    float32/float64 in [-1, 1]; float64 is narrowed to float32 exactly as
    ``probs_for_waveform`` does.  ``buf`` then preserves the working dtype
    (int16 stays int16 — feed it to an int16 artifact); ``valid`` is the
    bucket's valid-frame count (int32); ``n_out`` how many leading output
    rows are that bucket's frames.

    ``settings`` is anything with ``bucket_frames``/``window`` attributes;
    default :class:`BucketGeometry` (== InferenceSettings' defaults).
    """
    # Plain function wrapping an inner generator: the input validation
    # fires at CALL time like probs_for_waveform_device's (a generator
    # would defer it to first iteration — after the expensive artifact
    # load, or never, if the consumer zips against an empty iterable).
    feat_cfg = feat_cfg if feat_cfg is not None else FEAT
    settings = settings if settings is not None else BucketGeometry()
    wave = np.asarray(wave)
    if wave.ndim != 1:
        raise ValueError(
            f"bucket_inputs wants 1-D PCM, got shape {wave.shape}; "
            "pass one channel at a time"
        )
    if wave.dtype == np.float64:
        wave = wave.astype(np.float32)
    if wave.dtype not in (np.int16, np.float32):
        raise TypeError(
            f"bucket_inputs wants int16 or float32/float64 PCM, "
            f"got {wave.dtype}"
        )

    def _buckets():
        padded, t = host_pad_waveform(wave, feat_cfg)
        if t == 0:
            return
        wave_len = bucket_wave_len(settings, feat_cfg)
        bucket = settings.bucket_frames
        shift = snip_cfg(feat_cfg).frame_shift_samples
        for k in range(-(-t // bucket)):
            lo = k * bucket * shift
            buf = np.zeros(wave_len, dtype=wave.dtype)
            src = padded[lo : lo + wave_len]
            buf[: len(src)] = src
            valid = min(t - k * bucket, bucket + settings.window - 1)
            yield buf, np.int32(valid), min(bucket, t - k * bucket)

    return _buckets()

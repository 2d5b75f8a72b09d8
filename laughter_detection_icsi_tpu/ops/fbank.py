"""Kaldi-compatible log-mel filterbank (Fbank) featurizer as XLA/TPU ops.

The reference extracts features with Lhotse's ``Fbank`` on CPU
(reference utils/utils.py:25, compute_features.py:84-109, load_data.py:47-49),
which implements Kaldi fbank semantics.  This module reimplements those
semantics as pure JAX ops so featurization runs **on device**, fused by XLA
into the inference/training graph (BASELINE.json north_star).

Design notes (TPU-first):
- The DFT is expressed as two real matmuls against precomputed cos/sin bases
  (frame matrix [T, 512] x [512, 257]) followed by the mel projection
  ([T, 257] x [257, n_mels]) — three MXU matmuls per block instead of an FFT
  butterfly, which is the fast path for these small transform sizes on TPU.
  ``jnp.fft.rfft`` is available behind ``use_fft=True`` for comparison.
- All shapes are static: ``num_frames`` is computed on host from the sample
  count; framing is a strided gather.

Kaldi semantics implemented (matching Lhotse FbankConfig defaults, which the
reference relies on — see SURVEY.md §7.3 "Kaldi-fbank bit-compatibility"):
- snip_edges=False: T = (n + shift//2) // shift frames, waveform padded by
  flipped (symmetric) edges, frame i starting at i*shift - (flen-shift)//2.
- remove_dc_offset per frame; preemphasis 0.97 (x[j]-0.97*x[j-1], edge uses
  x[0]); povey window (hann**0.85); zero-pad 400->512; power spectrum;
- mel filterbank: Kaldi mel scale 1127*ln(1+f/700), low=20 Hz,
  high=nyquist-400=7600 Hz, triangular in mel domain over FFT bins
  0..255 (Nyquist bin excluded); log with floor.
- dither defaults to 0.0 (Lhotse default), so the pipeline is deterministic.

Input convention: float waveform in [-1, 1] (what Lhotse feeds its Fbank).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from laughter_detection_icsi_tpu.config import FEAT, FeatConfig


# --------------------------------------------------------------------------- #
# Host-side precomputation (numpy, cached per config)
# --------------------------------------------------------------------------- #


def mel_scale(freq):
    return 1127.0 * np.log(1.0 + np.asarray(freq, dtype=np.float64) / 700.0)


@functools.lru_cache(maxsize=8)
def _mel_banks(cfg: FeatConfig) -> np.ndarray:
    """Kaldi triangular mel filterbank, shape [fft//2 + 1, num_filters].

    The Nyquist row is all-zero (Kaldi computes bins over fft_size//2 bins).
    """
    nfft = cfg.fft_size
    num_bins = cfg.num_filters
    nyquist = cfg.sampling_rate / 2.0
    high_freq = cfg.high_freq if cfg.high_freq > 0 else nyquist + cfg.high_freq
    mel_low = mel_scale(cfg.low_freq)
    mel_high = mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    num_fft_bins = nfft // 2
    fft_freqs = np.arange(num_fft_bins, dtype=np.float64) * (
        cfg.sampling_rate / nfft
    )
    mel_freqs = mel_scale(fft_freqs)  # [num_fft_bins]

    left = mel_low + np.arange(num_bins, dtype=np.float64) * mel_delta
    center = left + mel_delta
    right = center + mel_delta

    mel = mel_freqs[:, None]  # [num_fft_bins, 1]
    up = (mel - left[None, :]) / (center - left)[None, :]
    down = (right[None, :] - mel) / (right - center)[None, :]
    weights = np.where(
        (mel > left[None, :]) & (mel <= center[None, :]),
        up,
        np.where((mel > center[None, :]) & (mel < right[None, :]), down, 0.0),
    )
    out = np.zeros((nfft // 2 + 1, num_bins), dtype=np.float32)
    out[:num_fft_bins] = weights.astype(np.float32)
    return out


@functools.lru_cache(maxsize=8)
def _window_fn(cfg: FeatConfig) -> np.ndarray:
    n = cfg.frame_length_samples
    a = 2.0 * math.pi / (n - 1)
    i = np.arange(n, dtype=np.float64)
    hann = 0.5 - 0.5 * np.cos(a * i)
    if cfg.window_type == "povey":
        w = hann**0.85
    elif cfg.window_type == "hanning":
        w = hann
    elif cfg.window_type == "hamming":
        w = 0.54 - 0.46 * np.cos(a * i)
    elif cfg.window_type == "rectangular":
        w = np.ones(n)
    else:
        raise ValueError(f"unknown window_type {cfg.window_type!r}")
    return w.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _dft_bases(nfft: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real-DFT cos/sin bases, each [nfft, nfft//2 + 1] (float32)."""
    k = np.arange(nfft // 2 + 1, dtype=np.float64)
    n = np.arange(nfft, dtype=np.float64)
    angle = 2.0 * math.pi * np.outer(n, k) / nfft
    return np.cos(angle).astype(np.float32), (-np.sin(angle)).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _effective_bases(cfg: FeatConfig) -> Tuple[np.ndarray, np.ndarray]:
    """DFT bases with the whole per-frame preprocessing FOLDED IN.

    DC removal (I - J/N), preemphasis (banded; row 0 = (1-c)e0, Kaldi edge
    semantics), and the window (diagonal) are all linear maps on the frame,
    so ``spectral = frame @ (M^T @ basis)`` with ``M = diag(win) @ P @ D``
    computed once in float64.  At runtime the featurizer is pure MXU matmuls
    — no elementwise preprocessing pass, no gather (TPU-first design; the
    sequential reference ops live on in ``fbank(..., fold_preproc=False)``
    and the differential tests).

    Returns (cos_eff, sin_eff), each [frame_length_samples, nfft//2 + 1].
    """
    flen = cfg.frame_length_samples
    nfft = cfg.fft_size
    m = np.eye(flen, dtype=np.float64)
    if cfg.remove_dc_offset:
        m = m - np.full((flen, flen), 1.0 / flen)
    if cfg.preemph_coeff != 0.0:
        p = np.eye(flen, dtype=np.float64)
        idx = np.arange(1, flen)
        p[idx, idx - 1] = -cfg.preemph_coeff
        p[0, 0] = 1.0 - cfg.preemph_coeff
        m = p @ m
    m = np.diag(_window_fn(cfg).astype(np.float64)) @ m
    k = np.arange(nfft // 2 + 1, dtype=np.float64)
    n = np.arange(flen, dtype=np.float64)
    angle = 2.0 * math.pi * np.outer(n, k) / nfft
    cos_b, sin_b = np.cos(angle), -np.sin(angle)
    return (
        (m.T @ cos_b).astype(np.float32),
        (m.T @ sin_b).astype(np.float32),
    )


# --------------------------------------------------------------------------- #
# Shape math
# --------------------------------------------------------------------------- #


# Moved to the jax-free host_prep module (serving hosts need the frame
# geometry without jax); re-exported here because every featurizer caller
# reads them as fbank_ops.num_frames / fbank_ops.pad_amounts.
from laughter_detection_icsi_tpu.host_prep import (  # noqa: E402
    num_frames,
    pad_amounts,
)


# --------------------------------------------------------------------------- #
# The featurizer
# --------------------------------------------------------------------------- #


def frame_waveform(waveform: jnp.ndarray, cfg: FeatConfig = FEAT) -> jnp.ndarray:
    """[..., n] float waveform -> [..., T, frame_length_samples] frames."""
    n = waveform.shape[-1]
    shift = cfg.frame_shift_samples
    flen = cfg.frame_length_samples
    t = num_frames(n, cfg)
    if t == 0:
        # jnp.pad(mode='symmetric') rejects an empty axis; a zero-length
        # channel (truncated/empty file) should frame to 0 frames, matching
        # num_frames() and the Pallas path.
        return jnp.zeros((*waveform.shape[:-1], 0, flen), waveform.dtype)
    padded = _pad_for_framing(waveform, cfg)
    idx = jnp.arange(t)[:, None] * shift + jnp.arange(flen)[None, :]
    return padded[..., idx]


def _pad_for_framing(waveform: jnp.ndarray, cfg: FeatConfig) -> jnp.ndarray:
    """snip_edges=False symmetric padding (no-op when snip_edges).

    mode='symmetric' == Kaldi's edge mirroring, and stays well-defined
    (repeated mirroring) when a pad exceeds the wave length — naive edge
    slicing silently produced a SHORT pad for waves under ~frame_length
    and shifted every frame (see inference.host_pad_waveform).  The ONE
    implementation of this padding on the jnp side; fbank_pallas and
    frame_waveform both call it."""
    if cfg.snip_edges:
        return waveform
    n = waveform.shape[-1]
    left, right = pad_amounts(n, cfg)
    if right < 0:
        # Short-frame geometry (see pad_amounts): the last frame ends before
        # the waveform — drop the tail samples Kaldi never reads instead of
        # passing a negative pad (jnp.pad raises).
        waveform = waveform[..., : n + right]
        right = 0
    widths = [(0, 0)] * (waveform.ndim - 1) + [(left, right)]
    return jnp.pad(waveform, widths, mode="symmetric")


def _fbank_folded(
    waveform: jnp.ndarray, cfg: FeatConfig, dtype: jnp.dtype
) -> jnp.ndarray:
    """Matmul-only featurizer: framing as reshaped row-shifted views (no
    gather) against the preprocessing-folded bases (``_effective_bases``).

    frame r = wave[r*shift : r*shift + flen] decomposes into rows r, r+1 and
    the head of row r+2 of the [*, shift] wave view (valid while
    2*shift < flen <= 3*shift, i.e. the Kaldi 25 ms / 10 ms geometry).
    """
    shift = cfg.frame_shift_samples
    flen = cfg.frame_length_samples
    tail = flen - 2 * shift
    t = num_frames(waveform.shape[-1], cfg)
    padded = _pad_for_framing(waveform.astype(jnp.float32), cfg)
    need = (t + 2) * shift
    pad = need - padded.shape[-1]
    if pad > 0:
        widths = [(0, 0)] * (padded.ndim - 1) + [(0, pad)]
        padded = jnp.pad(padded, widths)
    rows = padded[..., :need].reshape(*padded.shape[:-1], t + 2, shift)
    p1 = rows[..., :t, :]
    p2 = rows[..., 1 : t + 1, :]
    p3 = rows[..., 2 : t + 2, :tail]

    cos_eff, sin_eff = _effective_bases(cfg)
    mm = functools.partial(
        jnp.matmul,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    re = (
        mm(p1, jnp.asarray(cos_eff[:shift]))
        + mm(p2, jnp.asarray(cos_eff[shift : 2 * shift]))
        + mm(p3, jnp.asarray(cos_eff[2 * shift :]))
    )
    im = (
        mm(p1, jnp.asarray(sin_eff[:shift]))
        + mm(p2, jnp.asarray(sin_eff[shift : 2 * shift]))
        + mm(p3, jnp.asarray(sin_eff[2 * shift :]))
    )
    power = re * re + im * im
    mel = mm(power, jnp.asarray(_mel_banks(cfg)))
    return jnp.log(jnp.maximum(mel, cfg.energy_floor)).astype(dtype)


def fbank(
    waveform: jnp.ndarray,
    cfg: FeatConfig = FEAT,
    use_fft: bool = False,
    dtype: jnp.dtype = jnp.float32,
    fold_preproc: bool = True,
) -> jnp.ndarray:
    """Log-mel features: [..., n] waveform -> [..., T, num_filters].

    Jit-compatible for fixed input length; compose with ``jax.jit`` /
    ``shard_map`` at the call site.  The default path folds the per-frame
    preprocessing into the DFT bases and frames by reshaped views — pure
    MXU matmuls, no gather (``_effective_bases``); ``fold_preproc=False``
    keeps the sequential reference ops (used by differential tests and
    non-Kaldi frame geometries).
    """
    if cfg.dither:
        # A deterministic featurizer by design (the reference's effective
        # Lhotse config has dither=0.0 too); dropping the knob silently
        # would fake parity with a dithering extractor.
        raise NotImplementedError(
            "dither != 0 is not implemented (features are deterministic)"
        )
    shift = cfg.frame_shift_samples
    flen = cfg.frame_length_samples
    if (
        fold_preproc
        and not use_fft
        and 2 * shift < flen <= 3 * shift
        and num_frames(waveform.shape[-1], cfg) > 0
    ):
        return _fbank_folded(waveform, cfg, dtype)
    frames = frame_waveform(waveform.astype(jnp.float32), cfg)
    if cfg.remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if cfg.preemph_coeff != 0.0:
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - cfg.preemph_coeff * prev
    frames = frames * jnp.asarray(_window_fn(cfg))

    nfft = cfg.fft_size
    if use_fft:
        padded = jnp.pad(
            frames, [(0, 0)] * (frames.ndim - 1) + [(0, nfft - flen)]
        )
        spec = jnp.fft.rfft(padded, axis=-1)
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    else:
        cos_b, sin_b = _dft_bases(nfft)
        # Frames are zero beyond flen, so contract only the first flen rows.
        cos_b = jnp.asarray(cos_b[:flen])
        sin_b = jnp.asarray(sin_b[:flen])
        # HIGHEST precision: TPU matmuls default to bf16-ish passes, which
        # breaks feature parity with the CPU reference.
        re = jnp.matmul(
            frames,
            cos_b,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        im = jnp.matmul(
            frames,
            sin_b,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        power = re * re + im * im

    mel = jnp.matmul(
        power,
        jnp.asarray(_mel_banks(cfg)),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out = jnp.log(jnp.maximum(mel, cfg.energy_floor))
    return out.astype(dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "use_fft"))
def fbank_jit(
    waveform: jnp.ndarray, cfg: FeatConfig = FEAT, use_fft: bool = False
) -> jnp.ndarray:
    return fbank(waveform, cfg, use_fft=use_fft)


def fbank_numpy(waveform: np.ndarray, cfg: FeatConfig = FEAT) -> np.ndarray:
    """Host (numpy) convenience wrapper used by CPU-only code paths."""
    return np.asarray(fbank_jit(jnp.asarray(waveform), cfg))

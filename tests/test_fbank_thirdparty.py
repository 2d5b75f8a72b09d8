"""Third-party + analytic anchors for the featurizer spec.

The in-repo NumPy oracle (test_fbank.py) could in principle share a
systematic misunderstanding with the production kernel (same author).  Two
defenses:

1. A torchaudio/lhotse differential that activates automatically when those
   packages exist (they are absent from this image — the test skips here but
   runs in any richer environment; VERDICT r1 item 9).
2. Analytic anchors derived from the published Kaldi/HTK definitions with
   in-test textbook math only — they pin the conventions a shared oracle bug
   could hide: mel-axis orientation/scale, frame-time alignment, and
   power-vs-magnitude spectrum (reference utils/utils.py:25 Fbank semantics).
"""

import numpy as np
import pytest

from laughter_detection_icsi_tpu.config import FEAT
from laughter_detection_icsi_tpu.ops import fbank as fb


def _features(wave: np.ndarray) -> np.ndarray:
    import dataclasses

    import jax.numpy as jnp

    cfg = FEAT
    left, right = fb.pad_amounts(len(wave), cfg)
    padded = np.concatenate([wave[:left][::-1], wave, wave[len(wave) - right:][::-1]])
    snip = dataclasses.replace(cfg, snip_edges=True)
    return np.asarray(fb.fbank_jit(jnp.asarray(padded), snip))


def test_torchaudio_kaldi_differential():
    """Differential vs torchaudio.compliance.kaldi.fbank with matching
    parameters (skips when torchaudio is not installed)."""
    torchaudio = pytest.importorskip("torchaudio")
    import torch

    gen = np.random.default_rng(5)
    wave = (gen.standard_normal(16000) * 0.1).astype(np.float32)
    want = torchaudio.compliance.kaldi.fbank(
        torch.from_numpy(wave)[None, :],
        sample_frequency=16000.0,
        num_mel_bins=FEAT.num_filters,
        frame_length=25.0,
        frame_shift=10.0,
        dither=0.0,
        preemphasis_coefficient=FEAT.preemph_coeff,
        remove_dc_offset=True,
        window_type="povey",
        low_freq=FEAT.low_freq,
        high_freq=FEAT.high_freq,
        snip_edges=False,
        use_energy=False,
    ).numpy()
    got = _features(wave)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_lhotse_fbank_differential():
    """Differential vs the exact extractor the reference uses
    (lhotse.Fbank — reference utils/utils.py:25; skips when absent)."""
    lhotse = pytest.importorskip("lhotse")

    gen = np.random.default_rng(6)
    wave = (gen.standard_normal(16000) * 0.1).astype(np.float32)
    extractor = lhotse.Fbank(
        lhotse.FbankConfig(num_filters=FEAT.num_filters, num_mel_bins=FEAT.num_filters)
    )
    want = extractor.extract(wave, sampling_rate=16000)
    got = _features(wave)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3)


# --------------------------------------------------------------------------- #
# Analytic spec anchors (always run)
# --------------------------------------------------------------------------- #


def _htk_mel(f):
    # Textbook HTK formula, written here independently of ops/fbank.mel_scale.
    return 2595.0 * np.log10(1.0 + f / 700.0)


def test_tone_lands_in_the_analytically_predicted_mel_bin():
    """A pure tone at frequency F must peak in the mel bin whose triangle
    center is nearest mel(F), with bin edges computed from the textbook
    formula and the config constants alone — catches mel-axis reversal,
    transposition, or scale errors end-to-end."""
    sr, nyq = 16000, 8000.0
    high = nyq + FEAT.high_freq  # negative high_freq = offset from Nyquist
    mlo, mhi = _htk_mel(FEAT.low_freq), _htk_mel(high)
    delta = (mhi - mlo) / (FEAT.num_filters + 1)

    t = np.arange(sr) / sr
    for freq in (300.0, 1000.0, 3000.0, 6500.0):
        wave = (0.3 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
        feats = _features(wave)
        # middle frames (no padding effects)
        band = int(np.argmax(feats[20:-20].mean(axis=0)))
        want_center = (_htk_mel(freq) - mlo) / delta - 1.0  # triangle index
        assert abs(band - want_center) <= 1.0, (freq, band, want_center)


def test_energy_burst_lands_at_the_right_frame():
    """A 50 ms burst at t=1.0 s must light up frames ~100-105 (frame_shift
    1/100 s) — catches framing offset / padding-centering errors."""
    sr = 16000
    wave = np.zeros(2 * sr, dtype=np.float32)
    wave[sr : sr + sr // 20] = (
        np.random.default_rng(7).standard_normal(sr // 20).astype(np.float32) * 0.5
    )
    feats = _features(wave)
    energy = feats.mean(axis=1)
    lo, hi = 100, 100 + 5
    quiet = np.concatenate([energy[: lo - 3], energy[hi + 3 :]])
    assert energy[lo:hi].mean() > quiet.mean() + 5.0  # ~e^5 power contrast
    assert lo - 2 <= int(np.argmax(energy)) <= hi + 2


def test_log_mel_is_log_of_POWER_spectrum():
    """Scaling the waveform by 10 must shift log-mel by exactly ln(100)
    (power spectrum); a magnitude-spectrum implementation would shift by
    ln(10) — the classic |X| vs |X|^2 confusion is detectable analytically."""
    gen = np.random.default_rng(8)
    wave = (gen.standard_normal(16000) * 0.05).astype(np.float32)
    a = _features(wave)
    b = _features(10.0 * wave)
    shift = b - a
    np.testing.assert_allclose(shift, np.log(100.0), atol=1e-3)

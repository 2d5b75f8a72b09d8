"""Featurizer tests: JAX fbank vs. an independent loop-based NumPy oracle.

The oracle below implements the Kaldi fbank spec (snip_edges=False symmetric
padding, per-frame DC removal, preemphasis, povey window, power spectrum,
Kaldi mel banks, log floor) in plain per-frame loops — deliberately written
differently from the vectorized/matmul production path so shared bugs are
unlikely.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from laughter_detection_icsi_tpu.config import FEAT, FeatConfig
from laughter_detection_icsi_tpu.ops import fbank as fb


def oracle_fbank(wave: np.ndarray, cfg: FeatConfig) -> np.ndarray:
    sr = cfg.sampling_rate
    shift = cfg.frame_shift_samples
    flen = cfg.frame_length_samples
    nfft = cfg.fft_size
    n = len(wave)

    t = (n + shift // 2) // shift
    pad_total = (t - 1) * shift + flen - n
    pad_left = (flen - shift) // 2
    pad_right = pad_total - pad_left
    padded = np.concatenate(
        [wave[:pad_left][::-1], wave, wave[n - pad_right :][::-1]]
    )

    # povey window
    i = np.arange(flen)
    win = (0.5 - 0.5 * np.cos(2 * np.pi * i / (flen - 1))) ** 0.85

    # mel banks via per-bin loop
    def mel(f):
        return 1127.0 * np.log(1.0 + f / 700.0)

    high = sr / 2 + cfg.high_freq if cfg.high_freq < 0 else cfg.high_freq
    mlo, mhi = mel(cfg.low_freq), mel(high)
    delta = (mhi - mlo) / (cfg.num_filters + 1)
    banks = np.zeros((cfg.num_filters, nfft // 2 + 1))
    for b in range(cfg.num_filters):
        left, center, right = (
            mlo + b * delta,
            mlo + (b + 1) * delta,
            mlo + (b + 2) * delta,
        )
        for k in range(nfft // 2):  # Nyquist excluded
            m = mel(k * sr / nfft)
            if left < m <= center:
                banks[b, k] = (m - left) / (center - left)
            elif center < m < right:
                banks[b, k] = (right - m) / (right - center)

    out = np.zeros((t, cfg.num_filters))
    for fi in range(t):
        frame = padded[fi * shift : fi * shift + flen].astype(np.float64).copy()
        frame -= frame.mean()
        pre = np.empty_like(frame)
        pre[0] = frame[0] - cfg.preemph_coeff * frame[0]
        pre[1:] = frame[1:] - cfg.preemph_coeff * frame[:-1]
        frame = pre * win
        spec = np.fft.rfft(frame, n=nfft)
        power = np.abs(spec) ** 2
        melbank = banks @ power
        out[fi] = np.log(np.maximum(melbank, cfg.energy_floor))
    return out


@pytest.fixture(scope="module")
def wave():
    gen = np.random.default_rng(23)  # module-local: independent of `rng`
    return (gen.standard_normal(16000 * 2) * 0.1).astype(np.float32)


def test_num_frames():
    assert fb.num_frames(16000) == 100  # 1 s -> 100 frames
    assert fb.num_frames(16079) == 100
    assert fb.num_frames(16080) == 101
    assert fb.num_frames(8000) == 50
    assert fb.num_frames(0) == 0


def test_fft_size():
    assert FEAT.frame_length_samples == 400
    assert FEAT.frame_shift_samples == 160
    assert FEAT.fft_size == 512


def test_matches_oracle(wave):
    got = np.asarray(fb.fbank_jit(wave))
    want = oracle_fbank(wave, FEAT)
    assert got.shape == want.shape == (200, 44)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fft_path_matches_matmul_path(wave):
    a = np.asarray(fb.fbank_jit(wave, use_fft=False))
    b = np.asarray(fb.fbank_jit(wave, use_fft=True))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_batched_channels(wave):
    stacked = np.stack([wave, wave * 0.5])
    got = np.asarray(fb.fbank_jit(stacked))
    single0 = np.asarray(fb.fbank_jit(stacked[0]))
    single1 = np.asarray(fb.fbank_jit(stacked[1]))
    np.testing.assert_allclose(got[0], single0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got[1], single1, rtol=1e-5, atol=1e-5)


def test_silence_hits_floor():
    quiet = np.zeros(16000, dtype=np.float32)
    got = np.asarray(fb.fbank_jit(quiet))
    np.testing.assert_allclose(got, np.log(FEAT.energy_floor), rtol=1e-6)


def test_mel_banks_shape_and_partition():
    banks = fb._mel_banks(FEAT)
    assert banks.shape == (257, 44)
    assert banks[-1].sum() == 0.0  # Nyquist excluded
    assert (banks >= 0).all()
    # every filter has some support
    assert (banks.sum(axis=0) > 0).all()


def test_empty_waveform_zero_frames():
    """A zero-length channel (truncated/empty file) must featurize to 0
    frames on every path, not crash in jnp.pad(mode='symmetric')."""
    import jax.numpy as jnp

    out = fb.fbank_jit(jnp.zeros(0, jnp.float32))
    assert out.shape == (0, 44)
    np_out = fb.fbank_numpy(np.zeros(0, np.float32))
    assert np_out.shape == (0, 44)


def test_dither_rejected_everywhere():
    """dither != 0 must raise on BOTH featurizer paths — silently ignoring
    it would fake parity with a dithering extractor."""
    import dataclasses

    from laughter_detection_icsi_tpu.ops import fbank_pallas as fp

    import jax.numpy as jnp

    cfg = dataclasses.replace(FEAT, dither=1.0)
    wave = jnp.zeros(16000, jnp.float32)
    with pytest.raises(NotImplementedError, match="dither"):
        fb.fbank(wave, cfg)
    with pytest.raises(NotImplementedError, match="dither"):
        fp.fbank_pallas(wave, cfg, interpret=True)


def test_pad_amounts_kaldi_per_term_truncation():
    """Kaldi's FirstSampleOfFrame truncates PER TERM: frame 0 begins at
    shift//2 - flen//2, so the left pad is flen//2 - shift//2.  For even
    flen / odd shift the folded form (flen - shift)//2 is one sample short
    (torchaudio feature_window.cc first_sample_of_frame semantics)."""
    import dataclasses

    cfg = dataclasses.replace(fb.FEAT, num_samples=3200)  # shift 5, flen 400
    assert cfg.frame_shift_samples == 5
    left, _right = fb.pad_amounts(10_000, cfg)
    assert left == 198  # 400//2 - 5//2; the folded form gives 197


def test_short_frame_geometry_truncates_not_crashes():
    """flen <= 2*shift (e.g. 50 frames/s with the default 25 ms window):
    the last frame ends BEFORE the waveform, pad_amounts returns a negative
    right pad, and the featurizer must drop the unread tail instead of
    crashing in jnp.pad."""
    import dataclasses

    cfg = dataclasses.replace(fb.FEAT, num_samples=50)  # shift 320, flen 400
    n = 3679
    left, right = fb.pad_amounts(n, cfg)
    assert right < 0
    wave = (np.random.default_rng(0).standard_normal(n) * 0.1).astype(np.float32)
    feats = np.asarray(fb.fbank(wave, cfg))
    t = fb.num_frames(n, cfg)
    assert feats.shape == (t, cfg.num_filters)
    # Frames must equal manual Kaldi framing: symmetric-pad left, truncate
    # the unread tail, then stride.
    manual = np.pad(wave[: n + right], (left, 0), mode="symmetric")
    frames = fb.frame_waveform(jnp.asarray(wave), cfg)
    for i in (0, t - 1):
        np.testing.assert_array_equal(
            np.asarray(frames[i]),
            manual[i * 320 : i * 320 + 400],
        )


def test_pallas_rejects_too_many_filters():
    import dataclasses

    from laughter_detection_icsi_tpu.ops import fbank_pallas as fp

    cfg = dataclasses.replace(fb.FEAT, num_filters=129)
    wave = np.zeros(16000, np.float32)
    with pytest.raises(NotImplementedError, match="mel filters"):
        fp.fbank_pallas(jnp.asarray(wave), cfg, interpret=True)

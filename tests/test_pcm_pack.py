"""Packed-PCM transfer codec: bit-exact round trips and wire-size wins.

The codec (ops/pcm_pack.py) must reproduce the int16 waveform EXACTLY —
feature parity (BASELINE.md) rides on it — while shrinking the
host->device byte stream on audio-like signals.  No reference analogue
(the reference reads local files, reference load_data.py:44); this is
transfer-bandwidth engineering for the TPU pipeline.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laughter_detection_icsi_tpu.ops import pcm_pack


def _roundtrip(wave: np.ndarray) -> pcm_pack.PackedPCM:
    packed = pcm_pack.pack_pcm(wave)
    out = jax.jit(
        lambda w, widths: pcm_pack.unpack_pcm(
            w, widths, n=packed.n, delta=packed.delta
        )
    )(jnp.asarray(packed.words), jnp.asarray(packed.widths))
    np.testing.assert_array_equal(np.asarray(out), wave.astype(np.int32))
    return packed


def test_roundtrip_silence_is_tiny():
    wave = np.zeros(3 * pcm_pack.BLOCK + 17, dtype=np.int16)
    packed = _roundtrip(wave)
    # All-zero blocks store zero data words; only padding + widths remain.
    assert np.all(packed.widths == 0)


def test_roundtrip_speech_like_saves_bytes():
    rng = np.random.default_rng(23)
    n = 64 * pcm_pack.BLOCK
    # AR(1)-filtered noise: spectrally tilted like speech, deltas are
    # narrow.  A python-loop recursion on 256k samples is fine in a test.
    e = rng.standard_normal(n) * 100
    x = np.empty(n)
    acc = 0.0
    for i in range(n):
        acc = 0.97 * acc + e[i]
        x[i] = acc
    wave = np.clip(x, -32768, 32767).astype(np.int16)
    packed = _roundtrip(wave)
    assert packed.delta  # deltas must win on tilted spectra
    assert packed.packed_bytes < 0.8 * packed.raw_bytes


def test_roundtrip_extremes_and_alternation():
    # Full-scale square wave: deltas of +-65535 need 17-bit blocks.
    wave = np.tile(np.array([32767, -32768], dtype=np.int16), 5000)
    _roundtrip(wave)


def test_roundtrip_white_noise_prefers_direct():
    rng = np.random.default_rng(0)
    wave = rng.integers(-30000, 30000, 4 * pcm_pack.BLOCK).astype(np.int16)
    packed = _roundtrip(wave)
    # White noise: deltas are WIDER than samples; direct mode must win.
    assert not packed.delta


def test_roundtrip_short_and_unaligned_lengths():
    rng = np.random.default_rng(1)
    for n in (0, 1, 31, 32, 33, pcm_pack.BLOCK - 1, pcm_pack.BLOCK + 1, 12345):
        wave = rng.integers(-2**14, 2**14, n).astype(np.int16)
        _roundtrip(wave)


def test_roundtrip_randomized_property():
    # Mixed regimes per block: silence, quiet, loud, DC offsets, ramps —
    # every block-width value 0..17 should get exercised across seeds.
    rng = np.random.default_rng(7)
    for _ in range(10):
        blocks = []
        for _ in range(6):
            kind = rng.integers(0, 5)
            if kind == 0:
                b = np.zeros(pcm_pack.BLOCK)
            elif kind == 1:
                b = rng.integers(-3, 4, pcm_pack.BLOCK)
            elif kind == 2:
                b = rng.integers(-32768, 32768, pcm_pack.BLOCK)
            elif kind == 3:
                b = np.full(pcm_pack.BLOCK, rng.integers(-32768, 32768))
            else:
                b = np.linspace(-30000, 30000, pcm_pack.BLOCK)


            blocks.append(b)
        n = int(rng.integers(1, 6 * pcm_pack.BLOCK))
        wave = np.concatenate(blocks)[:n].astype(np.int16)
        _roundtrip(wave)


def test_pack_rejects_non_int16():
    with pytest.raises(TypeError):
        pcm_pack.pack_pcm(np.zeros(10, dtype=np.float32))


def test_widths_are_minimal():
    # A block of values in [-4, 3] fits 3-bit two's complement exactly.
    wave = np.tile(np.array([-4, 3, 0, -1], dtype=np.int16), pcm_pack.BLOCK // 4)
    packed = pcm_pack.pack_pcm(wave, mode="direct")
    assert packed.widths.tolist() == [3]
    _roundtrip(wave)


def test_native_packer_matches_numpy():
    """The C++ packer (runtime/csrc/pcm_pack.cpp) must produce the exact
    numpy layout: same words, widths, and mode choice."""
    from laughter_detection_icsi_tpu.runtime import native

    if native._get_pack_lib() is None:
        pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(42)
    cases = [
        np.zeros(10000, dtype=np.int16),
        rng.integers(-30000, 30000, 3 * pcm_pack.BLOCK + 100).astype(np.int16),
        np.cumsum(rng.integers(-100, 101, 5 * pcm_pack.BLOCK)).clip(-32768, 32767).astype(np.int16),
        np.tile(np.array([32767, -32768], dtype=np.int16), 3000),
        rng.integers(-4, 4, 12345).astype(np.int16),
    ]
    for wave in cases:
        a = pcm_pack.pack_pcm(wave, use_native=True)
        b = pcm_pack.pack_pcm(wave, use_native=False)
        assert a.delta == b.delta
        np.testing.assert_array_equal(a.widths, b.widths)
        np.testing.assert_array_equal(a.words, b.words)
        _roundtrip(wave)


def test_pack_rejects_multidim():
    """pack_pcm must reject non-1-D input on BOTH paths: with the native
    packer a (C, T) array used to silently pack only the first C samples
    (n = len(wave) counts rows)."""
    wave2d = np.zeros((4, 1000), dtype=np.int16)
    with pytest.raises(TypeError, match="1-D"):
        pcm_pack.pack_pcm(wave2d, use_native=True)
    with pytest.raises(TypeError, match="1-D"):
        pcm_pack.pack_pcm(wave2d, use_native=False)

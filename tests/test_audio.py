"""Audio IO: SPHERE/WAV round-trips, segment reads, header parsing."""

import numpy as np
import pytest

from laughter_detection_icsi_tpu.data import audio


@pytest.fixture
def samples(rng):
    return (rng.standard_normal(16000) * 0.3).clip(-1, 1).astype(np.float32)


def _int16_roundtrip(x):
    return (np.clip(x, -1, 1) * 32767).astype(np.int16).astype(np.float32) / 32768.0


def test_wav_roundtrip(tmp_path, samples):
    path = str(tmp_path / "a.wav")
    audio.write_wav(path, samples, 16000)
    meta = audio.info(path)
    assert meta.sample_rate == 16000
    assert meta.num_samples == 16000
    assert meta.container == "wav"
    got, sr = audio.read(path)
    assert sr == 16000
    np.testing.assert_allclose(got, _int16_roundtrip(samples), atol=1 / 32768)


def test_sphere_roundtrip_both_endiannesses(tmp_path, samples):
    for be in (False, True):
        path = str(tmp_path / f"a_{be}.sph")
        audio.write_sphere(path, samples, 16000, big_endian=be)
        meta = audio.info(path)
        assert meta.container == "sphere"
        assert meta.big_endian == be
        got, sr = audio.read(path)
        assert sr == 16000
        np.testing.assert_allclose(got, _int16_roundtrip(samples), atol=1 / 32768)


def test_get_audio_length(tmp_path, samples):
    path = str(tmp_path / "a.sph")
    audio.write_sphere(path, samples, 16000)
    assert audio.get_audio_length(path) == pytest.approx(1.0)


def test_offset_duration_read(tmp_path, samples):
    path = str(tmp_path / "a.wav")
    audio.write_wav(path, samples, 16000)
    got, _ = audio.read(path, offset=0.25, duration=0.5)
    assert len(got) == 8000
    np.testing.assert_allclose(got, _int16_roundtrip(samples)[4000:12000], atol=1e-6)
    # reading past the end clips
    got, _ = audio.read(path, offset=0.9, duration=0.5)
    assert len(got) == 1600


def test_cut_segments(tmp_path, samples):
    path = str(tmp_path / "a.wav")
    audio.write_wav(path, samples, 16000)
    cut, sr = audio.cut_segments(path, [(0.0, 0.1), (0.5, 0.6)])
    assert len(cut) == 3200
    ref = _int16_roundtrip(samples)
    np.testing.assert_allclose(cut[:1600], ref[:1600], atol=1e-6)
    np.testing.assert_allclose(cut[1600:], ref[8000:9600], atol=1e-6)


def test_shorten_garbage_payload_rejected(tmp_path):
    """A header claiming embedded-shorten over a garbage payload must fail
    loudly (bad magic), not decode noise."""
    header = (
        b"NIST_1A\n   1024\nsample_rate -i 16000\nsample_count -i 10\n"
        b"sample_n_bytes -i 2\nsample_coding -s24 pcm,embedded-shorten-v2.00\n"
        b"end_head\n"
    )
    path = tmp_path / "s.sph"
    path.write_bytes(header + b" " * (1024 - len(header)) + b"\0" * 20)
    with pytest.raises(ValueError, match="magic|shorten"):
        audio.read(str(path))


def test_8bit_wav_is_unsigned(tmp_path):
    """WAV stores 8-bit PCM unsigned (midpoint 0x80): digital silence must
    decode to 0.0 (signed decode wrapped it to -1.0 — review finding);
    Python and C++ decoders must agree."""
    import struct as _struct

    from laughter_detection_icsi_tpu.runtime import native

    # hand-built 8-bit mono WAV: silence, full positive, full negative
    payload = bytes([0x80] * 4 + [0xFF] * 2 + [0x00] * 2)
    with open(tmp_path / "u8.wav", "wb") as f:
        f.write(b"RIFF" + _struct.pack("<I", 36 + len(payload)) + b"WAVEfmt ")
        f.write(_struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8))
        f.write(b"data" + _struct.pack("<I", len(payload)) + payload)
    path = str(tmp_path / "u8.wav")
    got, sr = audio.read(path)
    want = np.array([0, 0, 0, 0, 127, 127, -128, -128], np.float32) / 128.0
    np.testing.assert_allclose(got, want, atol=1e-6)
    if native.available():
        got_c, _ = native.read(path)
        np.testing.assert_allclose(got_c, want, atol=1e-6)
        # container reported from the actual header, not inferred
        assert native.info(path).container == "wav"


def test_stereo_channel_select(tmp_path, rng):
    left = (rng.standard_normal(800) * 0.2).astype(np.float32)
    right = (rng.standard_normal(800) * 0.2).astype(np.float32)
    stereo = np.stack([left, right], axis=1)
    path = str(tmp_path / "st.wav")
    audio.write_wav(path, stereo, 8000)
    got_l, _ = audio.read(path, channel=0)
    got_r, _ = audio.read(path, channel=1)
    np.testing.assert_allclose(got_l, _int16_roundtrip(left), atol=1e-6)
    np.testing.assert_allclose(got_r, _int16_roundtrip(right), atol=1e-6)


def test_wave_format_extensible_float(tmp_path, rng):
    # WAVE_FORMAT_EXTENSIBLE (0xFFFE) must resolve the real format from the
    # SubFormat GUID — an extensible float WAV decoded as integer PCM would
    # reinterpret float bit patterns as noise.
    import struct

    from laughter_detection_icsi_tpu.data import audio

    w = (rng.standard_normal(1600) * 0.1).astype(np.float32)
    path = str(tmp_path / "ext_float.wav")
    data = w.tobytes()
    # KSDATAFORMAT_SUBTYPE_IEEE_FLOAT GUID: 03000000-0000-0010-8000-00aa00389b71
    guid = struct.pack("<H", 3) + bytes.fromhex("0000000000001000800000aa00389b71")
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 16000 * 4, 4, 32)
    fmt += struct.pack("<H", 22) + struct.pack("<HI", 32, 0x4) + guid[2:]
    # rebuild: cbSize(22) + validbits(2) + channelmask(4) + full 16-byte GUID
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 16000 * 4, 4, 32)
    fmt += struct.pack("<HHI", 22, 32, 0x4) + guid
    riff = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    riff += b"data" + struct.pack("<I", len(data)) + data
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(riff)) + riff)

    info = audio.info(path)
    assert info.encoding == "float" and info.sample_bytes == 4
    got, sr = audio.read(path)
    assert sr == 16000
    np.testing.assert_allclose(got, w, atol=1e-6)

    # the native C++ decoder must agree (skips gracefully if g++ absent)
    from laughter_detection_icsi_tpu.runtime import native

    if native.available():
        wn, srn = native.read(path)
        np.testing.assert_allclose(wn, w, atol=1e-6)


def test_sphere_header_validation_matches_c(tmp_path, rng):
    """sample_n_bytes=0 / channel_count=0 / missing sample_rate are clean
    ValueErrors (the C twin rejects them at parse; a ZeroDivisionError deep
    in read() explained nothing)."""
    for body in (
        b"sample_rate -i 16000\nsample_count -i 4\nchannel_count -i 1\nsample_n_bytes -i 0\n",
        b"sample_rate -i 16000\nsample_count -i 4\nchannel_count -i 0\nsample_n_bytes -i 2\n",
        b"sample_count -i 4\nchannel_count -i 1\nsample_n_bytes -i 2\n",
    ):
        p = tmp_path / "bad.sph"
        hdr = b"NIST_1A\n   1024\n" + body + b"sample_coding -s3 pcm\nend_head\n"
        p.write_bytes(hdr.ljust(1024, b" ") + b"\x00" * 8)
        with pytest.raises(ValueError):
            audio.info(str(p))


def test_float16_wav_rejected_at_parse(tmp_path):
    import struct

    fmt = struct.pack("<HHIIHH", 3, 1, 16000, 16000 * 2, 2, 16)
    payload = b"\x00" * 8
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(payload)) + payload)
    p = tmp_path / "f16.wav"
    p.write_bytes(b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks)
    with pytest.raises(NotImplementedError, match="float WAV"):
        audio.info(str(p))


def test_write_sphere_stereo_roundtrip(tmp_path):
    two = np.stack([np.arange(50, dtype=np.int16),
                    np.arange(50, dtype=np.int16) + 1000], axis=1)
    p = tmp_path / "st.sph"
    audio.write_sphere(str(p), two, 16000)
    meta = audio.info(str(p))
    assert meta.num_channels == 2 and meta.num_samples == 50
    c0, _ = audio.read_int16(str(p), channel=0)
    c1, _ = audio.read_int16(str(p), channel=1)
    np.testing.assert_array_equal(c0, two[:, 0])
    np.testing.assert_array_equal(c1, two[:, 1])


def test_shorten_cache_is_lru(tmp_path, rng):
    from laughter_detection_icsi_tpu.data.audio import (
        _SHORTEN_CACHE,
        _SHORTEN_CACHE_LOCK,
    )

    paths = []
    for i in range(3):
        p = tmp_path / f"s{i}.sph"
        audio.write_sphere_shorten(
            str(p), (rng.standard_normal(4000) * 3000).astype(np.int16), 16000
        )
        paths.append(str(p))
    with _SHORTEN_CACHE_LOCK:
        _SHORTEN_CACHE.clear()
    audio.read(paths[0])          # A
    audio.read(paths[1])          # B
    audio.read(paths[0])          # A again (hot)
    audio.read(paths[2])          # C -> evicts B, not A
    with _SHORTEN_CACHE_LOCK:
        cached = {k[0] for k in _SHORTEN_CACHE}
    import os
    assert os.path.abspath(paths[0]) in cached
    assert os.path.abspath(paths[1]) not in cached


def test_negative_offset_clamps_to_zero(tmp_path, rng):
    """Negative offsets clamp to 0 like the C decoder: unclamped they
    seeked before the data chunk (OSError) on the PCM path and silently
    sliced from the ARRAY TAIL on the shorten path."""
    wave = (rng.standard_normal(16000) * 2000).astype(np.int16)
    wav = str(tmp_path / "n.wav")
    audio.write_wav(wav, wave, 16000)
    sph = str(tmp_path / "n.sph")
    audio.write_sphere_shorten(sph, wave, 16000)
    for path in (wav, sph):
        want, _ = audio.read(path, offset=0.0, duration=0.02)
        got, _ = audio.read(path, offset=-0.01, duration=0.02)
        np.testing.assert_array_equal(got, want)
        want16, _ = audio.read_int16(path, offset=0.0, duration=0.02)
        got16, _ = audio.read_int16(path, offset=-0.01, duration=0.02)
        np.testing.assert_array_equal(got16, want16)
        # duration=None from a negative offset = the WHOLE file, not a tail
        full, _ = audio.read_int16(path, offset=-0.01)
        np.testing.assert_array_equal(full, wave)
    from laughter_detection_icsi_tpu.runtime import native

    if native.available():
        got_n, _ = native.read(wav, offset=-0.01, duration=0.02)
        want_n, _ = native.read(wav, offset=0.0, duration=0.02)
        np.testing.assert_array_equal(got_n, want_n)

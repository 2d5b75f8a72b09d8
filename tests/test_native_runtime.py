"""Native C++ decoder vs the pure-Python codec: bit-identical output."""

import os

import numpy as np
import pytest

from laughter_detection_icsi_tpu.data import audio
from laughter_detection_icsi_tpu.runtime import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="no g++ toolchain to build native decoder"
)


@pytest.fixture(scope="module")
def sph_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("native") / "a.sph"
    gen = np.random.default_rng(23)  # module-local: independent of `rng`
    w = (gen.standard_normal(16000 * 2) * 0.3).astype(np.float32)
    audio.write_sphere(str(p), w, 16000)
    return str(p)


def test_info_matches_python(sph_file):
    a = native.info(sph_file)
    b = audio.info(sph_file)
    assert (a.sample_rate, a.num_samples, a.num_channels, a.sample_bytes,
            a.encoding, a.big_endian, a.data_offset) == (
        b.sample_rate, b.num_samples, b.num_channels, b.sample_bytes,
        b.encoding, b.big_endian, b.data_offset)


def test_read_matches_python(sph_file):
    a, sr_a = native.read(sph_file)
    b, sr_b = audio.read(sph_file)
    assert sr_a == sr_b
    np.testing.assert_array_equal(a, b)


def test_ranged_read(sph_file):
    a, _ = native.read(sph_file, offset=0.5, duration=0.25)
    b, _ = audio.read(sph_file, offset=0.5, duration=0.25)
    np.testing.assert_array_equal(a, b)
    # past EOF clamps
    a, _ = native.read(sph_file, offset=1.9, duration=5.0)
    assert len(a) == 16000 * 2 - int(1.9 * 16000)


def test_big_endian(tmp_path, rng):
    p = str(tmp_path / "be.sph")
    w = (rng.standard_normal(8000) * 0.3).astype(np.float32)
    audio.write_sphere(p, w, 16000, big_endian=True)
    a, _ = native.read(p)
    b, _ = audio.read(p)
    np.testing.assert_array_equal(a, b)


def test_wav(tmp_path, rng):
    p = str(tmp_path / "x.wav")
    w = (rng.standard_normal(8000) * 0.3).astype(np.float32)
    audio.write_wav(p, w, 16000)
    a, _ = native.read(p)
    b, _ = audio.read(p)
    np.testing.assert_array_equal(a, b)


def test_batch_read(tmp_path, rng):
    paths = []
    for i in range(5):
        p = str(tmp_path / f"c{i}.sph")
        audio.write_sphere(p, (rng.standard_normal(16000) * 0.2).astype(np.float32), 16000)
        paths.append(p)
    got = native.read_batch(paths, threads=4)
    assert len(got) == 5
    for p, (w, sr) in zip(paths, got):
        ref, _ = audio.read(p)
        np.testing.assert_array_equal(w, ref)


def test_error_reporting(tmp_path):
    p = tmp_path / "junk.sph"
    p.write_bytes(b"\x00\x01junkjunkjunk")
    with pytest.raises(ValueError, match="magic"):
        native.info(str(p))


def test_native_packer_rejects_bad_block():
    """pcm_pack C ABI: invalid block sizes (non-multiple of 32, <= 0)
    return an error instead of writing garbage."""
    from laughter_detection_icsi_tpu.runtime import native

    if native._get_pack_lib() is None:
        import pytest

        pytest.skip("no C++ toolchain")
    wave = np.zeros(100, dtype=np.int16)
    assert native.pack_pcm_native(wave, block=33) is None
    assert native.pack_pcm_native(wave, block=0) is None


def test_corrupt_cached_lib_recovers(tmp_path):
    """A torn .so (e.g. a compile SIGKILLed mid-write, leaving a fresh
    mtime) must trigger a rebuild, not poison the native path forever."""
    from laughter_detection_icsi_tpu.runtime import native

    if native._get_pack_lib() is None:
        pytest.skip("no C++ toolchain")
    lib_path = tmp_path / "libpcmpack.so"
    lib_path.write_bytes(b"\x7fELF garbage, definitely not a library")
    # Fresh mtime: the cache check alone would trust this file.
    os.utime(lib_path, None)
    lib = native._compile_and_load(native._PACK_SRC, lib_path)
    assert lib is not None
    assert hasattr(lib, "pcm_pack")


def test_compile_failure_returns_none(tmp_path):
    from laughter_detection_icsi_tpu.runtime import native

    bad_src = tmp_path / "bad.cpp"
    bad_src.write_text("this is not C++ at all {{{")
    assert native._compile_and_load(bad_src, tmp_path / "bad.so") is None


def _wav_bytes(fmt_code, channels, rate, bits, payload):
    import struct

    fmt = struct.pack("<HHIIHH", fmt_code, channels, rate,
                      rate * channels * (bits // 8) if rate else 0,
                      channels * (bits // 8), bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + __import__("struct").pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_corrupt_headers_rejected_identically(tmp_path):
    """rate=0 WAV and negative-sample_count SPHERE must be clean header
    errors from BOTH twins — not ZeroDivisionError / np.empty(-n) far
    downstream."""
    wav = tmp_path / "rate0.wav"
    wav.write_bytes(_wav_bytes(1, 1, 0, 16, b"\x00\x00" * 4))
    for impl in (native, audio):
        with pytest.raises(ValueError):
            impl.info(str(wav))
    sph = tmp_path / "neg.sph"
    hdr = (b"NIST_1A\n   1024\n"
           b"sample_rate -i 16000\nsample_count -i -5\nchannel_count -i 1\n"
           b"sample_n_bytes -i 2\nsample_coding -s3 pcm\nend_head\n")
    sph.write_bytes(hdr.ljust(1024, b" ") + b"\x00\x00" * 4)
    for impl in (native, audio):
        with pytest.raises(ValueError):
            impl.info(str(sph))


def test_float64_wav_matches_python(tmp_path, rng):
    """IEEE-float64 WAVs decode in BOTH twins (behavior must not depend on
    compiler availability)."""
    w = (rng.standard_normal(2000) * 0.2).astype(np.float64)
    wav = tmp_path / "f64.wav"
    wav.write_bytes(_wav_bytes(3, 1, 16000, 64, w.astype("<f8").tobytes()))
    a, sr_a = native.read(str(wav))
    b, sr_b = audio.read(str(wav))
    assert sr_a == sr_b == 16000
    np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(a, w.astype(np.float32), atol=1e-7)


def test_channel_arg_parity(tmp_path, rng):
    """Mono ignores `channel` in both twins; an out-of-range channel on a
    multichannel file is a clear error in both."""
    mono = tmp_path / "mono.wav"
    audio.write_wav(str(mono), (rng.standard_normal(1000) * 0.1).astype(np.float32), 16000)
    a, _ = native.read(str(mono), channel=3)
    b, _ = audio.read(str(mono), channel=3)
    np.testing.assert_array_equal(a, b)
    assert len(a) == 1000

    stereo = tmp_path / "st.wav"
    two = np.stack([np.arange(100), np.arange(100) + 7], axis=1).astype(np.int16)
    audio.write_wav(str(stereo), two, 16000)
    with pytest.raises(ValueError):
        native.read(str(stereo), channel=5)
    with pytest.raises(ValueError):
        audio.read(str(stereo), channel=5)


def test_read_batch_channels_validation(tmp_path, rng):
    p = tmp_path / "b.wav"
    audio.write_wav(str(p), (rng.standard_normal(500) * 0.1).astype(np.float32), 16000)
    with pytest.raises(ValueError, match="channels"):
        native.read_batch([str(p), str(p)], channels=[])
    with pytest.raises(ValueError, match="channels"):
        native.read_batch([str(p), str(p)], channels=[0])
    out = native.read_batch([str(p), str(p)], channels=[0, 0])
    assert len(out) == 2 and len(out[0][0]) == 500

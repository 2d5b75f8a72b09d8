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

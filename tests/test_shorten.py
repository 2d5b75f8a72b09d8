"""Shorten v2 codec: Python round-trips, C++/Python differentials, and the
SPHERE-level integration the ICSI corpus needs (the reference shells out to
sph2pipe for this decode — reference
analysis/output_processing/laughs_to_wav.py:42-60; here it is in-framework).
"""

import numpy as np
import pytest

from laughter_detection_icsi_tpu.data import audio, shorten
from laughter_detection_icsi_tpu.runtime import native


def _speechlike(rng, n, scale=400):
    x = np.cumsum(rng.standard_normal(n) * scale)
    x -= np.linspace(0, x[-1], n)
    return np.clip(x, -32000, 32000).astype(np.int16)


@pytest.fixture(scope="module")
def wave():
    rng = np.random.default_rng(23)
    return _speechlike(rng, 40000)


# --------------------------------------------------------------------------- #
# Pure-Python round-trips (one per decode path)
# --------------------------------------------------------------------------- #


def _roundtrip(x, **kwargs):
    dec = shorten.decode(shorten.encode(x, **kwargs))
    got = dec.samples.astype(np.int16)
    want = x if x.ndim == 2 else x[:, None]
    np.testing.assert_array_equal(got, want)
    return dec


def test_roundtrip_default(wave):
    _roundtrip(wave)


def test_roundtrip_forced_predictors(wave):
    # Each fixed predictor decode path, pinned via force_fn.
    for fn in (shorten.FN_DIFF0, shorten.FN_DIFF1, shorten.FN_DIFF2,
               shorten.FN_DIFF3):
        _roundtrip(wave[:5000], force_fn=fn)


def test_roundtrip_qlpc_forced(wave):
    _roundtrip(wave[:5000], use_qlpc=True, force_fn=shorten.FN_QLPC)


def test_roundtrip_diff0_with_mean_tracking():
    # DC-offset signal + nmean makes coffset non-trivial: the decoder's
    # rolling block-mean (C-truncated division, rounded shift) is exercised
    # for real, not with coffset == 0.
    rng = np.random.default_rng(7)
    x = (8000 + rng.integers(-300, 300, size=4000)).astype(np.int16)
    _roundtrip(x, nmean=4, force_fn=shorten.FN_DIFF0)
    _roundtrip(x, nmean=4)  # free predictor choice, same state tracking


def test_roundtrip_bitshift(wave):
    x = (wave.astype(np.int32) & ~7).astype(np.int16)
    _roundtrip(x, bitshift=3)


def test_roundtrip_bitshift_with_mean():
    rng = np.random.default_rng(11)
    x = ((2000 + rng.integers(-100, 100, size=3000)) << 2).astype(np.int16)
    _roundtrip(x, bitshift=2, nmean=4)


def test_roundtrip_partial_last_block(wave):
    # n not divisible by blocksize -> FN_BLOCKSIZE before the tail block.
    x = wave[: 256 * 7 + 77]
    _roundtrip(x, blocksize=256)


def test_roundtrip_zero_blocks():
    x = np.zeros(2000, dtype=np.int16)
    x[1200:1300] = 5000  # some non-zero so not all blocks are FN_ZERO
    _roundtrip(x)


def test_roundtrip_multichannel(wave):
    st = np.stack([wave[:8000], np.roll(wave[:8000], 9)], axis=1)
    _roundtrip(np.ascontiguousarray(st, dtype=np.int16), nmean=2)


def test_verbatim_payload_preserved(wave):
    hdr = b"NIST_1A fake embedded header " * 40  # > one 256-byte chunk
    dec = _roundtrip(wave[:2000], verbatim=hdr)
    assert dec.verbatim == hdr


def test_max_frames_truncation(wave):
    enc = shorten.encode(wave[:4000])
    dec = shorten.decode(enc, max_frames=1000)
    np.testing.assert_array_equal(
        dec.samples[:, 0].astype(np.int16), wave[:1000]
    )


def test_bad_magic_rejected():
    with pytest.raises(ValueError, match="magic"):
        shorten.decode(b"nope" + b"\0" * 32)


def test_bad_version_rejected(wave):
    enc = bytearray(shorten.encode(wave[:256]))
    enc[4] = 1
    with pytest.raises(NotImplementedError, match="version"):
        shorten.decode(bytes(enc))


def test_oversized_bitshift_rejected():
    """bitshift >= 64 makes numpy's int64 << silently produce 0 (all-zero
    'decoded' audio); the decoder must reject it like every other header
    field.  The encoder validates its own bitshift, so craft the stream."""
    w = shorten._BitWriter()
    w.ulong(shorten.TYPE_S16HL)
    w.ulong(1)  # nchan
    w.ulong(256)  # blocksize
    w.ulong(0)  # maxnlpc
    w.ulong(0)  # nmean
    w.ulong(0)  # nskip
    w.uvar(shorten.FN_BITSHIFT, shorten._FNSIZE)
    w.uvar(70, shorten._BITSHIFTSIZE)
    w.uvar(shorten.FN_QUIT, shorten._FNSIZE)
    stream = shorten.MAGIC + bytes([shorten.VERSION]) + w.getvalue()
    with pytest.raises(ValueError, match="bitshift"):
        shorten.decode(stream)


def test_truncated_stream_rejected(wave):
    enc = shorten.encode(wave[:4000])
    with pytest.raises(ValueError, match="truncated|shorten"):
        shorten.decode(enc[: len(enc) // 3])


def test_fuzz_decoder_never_hangs_or_crashes(wave):
    """Malformed streams (random bytes, bit-flips in valid streams, random
    suffixes after a valid magic) must raise cleanly — never hang, never
    return silently wrong data without an exception, never segfault the
    C++ twin."""
    rng = np.random.default_rng(99)
    enc = shorten.encode(wave[:2000])
    cases = []
    for _ in range(8):  # random garbage with valid magic+version
        cases.append(
            enc[:5] + rng.integers(0, 256, size=200, dtype=np.uint8).tobytes()
        )
    for _ in range(12):  # bit flips inside an otherwise valid stream
        b = bytearray(enc)
        for _ in range(3):
            pos = int(rng.integers(5, len(b)))
            b[pos] ^= 1 << int(rng.integers(0, 8))
        cases.append(bytes(b))
    for payload in cases:
        try:
            out = shorten.decode(payload, max_frames=2000)
            assert out.samples.shape[0] <= 2000  # bounded if it "succeeds"
        except (ValueError, NotImplementedError):
            pass


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_fuzz_native_decoder(tmp_path, wave):
    """Same fuzz corpus through the C++ decoder: negative rc or bounded
    output, in-process (a crash would kill the test runner — that IS the
    assertion)."""
    rng = np.random.default_rng(101)
    enc = shorten.encode(wave[:2000])
    for i in range(12):
        b = bytearray(enc)
        for _ in range(4):
            pos = int(rng.integers(5, len(b)))
            b[pos] ^= 1 << int(rng.integers(0, 8))
        path = str(tmp_path / f"fz{i}.sph")
        x = np.zeros(2000, dtype=np.int16)  # dummy; header written below
        head = (
            f"NIST_1A\n{1024:7d}\nchannel_count -i 1\nsample_count -i 2000\n"
            "sample_rate -i 16000\nsample_n_bytes -i 2\n"
            "sample_byte_format -s2 10\n"
            "sample_coding -s26 pcm,embedded-shorten-v2.00\nend_head\n"
        ).encode()
        with open(path, "wb") as f:
            f.write(head + b" " * (1024 - len(head)))
            f.write(bytes(b))
        try:
            got = native.decode_shorten(path, 2000, 1)
            assert got.shape[0] <= 2000
        except ValueError:
            pass


# --------------------------------------------------------------------------- #
# C++ decoder differential (independent implementation, same bitstreams)
# --------------------------------------------------------------------------- #


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
@pytest.mark.parametrize(
    "kwargs",
    [
        {},
        {"nmean": 4},
        {"use_qlpc": True, "force_fn": shorten.FN_QLPC},
        {"bitshift": 2},
        {"blocksize": 100},
    ],
    ids=["default", "nmean", "qlpc", "bitshift", "blocksize"],
)
def test_native_matches_python(tmp_path, wave, kwargs):
    x = wave[:12000]
    if kwargs.get("bitshift"):
        x = (x.astype(np.int32) & ~((1 << kwargs["bitshift"]) - 1)).astype(
            np.int16
        )
    path = str(tmp_path / "t.sph")
    _write_shorten_sphere(path, x, **kwargs)
    got = native.decode_shorten(path, len(x), 1)
    np.testing.assert_array_equal(got[:, 0], x)


def _write_shorten_sphere(path, x, **enc_kwargs):
    payload = shorten.encode(x, **enc_kwargs)
    n, nchan = (len(x), 1) if x.ndim == 1 else x.shape
    head = (
        f"NIST_1A\n{1024:7d}\nchannel_count -i {nchan}\nsample_count -i {n}\n"
        "sample_rate -i 16000\nsample_n_bytes -i 2\n"
        "sample_byte_format -s2 10\n"
        "sample_coding -s26 pcm,embedded-shorten-v2.00\nend_head\n"
    ).encode()
    with open(path, "wb") as f:
        f.write(head + b" " * (1024 - len(head)))
        f.write(payload)


def test_qlpc_short_tail_block_with_mean_tracking(tmp_path, wave):
    """The nastiest state corner: QLPC (in-place coffset-subtracted history,
    exactly as shorten.c does it) + a final FN_BLOCKSIZE block SHORTER than
    nwrap (wrap copies from old history slots) + nmean>0 (coffset != 0).
    Python round-trip AND the C++ twin must agree sample-for-sample."""
    x = (6000 + wave[: 256 * 3 + 2].astype(np.int32) // 8).astype(np.int16)
    enc = shorten.encode(
        x, use_qlpc=True, nmean=2, force_fn=shorten.FN_QLPC, blocksize=256
    )
    dec = shorten.decode(enc)
    np.testing.assert_array_equal(dec.samples[:, 0].astype(np.int16), x)
    if native.available():
        path = str(tmp_path / "q.sph")
        _write_shorten_sphere(
            path, x, use_qlpc=True, nmean=2,
            force_fn=shorten.FN_QLPC, blocksize=256,
        )
        got = native.decode_shorten(path, len(x), 1)
        np.testing.assert_array_equal(got[:, 0], x)


def test_tiny_payload_rejected():
    for payload in (b"", b"aj", b"ajkg"):
        with pytest.raises(ValueError, match="magic"):
            shorten.decode(payload)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_rejects_channel_count_mismatch(tmp_path, wave):
    """The SPHERE header sizes the output buffer; a payload claiming a
    different channel count must be rejected, not written through (it
    would overflow the caller's buffer)."""
    x = wave[:4000]
    payload = shorten.encode(np.stack([x, x], axis=1).astype(np.int16))
    head = (
        f"NIST_1A\n{1024:7d}\nchannel_count -i 1\nsample_count -i 4000\n"
        "sample_rate -i 16000\nsample_n_bytes -i 2\n"
        "sample_byte_format -s2 10\n"
        "sample_coding -s26 pcm,embedded-shorten-v2.00\nend_head\n"
    ).encode()
    path = str(tmp_path / "mm.sph")
    with open(path, "wb") as f:
        f.write(head + b" " * (1024 - len(head)))
        f.write(payload)
    with pytest.raises(ValueError):
        native.decode_shorten(path, 4000, 1)


def test_read_int16_returns_independent_buffer(tmp_path, wave):
    """Mutating a returned buffer must not poison the shorten decode cache."""
    x = wave[:3000]
    path = str(tmp_path / "c.sph")
    audio.write_sphere_shorten(path, x, 16000)
    a, _ = audio.read_int16(path)
    a[:] = 0  # caller scribbles on its buffer
    b, _ = audio.read_int16(path)
    np.testing.assert_array_equal(b, x)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_multichannel(tmp_path, wave):
    """C++ decode of a stereo shorten SPHERE: per-channel predictor state
    and interleaved output (the far-field ICSI mixes are multi-channel)."""
    st = np.ascontiguousarray(
        np.stack([wave[:6000], np.roll(wave[:6000], 17)], axis=1),
        dtype=np.int16,
    )
    path = str(tmp_path / "st.sph")
    _write_shorten_sphere(path, st, nmean=2)
    got = native.decode_shorten(path, 6000, 2)
    np.testing.assert_array_equal(got, st)
    # channel selection through the generic reader
    a, _ = audio.read(path, channel=1)
    np.testing.assert_array_equal(
        a, st[:, 1].astype(np.float32) / 32768.0
    )


# --------------------------------------------------------------------------- #
# SPHERE-level integration: shorten file behaves exactly like its PCM twin
# --------------------------------------------------------------------------- #


def test_write_sphere_shorten_reads_like_pcm_twin(tmp_path, wave):
    x = wave[:16000]
    shn, pcm = str(tmp_path / "a.shn.sph"), str(tmp_path / "a.pcm.sph")
    audio.write_sphere_shorten(shn, x, 16000)
    audio.write_sphere(pcm, x, 16000, big_endian=True)

    meta = audio.info(shn)
    assert meta.encoding == "shorten"
    assert meta.num_samples == len(x)
    assert audio.get_audio_length(shn) == audio.get_audio_length(pcm)

    a, sr_a = audio.read(shn)
    b, sr_b = audio.read(pcm)
    assert sr_a == sr_b == 16000
    np.testing.assert_array_equal(a, b)


def test_ranged_read_matches_pcm_twin(tmp_path, wave):
    x = wave[:16000]
    shn, pcm = str(tmp_path / "a.shn.sph"), str(tmp_path / "a.pcm.sph")
    audio.write_sphere_shorten(shn, x, 16000)
    audio.write_sphere(pcm, x, 16000)
    a, _ = audio.read(shn, offset=0.25, duration=0.5)
    b, _ = audio.read(pcm, offset=0.25, duration=0.5)
    assert len(a) == 8000
    np.testing.assert_array_equal(a, b)


def test_read_int16_on_shorten(tmp_path, wave):
    x = wave[:9000]
    shn = str(tmp_path / "a.sph")
    audio.write_sphere_shorten(shn, x, 16000)
    got, sr = audio.read_int16(shn, offset=0.1, duration=0.3)
    np.testing.assert_array_equal(got, x[1600 : 1600 + 4800])
    assert got.dtype == np.int16 and sr == 16000


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_read_and_batch_mixed(tmp_path, wave):
    """native.read / read_batch serve shorten files transparently, mixed
    with plain-PCM files in one batch call."""
    x, y = wave[:8000], np.roll(wave[:8000], 31)
    shn, pcm = str(tmp_path / "a.sph"), str(tmp_path / "b.sph")
    audio.write_sphere_shorten(shn, x, 16000)
    audio.write_sphere(pcm, y, 16000)

    a, _ = native.read(shn, offset=0.1, duration=0.2)
    np.testing.assert_allclose(
        a, x[1600:4800].astype(np.float32) / 32768.0, atol=0
    )
    got = native.read_batch([shn, pcm])
    np.testing.assert_array_equal(got[0][0], x.astype(np.float32) / 32768.0)
    np.testing.assert_array_equal(got[1][0], y.astype(np.float32) / 32768.0)


def test_feature_windows_identical_on_shorten_and_pcm(tmp_path, wave):
    """End-to-end guard: the inference featurizer sees identical audio from
    a shorten meeting channel and its PCM twin (SURVEY §2.3 audio decode)."""
    x = wave[:16000]
    shn, pcm = str(tmp_path / "a.shn.sph"), str(tmp_path / "a.pcm.sph")
    audio.write_sphere_shorten(shn, x, 16000)
    audio.write_sphere(pcm, x, 16000)
    a, _ = audio.read(shn)
    b, _ = audio.read(pcm)
    np.testing.assert_array_equal(a, b)
    # And the int16 device-transfer path agrees with the float path.
    ia, _ = audio.read_int16(shn)
    np.testing.assert_array_equal(ia.astype(np.float32) / 32768.0, a)


# --------------------------------------------------------------------------- #
# Third-party oracle: FFmpeg's libavcodec shorten decoder
# --------------------------------------------------------------------------- #


@pytest.fixture(scope="module")
def ffmpeg_decoder(tmp_path_factory):
    """Compile tests/fixtures/shn_ffmpeg_decode.c against libavcodec (gated:
    skips when the dev headers are absent).  This is the differential that
    proves the encoder emits REAL shorten v2 — the bitstream LDC/ICSI tools
    produce — not a self-consistent dialect (a resn off-by-one that
    round-tripped cleanly through our own twin decoders was caught exactly
    this way)."""
    import shutil
    import subprocess
    from pathlib import Path

    src = Path(__file__).parent / "fixtures" / "shn_ffmpeg_decode.c"
    cc = shutil.which("gcc") or shutil.which("g++")
    if cc is None:
        pytest.skip("no C compiler available")
    exe = tmp_path_factory.mktemp("shn_oracle") / "shn_dec"
    r = subprocess.run(
        [cc, "-O2", str(src), "-o", str(exe),
         "-lavformat", "-lavcodec", "-lavutil"],
        capture_output=True,
    )
    if r.returncode != 0:
        pytest.skip("libavformat/libavcodec dev libraries not available")
    return str(exe)


def _wav_header(n, sr=16000, nch=1):
    """FFmpeg's shorten decoder requires the verbatim section to be a
    WAV/AIFF header (real .shn files embed the original file header)."""
    import struct

    data = n * 2 * nch
    return (
        b"RIFF" + struct.pack("<I", 36 + data) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, nch, sr, sr * 2 * nch, 2 * nch, 16)
        + b"data" + struct.pack("<I", data)
    )


def _ffmpeg_decode(exe, stream, tmp_path):
    import subprocess

    p = tmp_path / "t.shn"
    p.write_bytes(stream)
    out = subprocess.run([exe, str(p)], capture_output=True)
    assert out.returncode == 0, out.stderr.decode()[:300]
    return np.frombuffer(out.stdout, dtype="<i2")


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(blocksize=256, nmean=4),
        dict(blocksize=256, nmean=0),
        dict(blocksize=77, nmean=4),
        dict(blocksize=256, nmean=0, bitshift=2),
        dict(blocksize=256, nmean=4, use_qlpc=True),
        dict(blocksize=256, nmean=4, force_fn=shorten.FN_DIFF3),
    ],
    ids=["nmean4", "nmean0", "oddblock", "bitshift", "qlpc", "diff3"],
)
def test_ffmpeg_decodes_our_streams(ffmpeg_decoder, tmp_path, wave, kwargs):
    x = wave[:10000]
    if kwargs.get("bitshift"):
        x = x & ~np.int16((1 << kwargs["bitshift"]) - 1)
    enc = shorten.encode(x, verbatim=_wav_header(len(x)), **kwargs)
    got = _ffmpeg_decode(ffmpeg_decoder, enc, tmp_path)
    np.testing.assert_array_equal(got, x)
    # and our own decoder agrees, of course
    np.testing.assert_array_equal(shorten.decode(enc).samples[:, 0], x)
    # NOT parameterized: bitshift combined with nmean>0.  There FFmpeg
    # floor-shifts the offset mean (coffset >> bitshift) while original
    # shorten/sph2pipe — the lineage that wrote the LDC/ICSI files — uses
    # the rounded ((x >> (n-1)) + 1) >> 1; the two genuinely differ for odd
    # intermediate means and this codec follows the original.


def test_ffmpeg_decodes_our_stereo_stream(ffmpeg_decoder, tmp_path, wave):
    st = np.stack([wave[:6000], (wave[3000:9000] // 2).astype(np.int16)], axis=1)
    enc = shorten.encode(st, verbatim=_wav_header(6000, nch=2), blocksize=256, nmean=4)
    got = _ffmpeg_decode(ffmpeg_decoder, enc, tmp_path).reshape(-1, 2)
    np.testing.assert_array_equal(got, st)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_truncated_stream_rejected(tmp_path, wave):
    """A truncated shorten payload must error like the Python twin.  The
    old overrun guards (`pos > len + 16`) were unreachable — uvar's
    early-return froze pos inside (len+8, len+16] — so the native decoder
    silently returned the full header-declared length with a zero tail,
    feeding corrupted audio downstream while compiler-less hosts raised."""
    x = wave[:8000]
    path = str(tmp_path / "trunc.sph")
    _write_shorten_sphere(path, x)
    full = open(path, "rb").read()
    for frac in (0.3, 0.6, 0.9):
        cut = 1024 + int((len(full) - 1024) * frac)
        open(path, "wb").write(full[:cut])
        with pytest.raises(ValueError):
            native.decode_shorten(path, len(x), 1)


def test_encode_rejects_out_of_bounds_params(wave):
    """encode() must mirror decode()'s bounds: blocksize<=0 used to spin
    the encode loop forever, and out-of-range blocksize/nchan encoded
    streams every decoder rejects."""
    with pytest.raises(ValueError, match="blocksize"):
        shorten.encode(wave[:100], blocksize=0)
    with pytest.raises(ValueError, match="blocksize"):
        shorten.encode(wave[:100], blocksize=70000)
    with pytest.raises(ValueError, match="channel"):
        shorten.encode(np.zeros((10, 65), np.int16))

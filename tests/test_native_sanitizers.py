"""Sanitizer gates for the native host runtime (SURVEY.md §5.2).

The reference's only concurrency answer was disabling threads
(torch.set_num_threads(1), reference compute_features.py:93-95) and it has
no sanitizer story at all.  This framework's C++ decode path runs a pthread
pool over untrusted bytes on the serving host, so it gets a real one:

* ThreadSanitizer over concurrent batch decodes of the SAME files plus
  header-parse/packer hammer threads (data races);
* AddressSanitizer + UBSan over deterministic truncation/bit-flip mutants
  of every container/encoding we parse (parser memory safety), plus the
  packer's argument space.

Both compile the PRODUCTION sources (audio_decoder.cpp, pcm_pack.cpp)
together with runtime/csrc/sanitize_harness.cpp into standalone binaries —
instrumenting the real code, not a copy.  Skips (not fails) where the
toolchain lacks the sanitizer runtimes.
"""

import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

from laughter_detection_icsi_tpu.data import audio

CSRC = Path(__file__).resolve().parent.parent / (
    "laughter_detection_icsi_tpu/runtime/csrc"
)
SOURCES = [CSRC / "audio_decoder.cpp", CSRC / "pcm_pack.cpp",
           CSRC / "sanitize_harness.cpp"]

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no g++ in environment"
)


def _build(tmp_path: Path, name: str, san_flags) -> Path:
    out = tmp_path / name
    cmd = ["g++", "-O1", "-g", "-fno-omit-frame-pointer", *san_flags,
           *[str(s) for s in SOURCES], "-o", str(out), "-lpthread"]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        pytest.skip(f"sanitizer build unavailable: {proc.stderr[-300:]}")
    return out


@pytest.fixture(scope="module")
def fixture_files(tmp_path_factory):
    """One file per (container, encoding, endianness) branch of the parser."""
    d = tmp_path_factory.mktemp("san_fixtures")
    rng = np.random.default_rng(7)
    mono = (rng.standard_normal(4000) * 0.2).astype(np.float32)
    stereo = (rng.standard_normal((3000, 2)) * 0.2).astype(np.float32)

    audio.write_wav(str(d / "a.wav"), mono, 16000)
    audio.write_wav(str(d / "b.wav"), stereo, 16000)
    audio.write_sphere(str(d / "le.sph"), mono, 16000, big_endian=False)
    audio.write_sphere(str(d / "be.sph"), mono, 16000, big_endian=True)
    audio.write_sphere_shorten(str(d / "shn.sph"), mono, 16000, blocksize=256)

    # µ-law SPHERE (no writer in data/audio.py — hand-rolled header + raw
    # bytes; the decoder only needs header fields + payload length).
    ulaw_payload = rng.integers(0, 256, size=4000, dtype=np.uint8).tobytes()
    lines = ["NIST_1A", f"{1024:7d}", "channel_count -i 1",
             "sample_count -i 4000", "sample_rate -i 8000",
             "sample_n_bytes -i 1", "sample_coding -s4 ulaw", "end_head"]
    head = ("\n".join(lines) + "\n").encode()
    (d / "u.sph").write_bytes(head + b" " * (1024 - len(head)) + ulaw_payload)

    # Garbage magic: exercises the rejection path under mutation too.
    (d / "junk.bin").write_bytes(b"\x01\x02garbage" * 64)
    return sorted(str(p) for p in d.iterdir())


def _run(binary: Path, mode: str, files, env_extra):
    import os

    env = dict(os.environ)
    env.update(env_extra)
    return subprocess.run(
        [str(binary), mode, *files],
        capture_output=True, text=True, timeout=600, env=env,
    )


def test_tsan_concurrent_batch_decode(tmp_path, fixture_files):
    binary = _build(tmp_path, "harness_tsan", ["-fsanitize=thread"])
    proc = _run(binary, "race", fixture_files,
                {"TSAN_OPTIONS": "halt_on_error=1 exitcode=66"})
    assert proc.returncode == 0, (proc.stdout, proc.stderr[-2000:])
    assert "ThreadSanitizer" not in proc.stderr, proc.stderr[-2000:]


def test_asan_ubsan_fuzz_malformed_inputs(tmp_path, fixture_files):
    binary = _build(
        tmp_path, "harness_asan",
        ["-fsanitize=address,undefined", "-fno-sanitize-recover=all"],
    )
    # Leak checking off: each mutant decode is a fresh short-lived call and
    # the signal here is memory CORRUPTION/UB; LSAN would also flag the
    # harness's own deliberately simple cleanup on early-exit paths.
    env = {"ASAN_OPTIONS": "detect_leaks=0", "UBSAN_OPTIONS": "print_stacktrace=1"}
    proc = _run(binary, "fuzz", fixture_files, env)
    assert proc.returncode == 0, (proc.stdout, proc.stderr[-3000:])
    for marker in ("AddressSanitizer", "runtime error"):
        assert marker not in proc.stderr, proc.stderr[-3000:]


def test_asan_concurrent_batch_decode(tmp_path, fixture_files):
    """The race workload again, under ASAN: heap overflows that only the
    threaded batch path can hit (shared output sizing, worker handoff)."""
    binary = _build(
        tmp_path, "harness_asan2",
        ["-fsanitize=address,undefined", "-fno-sanitize-recover=all"],
    )
    proc = _run(binary, "race", fixture_files, {"ASAN_OPTIONS": "detect_leaks=0"})
    assert proc.returncode == 0, (proc.stdout, proc.stderr[-2000:])
    assert "AddressSanitizer" not in proc.stderr, proc.stderr[-2000:]

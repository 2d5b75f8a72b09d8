"""ctypes binding for the native (C++) audio decode runtime.

Builds ``csrc/audio_decoder.cpp`` with g++ on first use (cached next to the
source) and exposes the same read API as data/audio.py; callers use
:func:`read` / :func:`read_batch` and transparently fall back to the pure-
Python codec when no compiler is available.  The batch path decodes a
meeting's channels with a pthread pool — the host-side feeding stage for
corpus-scale sweeps (SURVEY.md §7.3 "host-side .sph decode bandwidth").
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

_SRC = Path(__file__).parent / "csrc" / "audio_decoder.cpp"
_LIB_PATH = Path(__file__).parent / "csrc" / "libaudiodec.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

_PACK_SRC = Path(__file__).parent / "csrc" / "pcm_pack.cpp"
_PACK_LIB_PATH = Path(__file__).parent / "csrc" / "libpcmpack.so"
_pack_lock = threading.Lock()
_pack_lib: Optional[ctypes.CDLL] = None
_pack_build_failed = False

_ERRORS = {
    -1: "cannot open file",
    -2: "unrecognized container magic",
    -3: "malformed header",
    -4: "unsupported encoding/channel",
    -5: "IO error",
    -6: "malformed or unsupported shorten bitstream",
    -7: "malformed bitstream",
}


def _raise_audio_error(label: str, rc: int) -> None:
    msg = f"{label}: {_ERRORS.get(rc, f'error {rc}')}"
    if rc == -4:
        # Same exception type as the pure-Python parser's unsupported-format
        # errors (data/audio.py raises NotImplementedError for e.g. 24-bit
        # PCM): a caller skipping unsupported tracks with
        # `except NotImplementedError` must behave identically whether or
        # not a compiler was present.
        raise NotImplementedError(msg)
    raise ValueError(msg)


class _AudioInfo(ctypes.Structure):
    _fields_ = [
        ("sample_rate", ctypes.c_int32),
        ("num_samples", ctypes.c_int64),
        ("num_channels", ctypes.c_int32),
        ("sample_bytes", ctypes.c_int32),
        ("encoding", ctypes.c_int32),
        ("big_endian", ctypes.c_int32),
        ("data_offset", ctypes.c_int64),
        ("is_wav", ctypes.c_int32),
    ]


def _compile_and_load(
    src: Path, lib_path: Path, extra_flags: Sequence[str] = ()
) -> Optional[ctypes.CDLL]:
    """Build ``src`` into ``lib_path`` (if stale) and dlopen it.

    The compile goes to a process-unique temp path and lands with an atomic
    os.replace, so concurrent first-use across processes (corpus sweeps
    fan out one process per split) never exposes a half-written .so; and
    the CDLL itself is inside the try so a torn/corrupt cached library
    degrades to the Python fallback instead of raising forever.
    """
    try:
        if lib_path.is_file() and lib_path.stat().st_mtime >= src.stat().st_mtime:
            try:
                return ctypes.CDLL(str(lib_path))
            except OSError:
                pass  # corrupt cache (e.g. a compile killed mid-write): rebuild
        tmp = lib_path.with_suffix(f".tmp{os.getpid()}.so")
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", str(src), "-o", str(tmp),
                 *extra_flags],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, lib_path)
        finally:
            # a failed compile (or a replace that never ran) must not
            # accumulate per-pid .tmp<pid>.so litter across sweep processes
            tmp.unlink(missing_ok=True)
        return ctypes.CDLL(str(lib_path))
    except (OSError, subprocess.CalledProcessError):
        return None


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    lib = _compile_and_load(_SRC, _LIB_PATH, ["-lpthread"])
    if lib is None:
        _build_failed = True
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is None and not _build_failed:
            lib = _build()
            if lib is not None:
                lib.audio_info.restype = ctypes.c_int
                lib.audio_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(_AudioInfo)]
                lib.audio_read_f32.restype = ctypes.c_int64
                lib.audio_read_f32.argtypes = [
                    ctypes.c_char_p,
                    ctypes.c_int64,
                    ctypes.c_int64,
                    ctypes.c_int32,
                    ctypes.POINTER(ctypes.c_float),
                ]
                lib.audio_read_batch.restype = ctypes.c_int
                lib.audio_read_batch.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.c_int,
                    ctypes.c_int,
                ]
                lib.audio_decode_shorten_i16.restype = ctypes.c_int64
                lib.audio_decode_shorten_i16.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_int16),
                    ctypes.c_int64,
                    ctypes.c_int32,
                ]
            _lib = lib
    return _lib


def available() -> bool:
    return _get_lib() is not None


def _get_pack_lib() -> Optional[ctypes.CDLL]:
    """Build/load the native PCM packer (csrc/pcm_pack.cpp)."""
    global _pack_lib, _pack_build_failed
    if _pack_lib is not None or _pack_build_failed:
        return _pack_lib
    with _pack_lock:
        if _pack_lib is not None or _pack_build_failed:
            return _pack_lib
        lib = _compile_and_load(_PACK_SRC, _PACK_LIB_PATH)
        if lib is None:
            _pack_build_failed = True
            return None
        lib.pcm_pack.restype = ctypes.c_int64
        lib.pcm_pack.argtypes = [
            ctypes.POINTER(ctypes.c_int16),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _pack_lib = lib
    return _pack_lib


def pack_pcm_native(
    wave: np.ndarray, block: int, mode: int = -1
) -> Optional[Tuple[np.ndarray, np.ndarray, bool, int]]:
    """Native bit-pack of int16 PCM (see ops/pcm_pack.py for the layout).

    Returns (words, widths, delta, n_words) with ``words`` sized to the
    worst case (trim/pad at the call site), or None when no compiler is
    available (callers fall back to the numpy packer).
    """
    lib = _get_pack_lib()
    if lib is None:
        return None
    if block <= 0 or block % 32:
        return None  # the C side enforces the same (word alignment)
    wave = np.ascontiguousarray(wave, dtype=np.int16)
    if wave.ndim != 1:
        # n below counts ROWS for 2-D input — the pack would silently
        # encode only the first len(wave) samples of the flattened buffer.
        raise ValueError(f"pack_pcm_native wants 1-D int16 PCM, got {wave.shape}")
    n = len(wave)
    n_blocks = max(1, -(-n // block))
    words = np.zeros(n_blocks * (block // 32) * 17 + 1, dtype=np.uint32)
    widths = np.empty(n_blocks, dtype=np.int32)
    delta = ctypes.c_int32(0)
    n_words = lib.pcm_pack(
        wave.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        n,
        block,
        mode,
        words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        widths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(delta),
    )
    if n_words < 0:
        return None
    return words, widths, bool(delta.value), int(n_words)


def info(path: str):
    """Native header parse; returns a data/audio.py-compatible AudioInfo."""
    from laughter_detection_icsi_tpu.data.audio import AudioInfo

    lib = _get_lib()
    if lib is None:
        from laughter_detection_icsi_tpu.data import audio as py_audio

        return py_audio.info(path)
    out = _AudioInfo()
    rc = lib.audio_info(path.encode(), ctypes.byref(out))
    if rc:
        _raise_audio_error(path, rc)
    return AudioInfo(
        sample_rate=out.sample_rate,
        num_samples=out.num_samples,
        num_channels=out.num_channels,
        sample_bytes=out.sample_bytes,
        encoding={0: "pcm", 1: "ulaw", 2: "float", 3: "shorten"}[out.encoding],
        big_endian=bool(out.big_endian),
        data_offset=out.data_offset,
        # The C side reports the container directly — inferring it from
        # data_offset == 1024 misclassified SPHERE files with non-default
        # header sizes.
        container="wav" if out.is_wav else "sphere",
    )


def decode_shorten(
    path: str, num_frames: int, num_channels: int
) -> Optional[np.ndarray]:
    """Native whole-stream shorten decode to (frames, nchan) int16, or None
    when the native library is unavailable (callers fall back to
    data/shorten.py)."""
    lib = _get_lib()
    if lib is None:
        return None
    out = np.empty((num_frames, num_channels), dtype=np.int16)
    # num_channels is the BUFFER's layout and is passed through the ABI so
    # the C side enforces it against the stream — its own header re-parse
    # cannot be trusted to size our allocation (the file could change
    # between the caller's parse and this call).
    got = lib.audio_decode_shorten_i16(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        num_frames,
        num_channels,
    )
    if got < 0:
        _raise_audio_error(path, int(got))
    if int(got) < num_frames:
        # a plain slice would be a VIEW pinning the full header-sized
        # allocation for the cache entry's lifetime
        return out[: int(got)].copy()
    return out


def read(
    path: str,
    offset: float = 0.0,
    duration: Optional[float] = None,
    channel: int = 0,
) -> Tuple[np.ndarray, int]:
    """Ranged decode to float32 [-1, 1]; native fast path, Python fallback."""
    lib = _get_lib()
    if lib is None:
        from laughter_detection_icsi_tpu.data import audio as py_audio

        return py_audio.read(path, offset=offset, duration=duration, channel=channel)
    meta = info(path)
    from laughter_detection_icsi_tpu.data import audio as py_audio

    # Channel range-check in Python BEFORE the C call: the C side folds
    # bad-channel and unsupported-format into one AERR_UNSUPPORTED code,
    # but the twins' contract distinguishes them (ValueError vs
    # NotImplementedError) — validating here keeps -4 unambiguous.
    channel = py_audio._check_channel(path, meta, channel)
    if meta.encoding == "shorten":
        # Sequential codec: the C ranged read re-decodes the WHOLE stream
        # per call, so windowed access (O(windows x file)) must go through
        # the Python twin's whole-file decode cache — which itself uses
        # decode_shorten() above for the heavy lifting when available.
        return py_audio.read(path, offset=offset, duration=duration, channel=channel)
    sr = meta.sample_rate
    # Shared range arithmetic — the Python twin owns the clamp semantics
    # (the two had already drifted once on negative offsets).
    from laughter_detection_icsi_tpu.data.audio import resolve_range

    start, count = resolve_range(meta.num_samples, sr, offset, duration)
    out = np.empty(count, dtype=np.float32)
    got = lib.audio_read_f32(
        path.encode(),
        start,
        count,
        channel,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if got < 0:
        _raise_audio_error(path, int(got))
    return out[: int(got)], sr


def read_batch(
    paths: Sequence[str],
    channels: Optional[Sequence[int]] = None,
    threads: int = 8,
) -> List[Tuple[np.ndarray, int]]:
    """Decode whole files concurrently (a meeting's channels in one call)."""
    if channels is not None and len(channels) != len(paths):
        # A falsy-but-present channels list (e.g. built from a filter that
        # came up empty) must not silently decode everything on channel 0,
        # and a short list must not IndexError mid-batch.
        raise ValueError(
            f"read_batch got {len(paths)} paths but {len(channels)} channels"
        )
    chans = list(channels) if channels is not None else [0] * len(paths)
    lib = _get_lib()
    if lib is None:
        return [read(p, channel=chans[i]) for i, p in enumerate(paths)]
    n = len(paths)
    if n == 0:
        return []
    metas = [info(p) for p in paths]
    from laughter_detection_icsi_tpu.data import audio as py_audio

    # Same pre-validation as read(): keep the C side's AERR_UNSUPPORTED
    # unambiguous (see _raise_audio_error).
    chans = [
        py_audio._check_channel(p, m, c)
        for p, m, c in zip(paths, metas, chans)
    ]
    outs = [np.empty(m.num_samples, dtype=np.float32) for m in metas]
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_starts = (ctypes.c_int64 * n)(*([0] * n))
    c_counts = (ctypes.c_int64 * n)(*[m.num_samples for m in metas])
    c_chans = (ctypes.c_int32 * n)(*chans)
    c_outs = (ctypes.POINTER(ctypes.c_float) * n)(
        *[o.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for o in outs]
    )
    c_res = (ctypes.c_int64 * n)()
    rc = lib.audio_read_batch(
        c_paths, c_starts, c_counts, c_chans, c_outs, c_res, n, threads
    )
    if rc:
        # batch-level failure (e.g. allocation) writes no per-file results;
        # the zero-initialized c_res would otherwise read as n EMPTY
        # waveforms and inference would silently process silence
        raise MemoryError(
            f"audio_read_batch failed: {_ERRORS.get(int(rc), f'error {rc}')}"
        )
    results = []
    for i in range(n):
        got = int(c_res[i])
        if got < 0:
            _raise_audio_error(paths[i], got)
        results.append((outs[i][:got], metas[i].sample_rate))
    return results

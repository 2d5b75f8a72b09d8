"""Streaming laughter-detection server: PCM in, NDJSON events out.

The serving-path front end over ``inference.StreamingSession`` (one
stream) / ``parallel.ShardedStreamingSession`` (a live meeting's channels
sharded over the device mesh): feed 16 kHz PCM in arbitrary chunks, get a
newline-delimited JSON event the moment a laughter run closes, with the
documented streaming==offline bit-exactness (the emitted events equal
``segment_laughter`` on the concatenated audio).

No reference analogue — the reference is strictly offline, one file at a
time (reference segment_laughter.py:79-122); this is the online serving
counterpart sharing the same compiled graphs.

Input modes:
  --input -                raw interleaved s16le PCM @ 16 kHz on stdin
                           (``--channels N`` for N interleaved channels)
  --input file.wav|.sph    decode the file and replay it through the
                           streaming path in ``--chunk_ms`` slices (drill /
                           soak mode; output still arrives incrementally)

Output (stdout, one JSON object per line):
  {"type": "ready", ...}                          after compile/warmup
  {"type": "event", "channel": c, "start": s, "end": e}   run closed
  {"type": "done", "seconds": n, "events": k}     at end of stream

Example:
  arecord -f S16_LE -r 16000 -t raw | python cli/serve.py --model_path ck/
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path
from typing import List, Optional

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_parser() -> argparse.ArgumentParser:
    # `or ''` guard: under python -OO docstrings are stripped and __doc__
    # is None — even --help would crash.
    doc = (__doc__ or "").splitlines()
    p = argparse.ArgumentParser(
        description=doc[0] if doc else "Streaming laughter-detection server"
    )
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--config", type=str, default="resnet_base")
    p.add_argument("--input", type=str, default="-",
                   help="'-' for raw s16le PCM on stdin, or an audio file "
                        "to replay through the streaming path")
    p.add_argument("--channels", type=int, default=1,
                   help="interleaved channel count of the stdin stream "
                        "(>1 uses the mesh-sharded session)")
    p.add_argument("--channel", type=int, default=0,
                   help="which channel of a replayed audio file to analyze "
                        "(file replay is single-stream)")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--min_length", type=float, default=0.2)
    p.add_argument("--chunk_ms", type=int, default=250,
                   help="feed granularity in milliseconds")
    p.add_argument("--chunk", type=int, default=None)
    p.add_argument("--bucket_frames", type=int, default=None,
                   help="probability latency bound: a bucket finalizes "
                        "every bucket_frames x 10 ms of audio")
    p.add_argument("--precision", type=str, default=None,
                   choices=["float32", "bfloat16"])
    p.add_argument("--save_probs", type=str, default=None,
                   help="write the full [channels, T] probability array "
                        "(.npy) at end of stream")
    return p


def _emit(obj: dict) -> None:
    try:
        sys.stdout.write(json.dumps(obj) + "\n")
        sys.stdout.flush()
    except BrokenPipeError:
        # The downstream NDJSON consumer exited (e.g. `... | head -5`) —
        # a normal way for pipe-based serving to end, not a crash.  Point
        # stdout at devnull so the interpreter's shutdown flush doesn't
        # raise a second time, then exit quietly with the conventional
        # SIGPIPE code.
        devnull = os.open(os.devnull, os.O_WRONLY)
        os.dup2(devnull, sys.stdout.fileno())
        raise SystemExit(141)


def main(argv: Optional[List[str]] = None) -> int:
    from laughter_detection_icsi_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    if args.channels < 1:
        # Fail before the expensive model load + warmup: 0 would otherwise
        # die with a ZeroDivisionError deep in the stdin loop.
        raise SystemExit(f"--channels must be >= 1 (got {args.channels})")
    for name, v in (("--chunk", args.chunk),
                    ("--bucket_frames", args.bucket_frames)):
        # `is not None`: an explicit 0 must be rejected loudly here, not
        # silently swapped for the default by `or`; negatives would crash
        # deep in the jitted featurize after the expensive model load.
        if v is not None and v < 1:
            raise SystemExit(f"{name} must be >= 1, got {v}")

    import jax
    import numpy as np

    from laughter_detection_icsi_tpu import inference, models
    from laughter_detection_icsi_tpu.config import MODEL_MAP
    from laughter_detection_icsi_tpu.ops.smoothing import StreamingEventDetector
    from laughter_detection_icsi_tpu.train import checkpoint as ckpt_lib

    preset = MODEL_MAP[args.config]
    model = models.build(
        preset.model,
        dropout_rate=0.0,
        linear_layer_size=preset.linear_layer_size,
        filter_sizes=preset.filter_sizes,
    )
    best = ckpt_lib.resolve_checkpoint(args.model_path)
    if best is None:
        raise SystemExit(f"Model checkpoint not found at {args.model_path}")
    loaded = ckpt_lib.load_checkpoint(best)

    # cpu_chunk=512: lower per-dispatch latency for the live-serving path.
    settings = inference.settings_from_flags(
        chunk=args.chunk,
        bucket_frames=args.bucket_frames,
        precision=args.precision,
        cpu_chunk=512,
    )
    n_ch = args.channels
    # Event times divide frame indices by this; for file replay it is set
    # to the offline fps (frames/duration) below so emitted events equal
    # segment_laughter's on the same file even when the sample count is
    # not frame-aligned.  Live stdin has no known duration: exact 100
    # frames/s (the true frame rate) is used.
    fps = 100.0
    wave = None
    if args.input != "-":
        from laughter_detection_icsi_tpu.data import audio as audio_io
        from laughter_detection_icsi_tpu.ops import fbank as fbank_ops

        if args.channels != 1:
            raise SystemExit(
                "--channels applies to the interleaved stdin stream; file "
                "replay analyzes ONE channel (pick it with --channel)"
            )
        n_ch = 1
        # The SHARED transfer-eligibility predicate, exactly like the
        # offline pipelines (inference.py int16_transfer_eligible docstring:
        # "both pipelines consult it, so they can never disagree") — a
        # hand-rolled try/except here ignored settings.transfer_int16 and
        # swallowed real header errors into a second parse.
        meta = audio_io.info(args.input)
        if inference.int16_transfer_eligible(meta, settings):
            # 16-bit PCM ships as raw int16 (half the transfer bytes)...
            wave, sr = audio_io.read_int16(args.input, channel=args.channel)
        else:
            # ...every other valid encoding (ulaw/float/8- or 24-bit)
            # replays through the float path like the offline pipeline.
            wave, sr = audio_io.read(args.input, channel=args.channel)
        if sr != 16000:
            raise SystemExit(f"{args.input}: expected 16 kHz audio, got {sr}")
        duration = len(wave) / float(sr)
        if duration > 0:
            fps = fbank_ops.num_frames(len(wave)) / duration
    if n_ch == 1:
        pipe = inference.LaughterPipeline(
            model, loaded["params"], loaded["state"], settings=settings
        )
        sess = inference.StreamingSession(pipe)
        feed = lambda chunks: sess.feed(chunks[0])
        finish = sess.finish
    else:
        from laughter_detection_icsi_tpu.parallel import (
            ShardedPipeline,
            ShardedStreamingSession,
            make_mesh,
        )

        spipe = ShardedPipeline(
            model=model,
            params=loaded["params"],
            state=loaded["state"],
            mesh=make_mesh(),
            settings=settings,
        )
        sharded = ShardedStreamingSession(spipe, n_channels=n_ch)
        feed = sharded.feed
        finish = sharded.finish

    detectors = [
        StreamingEventDetector(args.threshold, args.min_length, fps=fps)
        for _ in range(n_ch)
    ]
    probs_out: List[List[np.ndarray]] = [[] for _ in range(n_ch)]
    n_events = 0
    n_samples = 0

    # Session index -> the channel number the event DESCRIBES: file replay
    # runs one session (index 0) over source channel --channel N; emitting
    # the raw index would attribute every event to channel 0.
    chan_label = [args.channel] if wave is not None else list(range(n_ch))

    def emit_event(c: int, start: float, end: float) -> None:
        nonlocal n_events
        n_events += 1
        _emit(
            {"type": "event", "channel": chan_label[c],
             "start": round(start, 3), "end": round(end, 3),
             "threshold": args.threshold}
        )

    def handle(probs: np.ndarray) -> None:
        probs = np.atleast_2d(probs)
        for c in range(n_ch):
            if args.save_probs:
                probs_out[c].append(probs[c])
            for start, end in detectors[c].feed(probs[c]):
                emit_event(c, start, end)

    # Warm the bucket graphs BEFORE announcing readiness (cold jit is tens
    # of seconds; emitting 'ready' first would stall the first real bucket
    # while stdin backs up).  The streaming sessions share the pipeline's
    # compiled bucket executors, and the graphs key on the input dtype —
    # warm with the dtype that will actually be fed (stdin is s16le;
    # float-path file replay needs the float32 graphs) or the first real
    # bucket pays the cold jit anyway.
    warm_dtype = np.int16 if wave is None else wave.dtype
    # Exactly ONE bucket of audio: bucket_frames * frame_shift samples is
    # num_frames == bucket_frames under the pipeline's snip_edges=False
    # geometry, which warms the identical fixed-shape graphs.  (An earlier
    # hand-derived `(bucket+window)*160+400` overshot into a second full
    # bucket execution — doubling warmup while stdin backed up — and
    # duplicated the halo geometry host_prep owns.)
    from laughter_detection_icsi_tpu.config import FEAT

    warm = np.zeros(
        settings.bucket_frames * FEAT.frame_shift_samples, dtype=warm_dtype
    )
    if n_ch == 1:
        pipe.probs_for_waveform(warm)
    else:
        spipe.probs_for_waveforms([warm] * n_ch)

    _emit(
        {"type": "ready", "channels": n_ch,
         "bucket_latency_s": settings.bucket_frames / 100.0,
         "device": jax.devices()[0].platform}
    )

    chunk_samples = max(1, args.chunk_ms * 16)
    if args.input == "-":
        stdin = sys.stdin.buffer
        frame_bytes = 2 * n_ch
        # Carry partial frames across reads: BufferedReader.read(n) loops on
        # pipes, but an unbuffered/non-blocking stdin can short-read
        # mid-frame — DROPPING the remainder would misalign every later
        # sample (and swap channels) for the rest of the stream.  Only a
        # trailing partial frame at EOF is discarded.
        pending = b""
        while True:
            raw = stdin.read(chunk_samples * frame_bytes)
            if raw is None:
                # Non-blocking stdin with no bytes momentarily available —
                # NOT end-of-stream; treating it as EOF would flush and
                # exit mid-meeting on any brief producer stall.
                time.sleep(0.005)
                continue
            if not raw:
                break
            raw = pending + raw
            usable = len(raw) - len(raw) % frame_bytes
            pending = raw[usable:]
            if not usable:
                continue
            data = np.frombuffer(raw[:usable], dtype="<i2")
            deint = data.reshape(-1, n_ch)
            n_samples += deint.shape[0]
            handle(feed([np.ascontiguousarray(deint[:, c]) for c in range(n_ch)]))
    else:
        for lo in range(0, len(wave), chunk_samples):
            piece = wave[lo : lo + chunk_samples]
            n_samples += len(piece)
            handle(feed([piece]))

    handle(finish())
    for c in range(n_ch):
        for start, end in detectors[c].finish():
            emit_event(c, start, end)
    if args.save_probs:
        np.save(
            args.save_probs,
            np.stack([np.concatenate(p) if p else np.zeros(0, np.float32)
                      for p in probs_out]),
        )
    _emit({"type": "done", "seconds": round(n_samples / 16000.0, 3),
           "events": n_events})
    return 0


if __name__ == "__main__":
    sys.exit(main())

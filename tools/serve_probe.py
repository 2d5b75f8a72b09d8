"""On-device probe of live-serving (StreamingSession) latency.

The serving story (`cli/serve.py`, `inference.StreamingSession`) has
bit-exactness and throughput tests; this probe measures the number that
matters to a live caller: how long ``feed()`` stalls.  Two populations:

  - buffer-only feeds (no bucket boundary crossed): pure host work
  - execution feeds (a bucket filled): featurize + classify + D2H

Reference framing: the reference has no serving path at all — its
closest analogue is re-running segment_laughter.py per file
(/root/reference/segment_laughter.py:85-117); this probe documents what
replacing that with a resident streaming session costs per chunk.

Both sessions use DISTINCT chunk contents (the tunnel dedups
identical-content uploads/executions — bench.py — so a measured session
replaying the warmup's bytes would get cache-flattered latencies).

Measured 2026-08-20 on the tunneled v5e (dispatch-dominated — a
PCIe-attached chip pays ~1000x less per dispatch, tools/band_probe.py):

  bucket= 512: exec p50  79ms / p95 100ms, buffer-feed p95  56us, 1 stream
  bucket=1024: exec p50  88ms / p95 115ms, buffer-feed p95  24us
  bucket=2048: exec p50 143ms / p95 209ms

So with 5.12 s buckets (512 frames) a single live stream sees a
~80-100 ms stall every ~5 s of audio through a TUNNELED chip.

Usage: python tools/serve_probe.py [--buckets 512,1024,2048] [--seconds 120]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from laughter_detection_icsi_tpu.utils.platform_env import apply_platform_env

apply_platform_env()


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--buckets", default="512,1024,2048")
    ap.add_argument("--seconds", type=int, default=120)
    ap.add_argument("--chunk_s", type=float, default=0.25)
    args = ap.parse_args()

    from laughter_detection_icsi_tpu import inference, models
    from laughter_detection_icsi_tpu.config import MODEL_MAP
    from laughter_detection_icsi_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    on_accel = jax.devices()[0].platform not in ("cpu",)
    if on_accel:
        enable_compilation_cache()
    print("platform:", jax.devices()[0].platform)

    preset = MODEL_MAP["resnet_base"]
    model = models.build(
        preset.model,
        dropout_rate=0.0,
        linear_layer_size=preset.linear_layer_size,
        filter_sizes=preset.filter_sizes,
    )
    params, state = model.init(jax.random.PRNGKey(0))

    sr = 16000
    n_chunks = int(args.seconds / args.chunk_s)

    def make_chunks(seed):
        # Distinct seeds for the warmup and measured sessions: the tunnel
        # dedups identical-content uploads+executions (bench.py), and a
        # measured session replaying the warmup's bytes would get its
        # first bucket execution served from cache.
        rng = np.random.default_rng(seed)
        return [
            (rng.standard_normal(int(sr * args.chunk_s)) * 0.05).astype(
                np.float32
            )
            for _ in range(n_chunks)
        ]

    def pct(a, p):
        return a[min(len(a) - 1, int(p * len(a)))] if a else float("nan")

    for bucket in (int(b) for b in args.buckets.split(",")):
        settings = inference.InferenceSettings(
            chunk=bucket,
            bucket_frames=bucket,
            precision="bfloat16" if on_accel else "float32",
        )
        pipe = inference.LaughterPipeline(model, params, state, settings=settings)
        # Warmup session: compile both the bucket graphs and finish()'s
        # tail path off the clock (its own chunk contents — see make_chunks).
        warm = inference.StreamingSession(pipe)
        for c in make_chunks(seed=1000 + bucket)[
            : int(2 * bucket / 100 / args.chunk_s) + 4
        ]:
            warm.feed(c)
        warm.finish()

        chunks = make_chunks(seed=bucket)
        sess = inference.StreamingSession(pipe)
        lats = []
        t0_all = time.perf_counter()
        for c in chunks:
            t0 = time.perf_counter()
            out = sess.feed(c)
            lats.append((time.perf_counter() - t0, len(out)))
        sess.finish()
        t_all = time.perf_counter() - t0_all

        exec_lats = sorted(l for l, n in lats if n > 0)
        buf_lats = sorted(l for l, n in lats if n == 0)
        print(
            f"bucket={bucket:5d} execs={len(exec_lats):3d} "
            f"exec p50={pct(exec_lats, 0.5) * 1e3:7.1f}ms "
            f"p95={pct(exec_lats, 0.95) * 1e3:7.1f}ms "
            f"max={max(exec_lats) * 1e3 if exec_lats else 0:7.1f}ms "
            f"buffer-feed p95={pct(buf_lats, 0.95) * 1e6:6.0f}us "
            # Audio actually fed, not args.seconds (which n_chunks rounds).
            f"RTF={n_chunks * args.chunk_s / t_all:8.1f}x"
        )


if __name__ == "__main__":
    main()

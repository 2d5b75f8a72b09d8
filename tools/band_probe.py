"""On-device probe of the shared-stem edge-band cost (round-2 perf item).

Measures, on the real chip with distinct on-device-derived inputs (the
tunnel dedups identical-content dispatches — see bench.py):

  - _band_stem top+bot at several batch sizes (the kernel-candidate op)
  - stem_track / stem_track2 (amortized whole-track stems)
  - chunk_probs_from_track2 (the full exact-mode chunk)

Prints ms/iter and effective TFLOP/s against analytic FLOP counts, so the
Pallas-kernel decision is made against ground truth, not round-1 lore.

Usage: python tools/band_probe.py [--iters 20] [--chunks 6144,12288]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def band_flops(b: int, f: int = 44, c: int = 64) -> float:
    """Analytic FLOPs of _band_stem for BOTH edges at batch b (identity
    stage-1 shortcuts, resnet_base plan)."""
    per_edge = 0.0
    # conv1: 1 -> c, 10 rows -> 9
    per_edge += 9 * f * (9 * 1 * c) * 2
    # four c -> c convs with heights 8, 7, 6, 5 (output rows)
    for h in (8, 7, 6, 5):
        per_edge += h * f * (9 * c * c) * 2
    return 2.0 * b * per_edge


def stem_flops(t: int, f: int = 44, c: int = 64) -> float:
    """conv1 + 4 stage-1 convs over a T-row track."""
    total = t * f * (9 * 1 * c) * 2
    total += 4 * t * f * (9 * c * c) * 2
    return total


# Distinct input sets kept resident per timing run: enough to defeat the
# tunnel's content-dedup (re-timing one wave reports the cache), small
# enough to bound HBM — at --chunks 12288 each set is ~150 MB in bf16, so
# iters+warmup sets (~3.5 GB at the defaults) could OOM the probe itself.
INPUT_POOL = 6


def time_op(fn, make_input, iters: int, warmup: int = 3) -> float:
    """Median ms/iter with a rotating pool of distinct inputs
    (content-dedup guard); inputs derived on device.  Synchronous (one
    value-readback barrier per iteration): includes per-dispatch +
    readback latency — read the MARGINAL slope across sizes for compute
    cost.  Barriers are utils/timing.hard_block, never
    block_until_ready: the tunnel acks bur before execution under a deep
    queue (utils/timing.py has the measured evidence)."""
    from laughter_detection_icsi_tpu.utils.timing import hard_block

    xs = [make_input(i) for i in range(min(INPUT_POOL, iters + warmup))]
    hard_block(xs)
    for i in range(warmup):
        hard_block(fn(*xs[i % len(xs)]))
    times = []
    for i in range(warmup, warmup + iters):
        t0 = time.perf_counter()
        hard_block(fn(*xs[i % len(xs)]))
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(times))


def time_op_pipelined(fn, make_input, iters: int, warmup: int = 3) -> float:
    """ms/iter with all dispatches in flight (ONE value-readback barrier
    over every output at the end) — the steady-state device-side number;
    per-dispatch latency overlaps.  The barrier's checksum data-depends on
    all outputs, so it cannot return before they all really executed (the
    old enqueue-then-block_until_ready version measured the RPC enqueue
    rate under exactly this deep-queue pattern)."""
    from laughter_detection_icsi_tpu.utils.timing import hard_block

    xs = [make_input(i) for i in range(min(INPUT_POOL, iters + warmup))]
    hard_block(xs)
    hard_block([fn(*xs[i % len(xs)]) for i in range(warmup)])
    t0 = time.perf_counter()
    outs = [fn(*xs[i % len(xs)]) for i in range(warmup, warmup + iters)]
    hard_block(outs)
    return (time.perf_counter() - t0) * 1e3 / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--chunks", type=str, default="1536,6144,12288")
    ap.add_argument(
        "--dtype", type=str, default="bfloat16",
        choices=["bfloat16", "float32"],  # a typo ('bf16') must not
        # silently benchmark the wrong MXU precision
    )
    args = ap.parse_args()

    from laughter_detection_icsi_tpu import models
    from laughter_detection_icsi_tpu.models import shared_stem

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})")
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    model = models.build("ResNetBigger", dropout_rate=0.0, linear_layer_size=48)
    params, state = model.init(jax.random.PRNGKey(0))
    if dtype == jnp.bfloat16:
        # THE pipeline's cast (shared helper), so the probe can never
        # measure a different model than production runs.
        from laughter_detection_icsi_tpu.inference import cast_tree_bf16

        params = cast_tree_bf16(params)
        state = cast_tree_bf16(state)

    # Derive the analytic-FLOP dimensions from the BUILT model, not
    # constants: if the architecture's stage-1 channel plan or the feature
    # width ever changes, hardcoded f=44/c=64 would print confident but
    # fabricated TFLOP/s.
    stem_c = int(params["conv1"]["weight"].shape[0])
    from laughter_detection_icsi_tpu.config import FEAT

    feat_w = FEAT.num_filters

    window = 100
    chunks = [int(c) for c in args.chunks.split(",")]
    max_chunk = max(chunks)
    t_rows = max_chunk + window - 1 + 512  # track length incl. halo slack

    base_feats = jax.device_put(
        (np.random.default_rng(0).standard_normal((t_rows, feat_w)) * 0.5).astype(
            np.float32
        )
    )
    vary = jax.jit(lambda x, i: (x + i * 1e-3).astype(dtype))

    # ---- stems ---------------------------------------------------------- #
    stem1 = jax.jit(lambda f: shared_stem.stem_track(params, state, f))
    stem2 = jax.jit(lambda t1: shared_stem.stem_track2(params, state, t1))

    ms = time_op(stem1, lambda i: (vary(base_feats, i),), args.iters)
    fl = stem_flops(t_rows, f=feat_w, c=stem_c)
    print(f"stem_track      T={t_rows}: {ms:7.2f} ms  {fl / ms / 1e9:6.1f} TFLOP/s")
    ms = time_op(
        stem2, lambda i: (stem1(vary(base_feats, i)),), args.iters
    )
    print(f"stem_track2     T={t_rows}: {ms:7.2f} ms")

    # ---- bands ---------------------------------------------------------- #
    d = shared_stem.DEPTH

    for b in chunks:
        def band_fn(top_in, bot_in):
            top = shared_stem._band_stem(params, state, top_in, top=True)
            bot = shared_stem._band_stem(params, state, bot_in, top=False)
            return top, bot

        band_jit = jax.jit(band_fn)

        def make_band_input(i, b=b):
            f = vary(base_feats, i)
            w0 = jnp.arange(b)[:, None]
            top_in = f[w0 + jnp.arange(2 * d)[None, :]][:, None]
            bot_in = f[w0 + (window - 2 * d) + jnp.arange(2 * d)[None, :]][:, None]
            return top_in, bot_in

        ms = time_op(band_jit, make_band_input, args.iters)
        fl = band_flops(b, f=feat_w, c=stem_c)
        print(
            f"_band_stem both B={b:6d}: {ms:7.2f} ms  "
            f"{fl / ms / 1e9:6.1f} TFLOP/s  ({fl / 1e9:.1f} GFLOP)"
        )

    # ---- full exact-mode chunk ------------------------------------------ #
    for b in chunks:

        def chunk_fn(feats, track1, track2, b=b):
            return shared_stem.chunk_probs_from_track2(
                params, state, track1, track2, feats,
                jnp.int32(0), b, window,
            )

        chunk_jit = jax.jit(chunk_fn)

        def make_chunk_input(i):
            f = vary(base_feats, i)
            t1 = stem1(f)
            return f, t1, stem2(t1)

        ms = time_op(chunk_jit, make_chunk_input, args.iters)
        msp = time_op_pipelined(chunk_jit, make_chunk_input, args.iters)
        audio_s = b / 100.0
        print(
            f"chunk_probs2    B={b:6d}: {ms:7.2f} ms sync / {msp:7.2f} ms "
            f"pipelined ({audio_s / (msp / 1e3):7.0f}x realtime, chunk only)"
        )

    # ---- full bucket incl. stems, pipelined ----------------------------- #
    for b in chunks:
        def bucket_fn(feats, b=b):
            t1 = shared_stem.stem_track(params, state, feats)
            t2 = shared_stem.stem_track2(params, state, t1)
            return shared_stem.chunk_probs_from_track2(
                params, state, t1, t2, feats, jnp.int32(0), b, window
            )

        bucket_jit = jax.jit(bucket_fn)
        msp = time_op_pipelined(
            bucket_jit, lambda i: (vary(base_feats, i),), args.iters
        )
        audio_s = b / 100.0
        print(
            f"bucket(stems+chunk) B={b:6d}: {msp:7.2f} ms pipelined "
            f"({audio_s / (msp / 1e3):7.0f}x realtime device-side)"
        )


if __name__ == "__main__":
    main()

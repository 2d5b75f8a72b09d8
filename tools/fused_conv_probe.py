"""Marginal-cost probe of the fused_conv whole-track graph (MXU truth).

Single-dispatch timings of `fully_conv_probs_blocked` through the tunneled
dev chip are dominated by per-dispatch latency (~26 ms RTT) and transfers,
not compute — they underreport the kernel by ~40x.  This probe amortizes N
back-to-back evaluations inside one jitted `lax.fori_loop` (inputs chained
through the accumulator so no iteration can be deduped/CSE'd) and reports
the marginal per-evaluation cost and effective TFLOP/s against the
analytic FLOP count (~4.7 MFLOP per output frame: the dilated stack is
~150x cheaper than the reference's ~700 MFLOP per-window forward,
models/fully_conv.py docstring; reference datasets.py:72-93).

Measured 2026-08-20 on the tunneled v5e (bf16, T=60000 frames = 600 s):

  single dispatch : 70.0 ms  (~8,600x realtime — tunnel-dominated)
  marginal        :  1.8 ms  (~330,000x realtime device-marginal)
  effective       : ~155 TFLOP/s = 79% of v5e bf16 peak (197)

Conclusion: the fused_conv compute path is at speed of light; e2e and
single-dispatch numbers are transfer/latency stories, not kernel stories.

Usage: python tools/fused_conv_probe.py [--frames 60000] [--n 20]
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("JAX_PLATFORMS"):
    # The axon tunnel plugin ignores the env var (registers from
    # sitecustomize); pin via config like tests/conftest.py and bench.py.
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=60000)
    ap.add_argument("--n", type=int, default=20)
    args = ap.parse_args()

    from laughter_detection_icsi_tpu import models
    from laughter_detection_icsi_tpu.config import MODEL_MAP
    from laughter_detection_icsi_tpu.inference import cast_tree_bf16
    from laughter_detection_icsi_tpu.models.fully_conv import (
        fully_conv_probs_blocked,
    )
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
    if on_accel:
        params, state = cast_tree_bf16(params), cast_tree_bf16(state)

    T, N = args.frames, args.n
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16 if on_accel else jnp.float32
    feats0 = jnp.asarray(rng.standard_normal((T, 44)), dtype)

    @jax.jit
    def marginal(feats):
        def body(i, acc):
            # Chain iterations through the accumulator so the tunnel/XLA
            # cannot dedup or CSE identical evaluations.
            p = fully_conv_probs_blocked(
                params, state, feats + (acc * 1e-6).astype(feats.dtype),
                window=100,
            )
            return acc + p[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, N, body, jnp.float32(0))

    @jax.jit
    def single(feats):
        return fully_conv_probs_blocked(params, state, feats, window=100)

    single(feats0).block_until_ready()  # compile off the clock
    marginal(feats0).block_until_ready()
    t0 = time.perf_counter()
    single(feats0).block_until_ready()
    t_single = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        marginal(feats0).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    per = best / N

    audio_s = T / 100.0
    flops = T * 4.7e6
    print(f"single dispatch : {t_single * 1e3:6.1f} ms ({audio_s / t_single:,.0f}x)")
    print(f"marginal (/{N:d})  : {per * 1e3:6.1f} ms ({audio_s / per:,.0f}x device-marginal)")
    print(f"effective       : {flops / per / 1e12:5.1f} TFLOP/s (v5e bf16 peak 197)")


if __name__ == "__main__":
    main()

"""Marginal-cost probe of the fused_conv whole-track graph (MXU truth).

Single-dispatch timings of `fully_conv_probs_blocked` through the tunneled
dev chip include ~26 ms RTT plus the feature upload, which under-reports
the kernel.  Methodology, hardened against THREE artifacts that can fake
a speed-of-light reading:

  * SLOPE, not average: time an N_small-iteration and an N_big-iteration
    jitted `fori_loop` and difference them, so the fixed per-dispatch cost
    (RTT + upload) cancels instead of being smeared into the number.
  * Distinct content per timed call: every call takes a fresh scalar
    offset added to the features, so the tunnel's identical-content
    execution dedup can never serve a cached result as a measurement.
  * Consume EVERY output: the loop body accumulates ``p.sum()``.  An
    earlier version accumulated ``p[0]`` and XLA dead-code-eliminated
    99.98% of each iteration (only output frame 0's receptive field was
    computed — cost_analysis showed 8.5 GFLOP where a full evaluation is
    1.109 TFLOP), which produced an impossible ">MXU peak" reading.

FLOPs come from XLA's own cost model (``compiled.cost_analysis()['flops']``
of the single evaluation — hardware FLOPs, halo recompute included), not a
hand estimate.

Measured 2026-08-20 on the tunneled v5e (bf16, T=60000 frames = 600 s):

  single eval (XLA cost model) : 1.109 TFLOP  (~18.5 MFLOP per output frame)
  marginal slope               : ~38 ms/eval  (~15,900x realtime device-marginal)
  effective                    : ~29 TFLOP/s = ~15% of v5e bf16 peak (197)

Where the time goes (slope-measured per stage, N-delta 80): the
FLOP-dominant 64-channel convs run at ~70 TFLOP/s (36% of peak), the
small late stages cost ~0.05 ms each (a banded-Toeplitz matmul
reformulation was prototyped — numerically exact, zero speedup, because
those stages were never the cost), and the gap between 70 per-conv and
~30 graph-average is HBM-bound elementwise traffic (BN/relu/residual
passes over the ~400 MB stage-1 tensors).  Remaining theoretical lever:
a Pallas megakernel fusing elementwise into the convs, bounded at ~2x on
an opt-in path already >14x above the e2e link-bound ceiling — not worth
the numerics risk.

Tunnel measurement lore (how this probe got fooled twice): any single
dispatch through the tunnel carries a ~30 ms wall floor, so short
(N<=8) loops read as a fake ~3-4 ms/iteration "cost" — only large-N
slopes are trustworthy; and an `acc + p[0]`-style consumer lets XLA
dead-code-eliminate the track down to one receptive field.

Usage: python tools/fused_conv_probe.py [--frames 60000] [--n 20]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from laughter_detection_icsi_tpu.utils.platform_env import apply_platform_env

apply_platform_env()


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=60000)
    ap.add_argument(
        "--n", type=int, default=20, help="loop-iteration DELTA between the "
        "small and big timed loops (the marginal slope divisor)"
    )
    args = ap.parse_args()
    if args.n < 1 or args.frames < 1:
        ap.error("--n and --frames must be >= 1")

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

    T = args.frames
    n_small, n_big = 3, 3 + args.n
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16 if on_accel else jnp.float32
    feats0 = jnp.asarray(rng.standard_normal((T, 44)), dtype)

    def make_loop(n):
        @jax.jit
        def run(feats, off):
            def body(i, acc):
                # off varies per CALL (defeats the tunnel's cross-call
                # content dedup); the acc term chains iterations so none
                # can be CSE'd; p.sum() consumes every output so XLA
                # cannot dead-code-eliminate the track (see module
                # docstring for the p[0] failure).
                p = fully_conv_probs_blocked(
                    params,
                    state,
                    feats + (off + acc * 1e-6).astype(feats.dtype),
                    window=100,
                )
                return acc + p.sum().astype(jnp.float32)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        return run

    run_small, run_big = make_loop(n_small), make_loop(n_big)

    @jax.jit
    def single(feats, off):
        return fully_conv_probs_blocked(
            params, state, feats + off.astype(feats.dtype), window=100
        )

    compiled = single.lower(feats0, jnp.float32(0)).compile()
    flops = (compiled.cost_analysis() or {}).get("flops")

    # Compile off the clock (off=0 — never reused in a timed call).
    # Timed sections end in a VALUE readback, never block_until_ready:
    # the tunnel acks bur before execution when the dispatch queue is deep
    # (measured 2026-08-20: 64 queued train steps "bur-completed" in 65 ms
    # vs 8.5 s real; at queue depth 1 bur happens to block, but a barrier
    # that lies under load is not a barrier).  Outputs here are scalars,
    # so the readback adds only the RTT, which the slope cancels anyway.
    zero = jnp.float32(0)
    float(np.asarray(single(feats0, zero)[0]))
    if not on_accel:
        # XLA:CPU compiles conv nets inside loops pathologically slowly
        # (~60x; .claude/skills/verify) and there is no dispatch latency
        # to amortize away — single-dispatch IS the CPU ground truth.
        t0 = time.perf_counter()
        float(np.asarray(single(feats0, jnp.float32(1))[0]))
        t_single = time.perf_counter() - t0
        audio_s = T / 100.0
        print(
            f"single dispatch : {t_single * 1e3:7.1f} ms "
            f"({audio_s / t_single:,.0f}x) — CPU: loop-amortized marginal "
            "skipped (conv-in-loop compile pathology; this probe's slope "
            "methodology targets the tunneled TPU)"
        )
        return
    float(np.asarray(run_small(feats0, zero)))
    float(np.asarray(run_big(feats0, zero)))

    def best_of(fn, k=3, start=1.0, scalar_index=None):
        best = float("inf")
        for j in range(k):
            o = jnp.float32(start + j)  # fresh content every timed call
            t0 = time.perf_counter()
            r = fn(feats0, o)
            # honest barrier: read the VALUE (see the compile note above)
            float(np.asarray(r if scalar_index is None else r[scalar_index]))
            best = min(best, time.perf_counter() - t0)
        return best

    t_single = best_of(single, scalar_index=0)
    t_small = best_of(run_small, start=10.0)
    t_big = best_of(run_big, start=20.0)
    slope = (t_big - t_small) / (n_big - n_small)

    audio_s = T / 100.0
    print(f"single dispatch : {t_single * 1e3:7.1f} ms ({audio_s / t_single:,.0f}x; incl. RTT+upload)")
    print(f"loop n={n_small:<3d}      : {t_small * 1e3:7.1f} ms")
    print(f"loop n={n_big:<3d}      : {t_big * 1e3:7.1f} ms")
    print(f"marginal slope  : {slope * 1e3:7.2f} ms/eval ({audio_s / slope:,.0f}x realtime)")
    if flops:
        print(
            f"XLA cost model  : {flops / 1e12:6.3f} TFLOP/eval -> "
            f"{flops / slope / 1e12:5.1f} TFLOP/s (v5e bf16 peak 197)"
        )


if __name__ == "__main__":
    main()

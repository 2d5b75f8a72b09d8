"""Attribute the sharded windows-mode batching penalty (VERDICT r04 #2).

Measured r04: the batched multi-channel windows graph
(parallel.ShardedPipeline) ran ~19% SLOWER per audio-second than the
single-channel pipeline on one chip — `sharded_device_x_realtime`
1,442-1,443x aggregate for 8 channels vs `device_x_realtime` 1,771-1,781x
single-channel (bench_runs.jsonl 2026-08-20) — i.e. running channels
sequentially through the single-channel path would beat the
Slurm-replacement batched graph.  One gather cliff was already found and
fixed (per-channel static-slice gathers, 636 -> 1,443x); this probe
decomposes what remains.

Stages timed independently (slope methodology, utils/timing.py, device-
resident inputs; every timed execution sees content never executed
before — the tunnel dedups identical executions):

  single_featurize / single_chunks — the single-channel pipeline's two
      graphs over one bucket, x C sequential calls (= C channels' work)
  sharded_featurize / sharded_chunks — the batched pipeline's two graphs
      over the same C channels in one [C, ...] batch

plus a settings.chunk sweep for the batched graph: the batched chunk
shrinks to chunk/c_local per channel (keeping the conv batch at `chunk`
windows), so n_chunks (= dispatches + gather calls per bucket) rises with
channel count — chunk sizes 6144 / 12288 / 24576 test whether the
penalty is per-dispatch/gather overhead (more, smaller chunk calls) or
something intrinsic to the batched formulation (e.g. the per-channel
gather concat materializing an extra copy of the window batch).

Usage: python tools/sharded_windows_probe.py [--channels 8]
One JSON line per measurement; run on the real chip.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from laughter_detection_icsi_tpu.utils.platform_env import apply_platform_env

apply_platform_env()


def _speech_like(seconds, seed):
    sys.path.insert(0, _REPO)
    from bench import speech_like_pcm

    return speech_like_pcm(seconds, seed=seed)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--channels", type=int, default=8)
    ap.add_argument("--chunks", type=int, nargs="+", default=[6144, 12288, 24576])
    ap.add_argument("--n_hi", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from laughter_detection_icsi_tpu import models
    from laughter_detection_icsi_tpu.config import MODEL_MAP
    from laughter_detection_icsi_tpu.inference import (
        InferenceSettings,
        LaughterPipeline,
        host_pad_waveform,
    )
    from laughter_detection_icsi_tpu.parallel import ShardedPipeline
    from laughter_detection_icsi_tpu.parallel import mesh as mesh_lib
    from laughter_detection_icsi_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )
    from laughter_detection_icsi_tpu.utils.timing import hard_block, slope_time

    if os.environ.get("JAX_PLATFORMS", "").strip().lower() != "cpu":
        enable_compilation_cache()

    platform = jax.devices()[0].platform
    preset = MODEL_MAP["resnet_base"]
    model = models.build(
        preset.model,
        dropout_rate=0.0,
        linear_layer_size=preset.linear_layer_size,
        filter_sizes=preset.filter_sizes,
    )
    params, state = model.init(jax.random.PRNGKey(0))
    C = args.channels
    bucket = 6144
    precision = "bfloat16" if platform != "cpu" else "float32"
    n_sets = args.n_hi + 2  # warmup set 0 + timed sets 1..n_lo+n_hi
    bucket_seconds = bucket / 100.0
    audio_s = C * bucket_seconds  # audio-seconds covered by one pass

    def emit(rec):
        rec["platform"] = platform
        rec["channels"] = C
        print(json.dumps(rec), flush=True)

    def slope_sets(make_pass, n_hi=args.n_hi):
        counter = {"i": 1}

        def run(n):
            i0 = counter["i"]
            counter["i"] += n
            hard_block([make_pass(i0 + j) for j in range(n)])

        return slope_time(run, n_lo=1, n_hi=n_hi)

    def report(name, per, over, extra=None):
        rec = {
            "metric": name,
            "per_pass_s": round(per, 4),
            "x_realtime_aggregate": round(audio_s / per, 1) if per > 0 else None,
            "overhead_s": round(max(over, 0.0), 3),
        }
        if extra:
            rec.update(extra)
        emit(rec)
        return rec

    # ---------------- single-channel pipeline baseline ---------------- #
    settings1 = InferenceSettings(
        chunk=6144, bucket_frames=bucket, precision=precision
    )
    pipe1 = LaughterPipeline(model, params, state, settings=settings1)
    featurize1, chunk_probs1, wave_len1 = pipe1._graphs(True)

    def stage_single(seed_base):
        per_ch = []
        for c in range(C):
            w = _speech_like(int(bucket_seconds) + 1, seed=seed_base + c)
            padded, t = host_pad_waveform(w, pipe1.feat_cfg)
            buf = np.zeros(wave_len1, np.int16)
            n_copy = min(len(padded), wave_len1)
            buf[:n_copy] = padded[:n_copy]
            per_ch.append(
                (jax.device_put(buf), jnp.asarray(min(t, bucket), jnp.int32))
            )
        return per_ch

    singles = [stage_single(3000 + 64 * si) for si in range(n_sets)]
    hard_block(singles)
    start0 = jnp.asarray(0, jnp.int32)

    # warm both graphs on set 0 only (timed sets stay never-executed)
    f_warm = [featurize1(w, v) for w, v in singles[0]]
    hard_block([chunk_probs1(f, start0) for f in f_warm])

    feat_out = {}

    def single_featurize_pass(si):
        feat_out[si] = [featurize1(w, v) for w, v in singles[si]]
        return feat_out[si]

    per_f, over_f = slope_sets(single_featurize_pass)
    report("single_featurize", per_f, over_f)

    def single_chunks_pass(si):
        # feats from the featurize timing above: chunk_probs never ran on
        # them, so every timed execution is fresh content.
        return [chunk_probs1(f, start0) for f in feat_out[si]]

    per_c, over_c = slope_sets(single_chunks_pass)
    report("single_chunks", per_c, over_c)
    report(
        "single_composed",
        per_f + per_c,
        0.0,
        {"note": "sum of stage slopes (stages are separate dispatches)"},
    )

    # ---------------- batched multi-channel formulation ---------------- #
    mesh = mesh_lib.make_mesh()
    for chunk_setting in args.chunks:
        settings = InferenceSettings(
            chunk=chunk_setting, bucket_frames=bucket, precision=precision
        )
        pipe = ShardedPipeline(
            model, params, state, mesh=mesh, settings=settings
        )
        c_pad = -(-C // pipe.n_shards) * pipe.n_shards
        c_local = c_pad // pipe.n_shards
        featurize, chunk_probs, wave_len, chunk = pipe._graphs(True, c_local)
        n_chunks = -(-bucket // chunk)
        starts = [jnp.asarray(i * chunk, jnp.int32) for i in range(n_chunks)]
        extra = {
            "settings_chunk": chunk_setting,
            "per_channel_chunk": chunk,
            "n_chunk_dispatches": n_chunks,
        }

        def stage_sharded(seed_base):
            batch = np.zeros((c_pad, wave_len), np.int16)
            for c in range(C):
                w = _speech_like(int(bucket_seconds) + 1, seed=seed_base + c)
                padded, _t = host_pad_waveform(w, pipe.feat_cfg)
                n_copy = min(len(padded), wave_len)
                batch[c, :n_copy] = padded[:n_copy]
            valid = np.zeros(c_pad, np.int32)
            valid[:C] = bucket
            return pipe._shard({"w": batch, "v": valid}, pipe.mesh)

        sets = [
            stage_sharded(5000 + 1000 * chunk_setting // 64 + 64 * si)
            for si in range(n_sets)
        ]
        hard_block(sets)
        fw = featurize(sets[0]["w"], sets[0]["v"])
        hard_block([chunk_probs(fw, s) for s in starts])  # warm

        sh_feat_out = {}

        def sh_featurize_pass(si):
            sh = sets[si]
            sh_feat_out[si] = featurize(sh["w"], sh["v"])
            return sh_feat_out[si]

        per_f, over_f = slope_sets(sh_featurize_pass)
        report("sharded_featurize", per_f, over_f, extra)

        def sh_chunks_pass(si):
            return [chunk_probs(sh_feat_out[si], s) for s in starts]

        per_c, over_c = slope_sets(sh_chunks_pass)
        report("sharded_chunks", per_c, over_c, extra)
        report(
            "sharded_composed",
            per_f + per_c,
            0.0,
            {**extra, "note": "sum of stage slopes"},
        )

        # EXPERIMENT: per-channel tail compute WITHOUT the concat — each
        # channel's gathered inputs feed its own conv batch inside one jit
        # (exactly the single-channel formulation, looped), only the tiny
        # [chunk] prob vectors concatenate.  Tests whether the production
        # concat-to-one-big-batch formulation's +~29%/window cost is the
        # materialized gather concat (this variant should match the
        # single-channel per-window rate if so).
        from jax.sharding import PartitionSpec as P

        from laughter_detection_icsi_tpu.models import shared_stem
        from laughter_detection_icsi_tpu.parallel import mesh as mesh_lib2

        if not shared_stem.supports_track2(100):
            continue

        # The pipeline casts params/state to the compute dtype at
        # construction (precision='bfloat16'); the loop variant must run
        # against the SAME cast trees the production chunk graph uses.
        pp, ps = pipe.params, pipe.state

        def chunk_local_loop(ft, start):
            feats_c, t1_c, t2_c = ft
            w0 = shared_stem._window_starts(start, chunk)
            outs = []
            for c in range(feats_c.shape[0]):
                g = shared_stem._gather_track2_inputs(
                    t1_c[c], t2_c[c], feats_c[c], w0, 100
                )
                outs.append(
                    shared_stem._probs_from_track2_inputs(pp, ps, g)
                )
            return jnp.stack(outs).astype(jnp.float32)

        chunk_probs_loop = jax.jit(
            jax.shard_map(
                chunk_local_loop,
                mesh=mesh,
                in_specs=(P(mesh_lib2.DATA_AXIS), P()),
                out_specs=P(mesh_lib2.DATA_AXIS),
                check_vma=False,
            )
        )
        # Warm on set 0 (the timed sets 1.. must never have run through
        # this program before — the tunnel dedups identical executions).
        sh_feat_out[0] = featurize(sets[0]["w"], sets[0]["v"])
        hard_block([chunk_probs_loop(sh_feat_out[0], s) for s in starts])

        def sh_chunks_loop_pass(si):
            return [chunk_probs_loop(sh_feat_out[si], s) for s in starts]

        per_l, over_l = slope_sets(sh_chunks_loop_pass)
        report("sharded_chunks_loop", per_l, over_l, extra)
        # Correctness: the loop formulation must agree with the production
        # concat formulation (channel-major order) to fp tolerance.
        got = np.asarray(chunk_probs_loop(sh_feat_out[1], starts[0]))
        want = np.asarray(chunk_probs(sh_feat_out[1], starts[0])).reshape(
            got.shape
        )
        err = float(np.abs(got - want).max())
        emit({"metric": "loop_vs_concat_max_abs_diff", "value": err, **extra})


if __name__ == "__main__":
    main()

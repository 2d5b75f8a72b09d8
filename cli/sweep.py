"""Corpus-scale evaluation sweep (replaces the reference's Slurm machinery).

The reference fans out one process per (meeting, channel) — 29 thresholds x
3 min_lengths each — via generated Slurm array jobs (reference
cluster_scripts/gen_eval_exp.py:30-36,91-114).  Here one command does the
whole split: every meeting's channels are batched through the sharded
pipeline (one featurize+classify graph, channel axis over the mesh), the
threshold x min_length sweep runs ON DEVICE per channel row (only run
tables return to host), and TextGrids land in the ``<out>/<split>/
<meeting>/t_<thr>/l_<minlen>/chanN.TextGrid`` layout ``analyse`` consumes.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path
from typing import List, Optional


# Allow running as a script from a clean checkout (sys.path[0] is cli/)
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# The reference's EXACT sweep grid (gen_eval_exp.py:30-36): 29 thresholds
# (linspace(0, 0.9, 19) + linspace(0.91, 1, 10), rounded to 2 dp) x 3
# min_lengths — row-for-row comparable against reference sum_stats CSVs.
DEFAULT_THRESHOLDS = ",".join(
    [str(round(0.05 * i, 2)) for i in range(19)]
    + [str(round(0.91 + 0.01 * i, 2)) for i in range(10)]
)
DEFAULT_MIN_LENGTHS = "0,0.1,0.2"


def selection_fingerprint(resolved) -> str:
    """Canonical text form of a resolved sweep selection, for cross-process
    agreement checks.

    ``resolved`` is the list of (meeting_id, [chan_id], [path]) the sweep
    built.  The fingerprint covers the selection AND each file's header
    identity (sample count / rate / encoding) — multi-host SPMD sweeps
    derive per-track shapes and transfer dtypes from each host's own
    headers, so a same-named but truncated or re-encoded copy on one host
    must be caught here, not just a missing file."""
    from laughter_detection_icsi_tpu.data.audio import info as audio_info

    lines = []
    for m, ch, paths in resolved:
        metas = [audio_info(p) for p in paths]
        lines.append(
            f"{m}:" + ",".join(
                f"{c}={i.num_samples}/{i.sample_rate}/{i.encoding}"
                for c, i in zip(ch, metas)
            )
        )
    return "\n".join(lines)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--audio_dir", type=str, required=True,
                   help="root with <meeting>/<chan>.sph")
    p.add_argument("--transcript_dir", type=str, default=None)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--split", type=str, default="dev",
                   choices=["train", "dev", "test", "all"])
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--config", type=str, default="resnet_base")
    p.add_argument("--thresholds", type=str, default=DEFAULT_THRESHOLDS)
    p.add_argument("--min_lengths", type=str, default=DEFAULT_MIN_LENGTHS)
    p.add_argument("--meetings", type=str, default=None,
                   help="comma-separated subset of meeting IDs")
    p.add_argument("--precision", type=str, default=None,
                   choices=["float32", "bfloat16"])
    p.add_argument("--chunk", type=int, default=None)
    p.add_argument("--bucket_frames", type=int, default=None)
    p.add_argument("--mode", type=str, default="windows",
                   choices=["windows", "fused_conv"],
                   help="'windows' = reference-exact per-window conv; "
                        "'fused_conv' = whole-track dilated conv, 8.2x "
                        "faster device-side (14,611x vs 1,781x realtime, "
                        "bench_runs.jsonl 2026-08-20). Decision-level "
                        "cost: max F1 delta 0.004, 99.1% instance "
                        "agreement (tools/fused_conv_eval_probe.py, "
                        "PARITY.md #25)")
    p.add_argument("--transfer_codec", type=str, default="raw",
                   choices=["raw", "auto", "packed"],
                   help="host->device PCM transfer: 'packed'/'auto' = "
                        "lossless bit-packed wire (ops/pcm_pack.py; wins on "
                        "PCIe/DCN hosts), 'raw' = plain int16 upload")
    p.add_argument("--analyse", action="store_true",
                   help="run the evaluator on the sweep output afterwards")
    p.add_argument("--trace_dir", type=str, default=None,
                   help="capture a jax.profiler trace of the sweep here")
    # Multi-host (same flags as cli/train.py — parallel/distributed.py
    # add_cli_args): every host runs the SAME command; each decodes/uploads
    # only its own channels of every meeting and writes only their
    # TextGrids.  --output_dir should be shared storage when chaining
    # --analyse.
    from laughter_detection_icsi_tpu.parallel import distributed

    distributed.add_cli_args(p)
    return p


def main(argv: Optional[List[str]] = None) -> int:
    from laughter_detection_icsi_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    parser = build_parser()
    args = parser.parse_args(argv)

    # Multi-host: join the pod runtime BEFORE the first backend touch
    # (same contract as cli/train.py).
    from laughter_detection_icsi_tpu.parallel import distributed

    distributed.initialize_from_args(args, parser)

    import jax
    import numpy as np

    from laughter_detection_icsi_tpu import inference, models
    from laughter_detection_icsi_tpu.config import MODEL_MAP, split_of_meeting
    from laughter_detection_icsi_tpu.eval import textgrid as tg
    from laughter_detection_icsi_tpu.eval import transcript as transcript_lib
    from laughter_detection_icsi_tpu.ops import smoothing
    from laughter_detection_icsi_tpu.parallel import ShardedPipeline, make_mesh
    from laughter_detection_icsi_tpu.train import checkpoint as ckpt_lib

    if args.config not in MODEL_MAP:
        raise SystemExit(
            f"--config: unknown preset {args.config!r} "
            f"(choose from {sorted(MODEL_MAP)})"
        )
    preset = MODEL_MAP[args.config]
    from laughter_detection_icsi_tpu.config import parse_float_list

    thresholds = parse_float_list(args.thresholds, "--thresholds")
    min_lengths = parse_float_list(args.min_lengths, "--min_lengths")

    store = transcript_lib.load(args.transcript_dir)
    wanted = (
        {m.strip() for m in args.meetings.split(",") if m.strip()}
        if args.meetings
        else None
    )
    if wanted:
        unknown = wanted - set(store.meeting_ids)
        if unknown:
            raise SystemExit(
                f"unknown meetings: {', '.join(sorted(unknown))} "
                f"(known: {', '.join(store.meeting_ids)})"
            )
    meetings = [
        m
        for m in store.meeting_ids
        if (args.split == "all" or split_of_meeting(m) == args.split)
        and (wanted is None or m in wanted)
    ]
    if not meetings:
        # A typo'd/empty selection (or a --meetings value outside --split)
        # must not sweep nothing and exit 0 looking successful — a chained
        # --analyse would then evaluate an empty preds dir.
        raise SystemExit(
            f"no meetings selected (split={args.split!r}, "
            f"meetings={sorted(wanted) if wanted else 'all'}) — check that "
            f"the requested meetings belong to the requested split"
        )
    model = models.build(
        preset.model,
        dropout_rate=0.0,
        linear_layer_size=preset.linear_layer_size,
        filter_sizes=preset.filter_sizes,
    )
    ckpt = ckpt_lib.resolve_checkpoint(args.model_path)
    if ckpt is None:
        raise SystemExit(f"Model checkpoint not found at {args.model_path}")
    loaded = ckpt_lib.load_checkpoint(ckpt)

    settings = inference.settings_from_flags(
        chunk=args.chunk,
        bucket_frames=args.bucket_frames,
        precision=args.precision,
        mode=args.mode,
        transfer_codec=args.transfer_codec,
    )
    pipe = ShardedPipeline(
        model=model,
        params=loaded["params"],
        state=loaded["state"],
        mesh=make_mesh(),
        settings=settings,
    )

    from laughter_detection_icsi_tpu.utils.profiling import ThroughputMeter, trace

    # Resolve every meeting's channel audio UP FRONT (not inside the sweep
    # loop): (a) the warm-up below must warm the channel counts actually
    # swept — a meeting with missing audio files has fewer channels than
    # the transcript metadata says, and warming the metadata count would
    # leave the real count cold-compiling on the clock; (b) multi-host runs
    # are SPMD — every process must batch the SAME channels per meeting, so
    # the resolved lists are compared across processes below and a
    # divergence (audio present on one host, missing on another) fails
    # loudly here instead of deadlocking inside mismatched collectives.
    from laughter_detection_icsi_tpu.data.audio import find_track_audio

    resolved = []  # (meeting_id, [chan_id], [path])
    for meeting_id in meetings:
        info = store.info_df[store.info_df.meeting_id == meeting_id]
        chans, paths = [], []
        for _, row in info.iterrows():
            path = find_track_audio(args.audio_dir, meeting_id, row.chan_id)
            if path is None:
                print(f"missing audio: {meeting_id}/{row.chan_id}.sph (and .wav)")
                continue
            chans.append(row.chan_id)
            paths.append(path)
        resolved.append((meeting_id, chans, paths))

    if jax.process_count() > 1:
        # Agreement check: a fingerprint of the (meeting, channel)
        # selections AND each file's header identity (sample count / rate /
        # encoding), allgathered.  make_array_from_process_local_data
        # derives global shapes from local uploads and the pipeline derives
        # track lengths + transfer dtypes from each host's own headers, so
        # a same-named but truncated/re-encoded copy on one host would
        # build a differently-shaped jitted graph there — a hang or an
        # opaque XLA shape error far from the cause.  Hashing the header
        # fields catches that, not just missing files.
        import hashlib

        from jax.experimental import multihost_utils

        digest = hashlib.sha256(
            selection_fingerprint(resolved).encode()
        ).digest()[:16]
        all_digests = np.asarray(
            multihost_utils.process_allgather(
                np.frombuffer(digest, dtype=np.uint8)
            )
        ).reshape(jax.process_count(), -1)
        if not (all_digests == all_digests[0]).all():
            raise SystemExit(
                "multi-host sweep: the resolved (meeting, channel) audio "
                "lists or file headers differ across processes — every "
                "host must see the same files under --audio_dir (a file "
                "missing, truncated, or re-encoded on one host would "
                "desynchronize the SPMD channel batches); sync the audio "
                "or restrict --meetings to commonly-available ones"
            )

    # Warm the compile OFF the clock for every distinct RESOLVED channel
    # count (the sharded graphs key on channels-per-device): cold jit is
    # tens of seconds and was billed to the first meeting's span, making
    # its printed rtf — and the 'inference-only' summary — meaningless.
    # bench.py warms off the clock for the same reason.
    counts = {len(paths) for _, _, paths in resolved if paths}
    warm_len = settings.bucket_frames * pipe.feat_cfg.frame_shift_samples
    for n_ch in sorted(counts):
        warm_dev, _ = pipe.probs_for_waveforms_device(
            [np.zeros(warm_len, np.int16)] * n_ch
        )
        if warm_dev is not None:
            jax.block_until_ready(warm_dev)

    out_root = Path(args.output_dir) / args.split
    meter = ThroughputMeter(n_chips=len(jax.devices()))
    total_audio_s = 0.0
    t0 = time.perf_counter()
    # `with` so any exception still finalizes the profiler trace.
    with trace(args.trace_dir):
        for meeting_id, chans, paths in resolved:
            if not paths:
                continue
            print(f"{meeting_id}: {len(paths)} channels ...", flush=True)
            meter.start()
            (probs_dev, ts), durations = pipe.probs_for_meeting_device(paths)
            if probs_dev is not None:
                # The device arrays are async — stopping the meter on
                # dispatch would report dispatch-only "throughput".
                jax.block_until_ready(probs_dev)
            rtf = meter.stop(float(np.sum(durations)))
            print(f"  {rtf:.1f}x realtime", flush=True)
            total_audio_s += float(np.sum(durations))
            # Multi-host: each process postprocesses/writes ONLY its own
            # channel rows (single-device shard data — no cross-process
            # coordination in the smoothing jits).  Single-process:
            # local_channels is every row.
            if probs_dev is not None:
                rows = pipe.local_channels(probs_dev, len(chans))
            else:
                # All-empty meeting (zero frames): still honor the ownership
                # partition — N hosts concurrently writing the same empty
                # TextGrid paths would interleave on shared storage.
                rows = [
                    (i, None) for i in pipe.local_channel_indices(len(chans))
                ]
            for i, row_probs in rows:
                chan_id, duration = chans[i], durations[i]
                # On-device threshold x min-length sweep per channel row —
                # probabilities never leave HBM, only run tables do.
                t_i = ts[i]
                fps = t_i / duration if duration > 0 else 100.0
                instances = smoothing.instances_from_device_probs(
                    row_probs[:t_i] if row_probs is not None else np.zeros(0),
                    thresholds=thresholds, min_lengths=min_lengths, fps=fps,
                )
                for (thr, min_len), insts in instances.items():
                    d = out_root / meeting_id / f"t_{thr}" / f"l_{min_len}"
                    d.mkdir(parents=True, exist_ok=True)
                    tg.write_textgrid(
                        str(d / f"{chan_id}.TextGrid"), insts, xmax=duration
                    )
    dt = time.perf_counter() - t0
    if total_audio_s:
        print(
            f"swept {total_audio_s / 3600:.2f} h of audio in {dt:.1f}s "
            f"({total_audio_s / dt:.1f}x realtime end-to-end; "
            f"inference-only: {meter.report()})"
        )
    if args.trace_dir:
        # Unconditional, like train.py: the trace exists even when no audio
        # was processed.
        print(f"profiler trace written to {args.trace_dir}")
    multi = jax.process_count() > 1
    if multi:
        # Every host must finish writing its TextGrids before anyone
        # evaluates them.
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("sweep_textgrids_done")
    if args.analyse and (not multi or jax.process_index() == 0):
        if multi:
            print(
                "analyse on coordinator (NOTE: --output_dir must be shared "
                "storage for the evaluation to see every host's TextGrids)"
            )
        from laughter_detection_icsi_tpu.eval.analyse import analyse

        stats = analyse(str(out_root), transcript_dir=args.transcript_dir, force=True)
        print(stats.to_string(index=False))
    return 0


if __name__ == "__main__":
    sys.exit(main())

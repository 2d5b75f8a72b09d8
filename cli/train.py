"""Training CLI (reference train.py:68-135 flag surface).

Reference flags are accepted verbatim; torch-specific ones (--torch_device,
--num_workers, --lhotse_dir, --include_words, --train_on_noisy_audioset) are
parsed for compatibility and ignored with a note.  Features come from the
framework's on-device FeatureCache: tracks referenced by the data_dfs that
are missing from the cache are featurized on first use from
``<data_root>/signals/<meeting>/<chan>.sph``.
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time
from pathlib import Path
from typing import List, Optional


# Allow running as a script from a clean checkout (sys.path[0] is cli/)
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--checkpoint_dir", type=str, required=True)
    p.add_argument("--data_root", type=str, required=True)
    p.add_argument("--num_epochs", type=int, default=1,
                   help="epochs to train IN THIS RUN; resumed runs train "
                        "this many MORE (reference-relative semantics)")
    p.add_argument("--data_dfs_dir", type=str, default="data_dfs")
    p.add_argument("--batch_size", type=str, default=None)
    p.add_argument("--dropout_rate", type=str, default="0.5")
    p.add_argument("--gradient_accumulation_steps", type=str, default="1")
    # Accepted-for-compatibility, unused (reference train.py:96-116; the
    # reference itself never uses --num_workers, SURVEY.md §2.5-11)
    p.add_argument("--lhotse_dir", type=str, default="lhotse")
    p.add_argument("--torch_device", type=str, default=None)
    p.add_argument("--num_workers", type=str, default="8")
    p.add_argument("--include_words", type=str, default=None)
    p.add_argument("--train_on_noisy_audioset", type=str, default=None)
    # TPU-framework additions
    p.add_argument("--feats_dir", type=str, default=None,
                   help="feature cache dir (default <data_root>/feats_tpu)")
    p.add_argument("--signals_dir", type=str, default=None,
                   help="audio root with <meeting>/<chan>.sph "
                        "(default <data_root>/signals)")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard batches over all visible devices")
    p.add_argument("--transfer_dtype", type=str, default=None,
                   choices=["bfloat16"],
                   help="ship feature batches to the device as bfloat16 "
                        "(half the host->device bytes; inputs are "
                        "bf16-rounded, params/grads stay float32)")
    p.add_argument("--precision", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="training COMPUTE precision: bfloat16 runs the "
                        "fwd/bwd in bf16 with float32 master params/Adam "
                        "state (measured 1.63x step speedup on TPU — the "
                        "f32 step is HBM-bound; tools/precision_probe.py "
                        "2026-08-20).  Measured accuracy cost (tools/"
                        "precision_eval_probe.py 2026-08-21, twin models "
                        "through identical batches): 99.1%% instance "
                        "agreement with the f32-trained twin, max F1 delta "
                        "0.046 over thresholds 0.2-0.8 — LESS deviation "
                        "than f32 re-trained on another seed (0.052 / "
                        "97.1%%; PARITY.md #24). float32 "
                        "matches the reference (train.py:261-297) "
                        "bit-for-bit semantics")
    p.add_argument("--device_cache", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="keep the whole split's features resident in device "
                        "HBM and gather batches on device (zero per-step "
                        "feature upload; data.ResidentLadDataset).  'auto' "
                        "enables it on accelerators when the split fits "
                        "--device_cache_budget_gb")
    p.add_argument("--device_cache_budget_gb", type=float, default=4.0,
                   help="max HBM the 'auto' device cache may claim")
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="fuse K consecutive device-resident train steps "
                        "into one dispatch (lax.scan over a [K, B] index "
                        "matrix) — amortizes per-dispatch link latency; "
                        "needs --device_cache and grad_accum 1; same "
                        "semantics as K=1 (numerics equivalent up to float "
                        "reassociation)")
    p.add_argument("--val_batches_per_log", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    from laughter_detection_icsi_tpu.parallel import distributed

    distributed.add_cli_args(p)
    p.add_argument("--trace_dir", type=str, default=None,
                   help="capture a jax.profiler trace of the training run")
    return p


def _ensure_features(cache, df, signals_dir: str) -> None:
    """Featurize any (meeting, chan) track the table needs but the cache
    lacks (stage 1 of reference compute_features.py:66-112)."""
    pairs = sorted(set(zip(df["meeting_id"], df["chan_id"])))
    for meeting_id, chan_id in pairs:
        if cache.has(meeting_id, chan_id):
            continue
        from laughter_detection_icsi_tpu.data.audio import find_track_audio

        path = find_track_audio(signals_dir, meeting_id, chan_id)
        if path is None:
            raise FileNotFoundError(
                f"no cached features and no audio ({chan_id}.sph or .wav) "
                f"for {meeting_id} under {signals_dir}"
            )
        print(f"featurizing {meeting_id}/{chan_id} ...", flush=True)
        cache.add_audio_file(meeting_id, chan_id, path)


def main(argv: Optional[List[str]] = None) -> int:
    from laughter_detection_icsi_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    parser = build_parser()
    args = parser.parse_args(argv)
    # Compatibility flags: compare against the parser DEFAULT (num_workers
    # and lhotse_dir have truthy defaults, so a bare truthiness check could
    # never fire for them and would misfire for explicit default values).
    for flag in (
        "torch_device",
        "include_words",
        "train_on_noisy_audioset",
        "num_workers",
        "lhotse_dir",
    ):
        if getattr(args, flag) != parser.get_default(flag):
            print(f"note: --{flag} is accepted for compatibility and ignored")

    # Named arg-only error before heavy imports (config is jax-free) —
    # same convention as cli/export_model.py and cli/parity.py.
    from laughter_detection_icsi_tpu.config import MODEL_MAP

    if args.config not in MODEL_MAP:
        parser.error(
            f"--config: unknown preset {args.config!r} "
            f"(choose from {sorted(MODEL_MAP)})"
        )
    if args.batch_size is not None:
        # type=str for reference flag compatibility; parse + validate here
        # ('0' is a truthy string, so a bare `or` default-swap would pass
        # batch_size 0 through to a range()-step crash far away, and a
        # negative value would silently train zero batches per epoch).
        try:
            bs = int(args.batch_size)
        except ValueError:
            parser.error(f"--batch_size: not an integer: {args.batch_size!r}")
        if bs < 1:
            parser.error(f"--batch_size must be >= 1, got {bs}")

    # Multi-host: join the pod runtime BEFORE the first backend touch so
    # jax.devices() spans all hosts (parallel/distributed.py; SURVEY §5.8).
    from laughter_detection_icsi_tpu.parallel import distributed

    distributed.initialize_from_args(args, parser)

    import jax

    from laughter_detection_icsi_tpu import models
    from laughter_detection_icsi_tpu.data import FeatureCache, LadDataset, load_split_df
    from laughter_detection_icsi_tpu.train import Adam, TrainLoop, Trainer

    preset = MODEL_MAP[args.config]
    batch_size = (
        int(args.batch_size) if args.batch_size is not None
        else preset.batch_size
    )
    dropout = float(args.dropout_rate)
    grad_accum = int(args.gradient_accumulation_steps)
    ckpt_dir = Path(args.checkpoint_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)

    data_dfs_dir = args.data_dfs_dir
    if not os.path.isabs(data_dfs_dir):
        data_dfs_dir = os.path.join(args.data_root, data_dfs_dir)
    feats_dir = args.feats_dir or os.path.join(args.data_root, "feats_tpu")
    signals_dir = args.signals_dir or os.path.join(args.data_root, "signals")

    cache = FeatureCache(feats_dir)
    train_df = load_split_df(data_dfs_dir, "train")
    dev_df = load_split_df(data_dfs_dir, "dev")
    if jax.process_count() > 1 and not args.data_parallel:
        # Validate BEFORE featurizing: the cold-cache featurization below
        # can take hours, and this misconfiguration is knowable now.
        raise SystemExit(
            "multi-host runs require --data_parallel: without it each "
            "process would train its own divergent copy"
        )
    if jax.process_count() > 1:
        # Multi-host: featurize on the coordinator FIRST, everyone else
        # after a barrier.  On shared storage this removes both the N-fold
        # duplicate featurization and concurrent manifest writes (the
        # non-coordinators re-read the published manifest and find nothing
        # missing); on host-local disks each process still fills its own
        # cache — the post-barrier _ensure_features covers whatever is
        # still absent locally.
        from jax.experimental import multihost_utils

        if jax.process_index() == 0:
            _ensure_features(cache, train_df, signals_dir)
            _ensure_features(cache, dev_df, signals_dir)
        multihost_utils.sync_global_devices("train_features_ready")
        if jax.process_index() != 0:
            cache = FeatureCache(feats_dir)  # re-read coordinator's manifest
            _ensure_features(cache, train_df, signals_dir)
            _ensure_features(cache, dev_df, signals_dir)
    else:
        _ensure_features(cache, train_df, signals_dir)
        _ensure_features(cache, dev_df, signals_dir)
    train_ds = LadDataset(train_df, cache)
    dev_ds = LadDataset(dev_df, cache)

    # Device-resident feature cache: pay the split's upload once, gather
    # batches in HBM (data.ResidentLadDataset).  Under --data_parallel the
    # rows shard across the mesh and the batch gather rides ICI.
    from laughter_detection_icsi_tpu.data import ResidentLadDataset

    want_cache = args.device_cache
    use_cache = False
    if want_cache != "off":
        # Budget what becomes resident: both splits.  Under --data_parallel
        # the rows shard across the mesh, so per-device HBM is 1/n of each.
        n_dev = len(jax.devices()) if args.data_parallel else 1
        est = (
            ResidentLadDataset.estimated_nbytes(train_ds, args.transfer_dtype)
            + ResidentLadDataset.estimated_nbytes(dev_ds, args.transfer_dtype)
        ) // n_dev
        on_accel = jax.devices()[0].platform != "cpu"
        fits = est <= args.device_cache_budget_gb * 1e9
        use_cache = want_cache == "on" or (on_accel and fits)
        if want_cache == "auto" and not use_cache and on_accel:
            print(
                f"device_cache auto: split needs {est/1e9:.2f} GB/device > "
                f"budget {args.device_cache_budget_gb} GB; streaming from host"
            )

    model = models.build(
        preset.model,
        dropout_rate=dropout,
        linear_layer_size=preset.linear_layer_size,
        filter_sizes=preset.filter_sizes,
    )
    multi_process = jax.process_count() > 1  # --data_parallel validated above
    local_rows = None
    if args.data_parallel:
        from laughter_detection_icsi_tpu.parallel import DataParallelTrainer, make_mesh

        mesh = make_mesh()
        n_dev = mesh.devices.size
        if batch_size % n_dev:
            batch_size = -(-batch_size // n_dev) * n_dev
            print(f"note: batch_size rounded up to {batch_size} for {n_dev} devices")
        if grad_accum != 1:
            raise SystemExit("--gradient_accumulation_steps requires single-device mode")
        trainer = DataParallelTrainer(
            model=model, mesh=mesh, optimizer=Adam(),
            compute_dtype=None if args.precision == "float32" else args.precision,
        )
        print(f"data-parallel over {n_dev} devices")
        if multi_process:
            # Each process assembles/feeds only ITS OWN rows of every
            # batch; the step reassembles the global batch on the mesh
            # (data.LadDataset local_rows / parallel.mesh.shard_local_batch).
            # batch_size is a multiple of n_dev, and process count divides
            # n_dev (uniform local device counts), so the split is even.
            local_rows = (jax.process_index(), jax.process_count())
            print(
                f"multi-host: process {local_rows[0]} feeds "
                f"{batch_size // local_rows[1]} of {batch_size} rows/batch"
            )
        if args.transfer_dtype and not use_cache:
            # With --device_cache the value IS honored (it sets the
            # resident cache dtype below) — only the streamed DP path
            # ignores it.
            print(
                "note: --transfer_dtype applies to single-device streamed "
                "batches and is ignored under --data_parallel (use "
                "--device_cache for the bandwidth win)"
            )
    else:
        trainer = Trainer(
            model=model, optimizer=Adam(), grad_accum=grad_accum,
            transfer_dtype=args.transfer_dtype,
            compute_dtype=None if args.precision == "float32" else args.precision,
        )

    if use_cache:
        if args.data_parallel:
            from laughter_detection_icsi_tpu.parallel import mesh as mesh_lib

            row_sharding = mesh_lib.data_sharding(mesh)
            train_ds = ResidentLadDataset(
                train_ds,
                args.transfer_dtype,
                sharding=row_sharding,
                pad_rows_to=int(mesh.devices.size),
            )
            dev_ds = ResidentLadDataset(
                dev_ds,
                args.transfer_dtype,
                sharding=row_sharding,
                pad_rows_to=int(mesh.devices.size),
            )
        else:
            train_ds = ResidentLadDataset(train_ds, args.transfer_dtype)
            dev_ds = ResidentLadDataset(dev_ds, args.transfer_dtype)
        print(f"device cache: {len(train_ds)} train windows resident in HBM")
    params, state, opt_state = trainer.init(jax.random.PRNGKey(args.seed))
    from laughter_detection_icsi_tpu.models import count_parameters

    print(f"The model has {count_parameters(params):,} trainable parameters")

    if multi_process:
        from laughter_detection_icsi_tpu.parallel import distributed

        sync_preempt = distributed.make_preemption_sync()
    else:
        sync_preempt = None
    loop = TrainLoop(
        trainer=trainer,
        checkpoint_dir=str(ckpt_dir),
        log_frequency=preset.log_frequency,
        val_batches_per_log=args.val_batches_per_log,
        # lets the preemption path flush metric rows before the grace
        # period can end in SIGKILL
        metrics_path=str(ckpt_dir / "metrics.csv"),
        # multi-host: the coordinator is the one writer; all processes
        # stop at the SAME step boundary on preemption
        write_artifacts=not multi_process or jax.process_index() == 0,
        sync_preempt=sync_preempt,
        steps_per_dispatch=args.steps_per_dispatch,
    )
    if args.steps_per_dispatch > 1 and not use_cache:
        print(
            "note: --steps_per_dispatch fuses device-resident batches only; "
            "this run streams from host (--device_cache off), so steps "
            "dispatch one at a time"
        )
    params, state, opt_state = loop.resume_if_possible(params, state, opt_state)
    if multi_process:
        # Processes whose local disk has no checkpoint (only the
        # coordinator writes) adopt the coordinator's resume state; all
        # enter the epoch loop at the same step.
        params, state, opt_state = distributed.sync_resume(
            loop, params, state, opt_state
        )
    if loop.global_step:
        print(f"resumed from step {loop.global_step} (epoch {loop.epoch})")
    loop.install_preemption_handler()  # checkpoint + clean exit on SIGTERM

    # train_params.csv (reference train.py:314-322) — coordinator-only,
    # like every other artifact: N processes truncate-writing the same
    # shared path would interleave.
    if loop.write_artifacts:
        with open(ckpt_dir / "train_params.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["num_train_samples", "num_dev_samples", "batch_size", "log_freq"])
            w.writerow([len(train_ds), len(dev_ds), batch_size, preset.log_frequency])

    def val_batches(n: int):
        out = []
        # Resident dev split: index batches become ONE fused gather+eval
        # dispatch each (trainer.eval_batch resident path).
        if isinstance(dev_ds, ResidentLadDataset):
            # Resident rows are already mesh-sharded (multi-host: each
            # process uploaded its own block); the index batches are global.
            it = dev_ds.index_batches(
                batch_size,
                shuffle=True,
                seed=loop.global_step,
                drop_remainder=args.data_parallel,
            )
        else:
            it = dev_ds.batches(
                batch_size,
                shuffle=True,
                seed=loop.global_step,
                drop_remainder=args.data_parallel,
                local_rows=local_rows,
            )
        for _ in range(n):
            try:
                out.append(next(it))
            except StopIteration:
                break
        return out

    from laughter_detection_icsi_tpu.utils.profiling import trace

    t_start = time.perf_counter()
    # `with` (not manual __enter__/__exit__) so any exception — including
    # the escalated second-SIGINT KeyboardInterrupt — still finalizes the
    # profiler trace instead of leaving it corrupt.
    # RELATIVE epoch semantics, exactly like the reference (train.py:154
    # `for epoch in range(n_epochs)` after resuming): each run trains
    # --num_epochs MORE epochs from wherever the checkpoint left off — the
    # contract behind the reference's N one-epoch jobs resuming each other
    # (gen_train_exp.py) and pinned by test_cli_entry's resume test.
    target_epoch = loop.epoch + args.num_epochs
    with trace(args.trace_dir):
        while loop.epoch < target_epoch:
            if use_cache:
                # Fused resident steps: one device dispatch per batch.
                epoch_batches = train_ds.index_batches(
                    batch_size,
                    shuffle=True,
                    seed=args.seed + loop.epoch,
                    drop_remainder=args.data_parallel,
                )
            else:
                epoch_batches = train_ds.batches(
                    batch_size,
                    shuffle=True,
                    seed=args.seed + loop.epoch,
                    drop_remainder=args.data_parallel,
                    # Mid-epoch resume: don't assemble the already-trained
                    # batches run_epoch skips (placeholders instead).
                    skip_assembly=loop.epoch_step,
                    # Multi-host: this process's rows only.
                    local_rows=local_rows,
                )
            params, state, opt_state, mean_loss = loop.run_epoch(
                params,
                state,
                opt_state,
                epoch_batches,
                val_batches_fn=val_batches,
                rng=jax.random.PRNGKey(args.seed * 1000 + loop.epoch),
            )
            if loop.preempted:
                print("preemption requested: checkpoint saved, exiting cleanly")
                break
            print(f"epoch {loop.epoch} done: mean train loss {mean_loss:.4f}")
    if args.trace_dir:
        print(f"profiler trace written to {args.trace_dir}")
    total = time.perf_counter() - t_start
    print(f"training finished in {total:.1f}s")
    loop.flush_metrics()  # metrics_path was set at construction
    loop.save(params, state, opt_state)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Export a trained model as a serialized StableHLO artifact (jax.export).

The deployment counterpart of ``convert_checkpoint.py``: instead of moving
weights between checkpoint formats, this bakes weights + computation into
one versioned artifact any PJRT runtime can execute without this package
(reference has no analogue — its segment_laughter.py:79-101 rebuilds the
torch net from source at every use).

Two artifact kinds (``--what``):
- ``windows``: [B, 1, 100, 44] log-mel windows -> [B] probabilities;
  batch is symbolic unless ``--batch N`` pins it.
- ``e2e``: one bucket's PCM buffer ([wave_len] int16 by default, plus the
  valid-frame count) -> [bucket_frames] per-10ms-frame probabilities,
  featurizer + shared-stem windowing + classifier in one graph.  Build the
  buffers with the numpy-only ``export.bucket_inputs`` helper (they carry
  the Kaldi edge padding and bucket offsets, not raw recording bytes).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path
from typing import List, Optional

# Allow running as a script from a clean checkout (sys.path[0] is cli/)
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", type=str, default=None,
                   help="checkpoint (.ckpt.npz | .pth.tar) or its directory")
    # Default differs from segment_laughter's reference-parity default
    # (resnet_with_augmentation): that preset's 128-wide head doesn't fit
    # the ICSI (100, 44) window geometry this exporter bakes in, and a new
    # CLI has no reference flag surface to mirror.
    p.add_argument("--config", type=str, default="resnet_base")
    p.add_argument("--out", type=str, required=True,
                   help="output artifact path (e.g. model.stablehlo)")
    p.add_argument("--what", choices=["windows", "e2e"], default="windows")
    p.add_argument("--batch", type=int, default=None,
                   help="windows: pin the batch dim (default: symbolic)")
    p.add_argument("--precision", choices=["float32", "bfloat16"],
                   default="float32")
    p.add_argument("--platforms", type=str, default=None,
                   help="comma list, e.g. 'tpu,cpu' for one cross-platform "
                        "artifact (default: current backend only)")
    # e2e graph geometry (None -> resolved for the TARGET platform below,
    # mirroring segment_laughter's accelerator/CPU defaults)
    p.add_argument("--chunk", type=int, default=None)
    p.add_argument("--bucket_frames", type=int, default=None)
    p.add_argument("--wave_dtype", choices=["int16", "float32"],
                   default=None,
                   help="e2e: PCM dtype the artifact takes (default int16)")
    p.add_argument("--pallas_fbank", choices=["off", "on"], default=None,
                   help="e2e: bake the Pallas TPU featurizer kernel into "
                        "the artifact (default off: the matmul featurizer, "
                        "which lowers for every platform — 'on' makes the "
                        "artifact TPU-only)")
    p.add_argument("--random_init", action="store_true",
                   help="export an untrained model (tests/smoke only)")
    return p


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)

    # --- Arg-only validation FIRST: every check below needs no model, so
    # it must fail before the (potentially multi-GB) checkpoint load and
    # the heavy imports, not after.
    platforms = None
    if args.platforms is not None:
        # `is not None`, not truthiness: --platforms "" (e.g. an unset
        # $TARGET_PLATFORMS shell variable) must error here, not silently
        # fall through to a current-backend-only artifact that a TPU
        # deployment can't load — the same silent failure _export_jit
        # rejects for platforms=[] one layer down.
        platforms = [s.strip() for s in args.platforms.split(",") if s.strip()]
        known = {"tpu", "cpu", "cuda", "rocm"}
        bad = [s for s in platforms if s not in known]
        if bad or not platforms:
            # jax.export would reject ' cpu'/'' much later with an opaque
            # error deep in lowering.
            raise SystemExit(
                f"--platforms: unknown platform(s) {bad or ['(empty)']} "
                f"(choose from {sorted(known)})"
            )

    # Loud failure for knobs the selected --what ignores (same convention
    # as cli/visualise.py): a user must not believe a no-op flag took
    # effect in a deployment artifact.
    e2e_only = {"--chunk": args.chunk, "--bucket_frames": args.bucket_frames,
                "--wave_dtype": args.wave_dtype,
                "--pallas_fbank": args.pallas_fbank}
    if args.what == "windows":
        given = [k for k, v in e2e_only.items() if v is not None]
        if given:
            raise SystemExit(f"{given[0]} only applies to --what e2e")
    elif args.batch is not None:
        raise SystemExit("--batch only applies to --what windows "
                         "(the e2e artifact has no batch dimension)")
    for name, v in (("--batch", args.batch), ("--chunk", args.chunk),
                    ("--bucket_frames", args.bucket_frames)):
        # `is not None`, not truthiness: an explicit 0 must be rejected
        # loudly, not silently swapped for the default; negatives would
        # surface as an opaque concatenate-of-nothing error mid-trace.
        if v is not None and v < 1:
            raise SystemExit(f"{name} must be >= 1, got {v}")
    if args.model_path is None and not args.random_init:
        raise SystemExit("--model_path is required (or --random_init)")
    # MODEL_MAP lives in the jax-free config module, so an unknown preset
    # is an arg-only error too — name it here instead of a raw KeyError
    # after the heavy jax import (and potential checkpoint load).
    from laughter_detection_icsi_tpu.config import MODEL_MAP

    if args.config not in MODEL_MAP:
        raise SystemExit(
            f"--config: unknown preset {args.config!r} "
            f"(choose from {sorted(MODEL_MAP)})"
        )

    import jax

    from laughter_detection_icsi_tpu import export as export_lib
    from laughter_detection_icsi_tpu import models
    from laughter_detection_icsi_tpu.train import checkpoint as ckpt_lib

    preset = MODEL_MAP[args.config]
    model = models.build(
        preset.model,
        dropout_rate=0.0,
        linear_layer_size=preset.linear_layer_size,
        filter_sizes=preset.filter_sizes,
    )
    if args.random_init:
        params, state = model.init(jax.random.PRNGKey(0))
        # Lowering bakes closed-over leaves into the module by reading
        # their HOST value; pull the freshly-initialized device tree back
        # once here rather than leaf-by-leaf inside MLIR constant emission.
        params, state = jax.device_get((params, state))
    else:
        found = ckpt_lib.resolve_checkpoint(args.model_path)
        if found is None:
            raise SystemExit(f"Model checkpoint not found at {args.model_path}")
        # host=True: keep weights as numpy.  jax.export reads every
        # closed-over leaf's host value at lowering; device-resident leaves
        # would cost one device->host transfer per parameter — minutes per
        # leaf whenever the tunneled accelerator's D2H path degrades.
        loaded = ckpt_lib.load_checkpoint(found, host=True)
        params, state = loaded["params"], loaded["state"]

    if args.what == "windows":
        exported = export_lib.export_window_classifier(
            model, params, state,
            batch=args.batch,
            precision=args.precision,
            platforms=platforms,
        )
        b = args.batch if args.batch is not None else "b"
        sig = f"[{b}, 1, 100, 44] float32 windows -> [{b}] float32 probs"
    else:
        from laughter_detection_icsi_tpu import inference

        # Resolve geometry for the TARGET platform (the artifact may be
        # lowered for an accelerator from a CPU host): small chunks
        # underfill the MXU (inference.py InferenceSettings notes), so an
        # accelerator-targeted artifact gets segment_laughter's tuned
        # accelerator defaults.
        target_accel = (
            any(p != "cpu" for p in platforms)
            if platforms
            else jax.devices()[0].platform != "cpu"
        )
        chunk = args.chunk if args.chunk is not None else (
            6144 if target_accel else 1024)
        bucket_frames = (args.bucket_frames
                         if args.bucket_frames is not None else 6144)
        wave_dtype = args.wave_dtype if args.wave_dtype is not None else "int16"
        pipe = inference.LaughterPipeline(
            model, params, state,
            settings=inference.InferenceSettings(
                chunk=chunk,
                bucket_frames=bucket_frames,
                precision=args.precision,
                # Default OFF: the Pallas kernel only lowers for TPU; the
                # matmul featurizer makes the artifact portable (export.py
                # cross-platform notes).
                use_pallas_fbank=(args.pallas_fbank == "on"),
            ),
        )
        exported, wave_len = export_lib.export_bucket_pipeline(
            pipe,
            int16_in=(wave_dtype == "int16"),
            platforms=platforms,
        )
        sig = (
            f"([{wave_len}] {wave_dtype} bucket buffer (export.bucket_inputs), "
            f"scalar int32 valid_frames) -> [{bucket_frames}] float32 probs"
        )

    n_bytes = export_lib.save(exported, args.out)
    plat = ",".join(exported.platforms)
    print(f"wrote {args.out} ({n_bytes:,} bytes, platforms [{plat}])")
    print(f"signature: {sig}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

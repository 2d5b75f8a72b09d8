"""Decision-level quantification of `--precision bfloat16` TRAINING.

`cli/train.py --precision bfloat16` runs forward/backward compute in bf16
with f32 masters (train/loop.py build_step_fns) and buys a measured 1.63x
step / 1.67x loop speedup on the HBM-bound train step — but until r05 its
accuracy evidence was only toy-scale loss trajectories
(tests/test_mixed_precision.py).  This probe gives bf16 training the same
treatment `--mode fused_conv` got (tools/fused_conv_eval_probe.py,
PARITY.md #25): what changes at the DECISION level — detected laughter
instances and frame F1 — when the model was TRAINED in bf16 instead of
f32?

Method: train TWIN models through the identical batch/key schedule (same
seed, same synthetic corpus, same init) — one with compute_dtype=None
(f32, reference parity), one with compute_dtype='bfloat16' — then segment
held-out tracks with BOTH checkpoints through the same f32 windows-mode
LaughterPipeline.segment_file path across the reference threshold grid.
Report, per (threshold, min_length): frame-level P/R/F1 of each twin
against ground truth, and instance agreement between the twins (matched /
f32-only / bf16-only events, mean |boundary shift|).

Representative numbers are pinned by tests/test_precision_eval.py; the
measured full-scale summary lives in PARITY.md #24 and the
cli/train.py --precision help text.

Usage: python tools/precision_eval_probe.py [--seconds 120] [--tracks 4]
"""

import argparse
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from laughter_detection_icsi_tpu.utils.platform_env import apply_platform_env

apply_platform_env()

from tools.fused_conv_eval_probe import (  # noqa: E402
    _feat_cfg,
    _frame_prf,
    _match_events,
    _train_model,
    make_track,
)


def run_probe(
    seconds: float = 120.0,
    n_tracks: int = 4,
    train_steps: int = 40,
    batch: int = 64,
    thresholds=(0.2, 0.4, 0.6, 0.8),
    min_lengths=(0.2,),
    seed: int = 0,
    filter_sizes=(8, 8, 8, 8),
    linear_layer_size=24,
    bucket_frames: int = 1024,
    chunk: int = 512,
    twin_b_dtype: str = "bfloat16",
    twin_b_seed: int = None,
) -> dict:
    """Default: f32 twin vs bf16 twin on the SAME data/seed.  Setting
    ``twin_b_dtype=None, twin_b_seed=<other>`` instead measures the natural
    f32 seed-to-seed variance — the anchor that says whether the bf16
    deltas exceed ordinary training stochasticity.  (Output keys keep the
    f32/bf16 names either way; callers label the anchor run.)"""
    from laughter_detection_icsi_tpu import inference
    from laughter_detection_icsi_tpu.data import audio

    # Twins: a FRESH identically-seeded generator per twin makes the batch
    # schedule identical call for call; Trainer.init is keyed on the same
    # PRNGKey inside _train_model, so same-seed twins share init exactly.
    trained = {}
    for label, dtype, sd in (
        ("f32", None, seed),
        ("bf16", twin_b_dtype, seed if twin_b_seed is None else twin_b_seed),
    ):
        model, params, state, loss = _train_model(
            np.random.default_rng(sd),
            _feat_cfg(),
            filter_sizes,
            linear_layer_size,
            train_steps,
            batch,
            compute_dtype=dtype,
        )
        trained[label] = (model, params, state, loss)

    # Both twins evaluate through the SAME f32 windows pipeline: the
    # comparison isolates what bf16 TRAINING changed in the weights.
    pipes = {
        label: inference.LaughterPipeline(
            model,
            params,
            state,
            settings=inference.InferenceSettings(
                bucket_frames=bucket_frames, chunk=chunk, mode="windows"
            ),
        )
        for label, (model, params, state, _l) in trained.items()
    }

    keys = [(t, m) for t in thresholds for m in min_lengths]
    rows = {
        k: dict(
            matched=0, f32_only=0, bf16_only=0, shift_sum=0.0, shift_n=0,
            a_p=[], a_r=[], a_f1=[], b_p=[], b_r=[], b_f1=[],
        )
        for k in keys
    }

    eval_rng = np.random.default_rng(seed + 1000)
    with tempfile.TemporaryDirectory(prefix="prec_eval_") as td:
        for ti in range(n_tracks):
            wave, truth = make_track(eval_rng, seconds)
            path = str(Path(td) / f"track{ti}.wav")
            audio.write_wav(path, wave, 16000)
            n_frames = int(seconds * 100)
            inst = {}
            for label, pipe in pipes.items():
                inst[label], _ = pipe.segment_file(
                    path, thresholds=thresholds, min_lengths=min_lengths
                )
            for k in keys:
                a_ev, b_ev = inst["f32"][k], inst["bf16"][k]
                row = rows[k]
                for lbl, ev in (("a", a_ev), ("b", b_ev)):
                    p, r, f1 = _frame_prf(ev, truth, n_frames)
                    row[f"{lbl}_p"].append(p)
                    row[f"{lbl}_r"].append(r)
                    row[f"{lbl}_f1"].append(f1)
                pairs, a_only, b_only = _match_events(a_ev, b_ev)
                row["matched"] += len(pairs)
                row["f32_only"] += a_only
                row["bf16_only"] += b_only
                for (as_, ae), (bs, be) in pairs:
                    row["shift_sum"] += abs(as_ - bs) + abs(ae - be)
                    row["shift_n"] += 2

    out = {
        "f32_train_loss": trained["f32"][3],
        "bf16_train_loss": trained["bf16"][3],
        "per_key": {},
    }
    for (t, m), row in rows.items():
        out["per_key"][f"t{t}_m{m}"] = {
            "threshold": t,
            "min_length": m,
            "f32_f1": round(float(np.mean(row["a_f1"])), 4),
            "bf16_f1": round(float(np.mean(row["b_f1"])), 4),
            "f32_precision": round(float(np.mean(row["a_p"])), 4),
            "bf16_precision": round(float(np.mean(row["b_p"])), 4),
            "f32_recall": round(float(np.mean(row["a_r"])), 4),
            "bf16_recall": round(float(np.mean(row["b_r"])), 4),
            "matched_events": row["matched"],
            "f32_only_events": row["f32_only"],
            "bf16_only_events": row["bf16_only"],
            "mean_boundary_shift_s": round(
                row["shift_sum"] / max(row["shift_n"], 1), 4
            ),
        }
    f1_deltas = [
        abs(v["f32_f1"] - v["bf16_f1"]) for v in out["per_key"].values()
    ]
    tot_matched = sum(v["matched_events"] for v in out["per_key"].values())
    tot_events = tot_matched + sum(
        v["f32_only_events"] + v["bf16_only_events"]
        for v in out["per_key"].values()
    )
    out["max_f1_delta"] = round(max(f1_deltas), 4)
    out["event_agreement"] = round(tot_matched / max(tot_events, 1), 4)
    return out


def main() -> None:
    import json

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seconds", type=float, default=120.0)
    ap.add_argument("--tracks", type=int, default=4)
    ap.add_argument("--train_steps", type=int, default=40)
    ap.add_argument("--json", action="store_true", help="raw JSON output")
    args = ap.parse_args()
    out = run_probe(
        seconds=args.seconds, n_tracks=args.tracks, train_steps=args.train_steps
    )
    if args.json:
        print(json.dumps(out))
        return
    print(
        f"train loss: f32 {out['f32_train_loss']:.4f}  "
        f"bf16 {out['bf16_train_loss']:.4f}"
    )
    hdr = (
        f"{'thr':>4} {'minlen':>6} {'f32 F1':>7} {'bf16 F1':>8} {'match':>5} "
        f"{'f32only':>7} {'b16only':>7} {'shift_s':>7}"
    )
    print(hdr)
    for v in out["per_key"].values():
        print(
            f"{v['threshold']:>4} {v['min_length']:>6} {v['f32_f1']:>7} "
            f"{v['bf16_f1']:>8} {v['matched_events']:>5} "
            f"{v['f32_only_events']:>7} {v['bf16_only_events']:>7} "
            f"{v['mean_boundary_shift_s']:>7}"
        )
    print(
        f"max F1 delta: {out['max_f1_delta']}  "
        f"event agreement: {out['event_agreement']}"
    )


if __name__ == "__main__":
    main()

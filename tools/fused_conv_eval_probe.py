"""Eval-level quantification of `--mode fused_conv` vs `--mode windows`.

fused_conv is the fastest inference mode in the framework (whole-track
dilated-conv graph, one dispatch per track — measured 14,611x device-side
vs 1,781x for windows, bench_runs.jsonl 2026-08-20), but its window
borders legitimately see real track context where the per-window path
sees zero padding (models/fully_conv.py docstring).  Per-window closeness
was already pinned (tests/test_fully_conv.py); this probe answers the
question a USER has to answer before picking the mode: what changes at
the DECISION level — detected instances and precision/recall/F1 — on a
corpus where ground truth is known?

Method: train a small ResNetBigger on trivially separable synthetic
audio (laughter := loud noise bursts over a quiet background), then
segment held-out tracks with BOTH modes through the real
LaughterPipeline.segment_file path (decode -> fbank -> model -> on-device
smoothing sweep) across the reference threshold grid.  Report, per
(threshold, min_length):

  * frame-level precision/recall/F1 of each mode against ground truth;
  * instance agreement between modes: matched / windows-only / fused-only
    event counts and mean |boundary shift| of matched events.

Representative numbers are pinned by tests/test_fused_conv_eval.py; the
measured full-scale summary lives in PARITY.md #25 and the
cli/segment_laughter.py / cli/sweep.py help text.

Usage: python tools/fused_conv_eval_probe.py [--seconds 120] [--tracks 4]
"""

import argparse
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from laughter_detection_icsi_tpu.utils.platform_env import apply_platform_env

apply_platform_env()


def make_track(rng, seconds: float, sr: int = 16000):
    """Quiet-noise background with loud 'laughter' bursts.  Returns
    (float32 wave, [(start_s, end_s)] ground truth)."""
    wave = (rng.standard_normal(int(seconds * sr)) * 0.02).astype(np.float32)
    truth = []
    t = rng.uniform(1.0, 3.0)
    while t < seconds - 2.0:
        dur = rng.uniform(0.6, 2.5)
        end = min(t + dur, seconds - 0.5)
        lo, hi = int(t * sr), int(end * sr)
        wave[lo:hi] += (rng.standard_normal(hi - lo) * 0.4).astype(np.float32)
        truth.append((t, end))
        t = end + rng.uniform(1.5, 4.0)
    return wave, truth


def _train_model(
    rng,
    feat_cfg,
    filter_sizes,
    linear_layer_size,
    steps,
    batch,
    compute_dtype=None,
):
    """Tiny ResNetBigger trained on 1 s fbank windows of the two classes.
    ``compute_dtype`` threads to Trainer (None = f32 parity mode,
    'bfloat16' = the --precision bfloat16 recipe) so the precision eval
    probe (tools/precision_eval_probe.py) can train twins through the
    identical batch/key schedule."""
    if steps < 1:
        raise ValueError(f"train_steps must be >= 1, got {steps}")
    import jax
    import jax.numpy as jnp

    from laughter_detection_icsi_tpu import models
    from laughter_detection_icsi_tpu.ops import fbank as fbank_ops
    from laughter_detection_icsi_tpu.train.loop import Trainer

    model = models.build(
        "ResNetBigger",
        dropout_rate=0.0,
        linear_layer_size=linear_layer_size,
        filter_sizes=filter_sizes,
    )
    trainer = Trainer(model, compute_dtype=compute_dtype)
    params, state, opt = trainer.init(jax.random.PRNGKey(0))

    sr = 16000
    n = int(1.04 * sr)  # >= 100 frames at 10 ms shift

    # ONE dispatch per batch (vmapped fbank): a per-clip loop costs a
    # device round-trip per clip — thousands of RPCs through a tunnel.
    feat = jax.jit(jax.vmap(lambda w: fbank_ops.fbank(w, feat_cfg)[:100]))

    key = jax.random.PRNGKey(1)
    for i in range(steps):
        y = (rng.uniform(size=batch) > 0.5).astype(np.float32)
        clips = rng.standard_normal((batch, n)).astype(np.float32) * 0.02
        clips[y > 0.5] += (
            rng.standard_normal((int(y.sum()), n)).astype(np.float32) * 0.4
        )
        feats = np.asarray(feat(clips))
        batch_d = {"inputs": feats, "is_laugh": y}
        params, state, opt, m = trainer.train_batch(
            params, state, opt, batch_d, jax.random.fold_in(key, i)
        )
    return model, params, state, float(m["loss"])


def _frame_prf(events, truth, n_frames, fps=100.0):
    """Frame-level precision/recall/F1 of predicted events vs truth."""
    pred = np.zeros(n_frames, bool)
    for s, e in events:
        pred[int(s * fps): int(e * fps)] = True
    gt = np.zeros(n_frames, bool)
    for s, e in truth:
        gt[int(s * fps): int(e * fps)] = True
    tp = int((pred & gt).sum())
    p = tp / max(int(pred.sum()), 1)
    r = tp / max(int(gt.sum()), 1)
    f1 = 2 * p * r / max(p + r, 1e-12)
    return p, r, f1


def _match_events(a, b):
    """Greedy overlap matching of two event lists.  Returns (matched
    pairs, a-only, b-only)."""
    used = set()
    pairs = []
    for ev in a:
        best, best_ov = None, 0.0
        for j, fv in enumerate(b):
            if j in used:
                continue
            ov = min(ev[1], fv[1]) - max(ev[0], fv[0])
            if ov > best_ov:
                best, best_ov = j, ov
        if best is not None:
            used.add(best)
            pairs.append((ev, b[best]))
    a_only = len(a) - len(pairs)
    b_only = len(b) - len(pairs)
    return pairs, a_only, b_only


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
) -> dict:
    from laughter_detection_icsi_tpu import inference
    from laughter_detection_icsi_tpu.data import audio

    rng = np.random.default_rng(seed)
    model, params, state, train_loss = _train_model(
        rng,
        _feat_cfg(),
        filter_sizes,
        linear_layer_size,
        train_steps,
        batch,
    )

    pipes = {
        mode: inference.LaughterPipeline(
            model,
            params,
            state,
            settings=inference.InferenceSettings(
                bucket_frames=bucket_frames, chunk=chunk, mode=mode
            ),
        )
        for mode in ("windows", "fused_conv")
    }

    keys = [(t, m) for t in thresholds for m in min_lengths]
    rows = {k: dict(matched=0, windows_only=0, fused_only=0,
                    shift_sum=0.0, shift_n=0,
                    w_p=[], w_r=[], w_f1=[], f_p=[], f_r=[], f_f1=[])
            for k in keys}

    with tempfile.TemporaryDirectory(prefix="fc_eval_") as td:
        for ti in range(n_tracks):
            wave, truth = make_track(rng, seconds)
            path = str(Path(td) / f"track{ti}.wav")
            audio.write_wav(path, wave, 16000)
            n_frames = int(seconds * 100)
            inst = {}
            for mode, pipe in pipes.items():
                inst[mode], _ = pipe.segment_file(
                    path, thresholds=thresholds, min_lengths=min_lengths
                )
            for k in keys:
                w_ev, f_ev = inst["windows"][k], inst["fused_conv"][k]
                row = rows[k]
                for lbl, ev in (("w", w_ev), ("f", f_ev)):
                    p, r, f1 = _frame_prf(ev, truth, n_frames)
                    row[f"{lbl}_p"].append(p)
                    row[f"{lbl}_r"].append(r)
                    row[f"{lbl}_f1"].append(f1)
                pairs, w_only, f_only = _match_events(w_ev, f_ev)
                row["matched"] += len(pairs)
                row["windows_only"] += w_only
                row["fused_only"] += f_only
                for (ws, we), (fs, fe) in pairs:
                    row["shift_sum"] += abs(ws - fs) + abs(we - fe)
                    row["shift_n"] += 2

    out = {"train_loss": train_loss, "per_key": {}}
    for (t, m), row in rows.items():
        out["per_key"][f"t{t}_m{m}"] = {
            "threshold": t,
            "min_length": m,
            "windows_f1": round(float(np.mean(row["w_f1"])), 4),
            "fused_f1": round(float(np.mean(row["f_f1"])), 4),
            "windows_precision": round(float(np.mean(row["w_p"])), 4),
            "fused_precision": round(float(np.mean(row["f_p"])), 4),
            "windows_recall": round(float(np.mean(row["w_r"])), 4),
            "fused_recall": round(float(np.mean(row["f_r"])), 4),
            "matched_events": row["matched"],
            "windows_only_events": row["windows_only"],
            "fused_only_events": row["fused_only"],
            "mean_boundary_shift_s": round(
                row["shift_sum"] / max(row["shift_n"], 1), 4
            ),
        }
    f1_deltas = [
        abs(v["windows_f1"] - v["fused_f1"]) for v in out["per_key"].values()
    ]
    tot_matched = sum(v["matched_events"] for v in out["per_key"].values())
    tot_events = tot_matched + sum(
        v["windows_only_events"] + v["fused_only_events"]
        for v in out["per_key"].values()
    )
    out["max_f1_delta"] = round(max(f1_deltas), 4)
    out["event_agreement"] = round(tot_matched / max(tot_events, 1), 4)
    return out


def _feat_cfg():
    from laughter_detection_icsi_tpu.config import FEAT

    return FEAT


def main() -> None:
    import json

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seconds", type=float, default=120.0)
    ap.add_argument("--tracks", type=int, default=4)
    ap.add_argument("--train_steps", type=int, default=40)
    args = ap.parse_args()
    out = run_probe(
        seconds=args.seconds, n_tracks=args.tracks, train_steps=args.train_steps
    )
    print(f"train loss: {out['train_loss']:.4f}")
    hdr = (
        f"{'thr':>4} {'minlen':>6} {'win F1':>7} {'fc F1':>7} {'match':>5} "
        f"{'w-only':>6} {'f-only':>6} {'shift(s)':>8}"
    )
    print(hdr)
    for v in out["per_key"].values():
        print(
            f"{v['threshold']:>4} {v['min_length']:>6} {v['windows_f1']:>7} "
            f"{v['fused_f1']:>7} {v['matched_events']:>5} "
            f"{v['windows_only_events']:>6} {v['fused_only_events']:>6} "
            f"{v['mean_boundary_shift_s']:>8}"
        )
    print(json.dumps({
        "max_f1_delta": out["max_f1_delta"],
        "event_agreement": out["event_agreement"],
    }))


if __name__ == "__main__":
    main()

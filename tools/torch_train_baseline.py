"""Measure the PyTorch reference's train-step throughput on THIS host.

Executes the BASELINE.md protocol for the training half of the framework
("run the PyTorch reference itself ... then hold the TPU build to parity
plus the throughput target", BASELINE.md:31-34): the reference's hot loop
semantics — BCE on sigmoid outputs, loss.backward(), clip_grad_norm_(1.0),
Adam(lr=1e-3) — from reference train.py:261-297, on the torch spec twin of
ResNetBigger (tests/test_model_parity.py, written from SURVEY.md §2.4, NOT
copied), at the reference's own batch size (SingleCutSampler max_cuts=32,
reference load_data.py:24-34) and at B=1024 for apples-to-apples with
`bench.py --train`.

The reference trained on one CUDA GPU (Slurm `--gres=gpu:1`,
cluster_scripts/train_laugh_job.sh); no GPU exists in this environment, so
the measurable anchor is torch-CPU on this host.  The record therefore
carries host metadata (nproc, torch threads) and the resulting
`torch_cpu_samples_per_s` is a HOST-ANCHORED baseline: our bench's
vs_baseline ratio against it states "TPU chip vs the reference stack on
the only hardware both can run on here", not "TPU vs the author's GPU".

Timing is plain wall-clock around synchronous torch calls — honest on CPU
because torch eager execution blocks (the same reason the reference's own
`time.time()` timing, train.py:517-535, is honest there; contrast
utils/timing.py for why JAX-on-tunnel needs value-readback barriers).

Usage:
  python tools/torch_train_baseline.py                 # both batch sizes
  python tools/torch_train_baseline.py --batches 32    # just B=32
Emits one JSON line per batch size.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def measure(batch: int, timed_steps: int, warmup_steps: int = 1) -> dict:
    import torch

    from tests.test_model_parity import TorchResNetBigger

    torch.manual_seed(0)
    model = TorchResNetBigger(
        linear_layer_size=48, filter_sizes=(64, 32, 16, 16), p=0.5
    )
    # Reference init: normal(0, 0.01) on EVERY named parameter including BN
    # (reference utils/torch_utils.py:22-24, applied at train.py:425).
    for _, p in model.named_parameters():
        torch.nn.init.normal_(p, mean=0.0, std=0.01)
    model.train()
    optimizer = torch.optim.Adam(model.parameters(), lr=1e-3)
    criterion = torch.nn.BCELoss()

    rng = np.random.default_rng(23)

    def make_batch(i: int):
        # numpy -> torch conversion inside the step, as the reference does
        # per batch (train.py:268-273: batch['inputs'] numpy -> tensor ->
        # .to(device)); distinct content per step.
        x = rng.standard_normal((batch, 100, 44)).astype(np.float32)
        y = rng.integers(0, 2, batch).astype(np.float32)
        return x, y

    def step(x_np: np.ndarray, y_np: np.ndarray) -> float:
        src = torch.from_numpy(x_np)[:, None, :, :]
        trg = torch.from_numpy(y_np)
        probs = model(src).squeeze(-1)
        loss = criterion(probs, trg)
        optimizer.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        optimizer.step()
        return float(loss.detach())

    batches = [make_batch(i) for i in range(warmup_steps + timed_steps)]
    for i in range(warmup_steps):
        step(*batches[i])
    t0 = time.perf_counter()
    per_step = []
    for i in range(warmup_steps, warmup_steps + timed_steps):
        s0 = time.perf_counter()
        step(*batches[i])
        per_step.append(time.perf_counter() - s0)
    dt = time.perf_counter() - t0

    return {
        "metric": "torch_reference_train_step_throughput",
        "value": round(timed_steps * batch / dt, 1),
        "unit": "samples_per_sec",
        "batch_size": batch,
        "timed_steps": timed_steps,
        "per_step_s_min": round(min(per_step), 3),
        "per_step_s_mean": round(dt / timed_steps, 3),
        "platform": "cpu",
        "nproc": os.cpu_count(),
        "torch_threads": __import__("torch").get_num_threads(),
        "torch_version": __import__("torch").__version__,
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--batches",
        type=int,
        nargs="+",
        default=[32, 1024],
        help="batch sizes to measure (reference uses 32; bench.py uses 1024)",
    )
    ap.add_argument(
        "--steps",
        type=int,
        default=None,
        help="timed steps (default: 8 for B<=64, 2 for larger)",
    )
    args = ap.parse_args()
    for b in args.batches:
        steps = args.steps if args.steps else (8 if b <= 64 else 2)
        rec = measure(b, timed_steps=steps)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()

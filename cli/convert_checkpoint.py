"""Checkpoint converter: reference torch ``.pth.tar`` <-> native ``.ckpt.npz``.

Enables "switch to this framework with your existing checkpoint"
(BASELINE.md probability/TextGrid parity is measured against converted
reference checkpoints) and exporting our training results back to torch
tooling.
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

from pathlib import Path

# Allow running as a script from a clean checkout (sys.path[0] is cli/)
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("src", type=str, help=".pth.tar/.pth/.pt or .ckpt.npz")
    p.add_argument("dest", type=str, help="output path (.ckpt.npz or .pth.tar)")
    return p


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    from laughter_detection_icsi_tpu.train import checkpoint as ckpt

    loaded = ckpt.load_checkpoint(args.src)
    if args.dest.endswith((".pth.tar", ".pth", ".pt")):
        import os
        import tempfile

        import numpy as np
        import torch

        state_dict = {
            # np.array (not ascontiguousarray): the copy guarantees a
            # WRITABLE buffer — from_numpy on a read-only npz-backed array
            # warns and yields a tensor with undefined write behavior.
            k: torch.from_numpy(np.array(v))
            for k, v in ckpt.to_torch_state_dict(
                loaded["params"], loaded["state"]
            ).items()
        }
        def _get(key, default):
            # `or` would map legitimate zeros (epoch 0, best_val_loss 0.0)
            # to the default.
            v = loaded.get(key)
            return default if v is None else v

        # tmp + replace, same as the npz branch below: an interrupt
        # mid-torch.save must not leave a truncated .pth.tar where a
        # valid file used to be.
        with tempfile.TemporaryDirectory(
            dir=os.path.dirname(args.dest) or "."
        ) as tmp:
            tmp_path = os.path.join(tmp, os.path.basename(args.dest))
            torch.save(
                {
                    "state_dict": state_dict,
                    "epoch": _get("epoch", 0),
                    "global_step": _get("global_step", 0),
                    "best_val_loss": _get("best_val_loss", float("inf")),
                },
                tmp_path,
            )
            os.replace(tmp_path, args.dest)
    else:
        import os
        import tempfile

        # Write into a TEMP directory, not the destination's: save_checkpoint
        # always emits <dir>/last.ckpt.npz, and writing that directly into a
        # live training directory would clobber its resume checkpoint.
        with tempfile.TemporaryDirectory(
            dir=os.path.dirname(args.dest) or "."
        ) as tmp:
            path = ckpt.save_checkpoint(
                tmp,
                loaded["params"],
                loaded["state"],
                opt_state=loaded.get("opt_state"),
                epoch=loaded.get("epoch") if loaded.get("epoch") is not None else 0,
                global_step=(
                    loaded.get("global_step")
                    if loaded.get("global_step") is not None
                    else 0
                ),
                best_val_loss=(
                    loaded.get("best_val_loss")
                    if loaded.get("best_val_loss") is not None
                    else float("inf")
                ),
                epoch_step=(
                    loaded.get("epoch_step")
                    if loaded.get("epoch_step") is not None
                    else 0
                ),
            )
            os.replace(path, args.dest)
    n = sum(
        v.size for v in ckpt.flatten_tree(loaded["params"]).values()
    )
    print(f"converted {args.src} -> {args.dest} ({n:,} parameters)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

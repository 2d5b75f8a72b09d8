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
        import torch

        state_dict = {
            k: torch.from_numpy(__import__("numpy").array(v))
            for k, v in ckpt.to_torch_state_dict(
                loaded["params"], loaded["state"]
            ).items()
        }
        torch.save(
            {
                "state_dict": state_dict,
                "epoch": loaded.get("epoch") or 0,
                "global_step": loaded.get("global_step") or 0,
                "best_val_loss": loaded.get("best_val_loss") or float("inf"),
            },
            args.dest,
        )
    else:
        import os

        dest_dir = os.path.dirname(args.dest) or "."
        path = ckpt.save_checkpoint(
            dest_dir,
            loaded["params"],
            loaded["state"],
            opt_state=loaded.get("opt_state"),
            epoch=loaded.get("epoch") or 0,
            global_step=loaded.get("global_step") or 0,
            best_val_loss=(
                loaded.get("best_val_loss")
                if loaded.get("best_val_loss") is not None
                else float("inf")
            ),
        )
        if os.path.abspath(path) != os.path.abspath(args.dest):
            os.replace(path, args.dest)
    n = sum(
        v.size for v in ckpt.flatten_tree(loaded["params"]).values()
    )
    print(f"converted {args.src} -> {args.dest} ({n:,} parameters)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

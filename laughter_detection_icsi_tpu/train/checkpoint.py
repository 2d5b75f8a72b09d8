"""Checkpointing: native npz format + reference ``.pth.tar`` interop.

Replaces reference utils/torch_utils.py:36-93:
- ``save_checkpoint(state, is_best, dir)`` writes ``last.ckpt.npz`` and copies
  to ``best.ckpt.npz`` when the validation loss improved.
- ``load_checkpoint`` restores params/state/opt-state/counters.
- ``from_torch_state_dict`` / ``to_torch_state_dict`` convert between torch
  ``state_dict`` layout (reference checkpoints) and our pytrees — parameter
  names and shapes match 1:1 by design (models/layers.py docstring), so the
  converter is a pure tree re-nesting.

The native format is a flat ``np.savez`` (keys are dotted paths; params/state/
opt prefixes) plus a JSON metadata blob — dependency-free, memory-mappable,
and layout-stable across JAX versions.
"""

from __future__ import annotations

import json
import os
import shutil
import warnings
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

PyTree = Any

_BUFFER_LEAVES = ("running_mean", "running_var", "num_batches_tracked")


# --------------------------------------------------------------------------- #
# Tree <-> flat dotted dict
# --------------------------------------------------------------------------- #


def flatten_tree(tree: PyTree, prefix: str = "") -> Dict[str, np.ndarray]:
    """Flatten a nested dict tree to torch-style dotted keys.

    Empty-dict subtrees vanish (nothing to key): a NoBN model's state
    skeleton ({'block1': {'0': {}}, ...}) round-trips through save/load as
    {} — consumers must treat missing state sub-keys as empty, which
    zoo.apply_fn and models/shared_stem.py do (state.get(key, {}))."""
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k in sorted(tree):
            key = f"{prefix}.{k}" if prefix else str(k)
            out.update(flatten_tree(tree[k], key))
    else:
        out[prefix] = np.asarray(tree)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray], *, host: bool = False) -> PyTree:
    """``host=True`` keeps leaves as host numpy instead of device arrays.

    Export needs this: ``jax.export`` bakes closed-over arrays into the
    StableHLO module by reading their HOST value, so a device-resident leaf
    costs one device->host transfer per parameter at lowering time — a
    multi-minute stall per leaf when the tunneled link's D2H path degrades
    (the condition bench.py's health probe exists for).  Numpy leaves lower
    from host memory directly; the normal jit paths accept them unchanged
    (closures become runtime-arg consts either way)."""
    tree: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split(".")
        d = tree
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = np.asarray(val) if host else jnp.asarray(val)
    return tree


# --------------------------------------------------------------------------- #
# Torch state_dict interop
# --------------------------------------------------------------------------- #


def from_torch_state_dict(
    state_dict: Dict[str, Any], *, host: bool = False,
) -> Tuple[PyTree, PyTree]:
    """Torch ``state_dict`` -> (params, state) pytrees.

    BN buffers (running_mean/var, num_batches_tracked) route to ``state``;
    everything else to ``params``.  Accepts torch tensors or numpy arrays.
    """
    params_flat: Dict[str, np.ndarray] = {}
    state_flat: Dict[str, np.ndarray] = {}
    for key, val in state_dict.items():
        if hasattr(val, "detach"):
            val = val.detach().cpu().numpy()
        # Copy: torch's .numpy() returns a VIEW of the tensor's memory, and
        # BN buffers are updated in place by later torch forwards.
        arr = np.array(val, copy=True)
        leaf = key.rsplit(".", 1)[-1]
        if leaf in _BUFFER_LEAVES:
            if leaf == "num_batches_tracked":
                arr = arr.astype(np.int32)
            state_flat[key] = arr
        else:
            params_flat[key] = arr.astype(np.float32)
    return (
        unflatten_tree(params_flat, host=host),
        unflatten_tree(state_flat, host=host),
    )


def to_torch_state_dict(params: PyTree, state: PyTree) -> Dict[str, np.ndarray]:
    """(params, state) -> flat dict keyed/shaped like a torch state_dict."""
    out = dict(flatten_tree(params))
    out.update(flatten_tree(state))
    return out


def load_reference_checkpoint(path: str, *, host: bool = False) -> Dict[str, Any]:
    """Read a reference ``.pth.tar`` checkpoint (reference
    utils/torch_utils.py:55-85).  Returns a dict with keys 'params', 'state',
    'epoch', 'global_step', 'best_val_loss' (counters None when absent)."""
    import torch  # CPU torch is available in the image; gate the import

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    params, state = from_torch_state_dict(ckpt["state_dict"], host=host)
    return {
        "params": params,
        "state": state,
        "epoch": ckpt.get("epoch"),
        "global_step": ckpt.get("global_step"),
        "best_val_loss": ckpt.get("best_val_loss"),
        "epoch_step": 0,
    }


# --------------------------------------------------------------------------- #
# Native checkpoint format
# --------------------------------------------------------------------------- #

LAST_NAME = "last.ckpt.npz"
BEST_NAME = "best.ckpt.npz"


def save_checkpoint(
    checkpoint_dir: str,
    params: PyTree,
    state: PyTree,
    opt_state: Optional[PyTree] = None,
    epoch: int = 0,
    global_step: int = 0,
    best_val_loss: float = float("inf"),
    is_best: bool = False,
    epoch_step: int = 0,
) -> str:
    """Write ``last.ckpt.npz``; copy to ``best.ckpt.npz`` when ``is_best``
    (mirrors reference utils/torch_utils.py:36-52)."""
    ckpt_dir = Path(checkpoint_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    for prefix, tree in (("params", params), ("state", state), ("opt", opt_state)):
        if tree is None:
            continue
        for k, v in flatten_tree(tree).items():
            arrays[f"{prefix}/{k}"] = v
    meta = {
        "epoch": int(epoch),
        "global_step": int(global_step),
        "best_val_loss": float(best_val_loss),
        # steps already taken inside the (possibly interrupted) epoch;
        # resume skips this many batches of the seeded epoch order.
        "epoch_step": int(epoch_step),
        "format_version": 1,
    }
    path = ckpt_dir / LAST_NAME
    # Process-unique tmp name: a FIXED name would let two writers to the
    # same dir (a stale job plus its preemption-requeued successor)
    # interleave into one tmp file and publish a corrupt npz.
    tmp = ckpt_dir / (LAST_NAME + f".tmp.{os.getpid()}")
    with open(tmp, "wb") as f:
        np.savez(f, __meta__=json.dumps(meta), **arrays)
        # fsync BEFORE the rename: close() flushes userspace buffers only,
        # and on power loss/kernel crash the rename can otherwise persist
        # ahead of the data blocks, leaving a zero-length last.ckpt — the
        # exact corruption the tmp+replace dance promises to prevent.
        f.flush()
        os.fsync(f.fileno())
    if is_best:
        # Same tmp+fsync+replace dance (copyfile alone leaves the copied
        # blocks unsynced — the rename could persist ahead of them and
        # leave a truncated best.ckpt, the one checkpoint model selection
        # reads).  Published BEFORE last.ckpt on purpose: last carries the
        # newly-updated best_val_loss, and a kill between the two renames
        # in the other order would leave best.ckpt stale while last records
        # the new best — the strict `<` comparison on deterministic resume
        # would then never refresh best.  The benign inverse (best newer
        # than last's recorded best_val_loss) just re-copies on the next
        # improvement.
        best_tmp = ckpt_dir / (BEST_NAME + f".tmp.{os.getpid()}")
        shutil.copyfile(tmp, best_tmp)
        with open(best_tmp, "rb+") as bf:
            os.fsync(bf.fileno())
        os.replace(best_tmp, ckpt_dir / BEST_NAME)
    os.replace(tmp, path)  # atomic: a crash never corrupts last.ckpt
    return str(path)


def load_checkpoint(path: str, *, host: bool = False) -> Dict[str, Any]:
    """Load a native checkpoint file (or a reference .pth.tar, detected by
    suffix) into {'params', 'state', 'opt_state', counters}.  ``host=True``
    keeps leaves as numpy (see unflatten_tree — required for jax.export,
    which reads every closed-over leaf's host value at lowering time)."""
    if str(path).endswith((".pth.tar", ".pth", ".pt")):
        out = load_reference_checkpoint(path, host=host)
        out["opt_state"] = None
        return out
    import zipfile

    try:
        with np.load(path, allow_pickle=False) as data:
            meta = json.loads(str(data["__meta__"]))
            trees: Dict[str, Dict[str, np.ndarray]] = {
                "params": {}, "state": {}, "opt": {},
            }
            for key in data.files:
                if key == "__meta__":
                    continue
                prefix, _, rest = key.partition("/")
                trees[prefix][rest] = data[key]
    except FileNotFoundError:
        # a wrong path is not corruption — let it say what it is
        raise
    except (ValueError, OSError, EOFError, KeyError, zipfile.BadZipFile) as e:
        raise ValueError(
            f"{path}: corrupt or unreadable checkpoint ({e}); writes are "
            "atomic, so a stale .tmp sibling may hold a partial save"
        ) from e
    # Structurally valid npz: version skew or missing counter keys get their
    # own descriptive errors (a bare KeyError: 'epoch' explained nothing).
    version = meta.get("format_version", 1)
    if version != 1:
        raise ValueError(
            f"{path}: unsupported checkpoint format_version {version} "
            "(this build reads version 1)"
        )
    missing = [k for k in ("epoch", "global_step", "best_val_loss") if k not in meta]
    if missing:
        raise ValueError(f"{path}: checkpoint meta missing keys {missing}")
    return {
        "params": unflatten_tree(trees["params"], host=host),
        "state": unflatten_tree(trees["state"], host=host),
        "opt_state": unflatten_tree(trees["opt"], host=host) if trees["opt"] else None,
        "epoch": meta["epoch"],
        "global_step": meta["global_step"],
        "best_val_loss": meta["best_val_loss"],
        "epoch_step": meta.get("epoch_step", 0),
    }


def find_resume_checkpoint(checkpoint_dir: str) -> Optional[str]:
    """Path of ``last`` checkpoint if one exists (native preferred, reference
    .pth.tar accepted), else None (reference train.py:428-430 semantics)."""
    ckpt_dir = Path(checkpoint_dir)
    for name in (LAST_NAME, "last.pth.tar"):
        p = ckpt_dir / name
        if p.is_file():
            return str(p)
    return None


def find_best_checkpoint(checkpoint_dir: str) -> Optional[str]:
    ckpt_dir = Path(checkpoint_dir)
    for name in (BEST_NAME, "best.pth.tar"):
        p = ckpt_dir / name
        if p.is_file():
            return str(p)
    return None


def resolve_checkpoint(model_path: str) -> Optional[str]:
    """A checkpoint FILE as given, or the best checkpoint inside a
    directory — the one --model_path resolution rule every CLI shares.

    Falls back (with a warning) to the ``last`` checkpoint when the
    directory has no ``best`` one: best.ckpt only materializes at a
    validation log point (reference train.py:408-412 cadence), so a run
    shorter than log_frequency steps would otherwise train a model the
    inference CLIs refuse to load — the reference crashed here
    (segment_laughter.py:63 hardcodes best.pth.tar)."""
    if os.path.isfile(model_path):
        return model_path
    best = find_best_checkpoint(model_path)
    if best is not None:
        return best
    last = find_resume_checkpoint(model_path)
    if last is not None:
        warnings.warn(
            f"no best checkpoint in {model_path}; falling back to {last} "
            "(train long enough to reach a validation log point to get "
            "best.ckpt.npz)",
            stacklevel=2,
        )
    return last

"""Shared deterministic fixtures for the multi-process distributed tests.

Both the spawned workers (tests/fixtures/dist_*worker.py) and the parent
test's in-process single-controller twins import these, so "the same run"
means literally the same batch bytes on every side of a comparison.
"""

from __future__ import annotations

import numpy as np

# Toy problem geometry (matches test_train._toy_batches: loud band on
# positives, trivially separable).
T, F = 12, 8
BATCH = 16
N_TRAIN_BATCHES = 8  # per epoch
N_VAL_BATCHES = 2


def toy_batch(rng: np.random.Generator, batch_size: int = BATCH):
    y = (rng.uniform(size=batch_size) > 0.5).astype(np.float32)
    x = rng.standard_normal((batch_size, T, F)).astype(np.float32) * 0.1
    x[y > 0.5, :, :3] += 2.0
    return {"inputs": x, "is_laugh": y}


def epoch_batches(epoch: int):
    """Epoch ``epoch``'s deterministic global batches (same on every caller)."""
    rng = np.random.default_rng(1000 + epoch)
    return [toy_batch(rng) for _ in range(N_TRAIN_BATCHES)]


def val_batches():
    rng = np.random.default_rng(7)
    return [toy_batch(rng) for _ in range(N_VAL_BATCHES)]


def local_rows(batch, pid: int, nproc: int):
    """This process's contiguous row slice of a global batch — the same
    process-order concatenation parallel.mesh.shard_local_batch reassembles."""
    n = batch["is_laugh"].shape[0]
    assert n % nproc == 0
    k = n // nproc
    return {key: v[pid * k : (pid + 1) * k] for key, v in batch.items()}


def build_model():
    from laughter_detection_icsi_tpu import models

    return models.MLPModel(
        linear_layer_size=T * F, hid_dim1=32, hid_dim2=16, dropout_rate=0.0
    )


def param_checksum(params) -> float:
    import jax

    return float(
        sum(
            np.float64(np.asarray(p).sum())
            for p in jax.tree_util.tree_leaves(params)
        )
    )


class StubCache:
    """Minimal stand-in for data.FeatureCache: in-memory tracks, enough for
    LadDataset's batch-assembly plan (cfg, track(), generation)."""

    class cfg:
        num_samples = T
        num_filters = F

    generation = 0

    def __init__(self, tracks):
        self._tracks = tracks

    def track(self, meeting_id: str, chan_id: str) -> np.ndarray:
        return self._tracks[(meeting_id, chan_id)]


def toy_lad_dataset(n_rows: int = 32):
    """A deterministic LadDataset over one in-memory track: row i cuts
    1 'second' (= T frames) starting at frame i, labels alternate."""
    import pandas as pd

    from laughter_detection_icsi_tpu.data.dataset import LadDataset

    rng = np.random.default_rng(42)
    track = rng.standard_normal((n_rows + T, F)).astype(np.float32)
    cache = StubCache({("M0", "chan0"): track})
    df = pd.DataFrame(
        {
            "meeting_id": ["M0"] * n_rows,
            "chan_id": ["chan0"] * n_rows,
            "sub_start": [i / float(T) for i in range(n_rows)],
            "sub_duration": [1.0] * n_rows,
            "label": [float(i % 2) for i in range(n_rows)],
        }
    )
    return LadDataset(df, cache)

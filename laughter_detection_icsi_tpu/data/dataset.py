"""Training dataset: data_df rows + feature cache -> model batches.

Rebuild of reference datasets.py:23-68 (LadDataset) + load_data.py:12-34
without torch/Lhotse: a batch is {'inputs' [B, 100, 44] float32,
'input_lens' [B], 'is_laugh' [B]}, assembled from the memory-mapped feature
cache.  Epoch iteration shuffles row order with a seeded RNG (the reference
shuffles via Lhotse's CutSet.shuffle + SingleCutSampler).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Optional

import numpy as np
import pandas as pd

from laughter_detection_icsi_tpu.data.feature_cache import FeatureCache


@dataclasses.dataclass
class LadDataset:
    """Laughter-activity-detection dataset over one split's data_df."""

    df: pd.DataFrame
    cache: FeatureCache
    window_frames: int = 0  # 0 -> cfg.num_samples (100 = 1 s)

    def __post_init__(self):
        if self.window_frames == 0:
            self.window_frames = self.cache.cfg.num_samples
        self.df = self.df.reset_index(drop=True)

    def __len__(self) -> int:
        return len(self.df)

    def example(self, i: int) -> Dict[str, np.ndarray]:
        row = self.df.iloc[i]
        feats = self.cache.cut(
            row["meeting_id"],
            row["chan_id"],
            float(row["sub_start"]),
            float(row["sub_duration"]),
            pad_to_frames=self.window_frames,
        )
        n_valid = min(
            int(round(float(row["sub_duration"]) * self.cache.cfg.num_samples)),
            self.window_frames,
        )
        return {
            "inputs": feats,
            "input_lens": np.int32(n_valid),
            "is_laugh": np.float32(row["label"]),
        }

    def batches(
        self,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_remainder: bool = False,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """One epoch of batches.  With ``drop_remainder`` the tail partial
        batch is dropped (use for pjit static shapes)."""
        order = np.arange(len(self.df))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        for lo in range(0, len(order), batch_size):
            idx = order[lo : lo + batch_size]
            if drop_remainder and len(idx) < batch_size:
                return
            examples = [self.example(int(i)) for i in idx]
            yield {
                "inputs": np.stack([e["inputs"] for e in examples]),
                "input_lens": np.asarray([e["input_lens"] for e in examples]),
                "is_laugh": np.asarray([e["is_laugh"] for e in examples]),
            }


def load_split_df(data_dfs_dir: str, split: str) -> pd.DataFrame:
    """Read ``<dir>/<split>_df.csv`` (reference load_data.py:12-18 reads the
    cutset equivalent)."""
    import os

    return pd.read_csv(os.path.join(data_dfs_dir, f"{split}_df.csv"))

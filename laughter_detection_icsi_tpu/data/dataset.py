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

    # ------------------------------------------------------------------ #
    # Vectorized batch assembly
    #
    # The per-example path (``self.example`` row by row) costs ~1 ms/sample
    # in Python — ~900x slower than the jitted TPU train step.  Batches are
    # instead assembled with one fancy-indexed gather per (track, batch)
    # into the memory-mapped cache, and an epoch runs a one-batch-deep
    # background prefetch thread so host assembly overlaps the device step.
    # ------------------------------------------------------------------ #

    def _plan(self):
        # Keyed on the cache generation: add_track overwrites .npy files in
        # place, so a plan built earlier would keep gathering through stale
        # mmaps of the rewritten tracks (example() would NOT — the two
        # paths are pinned identical).
        gen = getattr(self.cache, "generation", 0)
        # Cached as ONE (gen, plan) tuple published only after a successful
        # build: setting the generation key before/separately from the plan
        # would let a concurrent caller (the batches() prefetch thread) — or
        # any later call after a failed rebuild — read the PREVIOUS
        # generation's plan under the new key, gathering through stale mmaps
        # of rewritten tracks (the exact hazard the key exists to prevent).
        cached = getattr(self, "_plan_cache", None)
        if cached is not None and cached[0] == gen:
            return cached[1]
        fps = self.cache.cfg.num_samples
        keys = (
            self.df["meeting_id"].astype(str) + "/" + self.df["chan_id"].astype(str)
        )
        track_idx, uniques = pd.factorize(keys)
        tracks = []
        for k in uniques:
            meeting_id, chan_id = k.split("/", 1)
            tracks.append(self.cache.track(meeting_id, chan_id))
        first = np.round(self.df["sub_start"].to_numpy(float) * fps).astype(np.int64)
        n = np.round(self.df["sub_duration"].to_numpy(float) * fps).astype(np.int64)
        lens = np.asarray([t.shape[0] for t in tracks], dtype=np.int64)
        first = np.clip(first, 0, lens[track_idx])
        plan = {
            "track_idx": np.asarray(track_idx, dtype=np.int64),
            "first": first,
            "n": n,
            "labels": self.df["label"].to_numpy(np.float32),
            "tracks": tracks,
            "lens": lens,
        }
        self._plan_cache = (gen, plan)
        return plan

    def _assemble(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        """Batch for df rows ``idx`` — semantics identical to per-row
        ``example()`` (cut at [first, first+n) clipped to the track, right
        zero-pad to the window), pinned by test."""
        plan = self._plan()
        w = self.window_frames
        nf = self.cache.cfg.num_filters
        b = len(idx)
        out = np.zeros((b, w, nf), dtype=np.float32)
        t_idx = plan["track_idx"][idx]
        first = plan["first"][idx]
        n = plan["n"][idx]
        cols = np.arange(w)
        for t in np.unique(t_idx):
            track = plan["tracks"][t]
            rows = np.nonzero(t_idx == t)[0]
            if track.shape[0] == 0:
                # Zero-frame track (sub-frame-length audio): example()'s cut
                # yields all-zero windows; the clamped gather below would
                # index -1 into an empty array.
                continue
            pos = first[rows][:, None] + cols[None, :]
            mask = (cols[None, :] < np.minimum(n[rows], w)[:, None]) & (
                pos < track.shape[0]
            )
            gathered = np.asarray(
                track[np.minimum(pos, track.shape[0] - 1)], dtype=np.float32
            )
            out[rows] = np.where(mask[:, :, None], gathered, 0.0)
        return {
            "inputs": out,
            "input_lens": np.minimum(n, w).astype(np.int32),
            "is_laugh": plan["labels"][idx],
        }

    def batches(
        self,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_remainder: bool = False,
        prefetch: int = 2,
        skip_assembly: int = 0,
        local_rows: Optional[tuple] = None,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """One epoch of batches.  With ``drop_remainder`` the tail partial
        batch is dropped (use for pjit static shapes).  ``prefetch`` > 0
        assembles upcoming batches on a background thread.

        ``skip_assembly`` > 0 (mid-epoch resume): the first k batches of
        the epoch order were already trained, so yield k cheap ``None``
        placeholders instead of paying host feature assembly for batches
        the resuming caller (train.loop.run_epoch's epoch_step skip)
        discards unseen — resume is near-instant instead of minutes of
        dead I/O near a late log boundary.

        ``local_rows=(process_id, num_processes)`` (multi-host training):
        every process computes the SAME seeded global batch order, then
        assembles only its own contiguous ``batch_size/num_processes``-row
        slice of each batch — process order matches the global batch's row
        order, which is exactly how parallel.mesh.shard_local_batch
        reassembles the global batch on the mesh.  Each host pays I/O and
        assembly only for the rows it feeds.  Requires ``drop_remainder``
        (every batch must split evenly) and ``num_processes | batch_size``.
        """
        slices = _epoch_slices(
            len(self.df), batch_size, shuffle, seed, drop_remainder
        )
        if local_rows is not None:
            pid, nproc = int(local_rows[0]), int(local_rows[1])
            if not 0 <= pid < nproc:
                raise ValueError(f"local_rows: bad process id {pid}/{nproc}")
            if nproc > 1:
                if not drop_remainder:
                    raise ValueError(
                        "local_rows needs drop_remainder=True: a ragged tail "
                        "batch cannot split evenly across processes"
                    )
                if batch_size % nproc:
                    raise ValueError(
                        f"local_rows: batch_size {batch_size} not divisible "
                        f"by num_processes {nproc}"
                    )
                k = batch_size // nproc
                slices = [s[pid * k : (pid + 1) * k] for s in slices]
        if skip_assembly:
            k = min(skip_assembly, len(slices))
            for _ in range(k):
                yield None
            slices = slices[k:]

        if prefetch <= 0:
            for idx in slices:
                yield self._assemble(idx)
            return

        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            """Blocking put that aborts when the consumer is gone (a plain
            q.put could block forever on the final sentinel if the consumer
            abandoned the generator and the drain raced the worker's last
            batch back into the queue)."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for idx in slices:
                    if stop.is_set():
                        return
                    if not put(self._assemble(idx)):
                        return
            except BaseException as e:  # surface assembly errors to the consumer
                put(e)
            finally:
                put(None)

        th = threading.Thread(target=worker, daemon=True)
        th.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # Unblock a worker waiting on a full queue, then reap it.
            while not q.empty():
                q.get_nowait()
            th.join(timeout=5)


def _epoch_slices(
    n: int, batch_size: int, shuffle: bool, seed: int, drop_remainder: bool
):
    """One epoch's batch index slices: seeded permutation + contiguous
    slicing.  The SINGLE source of batch ordering — LadDataset and
    ResidentLadDataset both draw from here, which is what makes streamed
    and resident epochs the same run."""
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    slices = [order[lo : lo + batch_size] for lo in range(0, n, batch_size)]
    if drop_remainder and slices and len(slices[-1]) < batch_size:
        slices.pop()
    return slices


def resolve_transfer_dtype(transfer_dtype):
    """(host_dtype, itemsize) for a transfer_dtype flag.

    THE one accepted set — ResidentLadDataset.__init__ and
    estimated_nbytes both call it, so the HBM budget check and the actual
    builder cannot drift when a dtype is added.  A typo ('bf16',
    'float16') must fail eagerly: silently storing float32 would double
    the planned footprint and OOM a memory-tight run.
    """
    if transfer_dtype == "bfloat16":
        import ml_dtypes

        return ml_dtypes.bfloat16, 2
    if transfer_dtype is None or transfer_dtype == "float32":
        return np.float32, 4
    raise ValueError(
        f"unknown transfer_dtype {transfer_dtype!r}; "
        "use 'bfloat16' or 'float32'/None"
    )


class ResidentLadDataset:
    """The whole split resident in device HBM; batches are device gathers.

    The streamed path uploads ~18 MB of features per 1024-batch every step
    — on a bandwidth-starved host link that is the training bottleneck
    (measured ~150x slower than the jitted step).  A full ICSI split is
    only a few GB of windows, so the TPU-native answer is to pay the
    upload ONCE: features live in HBM ([N, W, F], optionally bfloat16 at
    half the footprint), and each step ships 4 KB of int32 row indices;
    the batch gather runs on device.  Batch ordering reproduces
    ``LadDataset.batches`` exactly (same seeded permutation), so streamed
    and resident training are the same run.

    No reference analogue — the reference re-reads lilcom files from disk
    inside its train loop (reference datasets.py:56, load_data.py:24-34).
    """

    def __init__(
        self,
        dataset: LadDataset,
        transfer_dtype: Optional[str] = None,
        assemble_chunk: int = 8192,
        sharding=None,
        pad_rows_to: int = 1,
    ):
        """``sharding`` (a jax.sharding.Sharding, e.g. rows over a mesh's
        'data' axis) places the resident arrays across devices for
        data-parallel training; ``pad_rows_to`` zero-pads the row count to
        a multiple (mesh size) so the sharded axis divides evenly — padded
        rows are never indexed (epoch slices cover only real rows)."""
        import jax
        import jax.numpy as jnp

        self.dataset = dataset
        n = len(dataset)
        n_pad = -(-max(n, 1) // pad_rows_to) * pad_rows_to
        w = dataset.window_frames
        nf = dataset.cache.cfg.num_filters
        host_dtype, _ = resolve_transfer_dtype(transfer_dtype)

        # Multi-host sharding: assemble ONLY the rows that land on this
        # process's devices — each host pays feature I/O and upload for its
        # own 1/num_processes of the split, never the whole thing.
        row_lo, row_hi = 0, n_pad
        local_build = False
        if sharding is not None:
            procs = {d.process_index for d in sharding.mesh.devices.flat}
            if len(procs) > 1:
                from laughter_detection_icsi_tpu.parallel.mesh import (
                    addressable_row_block,
                )

                local_build = True
                row_lo, row_hi = addressable_row_block(sharding, (n_pad, w, nf))

        feats = np.zeros((row_hi - row_lo, w, nf), dtype=host_dtype)
        lens = np.zeros(row_hi - row_lo, dtype=np.int32)
        labels = np.zeros(row_hi - row_lo, dtype=np.float32)
        for lo in range(row_lo, min(row_hi, n), assemble_chunk):
            idx = np.arange(lo, min(lo + assemble_chunk, row_hi, n))
            batch = dataset._assemble(idx)
            feats[idx - row_lo] = batch["inputs"].astype(host_dtype)
            lens[idx - row_lo] = batch["input_lens"]
            labels[idx - row_lo] = batch["is_laugh"]
        if sharding is None:
            self.feats = jnp.asarray(feats)  # one upload for the whole split
            self.lens = jnp.asarray(lens)
            self.labels = jnp.asarray(labels)
        else:
            from jax.sharding import NamedSharding, PartitionSpec

            row_axis = sharding.spec[0] if len(sharding.spec) else None
            one_d = NamedSharding(sharding.mesh, PartitionSpec(row_axis))
            if local_build:
                # Local rows -> this process's addressable shards, no
                # cross-host movement (same mechanics as shard_local_batch).
                self.feats = jax.make_array_from_process_local_data(
                    sharding, feats, (n_pad, w, nf)
                )
                self.lens = jax.make_array_from_process_local_data(
                    one_d, lens, (n_pad,)
                )
                self.labels = jax.make_array_from_process_local_data(
                    one_d, labels, (n_pad,)
                )
            else:
                self.feats = jax.device_put(feats, sharding)
                self.lens = jax.device_put(lens, one_d)
                self.labels = jax.device_put(labels, one_d)

        @jax.jit
        def gather(data, lens_d, labels_d, idx):
            return (
                data[idx].astype(jnp.float32),
                lens_d[idx],
                labels_d[idx],
            )

        self._gather = gather

    def gather(self, idx):
        """(inputs [B,W,F] float32, lens [B], labels [B]) for rows ``idx``,
        gathered ON DEVICE in one jitted dispatch — the public hook the
        grad-accumulation resident path uses (train.loop), so external
        callers never touch the private jitted closure."""
        import jax.numpy as jnp

        return self._gather(self.feats, self.lens, self.labels, jnp.asarray(idx))

    @staticmethod
    def estimated_nbytes(
        dataset: LadDataset, transfer_dtype: Optional[str] = None
    ) -> int:
        """HBM footprint of :class:`ResidentLadDataset` before building it."""
        _, itemsize = resolve_transfer_dtype(transfer_dtype)
        return (
            len(dataset)
            * dataset.window_frames
            * dataset.cache.cfg.num_filters
            * itemsize
        )

    def __len__(self) -> int:
        return len(self.dataset)

    def batches(
        self,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_remainder: bool = False,
    ) -> Iterator[Dict[str, object]]:
        """One epoch of device-resident batches: same slicing/permutation as
        ``LadDataset.batches``, but 'inputs' / 'input_lens' / 'is_laugh'
        are device arrays gathered in HBM (only the index vector crosses
        the host->device link)."""
        for idx in _epoch_slices(
            len(self.dataset), batch_size, shuffle, seed, drop_remainder
        ):
            x, lens, labels = self.gather(idx)
            yield {"inputs": x, "input_lens": lens, "is_laugh": labels}

    def index_batches(
        self,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_remainder: bool = False,
    ) -> Iterator[Dict[str, object]]:
        """Like :meth:`batches` but yields {'resident', 'idx'} markers the
        train loop turns into ONE fused device dispatch per step
        (train.loop.Trainer.train_batch_resident) — the fastest path."""
        for idx in _epoch_slices(
            len(self.dataset), batch_size, shuffle, seed, drop_remainder
        ):
            yield {"resident": self, "idx": idx}


def load_split_df(data_dfs_dir: str, split: str) -> pd.DataFrame:
    """Read ``<dir>/<split>_df.csv`` (reference load_data.py:12-18 reads the
    cutset equivalent)."""
    import os

    return pd.read_csv(os.path.join(data_dfs_dir, f"{split}_df.csv"))

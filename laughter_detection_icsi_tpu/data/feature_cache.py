"""Whole-track feature cache: on-device fbank -> memory-mapped .npy shards.

Rebuild of reference compute_features.py:66-195 without Lhotse: stage 1
computes log-mel features for every (meeting, channel) track ON DEVICE with
the XLA fbank (ops/fbank.py) in fixed-shape buckets, and stores them as one
``.npy`` per track plus a JSON manifest — memory-mappable, so the training
dataset's per-cut reads are O(window) disk IO, like the reference's lilcom
shards but lossless (or float16, configurable; lilcom is ~0.3%-lossy).
Stage 2 of the reference (manifest surgery attaching is_laugh supervisions)
collapses into the data_df tables themselves: a cut IS a (track, sub_start,
sub_duration, label) row (data/sampler.py), resolved against this cache at
batch-assembly time (data/dataset.py).
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from laughter_detection_icsi_tpu.config import FEAT, FeatConfig
from laughter_detection_icsi_tpu.ops import fbank as fbank_ops

MANIFEST_NAME = "manifest.json"


def _writer_tag() -> str:
    """Unique-per-writer suffix for atomic-publish tmp files.

    pid alone is NOT unique across hosts sharing the cache dir over network
    storage (identical containers on pod workers routinely get the same
    pid), so a same-named tmp could still be opened by two writers and the
    interleaved bytes published by os.replace.  A fresh uuid4 per write is
    unique across hosts, processes, and retries."""
    import uuid

    return f"{os.getpid()}.{uuid.uuid4().hex[:8]}"


def compute_track_features(
    wave: np.ndarray,
    cfg: FeatConfig = FEAT,
    bucket_frames: int = 30000,
    dtype=np.float32,
    use_pallas: bool | None = None,
) -> np.ndarray:
    """[n] waveform -> [T, num_filters] features via fixed-shape jitted
    buckets (static shapes for XLA; one compile per bucket size).

    ``use_pallas=None`` auto-selects the fused Pallas kernel on TPU and the
    XLA featurizer elsewhere (same numerics to ~2e-5, like inference)."""
    import jax
    import jax.numpy as jnp

    from laughter_detection_icsi_tpu import host_prep

    n = len(wave)
    t = fbank_ops.num_frames(n, cfg)
    if t == 0:
        return np.zeros((0, cfg.num_filters), dtype=dtype)
    from laughter_detection_icsi_tpu.ops.fbank_pallas import (
        fbank_pallas_jit,
        resolve_use_pallas,
    )

    featurize = fbank_pallas_jit if resolve_use_pallas(use_pallas) else fbank_ops.fbank_jit
    snip = host_prep.snip_cfg(cfg)
    if cfg.snip_edges:
        # Already in the padded-snip layout the bucket indexing assumes.
        padded = np.asarray(wave, dtype=np.float32)
    else:
        # host_prep owns the snip_edges=False -> padded-snip conversion
        # (Kaldi left-pad arithmetic, short-frame negative-right-pad
        # truncation, symmetric mirroring); an inline copy here was a
        # third version of that geometry waiting to drift.
        padded, _t = host_prep.host_pad_waveform(np.asarray(wave), cfg)
        padded = padded.astype(np.float32)

    shift = snip.frame_shift_samples
    flen = snip.frame_length_samples
    bucket_wave = (bucket_frames - 1) * shift + flen
    out = np.empty((t, cfg.num_filters), dtype=dtype)
    done = 0
    while done < t:
        todo = min(bucket_frames, t - done)
        buf = np.zeros(bucket_wave, dtype=np.float32)
        lo = done * shift
        hi = min(lo + bucket_wave, len(padded))
        buf[: hi - lo] = padded[lo:hi]
        feats = featurize(jnp.asarray(buf), snip)
        out[done : done + todo] = np.asarray(feats[:todo], dtype=dtype)
        done += todo
    return out


@dataclasses.dataclass
class FeatureCache:
    """Directory of per-track feature arrays keyed ``<meeting>/<chan>``."""

    cache_dir: str
    cfg: FeatConfig = FEAT

    def __post_init__(self):
        self._manifest_path = Path(self.cache_dir) / MANIFEST_NAME
        self._manifest: Dict[str, Dict] = {}
        self._mmaps: Dict[str, np.ndarray] = {}
        #: bumped on every add_track so consumers holding derived views
        #: (e.g. LadDataset's gather plan) can detect retracks and rebuild
        self.generation = 0
        if self._manifest_path.is_file():
            self._manifest = json.loads(self._manifest_path.read_text())

    # ------------------------------------------------------------------ #

    def _key(self, meeting_id: str, chan_id: str) -> str:
        return f"{meeting_id}/{chan_id}"

    def _track_path(self, meeting_id: str, chan_id: str) -> Path:
        return Path(self.cache_dir) / meeting_id / f"{chan_id}.npy"

    def has(self, meeting_id: str, chan_id: str, dtype=None) -> bool:
        """Track present, with the cache's feature width and (when
        ``dtype`` is given) storage dtype.

        Both checks exist for the same rerun semantics: a cache built
        under a different FeatConfig (e.g. 44 -> 40 mel filters) must NOT
        satisfy the request, or compute_features silently no-ops and
        training later crashes with an opaque broadcast error (or —
        worse — cut() silently serves wrong-width features)."""
        entry = self._manifest.get(self._key(meeting_id, chan_id))
        if entry is None:
            return False
        if entry.get("num_filters") != int(self.cfg.num_filters):
            return False
        if dtype is not None and entry.get("dtype") != str(np.dtype(dtype)):
            return False
        return True

    def add_track(
        self,
        meeting_id: str,
        chan_id: str,
        wave: np.ndarray,
        dtype=np.float32,
        bucket_frames: int = 30000,
        use_pallas: bool | None = None,
    ) -> np.ndarray:
        feats = compute_track_features(
            wave, self.cfg, bucket_frames=bucket_frames, dtype=dtype,
            use_pallas=use_pallas,
        )
        path = self._track_path(meeting_id, chan_id)
        path.parent.mkdir(parents=True, exist_ok=True)
        # Atomic publish, like the manifest below: a bare np.save overwrite
        # interrupted mid-write leaves a truncated .npy that the (old,
        # still-valid-looking) manifest entry reports as present — a rerun
        # would then skip recomputing the corrupt track.
        # (the .npy suffix matters: np.save appends one to any other name)
        tmp = path.with_name(f"{path.stem}.tmp.{_writer_tag()}.npy")
        np.save(tmp, feats)
        os.replace(tmp, path)
        # Drop any cached mmap of the overwritten file: a stale view keeps
        # the OLD shape and silently reads zeros/garbage past the new end.
        self._mmaps.pop(self._key(meeting_id, chan_id), None)
        self.generation += 1
        self._manifest[self._key(meeting_id, chan_id)] = {
            "num_frames": int(feats.shape[0]),
            "num_filters": int(feats.shape[1]),
            "dtype": str(feats.dtype),
        }
        self._flush_manifest()
        return feats

    def add_audio_file(
        self, meeting_id: str, chan_id: str, audio_path: str, channel: int = 0, **kw
    ) -> np.ndarray:
        from laughter_detection_icsi_tpu.runtime import native

        wave, sr = native.read(audio_path, channel=channel)
        if sr != self.cfg.sampling_rate:
            raise ValueError(
                f"{audio_path}: sample rate {sr} != featurizer rate "
                f"{self.cfg.sampling_rate}"
            )
        return self.add_track(meeting_id, chan_id, wave, **kw)

    def _flush_manifest(self) -> None:
        self._manifest_path.parent.mkdir(parents=True, exist_ok=True)
        # Writer-unique tmp, like the track tmp above: two processes sharing
        # a cache dir (e.g. multi-host training on shared storage) would
        # interleave json.dump writes in ONE shared tmp file and os.replace
        # would publish garbage; with writer-unique tmps the last atomic
        # replace wins with a self-consistent manifest.
        tmp = f"{self._manifest_path}.tmp.{_writer_tag()}"
        with open(tmp, "w") as f:
            json.dump(self._manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path)

    # ------------------------------------------------------------------ #

    def track(self, meeting_id: str, chan_id: str) -> np.ndarray:
        """Memory-mapped [T, F] features for one track."""
        key = self._key(meeting_id, chan_id)
        if key not in self._mmaps:
            if key not in self._manifest:
                raise KeyError(f"track {key} not in feature cache {self.cache_dir}")
            self._mmaps[key] = np.load(
                self._track_path(meeting_id, chan_id), mmap_mode="r"
            )
        return self._mmaps[key]

    def cut(
        self,
        meeting_id: str,
        chan_id: str,
        start_s: float,
        duration_s: float,
        pad_to_frames: Optional[int] = None,
    ) -> np.ndarray:
        """Features for a (start, duration) cut, zero-padded on the right to
        ``pad_to_frames`` (the reference's truncate + pad(1.0 s),
        compute_features.py:164-167)."""
        fps = self.cfg.num_samples
        track = self.track(meeting_id, chan_id)
        first = int(round(start_s * fps))
        n = int(round(duration_s * fps))
        first = max(0, min(first, track.shape[0]))
        cut = np.asarray(track[first : first + n], dtype=np.float32)
        if pad_to_frames is not None:
            if cut.shape[0] > pad_to_frames:
                cut = cut[:pad_to_frames]
            elif cut.shape[0] < pad_to_frames:
                pad = np.zeros(
                    (pad_to_frames - cut.shape[0], track.shape[1]), dtype=np.float32
                )
                cut = np.concatenate([cut, pad])
        return cut

    def keys(self) -> List[str]:
        return sorted(self._manifest)

"""Meeting- and corpus-scale batched inference over a device mesh.

Replaces the reference's Slurm fan-out — one OS process per (meeting,
channel) × threshold × min_length (reference cluster_scripts/
gen_eval_exp.py:91-114) — with one jitted graph evaluating a [C, n] batch of
channel waveforms: featurize + window-classify every channel at once, the
channel axis sharded over the mesh's ``data`` axis (BASELINE.json config 4/5).
Thresholding/min-length sweeps happen on the host afterwards over the tiny
[C, T] probability matrix (ops/smoothing.py).

Channels of one ICSI meeting share a length, so a meeting is naturally one
static-shape batch; across meetings, lengths bucket to ``bucket_frames``
multiples.  The channel axis pads up to a mesh-size multiple with silent
channels (static shapes, SURVEY.md §7.1).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from laughter_detection_icsi_tpu.config import FEAT, FeatConfig
from laughter_detection_icsi_tpu.inference import InferenceSettings, host_pad_waveform
from laughter_detection_icsi_tpu.models.zoo import Model
from laughter_detection_icsi_tpu.ops import fbank as fbank_ops
from laughter_detection_icsi_tpu.ops import windows
from laughter_detection_icsi_tpu.parallel import mesh as mesh_lib

PyTree = Any


@dataclasses.dataclass
class ShardedPipeline:
    """Batched multi-channel inference, channel axis sharded over the mesh."""

    model: Model
    params: PyTree
    state: PyTree
    mesh: Mesh
    feat_cfg: FeatConfig = FEAT
    settings: InferenceSettings = dataclasses.field(default_factory=InferenceSettings)

    def __post_init__(self):
        if self.settings.precision == "bfloat16":
            cast = lambda x: (
                x.astype(jnp.bfloat16)
                if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                else x
            )
            self.params = jax.tree_util.tree_map(cast, self.params)
            self.state = jax.tree_util.tree_map(cast, self.state)
        repl = mesh_lib.replicated(self.mesh)
        self.params = jax.device_put(self.params, repl)
        self.state = jax.device_put(self.state, repl)
        self._jitted: Dict[int, Tuple[Callable, Callable, int]] = {}

    @property
    def n_shards(self) -> int:
        return int(self.mesh.devices.size)

    # ------------------------------------------------------------------ #

    def _graphs_for_bucket(self, bucket_frames: int):
        if bucket_frames in self._jitted:
            return self._jitted[bucket_frames]
        cfg = dataclasses.replace(self.feat_cfg, snip_edges=True)
        shift = cfg.frame_shift_samples
        flen = cfg.frame_length_samples
        wave_len = (bucket_frames - 1) * shift + flen
        window = self.settings.window
        chunk = self.settings.chunk
        n_chunks = -(-bucket_frames // chunk)
        tail = n_chunks * chunk - bucket_frames + window - 1
        model, params, state = self.model, self.params, self.state
        compute_dtype = (
            jnp.bfloat16 if self.settings.precision == "bfloat16" else jnp.float32
        )
        repl = mesh_lib.replicated(self.mesh)
        ch = mesh_lib.data_sharding(self.mesh)  # shard leading channel axis

        @jax.jit
        def featurize(waves: jnp.ndarray, valid_frames: jnp.ndarray) -> jnp.ndarray:
            # waves [C, wave_len] (sharded on C) -> feats [C, T+tail, F]
            feats = fbank_ops.fbank(waves, cfg)
            mask = jnp.arange(bucket_frames)[None, :] < valid_frames[:, None]
            feats = jnp.where(mask[:, :, None], feats, 0.0)
            return jnp.pad(feats, ((0, 0), (0, tail), (0, 0)))

        featurize = jax.jit(featurize, in_shardings=(ch, ch), out_shardings=ch)

        def chunk_probs_one(feats: jnp.ndarray, start: jnp.ndarray) -> jnp.ndarray:
            wins = windows.extract_windows(feats, start, chunk, window)
            x = wins.astype(compute_dtype)[:, None, :, :]
            probs, _ = model.apply(params, state, x, train=False)
            return probs.astype(jnp.float32)

        # vmap over the channel axis; channels stay sharded so each device
        # classifies its own channels' windows.
        chunk_probs = jax.jit(
            jax.vmap(chunk_probs_one, in_axes=(0, None)),
            in_shardings=(ch, repl),
            out_shardings=ch,
        )

        graphs = (featurize, chunk_probs, wave_len)
        self._jitted[bucket_frames] = graphs
        return graphs

    def _bucket(self, t: int) -> int:
        b = self.settings.bucket_frames
        return max(b, -(-t // b) * b)

    # ------------------------------------------------------------------ #

    def probs_for_waveforms(self, waves: Sequence[np.ndarray]) -> List[np.ndarray]:
        """[n_i]-sample waveforms -> per-channel [T_i] probabilities.

        All channels are padded to one shape bucket and evaluated in a single
        sharded batch (the C axis is padded to a mesh-size multiple).
        """
        if not waves:
            return []
        padded_list, ts = [], []
        for w in waves:
            p, t = host_pad_waveform(np.asarray(w, dtype=np.float32), self.feat_cfg)
            padded_list.append(p)
            ts.append(t)
        t_max = max(ts)
        if t_max == 0:
            return [np.zeros(0, dtype=np.float32) for _ in waves]
        bucket = self._bucket(t_max)
        featurize, chunk_probs, wave_len = self._graphs_for_bucket(bucket)

        c = len(waves)
        c_pad = -(-c // self.n_shards) * self.n_shards
        batch = np.zeros((c_pad, wave_len), dtype=np.float32)
        valid = np.zeros(c_pad, dtype=np.int32)
        for i, (p, t) in enumerate(zip(padded_list, ts)):
            batch[i, : len(p)] = p
            valid[i] = t

        sharded = mesh_lib.shard_batch({"w": batch, "v": valid}, self.mesh)
        feats = featurize(sharded["w"], sharded["v"])
        chunk = self.settings.chunk
        outs = [
            chunk_probs(feats, jnp.asarray(i * chunk, dtype=jnp.int32))
            for i in range(-(-bucket // chunk))
        ]
        # One device->host transfer for the whole batch (transfer latency
        # dominates small reads through a tunneled chip).
        probs = np.asarray(jnp.concatenate(outs, axis=1))  # [C, bucket]
        return [probs[i, : ts[i]] for i in range(c)]

    def probs_for_meeting(
        self, audio_paths: Sequence[str], channel: int = 0
    ) -> Tuple[List[np.ndarray], List[float]]:
        """All channels of one meeting in one batch.  Returns (probs per
        channel, durations).  Decode goes through the native C++ runtime's
        thread pool when available (runtime/native.py)."""
        from laughter_detection_icsi_tpu.runtime import native

        decoded = native.read_batch(audio_paths, channels=[channel] * len(audio_paths))
        waves = [w for w, _sr in decoded]
        durations = [len(w) / sr for w, sr in decoded]
        return self.probs_for_waveforms(waves), durations

"""Meeting- and corpus-scale batched inference over a device mesh.

Replaces the reference's Slurm fan-out — one OS process per (meeting,
channel) × threshold × min_length (reference cluster_scripts/
gen_eval_exp.py:91-114) — with one jitted graph evaluating a [C, n] batch of
channel waveforms: featurize + window-classify every channel at once, the
channel axis sharded over the mesh's ``data`` axis (BASELINE.json config 4/5).
The threshold/min-length sweep then runs on device per channel row
(ops/smoothing.instances_from_device_probs; see cli/sweep.py) — only run
tables cross back to host.

Channels of one ICSI meeting share a length, so a meeting is naturally one
static-shape batch; across meetings, lengths bucket to ``bucket_frames``
multiples.  The channel axis pads up to a mesh-size multiple with silent
channels (static shapes, SURVEY.md §7.1).

Multi-host (``jax.distributed``-joined processes): the same program scales
across hosts — every process passes the same path list to
:meth:`ShardedPipeline.probs_for_meeting_device` but decodes/uploads only
its own channel block (header parses are global and cheap; they fix the
program shape), and postprocesses only its rows via
:meth:`ShardedPipeline.local_channels`.  Exercised as real two-process runs
in tests/test_distributed_multiprocess.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from laughter_detection_icsi_tpu import host_prep
from laughter_detection_icsi_tpu.config import FEAT, FeatConfig
from laughter_detection_icsi_tpu.inference import (
    InferenceSettings,
    _StreamingBase,
    host_pad_waveform,
)
from laughter_detection_icsi_tpu.models.zoo import Model
from laughter_detection_icsi_tpu.ops import fbank as fbank_ops
from laughter_detection_icsi_tpu.ops import windows
from laughter_detection_icsi_tpu.parallel import mesh as mesh_lib

PyTree = Any

# Activation-memory guard for the multichannel windows graphs: total
# windows per chunk dispatch (c_local per-channel conv batches of `chunk`
# windows each — the per-channel loop formulation, see _graphs).  8 x 6144
# = 49,152 windows measured comfortably on a 16 GB v5e
# (tools/sharded_windows_probe.py 2026-08-21); beyond the cap the
# per-channel chunk shrinks like the pre-r05 divide-by-c_local did.
_MAX_WINDOWS_PER_DISPATCH = 49152


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
            from laughter_detection_icsi_tpu.inference import cast_tree_bf16

            self.params = cast_tree_bf16(self.params)
            self.state = cast_tree_bf16(self.state)
        repl = mesh_lib.replicated(self.mesh)
        self.params = jax.device_put(self.params, repl)
        self.state = jax.device_put(self.state, repl)
        # Multi-host mesh: host channel batches are interpreted as THIS
        # PROCESS'S rows (parallel.mesh.shard_local_batch — the same
        # local-feed contract as DataParallelTrainer); each host decodes and
        # uploads only its own channels of a meeting.
        self._multi = mesh_lib.process_span(self.mesh) > 1
        self._shard = (
            mesh_lib.shard_local_batch if self._multi else mesh_lib.shard_batch
        )
        # Heterogeneous cache: ('body', c) -> (fn, wave_len, sharding),
        # ('win', ...) -> 4-tuple, ('chunk_probs', c) / ('pk', ...) ->
        # jitted callables.
        self._jitted: Dict[tuple, Any] = {}
        # Pipeline-lifetime packer pool (lazily created): a fresh
        # ThreadPoolExecutor per bucket batch would pay thread
        # creation/teardown on the dispatch critical path, once per bucket.
        self._pack_pool = None

    @property
    def n_shards(self) -> int:
        return int(self.mesh.devices.size)

    def _rows_slice(self, c_pad: int) -> Tuple[int, int]:
        """[lo, hi) global channel rows THIS process builds/uploads.

        Single-process: all of them.  Multi-host: the contiguous block the
        channel sharding places on this process's devices."""
        if not self._multi:
            return 0, c_pad
        return mesh_lib.addressable_row_block(
            mesh_lib.data_sharding(self.mesh), (c_pad, 1)
        )

    def local_channel_indices(self, c: int) -> List[int]:
        """The global channel rows THIS process OWNS out of ``c`` channels.

        The deterministic cross-process partition (from the channel
        sharding's addressable row block): disjoint across processes,
        together covering every channel exactly once — the ownership rule
        multi-host postprocessing/writes key on.  Single-process: all rows.
        """
        if not self._multi:
            return list(range(c))
        c_pad = -(-c // self.n_shards) * self.n_shards
        lo, hi = self._rows_slice(c_pad)
        return list(range(lo, min(hi, c)))

    def local_channels(self, probs_dev, c: int):
        """Per-channel device rows THIS process postprocesses locally.

        Returns [(global_channel_row, probs_row)] for exactly the rows in
        :meth:`local_channel_indices` (the deterministic ownership
        partition — NOT whatever happens to be addressable, which XLA's
        output resharding could replicate onto several hosts at once).
        Each probs_row is a SINGLE-DEVICE array (an addressable shard's
        data) — safe to feed process-local work like
        ops.smoothing.instances_from_device_probs without any cross-process
        coordination.
        """
        if not self._multi:
            return [(i, probs_dev[i]) for i in range(c)]
        owned = self.local_channel_indices(c)
        found: Dict[int, Any] = {}
        for shard in probs_dev.addressable_shards:
            row0 = shard.index[0].start or 0
            data = shard.data
            for j in range(data.shape[0]):
                row = row0 + j
                if row in found:
                    continue  # replicated/resharded duplicate
                found[row] = data[j]
        missing = [r for r in owned if r not in found]
        if missing:
            raise RuntimeError(
                f"rows {missing} owned by this process are not addressable "
                "here — the result's output sharding moved them off-host; "
                "keep the channel axis sharded through the final ops"
            )
        return [(r, found[r]) for r in owned]

    def _use_pallas(self) -> bool:
        from laughter_detection_icsi_tpu.ops.fbank_pallas import resolve_use_pallas

        return resolve_use_pallas(self.settings.use_pallas_fbank)

    def _use_shared_stem(self) -> bool:
        from laughter_detection_icsi_tpu.models import shared_stem

        return shared_stem.resolve_shared_stem(
            self.settings.shared_stem, self.model.name, self.settings.window
        )

    def _sharded_fbank(self, cfg: FeatConfig):
        """Per-device fused Pallas featurizer over the local channel shard.

        pallas_call is a custom call XLA cannot partition, so the kernel is
        mapped over the mesh explicitly: each device featurizes its own
        [C/n_shards, wave_len] block — no collectives, channels are
        independent (SURVEY.md §5.7)."""
        from laughter_detection_icsi_tpu.ops.fbank_pallas import fbank_pallas

        interpret = jax.devices()[0].platform != "tpu"
        return jax.shard_map(
            lambda w: fbank_pallas(w, cfg, interpret=interpret),
            mesh=self.mesh,
            in_specs=P(mesh_lib.DATA_AXIS),
            out_specs=P(mesh_lib.DATA_AXIS),
            # No collectives inside (channels are independent) and
            # pallas_call's out_shape carries no vma annotation.
            check_vma=False,
        )

    # ------------------------------------------------------------------ #

    def _graphs(self, int16_in: bool = False, c_local: int = 1):
        """Two jitted graphs (one compiled shape for any audio length —
        channels stream through fixed-size buckets with a window-1 halo,
        exactly like inference.LaughterPipeline).

        ``c_local`` is the channel count per device.  Since r05 the
        shared-stem classifier runs each local channel as its OWN
        ``chunk``-window conv batch inside one dispatch (the per-channel
        loop formulation, models/shared_stem.py multichannel docstring —
        measured to restore the single-channel per-window rate exactly,
        where the old concat-into-one-C*chunk-batch formulation paid
        +28-31%/window).  The per-channel chunk therefore stays at the
        tuned ``settings.chunk`` and only shrinks when the dispatch's
        TOTAL window count would exceed _MAX_WINDOWS_PER_DISPATCH (the
        activation-memory guard the old divide-by-c_local provided).
        The non-shared-stem path (vmapped full-window classifier) keeps
        the divide: its per-window live footprint is the full window plus
        stage-1 activations, ~8x the shared-stem band/half-res footprint
        the cap was measured at."""
        key = ("win", int16_in, c_local)
        if key in self._jitted:
            return self._jitted[key]
        cfg = host_prep.snip_cfg(self.feat_cfg)
        bucket = self.settings.bucket_frames
        window = self.settings.window
        from laughter_detection_icsi_tpu.inference import bucket_wave_len

        use_shared = self._use_shared_stem()
        if use_shared:
            # Per-channel loop formulation: per-window tensors materialize
            # at band/half resolution, so the _MAX_WINDOWS_PER_DISPATCH
            # cap (measured at that footprint) is the right guard.
            chunk = max(
                1,
                min(
                    self.settings.chunk,
                    _MAX_WINDOWS_PER_DISPATCH // max(1, c_local),
                ),
            )
        else:
            # Non-shared path vmaps the FULL-window classifier over local
            # channels: all c_local channels' [chunk, window, F] window
            # batches and stage-1 conv activations are live at once, ~8x
            # the shared-stem footprint per window — keep the original
            # divide so the per-device window count stays at the tuned
            # settings.chunk.
            chunk = max(1, self.settings.chunk // max(1, c_local))
        ext = bucket + window - 1
        wave_len = bucket_wave_len(self.settings, self.feat_cfg)
        n_chunks = -(-bucket // chunk)
        feat_rows = n_chunks * chunk + window - 1
        model, params, state = self.model, self.params, self.state
        compute_dtype = (
            jnp.bfloat16 if self.settings.precision == "bfloat16" else jnp.float32
        )
        repl = mesh_lib.replicated(self.mesh)
        ch = mesh_lib.data_sharding(self.mesh)  # shard leading channel axis

        fbank_fn = (
            self._sharded_fbank(cfg)
            if self._use_pallas()
            else lambda w: fbank_ops.fbank(w, cfg)
        )
        if use_shared:
            from laughter_detection_icsi_tpu.models import shared_stem

            track2_ok = shared_stem.supports_track2(window)

        def featurize_body(waves: jnp.ndarray, valid_frames: jnp.ndarray):
            # waves [C, wave_len] float32 (sharded on C) -> feats
            # [C, feat_rows, F]; shared by every transfer codec.
            feats = fbank_fn(waves)
            mask = jnp.arange(ext)[None, :] < valid_frames[:, None]
            feats = jnp.where(mask[:, :, None], feats, 0.0)
            feats = jnp.pad(feats, ((0, 0), (0, feat_rows - ext), (0, 0)))
            if use_shared:
                feats = feats.astype(compute_dtype)
                track1 = jax.vmap(
                    lambda f: shared_stem.stem_track(params, state, f)
                )(feats)
                if track2_ok:
                    track2 = jax.vmap(
                        lambda t: shared_stem.stem_track2(params, state, t)
                    )(track1)
                    return feats, track1, track2
                return feats, track1
            return feats

        self._jitted[("body", c_local)] = (featurize_body, wave_len, ch)

        def featurize(waves: jnp.ndarray, valid_frames: jnp.ndarray):
            if int16_in:
                waves = waves.astype(jnp.float32) * (1.0 / 32768.0)
            return featurize_body(waves, valid_frames)

        featurize = jax.jit(featurize, in_shardings=(ch, ch), out_shardings=ch)

        cp_key = ("chunk_probs", c_local)
        if cp_key in self._jitted:
            # chunk_probs depends only on c_local — the int16 scaling lives
            # in featurize — so the int16 and float graph keys share ONE
            # jitted closure (same guard as inference.LaughterPipeline._graphs:
            # a mixed int16/float corpus must not pay the conv-net compile
            # twice).
            chunk_probs = self._jitted[cp_key]
        elif use_shared:
            # Per-channel loop formulation (r05): each local channel runs
            # its own static-slice gather into its own `chunk`-window conv
            # batch; channel c's windows land at flat rows
            # c*chunk .. (c+1)*chunk-1 of the output.  Retired
            # alternatives, both measured slower (see the multichannel
            # docstrings in models/shared_stem.py): time-flattened-track
            # gathers collapse TPU gather throughput 13.6x; the r04
            # concat-into-one-C*chunk-conv-batch paid +28-31%/window (the
            # concat materializes what the single-channel path streams
            # gather->conv); vmap over channels hits the gather cliff AND
            # compiles the mapped convs badly.
            def chunk_local(ft, start: jnp.ndarray) -> jnp.ndarray:
                c_loc = ft[0].shape[0]
                if track2_ok:
                    feats_c, t1_c, t2_c = ft
                    probs = shared_stem.chunk_probs_multichannel_from_track2(
                        params, state, t1_c, t2_c, feats_c, start,
                        chunk, window,
                    )
                else:
                    feats_c, t1_c = ft
                    probs = shared_stem.chunk_probs_multichannel_from_track(
                        params, state, t1_c, feats_c, start, chunk, window,
                    )
                return probs.reshape(c_loc, chunk).astype(jnp.float32)

            chunk_probs = jax.jit(
                jax.shard_map(
                    chunk_local,
                    mesh=self.mesh,
                    in_specs=(P(mesh_lib.DATA_AXIS), P()),
                    out_specs=P(mesh_lib.DATA_AXIS),
                    check_vma=False,
                )
            )
        else:

            def chunk_probs_one(feats: jnp.ndarray, start: jnp.ndarray) -> jnp.ndarray:
                wins = windows.extract_windows(feats, start, chunk, window)
                x = wins.astype(compute_dtype)[:, None, :, :]
                probs, _ = model.apply(params, state, x, train=False)
                return probs.astype(jnp.float32)

            # vmap over the channel axis; channels stay sharded so each
            # device classifies its own channels' windows.
            chunk_probs = jax.jit(
                jax.vmap(chunk_probs_one, in_axes=(0, None)),
                in_shardings=(ch, repl),
                out_shardings=ch,
            )

        self._jitted[cp_key] = chunk_probs
        graphs = (featurize, chunk_probs, wave_len, chunk)
        self._jitted[key] = graphs
        return graphs

    def _packed_featurize(self, wire_len: int, c_local: int, delta: bool):
        """Batched packed-PCM featurize (ops/pcm_pack.py): each channel row
        of the [C, wire_len] wire batch decodes on its own device shard,
        then the shared featurize body runs.  All channels share one decode
        mode (the packer is forced to 'delta'), so one compilation serves
        the batch."""
        key = ("pk", wire_len, c_local, delta)
        if key in self._jitted:
            return self._jitted[key]
        featurize_body, wave_len, ch = self._jitted[("body", c_local)]
        from laughter_detection_icsi_tpu.ops import pcm_pack

        n_blocks = -(-wave_len // pcm_pack.BLOCK)

        def featurize_packed(wires, valid_frames):
            def unp(row):
                widths, words = pcm_pack.split_wire(row, n_blocks)
                v = pcm_pack.unpack_pcm(words, widths, n=wave_len, delta=delta)
                return v.astype(jnp.float32) * (1.0 / 32768.0)

            waves = jax.vmap(unp)(wires)
            # Materialize the decoded waves (see inference._packed_featurize).
            waves = jax.lax.optimization_barrier(waves)
            return featurize_body(waves, valid_frames)

        featurize_packed = jax.jit(
            featurize_packed, in_shardings=(ch, ch), out_shardings=ch
        )
        self._jitted[key] = featurize_packed
        return featurize_packed

    def _maybe_pack_batch(self, batch: np.ndarray):
        """Pack a [C, wave_len] int16 bucket batch into a [C, wire_len]
        uint32 wire batch when the codec settings say so and it shrinks the
        wire; returns (wires, delta) or None (= upload raw).  Every channel
        is forced to delta mode so the batched decoder compiles once."""
        codec = self.settings.transfer_codec
        if codec == "raw":
            return None
        if self._multi:
            # wire_len is content-dependent (compression), so each process
            # would compile a DIFFERENT featurize_packed program — SPMD
            # requires every process to launch the same executable.  Raw
            # upload multi-host; agreeing on a global wire_len is future
            # work if a pod's host links ever want the codec.
            if codec == "packed":
                import warnings

                warnings.warn(
                    "transfer_codec='packed' is single-process only "
                    "(content-dependent wire shapes diverge across hosts); "
                    "uploading raw",
                    stacklevel=3,
                )
            return None
        if batch.dtype != np.int16:
            if codec == "packed":
                import warnings

                warnings.warn(
                    "transfer_codec='packed' needs int16 PCM channels; this "
                    "float batch uploads raw",
                    stacklevel=3,
                )
            return None
        from laughter_detection_icsi_tpu.ops import pcm_pack

        if len(batch) > 1:
            # Per-channel packing is independent and the native packer
            # releases the GIL, so pack the bucket's channels concurrently
            # (mirrors the per-channel decode pool in
            # probs_for_meeting_device) instead of serializing host work on
            # the dispatch critical path.  The pool lives as long as the
            # pipeline — this runs once per bucket, hundreds of times per
            # meeting.
            if self._pack_pool is None:
                import weakref
                from concurrent.futures import ThreadPoolExecutor

                pool = ThreadPoolExecutor(
                    max_workers=8, thread_name_prefix="pcm-pack"
                )
                # Shut the pool down when the pipeline is garbage-collected:
                # idle non-daemon workers otherwise survive every discarded
                # pipeline until interpreter exit (+8 stray threads per
                # model reload in a long-lived process).
                weakref.finalize(self, pool.shutdown, wait=False)
                self._pack_pool = pool
            packs = list(
                self._pack_pool.map(
                    lambda row: pcm_pack.pack_pcm(row, mode="delta"), batch
                )
            )
        else:
            packs = [pcm_pack.pack_pcm(row, mode="delta") for row in batch]
        rows = [p.wire() for p in packs]
        wire_len = max(len(r) for r in rows)
        total = len(rows) * wire_len * 4
        if codec == "auto" and total > 0.9 * batch.nbytes:
            return None
        wires = np.zeros((len(rows), wire_len), dtype=np.uint32)
        for i, r in enumerate(rows):
            wires[i, : len(r)] = r
        return wires, True

    def _fc_graph(self, total_frames: int, int16_in: bool = False):
        """Fused-conv whole-track graph, channel axis sharded
        (settings.mode == 'fused_conv'; see models/fully_conv.py)."""
        key = ("fc", total_frames, int16_in)
        if key in self._jitted:
            return self._jitted[key]
        from laughter_detection_icsi_tpu.models.fully_conv import (
            fully_conv_probs_blocked,
        )

        cfg = host_prep.snip_cfg(self.feat_cfg)
        shift = cfg.frame_shift_samples
        flen = cfg.frame_length_samples
        wave_len = (total_frames - 1) * shift + flen
        params, state = self.params, self.state
        compute_dtype = (
            jnp.bfloat16 if self.settings.precision == "bfloat16" else jnp.float32
        )
        ch = mesh_lib.data_sharding(self.mesh)
        fbank_fn = (
            self._sharded_fbank(cfg)
            if self._use_pallas()
            else lambda w: fbank_ops.fbank(w, cfg)
        )

        def graph(waves: jnp.ndarray, valid_frames: jnp.ndarray) -> jnp.ndarray:
            if int16_in:
                waves = waves.astype(jnp.float32) * (1.0 / 32768.0)
            feats = fbank_fn(waves)  # [C, total, F]
            mask = jnp.arange(total_frames)[None, :] < valid_frames[:, None]
            feats = jnp.where(mask[:, :, None], feats, 0.0).astype(compute_dtype)
            probs = jax.vmap(
                lambda f: fully_conv_probs_blocked(
                    params, state, f, window=self.settings.window
                )
            )(feats)
            return probs.astype(jnp.float32)

        graph = jax.jit(graph, in_shardings=(ch, ch), out_shardings=ch)
        graphs = (graph, wave_len)
        self._jitted[key] = graphs
        return graphs

    # ------------------------------------------------------------------ #

    def probs_for_waveforms(self, waves: Sequence[np.ndarray]) -> List[np.ndarray]:
        """[n_i]-sample waveforms -> per-channel [T_i] probabilities.

        Channels are batched (C padded to a mesh-size multiple) and streamed
        together through fixed-size frame buckets ('windows' mode) or run
        through one whole-track dilated-conv graph ('fused_conv' mode).
        """
        if self._multi:
            # Guard BEFORE any compute: np.asarray on a multi-host global
            # array would raise anyway (rows on other hosts are not
            # addressable here), but only after paying the full upload +
            # inference — and an all-empty batch (probs None) would dodge
            # the error entirely and "succeed" on every process at once.
            raise RuntimeError(
                "probs_for_waveforms returns ALL channels to one host, which "
                "a multi-process mesh cannot do; use "
                "probs_for_waveforms_device + local_channels (each process "
                "postprocesses its own rows)"
            )
        probs, ts = self.probs_for_waveforms_device(waves)
        if probs is None:
            return [np.zeros(0, dtype=np.float32) for _ in waves]
        # One device->host transfer for the whole batch (transfer latency
        # dominates small reads through a tunneled chip).
        host = np.asarray(probs)
        return [host[i, : ts[i]] for i in range(len(waves))]

    def probs_for_waveforms_device(self, waves: Sequence[np.ndarray]):
        """Like :meth:`probs_for_waveforms` but returns (probs [C, t_max]
        ON DEVICE, frame counts) — feed rows to on-device smoothing
        (ops/smoothing.instances_from_device_probs) so only run tables
        cross back to host.  (None, counts) when nothing to compute."""
        if len(waves) == 0:
            # len(), not truthiness: a [C, n] ndarray channel batch — the
            # shape LaughterPipeline's 2-D error steers users here with —
            # raises 'truth value of an array is ambiguous' under `not`.
            return None, []
        for w in waves:
            if np.asarray(w).ndim != 1:
                # Same contract as LaughterPipeline.probs_for_waveform_device:
                # a 2-D channel would be silently treated as empty audio
                # (channel-major) or crash in np.pad (samples-major).
                raise ValueError(
                    f"each channel must be 1-D PCM, got shape "
                    f"{np.asarray(w).shape}"
                )
            if np.asarray(w).dtype not in (np.int16, np.float32, np.float64):
                # Same contract as LaughterPipeline.probs_for_waveform_device
                # and _StreamingBase._append: silently casting e.g. int32 PCM
                # would feed +-2^31-range values to a featurizer expecting
                # [-1, 1].
                raise TypeError(
                    f"unsupported PCM dtype {np.asarray(w).dtype}; pass "
                    "int16 or float32/float64 in [-1, 1]"
                )
        int16_in = all(np.asarray(w).dtype == np.int16 for w in waves)
        dtype = np.int16 if int16_in else np.float32
        padded_list, ts = [], []
        for w in waves:
            w = np.asarray(w)
            if not int16_in and w.dtype == np.int16:
                # Mixed batch: the device graph won't apply the int16 scale,
                # so scale this channel on host (a bare astype would feed
                # +-32768-range values into the featurizer).
                w = w.astype(np.float32) / 32768.0
            p, t = host_pad_waveform(w.astype(dtype), self.feat_cfg)
            padded_list.append(p)
            ts.append(t)
        return self._probs_padded_device(padded_list, ts, int16_in), ts

    def _probs_padded_device(self, padded_list, ts, int16_in: bool):
        """[C, t_max] device probabilities from host-padded channel buffers.

        ``padded_list[r]`` may be None on a multi-host mesh for rows outside
        this process's channel block (probs_for_meeting_device decodes only
        local channels); ``ts`` must still be the GLOBAL per-channel frame
        counts — t_max and the bucket count are program shape, and every
        process must run the same program (SPMD)."""
        dtype = np.int16 if int16_in else np.float32
        t_max = max(ts)
        if t_max == 0:
            return None
        c = len(ts)
        c_pad = -(-c // self.n_shards) * self.n_shards
        row_lo, row_hi = self._rows_slice(c_pad)
        if self.settings.mode == "fused_conv":
            b = self.settings.bucket_frames
            total = max(b, -(-t_max // b) * b)
            graph, wave_len = self._fc_graph(total, int16_in)
            batch = np.zeros((row_hi - row_lo, wave_len), dtype=dtype)
            valid = np.zeros(row_hi - row_lo, dtype=np.int32)
            for r in range(row_lo, min(row_hi, c)):
                if padded_list[r] is not None:
                    batch[r - row_lo, : len(padded_list[r])] = padded_list[r]
                valid[r - row_lo] = ts[r]
            sharded = self._shard({"w": batch, "v": valid}, self.mesh)
            # Slice to the documented [C, t_max]: the graph computes the
            # bucket-rounded frame count, and the masked-zero tail carries
            # a fully-conv bias-leak CONSTANT (~0.48 at init scale), not 0 —
            # a device consumer trusting the contract would smooth phantom
            # laughter past the end of the audio.
            return graph(sharded["w"], sharded["v"])[:c, :t_max]
        c_local = c_pad // self.n_shards
        bucket = self.settings.bucket_frames

        pieces = []
        for batch, valid, k in self.bucket_batches(padded_list, ts, int16_in):
            probs = self._bucket_probs_batch(batch, valid, c_local)
            pieces.append(probs[:, : min(bucket, t_max - k * bucket)])
        return jnp.concatenate(pieces, axis=1)[:c]  # [C, t_max] on device

    def bucket_batches(self, padded_list, ts, int16_in: bool = False):
        """Yield this pipeline's windows-mode bucket plan: one
        ``(batch [rows, wave_len], valid [rows], bucket_index)`` per
        bucket, exactly as :meth:`_probs_padded_device` feeds
        ``_bucket_probs_batch``.  The ONE definition of the per-bucket
        slice/valid math — bench decompositions iterate this instead of
        copying it, so a change to the bucket geometry can never leave a
        measurement running a different graph shape than production
        (same contract as inference.LaughterPipeline.bucket_buffers)."""
        dtype = np.int16 if int16_in else np.float32
        ts = list(ts)
        t_max = max(ts)
        c = len(ts)
        c_pad = -(-c // self.n_shards) * self.n_shards
        row_lo, row_hi = self._rows_slice(c_pad)
        c_local = c_pad // self.n_shards
        wave_len = self._graphs(int16_in, c_local)[2]
        bucket = self.settings.bucket_frames
        window = self.settings.window
        shift = host_prep.snip_cfg(self.feat_cfg).frame_shift_samples
        for k in range(-(-t_max // bucket)):
            lo = k * bucket * shift
            batch = np.zeros((row_hi - row_lo, wave_len), dtype=dtype)
            valid = np.zeros(row_hi - row_lo, dtype=np.int32)
            for r in range(row_lo, min(row_hi, c)):
                p = padded_list[r]
                if p is not None:
                    src = p[lo : lo + wave_len]
                    batch[r - row_lo, : len(src)] = src
                valid[r - row_lo] = int(
                    np.clip(ts[r] - k * bucket, 0, bucket + window - 1)
                )
            yield batch, valid, k

    def _bucket_probs_batch(
        self, batch: np.ndarray, valid: np.ndarray, c_local: int
    ) -> jnp.ndarray:
        """ONE bucket batch ([c_pad, wave_len] buffers + per-channel valid
        frames) -> [c_pad, bucket+extra] device probabilities.  The single
        bucket execution body — the offline loop and the sharded streaming
        session both run through it."""
        int16_in = batch.dtype == np.int16
        featurize, chunk_probs, _wave_len, chunk = self._graphs(int16_in, c_local)
        packed = self._maybe_pack_batch(batch)  # windows-mode only path
        if packed is not None:
            wires, delta = packed
            featurize_pk = self._packed_featurize(wires.shape[1], c_local, delta)
            sharded = self._shard({"w": wires, "v": valid}, self.mesh)
            feats = featurize_pk(sharded["w"], sharded["v"])
        else:
            sharded = self._shard({"w": batch, "v": valid}, self.mesh)
            feats = featurize(sharded["w"], sharded["v"])
        n_chunks = -(-self.settings.bucket_frames // chunk)
        outs = [
            chunk_probs(feats, jnp.asarray(i * chunk, dtype=jnp.int32))
            for i in range(n_chunks)
        ]
        return jnp.concatenate(outs, axis=1)

    def probs_for_meeting(
        self, audio_paths: Sequence[str], channel: int = 0
    ) -> Tuple[List[np.ndarray], List[float]]:
        """All channels of one meeting in one batch.  Returns (probs per
        channel, durations).  Decode goes through the native C++ runtime's
        thread pool when available (runtime/native.py)."""
        if self._multi:
            # Before any decode/compute — see probs_for_waveforms.
            raise RuntimeError(
                "probs_for_meeting returns ALL channels to one host, which a "
                "multi-process mesh cannot do; use probs_for_meeting_device "
                "+ local_channels (each process postprocesses its own rows)"
            )
        (probs_dev, ts), durations = self.probs_for_meeting_device(
            audio_paths, channel=channel
        )
        if probs_dev is None:
            return [np.zeros(0, dtype=np.float32) for _ in ts], durations
        host = np.asarray(probs_dev)
        return [host[i, : ts[i]] for i in range(len(ts))], durations

    def probs_for_meeting_device(
        self, audio_paths: Sequence[str], channel: int = 0
    ):
        """Like :meth:`probs_for_meeting` but probabilities stay on device:
        returns ((probs [C, t_max] | None, frame counts), durations) for
        per-channel on-device smoothing."""
        from laughter_detection_icsi_tpu.data import audio as audio_io
        from laughter_detection_icsi_tpu.runtime import native

        from laughter_detection_icsi_tpu.inference import int16_transfer_eligible

        if not audio_paths:
            # Mirror probs_for_waveforms_device([]) — the all(...) below is
            # vacuously true and ThreadPoolExecutor(max_workers=0) raises.
            return (None, []), []
        metas = [audio_io.info(p) for p in audio_paths]
        for p, m in zip(audio_paths, metas):
            if m.sample_rate != self.feat_cfg.sampling_rate:
                # Same guard as LaughterPipeline.probs_for_file: a stray
                # non-16k file in a sweep would otherwise silently corrupt
                # its channel's probabilities (fps adapts, so the TextGrid
                # timestamps still LOOK right).
                raise ValueError(
                    f"{p}: sample rate {m.sample_rate} != featurizer rate "
                    f"{self.feat_cfg.sampling_rate}"
                )
        int16_in = all(int16_transfer_eligible(m, self.settings) for m in metas)
        # Multi-host: this process decodes ONLY its channel block.  Header
        # parses above were global (cheap) — the frame counts they yield are
        # program shape, identical on every process; the decode below is the
        # expensive part and scales 1/num_processes per host.
        c = len(audio_paths)
        mine = self.local_channel_indices(c)
        my_paths = [audio_paths[r] for r in mine]
        my_metas = [metas[r] for r in mine]

        if int16_in:
            # 16-bit sources (incl. decoded shorten) ship to the device raw
            # (half the transfer bytes, scaled on device — same numerics).
            # Channels decode concurrently: the native decoder releases the
            # GIL inside the ctypes call, so a thread pool parallelizes a
            # meeting's host decode like native.read_batch's pthread pool.
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                max_workers=min(8, max(1, len(my_paths)))
            ) as ex:
                decoded = list(
                    ex.map(
                        # Pass the parsed meta: the eligibility check above
                        # already paid the header parse per file.
                        lambda pm: audio_io.read_int16(
                            pm[0], channel=channel, meta=pm[1]
                        ),
                        zip(my_paths, my_metas),
                    )
                )
        elif my_paths:
            decoded = native.read_batch(
                my_paths, channels=[channel] * len(my_paths)
            )
        else:
            decoded = []
        # Global frame counts / durations from the headers (identical on
        # every process); decoded waves fill only this process's rows.
        ts = [host_prep.num_frames(m.num_samples, self.feat_cfg) for m in metas]
        durations = [m.duration for m in metas]
        dtype = np.int16 if int16_in else np.float32
        padded_list: List = [None] * c
        for r, (w, _sr) in zip(mine, decoded):
            p, t = host_pad_waveform(np.asarray(w).astype(dtype), self.feat_cfg)
            if t != ts[r]:
                raise RuntimeError(
                    f"{audio_paths[r]}: decoded frame count {t} != header-"
                    f"derived {ts[r]} (truncated file or header mismatch?)"
                )
            padded_list[r] = p
        probs = self._probs_padded_device(padded_list, ts, int16_in)
        return (probs, ts), durations


class ShardedStreamingSession(_StreamingBase):
    """Online (streaming) inference for a LIVE multi-channel meeting over
    the mesh.

    Feed synchronized PCM chunks — one array per channel, equal lengths,
    like a meeting's microphones capture — and per-channel probabilities
    come back as each shape bucket completes, computed as ONE channel-
    sharded bucket batch (the same graphs as offline
    :meth:`ShardedPipeline.probs_for_waveforms`; zero extra compilations).
    Emitted sequences are bit-identical to the offline batch on the
    concatenated audio (pinned by tests).  All stream semantics (dtype
    mixing, left/right reflection pads, eager full-validity buckets,
    short-stream delegation) are the single-channel
    ``inference.StreamingSession``'s — one shared state machine
    (inference._StreamingBase), so the two can never drift.
    """

    def __init__(self, pipeline: ShardedPipeline, n_channels: int):
        if pipeline._multi:
            # The streaming state machine holds per-channel host buffers for
            # ALL channels; multi-host live serving would need a local-feed
            # session (each host buffering only its channels).  Batch sweeps
            # (probs_for_meeting_device) are the multi-host path today.
            raise NotImplementedError(
                "ShardedStreamingSession is single-process; run live "
                "serving on one host's mesh, or use the batched "
                "probs_for_meeting_device across hosts"
            )
        super().__init__(pipeline, n_streams=n_channels)

    @property
    def n_channels(self) -> int:
        return self.n_streams

    def _execute(self, buf_slices: List[np.ndarray], valid: int) -> np.ndarray:
        pipe = self._pipe
        c_pad = -(-self.n_streams // pipe.n_shards) * pipe.n_shards
        c_local = c_pad // pipe.n_shards
        int16_in = self._dtype == np.int16
        wave_len = pipe._graphs(int16_in, c_local)[2]
        batch = np.zeros((c_pad, wave_len), dtype=self._dtype)
        valids = np.zeros(c_pad, dtype=np.int32)
        for i, sl in enumerate(buf_slices):
            src = sl[:wave_len]
            batch[i, : len(src)] = src
            valids[i] = valid
        probs = pipe._bucket_probs_batch(batch, valids, c_local)
        return np.asarray(probs[: self.n_streams])

    def _delegate_short(self, heads: List[np.ndarray]) -> np.ndarray:
        out = self._pipe.probs_for_waveforms(heads)
        t = max((len(o) for o in out), default=0)
        res = np.zeros((self.n_streams, t), dtype=np.float32)
        for i, o in enumerate(out):
            res[i, : len(o)] = o
        return res

    def feed(self, chunks: Sequence[np.ndarray]) -> np.ndarray:
        """Add one synchronized chunk per channel; returns a
        [n_channels, k] array of newly-final frame probabilities (k may be
        0)."""
        return self._feed_impl(chunks)

    def finish(self) -> np.ndarray:
        """End of stream: apply the final reflection padding and flush."""
        return self._finish_impl()

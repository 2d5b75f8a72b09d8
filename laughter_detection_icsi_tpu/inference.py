"""End-to-end laughter inference: PCM -> fbank -> windows -> model -> probs.

The reference runs this as four host-side stages (reference
segment_laughter.py:79-122: Lhotse CPU featurization, a torch Dataset emitting
one 100-frame window per output frame, a size-32 DataLoader loop with a
host->device copy per batch, then Python post-processing).  Here it is two
jitted XLA graphs per size bucket (featurize; classify-one-chunk): the
waveform is uploaded once, features never leave HBM, windows are gathered on
device in chunks of thousands, and only the [T] probability vector returns to
host (BASELINE.json north_star).

Framing parity: the Kaldi snip_edges=False reflection padding is applied on
HOST to the exact sample count (ops/fbank.py pad_amounts), then the graph
frames with simple strides — this keeps the jit shape bucketable (pad with
zeros to the bucket; frames past the true frame count are masked to zero,
matching the reference InferenceDataset's zero-pad tail, datasets.py:85-93).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from laughter_detection_icsi_tpu import host_prep
from laughter_detection_icsi_tpu.config import FEAT, FeatConfig
from laughter_detection_icsi_tpu.data import audio as audio_io
from laughter_detection_icsi_tpu.models.zoo import Model
from laughter_detection_icsi_tpu.ops import fbank as fbank_ops
from laughter_detection_icsi_tpu.ops import smoothing, windows


@dataclasses.dataclass(frozen=True)
class InferenceSettings:
    window: int = 100  # frames per model input (config.FEAT.num_samples)
    # Measured sweet spot on TPU v5e (shared-stem mode): one chunk per
    # bucket at ~6k windows — larger buckets push the whole-track stems
    # past an XLA tiling cliff, smaller chunks underfill the MXU.
    chunk: int = 6144  # windows evaluated per device step
    bucket_frames: int = 6144  # frames per streamed shape bucket (~61 s)
    precision: str = "float32"  # 'float32' | 'bfloat16' (bf16: MXU fast path)
    # Ship PCM to the device as int16 and scale by 1/32768 on device —
    # numerically identical to decoding on host (16-bit sources) at half the
    # host->device bytes; transfer bandwidth dominates on tunneled chips.
    transfer_int16: bool = True
    # 'packed' — bit-pack int16 PCM on host (per-block delta coding,
    #            ops/pcm_pack.py) and decode inside the featurize graph:
    #            typically 1.5-3x fewer host->device bytes on speech,
    #            bit-exact.  'raw' — plain int16/float32 upload.
    # 'auto'   — pack whenever it saves >= 10% wire bytes for the bucket.
    # Default 'raw': links that compress transparently (e.g. tunneled dev
    # chips — measured: raw PCM moves ~1.9x faster per byte than the
    # incompressible packed stream, erasing the codec's byte savings) are
    # better served by raw uploads; opt into 'auto'/'packed' on direct
    # PCIe/DCN-attached hosts where wire bytes are wire bytes.
    transfer_codec: str = "raw"
    # None = auto: the fused Pallas featurizer on TPU (ops/fbank_pallas.py),
    # the XLA featurizer elsewhere.  Both match to ~2e-5.
    use_pallas_fbank: Optional[bool] = None
    # Shared-stem windows mode (models/shared_stem.py): compute the stride-1
    # stem once per track and recompute only the 5 zero-pad-contaminated
    # rows per window edge — per-window-exact numerics (bit-identical on
    # CPU, pinned by tests) at ~4.5x fewer FLOPs.  None = auto (on for the
    # ResNet family); False forces the naive window batch.
    shared_stem: Optional[bool] = None
    # 'windows'    — reference-exact: the conv stack runs per 100-frame
    #                window (checkpoint parity).
    # 'fused_conv' — à-trous fast path: the conv stack runs ONCE over the
    #                whole track (~150x fewer FLOPs; models/fully_conv.py).
    #                Better-posed (windows see real context, not synthetic
    #                zeros) but NOT bit-parity with the reference.
    mode: str = "windows"

    def __post_init__(self):
        for name in ("chunk", "bucket_frames", "window"):
            v = getattr(self, name)
            if v < 1:
                # 0/negatives would crash far away with opaque errors (a
                # negative jnp.pad inside the jitted featurize, an empty
                # bucket range -> pieces[0] IndexError) — after the model
                # already loaded.
                raise ValueError(f"{name} must be >= 1, got {v}")
        if self.precision not in ("float32", "bfloat16"):
            raise ValueError(f"unknown precision {self.precision!r}")
        if self.mode not in ("windows", "fused_conv"):
            raise ValueError(f"unknown mode {self.mode!r}")
        if self.transfer_codec not in ("auto", "raw", "packed"):
            raise ValueError(f"unknown transfer_codec {self.transfer_codec!r}")
        if self.transfer_codec == "packed" and self.mode == "fused_conv":
            raise ValueError(
                "transfer_codec='packed' is not implemented for "
                "mode='fused_conv' (the whole-track graph has no packed "
                "decode stage); use 'raw', or the 'windows' mode"
            )


# The halo formula and its snip twin live in the jax-free host_prep module
# now (exported-artifact hosts need them without jax); these aliases keep
# every in-repo call site and import path working.
_snip_cfg = host_prep.snip_cfg
bucket_wave_len = host_prep.bucket_wave_len


def settings_from_flags(
    chunk: Optional[int] = None,
    bucket_frames: Optional[int] = None,
    precision: Optional[str] = None,
    cpu_chunk: int = 1024,
    cpu_bucket_frames: int = 1024,
    **kwargs,
) -> "InferenceSettings":
    """THE shared CLI defaults block (segment_laughter / sweep / serve /
    parity): accelerator probe + per-flag defaulting.

    The CLIs used to copy-paste these eight lines and their CPU defaults
    drifted (bucket_frames 6144 vs 1024, chunk 1024 vs 512) — the same
    pipeline compiled different graph shapes depending on which CLI
    launched it.  ``is not None``, not ``or``: an explicit 0 must reach
    InferenceSettings' validation and fail loudly, not be silently
    swapped for the default.  ``cpu_chunk`` stays overridable for
    latency-sensitive callers (serve uses 512).
    """
    on_accel = jax.devices()[0].platform != "cpu"
    return InferenceSettings(
        chunk=chunk if chunk is not None else (6144 if on_accel else cpu_chunk),
        bucket_frames=(
            bucket_frames
            if bucket_frames is not None
            else (6144 if on_accel else cpu_bucket_frames)
        ),
        precision=(
            precision
            if precision is not None
            else ("bfloat16" if on_accel else "float32")
        ),
        **kwargs,
    )


def cast_tree_bf16(tree):
    """Cast a params/state tree's float leaves to bfloat16.

    Shared by LaughterPipeline and parallel.ShardedPipeline: both params
    AND state (BN running stats) must drop to bf16 or the first BN
    re-promotes activations to f32 and the next conv sees mixed dtypes.
    """
    # result_type, not jnp.asarray(x).dtype: the probe must not device-put
    # every leaf (host-resident numpy trees — e.g. export's — stay host).
    cast = lambda x: (
        x.astype(jnp.bfloat16)
        if jnp.issubdtype(jnp.result_type(x), jnp.floating)
        else x
    )
    return jax.tree_util.tree_map(cast, tree)


def int16_transfer_eligible(meta, settings) -> bool:
    """One predicate for 'may this source ship to the device as raw int16'
    (16-bit PCM or decoded shorten; halves the bytes, scaled on device with
    identical numerics).  Both pipelines consult it, so they can never
    disagree on the transfer path for the same file."""
    return (
        settings.transfer_int16
        and meta.encoding in ("pcm", "shorten")
        and meta.sample_bytes == 2
    )


host_pad_waveform = host_prep.host_pad_waveform


class LaughterPipeline:
    """Jitted featurize+classify pipeline for one model checkpoint."""

    def __init__(
        self,
        model: Model,
        params,
        state,
        feat_cfg: FeatConfig = FEAT,
        settings: InferenceSettings = InferenceSettings(),
    ):
        self.model = model
        self.feat_cfg = feat_cfg
        self.settings = settings
        if settings.precision == "bfloat16":
            self.params = cast_tree_bf16(params)
            self.state = cast_tree_bf16(state)
        else:
            self.params = params
            self.state = state
        # Heterogeneous cache: bool key -> (featurize, chunk_probs,
        # wave_len) graph tuples; 'body' -> (featurize_body, wave_len);
        # 'chunk_probs' -> the dtype-shared jitted closure; ('pk', ...) /
        # ('fc', ...) tuple keys -> jitted callables.
        self._jitted: Dict[Any, Any] = {}

    # ------------------------------------------------------------------ #

    def _window_fn(self):
        params, state, model = self.params, self.state, self.model
        compute_dtype = (
            jnp.bfloat16 if self.settings.precision == "bfloat16" else jnp.float32
        )

        def fn(wins: jnp.ndarray) -> jnp.ndarray:
            x = wins.astype(compute_dtype)[:, None, :, :]  # [B, 1, W, F]
            probs, _ = model.apply(params, state, x, train=False)
            return probs.astype(jnp.float32)

        return fn

    def _use_shared_stem(self) -> bool:
        from laughter_detection_icsi_tpu.models import shared_stem

        return shared_stem.resolve_shared_stem(
            self.settings.shared_stem, self.model.name, self.settings.window
        )

    def _graphs(self, int16_in: bool = False):
        """Two jitted graphs, shared by every input length.

        featurize: one bucket's wave slice -> masked features for the
        bucket's frames PLUS a window-1 halo (windows near the bucket end
        read into the next bucket's frames; recomputing the halo keeps
        buckets independent with EXACT semantics — frames are pure functions
        of sample offsets once the wave is padded).
        chunk_probs: (feats, start) -> probs for ``chunk`` windows; ``start``
        is a traced scalar so ONE compilation serves every chunk position.

        The chunk loop runs on host rather than as an in-graph ``lax.scan``:
        scanning over the conv-net body makes XLA compile pathologically
        slowly (~60x the standalone model compile, measured on CPU), and a
        handful of large dispatches per bucket costs nothing next to the
        model FLOPs.
        """
        if int16_in in self._jitted:
            return self._jitted[int16_in]
        cfg = _snip_cfg(self.feat_cfg)
        bucket = self.settings.bucket_frames
        window = self.settings.window
        chunk = self.settings.chunk
        ext = bucket + window - 1  # frames computed per bucket (with halo)
        wave_len = bucket_wave_len(self.settings, self.feat_cfg)
        n_chunks = -(-bucket // chunk)
        # Enough rows that the last window of the last chunk reads in bounds
        # (mirrors the reference InferenceDataset zero-pad, datasets.py:85-92).
        feat_rows = n_chunks * chunk + window - 1
        window_fn = self._window_fn()

        from laughter_detection_icsi_tpu.ops.fbank_pallas import resolve_use_pallas

        use_pallas = resolve_use_pallas(self.settings.use_pallas_fbank)
        use_shared = self._use_shared_stem()
        params, state = self.params, self.state
        compute_dtype = (
            jnp.bfloat16 if self.settings.precision == "bfloat16" else jnp.float32
        )

        def featurize_body(wave: jnp.ndarray, valid_frames: jnp.ndarray):
            """wave: float32 [wave_len] in [-1, 1] -> bucket features
            (+ shared-stem tracks); shared by every transfer codec."""
            if use_pallas:
                from laughter_detection_icsi_tpu.ops.fbank_pallas import fbank_pallas

                feats = fbank_pallas(wave, cfg)  # [ext, F]
            else:
                feats = fbank_ops.fbank(wave, cfg)
            mask = jnp.arange(ext) < valid_frames
            feats = jnp.where(mask[:, None], feats, 0.0)
            feats = jnp.pad(feats, ((0, feat_rows - ext), (0, 0)))
            if use_shared:
                from laughter_detection_icsi_tpu.models import shared_stem

                feats = feats.astype(compute_dtype)
                # Stems once per bucket; chunks read interior rows from them.
                track1 = shared_stem.stem_track(params, state, feats)
                if shared_stem.supports_track2(window):
                    track2 = shared_stem.stem_track2(params, state, track1)
                    return feats, track1, track2
                return feats, track1
            return feats

        self._jitted["body"] = (featurize_body, wave_len)

        @jax.jit
        def featurize(wave: jnp.ndarray, valid_frames: jnp.ndarray):
            if int16_in:
                wave = wave.astype(jnp.float32) * (1.0 / 32768.0)
            return featurize_body(wave, valid_frames)

        if "chunk_probs" in self._jitted:
            # chunk_probs is dtype-INdependent (the int16 scaling lives in
            # featurize): share one jitted closure across the int16/float
            # graph keys, or a pipeline that sees both input dtypes (e.g. a
            # mixed PCM/ulaw directory) re-traces the whole conv net — the
            # expensive compile — a second time for an identical graph.
            chunk_probs = self._jitted["chunk_probs"]
        elif use_shared:

            @jax.jit
            def chunk_probs(feats_tracks, start: jnp.ndarray) -> jnp.ndarray:
                from laughter_detection_icsi_tpu.models import shared_stem

                if len(feats_tracks) == 3:
                    feats, track1, track2 = feats_tracks
                    probs = shared_stem.chunk_probs_from_track2(
                        params, state, track1, track2, feats, start, chunk, window
                    )
                else:
                    feats, track1 = feats_tracks
                    probs = shared_stem.chunk_probs_from_track(
                        params, state, track1, feats, start, chunk, window
                    )
                return probs.astype(jnp.float32)

        else:

            @jax.jit
            def chunk_probs(feats: jnp.ndarray, start: jnp.ndarray) -> jnp.ndarray:
                wins = windows.extract_windows(feats, start, chunk, window)
                return window_fn(wins)

        self._jitted["chunk_probs"] = chunk_probs
        graphs = (featurize, chunk_probs, wave_len)
        self._jitted[int16_in] = graphs
        return graphs

    def _packed_featurize(self, wire_len: int, n_blocks: int, delta: bool):
        """Featurize a bit-packed bucket (ops/pcm_pack.py): ONE uploaded
        wire buffer (width table + word stream — each transfer pays fixed
        link latency, so never two) decodes to the bucket's int16 samples
        ON DEVICE, then runs the shared featurize body.  One compilation
        per (padded wire length, delta flag) — word streams are padded to
        WORD_PAD multiples so a handful of compilations serve arbitrary
        audio."""
        # n_blocks is baked into the closure (split_wire's width-table
        # offset), so it MUST be part of the key: padding wires to WORD_PAD
        # multiples means two different buffer lengths can share a padded
        # wire_len with different n_blocks.
        key = ("pk", wire_len, n_blocks, delta)
        if key in self._jitted:
            return self._jitted[key]
        featurize_body, wave_len = self._jitted["body"]
        from laughter_detection_icsi_tpu.ops import pcm_pack

        @jax.jit
        def featurize_packed(wire, valid_frames):
            widths, words = pcm_pack.split_wire(wire, n_blocks)
            vals = pcm_pack.unpack_pcm(words, widths, n=wave_len, delta=delta)
            wave = vals.astype(jnp.float32) * (1.0 / 32768.0)
            # Materialize the decoded wave: without the barrier XLA fuses
            # the decode (gathers + cumsum) into the fbank framing, which
            # reads every sample ~2.5x (frame 400 / shift 160) and would
            # re-decode per read (~5x featurize cost, measured).
            wave = jax.lax.optimization_barrier(wave)
            return featurize_body(wave, valid_frames)

        self._jitted[key] = featurize_packed
        return featurize_packed

    def _maybe_pack(self, buf: np.ndarray):
        """Pack a bucket buffer for transfer when the codec settings say so
        and it actually shrinks the wire bytes; returns a PackedPCM or
        None (= upload ``buf`` raw)."""
        codec = self.settings.transfer_codec
        if codec == "raw":
            return None
        if buf.dtype != np.int16:
            if codec == "packed":
                import warnings

                warnings.warn(
                    "transfer_codec='packed' needs int16 PCM input; this "
                    "float waveform uploads raw",
                    stacklevel=3,
                )
            return None
        from laughter_detection_icsi_tpu.ops import pcm_pack

        packed = pcm_pack.pack_pcm(buf)
        if codec == "packed":
            return packed
        return packed if packed.packed_bytes <= 0.9 * packed.raw_bytes else None

    def _fc_graph(self, total_frames: int, int16_in: bool):
        """Fused-conv whole-track graph (mode='fused_conv'): featurize +
        dilated conv stack in one jit; one compile per rounded track size."""
        key = ("fc", total_frames, int16_in)
        if key in self._jitted:
            return self._jitted[key]
        from laughter_detection_icsi_tpu.models.fully_conv import (
            fully_conv_probs_blocked,
        )

        cfg = _snip_cfg(self.feat_cfg)
        shift = cfg.frame_shift_samples
        flen = cfg.frame_length_samples
        wave_len = (total_frames - 1) * shift + flen
        params, state = self.params, self.state
        compute_dtype = (
            jnp.bfloat16 if self.settings.precision == "bfloat16" else jnp.float32
        )
        from laughter_detection_icsi_tpu.ops.fbank_pallas import resolve_use_pallas

        use_pallas = resolve_use_pallas(self.settings.use_pallas_fbank)

        @jax.jit
        def graph(wave: jnp.ndarray, valid_frames: jnp.ndarray) -> jnp.ndarray:
            if int16_in:
                wave = wave.astype(jnp.float32) * (1.0 / 32768.0)
            if use_pallas:
                from laughter_detection_icsi_tpu.ops.fbank_pallas import fbank_pallas

                feats = fbank_pallas(wave, cfg)
            else:
                feats = fbank_ops.fbank(wave, cfg)
            mask = jnp.arange(total_frames) < valid_frames
            feats = jnp.where(mask[:, None], feats, 0.0).astype(compute_dtype)
            return fully_conv_probs_blocked(
                params, state, feats, window=self.settings.window
            ).astype(jnp.float32)

        graphs = (graph, wave_len)
        self._jitted[key] = graphs
        return graphs

    def _probs_fused_conv_device(self, padded: np.ndarray, t: int) -> jnp.ndarray:
        bucket = self.settings.bucket_frames
        total = max(bucket, -(-t // bucket) * bucket)
        graph, wave_len = self._fc_graph(total, padded.dtype == np.int16)
        buf = np.zeros(wave_len, dtype=padded.dtype)
        buf[: len(padded)] = padded
        probs = graph(jnp.asarray(buf), jnp.asarray(t, jnp.int32))
        return probs[:t]

    # ------------------------------------------------------------------ #

    def _bucket_probs(self, buf: np.ndarray, valid: int) -> jnp.ndarray:
        """One bucket buffer (already wave_len-sized, int16 or float32) ->
        its [bucket + extra] device probabilities.  The ONE bucket
        execution body — the offline loop and StreamingSession both run
        through it, which is what keeps streaming bit-exact vs offline."""
        int16_in = buf.dtype == np.int16
        featurize, chunk_probs, _wave_len = self._graphs(int16_in)
        packed = self._maybe_pack(buf)
        if packed is not None:
            wire = packed.wire()
            featurize_pk = self._packed_featurize(
                len(wire), len(packed.widths), packed.delta
            )
            feats = featurize_pk(jnp.asarray(wire), jnp.asarray(valid, jnp.int32))
        else:
            feats = featurize(jnp.asarray(buf), jnp.asarray(valid, jnp.int32))
        chunk = self.settings.chunk
        n_chunks = -(-self.settings.bucket_frames // chunk)
        outs = [
            chunk_probs(feats, jnp.asarray(i * chunk, dtype=jnp.int32))
            for i in range(n_chunks)
        ]
        return jnp.concatenate(outs)

    def probs_for_waveform(self, wave: np.ndarray) -> np.ndarray:
        """[n] waveform -> [T] laughter probabilities (T = one per 10 ms
        frame, ≈100 fps — reference segment_laughter.py:103-105).

        Accepts float32 in [-1, 1] or raw int16 PCM; int16 ships to the
        device as-is (half the transfer bytes) and is scaled on device —
        bit-identical features to the host-scaled float path.  Arbitrary
        lengths stream through fixed-size buckets (one compiled shape).
        """
        # One device->host transfer for the whole waveform — transfers carry
        # fixed latency (hundreds of ms through a tunneled chip).
        return np.asarray(self.probs_for_waveform_device(wave))

    def probs_for_waveform_device(self, wave: np.ndarray) -> jnp.ndarray:
        """Like :meth:`probs_for_waveform` but the [T] probabilities STAY on
        device — feed them to on-device smoothing
        (ops/smoothing.instances_from_device_probs) so only tiny run tables
        ever cross back to host."""
        wave = np.asarray(wave)
        if wave.ndim != 1:
            # The other half of the streaming contract: 2-D input would
            # either return empty probs (channel-major: len == n_channels)
            # or crash in np.pad with an opaque broadcast error.
            raise ValueError(
                f"probs_for_waveform wants 1-D PCM, got shape {wave.shape}; "
                "pass one channel (or use parallel.ShardedPipeline for "
                "multichannel batches)"
            )
        if wave.dtype not in (np.int16, np.float32, np.float64):
            # Same contract as the streaming path (_StreamingBase._append):
            # silently casting e.g. int32 PCM would feed +-30000-range
            # values to a featurizer expecting [-1, 1].
            raise TypeError(
                f"unsupported PCM dtype {wave.dtype}; pass int16 or "
                "float32/float64 in [-1, 1]"
            )
        int16_in = wave.dtype == np.int16
        if not int16_in:
            wave = wave.astype(np.float32)
        padded, t = host_pad_waveform(wave, self.feat_cfg)
        if t == 0:
            return jnp.zeros(0, dtype=jnp.float32)
        if self.settings.mode == "fused_conv":
            return self._probs_fused_conv_device(padded, t)
        pieces = []
        for buf, valid, keep in self.bucket_buffers(padded, t):
            probs = self._bucket_probs(buf, valid)
            pieces.append(probs[:keep])
        return jnp.concatenate(pieces) if len(pieces) > 1 else pieces[0]

    def bucket_buffers(self, padded: np.ndarray, t: int):
        """Yield ``(buf, valid_frames, keep_frames)`` per bucket — the exact
        fixed-size buffers, valid-frame counts and kept-frame counts the
        windows-mode offline loop executes.  The single source of the bucket
        plan: :meth:`probs_for_waveform_device` runs it, and bench.py's
        device-side decomposition iterates the same generator, so the
        decomposition can never desynchronize from the measured path."""
        wave_len = self._graphs(padded.dtype == np.int16)[2]
        bucket = self.settings.bucket_frames
        shift = _snip_cfg(self.feat_cfg).frame_shift_samples
        for k in range(-(-t // bucket)):
            lo = k * bucket * shift
            buf = np.zeros(wave_len, dtype=padded.dtype)
            src = padded[lo : lo + wave_len]
            buf[: len(src)] = src
            valid = min(t - k * bucket, bucket + self.settings.window - 1)
            yield buf, valid, min(bucket, t - k * bucket)

    def probs_for_file(
        self, audio_path: str, channel: int = 0, device: bool = False
    ) -> "Tuple[np.ndarray | jnp.ndarray, float]":
        """Returns (probs [T], audio_duration_s).  16-bit PCM sources ship
        to the device as raw int16 (half the bytes, identical numerics).
        ``device=True`` leaves the probabilities on device (for on-device
        smoothing)."""
        meta = audio_io.info(audio_path)
        if meta.sample_rate != self.feat_cfg.sampling_rate:
            # Featurizing 44.1 kHz samples with 16 kHz Kaldi geometry yields
            # meaningless probabilities whose timestamps still LOOK right
            # (fps adapts); every sibling reader guards this (cli/serve.py,
            # data/feature_cache.py) — so must the public pipeline entry.
            raise ValueError(
                f"{audio_path}: sample rate {meta.sample_rate} != featurizer "
                f"rate {self.feat_cfg.sampling_rate}"
            )
        if int16_transfer_eligible(meta, self.settings):
            wave, _sr = audio_io.read_int16(audio_path, channel=channel)
        else:
            wave, _sr = audio_io.read(audio_path, channel=channel)
        probs = self.probs_for_waveform_device(wave)
        return (probs if device else np.asarray(probs)), meta.duration

    # ------------------------------------------------------------------ #

    def segment_file(
        self,
        audio_path: str,
        thresholds: Sequence[float] = (0.5,),
        min_lengths: Sequence[float] = (0.2,),
        channel: int = 0,
    ) -> Tuple[Dict[Tuple[float, float], List[Tuple[float, float]]], float]:
        """Full reference load_and_pred equivalent
        (reference segment_laughter.py:79-122): probs -> threshold x
        min_length sweep -> instance dict.  Returns (instances, seconds_taken).

        The sweep runs ON DEVICE (BASELINE.json north_star): probabilities
        never leave HBM — only [K, max_events] run tables do — and the
        result is exactly the host scan's (ops/smoothing.py)."""
        t0 = time.perf_counter()
        probs_dev, duration = self.probs_for_file(
            audio_path, channel=channel, device=True
        )
        fps = probs_dev.shape[0] / float(duration) if duration > 0 else 100.0
        instances = smoothing.instances_from_device_probs(
            probs_dev, thresholds=thresholds, min_lengths=min_lengths, fps=fps
        )
        return instances, time.perf_counter() - t0


class _StreamingBase:
    """Shared state machine for online (streaming) inference sessions.

    Owns everything both the single-stream and the mesh-sharded session
    need to agree on for the documented streaming==offline bit-exactness:
    per-chunk dtype validation/normalization (int16 into a float stream
    scales exactly like the offline mixed path), the constant left
    reflection pad applied once a full frame exists (shorter streams have
    truncated-reflection padding only the offline path reproduces, so
    :meth:`finish` delegates them), the eager full-validity bucket loop
    (a bucket runs only once every sample its windows + halo read is
    final), memory bounding, and the end-of-stream reflection + flush.
    Subclasses provide only the bucket executor, the short-stream
    delegate, and output shaping.
    """

    def __init__(self, pipeline, n_streams: int):
        if pipeline.settings.mode != "windows":
            raise ValueError(f"{type(self).__name__} requires mode='windows'")
        if pipeline.feat_cfg.snip_edges:
            # Same contract as the offline path (host_pad_waveform): the
            # streaming left/right reflection pads implement
            # snip_edges=False framing; silently applying them under a
            # snip_edges=True cfg would shift every frame.
            raise ValueError(
                f"{type(self).__name__} implements snip_edges=False "
                "framing; a snip_edges=True FeatConfig must not reach it"
            )
        if n_streams < 1:
            raise ValueError("need at least one stream")
        self._pipe = pipeline
        self._cfg = _snip_cfg(pipeline.feat_cfg)
        self.n_streams = n_streams
        self._raw_head: "Optional[List[List[np.ndarray]]]" = [
            [] for _ in range(n_streams)
        ]
        self._bufs: List[np.ndarray] = []
        # Chunks appended since the last consolidation: feed() is O(chunk)
        # (list append); the buffer materializes only when a bucket executes
        # or trims — not on every feed of a long-lived live stream.
        self._pending: List[List[np.ndarray]] = [[] for _ in range(n_streams)]
        self._total = 0  # padded samples known so far (incl. consumed ones)
        self._consumed = 0  # padded samples dropped from the buffers' front
        self._n = 0  # raw samples seen per stream
        self._bucket_idx = 0
        self._dtype: Optional[np.dtype] = None
        self._finished = False

    # ---- subclass hooks ---------------------------------------------- #

    def _execute(self, buf_slices: List[np.ndarray], valid: int) -> np.ndarray:
        """[n_streams] bucket buffers -> [n_streams, bucket+extra] probs."""
        raise NotImplementedError

    def _delegate_short(self, heads: List[np.ndarray]):
        """Whole-stream fallback for streams shorter than one frame."""
        raise NotImplementedError

    def _empty(self) -> np.ndarray:
        return np.zeros((self.n_streams, 0), dtype=np.float32)

    # ---- shared machinery -------------------------------------------- #

    @property
    def _left_pad(self) -> int:
        # Kaldi's per-term truncation, matching fbank.pad_amounts exactly
        # ((flen - shift)//2 is one sample short for even-flen/odd-shift).
        cfg = self._cfg
        return cfg.frame_length_samples // 2 - cfg.frame_shift_samples // 2

    def _wave_len(self) -> int:
        # The ONE halo formula, shared with the compiled graphs — see
        # bucket_wave_len's contract note.
        return bucket_wave_len(self._pipe.settings, self._pipe.feat_cfg)

    def _append(self, chunks: Sequence[np.ndarray]) -> None:
        if len(chunks) != self.n_streams:
            raise ValueError(
                f"expected {self.n_streams} channel chunks, got {len(chunks)}"
            )
        chunks = [np.asarray(c) for c in chunks]
        for c in chunks:
            if c.ndim != 1:
                raise ValueError("feed() wants 1-D PCM chunks")
            if len(c) and c.dtype not in (np.int16, np.float32, np.float64):
                raise TypeError(f"unsupported PCM dtype {c.dtype}")
        n = len(chunks[0])
        if any(len(c) != n for c in chunks):
            raise ValueError("channel chunks must have equal lengths")
        if self._dtype is None and n:
            self._dtype = np.dtype(
                np.int16 if all(c.dtype == np.int16 for c in chunks) else np.float32
            )
        if n:
            conv = []
            for c in chunks:
                if c.dtype == self._dtype:
                    # COPY: chunks are retained (pending lists / head) until
                    # a bucket executes, and callers legitimately reuse one
                    # capture buffer per feed (the standard audio-callback
                    # pattern) — aliasing it would silently corrupt every
                    # buffered chunk.  The conversion branches below copy
                    # implicitly (astype).
                    conv.append(np.array(c, copy=True))
                elif self._dtype == np.float32 and c.dtype == np.int16:
                    # Int16 into a float stream: scale like the offline
                    # mixed path (parallel/sharded_inference.py) — exact.
                    conv.append(c.astype(np.float32) / 32768.0)
                elif self._dtype == np.float32:
                    conv.append(c.astype(np.float32))
                else:
                    raise TypeError(
                        "cannot mix float chunks into an int16 stream "
                        "(floats are not exactly representable as int16)"
                    )
            chunks = conv
        self._n += n
        if self._raw_head is not None:
            for i, c in enumerate(chunks):
                if len(c):
                    self._raw_head[i].append(c)
            heads = self._heads()
            if len(heads[0]) < self._cfg.frame_length_samples:
                return
            self._raw_head = None
            self._bufs = [
                np.concatenate([h[: self._left_pad][::-1], h]) for h in heads
            ]
            self._total = len(self._bufs[0])
            return
        if n:
            for i, c in enumerate(chunks):
                self._pending[i].append(c)
            self._total += n

    def _consolidate(self) -> None:
        """Materialize pending chunks into the contiguous buffers (called
        only when a bucket is about to execute or trim, keeping feed()
        itself O(chunk))."""
        if self._pending[0]:
            self._bufs = [
                np.concatenate([b, *p]) for b, p in zip(self._bufs, self._pending)
            ]
            self._pending = [[] for _ in range(self.n_streams)]

    def _heads(self) -> List[np.ndarray]:
        dtype = self._dtype or np.float32
        return [
            np.concatenate(parts) if (parts := [p for p in h if len(p)])
            else np.zeros(0, dtype=dtype)
            for h in self._raw_head
        ]

    def _slices(self, lo: int, wave_len: int) -> List[np.ndarray]:
        o = lo - self._consumed
        return [b[o : o + wave_len] for b in self._bufs]

    def _feed_impl(self, chunks: Sequence[np.ndarray]) -> np.ndarray:
        if self._finished:
            raise RuntimeError("stream already finished")
        self._append(chunks)
        if self._raw_head is not None:
            return self._empty()
        s = self._pipe.settings
        shift = self._cfg.frame_shift_samples
        bucket = s.bucket_frames
        wave_len = self._wave_len()
        pieces = []
        while True:
            lo = self._bucket_idx * bucket * shift
            if self._total < lo + wave_len:
                break
            self._consolidate()
            # Every halo sample is final -> full-validity bucket, exactly
            # the offline path's non-final buckets.
            probs = self._execute(
                self._slices(lo, wave_len), bucket + s.window - 1
            )
            pieces.append(probs[:, :bucket])
            self._bucket_idx += 1
            # Bound memory: drop consumed samples, keeping what later
            # buckets and the final reflection pad still need.
            new_lo = self._bucket_idx * bucket * shift
            drop = new_lo - self._consumed
            if drop > 0:
                self._bufs = [b[drop:] for b in self._bufs]
                self._consumed = new_lo
        return np.concatenate(pieces, axis=1) if pieces else self._empty()

    def _finish_impl(self):
        if self._finished:
            raise RuntimeError("stream already finished")
        self._finished = True
        if self._raw_head is not None:
            # Too short to ever initialize: delegate whole-stream.
            return self._delegate_short(self._heads())
        s = self._pipe.settings
        shift = self._cfg.frame_shift_samples
        t = fbank_ops.num_frames(self._n, self._pipe.feat_cfg)
        _left, right = fbank_ops.pad_amounts(self._n, self._pipe.feat_cfg)
        self._consolidate()
        if right > 0:
            self._bufs = [
                np.concatenate([b, b[len(b) - right :][::-1]]) for b in self._bufs
            ]
            self._total += right
        bucket = s.bucket_frames
        wave_len = self._wave_len()
        pieces = []
        emitted = self._bucket_idx * bucket
        while emitted < t:
            lo = self._bucket_idx * bucket * shift
            valid = min(t - self._bucket_idx * bucket, bucket + s.window - 1)
            probs = self._execute(self._slices(lo, wave_len), valid)
            pieces.append(probs[:, : min(bucket, t - emitted)])
            emitted += bucket
            self._bucket_idx += 1
        return np.concatenate(pieces, axis=1) if pieces else self._empty()


class StreamingSession(_StreamingBase):
    """Online (streaming) inference over one audio stream.

    Feed PCM in arbitrary-size chunks; probabilities come back as soon as
    their shape bucket completes, so a live stream is classified with
    bounded latency (~``bucket_frames`` x 10 ms + compute) and bounded
    memory.  The emitted probability sequence is BIT-IDENTICAL to
    ``pipeline.probs_for_waveform(concatenated_audio)`` (pinned by tests):
    a bucket is evaluated eagerly only once every sample its windows (and
    their halo) read is final, and the end-of-stream reflection padding is
    applied in :meth:`finish`, exactly like the offline path.

    No reference analogue — the reference is strictly offline, one whole
    file at a time (reference segment_laughter.py:79-122).  This is the
    serving-path counterpart of the batch pipeline, sharing its compiled
    graphs (same shape buckets -> zero extra compilations).  The
    multi-channel mesh version is ``parallel.ShardedStreamingSession``.

    Usage::

        sess = StreamingSession(pipeline)
        for chunk in microphone():        # int16 or float32 PCM @ 16 kHz
            probs = sess.feed(chunk)      # [k] newly-final frame probs
        probs_tail = sess.finish()
    """

    def __init__(self, pipeline: LaughterPipeline):
        super().__init__(pipeline, n_streams=1)

    def _execute(self, buf_slices: List[np.ndarray], valid: int) -> np.ndarray:
        pipe = self._pipe
        wave_len = pipe._graphs(self._dtype == np.int16)[2]
        buf = np.zeros(wave_len, dtype=self._dtype)
        src = buf_slices[0][:wave_len]
        buf[: len(src)] = src
        return np.asarray(pipe._bucket_probs(buf, valid))[None, :]

    def _delegate_short(self, heads: List[np.ndarray]) -> np.ndarray:
        return self._pipe.probs_for_waveform(heads[0])

    def feed(self, pcm: np.ndarray) -> np.ndarray:
        """Add a PCM chunk; returns probabilities for every frame that
        became final (possibly empty)."""
        return self._feed_impl([pcm])[0]

    def finish(self) -> np.ndarray:
        """End of stream: apply the final reflection padding and flush the
        remaining frames."""
        out = self._finish_impl()
        return out if out.ndim == 1 else out[0]


def calc_real_time_factor(
    pipeline: LaughterPipeline, audio_path: str, iterations: int = 3, **kwargs
) -> float:
    """Average (prediction time / audio duration)
    (reference segment_laughter.py:178-197)."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    duration = audio_io.get_audio_length(audio_path)
    if duration <= 0.0:
        # segment_file handles zero-duration files (returns empty
        # instances), but a realtime FACTOR of nothing is undefined — raise
        # a clear error instead of ZeroDivisionError.
        raise ValueError(
            f"cannot compute a realtime factor for zero-duration audio "
            f"{audio_path!r}"
        )
    total = 0.0
    for _ in range(iterations):
        _, took = pipeline.segment_file(audio_path, **kwargs)
        total += took
    return (total / iterations) / duration

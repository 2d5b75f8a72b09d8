"""Lossless packed-PCM transfer codec: fewer host->device bytes per second
of audio.

Host->device bandwidth is the end-to-end bottleneck of streamed inference
once the compute graph is fused (HBM never sees features twice, probs are
the only readback) — on PCIe hosts it bounds corpus-scale sweeps, and on
development tunnels it IS the wall clock.  16-bit PCM is highly redundant:
speech is spectrally tilted (adjacent-sample deltas are several bits
narrower than the samples) and close-talk channels are mostly near-silence.
The ICSI corpus itself ships "shorten"-compressed SPHERE files for exactly
this reason (reference data uses NIST SPHERE; our C++ runtime decodes it,
runtime/csrc/audio_decoder.cpp).

This module re-compresses decoded PCM for the wire with a fixed-geometry
scheme an XLA graph can decode with pure vector ops (no entropy coding):

* the waveform is split into blocks of ``BLOCK`` samples;
* per block, samples (or first-order deltas — one global flag, whichever
  is smaller for the buffer) are stored as ``w_b``-bit two's complement,
  where ``w_b`` is the narrowest width that holds every value in block
  ``b`` (``w_b = 0`` for all-zero blocks, e.g. zero-padded tails);
* ``BLOCK`` is a multiple of 32, so every block occupies exactly
  ``BLOCK * w_b / 32`` uint32 words and blocks stay word-aligned — the
  stream is a dense bit-concatenation with no per-block headers.

The device decoder (:func:`unpack_pcm`) is shape-static and fully
vectorized: two gathers into the word stream, per-sample shifts/masks, a
sign-extend, and (in delta mode) one integer ``cumsum`` — O(n) VPU work
that overlaps with the upload it pays for.  Round-trip is bit-exact for
any int16 input (pinned by tests/test_pcm_pack.py).

No analogue exists in the reference — it reads audio from local disk
(librosa/Lhotse, reference load_data.py:44, segment_laughter.py:134) and
never ships PCM across a link.  This is TPU-first design: minimize
host<->device transfer, spend (cheap, overlappable) device vector ops to
do it.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

#: samples per width block.  Must be a multiple of 32 (word alignment).
#: 4096 samples = 256 ms at 16 kHz: short enough that silence / speech /
#: transients land in different blocks, long enough that the width table
#: is negligible (4 bytes per block = 0.05% of raw PCM).
BLOCK = 4096

#: the word stream is zero-padded to a multiple of this many uint32 words
#: (64 KiB) so a jitted decoder serves many buffers from few compilations;
#: on a ~2 MB bucket the padding overhead is <= 3% of the raw PCM.
WORD_PAD = 16384


@dataclasses.dataclass(frozen=True)
class PackedPCM:
    """A bit-packed int16 waveform (see module docstring for the layout)."""

    words: np.ndarray  # uint32 [>= n_words + 1], zero-padded (see WORD_PAD)
    widths: np.ndarray  # int32 [n_blocks]: bits per value in each block
    n: int  # true sample count
    delta: bool  # values are first-order deltas (d[0] = x[0])

    @property
    def packed_bytes(self) -> int:
        """Wire bytes: padded word stream + width table."""
        return self.words.nbytes + self.widths.nbytes

    @property
    def raw_bytes(self) -> int:
        return 2 * self.n

    def wire(self) -> np.ndarray:
        """One contiguous uint32 buffer for a SINGLE host->device transfer
        (each transfer pays fixed link latency): width table first, then
        the word stream.  Split with :func:`split_wire`."""
        return np.concatenate([self.widths.view(np.uint32), self.words])


def split_wire(wire: jnp.ndarray, n_blocks: int):
    """Device-side inverse of :meth:`PackedPCM.wire`."""
    return wire[:n_blocks].astype(jnp.int32), wire[n_blocks:]


def _block_widths(vals: np.ndarray, n_blocks: int) -> np.ndarray:
    """Per-block two's-complement bit width for int32 ``vals`` (length
    ``n_blocks * BLOCK``).  Width 0 <=> the block is all zeros."""
    # u = v for v >= 0 else ~v: the magnitude that must fit in w-1 bits.
    u = np.where(vals >= 0, vals, ~vals).reshape(n_blocks, BLOCK)
    maxu = u.max(axis=1)
    widths = np.empty(n_blocks, dtype=np.int32)
    for b, m in enumerate(maxu):  # n_blocks scalars — trivial
        widths[b] = int(m).bit_length() + 1
    # All-zero blocks store nothing at all.
    zero = ~np.any(vals.reshape(n_blocks, BLOCK), axis=1)
    widths[zero] = 0
    return widths


def _pack_stream(vals: np.ndarray, widths: np.ndarray) -> np.ndarray:
    """Bit-concatenate ``vals`` (int32, [n_blocks * BLOCK]) at per-block
    widths into a uint32 stream.  Vectorized per distinct width: within a
    width class, each group of 32 samples maps to exactly ``w`` words with
    static shift patterns, scattered to precomputed word offsets."""
    n_blocks = len(widths)
    groups_per_block = BLOCK // 32
    words_per_block = groups_per_block * widths.astype(np.int64)
    block_word_start = np.concatenate(([0], np.cumsum(words_per_block)))
    total_words = int(block_word_start[-1])
    out = np.zeros(total_words, dtype=np.uint32)

    group_w = np.repeat(widths, groups_per_block)  # width of each group
    group_in_block = np.tile(np.arange(groups_per_block), n_blocks)
    group_word_start = (
        np.repeat(block_word_start[:-1], groups_per_block)
        + group_in_block * group_w
    )
    grouped = vals.reshape(-1, 32)

    for w in np.unique(widths):
        w = int(w)
        if w == 0:
            continue
        sel = np.nonzero(group_w == w)[0]
        g = grouped[sel].astype(np.uint32) & np.uint32((1 << w) - 1)
        words = np.zeros((len(sel), w), dtype=np.uint32)
        for k in range(32):
            bit = k * w
            j, s = bit >> 5, bit & 31
            words[:, j] |= g[:, k] << np.uint32(s)
            if s + w > 32:
                words[:, j + 1] |= g[:, k] >> np.uint32(32 - s)
        idx = group_word_start[sel][:, None] + np.arange(w)[None, :]
        out[idx] = words
    return out


def _finish(stream: np.ndarray, n_words: int, widths, n, delta) -> PackedPCM:
    # +1: the decoder's second gather may touch one word past the stream;
    # pad to WORD_PAD multiples so few decoder compilations serve all sizes.
    # (Always copy: neither packer ever hands a stream already at
    # padded_len — the numpy path sizes to n_words exactly and the native
    # worst-case buffer is odd-length — so a reuse branch was dead code.)
    padded_len = -(-(n_words + 1) // WORD_PAD) * WORD_PAD
    words = np.zeros(padded_len, dtype=np.uint32)
    words[:n_words] = stream[:n_words]
    return PackedPCM(words=words, widths=widths, n=n, delta=delta)


#: pack_pcm encoding modes -> native packer's mode int.
_MODES = {"auto": -1, "direct": 0, "delta": 1}


def pack_pcm(
    wave: np.ndarray, mode: str = "auto", use_native: bool = True
) -> PackedPCM:
    """Pack an int16 waveform for transfer.  mode='auto' measures both
    width tables and keeps the smaller encoding (deltas almost always win
    on audio; direct wins on e.g. white noise near full scale);
    'delta'/'direct' force one — batched decoders need every channel on
    the same mode.  Uses the native packer (runtime/csrc/pcm_pack.cpp,
    ~GB/s) when a compiler is around, else the vectorized numpy fallback
    below."""
    if mode not in _MODES:
        raise ValueError(f"unknown pack mode {mode!r}")
    wave = np.ascontiguousarray(wave)
    if wave.dtype != np.int16:
        raise TypeError(f"pack_pcm wants int16 PCM, got {wave.dtype}")
    if wave.ndim != 1:
        raise TypeError(f"pack_pcm wants a 1-D waveform, got shape {wave.shape}")
    n = len(wave)
    n_blocks = max(1, -(-n // BLOCK))

    if use_native:
        from laughter_detection_icsi_tpu.runtime import native

        got = native.pack_pcm_native(wave, BLOCK, mode=_MODES[mode])
        if got is not None:
            stream, widths, use_delta, n_words = got
            return _finish(stream, n_words, widths, n, use_delta)

    padded = np.zeros(n_blocks * BLOCK, dtype=np.int32)
    padded[:n] = wave
    candidates = []
    if mode in ("auto", "direct"):
        candidates.append((False, _block_widths(padded, n_blocks)))
    if mode in ("auto", "delta"):
        deltas = np.empty_like(padded)
        deltas[0] = padded[0]
        np.subtract(padded[1:], padded[:-1], out=deltas[1:])
        candidates.append((True, _block_widths(deltas, n_blocks)))
        delta_vals = deltas
    use_delta, widths = min(candidates, key=lambda c: int(c[1].sum()))
    vals = delta_vals if use_delta else padded

    stream = _pack_stream(vals, widths)
    return _finish(stream, len(stream), widths, n, use_delta)


def unpack_pcm(
    words: jnp.ndarray,
    widths: jnp.ndarray,
    n: int,
    delta: bool,
) -> jnp.ndarray:
    """Device-side decode: -> int32 [n] with exactly the packed int16
    values.  Pure vector ops; jit-traceable with static ``n`` / ``delta``
    (``words`` may carry any zero padding past the true stream)."""
    n_blocks = widths.shape[0]
    groups_per_block = BLOCK // 32
    block_word_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(widths * groups_per_block)]
    )

    n_pad = n_blocks * BLOCK
    i = jnp.arange(n_pad, dtype=jnp.int32)
    b = i // BLOCK
    k = i - b * BLOCK
    w = widths[b]
    bit = k * w
    word = block_word_start[b] + (bit >> 5)
    shift = (bit & 31).astype(jnp.uint32)

    wu = words.astype(jnp.uint32)
    lo = wu[word] >> shift
    # Bits that straddle into the next word: present iff shift + w > 32.
    # (32 - shift) & 31 keeps the shift amount defined when shift == 0;
    # the mask below kills the garbage it would contribute.
    hi = jnp.where(
        shift + w.astype(jnp.uint32) > 32,
        wu[word + 1] << ((32 - shift) & 31),
        jnp.uint32(0),
    )
    mask = jnp.where(w > 0, (jnp.uint32(1) << w.astype(jnp.uint32)) - 1, 0)
    v = (lo | hi) & mask

    # Sign-extend w-bit two's complement (w = 0 blocks decode to 0).
    w_safe = jnp.maximum(w, 1).astype(jnp.uint32)
    sign = (v >> (w_safe - 1)) & 1
    vals = v.astype(jnp.int32) - (sign << w_safe).astype(jnp.int32)

    if delta:
        vals = jnp.cumsum(vals)
    return vals[:n]

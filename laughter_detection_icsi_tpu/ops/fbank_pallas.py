"""Fused Pallas TPU kernel for the Kaldi-compatible log-mel featurizer.

The featurizer is factored TPU-first (shared with ops/fbank.py):

1.  The per-frame preprocessing (DC removal, preemphasis, povey window) is
    linear in the frame, so it is folded into the DFT bases on host
    (ops/fbank.py ``_effective_bases``) — no elementwise preprocessing pass
    exists at runtime.
2.  Framing is three row-shifted views of the [n_rows, shift] wave (frame r
    = wave[160r : 160r+400] = rows r, r+1 and the head of row r+2).  XLA
    materializes the three views padded to a 256-lane row layout (Mosaic
    DMA/tiling wants 128-aligned shapes; the pad lanes multiply against
    zero rows of the bases, so they are free wrong-answer-proof).
3.  This kernel consumes the views through auto-pipelined BlockSpecs
    (double-buffered HBM->VMEM streaming) and fuses the whole spectral
    chain per 256-frame block: six MXU matmuls (cos/sin x three parts),
    power spectrum on the VPU, the mel projection, and the log — nothing
    intermediate ever returns to HBM (BASELINE.json north_star).

Alignment choices (pallas_guide.md tiling rules):
- DFT bins: Kaldi's mel banks never read the Nyquist bin (ops/fbank.py
  ``_mel_banks`` zeroes row 256), so the kernel computes exactly 256 bins —
  two perfect 128-lane tiles — instead of nfft//2+1 = 257.
- Mel output: 44 filters are padded to 128 lanes inside the kernel; the
  caller slices [:, :44].

Semantics identical to ops/fbank.py; the differential tests pin them
together.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from laughter_detection_icsi_tpu import host_prep
from laughter_detection_icsi_tpu.config import FEAT, FeatConfig
from laughter_detection_icsi_tpu.ops import fbank as fbank_ref

BLOCK = 256  # frames per grid step
LANES = 128
ROW = 2 * LANES  # padded row width for the wave views


def resolve_use_pallas(setting=None) -> bool:
    """Resolve a ``use_pallas_fbank`` knob: ``None`` auto-selects this fused
    kernel on TPU and the XLA featurizer elsewhere (the one shared
    predicate for every featurizing call site)."""
    if setting is None:
        return jax.devices()[0].platform == "tpu"
    return bool(setting)


@functools.lru_cache(maxsize=8)
def _kernel_constants(cfg: FeatConfig):
    """(c1, c2, c3, s1, s2, s3, mel_pad): per-view folded bases, each padded
    to ROW contraction rows (pad rows are zero), mel bank padded to 128
    lanes."""
    nfft = cfg.fft_size
    flen = cfg.frame_length_samples
    shift = cfg.frame_shift_samples
    nbins = nfft // 2  # Nyquist bin excluded (mel row is zero)
    cos_eff, sin_eff = fbank_ref._effective_bases(cfg)

    def parts(basis):
        out = []
        for lo, hi in ((0, shift), (shift, 2 * shift), (2 * shift, flen)):
            p = np.zeros((ROW, nbins), dtype=np.float32)
            p[: hi - lo] = basis[lo:hi, :nbins]
            out.append(p)
        return out

    c1, c2, c3 = parts(cos_eff)
    s1, s2, s3 = parts(sin_eff)
    mel = fbank_ref._mel_banks(cfg)[:nbins]  # [nbins, n_mels]
    mel_pad = np.zeros((nbins, LANES), dtype=np.float32)
    mel_pad[:, : mel.shape[1]] = mel
    return c1, c2, c3, s1, s2, s3, mel_pad


def _fbank_kernel(
    p1_ref,  # [BLOCK, ROW] VMEM (grid-blocked view 1)
    p2_ref,  # [BLOCK, ROW] view 2 (rows shifted by 1)
    p3_ref,  # [BLOCK, ROW] view 3 (rows shifted by 2; only `tail` lanes live)
    c1_ref, c2_ref, c3_ref,  # [ROW, nbins] folded cos basis parts
    s1_ref, s2_ref, s3_ref,  # [ROW, nbins] folded sin basis parts
    mel_ref,  # [nbins, 128]
    out_ref,  # [BLOCK, 128]
    *,
    log_floor: float,
):
    # HIGHEST: f32 MXU passes — default precision truncates float32 operands
    # to bfloat16 on TPU, which costs ~5e-2 in the log-mel output and breaks
    # feature parity with the CPU reference (SURVEY.md §7.3).
    mm = functools.partial(
        jnp.dot,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    def spectral(b1, b2, b3):
        return mm(p1_ref[:], b1[:]) + mm(p2_ref[:], b2[:]) + mm(p3_ref[:], b3[:])

    re = spectral(c1_ref, c2_ref, c3_ref)
    im = spectral(s1_ref, s2_ref, s3_ref)
    power = re * re + im * im
    mel = mm(power, mel_ref[:])
    out_ref[:] = jnp.log(jnp.maximum(mel, log_floor))


def fbank_pallas(
    waveform: jnp.ndarray,
    cfg: FeatConfig = FEAT,
    interpret: bool = False,
) -> jnp.ndarray:
    """[..., n] float waveform -> [..., T, num_filters] log-mel,
    snip_edges=False semantics like ops/fbank.py (host symmetric padding
    applied here).

    Batched inputs (e.g. the [C, n] channel batches of
    parallel/sharded_inference.py) flatten onto the frame-block grid axis:
    each channel's row-shifted views stack along the frame dimension, so the
    kernel is identical for any batch size — one grid of C x cdiv(T, BLOCK)
    auto-pipelined blocks.  Frame counts are per-length, so all leading
    batch entries share the trailing sample count (true for the padded
    channel batches).

    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU tests).
    """
    if cfg.dither:
        # Same guard as ops/fbank.py: silently ignoring the knob would
        # fake parity with a dithering extractor.
        raise NotImplementedError(
            "dither != 0 is not implemented (features are deterministic)"
        )
    # host_prep owns the snip-twin transform; a second inline replace()
    # here was the drift hazard its docstring warns about.
    cfg_snip = host_prep.snip_cfg(cfg)
    shift = cfg_snip.frame_shift_samples
    flen = cfg_snip.frame_length_samples
    tail = flen - 2 * shift
    if not (2 * shift < flen <= 3 * shift) or shift > ROW or tail > ROW:
        raise NotImplementedError(
            "fbank_pallas assumes 2*shift < frame_length <= 3*shift "
            f"(got shift={shift}, frame_length={flen})"
        )
    if cfg.num_filters > LANES:
        # The mel bank is padded into one LANES-wide tile
        # (_kernel_constants); more filters would raise an opaque numpy
        # broadcast error instead of this explicit guard.
        raise NotImplementedError(
            f"fbank_pallas supports at most {LANES} mel filters "
            f"(got {cfg.num_filters}); use ops.fbank"
        )

    batch_shape = waveform.shape[:-1]
    n = waveform.shape[-1]
    t = fbank_ref.num_frames(n, cfg)
    if t == 0:
        return jnp.zeros((*batch_shape, 0, cfg.num_filters), jnp.float32)
    if n < flen:
        # Degenerate sub-frame input: the reflection pad is shorter than the
        # frame and semantics reduce to the XLA path's clamped gather —
        # delegate rather than replicate that edge case in the kernel.
        return fbank_ref.fbank(waveform, cfg)
    if not cfg.snip_edges:
        waveform = fbank_ref._pad_for_framing(waveform, cfg)

    wf = waveform.reshape(-1, waveform.shape[-1])
    b = wf.shape[0]
    n_blocks = pl.cdiv(t, BLOCK)
    rows_needed = n_blocks * BLOCK + 2
    need = rows_needed * shift
    wave = jnp.pad(
        wf.astype(jnp.float32), ((0, 0), (0, max(0, need - wf.shape[-1])))
    )[:, :need].reshape(b, rows_needed, shift)
    # The three row-shifted views, padded to the aligned ROW width and
    # flattened over the batch (XLA fuses pad+slice; pad lanes hit zero
    # basis rows).
    pad = ((0, 0), (0, 0), (0, ROW - shift))
    rows = b * n_blocks * BLOCK
    p1 = jnp.pad(wave[:, : n_blocks * BLOCK], pad).reshape(rows, ROW)
    p2 = jnp.pad(wave[:, 1 : n_blocks * BLOCK + 1], pad).reshape(rows, ROW)
    p3 = jnp.pad(wave[:, 2 : n_blocks * BLOCK + 2], pad).reshape(rows, ROW)

    c1, c2, c3, s1, s2, s3, mel_pad = _kernel_constants(cfg_snip)
    view_spec = pl.BlockSpec((BLOCK, ROW), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fbank_kernel, log_floor=cfg.energy_floor),
        grid=(b * n_blocks,),
        in_specs=[view_spec] * 3 + [const_spec] * 7,
        out_specs=pl.BlockSpec((BLOCK, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        interpret=interpret,
    )(
        p1, p2, p3,
        jnp.asarray(c1), jnp.asarray(c2), jnp.asarray(c3),
        jnp.asarray(s1), jnp.asarray(s2), jnp.asarray(s3),
        jnp.asarray(mel_pad),
    )
    out = out.reshape(b, n_blocks * BLOCK, LANES)[:, :t, : cfg.num_filters]
    return out.reshape(*batch_shape, t, cfg.num_filters)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def fbank_pallas_jit(
    waveform: jnp.ndarray, cfg: FeatConfig = FEAT, interpret: bool = False
) -> jnp.ndarray:
    return fbank_pallas(waveform, cfg, interpret=interpret)

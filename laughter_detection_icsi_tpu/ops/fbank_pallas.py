"""Fused Pallas TPU kernel for the Kaldi-compatible log-mel featurizer.

One kernel streams raw PCM from HBM and emits log-mel frames: per grid step
a frame-block's waveform slice is DMA'd HBM->VMEM, the overlapped [B, 400]
frame matrix is built with pure reshaped views (frame i = wave[160i:160i+400]
decomposes into three row-shifted [B, 160]/[B, 80] views of the same buffer —
no gather), then DC removal, preemphasis, povey window (VPU), the real-DFT
as two MXU matmuls against cos/sin bases, power spectrum, mel projection
(MXU), and log — all without touching HBM in between (BASELINE.json
north_star: "frame -> STFT -> mel filterbank ... one fused Pallas kernel
streaming raw PCM from HBM").

Alignment choices (pallas_guide.md tiling rules):
- DFT bins: Kaldi's mel banks never read the Nyquist bin (ops/fbank.py
  ``_mel_banks`` zeroes row 256), so the kernel computes exactly 256 bins —
  two perfect 128-lane tiles — instead of nfft//2+1 = 257.
- Mel output: 44 filters are padded to 128 lanes inside the kernel; the
  caller slices [:, :44].
- Frame block: 256 frames/step keeps every operand tile-aligned and the
  whole working set ~2.5 MB of VMEM.

Semantics identical to ops/fbank.py (same bases, same host-side
snip_edges=False padding); the differential test pins them together.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from laughter_detection_icsi_tpu.config import FEAT, FeatConfig
from laughter_detection_icsi_tpu.ops import fbank as fbank_ref

BLOCK = 256  # frames per grid step
LANES = 128


def _kernel_constants(cfg: FeatConfig) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(cos, sin, mel_padded, window) with MXU-friendly shapes."""
    nfft = cfg.fft_size
    flen = cfg.frame_length_samples
    nbins = nfft // 2  # Nyquist bin excluded (mel row is zero)
    cos_b, sin_b = fbank_ref._dft_bases(nfft)
    cos_b = cos_b[:flen, :nbins]
    sin_b = sin_b[:flen, :nbins]
    mel = fbank_ref._mel_banks(cfg)[:nbins]  # [nbins, n_mels]
    mel_pad = np.zeros((nbins, LANES), dtype=np.float32)
    mel_pad[:, : mel.shape[1]] = mel
    win = fbank_ref._window_fn(cfg).reshape(1, flen)
    return cos_b, sin_b, mel_pad, win


def _fbank_kernel(
    wave_hbm,  # [n_rows, shift] f32, ANY/HBM (reshaped wave view)
    cos_ref,  # [flen, nbins] VMEM
    sin_ref,  # [flen, nbins] VMEM
    mel_ref,  # [nbins, 128] VMEM
    win_ref,  # [1, flen] VMEM
    out_ref,  # [BLOCK, 128] VMEM (grid-blocked)
    frames_ref,  # scratch [BLOCK, flen] f32
    sems,  # 3 DMA semaphores
    *,
    shift: int,
    flen: int,
    preemph: float,
    remove_dc: bool,
    log_floor: float,
):
    i = pl.program_id(0)
    # The DMA engine does the framing: frame r = wave[160r : 160r+400]
    # decomposes into three row-shifted views of the [n_rows, shift] wave —
    # three strided DMAs land them side by side in the frames scratch, so
    # the compute side never relayouts (Mosaic cannot concat sublane-shifted
    # views).
    tail = flen - 2 * shift
    row0 = i * BLOCK
    d1 = pltpu.make_async_copy(
        wave_hbm.at[pl.ds(row0, BLOCK), :], frames_ref.at[:, 0:shift], sems.at[0]
    )
    d2 = pltpu.make_async_copy(
        wave_hbm.at[pl.ds(row0 + 1, BLOCK), :],
        frames_ref.at[:, shift : 2 * shift],
        sems.at[1],
    )
    d3 = pltpu.make_async_copy(
        wave_hbm.at[pl.ds(row0 + 2, BLOCK), pl.ds(0, tail)],
        frames_ref.at[:, 2 * shift : flen],
        sems.at[2],
    )
    d1.start()
    d2.start()
    d3.start()
    d1.wait()
    d2.wait()
    d3.wait()

    frames = frames_ref[:]
    if remove_dc:
        frames = frames - jnp.mean(frames, axis=1, keepdims=True)
    if preemph != 0.0:
        # prev[j] = frames[j-1], edge reuses column 0 (Kaldi semantics).
        rolled = pltpu.roll(frames, 1, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, frames.shape, 1)
        prev = jnp.where(col == 0, frames, rolled)
        frames = frames - preemph * prev
    frames = frames * win_ref[0, :]

    re = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32)
    power = re * re + im * im
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.log(jnp.maximum(mel, log_floor))


def fbank_pallas(
    waveform: jnp.ndarray,
    cfg: FeatConfig = FEAT,
    interpret: bool = False,
) -> jnp.ndarray:
    """[n] float waveform -> [T, num_filters] log-mel, snip_edges=False
    semantics like ops/fbank.py (host symmetric padding applied here).

    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU tests).
    """
    cfg_snip = dataclasses.replace(cfg, snip_edges=True)
    shift = cfg_snip.frame_shift_samples
    flen = cfg_snip.frame_length_samples
    if flen != 2 * shift + (flen - 2 * shift) or flen - 2 * shift > shift:
        raise NotImplementedError(
            "fbank_pallas assumes shift < frame_length <= 3*shift "
            f"(got shift={shift}, frame_length={flen})"
        )

    n = waveform.shape[-1]
    t = fbank_ref.num_frames(n, cfg)
    if t == 0:
        return jnp.zeros((0, cfg.num_filters), jnp.float32)
    if n < flen:
        # Degenerate sub-frame input: the reflection pad is shorter than the
        # frame and semantics reduce to the XLA path's clamped gather —
        # delegate rather than replicate that edge case in the kernel.
        return fbank_ref.fbank(waveform, cfg)
    if not cfg.snip_edges:
        left, right = fbank_ref.pad_amounts(n, cfg)
        waveform = jnp.concatenate(
            [
                jnp.flip(waveform[..., :left], axis=-1),
                waveform,
                jnp.flip(waveform[..., n - right :], axis=-1),
            ],
            axis=-1,
        )

    n_blocks = pl.cdiv(t, BLOCK)
    # Every block DMA reads rows [i*BLOCK, i*BLOCK + BLOCK+2) of the
    # [n_rows, shift] view; pad the wave so the last read is in bounds.
    need = (n_blocks * BLOCK + 2) * shift
    waveform = jnp.pad(
        waveform.astype(jnp.float32), (0, max(0, need - waveform.shape[-1]))
    ).reshape(-1, shift)

    cos_b, sin_b, mel_pad, win = _kernel_constants(cfg_snip)
    kernel = functools.partial(
        _fbank_kernel,
        shift=shift,
        flen=flen,
        preemph=cfg.preemph_coeff,
        remove_dc=cfg.remove_dc_offset,
        log_floor=cfg.energy_floor,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # wave stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * BLOCK, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((BLOCK, flen), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(
        waveform,
        jnp.asarray(cos_b),
        jnp.asarray(sin_b),
        jnp.asarray(mel_pad),
        jnp.asarray(win),
    )
    return out[:t, : cfg.num_filters]


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def fbank_pallas_jit(
    waveform: jnp.ndarray, cfg: FeatConfig = FEAT, interpret: bool = False
) -> jnp.ndarray:
    return fbank_pallas(waveform, cfg, interpret=interpret)

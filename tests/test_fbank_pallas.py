"""Fused Pallas featurizer vs the XLA reference implementation (interpreter
mode on CPU; the same kernel runs compiled on TPU)."""

import dataclasses

import numpy as np
import pytest

from laughter_detection_icsi_tpu.config import FEAT
from laughter_detection_icsi_tpu.ops import fbank as fb
from laughter_detection_icsi_tpu.ops.fbank_pallas import BLOCK, fbank_pallas


@pytest.mark.parametrize("n_samples", [16000, 16000 * 3 + 777, 399, 80])
def test_pallas_matches_xla(rng, n_samples):
    w = (rng.standard_normal(n_samples) * 0.1).astype(np.float32)
    ref = np.asarray(fb.fbank_jit(w))
    got = np.asarray(fbank_pallas(w, interpret=True))
    assert got.shape == ref.shape
    if ref.size:
        np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_pallas_multi_block(rng):
    # > BLOCK frames exercises the grid + per-block DMA offsets
    n = (BLOCK * 2 + 37) * FEAT.frame_shift_samples
    w = (rng.standard_normal(n) * 0.1).astype(np.float32)
    ref = np.asarray(fb.fbank_jit(w))
    got = np.asarray(fbank_pallas(w, interpret=True))
    assert got.shape[0] > 2 * BLOCK
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_pallas_batched_matches_per_channel(rng):
    # [C, n] channel batches (the sharded-inference shape) flatten onto the
    # frame-block grid; every channel must match its own 1-D run exactly.
    n = 16000 + 777
    batch = (rng.standard_normal((3, n)) * 0.1).astype(np.float32)
    got = np.asarray(fbank_pallas(batch, interpret=True))
    assert got.shape == (3, fb.num_frames(n), FEAT.num_filters)
    for c in range(3):
        one = np.asarray(fbank_pallas(batch[c], interpret=True))
        np.testing.assert_array_equal(got[c], one)
    ref = np.asarray(fb.fbank_jit(batch))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_pallas_rejects_odd_geometry():
    cfg = dataclasses.replace(FEAT, frame_length=0.05)  # flen > 3*shift
    with pytest.raises(NotImplementedError, match="assumes"):
        fbank_pallas(np.zeros(16000, np.float32), cfg, interpret=True)

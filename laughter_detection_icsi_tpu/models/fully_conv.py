"""Fully-convolutional (à-trous) inference for ResNetBigger-family models.

The reference classifies every 10 ms frame by running the FULL conv stack on
a 100-frame window per output — adjacent windows overlap 99% and recompute
~1.4 GFLOP each (XLA cost model, batch-amortized; reference
datasets.py:72-93 + models.py:181-244).  This
module evaluates the same weights ONCE over the whole feature track using
the standard dilation trick: every stride-2-in-time conv becomes a
stride-1 conv with doubled time dilation (frequency keeps its stride), so
the network stays at full time resolution and output t of the final map
equals the strided network's row for the window starting at t.  The
AvgPool + flatten + linear head becomes twelve shifted adds over the final
map plus a [T, 48] matmul.  75x fewer FLOPs per output frame (XLA
cost model: 18.5 vs 1,389 MFLOP).

Numerics: for a window with silence around it the paths agree up to the
*bias leak* — a zero track region carries ``relu(bias)``/BN-affine
constants through the stack where the per-window path saw literal
per-layer zeros — exactly zero when conv biases are zero, ~1e-4 near the
reference's 0.01-scale init, larger for trained checkpoints (pinned by
tests).  On continuous audio interior windows additionally see real
neighbour audio where the reference saw artificial zeros, so probabilities
deviate near window borders.  This is a *better-posed* model (no synthetic
zero-context) but NOT checkpoint-parity — hence an opt-in fast path
(``InferenceSettings(mode="fused_conv")``), never the default.

Only valid at inference: BatchNorm must be in running-stats (affine) mode.
ResNetNoBN checkpoints (no BN anywhere, reference models.py:247-308) are
supported — every BN fold is skipped when the parameter tree has none.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from laughter_detection_icsi_tpu.models import layers as L
from laughter_detection_icsi_tpu.models.layers import bn_eval_affine as _affine_bn

PyTree = Any


def _conv(x, w, f_stride, t_dil, bias=None, valid_t=False):
    """NCHW conv, 'same' in frequency; time padding by mode.

    Time stride is fixed at 1 — the whole point of this module is replacing
    the reference's time strides with dilation, so a real time stride would
    break the one-output-per-input-frame contract.  ``valid_t`` switches to
    VALID in time for the blocked path (the halo provides the context).
    """
    kh = w.shape[2]
    pad_t = 0 if valid_t else t_dil * (kh // 2)
    pad_f = w.shape[3] // 2
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, f_stride),
        padding=[(pad_t, pad_t), (pad_f, pad_f)],
        rhs_dilation=(t_dil, 1),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if bias is not None:
        out = out + bias[None, :, None, None]
    return out


def _bn4(x, params, state):
    scale, bias = _affine_bn(params, state)
    return x * scale[None, :, None, None] + bias[None, :, None, None]


def _block(x, params, state, f_stride, t_dil_in, replaced_stride,
           valid_t=False):
    """ResidualBlock with the time stride replaced by dilation.

    ``t_dil_in`` is the dilation entering the block; when the block's
    original stride was 2 in time, the first conv keeps dilation t_dil_in
    and every later conv (in this and following blocks) uses
    t_dil_in * replaced_stride.  NoBN blocks (reference models.py:43-79)
    simply have no ``bn*`` keys — every fold is skipped.

    ONE implementation serves both paths (they used to be near-duplicate
    twins, a silent-drift hazard for the blocked path's bit-exactness):
    ``valid_t`` makes each conv consume its dilation of halo rows from
    each side, and the 1x1 shortcut (no time context) is then sliced to
    stay aligned.
    """
    t_dil_out = t_dil_in * replaced_stride
    out = _conv(x, params["conv1"]["weight"], f_stride, t_dil_in,
                params["conv1"].get("bias"), valid_t)
    if "bn1" in params:
        out = _bn4(out, params["bn1"], state["bn1"])
    out = jax.nn.relu(out)
    out = _conv(out, params["conv2"]["weight"], 1, t_dil_out,
                params["conv2"].get("bias"), valid_t)
    if "bn2" in params:
        out = _bn4(out, params["bn2"], state["bn2"])
    if "shortcut" in params:
        sc = jax.lax.conv_general_dilated(
            x,
            params["shortcut"]["0"]["weight"],
            window_strides=(1, f_stride),
            padding=[(0, 0), (0, 0)],
            rhs_dilation=(1, 1),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        if "bias" in params["shortcut"]["0"]:
            sc = sc + params["shortcut"]["0"]["bias"][None, :, None, None]
        if "1" in params["shortcut"]:  # NoBN shortcut = conv only
            sc = _bn4(sc, params["shortcut"]["1"], state["shortcut"]["1"])
    else:
        sc = x
    if valid_t:
        off = t_dil_in + t_dil_out  # rows the two convs consumed per side
        sc = sc[:, :, off : sc.shape[2] - off, :]
    return jax.nn.relu(out + sc), t_dil_out


def _head(flat: jnp.ndarray, params: PyTree, state: PyTree) -> jnp.ndarray:
    """BN1d -> linear1 -> BN1d -> ReLU -> linear2 -> sigmoid over the
    flattened pooled map (reference models.py:231-238); BN folds skipped
    for NoBN checkpoints (reference models.py:295-298)."""
    h = flat
    if "bn2" in params:
        scale, bias = _affine_bn(params["bn2"], state["bn2"])
        h = h * scale + bias
    h = L.linear(h, params["linear1"])
    if "bn3" in params:
        scale, bias = _affine_bn(params["bn3"], state["bn3"])
        h = h * scale + bias
    h = jax.nn.relu(h)
    h = L.linear(h, params["linear2"])
    return jax.nn.sigmoid(h)[:, 0]


def fully_conv_probs_blocked(
    params: PyTree,
    state: PyTree,
    feats: jnp.ndarray,
    window: int = 100,
    block: int = 1024,
) -> jnp.ndarray:
    """[T_in, F] -> [T_in] probabilities, numerically identical to
    :func:`fully_conv_probs` but ~20x faster on TPU for long tracks.

    A single batch-1 conv over tens of thousands of time steps tiles badly
    on the MXU (measured ~20x off the FLOP bound on v5e); this variant cuts
    the track into ``block``-row segments with receptive-field halos —
    R = 54 rows of dilated-conv context before, R + 88 rows (the head's
    pooling extent at time stride 8) after — and runs the stack VALID in
    time over the [n_blocks, block + 196, F] batch.  Halos come from the
    real track, so interior outputs equal the unblocked computation
    exactly.  The first R and last R + 88 output rows see the TRACK edge,
    where the unblocked conv zero-pads at every layer (zero-feature halos
    propagate differently through BN biases) — those rows are recomputed
    with two small unblocked prefix/suffix segments and spliced in, which
    is exact because a segment's interior rows never read its far edge."""
    strides = (1, 2, 2, 2)
    # Receptive radius of the dilated stack: per stage, first conv at the
    # incoming dilation + three convs at the outgoing one.
    t_dil, radius = 1, 1  # stem conv
    for s in strides:
        radius += t_dil + 3 * (t_dil * s)
        t_dil *= s
    pool = 4
    out_rows = ((window - 1) // t_dil + 1) // pool  # 3 for window 100
    if out_rows < 1:
        raise NotImplementedError(
            f"fused_conv head needs window >= {pool * t_dil}; got {window}"
        )
    # pool offsets 0 .. pool*out_rows-1 at stride t_dil
    head_extent = t_dil * (pool * out_rows - 1)
    halo_l, halo_r = radius, radius + head_extent

    t_in = feats.shape[0]
    seg = 2 * (halo_l + halo_r)  # prefix/suffix segment for exact track edges
    if t_in <= 2 * seg:
        return fully_conv_probs(params, state, feats, window)
    nb = -(-t_in // block)
    # Right padding covers: block rounding, the per-window zero-pad tail
    # (window - 1, included in halo_r's reach beyond t_in), and the halo.
    ptrack = jnp.pad(feats, ((halo_l, nb * block - t_in + halo_r), (0, 0)))
    idx = (
        jnp.arange(nb)[:, None] * block
        + jnp.arange(block + halo_l + halo_r)[None, :]
    )
    xb = ptrack[idx][:, None, :, :]  # [nb, 1, block+halos, F]

    x = _conv(xb, params["conv1"]["weight"], 1, 1,
              params["conv1"].get("bias"), valid_t=True)
    if "bn1" in params:
        x = _bn4(x, params["bn1"], state["bn1"])
    x = jax.nn.relu(x)
    t_dil = 1
    for i, s in enumerate(strides):
        # state.get: a torch-imported NoBN state tree is empty (no buffers)
        blk_p = params[f"block{i + 1}"]
        blk_s = state.get(f"block{i + 1}", {})
        x, t_dil = _block(x, blk_p["0"], blk_s.get("0", {}), s, t_dil, s,
                          valid_t=True)
        x, _ = _block(x, blk_p["1"], blk_s.get("1", {}), 1, t_dil, 1,
                      valid_t=True)

    # x: [nb, C, block + head_extent, Wf]; freq-pool like fully_conv_probs.
    c, wf = x.shape[1], x.shape[3]
    if wf // pool != 1:
        raise NotImplementedError(
            f"fused_conv head needs a single pooled frequency column "
            f"(got Wf {wf}); use mode='windows' for other geometries"
        )
    m = jnp.mean(
        x[:, :, :, : pool * (wf // pool)].reshape(
            x.shape[0], c, x.shape[2], wf // pool, pool
        ),
        axis=-1,
    )[:, :, :, 0]  # [nb, C, H]

    pieces = []
    for r in range(out_rows):
        acc = 0
        for q in range(pool):
            off = t_dil * (pool * r + q)
            acc = acc + jax.lax.dynamic_slice_in_dim(m, off, block, axis=2)
        pieces.append(acc / pool)
    pooled = jnp.stack(pieces, axis=0)  # [out_rows, nb, C, block]

    # torch .view flatten order over [C, H=out_rows, W=1]: c*out_rows + r.
    flat = jnp.transpose(pooled, (1, 3, 2, 0)).reshape(nb * block, c * out_rows)
    probs = _head(flat, params, state)

    # Splice in the exact track edges (see docstring): rows < halo_l read
    # the left track edge, rows >= t_in - halo_r can read beyond the
    # window-pad tail; both segments' spliced rows are interior to their
    # own far edge, so they equal the unblocked whole-track values.
    pre = fully_conv_probs(params, state, feats[:seg], window)[:halo_l]
    suf = fully_conv_probs(params, state, feats[t_in - seg :], window)[
        seg - halo_r :
    ]
    return jnp.concatenate([pre, probs[halo_l : t_in - halo_r], suf])


def fully_conv_probs(
    params: PyTree,
    state: PyTree,
    feats: jnp.ndarray,
    window: int = 100,
) -> jnp.ndarray:
    """[T_in, F] feature track -> [T_in] per-frame laughter probabilities
    (one per window start, like the per-window pipeline).

    The track is right-padded internally by ``window - 1`` zero frames so
    tail windows match the per-window zero-pad semantics
    (reference datasets.py:85-92).
    """
    t_in = feats.shape[0]
    feats = jnp.pad(feats, ((0, window - 1), (0, 0)))
    x = feats[None, None, :, :]  # [1, 1, T, F]

    x = _conv(x, params["conv1"]["weight"], 1, 1, params["conv1"].get("bias"))
    if "bn1" in params:
        x = _bn4(x, params["bn1"], state["bn1"])
    x = jax.nn.relu(x)

    t_dil = 1
    # The ONE stride plan zoo._resnet_family builds (a parameter here could
    # silently evaluate a truncated network when the head size coincides;
    # the blocked sibling's radius math hardcodes this plan anyway).
    for i, s in enumerate((1, 2, 2, 2)):
        # state.get: a torch-imported NoBN state tree is empty (no buffers)
        blk_p = params[f"block{i + 1}"]
        blk_s = state.get(f"block{i + 1}", {})
        # first block of the stage carries the stage stride, second is s=1
        x, t_dil = _block(x, blk_p["0"], blk_s.get("0", {}), s, t_dil, s)
        x, _ = _block(x, blk_p["1"], blk_s.get("1", {}), 1, t_dil, 1)

    # x: [1, C, T, Wf] at full time resolution; t_dil == total replaced
    # time stride (8).  Frequency followed the original striding, so Wf is
    # the reference window's final width; the strided window map's row m for
    # window i is x[:, :, i + t_dil*m, :].
    c = x.shape[1]
    wf = x.shape[3]
    pool = 4
    # Reference head: AvgPool2d(4) on the [13, Wf] window map -> rows r pool
    # window-map rows 4r+q (q<4), cols 0..3 (floor; Wf=6 -> 1 col).
    n_rows = ((window - 1) // t_dil + 1)  # 13 for window 100, stride 8
    out_rows = n_rows // pool  # 3
    if out_rows < 1 or wf // pool != 1:
        # The head mirrors AvgPool2d(4)+.view for the ICSI geometry (one
        # pooled frequency column); silently collapsing extra columns
        # would feed the head something the reference never computes.
        raise NotImplementedError(
            f"fused_conv head needs window >= {pool * t_dil} and a single "
            f"pooled frequency column (got window {window}, Wf {wf}); "
            "use mode='windows' for other geometries"
        )
    m = jnp.mean(x[0, :, :, : pool * (wf // pool)].reshape(c, x.shape[2], wf // pool, pool), axis=-1)
    m = m[:, :, 0]  # [C, T] freq-pooled

    # pooled[r, i] = mean_q m[:, i + t_dil*(pool*r + q)]
    total = x.shape[2]
    # Slice length: the largest offset is head_extent = t_dil*(pool*out_rows
    # - 1), so total - head_extent positions exist for EVERY offset.  Since
    # pool*out_rows - 1 <= (window-1)//t_dil, this is always >= t_in — a
    # `- pool*out_rows` here dropped the final output frame whenever
    # window % (t_dil*pool) == 0 (e.g. window 32/64/128).
    slice_len = total - t_dil * (pool * out_rows - 1)
    pieces = []
    for r in range(out_rows):
        acc = 0
        for q in range(pool):
            off = t_dil * (pool * r + q)
            sl = jax.lax.dynamic_slice_in_dim(m, off, slice_len, axis=1)
            acc = acc + sl
        pieces.append(acc / pool)
    pooled = jnp.stack(pieces, axis=0)  # [out_rows, C, T']

    # torch .view flatten order over [C, H=out_rows, W=1]: index = c*out_rows + r
    flat = jnp.transpose(pooled, (2, 1, 0)).reshape(pooled.shape[2], c * out_rows)
    probs = _head(flat, params, state)
    return probs[:t_in]

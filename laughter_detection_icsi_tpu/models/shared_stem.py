"""Shared-stem sliding-window inference: exact per-window semantics at
~4.5x fewer FLOPs than the naive window batch.

The reference classifies one 100-frame window per 10 ms output frame
(reference datasets.py:72-93), so adjacent windows share 99 of their 100
rows.  For the stride-1 prefix of the ResNet family — stem conv + the first
residual stage, 5 of the 9 convs and ~90% of the per-window FLOPs — the
activations at interior window rows are *the same values* as a single conv
pass over the whole track: a 3x3 'same' conv only diverges from the track
computation where its receptive field crosses the window's zero padding,
and after 5 stacked 3x3 convs that contamination is exactly 5 rows at each
window edge (receptive-field radius = #convs).  BatchNorm (running stats),
ReLU and residual adds are per-position, so they commute with splicing.

This module therefore computes, per chunk of windows:

1.  ``stem_track``  — conv1 + stage 1 ONCE over the whole [T, F] track
    (amortized across all windows; a window's interior rows 5..94 are read
    straight out of this map),
2.  ``_band_stem``  — the 5 contaminated rows at each window edge, batched
    over windows, via convs with one-sided zero padding whose heights
    telescope 10 -> 9 -> 8 -> 7 -> 6 -> 5 (each conv consumes one row from
    the un-padded side, reproducing the window's own zero-pad exactly),
3.  splice bands + interior into the [B, C, 100, F] stage-1 output and run
    the cheap strided tail (stages 2-4 + head) per window.

Numerics: mathematically identical to the naive per-window forward; float
results differ only by reduction-order ULPs (pinned to ~1e-6 by tests).
Inference only (BatchNorm in running-stats mode; dropout 0).

Validity: ResNetBigger / ResNet / ResNetNoBN (stage-1 stride 1, 3x3 convs,
'same' padding — reference models.py:181-244); any ``filter_sizes``
(a stage-1 1x1-conv shortcut has no row context and splices exactly).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from laughter_detection_icsi_tpu.models import layers as L
from laughter_detection_icsi_tpu.models.zoo import _block_apply, _stage_apply

#: stride-1 3x3 convs before the first stride-2 conv: stem conv1 + two
#: residual blocks of stage 1 (2 convs each) = receptive-field radius 5.
DEPTH = 5

#: contaminated rows per window edge at the stage-2 output (window rows at
#: the half-resolution scale): the stride-2 conv maps block1 contamination
#: (DEPTH = 5 rows) onto rows m with 2m-1 <= DEPTH-1, i.e.
#: floor(DEPTH/2) + 1 = 3 rows, and the three following effective-
#: dilation-2 convs add one row each -> 6.
DEPTH2 = 6

#: models whose architecture satisfies the validity conditions above.
SUPPORTED_MODELS = ("ResNetBigger", "ResNet", "ResNetNoBN")


def resolve_shared_stem(setting, model_name: str, window: int) -> bool:
    """Resolve an ``InferenceSettings.shared_stem`` value (the ONE place the
    validity conditions live — both pipelines call this, so they can never
    disagree).  ``None`` auto-enables when valid; an explicit ``True`` on an
    unsupported configuration raises instead of computing garbage (the edge
    bands would read out-of-window rows for window <= 2*DEPTH, and non-
    ResNet models lack the stem/stage structure entirely)."""
    supported = model_name in SUPPORTED_MODELS and window > 2 * DEPTH
    if setting is None:
        return supported
    if setting and not supported:
        raise ValueError(
            "shared_stem=True requires a ResNet-family model "
            f"({'/'.join(SUPPORTED_MODELS)}) and window > {2 * DEPTH}; "
            f"got model {model_name!r} with window {window}"
        )
    return bool(setting)


def _bn_eval(x, params, state, with_bn):
    if not with_bn:
        return x
    y, _ = L.batch_norm(x, params, state, train=False)
    return y


def _conv_rows(x, params, pad: Tuple[int, int]):
    """3x3 conv with one-sided time padding (full 'same' padding in F)."""
    out = jax.lax.conv_general_dilated(
        x,
        params["weight"],
        window_strides=(1, 1),
        padding=[pad, (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if "bias" in params:
        out = out + params["bias"][None, :, None, None]
    return out


def stem_track(params, state, feats: jnp.ndarray) -> jnp.ndarray:
    """conv1 + stage 1 over the whole track: [T, F] -> [T, C, F].

    Row t of the result equals the stage-1 output row r of any window w
    with w + r = t and DEPTH <= r < window - DEPTH (interior rows).  The
    time-major layout lets chunks gather window interiors without a
    per-chunk transpose of the multi-GB gathered tensor."""
    with_bn = "bn1" in params
    x = feats[None, None, :, :]
    x = L.conv2d(x, params["conv1"], stride=1, padding=1)
    x = _bn_eval(x, params.get("bn1"), state.get("bn1"), with_bn)
    x = jax.nn.relu(x)
    x, _ = _stage_apply(
        x, params["block1"], state.get("block1", {}), 1, False, with_bn
    )
    return jnp.transpose(x[0], (1, 0, 2))


def _band_stem(params, state, x: jnp.ndarray, top: bool) -> jnp.ndarray:
    """The contaminated window-edge rows of the stage-1 output.

    x: [B, 1, 2*DEPTH, F] — the first (``top=True``) or last 2*DEPTH feature
    rows of each window.  Each conv zero-pads only the window-edge side and
    stays 'valid' on the interior side, so heights telescope
    2*DEPTH -> ... -> DEPTH and every surviving row is exactly the window's
    own computation.  Returns [B, C, DEPTH, F]."""
    with_bn = "bn1" in params
    pad = (1, 0) if top else (0, 1)

    def crop(v, n):
        # Align a residual input of height h with an output of height h - n
        # (rows are edge-aligned: drop n rows from the interior side).
        return v[:, :, : v.shape[2] - n, :] if top else v[:, :, n:, :]

    x = _conv_rows(x, params["conv1"], pad)
    x = _bn_eval(x, params.get("bn1"), state.get("bn1"), with_bn)
    x = jax.nn.relu(x)

    for b in ("0", "1"):
        blk_p = params["block1"][b]
        blk_s = state.get("block1", {}).get(b, {})
        inp = x
        out = _conv_rows(x, blk_p["conv1"], pad)
        out = _bn_eval(out, blk_p.get("bn1"), blk_s.get("bn1"), with_bn)
        out = jax.nn.relu(out)
        out = _conv_rows(out, blk_p["conv2"], pad)
        out = _bn_eval(out, blk_p.get("bn2"), blk_s.get("bn2"), with_bn)
        if "shortcut" in blk_p:
            sc = L.conv2d(crop(inp, 2), blk_p["shortcut"]["0"], stride=1, padding=0)
            if with_bn:
                sc = _bn_eval(
                    sc, blk_p["shortcut"]["1"], blk_s["shortcut"]["1"], True
                )
        else:
            sc = crop(inp, 2)
        x = jax.nn.relu(out + sc)
    return x


def _conv_nhcw_hw(x, params, strides, padding):
    """Conv consuming [B, H, C, W], emitting NCHW, with per-axis strides and
    explicit per-axis padding pairs."""
    out = jax.lax.conv_general_dilated(
        x,
        params["weight"],
        window_strides=strides,
        padding=padding,
        dimension_numbers=("NHCW", "OIHW", "NCHW"),
    )
    if "bias" in params:
        out = out + params["bias"][None, :, None, None]
    return out


def _conv_dil(x, params, t_dil: int, pad_f: int = 1):
    """NCHW 3x3 conv, stride 1, time dilation ``t_dil`` ('same' in time)."""
    out = jax.lax.conv_general_dilated(
        x,
        params["weight"],
        window_strides=(1, 1),
        padding=[(t_dil, t_dil), (pad_f, pad_f)],
        rhs_dilation=(t_dil, 1),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if "bias" in params:
        out = out + params["bias"][None, :, None, None]
    return out


def stem_track2(params, state, track1: jnp.ndarray) -> jnp.ndarray:
    """Stage 2 over the whole track, à-trous: [T, C1, F] -> [T, C2, F//2].

    The window's stride-2-in-time convs become stride-1 convs evaluated at
    EVERY track position (frequency keeps its stride), with the following
    convs time-dilated by 2 — so position t of the result equals the
    stage-2 output row m of any window w with w + 2m = t, wherever the
    receptive field stays in the window interior (DEPTH2 <= m <
    H2 - DEPTH2).  Same construction as models/fully_conv.py, but spliced
    with exact per-window edge bands instead of approximating them."""
    with_bn = "bn1" in params
    p2, s2 = params["block2"], state.get("block2", {})
    b0, st0 = p2["0"], s2.get("0", {})
    x = track1[None]  # [1, T, C1, F] consumed as NHCW

    out = _conv_nhcw_hw(x, b0["conv1"], (1, 2), [(1, 1), (1, 1)])
    out = _bn_eval(out, b0.get("bn1"), st0.get("bn1"), with_bn)
    out = jax.nn.relu(out)
    out = _conv_dil(out, b0["conv2"], t_dil=2)
    out = _bn_eval(out, b0.get("bn2"), st0.get("bn2"), with_bn)
    # zoo always adds the shortcut for stride-2 stages; see _block2_first_nhcw
    sc = _conv_nhcw_hw(x, b0["shortcut"]["0"], (1, 2), [(0, 0), (0, 0)])
    if with_bn:
        sc = _bn_eval(sc, b0["shortcut"]["1"], st0["shortcut"]["1"], True)
    x = jax.nn.relu(out + sc)

    b1, st1 = p2["1"], s2.get("1", {})
    out = _conv_dil(x, b1["conv1"], t_dil=2)
    out = _bn_eval(out, b1.get("bn1"), st1.get("bn1"), with_bn)
    out = jax.nn.relu(out)
    out = _conv_dil(out, b1["conv2"], t_dil=2)
    out = _bn_eval(out, b1.get("bn2"), st1.get("bn2"), with_bn)
    x = jax.nn.relu(out + x)
    return jnp.transpose(x[0], (1, 0, 2))  # [T, C2, F2]


def _band2(params, state, band1: jnp.ndarray, strip: jnp.ndarray, top: bool):
    """Exact stage-2 output rows at one window edge.

    band1: [B, C1, DEPTH, F] from ``_band_stem``; strip: the adjacent
    interior stage-1 rows gathered from the track, [B, S, C1, F] (NHCW;
    S = 2*DEPTH2 + 1 for the top edge, 2*DEPTH2 + 2 for the bottom — the
    bottom stride-2 centers sit one row deeper).  Heights telescope
    18 -> 9 -> 8 -> 7 -> 6 (top; bottom 19 -> 9 -> ...), every conv padding
    only the window-edge side, reproducing the window's own zero pad and
    the stage's stride-2 phase.  Returns [B, C2, DEPTH2, F//2]."""
    with_bn = "bn1" in params
    p2, s2 = params["block2"], state.get("block2", {})
    b0, st0 = p2["0"], s2.get("0", {})
    b1h = jnp.transpose(band1, (0, 2, 1, 3))  # [B, DEPTH, C1, F]
    x = jnp.concatenate([b1h, strip] if top else [strip, b1h], axis=1)

    pad = (1, 0) if top else (0, 1)
    t0pad = (1, 0) if top else (0, 0)  # bottom centers touch no zero pad
    out = _conv_nhcw_hw(x, b0["conv1"], (2, 2), [t0pad, (1, 1)])  # rows: 9
    out = _bn_eval(out, b0.get("bn1"), st0.get("bn1"), with_bn)
    out = jax.nn.relu(out)
    out = _conv_rows(out, b0["conv2"], pad)  # 9 -> 8
    out = _bn_eval(out, b0.get("bn2"), st0.get("bn2"), with_bn)
    # Stride-2 1x1 shortcut: even window rows only — local rows 0,2,.. for
    # the top edge; the bottom edge's even rows start at local row 3.
    xs = x if top else x[:, 3:]
    sc = _conv_nhcw_hw(xs, b0["shortcut"]["0"], (2, 2), [(0, 0), (0, 0)])
    sc = sc[:, :, : out.shape[2]] if top else sc[:, :, -out.shape[2] :]
    if with_bn:
        sc = _bn_eval(sc, b0["shortcut"]["1"], st0["shortcut"]["1"], True)
    x = jax.nn.relu(out + sc)  # [B, C2, 8, F2]

    b1, st1 = p2["1"], s2.get("1", {})
    inp = x
    out = _conv_rows(x, b1["conv1"], pad)  # 8 -> 7
    out = _bn_eval(out, b1.get("bn1"), st1.get("bn1"), with_bn)
    out = jax.nn.relu(out)
    out = _conv_rows(out, b1["conv2"], pad)  # 7 -> 6
    out = _bn_eval(out, b1.get("bn2"), st1.get("bn2"), with_bn)
    sc = inp[:, :, :-2] if top else inp[:, :, 2:]
    return jax.nn.relu(out + sc)


def _conv_nhcw(x, params, stride: int, padding: int):
    """Scalar-stride/padding convenience over :func:`_conv_nhcw_hw` (the
    layout note there applies)."""
    return _conv_nhcw_hw(
        x, params, (stride, stride), [(padding, padding), (padding, padding)]
    )


def _block2_first_nhcw(x, params, state, with_bn):
    """The first stage-2 residual block (stride 2), consuming the spliced
    [B, H, C, W] stage-1 output directly (mirrors zoo._block_apply)."""
    out = _conv_nhcw(x, params["conv1"], stride=2, padding=1)
    out = _bn_eval(out, params.get("bn1"), state.get("bn1"), with_bn)
    out = jax.nn.relu(out)
    out = L.conv2d(out, params["conv2"], stride=1, padding=1)
    out = _bn_eval(out, params.get("bn2"), state.get("bn2"), with_bn)
    # zoo._block_init ALWAYS creates a shortcut at stride 2 (the identity
    # cannot match the halved H/W) — a missing key here means a hand-built
    # params tree, so fail loudly instead of pretending a fallback exists.
    sc = _conv_nhcw(x, params["shortcut"]["0"], stride=2, padding=0)
    if with_bn:
        sc = _bn_eval(sc, params["shortcut"]["1"], state["shortcut"]["1"], True)
    return jax.nn.relu(out + sc)


def tail_probs(
    params, state, x: jnp.ndarray, first_stage: int = 2
) -> jnp.ndarray:
    """Stages ``first_stage``..4 + head on a spliced stage-(first_stage-1)
    output, in the splice's native [B, H, C, F] NHCW layout (mirrors
    zoo.apply_fn from that stage on, train=False).  An NCHW entry flag
    used to exist but had zero callers or tests — an unexercised path in
    a bit-exactness module rots silently, so it was removed."""
    with_bn = "bn1" in params
    first = True
    for i in range(first_stage, 5):
        key = f"block{i}"
        if first:
            x = _block2_first_nhcw(
                x, params[key]["0"], state.get(key, {}).get("0", {}), with_bn
            )
            x, _ = _block_apply(
                x, params[key]["1"], state.get(key, {}).get("1", {}), 1, False, with_bn
            )
        else:
            x, _ = _stage_apply(
                x, params[key], state.get(key, {}), 2, False, with_bn
            )
        first = False
    x = L.avg_pool2d(x, 4)
    x = x.reshape(x.shape[0], -1)
    if with_bn:
        x = _bn_eval(x, params["bn2"], state["bn2"], True)
    x = L.linear(x, params["linear1"])
    if with_bn:
        x = _bn_eval(x, params["bn3"], state["bn3"], True)
    x = jax.nn.relu(x)
    x = L.linear(x, params["linear2"])
    return jax.nn.sigmoid(x)[:, 0]


def _window_starts(start, count: int) -> jnp.ndarray:
    """[count, 1] window-start column: consecutive from a scalar ``start``,
    or explicit per-window starts from a [count] vector."""
    start = jnp.asarray(start)
    if start.ndim == 0:
        return start + jnp.arange(count)[:, None]
    if start.shape[0] != count:
        # Fail fast: silently returning start.shape[0] windows where the
        # contract promises ``count`` would surface as a distant reshape
        # error (or worse, misassign windows to channels) in callers like
        # parallel/sharded_inference.chunk_local.
        raise ValueError(
            f"starts vector has {start.shape[0]} entries, expected "
            f"count={count}"
        )
    return start[:, None]


def chunk_probs_from_track(
    params,
    state,
    track: jnp.ndarray,
    feats: jnp.ndarray,
    start: jnp.ndarray,
    count: int,
    window: int = 100,
) -> jnp.ndarray:
    """Probabilities for windows ``start .. start+count-1``.

    track: [T, C, F] = ``stem_track(params, state, feats)`` (amortized
    across chunks); feats: [T, F] with T >= start + count + window - 1.
    ``start`` may also be a [count] vector of explicit window starts (used
    to flatten several channels' windows into one batch).  Returns [count]
    probs, per-window-exact (see module docstring)."""
    w0 = _window_starts(start, count)
    gathered = _gather_track_inputs(track, feats, w0, window)
    return _probs_from_track_inputs(params, state, gathered)


def _gather_track_inputs(track, feats, w0, window: int):
    """The gather stage of :func:`chunk_probs_from_track`: window interiors
    and edge-band inputs for the w0 window-start column.  Kept separate
    from the compute stage so multichannel callers can gather per channel:
    TPU row-gathers collapse when the operand grows (measured on v5e,
    identical output volume: 72 GB/s from a 6.3k-row track vs 5 GB/s from
    a channel-flattened 50k-row track — 13.6x), so gathering from each
    channel's own track is the difference between MXU-bound and
    gather-bound multichannel inference."""
    d = DEPTH
    interior_len = window - 2 * d
    # Gather straight from the time-major track — [B, interior, C, F] — and
    # keep that layout through block2's first convs (dimension_numbers), so
    # no multi-GB transpose/copy of the gathered tensor is materialized.
    interior = track[w0 + d + jnp.arange(interior_len)[None, :]]
    top_in = feats[w0 + jnp.arange(2 * d)[None, :]][:, None]
    bot_in = feats[w0 + (window - 2 * d) + jnp.arange(2 * d)[None, :]][:, None]
    return top_in, bot_in, interior


def _probs_from_track_inputs(params, state, gathered) -> jnp.ndarray:
    """Compute stage of :func:`chunk_probs_from_track` (band stems + splice
    + tail) on already-gathered window inputs; batch dims concatenate
    across channels before this point so the convs see one big batch."""
    top_in, bot_in, interior = gathered
    top = _band_stem(params, state, top_in, top=True)
    bot = _band_stem(params, state, bot_in, top=False)
    to_hcf = lambda b: jnp.transpose(b, (0, 2, 1, 3))  # [B, d, C, F] (tiny)

    x = jnp.concatenate([to_hcf(top), interior, to_hcf(bot)], axis=1)
    return tail_probs(params, state, x)


def chunk_probs_multichannel_from_track(
    params,
    state,
    tracks: jnp.ndarray,
    feats: jnp.ndarray,
    start: jnp.ndarray,
    chunk: int,
    window: int = 100,
) -> jnp.ndarray:
    """Windows ``start .. start+chunk-1`` of EVERY channel in one call.

    tracks: [C, T, C1, F] stacked per-channel ``stem_track`` outputs;
    feats: [C, T, F].  Each channel runs the FULL single-channel
    formulation — its own static-slice gather feeding its own conv batch
    of ``chunk`` windows — and only the tiny [chunk] prob vectors
    concatenate.  Returns [C * chunk] probs, channel-major (channel c's
    windows at c*chunk .. (c+1)*chunk-1).

    Two retired formulations, both measured slower (the gathers must be
    per channel either way — a channel-flattened track collapses TPU
    gather throughput 13.6x, see _gather_track_inputs):
      * concat the per-channel gathers into ONE C*chunk conv batch
        (r04 production): +28-31% per window vs the single-channel path,
        invariant to dispatch count — the concat materializes the full
        gathered window batch that the single-channel path streams
        straight from gather into the convs.  Per-channel conv batches
        restore the single-channel per-window rate exactly (0.2346 vs
        0.2339 s per 49k-window pass; tools/sharded_windows_probe.py,
        v5e 2026-08-21) and flip the batched-vs-sequential comparison:
        batched featurize is 1.7x faster than sequential, so the batched
        graph went from 19% slower to ~13% faster per audio-second.
      * vmap over channels: hits the same gather cliff and compiles the
        mapped convs badly (the mapped axis can't merge into the conv
        batch)."""
    w0 = _window_starts(start, chunk)
    outs = [
        _probs_from_track_inputs(
            params,
            state,
            _gather_track_inputs(tracks[c], feats[c], w0, window),
        )
        for c in range(tracks.shape[0])
    ]
    return jnp.concatenate(outs)


def supports_track2(window: int) -> bool:
    """Stage-2 sharing needs an EVEN window with a non-empty interior at
    half resolution.  The even-window requirement is about the band/splice
    GEOMETRY, not phase alignment (stem_track2 evaluates every track
    position, so any phase is available): the splice assumes the stage-2
    height is exactly window/2 (odd windows produce (window+1)/2 and the
    6+interior+6 splice height would be wrong), and the bottom band's
    t0pad=(0, 0) holds only when the last conv1 center 2*(h2-1)+1 ==
    window-1 touches no zero pad — true iff the window is even."""
    return window % 2 == 0 and window // 2 > 2 * DEPTH2


def chunk_probs_from_track2(
    params,
    state,
    track1: jnp.ndarray,
    track2: jnp.ndarray,
    feats: jnp.ndarray,
    start: jnp.ndarray,
    count: int,
    window: int = 100,
) -> jnp.ndarray:
    """Like :func:`chunk_probs_from_track`, but with stage 2 also shared:
    the per-window tensor materializes at half resolution ([B, window/2,
    C2, F/2] — 8x smaller), windows read stage-2 interiors from ``track2``
    (= ``stem_track2(params, state, track1)``) and only the DEPTH2-row edge
    bands run per window.  ``start`` may be a [count] vector like
    :func:`chunk_probs_from_track`.  Requires ``supports_track2(window)``."""
    if not supports_track2(window):
        # Enforce the precondition here, not just at the callers: an odd
        # window runs CLEAN (splice height off by one, downstream shapes
        # coincide) and returns silently wrong probabilities; small even
        # windows make the bottom-strip start negative and the gather
        # wraps to the track END.  Free at trace time.
        raise ValueError(
            f"chunk_probs_from_track2 requires supports_track2(window) "
            f"(even, window // 2 > {2 * DEPTH2}); got window={window}"
        )
    w0 = _window_starts(start, count)
    gathered = _gather_track2_inputs(track1, track2, feats, w0, window)
    return _probs_from_track2_inputs(params, state, gathered)


def _gather_track2_inputs(track1, track2, feats, w0, window: int):
    """Gather stage of :func:`chunk_probs_from_track2` (see
    _gather_track_inputs for why it is split out)."""
    d, d2 = DEPTH, DEPTH2
    h2 = window // 2
    top_in = feats[w0 + jnp.arange(2 * d)[None, :]][:, None]
    bot_in = feats[w0 + (window - 2 * d) + jnp.arange(2 * d)[None, :]][:, None]
    # Stage-1 interior strips adjacent to each band (window rows
    # DEPTH..2*DEPTH2+5 and 2*(H2-DEPTH2-3)-1..window-DEPTH-1).
    strip_t = track1[w0 + d + jnp.arange(2 * d2 + 1)[None, :]]
    blo = 2 * (h2 - d2 - 3) - 1
    strip_b = track1[w0 + blo + jnp.arange(window - d - blo)[None, :]]
    # Stage-2 interior: window row m at half resolution = track position
    # w + 2m, for m in [DEPTH2, H2 - DEPTH2).
    interior = track2[w0 + 2 * d2 + 2 * jnp.arange(h2 - 2 * d2)[None, :]]
    return top_in, bot_in, strip_t, strip_b, interior


def _probs_from_track2_inputs(params, state, gathered) -> jnp.ndarray:
    """Compute stage of :func:`chunk_probs_from_track2` on already-gathered
    window inputs."""
    top_in, bot_in, strip_t, strip_b, interior = gathered
    band1t = _band_stem(params, state, top_in, top=True)
    band1b = _band_stem(params, state, bot_in, top=False)
    band2t = _band2(params, state, band1t, strip_t, top=True)
    band2b = _band2(params, state, band1b, strip_b, top=False)

    to_hcf = lambda b: jnp.transpose(b, (0, 2, 1, 3))
    x = jnp.concatenate([to_hcf(band2t), interior, to_hcf(band2b)], axis=1)
    return tail_probs(params, state, x, first_stage=3)


def chunk_probs_multichannel_from_track2(
    params,
    state,
    tracks1: jnp.ndarray,
    tracks2: jnp.ndarray,
    feats: jnp.ndarray,
    start: jnp.ndarray,
    chunk: int,
    window: int = 100,
) -> jnp.ndarray:
    """Stage-2-shared twin of :func:`chunk_probs_multichannel_from_track`:
    each channel runs the full single-channel formulation (own gather, own
    ``chunk``-window conv batch — see the track twin's docstring for the
    measured case against the retired concat-into-one-batch formulation);
    only the [chunk] prob vectors concatenate.  Returns [C * chunk]
    channel-major probs."""
    if not supports_track2(window):
        raise ValueError(
            f"chunk_probs_multichannel_from_track2 requires "
            f"supports_track2(window); got window={window}"
        )
    w0 = _window_starts(start, chunk)
    outs = [
        _probs_from_track2_inputs(
            params,
            state,
            _gather_track2_inputs(tracks1[c], tracks2[c], feats[c], w0, window),
        )
        for c in range(tracks1.shape[0])
    ]
    return jnp.concatenate(outs)

"""Primitive layers with torch-compatible numerics and parameter layout.

Parameters are stored with torch's shapes and names (conv OIHW, linear
[out, in], BatchNorm weight/bias + running_mean/running_var buffers) so the
reference's ``.pth.tar`` checkpoints convert 1:1 into our pytrees
(reference utils/torch_utils.py:55-93) — the layout translation to whatever
XLA:TPU prefers happens inside the compiler, not in the checkpoint format.

Numerics mirrored:
- BatchNorm (train): normalize by biased batch variance, update running stats
  with momentum 0.1 using the *unbiased* variance, eps 1e-5.
- Dropout: inverted scaling (keep_prob division) at train time.
- AvgPool2d(k): stride k, floor division, no padding.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]


# --------------------------------------------------------------------------- #
# Conv / Linear
# --------------------------------------------------------------------------- #


def conv2d(
    x: jnp.ndarray,
    params: Params,
    stride: int = 1,
    padding: int = 1,
) -> jnp.ndarray:
    """NCHW conv with OIHW weights (torch layout)."""
    out = jax.lax.conv_general_dilated(
        x,
        params["weight"],
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if "bias" in params:
        out = out + params["bias"][None, :, None, None]
    return out


def linear(x: jnp.ndarray, params: Params) -> jnp.ndarray:
    """[B, in] x torch-layout weight [out, in] + bias."""
    return x @ params["weight"].T + params["bias"]


# --------------------------------------------------------------------------- #
# BatchNorm
# --------------------------------------------------------------------------- #

BN_EPS = 1e-5
BN_MOMENTUM = 0.1


def batch_norm(
    x: jnp.ndarray,
    params: Params,
    state: Params,
    train: bool,
) -> Tuple[jnp.ndarray, Params]:
    """BatchNorm over the channel axis (axis 1 for NCHW, axis -1 for 2D).

    Returns (y, new_state). ``state`` holds running_mean / running_var /
    num_batches_tracked (torch buffer names).
    """
    if x.ndim == 4:
        axes = (0, 2, 3)
        shape = (1, -1, 1, 1)
    elif x.ndim == 2:
        axes = (0,)
        shape = (1, -1)
    else:
        raise ValueError(f"batch_norm expects 2D or 4D input, got {x.ndim}D")

    if train:
        n = x.size // x.shape[1 if x.ndim == 4 else -1]
        if n <= 1:
            # torch raises exactly here ('Expected more than 1 value per
            # channel when training'); silently continuing would compute a
            # zero 'unbiased' variance for the single sample and quietly
            # decay running_var toward 0 — a crash-vs-silent train-parity
            # divergence.  n is shape-derived, so this fires at trace time.
            raise ValueError(
                f"batch_norm(train=True) needs more than 1 value per "
                f"channel, got {n} (size-1 tail batch? use drop_remainder)"
            )
        # Batch statistics in float32 regardless of the activation dtype
        # (a no-op for f32 inputs, so torch bit-parity is untouched): under
        # mixed-precision training (build_step_fns compute_dtype) x is
        # bf16, and both a bf16 reduction over the batch AND a bf16
        # running-stat accumulation lose the small momentum updates —
        # new = 0.9*old + 0.1*batch rounds to `old` whenever the change is
        # below old/256, silently freezing the stats on the bf16 grid.
        # Stats reduce in f32 here, the running update stays f32 (state is
        # f32 masters), and only the NORMALIZATION runs in x.dtype so the
        # bf16 activation chain is preserved.
        xf = x.astype(jnp.float32)
        mean32 = jnp.mean(xf, axis=axes)
        var32 = jnp.mean((xf - mean32.reshape(shape)) ** 2, axis=axes)
        unbiased32 = var32 * (n / (n - 1))
        new_state = {
            # jnp.asarray as in the eval branch: a host-numpy running stat
            # would otherwise update under numpy promotion rules.
            "running_mean": (1 - BN_MOMENTUM) * jnp.asarray(state["running_mean"])
            + BN_MOMENTUM * mean32,
            "running_var": (1 - BN_MOMENTUM) * jnp.asarray(state["running_var"])
            + BN_MOMENTUM * unbiased32,
            "num_batches_tracked": state["num_batches_tracked"] + 1,
        }
        mean = mean32.astype(x.dtype)
        var = var32.astype(x.dtype)
    else:
        # jnp.asarray: host-resident (numpy) trees must not run `var + eps`
        # under NUMPY promotion rules — ml_dtypes bf16 + python float
        # promotes to float32 there, while jnp's weak-type rules keep bf16;
        # the mismatch explodes at the next conv (hit by export's host
        # trees and any bf16 pipeline built from load_checkpoint(host=True)).
        mean = jnp.asarray(state["running_mean"])
        var = jnp.asarray(state["running_var"])
        new_state = state

    inv = jax.lax.rsqrt(var + BN_EPS)
    y = (x - mean.reshape(shape)) * (params["weight"] * inv).reshape(shape)
    y = y + params["bias"].reshape(shape)
    return y, new_state


def bn_eval_affine(params: Params, state: Params) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inference-mode BatchNorm folded to per-channel (scale, bias):
    ``y = x * scale + bias``.

    The single folded-BN implementation for the fused/dilated fast paths
    (models/fully_conv.py).  NOTE: algebraically equal to
    ``batch_norm(train=False)`` but NOT bit-identical in floating point —
    paths that must stay bit-exact with the reference windows pipeline
    (models/shared_stem.py) deliberately call :func:`batch_norm` instead.
    """
    # jnp.asarray for the same host-numpy-tree reason as batch_norm's eval
    # branch: numpy would promote bf16 + python-float eps to float32.
    inv = jax.lax.rsqrt(jnp.asarray(state["running_var"]) + BN_EPS)
    scale = params["weight"] * inv
    return scale, params["bias"] - jnp.asarray(state["running_mean"]) * scale


def bn_init(num_features: int) -> Tuple[Params, Params]:
    params = {
        "weight": jnp.ones(num_features, dtype=jnp.float32),
        "bias": jnp.zeros(num_features, dtype=jnp.float32),
    }
    state = {
        "running_mean": jnp.zeros(num_features, dtype=jnp.float32),
        "running_var": jnp.ones(num_features, dtype=jnp.float32),
        "num_batches_tracked": jnp.zeros((), dtype=jnp.int32),
    }
    return params, state


# --------------------------------------------------------------------------- #
# Pooling / dropout
# --------------------------------------------------------------------------- #


def avg_pool2d(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """torch AvgPool2d(k): stride k, no padding, floor output size."""
    b, c, h, w = x.shape
    oh, ow = h // k, w // k
    x = x[:, :, : oh * k, : ow * k]
    x = x.reshape(b, c, oh, k, ow, k)
    return jnp.mean(x, axis=(3, 5))


def dropout(
    x: jnp.ndarray, rate: float, rng: Optional[jax.Array], train: bool
) -> jnp.ndarray:
    if not train or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# --------------------------------------------------------------------------- #
# Initializers
# --------------------------------------------------------------------------- #


def conv_init(
    rng: jax.Array, in_ch: int, out_ch: int, k: int, bias: bool
) -> Params:
    """torch default conv init (kaiming-uniform fan_in with a=sqrt(5) ->
    U[-1/sqrt(fan_in), 1/sqrt(fan_in)] scaled; only used before the
    reference's blanket normal(0, 0.01) re-init, so a simple uniform
    suffices for shape bootstrapping)."""
    k1, k2 = jax.random.split(rng)
    fan_in = in_ch * k * k
    bound = 1.0 / jnp.sqrt(fan_in)
    params = {
        "weight": jax.random.uniform(
            k1, (out_ch, in_ch, k, k), minval=-bound, maxval=bound
        )
    }
    if bias:
        params["bias"] = jax.random.uniform(
            k2, (out_ch,), minval=-bound, maxval=bound
        )
    return params


def linear_init(rng: jax.Array, in_f: int, out_f: int) -> Params:
    k1, k2 = jax.random.split(rng)
    bound = 1.0 / jnp.sqrt(in_f)
    return {
        "weight": jax.random.uniform(
            k1, (out_f, in_f), minval=-bound, maxval=bound
        ),
        "bias": jax.random.uniform(k2, (out_f,), minval=-bound, maxval=bound),
    }


def reference_init(params, rng: jax.Array, std: float = 0.01):
    """The reference's blanket re-init: normal(0, 0.01) on EVERY parameter,
    including BatchNorm weights and biases (reference utils/torch_utils.py:22-24,
    train.py:425).  BN running stats are torch *buffers*, not parameters, so
    they are untouched — our ``state`` pytrees are likewise left alone.
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rngs = jax.random.split(rng, len(leaves))
    new_leaves = [
        jax.random.normal(r, leaf.shape, dtype=leaf.dtype) * std
        for r, leaf in zip(rngs, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)

"""The laughter-classifier model zoo, functional-JAX.

Architectural contract from reference models.py (see SURVEY.md §2.4):

- ``ResNetBigger`` (reference models.py:181-244) — the production model:
  conv3x3(1->64, no bias) -> BN -> ReLU, then 4 stages of two residual blocks
  (strides 1,2,2,2; channel plan from config ``filter_sizes``), AvgPool2d(4),
  flatten, BN1d -> dropout -> Linear(->32) -> BN1d -> dropout -> ReLU ->
  Linear(->1) -> sigmoid.
- ``ResidualBlock`` (reference models.py:82-115): conv3x3(+bias)->BN->ReLU->
  conv3x3(+bias)->BN, 1x1-conv(no bias)+BN shortcut when shape changes, add,
  ReLU.
- ``ResNet`` (reference models.py:118-178): fixed 32-channel variant.
- ``ResNetNoBN`` / ``ResidualBlockNoBN`` (reference models.py:43-79, 247-308):
  no batch norm anywhere.
- ``MLPModel`` (reference models.py:6-40): 3-layer MLP with BN + dropout.

Parameters/state are nested dicts keyed with the torch ``state_dict`` names
(``conv1.weight``, ``block1.0.bn1.running_mean``, ...) flattened one level per
dict, so reference checkpoints map 1:1 (train/checkpoint.py).

Each model is a :class:`Model` with pure ``init`` / ``apply``; ``apply``
returns (probabilities [B], new_state).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from laughter_detection_icsi_tpu.models import layers as L

PyTree = Any


# --------------------------------------------------------------------------- #
# Residual blocks
# --------------------------------------------------------------------------- #


def _block_init(rng, in_ch, out_ch, stride, with_bn):
    ks = jax.random.split(rng, 4)
    params = {
        "conv1": L.conv_init(ks[0], in_ch, out_ch, 3, bias=True),
        "conv2": L.conv_init(ks[1], out_ch, out_ch, 3, bias=True),
    }
    state = {}
    if with_bn:
        params["bn1"], state["bn1"] = L.bn_init(out_ch)
        params["bn2"], state["bn2"] = L.bn_init(out_ch)
    if stride != 1 or in_ch != out_ch:
        shortcut = {"0": L.conv_init(ks[2], in_ch, out_ch, 1, bias=False)}
        if with_bn:
            sc_bn, sc_bn_state = L.bn_init(out_ch)
            shortcut["1"] = sc_bn
            state["shortcut"] = {"1": sc_bn_state}
        params["shortcut"] = shortcut
    return params, state


def _block_apply(x, params, state, stride, train, with_bn):
    new_state: Dict[str, Any] = {}
    out = L.conv2d(x, params["conv1"], stride=stride, padding=1)
    if with_bn:
        out, new_state["bn1"] = L.batch_norm(out, params["bn1"], state["bn1"], train)
    out = jax.nn.relu(out)
    out = L.conv2d(out, params["conv2"], stride=1, padding=1)
    if with_bn:
        out, new_state["bn2"] = L.batch_norm(out, params["bn2"], state["bn2"], train)

    if "shortcut" in params:
        sc = L.conv2d(x, params["shortcut"]["0"], stride=stride, padding=0)
        if with_bn:
            sc, sc_state = L.batch_norm(
                sc, params["shortcut"]["1"], state["shortcut"]["1"], train
            )
            new_state["shortcut"] = {"1": sc_state}
    else:
        sc = x
    return jax.nn.relu(out + sc), new_state


def _stage_init(rng, in_ch, out_ch, stride, with_bn):
    """Two residual blocks: the first with the given stride, the second with
    stride 1 (reference models.py:216-220)."""
    k0, k1 = jax.random.split(rng)
    p0, s0 = _block_init(k0, in_ch, out_ch, stride, with_bn)
    p1, s1 = _block_init(k1, out_ch, out_ch, 1, with_bn)
    return {"0": p0, "1": p1}, {"0": s0, "1": s1}


def _stage_apply(x, params, state, stride, train, with_bn):
    # state.get: a torch-imported NoBN state tree is empty (no buffers), so
    # the block skeleton may be absent entirely.
    x, s0 = _block_apply(x, params["0"], state.get("0", {}), stride, train, with_bn)
    x, s1 = _block_apply(x, params["1"], state.get("1", {}), 1, train, with_bn)
    return x, {"0": s0, "1": s1}


# --------------------------------------------------------------------------- #
# Model wrapper
# --------------------------------------------------------------------------- #


@dataclasses.dataclass(frozen=True)
class Model:
    """A functional model: init(rng) -> (params, state);
    apply(params, state, x, train, rng) -> (probs [B], new_state)."""

    name: str
    init_fn: Any
    apply_fn: Any
    dropout_rate: float

    def init(self, rng: jax.Array) -> Tuple[PyTree, PyTree]:
        return self.init_fn(rng)

    def apply(
        self,
        params: PyTree,
        state: PyTree,
        x: jnp.ndarray,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, PyTree]:
        if train and rng is None and self.dropout_rate > 0.0:
            raise ValueError(
                f"{self.name}.apply(train=True) needs an rng: dropout_rate="
                f"{self.dropout_rate} would silently act as 0.0 without one"
            )
        return self.apply_fn(params, state, x, train, rng)


# --------------------------------------------------------------------------- #
# ResNetBigger / ResNet / ResNetNoBN
# --------------------------------------------------------------------------- #


def _resnet_family(
    name: str,
    dropout_rate: float,
    linear_layer_size: int,
    filter_sizes: Sequence[int],
    stem_channels: int,
    with_bn: bool,
) -> Model:
    filter_sizes = list(filter_sizes)
    if len(filter_sizes) != 4:
        # The family is a fixed 4-stage network: extra entries would be
        # SILENTLY dropped (the worst outcome — a different net than the
        # config states, possibly running clean on a coinciding head
        # size), and fewer died as a bare IndexError inside init.
        raise ValueError(
            f"{name} needs exactly 4 filter_sizes (one per stage), "
            f"got {len(filter_sizes)}: {tuple(filter_sizes)}"
        )
    strides = [1, 2, 2, 2]
    chans = [stem_channels] + filter_sizes

    def init_fn(rng):
        ks = jax.random.split(rng, 8)
        params: Dict[str, Any] = {
            "conv1": L.conv_init(ks[0], 1, stem_channels, 3, bias=False)
        }
        state: Dict[str, Any] = {}
        if with_bn:
            params["bn1"], state["bn1"] = L.bn_init(stem_channels)
        for i in range(4):
            p, s = _stage_init(
                ks[1 + i], chans[i], chans[i + 1], strides[i], with_bn
            )
            params[f"block{i + 1}"] = p
            state[f"block{i + 1}"] = s
        if with_bn:
            params["bn2"], state["bn2"] = L.bn_init(linear_layer_size)
            params["bn3"], state["bn3"] = L.bn_init(32)
        params["linear1"] = L.linear_init(ks[5], linear_layer_size, 32)
        params["linear2"] = L.linear_init(ks[6], 32, 1)
        return params, state

    def apply_fn(params, state, x, train, rng):
        new_state: Dict[str, Any] = {}
        out = L.conv2d(x, params["conv1"], stride=1, padding=1)
        if with_bn:
            out, new_state["bn1"] = L.batch_norm(
                out, params["bn1"], state["bn1"], train
            )
        out = jax.nn.relu(out)
        for i in range(4):
            key = f"block{i + 1}"
            out, new_state[key] = _stage_apply(
                out, params[key], state.get(key, {}), strides[i], train, with_bn
            )
        out = L.avg_pool2d(out, 4)
        out = out.reshape(out.shape[0], -1)  # NCHW flatten, torch .view order
        if with_bn:
            out, new_state["bn2"] = L.batch_norm(
                out, params["bn2"], state["bn2"], train
            )
        r1 = r2 = None
        if rng is not None:
            r1, r2 = jax.random.split(rng)
        out = L.dropout(out, dropout_rate, r1, train)
        out = L.linear(out, params["linear1"])
        if with_bn:
            out, new_state["bn3"] = L.batch_norm(
                out, params["bn3"], state["bn3"], train
            )
        out = L.dropout(out, dropout_rate, r2, train)
        out = jax.nn.relu(out)
        out = L.linear(out, params["linear2"])
        probs = jax.nn.sigmoid(out)[:, 0]
        return probs, new_state

    return Model(name=name, init_fn=init_fn, apply_fn=apply_fn, dropout_rate=dropout_rate)


def _check_fixed_filter_plan(name: str, filter_sizes, fixed: Tuple[int, ...]):
    """ResNet/ResNetNoBN hardcode their channel plans (the reference
    constructors don't even accept ``filter_sizes`` — models.py:123,252, so a
    config that passed one would crash there).  Accept a matching plan (the
    CLI forwards every preset's filter_sizes unconditionally), reject a
    different one loudly — silently building a different network than the
    config states is the worst outcome (a coinciding head size can make it
    run without any shape error)."""
    if filter_sizes is not None and tuple(filter_sizes) != fixed:
        raise ValueError(
            f"{name} hardcodes filter plan {fixed} (its reference "
            f"constructor takes no filter_sizes); got {tuple(filter_sizes)}"
        )


def ResNetBigger(
    dropout_rate: float = 0.5,
    linear_layer_size: int = 192,
    filter_sizes: Sequence[int] = (64, 32, 16, 16),
) -> Model:
    """reference models.py:181-244."""
    return _resnet_family(
        "ResNetBigger",
        dropout_rate,
        linear_layer_size,
        filter_sizes,
        stem_channels=64,
        with_bn=True,
    )


def ResNet(
    dropout_rate: float = 0.5,
    linear_layer_size: int = 192,
    filter_sizes: Optional[Sequence[int]] = None,
) -> Model:
    """reference models.py:118-178: 32-channel stem.  The reference hardcodes
    a 192-feature head (sized for the legacy (44, 128) Gillick features); we
    keep that default but make it configurable so the model also fits the
    (100, 44) ICSI features (head 48)."""
    _check_fixed_filter_plan("ResNet", filter_sizes, (32, 16, 16, 16))
    return _resnet_family(
        "ResNet",
        dropout_rate,
        linear_layer_size=linear_layer_size,
        filter_sizes=(32, 16, 16, 16),
        stem_channels=32,
        with_bn=True,
    )


def ResNetNoBN(
    dropout_rate: float = 0.5,
    linear_layer_size: int = 192,
    filter_sizes: Optional[Sequence[int]] = None,
) -> Model:
    """reference models.py:247-308: ResNetBigger shape without batch norm."""
    _check_fixed_filter_plan("ResNetNoBN", filter_sizes, (64, 32, 16, 16))
    return _resnet_family(
        "ResNetNoBN",
        dropout_rate,
        linear_layer_size,
        filter_sizes=(64, 32, 16, 16),
        stem_channels=64,
        with_bn=False,
    )


# --------------------------------------------------------------------------- #
# MLP
# --------------------------------------------------------------------------- #


def MLPModel(
    linear_layer_size: int = 101 * 40,
    hid_dim1: int = 600,
    hid_dim2: int = 100,
    dropout_rate: float = 0.5,
    filter_sizes: Optional[Sequence[int]] = None,  # accepted-and-ignored,
    # exactly like the reference constructor (models.py:7)
) -> Model:
    """reference models.py:6-40.  ``linear_layer_size`` is the INPUT dim
    (the flattened window size), not a head width like the ResNets'."""
    del filter_sizes

    def init_fn(rng):
        ks = jax.random.split(rng, 3)
        params = {
            "linear1": L.linear_init(ks[0], linear_layer_size, hid_dim1),
            "linear2": L.linear_init(ks[1], hid_dim1, hid_dim2),
            "linear3": L.linear_init(ks[2], hid_dim2, 1),
        }
        state = {}
        params["bn1"], state["bn1"] = L.bn_init(hid_dim1)
        params["bn2"], state["bn2"] = L.bn_init(hid_dim2)
        return params, state

    def apply_fn(params, state, x, train, rng):
        new_state = {}
        if x.ndim > 1:
            feat = 1
            for d in x.shape[1:]:
                feat *= int(d)
            if feat != linear_layer_size:
                # The reference's view(-1, input_dim) (models.py:24) would
                # silently REGROUP the batch whenever the flattened window
                # size happens to divide by input_dim (e.g. 4400-feature
                # windows into a 48-input MLP -> wrong output count, no
                # error).  Fail fast on the misconfiguration instead; for
                # correctly-sized inputs the reshape is identical.
                raise ValueError(
                    f"MLPModel(linear_layer_size={linear_layer_size}) got "
                    f"windows of {feat} features each (input shape "
                    f"{tuple(x.shape)}); linear_layer_size must equal the "
                    "flattened window size"
                )
        x = x.reshape(-1, linear_layer_size)
        r1 = r2 = None
        if rng is not None:
            r1, r2 = jax.random.split(rng)
        h = L.linear(x, params["linear1"])
        h, new_state["bn1"] = L.batch_norm(h, params["bn1"], state["bn1"], train)
        h = L.dropout(h, dropout_rate, r1, train)
        h = jax.nn.relu(h)
        h = L.linear(h, params["linear2"])
        h, new_state["bn2"] = L.batch_norm(h, params["bn2"], state["bn2"], train)
        h = L.dropout(h, dropout_rate, r2, train)
        h = jax.nn.relu(h)
        out = L.linear(h, params["linear3"])
        return jax.nn.sigmoid(out)[:, 0], new_state

    return Model(
        name="MLPModel", init_fn=init_fn, apply_fn=apply_fn, dropout_rate=dropout_rate
    )


MODEL_REGISTRY = {
    "ResNetBigger": ResNetBigger,
    "ResNet": ResNet,
    "ResNetNoBN": ResNetNoBN,
    "MLPModel": MLPModel,
}


def build(
    architecture: str,
    dropout_rate: float = 0.5,
    linear_layer_size: Optional[int] = None,
    filter_sizes: Optional[Sequence[int]] = None,
) -> Model:
    """Build a model by architecture name (resolves config.ModelPreset.model).

    ``linear_layer_size`` / ``filter_sizes`` left as None take each
    architecture's own reference default — ``linear_layer_size`` in
    particular means different things per arch (ResNet head width 192 vs the
    MLP's INPUT dim 4040), so one shared default here would silently
    mis-size some archs.  Explicit values are forwarded and validated by the
    constructor (ResNet/ResNetNoBN reject a filter plan they don't
    implement; MLPModel ignores filter_sizes like the reference)."""
    if architecture not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown architecture {architecture!r}; "
            f"available: {sorted(MODEL_REGISTRY)}"
        )
    kwargs: Dict[str, Any] = {"dropout_rate": dropout_rate}
    if linear_layer_size is not None:
        kwargs["linear_layer_size"] = linear_layer_size
    if filter_sizes is not None:
        kwargs["filter_sizes"] = filter_sizes
    return MODEL_REGISTRY[architecture](**kwargs)


def count_parameters(params: PyTree) -> int:
    """reference utils/torch_utils.py:17-19."""
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))

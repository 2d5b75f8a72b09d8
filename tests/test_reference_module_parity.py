"""Differentials against the LITERAL reference module as oracle.

Every other model differential in this suite uses a hand-written in-test
torch twin; a twin can encode the same misreading of the reference as the
JAX port, while the actual reference code cannot.  Here we importlib-load
``/root/reference/models.py`` itself (it imports with only torch+numpy —
reference models.py:1-4) and pin, for all four architectures
(reference models.py:6-40 MLPModel, 118-178 ResNet, 181-244 ResNetBigger,
247-308 ResNetNoBN):

  * state_dict layout parity (key set, shapes, parameter count),
  * forward-probability parity from reference-initialized weights
    converted into our pytrees,
  * the reverse direction: our exported state_dict loads into the
    reference module with ``strict=True`` and produces the same
    probabilities — i.e. checkpoints are interchangeable both ways.

Gated on the reference mount existing (same pattern as the
torchaudio/lhotse differentials): the suite stays green where
/root/reference is absent, and the oracle auto-activates where present.
"""

import importlib.util
import os
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

from laughter_detection_icsi_tpu import models  # noqa: E402
from laughter_detection_icsi_tpu.train import checkpoint as ckpt  # noqa: E402

REF_MODELS = "/root/reference/models.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_MODELS),
    reason="reference checkout not mounted at /root/reference",
)


@pytest.fixture(scope="module")
def ref():
    """The reference models module, loaded from its actual source file."""
    spec = importlib.util.spec_from_file_location("reference_models", REF_MODELS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _case(ref, name):
    """name -> (reference model, our model, input shape) — constructed
    lazily, only the requested pair (the suite runs on a 1-core host).

    Geometries follow the reference's own constraints: the heads are sized
    by ``linear_layer_size`` which must equal the flattened feature count
    after the conv stacks + AvgPool2d(4) (reference models.py:210-231), so
    a (100, 44) log-mel window gives 48 flat features for the
    ResNetBigger/ResNetNoBN topology and (100, 128) gives 192 for ResNet's
    fixed stem."""
    makers = {
        "ResNetBigger": lambda: (
            ref.ResNetBigger(dropout_rate=0.5, linear_layer_size=48),
            models.build("ResNetBigger", dropout_rate=0.0, linear_layer_size=48),
            (8, 1, 100, 44),
        ),
        "ResNet": lambda: (
            ref.ResNet(dropout_rate=0.5),
            models.build("ResNet", dropout_rate=0.0, linear_layer_size=192),
            (8, 1, 100, 128),
        ),
        "ResNetNoBN": lambda: (
            ref.ResNetNoBN(dropout_rate=0.5, linear_layer_size=48),
            models.build("ResNetNoBN", dropout_rate=0.0, linear_layer_size=48),
            (8, 1, 100, 44),
        ),
        "MLPModel": lambda: (
            ref.MLPModel(linear_layer_size=100 * 44, dropout_rate=0.5),
            models.MLPModel(linear_layer_size=100 * 44, dropout_rate=0.0),
            (8, 1, 100, 44),
        ),
    }
    return makers[name]()


_NAMES = ["ResNetBigger", "ResNet", "ResNetNoBN", "MLPModel"]


def _x(shape, seed=11):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("name", _NAMES)
def test_state_dict_layout_matches_reference(ref, name):
    tm, jm, _ = _case(ref, name)
    params, state = jm.init(jax.random.PRNGKey(0))
    ours = ckpt.to_torch_state_dict(params, state)
    theirs = tm.state_dict()
    assert set(ours) == set(theirs)
    for k, v in theirs.items():
        assert ours[k].shape == tuple(v.shape), k
    assert models.count_parameters(params) == sum(
        p.numel() for p in tm.parameters()
    )


@pytest.mark.parametrize("name", _NAMES)
def test_forward_parity_from_reference_weights(ref, name):
    """Reference-initialized weights -> our pytrees -> identical probs."""
    tm, jm, shape = _case(ref, name)
    tm.eval()
    params, state = ckpt.from_torch_state_dict(tm.state_dict())
    x = _x(shape)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy().squeeze(-1)
    got, _ = jm.apply(params, state, x, train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("name", _NAMES)
def test_our_checkpoint_loads_into_reference_module(ref, name):
    """Our init -> torch state_dict -> reference module (strict=True) ->
    identical probs: exported checkpoints work in the reference code."""
    tm, jm, shape = _case(ref, name)
    params, state = jm.init(jax.random.PRNGKey(7))
    flat = ckpt.to_torch_state_dict(params, state)
    tm.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in flat.items()},
        strict=True,
    )
    tm.eval()
    x = _x(shape, seed=13)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy().squeeze(-1)
    got, _ = jm.apply(params, state, x, train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)

"""Torch differentials for the rest of the zoo: ResNet, ResNetNoBN, MLPModel
(reference models.py:6-40, 118-178, 247-308), mirroring the ResNetBigger
pattern in test_model_parity.py — state_dict-identical torch twins written
from the architectural contract, loaded into our pytrees, forward parity to
fp tolerance, checkpoint round-trips both directions.
"""

import jax
import numpy as np
import pytest
import torch
from torch import nn

from laughter_detection_icsi_tpu import models
from laughter_detection_icsi_tpu.train import checkpoint as ckpt

torch.manual_seed(1)


class TorchBlock(nn.Module):
    """reference models.py:82-115 (with BN)."""

    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=True)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, stride=1, padding=1, bias=True)
        self.bn2 = nn.BatchNorm2d(cout)
        self.shortcut = nn.Sequential()
        if stride != 1 or cin != cout:
            self.shortcut = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        h = torch.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        return torch.relu(h + self.shortcut(x))


class TorchBlockNoBN(nn.Module):
    """reference models.py:43-79: conv->relu->conv, bias convs, bare 1x1
    shortcut."""

    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=True)
        self.conv2 = nn.Conv2d(cout, cout, 3, stride=1, padding=1, bias=True)
        self.shortcut = nn.Sequential()
        if stride != 1 or cin != cout:
            self.shortcut = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False)
            )

    def forward(self, x):
        h = torch.relu(self.conv1(x))
        h = self.conv2(h)
        return torch.relu(h + self.shortcut(x))


class TorchResNet(nn.Module):
    """reference models.py:118-178: fixed 32-channel stem, 192-feature head
    (sized for the legacy feature geometry; we test with an input that
    produces 192 flat features, as the reference requires)."""

    def __init__(self, p=0.0, linear_layer_size=192):
        super().__init__()
        self.conv1 = nn.Conv2d(1, 32, 3, stride=1, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(32)
        self.block1 = nn.Sequential(TorchBlock(32, 32, 1), TorchBlock(32, 32, 1))
        self.block2 = nn.Sequential(TorchBlock(32, 16, 2), TorchBlock(16, 16, 1))
        self.block3 = nn.Sequential(TorchBlock(16, 16, 2), TorchBlock(16, 16, 1))
        self.block4 = nn.Sequential(TorchBlock(16, 16, 2), TorchBlock(16, 16, 1))
        self.bn2 = nn.BatchNorm1d(linear_layer_size)
        self.bn3 = nn.BatchNorm1d(32)
        self.linear1 = nn.Linear(linear_layer_size, 32)
        self.linear2 = nn.Linear(32, 1)
        self.dropout = nn.Dropout(p)

    def forward(self, x):
        h = torch.relu(self.bn1(self.conv1(x)))
        h = self.block4(self.block3(self.block2(self.block1(h))))
        h = nn.AvgPool2d(4)(h)
        h = h.view(h.size(0), -1)
        h = self.dropout(self.bn2(h))
        h = self.bn3(self.linear1(h))
        h = torch.relu(self.dropout(h))
        return torch.sigmoid(self.linear2(h))


class TorchResNetNoBN(nn.Module):
    """reference models.py:247-308: ResNetBigger topology, no norm anywhere."""

    def __init__(self, p=0.0, linear_layer_size=48):
        super().__init__()
        self.conv1 = nn.Conv2d(1, 64, 3, stride=1, padding=1, bias=False)
        self.block1 = nn.Sequential(
            TorchBlockNoBN(64, 64, 1), TorchBlockNoBN(64, 64, 1)
        )
        self.block2 = nn.Sequential(
            TorchBlockNoBN(64, 32, 2), TorchBlockNoBN(32, 32, 1)
        )
        self.block3 = nn.Sequential(
            TorchBlockNoBN(32, 16, 2), TorchBlockNoBN(16, 16, 1)
        )
        self.block4 = nn.Sequential(
            TorchBlockNoBN(16, 16, 2), TorchBlockNoBN(16, 16, 1)
        )
        self.linear1 = nn.Linear(linear_layer_size, 32)
        self.linear2 = nn.Linear(32, 1)
        self.dropout = nn.Dropout(p)

    def forward(self, x):
        h = torch.relu(self.conv1(x))
        h = self.block4(self.block3(self.block2(self.block1(h))))
        h = nn.AvgPool2d(4)(h)
        h = h.view(h.size(0), -1)
        h = self.dropout(h)
        h = self.dropout(self.linear1(h))
        h = torch.relu(h)
        return torch.sigmoid(self.linear2(h))


class TorchMLP(nn.Module):
    """reference models.py:6-40: linear->bn->dropout->relu twice, then
    linear->sigmoid; input flattened to the configured dimension."""

    def __init__(self, input_dim=100 * 44, hid1=600, hid2=100, p=0.0):
        super().__init__()
        self.input_dim = input_dim
        self.linear1 = nn.Linear(input_dim, hid1)
        self.linear2 = nn.Linear(hid1, hid2)
        self.linear3 = nn.Linear(hid2, 1)
        self.bn1 = nn.BatchNorm1d(hid1)
        self.bn2 = nn.BatchNorm1d(hid2)
        self.dropout = nn.Dropout(p)

    def forward(self, x):
        h = x.view(-1, self.input_dim)
        h = torch.relu(self.dropout(self.bn1(self.linear1(h))))
        h = torch.relu(self.dropout(self.bn2(self.linear2(h))))
        return torch.sigmoid(self.linear3(h))


def _x(shape, seed=5):
    gen = np.random.default_rng(seed)
    return gen.standard_normal(shape).astype(np.float32)


_CASES = {
    # name -> (torch ctor, jax builder, input shape)
    "ResNet": (
        lambda: TorchResNet(),
        lambda: models.build("ResNet", dropout_rate=0.0, linear_layer_size=192),
        # (100, 128) -> 16ch x (3, 4) after the stride plan + AvgPool(4) = 192
        (8, 1, 100, 128),
    ),
    "ResNetNoBN": (
        lambda: TorchResNetNoBN(),
        lambda: models.build("ResNetNoBN", dropout_rate=0.0, linear_layer_size=48),
        (8, 1, 100, 44),
    ),
    "MLPModel": (
        lambda: TorchMLP(),
        lambda: models.MLPModel(linear_layer_size=100 * 44, dropout_rate=0.0),
        (8, 1, 100, 44),
    ),
}


@pytest.mark.parametrize("name", sorted(_CASES))
def test_param_names_and_counts_match_torch(name):
    t_ctor, j_ctor, _ = _CASES[name]
    tm, jm = t_ctor(), j_ctor()
    params, state = jm.init(jax.random.PRNGKey(0))
    flat = ckpt.to_torch_state_dict(params, state)
    theirs = tm.state_dict()
    assert set(flat) == set(theirs)
    for k, v in theirs.items():
        assert flat[k].shape == tuple(v.shape), k
    assert models.count_parameters(params) == sum(
        p.numel() for p in tm.parameters()
    )


@pytest.mark.parametrize("name", sorted(_CASES))
def test_eval_forward_parity(name):
    t_ctor, j_ctor, shape = _CASES[name]
    tm, jm = t_ctor(), j_ctor()
    tm.eval()
    params, state = ckpt.from_torch_state_dict(tm.state_dict())
    x = _x(shape)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy().squeeze(-1)
    got, _ = jm.apply(params, state, x, train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("name", ["ResNet", "MLPModel"])
def test_train_forward_and_bn_stats(name):
    t_ctor, j_ctor, shape = _CASES[name]
    tm, jm = t_ctor(), j_ctor()
    tm.train()
    params, state = ckpt.from_torch_state_dict(tm.state_dict())
    x = _x(shape, seed=6)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy().squeeze(-1)
    got, new_state = jm.apply(params, state, x, train=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)
    flat = ckpt.flatten_tree(new_state)
    sd = tm.state_dict()
    for key in ("bn1.running_mean", "bn1.running_var"):
        np.testing.assert_allclose(
            flat[key], sd[key].numpy(), rtol=1e-4, atol=1e-5, err_msg=key
        )
    assert int(flat["bn1.num_batches_tracked"]) == 1


def test_nobn_train_eval_identical():
    """Without batch norm, train(dropout=0) and eval forwards must agree —
    guards against accidentally state-dependent paths in the NoBN variant."""
    _, j_ctor, shape = _CASES["ResNetNoBN"]
    jm = j_ctor()
    params, state = jm.init(jax.random.PRNGKey(2))
    assert not ckpt.flatten_tree(state)  # stateless
    x = _x(shape, seed=7)
    a, _ = jm.apply(params, state, x, train=False)
    b, _ = jm.apply(params, state, x, train=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("name", sorted(_CASES))
def test_torch_checkpoint_roundtrip(tmp_path, name):
    """torch .pth.tar -> our pytrees -> npz -> back to a torch state_dict the
    twin can load and reproduce (both interop directions per arch)."""
    t_ctor, j_ctor, shape = _CASES[name]
    tm, jm = t_ctor(), j_ctor()
    tm.eval()
    blob = {
        "state_dict": tm.state_dict(),
        "epoch": 1,
        "global_step": 9,
        "best_val_loss": 0.4,
        "optim_dict": {},
    }
    torch.save(blob, tmp_path / "best.pth.tar")
    loaded = ckpt.load_checkpoint(str(tmp_path / "best.pth.tar"))
    ckpt.save_checkpoint(
        str(tmp_path), loaded["params"], loaded["state"], epoch=1,
        global_step=9, best_val_loss=0.4, is_best=False,
    )
    back = ckpt.load_checkpoint(str(tmp_path / "last.ckpt.npz"))
    sd = ckpt.to_torch_state_dict(back["params"], back["state"])
    tm2 = t_ctor()
    tm2.load_state_dict({k: torch.from_numpy(np.array(v)) for k, v in sd.items()})
    tm2.eval()
    x = _x(shape, seed=8)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
        got = tm2(torch.from_numpy(x)).numpy()
    np.testing.assert_array_equal(got, want)
    probs, _ = jm.apply(back["params"], back["state"], x, train=False)
    np.testing.assert_allclose(
        np.asarray(probs), want.squeeze(-1), rtol=1e-4, atol=1e-5
    )


def test_build_forwards_only_given_kwargs():
    """build() leaves unspecified sizes to each arch's reference default —
    one shared default would mis-size archs where linear_layer_size means
    something else (the MLP's INPUT dim vs a ResNet head width)."""
    m = models.build("MLPModel", dropout_rate=0.0)
    params, state = m.init(jax.random.PRNGKey(0))
    # Reference default input dim 101*40 (reference models.py:7).
    assert params["linear1"]["weight"].shape[1] == 101 * 40
    x = np.zeros((3, 1, 101, 40), np.float32)
    probs, _ = m.apply(params, state, x, train=False)
    assert probs.shape == (3,)


def test_mlp_rejects_regrouping_input():
    """view(-1, input_dim) on a divisible-but-wrong window size must fail
    fast, not silently return the wrong number of probabilities."""
    m = models.build("MLPModel", dropout_rate=0.0, linear_layer_size=48)
    params, state = m.init(jax.random.PRNGKey(0))
    x = np.zeros((12, 1, 100, 44), np.float32)  # 4400 % 48 != 0 per-sample,
    # but 12*4400 is divisible by 48 -> the old reshape gave 1100 probs
    with pytest.raises(ValueError, match="flattened window size"):
        m.apply(params, state, x, train=False)


def test_fixed_plan_archs_reject_foreign_filter_sizes():
    """ResNet/ResNetNoBN hardcode their channel plans (their reference
    constructors take no filter_sizes at all); a mismatching plan must not
    silently build a different network."""
    with pytest.raises(ValueError, match="hardcodes filter plan"):
        models.build("ResNet", filter_sizes=(128, 64, 32, 16))
    with pytest.raises(ValueError, match="hardcodes filter plan"):
        models.build("ResNetNoBN", filter_sizes=(128, 64, 32, 16))
    # The matching plan (what a faithful preset would carry) is accepted.
    models.build("ResNet", filter_sizes=(32, 16, 16, 16))
    models.build("ResNetNoBN", filter_sizes=(64, 32, 16, 16))

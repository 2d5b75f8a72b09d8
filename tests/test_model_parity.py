"""Model-zoo parity vs. an independently-written torch spec model.

The torch model below is written from the architectural contract in
SURVEY.md §2.4 (conv/BN/residual topology, AvgPool(4), head) and produces the
same state_dict key names as the reference's ResNetBigger, so it doubles as a
test of the checkpoint converter: torch weights -> our pytrees -> identical
probabilities.
"""

import numpy as np
import pytest
import torch
from torch import nn

from laughter_detection_icsi_tpu import models
from laughter_detection_icsi_tpu.models import layers as L
from laughter_detection_icsi_tpu.train import checkpoint as ckpt

torch.manual_seed(0)


class TorchBlock(nn.Module):
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


class TorchResNetBigger(nn.Module):
    def __init__(self, linear_layer_size=48, filter_sizes=(64, 32, 16, 16), p=0.0):
        super().__init__()
        self.conv1 = nn.Conv2d(1, 64, 3, stride=1, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        f = list(filter_sizes)
        self.block1 = nn.Sequential(TorchBlock(64, f[0], 1), TorchBlock(f[0], f[0], 1))
        self.block2 = nn.Sequential(TorchBlock(f[0], f[1], 2), TorchBlock(f[1], f[1], 1))
        self.block3 = nn.Sequential(TorchBlock(f[1], f[2], 2), TorchBlock(f[2], f[2], 1))
        self.block4 = nn.Sequential(TorchBlock(f[2], f[3], 2), TorchBlock(f[3], f[3], 1))
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


@pytest.fixture(scope="module")
def torch_model():
    m = TorchResNetBigger()
    m.eval()
    return m


@pytest.fixture(scope="module")
def jax_model():
    return models.build("ResNetBigger", dropout_rate=0.0, linear_layer_size=48)


@pytest.fixture(scope="module")
def x_np():
    gen = np.random.default_rng(23)  # module-local: independent of `rng`
    return gen.standard_normal((8, 1, 100, 44)).astype(np.float32)


def test_param_names_match_torch(torch_model, jax_model):
    import jax

    params, state = jax_model.init(jax.random.PRNGKey(0))
    ours = set(ckpt.to_torch_state_dict(params, state))
    theirs = set(torch_model.state_dict().keys())
    assert ours == theirs
    # shapes too
    flat = ckpt.to_torch_state_dict(params, state)
    for k, v in torch_model.state_dict().items():
        assert flat[k].shape == tuple(v.shape), k


def test_train_apply_without_rng_raises():
    """train=True with active dropout but no rng must error loudly — the
    dropout layer's rng-is-None guard would otherwise silently train with
    dropout_rate 0 (divergence from the reference regularization)."""
    import jax

    jm = models.build("ResNetBigger", dropout_rate=0.5, linear_layer_size=48)
    params, state = jm.init(jax.random.PRNGKey(0))
    x = np.zeros((2, 1, 100, 44), np.float32)
    with pytest.raises(ValueError, match="needs an rng"):
        jm.apply(params, state, x, train=True)
    # dropout_rate=0 keeps the reference behavior: no rng needed in train mode
    jm0 = models.build("ResNetBigger", dropout_rate=0.0, linear_layer_size=48)
    p0, s0 = jm0.init(jax.random.PRNGKey(0))
    jm0.apply(p0, s0, x, train=True)


def test_param_count_matches_torch(torch_model, jax_model):
    import jax

    params, _ = jax_model.init(jax.random.PRNGKey(0))
    torch_count = sum(p.numel() for p in torch_model.parameters())
    assert models.count_parameters(params) == torch_count


def test_eval_forward_parity(torch_model, jax_model, x_np):
    params, state = ckpt.from_torch_state_dict(torch_model.state_dict())
    with torch.no_grad():
        want = torch_model(torch.from_numpy(x_np)).numpy().squeeze(-1)
    got, _ = jax_model.apply(params, state, x_np, train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_train_forward_parity_and_bn_stats(x_np):
    tm = TorchResNetBigger()
    tm.train()
    jm = models.build("ResNetBigger", dropout_rate=0.0, linear_layer_size=48)
    params, state = ckpt.from_torch_state_dict(tm.state_dict())
    with torch.no_grad():
        want = tm(torch.from_numpy(x_np)).numpy().squeeze(-1)
    got, new_state = jm.apply(params, state, x_np, train=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)
    # running stats updated identically (momentum 0.1, unbiased var)
    sd = tm.state_dict()
    flat = ckpt.flatten_tree(new_state)
    np.testing.assert_allclose(
        flat["bn1.running_mean"], sd["bn1.running_mean"].numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        flat["bn1.running_var"], sd["bn1.running_var"].numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        flat["block2.0.bn2.running_var"],
        sd["block2.0.bn2.running_var"].numpy(),
        rtol=1e-4,
        atol=1e-5,
    )
    assert int(flat["bn1.num_batches_tracked"]) == 1


def test_reference_init_touches_all_params():
    import jax

    jm = models.build("ResNetBigger", dropout_rate=0.0, linear_layer_size=48)
    params, state = jm.init(jax.random.PRNGKey(0))
    new = L.reference_init(params, jax.random.PRNGKey(1))
    flat = ckpt.flatten_tree(new)
    # every param, including BN weights, is now ~N(0, 0.01)
    for key, val in flat.items():
        assert abs(val.mean()) < 0.05, key
        assert val.std() < 0.05 or val.size < 4, key
    # BN buffers untouched
    sflat = ckpt.flatten_tree(state)
    assert sflat["bn1.running_var"].mean() == 1.0


def test_other_zoo_models_forward():
    import jax

    x = np.zeros((4, 1, 100, 44), dtype=np.float32)
    # (100, 44) input -> 16ch x (3, 1) after three stride-2 stages + pool = 48
    for name in ("ResNet", "ResNetNoBN"):
        m = models.build(name, dropout_rate=0.0, linear_layer_size=48)
        params, state = m.init(jax.random.PRNGKey(0))
        probs, _ = m.apply(params, state, x, train=False)
        assert probs.shape == (4,)
        assert ((probs >= 0) & (probs <= 1)).all()
    m = models.MLPModel(linear_layer_size=100 * 44, dropout_rate=0.0)
    params, state = m.init(jax.random.PRNGKey(0))
    probs, _ = m.apply(params, state, x, train=False)
    assert probs.shape == (4,)


def test_native_checkpoint_roundtrip(tmp_path, jax_model):
    import jax

    params, state = jax_model.init(jax.random.PRNGKey(3))
    ckpt.save_checkpoint(
        str(tmp_path), params, state, epoch=2, global_step=77,
        best_val_loss=0.5, is_best=True,
    )
    assert (tmp_path / "last.ckpt.npz").is_file()
    assert (tmp_path / "best.ckpt.npz").is_file()
    loaded = ckpt.load_checkpoint(str(tmp_path / "best.ckpt.npz"))
    assert loaded["global_step"] == 77
    orig = ckpt.flatten_tree(params)
    back = ckpt.flatten_tree(loaded["params"])
    assert set(orig) == set(back)
    for k in orig:
        np.testing.assert_array_equal(orig[k], back[k])


def test_torch_pth_tar_checkpoint_loads(tmp_path, torch_model):
    blob = {
        "state_dict": torch_model.state_dict(),
        "epoch": 3,
        "global_step": 123,
        "best_val_loss": 0.25,
        "optim_dict": {},
    }
    path = tmp_path / "best.pth.tar"
    torch.save(blob, path)
    loaded = ckpt.load_checkpoint(str(path))
    assert loaded["global_step"] == 123
    jm = models.build("ResNetBigger", dropout_rate=0.0, linear_layer_size=48)
    x = np.zeros((2, 1, 100, 44), dtype=np.float32)
    probs, _ = jm.apply(loaded["params"], loaded["state"], x, train=False)
    assert probs.shape == (2,)


def test_resnet_family_rejects_wrong_length_filter_plan():
    """Extra filter_sizes entries were silently dropped (a different net
    than configured, possibly running clean on a coinciding head size);
    fewer died as a bare IndexError inside init."""
    for bad in ((8, 8, 8, 8, 999), (8, 8, 8)):
        with pytest.raises(ValueError, match="exactly 4 filter_sizes"):
            models.build(
                "ResNetBigger", dropout_rate=0.0,
                linear_layer_size=24, filter_sizes=bad,
            )

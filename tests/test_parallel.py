"""Data-parallel training on the 8-device virtual CPU mesh: sharded steps
must match single-device steps numerically (BN global batch stats, grad
all-reduce)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laughter_detection_icsi_tpu import models
from laughter_detection_icsi_tpu.parallel import (
    DataParallelTrainer,
    make_mesh,
    shard_batch,
)
from laughter_detection_icsi_tpu.train import Trainer


@pytest.fixture(scope="module")
def tiny_model():
    return models.MLPModel(
        linear_layer_size=12 * 8, hid_dim1=32, hid_dim2=16, dropout_rate=0.0
    )


def _batch(rng, batch_size=16, t=12, f=8):
    y = (rng.uniform(size=batch_size) > 0.5).astype(np.float32)
    x = rng.standard_normal((batch_size, t, f)).astype(np.float32) * 0.1
    x[y > 0.5, :, :3] += 2.0
    return {"inputs": x, "is_laugh": y}


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_shard_batch_divisibility():
    mesh = make_mesh()
    with pytest.raises(ValueError, match="not divisible"):
        shard_batch({"x": np.zeros((3, 2))}, mesh)


def test_dp_step_matches_single_device(tiny_model, rng):
    """One dp step over 8 devices == one big-batch step on one device
    (global BN stats + mean-loss grad all-reduce make them identical)."""
    batch = _batch(rng, batch_size=16)

    single = Trainer(model=tiny_model)
    p1, s1, o1 = single.init(jax.random.PRNGKey(0))
    p1, s1, o1, m1 = single.train_batch(p1, s1, o1, batch, None)

    mesh = make_mesh(8)
    dp = DataParallelTrainer(model=tiny_model, mesh=mesh)
    p2, s2, o2 = dp.init(jax.random.PRNGKey(0))
    p2, s2, o2, m2 = dp.train_batch(p2, s2, o2, batch, None)

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
    # Adam's first step behaves like sign(g): cross-device reduction-order
    # noise in near-zero grads flips update signs, so params are only loosely
    # comparable after an optimizer step; the tight check is on grads below.
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-3)
    # BN running stats (state) match tightly => batch stats were global
    for a, b in zip(jax.tree_util.tree_leaves(s1), jax.tree_util.tree_leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_dp_grads_match_single_device(tiny_model, rng):
    """Gradients from the sharded graph == single-device gradients."""
    from laughter_detection_icsi_tpu.parallel import mesh as mesh_lib
    from laughter_detection_icsi_tpu.train.loop import bce_loss

    batch = _batch(rng, batch_size=16)
    x = jnp.asarray(batch["inputs"])[:, None, :, :]
    y = jnp.asarray(batch["is_laugh"])
    params, state = tiny_model.init(jax.random.PRNGKey(0))

    def loss_fn(p, xx, yy):
        probs, _ = tiny_model.apply(p, state, xx, train=True)
        return bce_loss(probs, yy)

    g_single = jax.jit(jax.grad(loss_fn))(params, x, y)

    mesh = make_mesh(8)
    repl = mesh_lib.replicated(mesh)
    dp_sh = mesh_lib.data_sharding(mesh)
    g_fn = jax.jit(
        jax.grad(loss_fn), in_shardings=(repl, dp_sh, dp_sh), out_shardings=repl
    )
    sharded = shard_batch({"x": np.asarray(x), "y": np.asarray(y)}, mesh)
    g_dp = g_fn(params, sharded["x"], sharded["y"])

    for a, b in zip(
        jax.tree_util.tree_leaves(g_single), jax.tree_util.tree_leaves(g_dp)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dp_training_reduces_loss(tiny_model, rng):
    mesh = make_mesh(8)
    dp = DataParallelTrainer(model=tiny_model, mesh=mesh)
    params, state, opt_state = dp.init(jax.random.PRNGKey(0))
    first = last = None
    for i in range(40):
        params, state, opt_state, m = dp.train_batch(
            params, state, opt_state, _batch(rng, 32), jax.random.PRNGKey(i)
        )
        if first is None:
            first = float(m["loss"])
        last = float(m["loss"])
    assert last < first * 0.6
    ev = dp.eval_batch(params, state, _batch(rng, 32))
    assert float(ev["acc"]) > 0.85


def test_graft_entry_and_dryrun():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    probs = jax.jit(fn)(*args)
    assert probs.shape == (32,)
    assert bool(jnp.all((probs >= 0) & (probs <= 1)))
    ge.dryrun_multichip(8)


def test_dryrun_fallback_from_single_device_platform():
    """Regression for the round-1 driver failure (MULTICHIP_r01.json rc=1):
    the driver calls ``dryrun_multichip(8)`` in a FRESH interpreter whose
    active platform has ONE device (the axon TPU tunnel).  Simulate that
    exactly — fresh subprocess, 1-device CPU platform — so the fallback
    branch (subprocess re-exec with 8 forced host devices) is the code under
    test, not the in-suite 8-device shortcut."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    env = {
        k: v
        for k, v in os.environ.items()
        # PALLAS_AXON_POOL_IPS enables the axon tunnel plugin's
        # sitecustomize registration, which overrides JAX_PLATFORMS and
        # blocks backend init whenever the tunnel is unreachable — strip it
        # so the simulated driver platform is a deterministic 1-device CPU.
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PALLAS_AXON_POOL_IPS")
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    code = (
        "import sys\n"
        f"sys.path.insert(0, {str(repo)!r})\n"
        "import jax\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"stdout={proc.stdout}\nstderr={proc.stderr}"
    assert "dryrun_multichip(8): ok" in proc.stdout


def test_dryrun_fallback_recursion_guard():
    """If the forced-CPU child STILL sees too few devices (structurally
    broken environment), it must fail loudly instead of re-execing itself
    forever."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    env = {
        k: v
        for k, v in os.environ.items()
        # See test_dryrun_fallback_from_single_device_platform: keep the
        # tunnel plugin out of the child so jax.devices() is deterministic.
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PALLAS_AXON_POOL_IPS")
    }
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        _GRAFT_DRYRUN_CHILD="1",
    )
    code = (
        "import sys\n"
        f"sys.path.insert(0, {str(repo)!r})\n"
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env, cwd=repo, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode != 0
    assert "still sees" in proc.stderr


def test_distributed_initialize_forwards_args(monkeypatch):
    """parallel/distributed.py is the multi-host entry hook (SURVEY §5.8);
    a real pod cannot exist here, so pin the contract: argument forwarding
    to jax.distributed.initialize (omitting unset kwargs so TPU-pod
    autodetection still applies) and the process_info summary."""
    from laughter_detection_icsi_tpu.parallel import distributed

    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: calls.append(kw)
    )
    distributed.initialize()
    distributed.initialize(coordinator_address="10.0.0.1:1234")
    distributed.initialize(
        coordinator_address="c:1", num_processes=4, process_id=2
    )
    assert calls == [
        {},
        {"coordinator_address": "10.0.0.1:1234"},
        {"coordinator_address": "c:1", "num_processes": 4, "process_id": 2},
    ]
    assert not distributed.is_multi_process()  # single-process test env
    info = distributed.process_info()
    assert "process 0/1" in info and "8 local of 8 global" in info


def test_train_cli_wires_distributed_init(monkeypatch):
    """--coordinator_address on the train CLI must call
    distributed.initialize before training starts (the call site VERDICT
    round 1 found missing).  The stub raises after recording the call so
    the test stays cheap — reaching it IS the assertion."""
    from cli import train as train_cli
    from laughter_detection_icsi_tpu.parallel import distributed

    calls = []

    def stub(**kw):
        calls.append(kw)
        raise SystemExit(42)  # stop before any real training

    monkeypatch.setattr(jax.distributed, "initialize", stub)
    with pytest.raises(SystemExit):
        train_cli.main(
            [
                "--config", "resnet_base",
                "--checkpoint_dir", "/tmp/nope",
                "--data_root", "/tmp/nope",
                "--coordinator_address", "h:9999",
                "--num_processes", "2",
                "--process_id", "1",
            ]
        )
    assert calls == [
        {"coordinator_address": "h:9999", "num_processes": 2, "process_id": 1}
    ]


def test_train_cli_distributed_autodetect_flag(monkeypatch):
    """Bare --distributed (no explicit coordinator flags) must call
    jax.distributed.initialize() with NO kwargs — the TPU-pod/SLURM
    autodetection path (parallel/distributed.py initialize_from_args)."""
    from cli import train as train_cli

    calls = []

    def stub(**kw):
        calls.append(kw)
        raise SystemExit(42)  # stop before any real training

    monkeypatch.setattr(jax.distributed, "initialize", stub)
    with pytest.raises(SystemExit):
        train_cli.main(
            [
                "--config", "resnet_base",
                "--checkpoint_dir", "/tmp/nope",
                "--data_root", "/tmp/nope",
                "--distributed",
            ]
        )
    assert calls == [{}]


def test_dp_resident_matches_dp_streamed(tmp_path, rng):
    """The mesh-sharded resident path (rows sharded over 'data', batch
    gather over the mesh, fused step) must reproduce the host-streamed
    data-parallel epoch exactly — same ordering, same fold_in rng keys,
    same losses and params."""
    import pandas as pd

    from laughter_detection_icsi_tpu.data.dataset import (
        LadDataset,
        ResidentLadDataset,
    )
    from laughter_detection_icsi_tpu.data.feature_cache import FeatureCache
    from laughter_detection_icsi_tpu.parallel import mesh as mesh_lib
    from laughter_detection_icsi_tpu.train.loop import TrainLoop

    cache = FeatureCache(cache_dir=str(tmp_path / "fc"))
    cache.add_track(
        "M0", "chan0", (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    )
    rows = [
        dict(meeting_id="M0", chan_id="chan0",
             sub_start=round(float(rng.uniform(0, 1.9)), 2),
             sub_duration=1.0, label=i % 2, start=0.0, duration=1.0)
        for i in range(19)  # deliberately not a multiple of 8 or 16
    ]
    ds = LadDataset(pd.DataFrame(rows), cache)
    mesh = make_mesh(8)
    model = models.build(
        "ResNetBigger", dropout_rate=0.5, linear_layer_size=24,
        filter_sizes=(8, 8, 8, 8),
    )

    def run(resident: bool):
        dp = DataParallelTrainer(model=model, mesh=mesh)
        params, state, opt_state = dp.init(jax.random.PRNGKey(0))
        loop = TrainLoop(trainer=dp, checkpoint_dir=str(tmp_path / "ck"),
                         log_frequency=0)
        if resident:
            res = ResidentLadDataset(
                ds, sharding=mesh_lib.data_sharding(mesh), pad_rows_to=8
            )
            batches = res.index_batches(8, shuffle=True, seed=5,
                                        drop_remainder=True)
        else:
            batches = ds.batches(8, shuffle=True, seed=5,
                                 drop_remainder=True, prefetch=0)
        params, state, opt_state, mean_loss = loop.run_epoch(
            params, state, opt_state, batches,
            rng=jax.random.PRNGKey(7), verbose=False,
        )
        return mean_loss, params

    loss_s, params_s = run(resident=False)
    loss_r, params_r = run(resident=True)
    assert loss_s == loss_r
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params_s, params_r,
    )


def test_dp_eval_accepts_resident_batches(tmp_path, rng):
    """Device-resident eval batches reshard device->device into the DP
    eval step (no host bounce) and give the streamed batches' metrics."""
    import pandas as pd

    from laughter_detection_icsi_tpu.data.dataset import (
        LadDataset,
        ResidentLadDataset,
    )
    from laughter_detection_icsi_tpu.data.feature_cache import FeatureCache

    cache = FeatureCache(cache_dir=str(tmp_path / "fc"))
    cache.add_track(
        "M0", "chan0", (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    )
    rows = [
        dict(meeting_id="M0", chan_id="chan0", sub_start=0.05 * i,
             sub_duration=1.0, label=i % 2, start=0.0, duration=1.0)
        for i in range(16)
    ]
    ds = LadDataset(pd.DataFrame(rows), cache)
    model = models.build(
        "ResNetBigger", dropout_rate=0.0, linear_layer_size=24,
        filter_sizes=(8, 8, 8, 8),
    )
    dp = DataParallelTrainer(model=model, mesh=make_mesh(8))
    params, state, _ = dp.init(jax.random.PRNGKey(0))

    streamed = dp.eval_batches(
        params, state, ds.batches(8, shuffle=False, prefetch=0)
    )
    resident = dp.eval_batches(
        params, state, ResidentLadDataset(ds).batches(8, shuffle=False)
    )
    for k in streamed:
        assert streamed[k] == pytest.approx(resident[k], abs=1e-6), k

    # Fused path: mesh-sharded resident rows + index batches -> ONE
    # gather+eval dispatch per batch through the same eval_batches driver.
    from laughter_detection_icsi_tpu.parallel import mesh as mesh_lib

    res_sharded = ResidentLadDataset(
        ds, sharding=mesh_lib.data_sharding(dp.mesh), pad_rows_to=8
    )
    fused = dp.eval_batches(
        params, state, res_sharded.index_batches(8, shuffle=False)
    )
    for k in streamed:
        assert streamed[k] == pytest.approx(fused[k], abs=1e-6), k


def test_dp_k_step_resident_matches_per_step(tiny_model, rng):
    """The data-parallel K-step scan (idx [K, B] sharded over B, gathers
    pinned batch-sharded) must train identically to K sequential DP
    resident steps."""
    from jax.sharding import NamedSharding, PartitionSpec

    mesh = make_mesh(8)
    n, t, f = 64, 12, 8
    y = (rng.uniform(size=n) > 0.5).astype(np.float32)
    x = rng.standard_normal((n, t, f)).astype(np.float32) * 0.1
    x[y > 0.5, :, :3] += 2.0

    class _Res:
        pass

    res = _Res()
    res.feats = jax.device_put(x, NamedSharding(mesh, PartitionSpec("data")))
    res.labels = jax.device_put(y, NamedSharding(mesh, PartitionSpec("data")))

    idx_mat = np.stack(
        [np.arange(k * 16, (k + 1) * 16) for k in range(4)]
    ).astype(np.int32)
    key = jax.random.PRNGKey(11)
    dp = DataParallelTrainer(model=tiny_model, mesh=mesh)
    params, state, opt_state = dp.init(jax.random.PRNGKey(0))

    p_seq, s_seq, o_seq = params, state, opt_state
    seq_losses = []
    for k in range(4):
        p_seq, s_seq, o_seq, m = dp.train_batch_resident(
            p_seq, s_seq, o_seq, res, idx_mat[k], key, 50 + k
        )
        seq_losses.append(float(m["loss"]))
    p_k, _s_k, _o_k, mk = dp.train_k_steps_resident(
        params, state, opt_state, res, idx_mat, key, 50
    )
    np.testing.assert_allclose(
        np.asarray(mk["loss"]), np.asarray(seq_losses), rtol=1e-6
    )
    for a, b in zip(jax.tree_util.tree_leaves(p_k), jax.tree_util.tree_leaves(p_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
    with pytest.raises(ValueError, match="not divisible"):
        dp.train_k_steps_resident(
            params, state, opt_state, res,
            np.zeros((2, 9), np.int32), key, 0,
        )

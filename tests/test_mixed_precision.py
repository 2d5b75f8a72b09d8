"""Mixed-precision training (compute_dtype='bfloat16'): bf16 fwd/bwd with
float32 masters — the TPU bandwidth-bound step's 1.63x lever
(tools/precision_probe.py; build_step_fns docstring).  The reference has
no such mode (reference train.py:261-297 trains fp32); these tests pin
the recipe's contracts: masters stay f32, numerics track f32 closely at
toy scale, and every step variant (streamed, resident, K-step scan,
eval, data-parallel) behaves identically under the flag."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from laughter_detection_icsi_tpu import models
from laughter_detection_icsi_tpu.train.loop import Trainer, build_step_fns
from laughter_detection_icsi_tpu.train.optim import Adam


@pytest.fixture(scope="module")
def tiny_model():
    return models.MLPModel(
        linear_layer_size=12 * 8, hid_dim1=32, hid_dim2=16, dropout_rate=0.0
    )


def _batch(rng, b=16, t=12, f=8):
    y = (rng.uniform(size=b) > 0.5).astype(np.float32)
    x = rng.standard_normal((b, t, f)).astype(np.float32) * 0.1
    x[y > 0.5, :, :3] += 2.0
    return {"inputs": x, "is_laugh": y}


def test_bad_compute_dtype_rejected(tiny_model):
    with pytest.raises(ValueError, match="compute_dtype"):
        Trainer(tiny_model, compute_dtype="bf16")
    with pytest.raises(ValueError, match="compute_dtype"):
        build_step_fns(tiny_model, Adam(), compute_dtype="half")


def test_masters_stay_float32_and_loss_tracks_f32(tiny_model):
    rng = np.random.default_rng(0)
    batches = [_batch(rng) for _ in range(4)]
    key = jax.random.PRNGKey(3)
    traj = {}
    for cd in (None, "bfloat16"):
        tr = Trainer(tiny_model, compute_dtype=cd)
        params, state, opt = tr.init(jax.random.PRNGKey(0))
        losses = []
        for b in batches:
            params, state, opt, m = tr.train_batch(params, state, opt, b, key)
            losses.append(float(m["loss"]))
        traj[cd] = losses
        # f32 masters: params, Adam moments and BN running stats must never
        # be stored in bf16 — that silent degradation is the recipe's main
        # failure mode.
        for leaf in jax.tree_util.tree_leaves(params) + jax.tree_util.tree_leaves(
            (opt.mu, opt.nu)
        ):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                assert leaf.dtype == jnp.float32
        for leaf in jax.tree_util.tree_leaves(state):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                assert leaf.dtype == jnp.float32
    # bf16 rounds activations per layer; at toy scale the loss trajectory
    # stays within a few percent of f32 for the first steps.
    for a, b in zip(traj[None], traj["bfloat16"]):
        assert b == pytest.approx(a, rel=5e-2, abs=2e-2)
    assert np.all(np.isfinite(traj["bfloat16"]))


def test_bf16_training_reduces_loss(tiny_model):
    rng = np.random.default_rng(1)
    tr = Trainer(tiny_model, compute_dtype="bfloat16")
    params, state, opt = tr.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(2)
    first = last = None
    for i in range(12):
        params, state, opt, m = tr.train_batch(
            params, state, opt, _batch(rng), key
        )
        loss = float(m["loss"])
        first = loss if first is None else first
        last = loss
    assert last < first


def test_bf16_eval_step(tiny_model):
    rng = np.random.default_rng(2)
    tr = Trainer(tiny_model, compute_dtype="bfloat16")
    params, state, _ = tr.init(jax.random.PRNGKey(0))
    metrics = tr.eval_batches(params, state, [_batch(rng) for _ in range(2)])
    assert set(metrics) >= {"loss", "acc", "precision", "recall"}
    assert np.isfinite(metrics["loss"])


def test_bf16_k_step_scan_matches_chained_steps(tiny_model):
    """The K-step lax.scan under bf16 must replay K sequential bf16
    resident steps (same invariant the f32 path pins)."""
    rng = np.random.default_rng(3)
    n_rows, b, k = 64, 8, 3
    feats = jnp.asarray(rng.standard_normal((n_rows, 12, 8)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, n_rows), jnp.float32)
    idx_mat = np.stack(
        [rng.integers(0, n_rows, b).astype(np.int32) for _ in range(k)]
    )
    key = jax.random.PRNGKey(7)

    tr = Trainer(tiny_model, compute_dtype="bfloat16")
    params, state, opt = tr.init(jax.random.PRNGKey(0))

    p1, s1, o1 = params, state, opt
    chained_losses = []
    for i in range(k):
        p1, s1, o1, m = tr._train_step_resident(
            p1, s1, o1, feats, labels, jnp.asarray(idx_mat[i]), key, i
        )
        chained_losses.append(float(m["loss"]))
    pk, sk, ok, mk = tr._train_k_steps_resident(
        params, state, opt, feats, labels, jnp.asarray(idx_mat), key, 0
    )
    # Same tolerance class as the f32 invariant (build_step_fns docstring):
    # scanned-vs-unrolled bodies may pick different lowerings.
    np.testing.assert_allclose(
        np.asarray(mk["loss"]), np.asarray(chained_losses), rtol=2e-2, atol=2e-2
    )
    for a, b_ in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(pk)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-2, atol=5e-3
        )


def test_data_parallel_bf16_matches_single_device(tiny_model):
    """Sharded bf16 step over the CPU mesh == single-device bf16 step on
    the same global batch (mirrors test_parallel's f32 invariant)."""
    from laughter_detection_icsi_tpu.parallel import mesh as mesh_lib
    from laughter_detection_icsi_tpu.parallel.data_parallel import (
        DataParallelTrainer,
    )

    mesh = mesh_lib.make_mesh()
    if mesh.devices.size < 2:
        pytest.skip("needs the multi-device CPU mesh")
    rng = np.random.default_rng(4)
    batch = _batch(rng, b=16)
    key = jax.random.PRNGKey(5)

    single = Trainer(tiny_model, compute_dtype="bfloat16")
    ps, ss, os_ = single.init(jax.random.PRNGKey(0))
    ps, ss, os_, ms = single.train_batch(ps, ss, os_, batch, key)

    dp = DataParallelTrainer(
        model=tiny_model, mesh=mesh, compute_dtype="bfloat16"
    )
    pd, sd, od = dp.init(jax.random.PRNGKey(0))
    pd, sd, od, md = dp.train_batch(pd, sd, od, batch, key)

    assert float(md["loss"]) == pytest.approx(float(ms["loss"]), rel=2e-2)
    for a, b_ in zip(jax.tree_util.tree_leaves(ps), jax.tree_util.tree_leaves(pd)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-2, atol=5e-3
        )


def test_bn_running_stats_accumulate_in_f32_under_bf16():
    """The recipe's sharpest failure mode (review finding, round 4): BN's
    running-stat update `new = 0.9*old + 0.1*batch` quantized to the bf16
    grid STALLS once the remaining distance to the batch stat drops below
    ~old/25 (the 0.1-scaled increment falls under bf16 resolution), a ~4%
    permanent error.  batch_norm must reduce batch stats and accumulate
    running stats in f32 even for bf16 activations: then the stats
    converge all the way to the (bf16-quantized) batch statistics — the
    convergence this test pins.  (Input quantization itself — bf16 cannot
    represent a 0.1% activation offset — is inherent to the mode and NOT
    what this guards.)"""
    import jax.numpy as jnp

    from laughter_detection_icsi_tpu.models import layers as L

    # bf16 affine params, as build_step_fns' apply_model provides them in
    # the mixed-precision path (f32 params here would promote y to f32).
    params = {
        "weight": jnp.ones(4, jnp.bfloat16),
        "bias": jnp.zeros(4, jnp.bfloat16),
    }
    state = {
        "running_mean": jnp.ones(4, jnp.float32),
        "running_var": jnp.ones(4, jnp.float32),
        "num_batches_tracked": jnp.zeros((), jnp.int32),
    }

    rng = np.random.default_rng(0)
    # Batch mean ~0.9: far from the running stat at first (so bf16-grid
    # accumulation WOULD start moving), then the gap shrinks through the
    # ~4% stall zone where only f32 accumulation keeps converging.
    x = jnp.asarray(
        (0.9 + rng.standard_normal((64, 4)) * 1e-3).astype(np.float32)
    ).astype(jnp.bfloat16)
    target = np.asarray(jnp.mean(x.astype(jnp.float32), axis=0))

    for _ in range(150):
        y, state = L.batch_norm(x, params, state, train=True)
        assert y.dtype == jnp.bfloat16  # normalization stays half-width

    rm = np.asarray(state["running_mean"])
    assert state["running_mean"].dtype == jnp.float32
    # f32 accumulation converges to the batch stat; the old bf16-grid
    # accumulation stalled ~0.03-0.04 short of it.
    np.testing.assert_allclose(rm, target, atol=2e-3)


def test_bf16_trainer_bn_stats_track_f32(tiny_model):
    """End to end through the Trainer: after a few bf16 steps the MLP's BN
    running stats track the f32 run closely (they froze before the f32
    batch-stat fix when updates fell below the bf16 grid)."""
    rng = np.random.default_rng(7)
    batches = [_batch(rng, b=32) for _ in range(6)]
    key = jax.random.PRNGKey(9)
    stats = {}
    for cd in (None, "bfloat16"):
        tr = Trainer(tiny_model, compute_dtype=cd)
        params, state, opt = tr.init(jax.random.PRNGKey(0))
        for b in batches:
            params, state, opt, _ = tr.train_batch(params, state, opt, b, key)
        stats[cd] = state
    for a, b_ in zip(
        jax.tree_util.tree_leaves(stats[None]),
        jax.tree_util.tree_leaves(stats["bfloat16"]),
    ):
        if jnp.issubdtype(a.dtype, jnp.floating):
            # Tolerance covers the INHERENT bf16 input/activation
            # quantization (~0.4% per value, amplified through variance);
            # the old bf16-grid state accumulation left stats frozen near
            # their init — orders of magnitude outside these bounds.
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=6e-2, atol=6e-3
            )

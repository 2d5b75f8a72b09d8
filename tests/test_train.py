"""Training subsystem: torch-exact Adam/BCE/clip numerics, trainer steps,
checkpoint resume, metrics CSV."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from laughter_detection_icsi_tpu import models
from laughter_detection_icsi_tpu.train import (
    Adam,
    TrainLoop,
    Trainer,
    batch_metrics,
    bce_loss,
    clip_by_global_norm,
    update_metrics_on_disk,
)


# --------------------------------------------------------------------------- #
# Numerics parity vs torch
# --------------------------------------------------------------------------- #


def test_bce_matches_torch(rng):
    import torch

    probs = rng.uniform(1e-6, 1 - 1e-6, size=64).astype(np.float32)
    targets = (rng.uniform(size=64) > 0.7).astype(np.float32)
    want = torch.nn.BCELoss()(torch.tensor(probs), torch.tensor(targets)).item()
    got = float(bce_loss(jnp.asarray(probs), jnp.asarray(targets)))
    assert got == pytest.approx(want, rel=1e-6)


def test_bce_extreme_probs_clamped():
    probs = jnp.asarray([1e-45, 1.0 - 1e-8, 0.5])
    targets = jnp.asarray([1.0, 0.0, 1.0])
    loss = float(bce_loss(probs, targets))
    assert np.isfinite(loss)


def test_adam_matches_torch(rng):
    import torch

    w0 = rng.standard_normal((5, 3)).astype(np.float32)
    b0 = rng.standard_normal(3).astype(np.float32)
    tw = torch.nn.Parameter(torch.tensor(w0))
    tb = torch.nn.Parameter(torch.tensor(b0))
    topt = torch.optim.Adam([tw, tb], lr=1e-3)

    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    opt = Adam(max_grad_norm=None)
    opt_state = opt.init(params)

    for step in range(5):
        gw = rng.standard_normal((5, 3)).astype(np.float32) * (step + 1)
        gb = rng.standard_normal(3).astype(np.float32)
        topt.zero_grad()
        tw.grad = torch.tensor(gw)
        tb.grad = torch.tensor(gb)
        topt.step()
        params, opt_state = opt.update({"w": jnp.asarray(gw), "b": jnp.asarray(gb)}, opt_state, params)

    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["b"]), tb.detach().numpy(), atol=1e-6)


def test_clip_matches_torch(rng):
    import torch

    g1 = rng.standard_normal((7, 7)).astype(np.float32) * 3
    g2 = rng.standard_normal(11).astype(np.float32) * 3
    p1 = torch.nn.Parameter(torch.zeros(7, 7))
    p2 = torch.nn.Parameter(torch.zeros(11))
    p1.grad = torch.tensor(g1)
    p2.grad = torch.tensor(g2)
    torch.nn.utils.clip_grad_norm_([p1, p2], 1.0)
    clipped = clip_by_global_norm({"a": jnp.asarray(g1), "b": jnp.asarray(g2)}, 1.0)
    np.testing.assert_allclose(np.asarray(clipped["a"]), p1.grad.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(clipped["b"]), p2.grad.numpy(), atol=1e-6)


def test_clip_noop_below_max(rng):
    g = {"a": jnp.asarray(rng.standard_normal(4).astype(np.float32) * 1e-3)}
    out = clip_by_global_norm(g, 1.0)
    np.testing.assert_allclose(np.asarray(out["a"]), np.asarray(g["a"]), rtol=1e-5)


def test_clip_preserves_leaf_dtypes(rng):
    """The f32 norm accumulator must not promote bf16/f16 gradient leaves —
    Adam moments are zeros_like(params), so a promoted grad would change the
    moment dtypes between step 1 and step 2 in a jitted carried state."""
    g = {
        "bf": jnp.asarray(rng.standard_normal((3, 3)) * 5, dtype=jnp.bfloat16),
        "f16": jnp.asarray(rng.standard_normal(5) * 5, dtype=jnp.float16),
        "f32": jnp.asarray(rng.standard_normal(4).astype(np.float32) * 5),
    }
    out = clip_by_global_norm(g, 1.0)
    for k in g:
        assert out[k].dtype == g[k].dtype, k


def test_batch_metrics_edge_cases():
    # no positive predictions -> precision 1.0 (reference train.py:216-218)
    m = batch_metrics(jnp.asarray([0.1, 0.2]), jnp.asarray([1.0, 0.0]))
    assert float(m["precision"]) == 1.0
    assert float(m["recall"]) == 0.0
    assert float(m["acc"]) == 0.5
    # no positive targets -> recall 1.0
    m = batch_metrics(jnp.asarray([0.9, 0.1]), jnp.asarray([0.0, 0.0]))
    assert float(m["recall"]) == 1.0
    assert float(m["precision"]) == 0.0


# --------------------------------------------------------------------------- #
# Trainer end-to-end on a separable toy problem
# --------------------------------------------------------------------------- #


def _toy_batches(rng, n_batches, batch_size=16, t=12, f=8):
    """Positives have a loud band; trivially separable."""
    batches = []
    for _ in range(n_batches):
        y = (rng.uniform(size=batch_size) > 0.5).astype(np.float32)
        x = rng.standard_normal((batch_size, t, f)).astype(np.float32) * 0.1
        x[y > 0.5, :, :3] += 2.0
        batches.append({"inputs": x, "is_laugh": y})
    return batches


@pytest.fixture(scope="module")
def tiny_model():
    # MLP: fast to compile, exercises BN + dropout + linear paths
    return models.MLPModel(linear_layer_size=12 * 8, hid_dim1=32, hid_dim2=16, dropout_rate=0.0)


def test_training_reduces_loss(tiny_model, rng):
    trainer = Trainer(model=tiny_model)
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0))
    batches = _toy_batches(rng, 80)
    first = last = None
    key = jax.random.PRNGKey(1)
    for batch in batches:
        key, k = jax.random.split(key)
        params, state, opt_state, m = trainer.train_batch(params, state, opt_state, batch, k)
        if first is None:
            first = float(m["loss"])
        last = float(m["loss"])
    assert last < first * 0.5
    val = trainer.eval_batches(params, state, _toy_batches(rng, 4))
    assert val["acc"] > 0.9


def test_grad_accum_matches_big_batch(tiny_model, rng):
    """accum=2 over two half-batches == one step on the concatenated batch
    (BN-free check would be exact; with BN the running stats differ but the
    applied gradient must match to fp tolerance on this BN-light model)."""
    x = rng.standard_normal((8, 12, 8)).astype(np.float32)
    y = (rng.uniform(size=8) > 0.5).astype(np.float32)

    t_accum = Trainer(model=tiny_model, grad_accum=2)
    p0, s0, o0 = t_accum.init(jax.random.PRNGKey(3))
    pa, sa, oa = p0, s0, o0
    for i in range(2):
        batch = {"inputs": x[i * 4 : (i + 1) * 4], "is_laugh": y[i * 4 : (i + 1) * 4]}
        pa, sa, oa, _ = t_accum.train_batch(pa, sa, oa, batch, None)
    # after 2 micro-batches exactly one optimizer step happened
    assert int(oa.step) == 1
    # params actually moved
    moved = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()), p0, pa)
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_write_artifacts_false_persists_nothing(tiny_model, rng, tmp_path):
    """Multi-host non-coordinator processes (TrainLoop.write_artifacts=False)
    must write NO checkpoints or metrics — and must not accrete metric rows
    in memory either."""
    trainer = Trainer(model=tiny_model)
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0))
    loop = TrainLoop(
        trainer=trainer,
        checkpoint_dir=str(tmp_path),
        log_frequency=5,
        metrics_path=str(tmp_path / "metrics.csv"),
        write_artifacts=False,
    )
    loop.run_epoch(
        params, state, opt_state, _toy_batches(rng, 10),
        val_batches_fn=lambda n: _toy_batches(rng, 2), verbose=False,
    )
    loop.flush_metrics()
    assert list(tmp_path.iterdir()) == []
    assert loop.metrics_rows == []
    # best_val_loss tracking still runs (it feeds the is_best decision the
    # coordinator acts on; metrics are replicated so the value is shared)
    assert loop.best_val_loss != float("inf")


def test_sync_preempt_stops_loop_from_remote_flag(tiny_model, rng, tmp_path):
    """A preemption observed only through the sync hook (another host's
    SIGTERM) must stop this loop at the same step boundary and checkpoint."""
    calls = []

    def sync(local_flag):
        calls.append(local_flag)
        return local_flag or len(calls) >= 4  # "remote" flag raised at step 4

    trainer = Trainer(model=tiny_model)
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0))
    loop = TrainLoop(
        trainer=trainer, checkpoint_dir=str(tmp_path), log_frequency=100,
        sync_preempt=sync, preempt_vote_every=1,
    )
    loop.run_epoch(params, state, opt_state, _toy_batches(rng, 10), verbose=False)
    assert loop.preempted
    assert loop.global_step == 4
    # cadence 1: consulted at every boundary up to the agreed stop
    assert calls == [False, False, False, False]
    assert any(tmp_path.iterdir())  # boundary checkpoint written


def test_preempt_signal_during_vote_joins_next_vote(tiny_model, rng, tmp_path):
    """A SIGTERM landing DURING the sync_preempt all-gather must not be
    clobbered by that vote's stale result: it stays pending and joins the
    NEXT boundary's vote, where all processes then agree to stop."""
    loop_box = {}
    votes = []

    def sync(flag):
        votes.append(flag)
        if len(votes) == 3:
            # The signal handler fires mid-allgather: it sets the RAW
            # pending flag while this vote is already in flight...
            loop_box["loop"]._preempt_pending = True
            return False  # ...and the in-flight vote returns stale False.
        return flag

    trainer = Trainer(model=tiny_model)
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0))
    loop = TrainLoop(
        trainer=trainer, checkpoint_dir=str(tmp_path), log_frequency=100,
        sync_preempt=sync, preempt_vote_every=1,
    )
    loop_box["loop"] = loop
    loop.run_epoch(params, state, opt_state, _toy_batches(rng, 10), verbose=False)
    # The stale vote (step 3) did NOT stop the loop — that would desync a
    # pod — but the pending signal joined step 4's vote and stopped it.
    assert votes == [False, False, False, True]
    assert loop.preempted
    assert loop.global_step == 4


def test_preempt_vote_cadence_skips_non_voting_boundaries(tiny_model, rng, tmp_path):
    """With preempt_vote_every=K the sync hook runs only at global_step
    multiples of K (the all-gather blocks the host; voting every step would
    stall the dispatch pipeline) — and an agreed stop lands at a voting
    boundary."""
    votes = []  # global_step at each vote

    def sync(flag):
        votes.append(loop.global_step)
        return flag or len(votes) >= 2  # "remote" flag raised at 2nd vote

    trainer = Trainer(model=tiny_model)
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0))
    loop = TrainLoop(
        trainer=trainer, checkpoint_dir=str(tmp_path), log_frequency=100,
        sync_preempt=sync, preempt_vote_every=3,
    )
    loop.run_epoch(params, state, opt_state, _toy_batches(rng, 10), verbose=False)
    assert votes == [3, 6]
    assert loop.preempted
    assert loop.global_step == 6


def test_preempt_local_flag_waits_for_voting_boundary(tiny_model, rng, tmp_path):
    """A locally-set `preempted = True` between votes must NOT stop the loop
    unilaterally (that would desert the pod's collectives); it is acted on
    at the next voting boundary, where the vote's OR makes every process
    see it."""
    trainer = Trainer(model=tiny_model)
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0))
    loop = TrainLoop(
        trainer=trainer, checkpoint_dir=str(tmp_path), log_frequency=100,
        sync_preempt=lambda flag: flag, preempt_vote_every=4,
    )

    def batches():
        for i, b in enumerate(_toy_batches(rng, 10)):
            if i == 1:  # "SIGTERM" lands after batch 1 (global_step 2)
                loop.preempted = True
            yield b

    loop.run_epoch(params, state, opt_state, batches(), verbose=False)
    assert loop.preempted
    assert loop.global_step == 4  # next multiple of the cadence, not 2


def test_preempt_epoch_end_vote_catches_tail_signal(tiny_model, rng, tmp_path):
    """A signal landing after the last in-epoch vote must be agreed at the
    unconditional epoch-end vote — not leak out of run_epoch acted on by
    one process only.  The epoch is complete, so the checkpoint records the
    next epoch's clean boundary."""
    votes = []

    def sync(flag):
        votes.append((loop.global_step, flag))
        return flag

    trainer = Trainer(model=tiny_model)
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0))
    loop = TrainLoop(
        trainer=trainer, checkpoint_dir=str(tmp_path), log_frequency=100,
        sync_preempt=sync, preempt_vote_every=100,  # never votes in-epoch
    )

    def batches():
        for i, b in enumerate(_toy_batches(rng, 6)):
            if i == 4:
                loop.preempted = True
            yield b

    loop.run_epoch(params, state, opt_state, batches(), verbose=False)
    assert votes == [(6, True)]  # only the epoch-end vote ran
    assert loop.preempted
    assert loop.epoch == 1 and loop.epoch_step == 0  # epoch completed
    assert any(tmp_path.iterdir())  # epoch-boundary checkpoint written
    from laughter_detection_icsi_tpu.train import checkpoint as ckpt_lib

    loaded = ckpt_lib.load_checkpoint(
        ckpt_lib.resolve_checkpoint(str(tmp_path))
    )
    assert loaded["epoch"] == 1 and loaded["epoch_step"] == 0


def test_checkpoint_resume_roundtrip(tiny_model, rng, tmp_path):
    trainer = Trainer(model=tiny_model)
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0))
    loop = TrainLoop(trainer=trainer, checkpoint_dir=str(tmp_path), log_frequency=5)
    batches = _toy_batches(rng, 10)
    params, state, opt_state, _ = loop.run_epoch(
        params, state, opt_state, batches,
        val_batches_fn=lambda n: _toy_batches(rng, 2), verbose=False,
    )
    assert loop.global_step == 10

    # a fresh loop resumes counters, params, and optimizer state
    loop2 = TrainLoop(trainer=trainer, checkpoint_dir=str(tmp_path), log_frequency=5)
    p2, s2, o2 = trainer.init(jax.random.PRNGKey(9))
    p2, s2, o2 = loop2.resume_if_possible(p2, s2, o2)
    assert loop2.global_step == 10
    assert loop2.best_val_loss == pytest.approx(loop.best_val_loss)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(p2)[0]),
        np.asarray(jax.tree_util.tree_leaves(params)[0]),
        atol=0,
    )
    assert int(o2.step) == int(opt_state.step)


def test_metrics_csv_append_merge(tmp_path):
    path = str(tmp_path / "metrics.csv")
    update_metrics_on_disk(
        [{"global_step": 5, "train_loss": 0.5}, {"global_step": 10, "train_loss": 0.4}], path
    )
    # overwrite step 10, add step 15 and a NEW column
    update_metrics_on_disk(
        [{"global_step": 10, "train_loss": 0.35, "val_loss": 0.6},
         {"global_step": 15, "train_loss": 0.3}], path
    )
    import csv

    with open(path) as f:
        rows = list(csv.DictReader(f))
    assert [r["global_step"] for r in rows] == ["5", "10", "15"]
    assert rows[1]["train_loss"] == "0.35"
    assert rows[1]["val_loss"] == "0.6"


def test_transfer_dtype_bfloat16_step(tiny_model):
    # bf16 input transfer must round ONLY the inputs: one step's loss sits
    # within bf16 input tolerance of the float32-transfer step.
    import jax

    from laughter_detection_icsi_tpu.train.loop import Trainer

    model = tiny_model
    rng = np.random.default_rng(0)
    batch = {
        "inputs": (rng.standard_normal((8, 12, 8)) * 2).astype(np.float32),
        "is_laugh": rng.integers(0, 2, 8).astype(np.float32),
    }
    key = jax.random.PRNGKey(3)
    losses = {}
    for td in (None, "bfloat16"):
        tr = Trainer(model, transfer_dtype=td)
        params, state, opt = tr.init(jax.random.PRNGKey(0))
        _, _, _, m = tr.train_batch(params, state, opt, batch, key)
        losses[td] = float(m["loss"])
    assert losses["bfloat16"] == pytest.approx(losses[None], rel=2e-2)


def test_preemption_checkpoint_and_resume(tiny_model, rng, tmp_path):
    """SIGTERM mid-epoch: the loop saves at the step boundary with its
    intra-epoch position, and a resumed loop skips the already-trained
    batches of the seeded epoch — interrupted + resumed training produces
    EXACTLY the params of the uninterrupted run."""
    import os
    import signal

    def fixed_batches(n):
        # deterministic batches (epoch replays must see identical data)
        r = np.random.default_rng(77)
        return _toy_batches(r, n)

    try:
        # --- continuous oracle -------------------------------------- #
        trainer_c = Trainer(model=tiny_model)
        pc, sc, oc = trainer_c.init(jax.random.PRNGKey(0))
        loop_c = TrainLoop(
            trainer=trainer_c, checkpoint_dir=str(tmp_path / "c"), log_frequency=0
        )
        pc, sc, oc, _ = loop_c.run_epoch(
            pc, sc, oc, fixed_batches(10), rng=jax.random.PRNGKey(5), verbose=False
        )

        # --- interrupted at step 4 ----------------------------------- #
        trainer = Trainer(model=tiny_model)
        params, state, opt_state = trainer.init(jax.random.PRNGKey(0))
        loop = TrainLoop(
            trainer=trainer, checkpoint_dir=str(tmp_path / "i"), log_frequency=0
        )
        loop.install_preemption_handler()

        def batches_with_signal(n, kill_after):
            for i, b in enumerate(fixed_batches(n)):
                if i == kill_after:
                    os.kill(os.getpid(), signal.SIGTERM)
                yield b

        params, state, opt_state, _ = loop.run_epoch(
            params, state, opt_state, batches_with_signal(10, kill_after=3),
            rng=jax.random.PRNGKey(5), verbose=False,
        )
        assert loop.preempted
        assert loop.global_step == 4  # in-flight step completed, then stop
        assert loop.epoch == 0 and loop.epoch_step == 4

        # --- resume: skips the 4 trained batches, finishes the epoch - #
        loop2 = TrainLoop(
            trainer=trainer, checkpoint_dir=str(tmp_path / "i"), log_frequency=0
        )
        p2, s2, o2 = trainer.init(jax.random.PRNGKey(9))
        p2, s2, o2 = loop2.resume_if_possible(p2, s2, o2)
        assert loop2.global_step == 4 and loop2.epoch == 0 and loop2.epoch_step == 4
        p2, s2, o2, _ = loop2.run_epoch(
            p2, s2, o2, fixed_batches(10), rng=jax.random.PRNGKey(5), verbose=False
        )
        assert loop2.global_step == 10 and loop2.epoch == 1 and loop2.epoch_step == 0

        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            p2, pc,
        )
        assert int(o2.step) == int(oc.step)
    finally:
        # restore default handlers for the rest of the test session
        signal.signal(signal.SIGTERM, signal.SIG_DFL)
        signal.signal(signal.SIGINT, signal.default_int_handler)


def test_preemption_mid_accum_group_exact_incl_bn_state(tiny_model, tmp_path):
    """Preemption in the MIDDLE of a grad-accumulation group: the pending
    micro-batches are rolled back (counters AND BN running stats — grad_step
    updates state per micro-batch, so without the state rollback the
    replayed micro-batches would be absorbed twice) and the resumed run is
    bit-identical to an uninterrupted one, state included."""
    import os
    import signal

    def fixed_batches(n):
        r = np.random.default_rng(88)
        return _toy_batches(r, n)

    try:
        trainer_c = Trainer(model=tiny_model, grad_accum=2)
        pc, sc, oc = trainer_c.init(jax.random.PRNGKey(0))
        loop_c = TrainLoop(
            trainer=trainer_c, checkpoint_dir=str(tmp_path / "c"), log_frequency=0
        )
        pc, sc, oc, _ = loop_c.run_epoch(
            pc, sc, oc, fixed_batches(8), rng=jax.random.PRNGKey(5), verbose=False
        )

        trainer = Trainer(model=tiny_model, grad_accum=2)
        params, state, opt_state = trainer.init(jax.random.PRNGKey(0))
        loop = TrainLoop(
            trainer=trainer, checkpoint_dir=str(tmp_path / "i"), log_frequency=0
        )
        loop.install_preemption_handler()

        def batches_with_signal(n, kill_after):
            for i, b in enumerate(fixed_batches(n)):
                if i == kill_after:
                    os.kill(os.getpid(), signal.SIGTERM)
                yield b

        # kill at i=2 -> 3 micro-steps done, 1 pending past the boundary
        params, state, opt_state, _ = loop.run_epoch(
            params, state, opt_state, batches_with_signal(8, kill_after=2),
            rng=jax.random.PRNGKey(5), verbose=False,
        )
        assert loop.preempted
        assert loop.global_step == 2  # rolled back to the apply boundary
        assert trainer._accum_count == 0

        loop2 = TrainLoop(
            trainer=trainer, checkpoint_dir=str(tmp_path / "i"), log_frequency=0
        )
        p2, s2, o2 = trainer.init(jax.random.PRNGKey(9))
        p2, s2, o2 = loop2.resume_if_possible(p2, s2, o2)
        assert loop2.epoch_step == 2
        p2, s2, o2, _ = loop2.run_epoch(
            p2, s2, o2, fixed_batches(8), rng=jax.random.PRNGKey(5), verbose=False
        )

        for tree_got, tree_want, label in ((p2, pc, "params"), (s2, sc, "state")):
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b)
                ),
                tree_got, tree_want,
            )
        assert int(o2.step) == int(oc.step)
    finally:
        signal.signal(signal.SIGTERM, signal.SIG_DFL)
        signal.signal(signal.SIGINT, signal.default_int_handler)


def test_epoch_end_flushes_partial_accum_group(tiny_model, tmp_path):
    """Accumulation groups never span epochs (PARITY #22): a 3-batch epoch
    at accum=2 applies its tail micro-batch AT the boundary, so the next
    epoch starts at an apply boundary and a preemption there can never roll
    counters negative or drop the previous epoch's pending gradients."""
    import os
    import signal

    def fixed_batches(n, seed):
        r = np.random.default_rng(seed)
        return _toy_batches(r, n)

    try:
        # Uninterrupted oracle: two 3-batch epochs.
        trainer_c = Trainer(model=tiny_model, grad_accum=2)
        pc, sc, oc = trainer_c.init(jax.random.PRNGKey(0))
        loop_c = TrainLoop(
            trainer=trainer_c, checkpoint_dir=str(tmp_path / "c"), log_frequency=0
        )
        for ep in range(2):
            assert trainer_c.pending_micro_steps == 0  # boundary at entry
            pc, sc, oc, _ = loop_c.run_epoch(
                pc, sc, oc, fixed_batches(3, 70 + ep),
                rng=jax.random.PRNGKey(ep), verbose=False,
            )
        assert trainer_c.pending_micro_steps == 0  # tail group flushed

        # Interrupted twin: epoch 0 runs whole, epoch 1 preempted after one
        # batch (1 pending micro-batch; rollback must stay within epoch 1).
        trainer = Trainer(model=tiny_model, grad_accum=2)
        params, state, opt_state = trainer.init(jax.random.PRNGKey(0))
        loop = TrainLoop(
            trainer=trainer, checkpoint_dir=str(tmp_path / "i"), log_frequency=0
        )
        params, state, opt_state, _ = loop.run_epoch(
            params, state, opt_state, fixed_batches(3, 70),
            rng=jax.random.PRNGKey(0), verbose=False,
        )
        loop.install_preemption_handler()

        def batches_with_signal():
            # the flag is checked AFTER a batch is processed, so killing
            # before yielding batch 0 preempts with exactly 1 micro-batch
            # pending past the epoch-entry boundary
            for i, b in enumerate(fixed_batches(3, 71)):
                if i == 0:
                    os.kill(os.getpid(), signal.SIGTERM)
                yield b

        params, state, opt_state, _ = loop.run_epoch(
            params, state, opt_state, batches_with_signal(),
            rng=jax.random.PRNGKey(1), verbose=False,
        )
        assert loop.global_step == 3 and loop.epoch_step == 0  # boundary, not negative
        assert loop.epoch == 1

        trainer2 = Trainer(model=tiny_model, grad_accum=2)
        loop2 = TrainLoop(
            trainer=trainer2, checkpoint_dir=str(tmp_path / "i"), log_frequency=0
        )
        p2, s2, o2 = trainer2.init(jax.random.PRNGKey(9))
        p2, s2, o2 = loop2.resume_if_possible(p2, s2, o2)
        assert loop2.epoch == 1 and loop2.epoch_step == 0
        p2, s2, o2, _ = loop2.run_epoch(
            p2, s2, o2, fixed_batches(3, 71),
            rng=jax.random.PRNGKey(1), verbose=False,
        )
        for tree_got, tree_want in ((p2, pc), (s2, sc)):
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b)
                ),
                tree_got, tree_want,
            )
        assert int(o2.step) == int(oc.step)
    finally:
        import signal

        signal.signal(signal.SIGTERM, signal.SIG_DFL)
        signal.signal(signal.SIGINT, signal.default_int_handler)


def test_best_ckpt_state_matches_recorded_val_loss(tiny_model, tmp_path):
    """A log point falling mid-accumulation-group must validate with the
    SAME state it checkpoints (the apply-boundary snapshot): best.ckpt is
    the model that achieved the recorded best_val_loss."""
    from laughter_detection_icsi_tpu.train import checkpoint as ckpt_lib

    def val_batches(n):
        r = np.random.default_rng(55)
        return _toy_batches(r, 2)

    trainer = Trainer(model=tiny_model, grad_accum=2)
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0))
    loop = TrainLoop(
        trainer=trainer, checkpoint_dir=str(tmp_path), log_frequency=3
    )
    r = np.random.default_rng(66)
    loop.run_epoch(
        params, state, opt_state, _toy_batches(r, 4),
        val_batches_fn=val_batches,
        rng=jax.random.PRNGKey(2), verbose=False,
    )
    row = next(rw for rw in loop.metrics_rows if rw["global_step"] == 3)
    loaded = ckpt_lib.load_checkpoint(str(tmp_path / "best.ckpt.npz"))
    re_val = trainer.eval_batches(loaded["params"], loaded["state"], val_batches(2))
    assert re_val["loss"] == pytest.approx(row["val_loss"], abs=1e-6)
    assert float(loaded["best_val_loss"]) == pytest.approx(row["val_loss"], abs=1e-6)


def test_empty_validation_iterator_does_not_crash(tiny_model, rng, tmp_path):
    """A val_batches_fn that yields nothing (tiny dev split +
    drop_remainder) must not KeyError the run at the log point."""
    trainer = Trainer(model=tiny_model)
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0))
    loop = TrainLoop(
        trainer=trainer, checkpoint_dir=str(tmp_path), log_frequency=2
    )
    params, state, opt_state, loss = loop.run_epoch(
        params, state, opt_state, _toy_batches(rng, 4),
        val_batches_fn=lambda n: [],
        rng=jax.random.PRNGKey(1), verbose=False,
    )
    assert np.isfinite(loss)
    assert loop.global_step == 4


def test_periodic_save_mid_accum_group_resumes_exactly(tiny_model, tmp_path):
    """A log-frequency checkpoint can fall mid-gradient-accumulation-group;
    it must record the APPLY-BOUNDARY snapshot (counters, params, BN state)
    so a hard kill right after the save resumes bit-identically — the same
    invariant the preemption path guarantees."""

    def fixed_batches(n):
        r = np.random.default_rng(91)
        return _toy_batches(r, n)

    # continuous oracle over 4 batches
    trainer_c = Trainer(model=tiny_model, grad_accum=2)
    pc, sc, oc = trainer_c.init(jax.random.PRNGKey(0))
    loop_c = TrainLoop(
        trainer=trainer_c, checkpoint_dir=str(tmp_path / "c"), log_frequency=0
    )
    pc, sc, oc, _ = loop_c.run_epoch(
        pc, sc, oc, fixed_batches(4), rng=jax.random.PRNGKey(5), verbose=False
    )

    # interrupted run: periodic save lands at step 3 (mid-group; accum=2)
    trainer = Trainer(model=tiny_model, grad_accum=2)
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0))
    loop = TrainLoop(
        trainer=trainer, checkpoint_dir=str(tmp_path / "i"), log_frequency=3
    )
    loop.run_epoch(
        params, state, opt_state, fixed_batches(3),  # hard kill after step 3
        rng=jax.random.PRNGKey(5), verbose=False,
    )

    trainer2 = Trainer(model=tiny_model, grad_accum=2)
    loop2 = TrainLoop(
        trainer=trainer2, checkpoint_dir=str(tmp_path / "i"), log_frequency=0
    )
    p2, s2, o2 = trainer2.init(jax.random.PRNGKey(9))
    p2, s2, o2 = loop2.resume_if_possible(p2, s2, o2)
    # the mid-group save rolled back to the apply boundary (step 2)
    assert loop2.global_step == 2 and loop2.epoch_step == 2
    p2, s2, o2, _ = loop2.run_epoch(
        p2, s2, o2, fixed_batches(4), rng=jax.random.PRNGKey(5), verbose=False
    )
    for tree_got, tree_want in ((p2, pc), (s2, sc)):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            tree_got, tree_want,
        )
    assert int(o2.step) == int(oc.step)


def test_checkpoint_portable_across_device_counts(tiny_model, rng, tmp_path):
    """Elastic resume: a single-device checkpoint must load into the
    8-device data-parallel trainer and keep training (and vice versa) —
    checkpoints are device-layout-agnostic npz trees."""
    from laughter_detection_icsi_tpu.parallel import DataParallelTrainer, make_mesh

    trainer = Trainer(model=tiny_model)
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0))
    loop = TrainLoop(trainer=trainer, checkpoint_dir=str(tmp_path), log_frequency=0)
    params, state, opt_state, _ = loop.run_epoch(
        params, state, opt_state, _toy_batches(rng, 4), verbose=False
    )
    loop._save(params, state, opt_state, is_best=False)

    dp = DataParallelTrainer(model=tiny_model, mesh=make_mesh(8))
    p2, s2, o2 = dp.init(jax.random.PRNGKey(1))
    loop2 = TrainLoop(trainer=dp, checkpoint_dir=str(tmp_path), log_frequency=0)
    p2, s2, o2 = loop2.resume_if_possible(p2, s2, o2)
    assert loop2.global_step == 4
    p2, s2, o2, loss = loop2.run_epoch(
        p2, s2, o2, _toy_batches(rng, 4), verbose=False
    )
    assert np.isfinite(loss)
    assert loop2.global_step == 8


def test_preemption_second_sigint_escalates(tiny_model, tmp_path):
    """A second SIGINT must break out of the graceful handler (raise
    KeyboardInterrupt) so a hung step can still be interrupted."""
    import os
    import signal

    loop = TrainLoop(
        trainer=Trainer(model=tiny_model), checkpoint_dir=str(tmp_path),
    )
    try:
        loop.install_preemption_handler()
        os.kill(os.getpid(), signal.SIGINT)  # first: graceful flag
        assert loop.preempted
        with pytest.raises(KeyboardInterrupt):
            os.kill(os.getpid(), signal.SIGINT)  # second: escalate
    finally:
        signal.signal(signal.SIGTERM, signal.SIG_DFL)
        signal.signal(signal.SIGINT, signal.default_int_handler)


def test_missing_checkpoint_path_is_file_not_found(tmp_path):
    """A wrong path must say 'file not found', not claim corruption."""
    from laughter_detection_icsi_tpu.train import checkpoint as ckpt_lib

    with pytest.raises(FileNotFoundError):
        ckpt_lib.load_checkpoint(str(tmp_path / "nope" / "last.ckpt.npz"))


def test_load_checkpoint_host_keeps_numpy_leaves(tiny_model, tmp_path):
    """host=True must return numpy leaves: jax.export reads every
    closed-over leaf's HOST value at lowering, so device-resident params
    cost one D2H transfer per parameter (a multi-minute stall each on a
    degraded tunneled link — the export CLI hang this option fixed)."""
    import numpy as np

    from laughter_detection_icsi_tpu.train import checkpoint as ckpt_lib

    params, state = tiny_model.init(jax.random.PRNGKey(0))
    ckpt_lib.save_checkpoint(str(tmp_path), params, state)
    loaded = ckpt_lib.load_checkpoint(str(tmp_path / ckpt_lib.LAST_NAME), host=True)
    for tree in (loaded["params"], loaded["state"]):
        for leaf in jax.tree_util.tree_leaves(tree):
            assert isinstance(leaf, np.ndarray), type(leaf)
    # default stays device-backed
    loaded_dev = ckpt_lib.load_checkpoint(str(tmp_path / ckpt_lib.LAST_NAME))
    assert any(
        isinstance(leaf, jax.Array)
        for leaf in jax.tree_util.tree_leaves(loaded_dev["params"])
    )


def test_resolve_checkpoint_falls_back_to_last(tmp_path):
    """A dir holding only last.ckpt (run shorter than log_frequency, so no
    validation point ever wrote best.ckpt) must still resolve — with a
    warning — instead of refusing inference on a freshly trained model
    (the reference crashed here: segment_laughter.py:63)."""
    from laughter_detection_icsi_tpu.train import checkpoint as ckpt_lib

    assert ckpt_lib.resolve_checkpoint(str(tmp_path)) is None  # empty dir
    last = tmp_path / ckpt_lib.LAST_NAME
    last.write_bytes(b"")
    with pytest.warns(UserWarning, match="falling back"):
        assert ckpt_lib.resolve_checkpoint(str(tmp_path)) == str(last)
    best = tmp_path / ckpt_lib.BEST_NAME
    best.write_bytes(b"")
    # best present: no fallback, no warning
    assert ckpt_lib.resolve_checkpoint(str(tmp_path)) == str(best)
    # a FILE path is returned verbatim
    assert ckpt_lib.resolve_checkpoint(str(last)) == str(last)


def test_checkpoint_version_and_missing_meta_errors(tmp_path):
    import json

    import numpy as np

    from laughter_detection_icsi_tpu.train import checkpoint as ckpt

    p = tmp_path / "last.ckpt.npz"
    with open(p, "wb") as f:
        np.savez(f, __meta__=json.dumps({"format_version": 2, "epoch": 0,
                                         "global_step": 0, "best_val_loss": 1.0}))
    with pytest.raises(ValueError, match="format_version 2"):
        ckpt.load_checkpoint(str(p))
    with open(p, "wb") as f:
        np.savez(f, __meta__=json.dumps({"global_step": 0}))
    with pytest.raises(ValueError, match="missing keys"):
        ckpt.load_checkpoint(str(p))


def test_resume_with_changed_batch_partition_raises(tiny_model, tmp_path):
    """A mid-epoch resume whose batch source yields FEWER batches than the
    checkpoint's epoch_step (e.g. a changed batch size) must fail loudly —
    the old behavior consumed every batch as 'already trained', counted
    the epoch complete with zero optimizer steps, and reported success."""
    trainer = Trainer(model=tiny_model)
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0))
    loop = TrainLoop(
        trainer=trainer, checkpoint_dir=str(tmp_path / "r"), log_frequency=0
    )
    loop.epoch_step = 30  # checkpoint says 30 batches already trained
    r = np.random.default_rng(3)
    with pytest.raises(RuntimeError, match="yielded only 5"):
        loop.run_epoch(
            params, state, opt_state, _toy_batches(r, 5),
            rng=jax.random.PRNGKey(1), verbose=False,
        )


def test_bn_train_rejects_single_value_per_channel():
    """torch raises 'Expected more than 1 value per channel when training'
    on a size-1 batch; silently continuing computed a zero 'unbiased'
    variance and quietly decayed running_var — a crash-vs-silent
    train-parity divergence.  (Needs a BN model — the MLP tiny_model has
    no batch norm.)"""
    from laughter_detection_icsi_tpu import models as _models

    bn_model = _models.build(
        "ResNetBigger", dropout_rate=0.0, linear_layer_size=24,
        filter_sizes=(8, 8, 8, 8),
    )
    trainer = Trainer(model=bn_model)
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0))
    batch = {
        "inputs": np.zeros((1, 100, 44), np.float32),
        "is_laugh": np.zeros(1, np.float32),
    }
    with pytest.raises(ValueError, match="more than 1 value per channel"):
        trainer.train_batch(params, state, opt_state, batch, None)


def test_trainer_rejects_unknown_transfer_dtype(tiny_model):
    """Same eager rejection as ResidentLadDataset: 'bf16' silently fell
    through to the float32 path, losing the halved transfer bytes the
    flag exists for with no error."""
    with pytest.raises(ValueError, match="transfer_dtype"):
        Trainer(model=tiny_model, transfer_dtype="bf16")


def test_run_epoch_entry_drops_stale_accum_group(tiny_model):
    """An exception escaping run_epoch mid-accumulation-group must not let
    stale micro-gradients fold into the NEXT run_epoch's first apply (or
    shift its counters): entry re-establishes the apply boundary."""
    trainer = Trainer(model=tiny_model, grad_accum=4)
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0))
    loop = TrainLoop(trainer=trainer, checkpoint_dir=None, log_frequency=0)
    r = np.random.default_rng(5)

    def exploding(n_good):
        for i, b in enumerate(_toy_batches(r, n_good + 1)):
            if i == n_good:
                raise RuntimeError("assembly error")
            yield b

    with pytest.raises(RuntimeError, match="assembly error"):
        loop.run_epoch(params, state, opt_state, exploding(2),
                       rng=jax.random.PRNGKey(1), verbose=False)
    assert trainer.pending_micro_steps == 2  # dirty, as the abort left it
    assert loop.global_step == 2 and loop.epoch_step == 2
    # A fresh epoch on the SAME loop must start from a clean boundary and
    # produce the same params as a run that never saw the aborted epoch.
    r2 = np.random.default_rng(9)
    p1, s1, o1, _ = loop.run_epoch(params, state, opt_state,
                                   _toy_batches(r2, 8),
                                   rng=jax.random.PRNGKey(2), verbose=False)
    assert trainer.pending_micro_steps == 0
    trainer_c = Trainer(model=tiny_model, grad_accum=4)
    loop_c = TrainLoop(trainer=trainer_c, checkpoint_dir=None, log_frequency=0)
    r3 = np.random.default_rng(9)
    p2, s2, o2, _ = loop_c.run_epoch(params, state, opt_state,
                                     _toy_batches(r3, 8),
                                     rng=jax.random.PRNGKey(2), verbose=False)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# --------------------------------------------------------------------------- #
# K-steps-per-dispatch resident training
# --------------------------------------------------------------------------- #


class _FakeResident:
    """Minimal resident-dataset stand-in: device feats/labels, no cache."""

    def __init__(self, rng, n=64, t=12, f=8):
        y = (rng.uniform(size=n) > 0.5).astype(np.float32)
        x = rng.standard_normal((n, t, f)).astype(np.float32) * 0.1
        x[y > 0.5, :, :3] += 2.0
        self.feats = jnp.asarray(x)
        self.labels = jnp.asarray(y)

    def gather(self, idx):
        idx = np.asarray(idx)
        return self.feats[idx], None, self.labels[idx]


def test_k_step_resident_matches_per_step(tiny_model, rng):
    """ONE scanned K-step dispatch must train identically to K sequential
    fused resident steps: same ops in the same order, same
    fold_in(key, step0 + k) dropout keys.  Exact for this matmul-only
    model; conv models are equivalent only up to float reassociation (XLA
    compiles the scanned body separately — see build_step_fns), which
    test_k_step_resident_conv_first_step_close pins at the loss level."""
    res = _FakeResident(rng)
    key = jax.random.PRNGKey(7)
    idx_mat = np.stack([np.arange(k * 8, (k + 1) * 8) for k in range(8)]).astype(np.int32)

    trainer = Trainer(model=tiny_model)
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0))
    p_seq, s_seq, o_seq = params, state, opt_state
    seq_losses = []
    for k in range(8):
        p_seq, s_seq, o_seq, m = trainer.train_batch_resident(
            p_seq, s_seq, o_seq, res, idx_mat[k], key, 100 + k
        )
        seq_losses.append(float(m["loss"]))

    p_k, s_k, o_k, mk = trainer.train_k_steps_resident(
        params, state, opt_state, res, idx_mat, key, 100
    )
    np.testing.assert_allclose(
        np.asarray(mk["loss"]), np.asarray(seq_losses), rtol=1e-6
    )
    for a, b in zip(jax.tree_util.tree_leaves(p_k), jax.tree_util.tree_leaves(p_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(s_k), jax.tree_util.tree_leaves(s_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_k_step_resident_rejects_bad_inputs(tiny_model, rng):
    res = _FakeResident(rng)
    trainer = Trainer(model=tiny_model, grad_accum=2)
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="grad_accum"):
        trainer.train_k_steps_resident(
            params, state, opt_state, res,
            np.zeros((4, 8), np.int32), jax.random.PRNGKey(0), 0,
        )
    trainer1 = Trainer(model=tiny_model)
    with pytest.raises(ValueError, match=r"\[K, B\]"):
        trainer1.train_k_steps_resident(
            params, state, opt_state, res,
            np.zeros(8, np.int32), jax.random.PRNGKey(0), 0,
        )


def test_trainloop_steps_per_dispatch_equivalence(tiny_model, rng, tmp_path):
    """A full epoch at steps_per_dispatch=8 must reproduce the K=1 epoch
    exactly — params, step counters, logged metric rows — including a
    log_frequency (4) smaller than K (groups align to log points) and an
    epoch-tail partial batch (different [B] falls out of the group)."""
    res = _FakeResident(rng, n=60)  # 60 rows / batch 8 -> 7 full + tail of 4
    perm = np.random.default_rng(3).permutation(60).astype(np.int32)
    batches = [
        {"resident": res, "idx": perm[i: i + 8]} for i in range(0, 60, 8)
    ]

    def run(k):
        trainer = Trainer(model=tiny_model)
        params, state, opt_state = trainer.init(jax.random.PRNGKey(0))
        loop = TrainLoop(
            trainer=trainer, checkpoint_dir=str(tmp_path / f"ck{k}"),
            log_frequency=4, steps_per_dispatch=k,
        )
        params, state, opt_state, mean_loss = loop.run_epoch(
            params, state, opt_state, list(batches),
            rng=jax.random.PRNGKey(5), verbose=False,
        )
        return params, loop, mean_loss

    p1, loop1, ml1 = run(1)
    p8, loop8, ml8 = run(8)
    assert loop8.global_step == loop1.global_step == 8
    assert ml8 == pytest.approx(ml1, rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p8), jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
    assert len(loop8.metrics_rows) == len(loop1.metrics_rows)
    for r8, r1 in zip(loop8.metrics_rows, loop1.metrics_rows):
        assert r8["global_step"] == r1["global_step"]
        assert r8["train_loss"] == pytest.approx(r1["train_loss"], rel=1e-5)


def test_trainloop_steps_per_dispatch_rejects_grad_accum(tiny_model, rng, tmp_path):
    res = _FakeResident(rng)
    trainer = Trainer(model=tiny_model, grad_accum=2)
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0))
    loop = TrainLoop(
        trainer=trainer, checkpoint_dir=str(tmp_path / "ck"),
        log_frequency=0, steps_per_dispatch=4,
    )
    with pytest.raises(ValueError, match="grad_accum"):
        loop.run_epoch(
            params, state, opt_state,
            [{"resident": res, "idx": np.arange(8)}],
            rng=jax.random.PRNGKey(0), verbose=False,
        )


def test_k_step_resident_conv_first_step_close(rng):
    """Conv models under scan: XLA may lower the scanned conv fwd/bwd
    differently than the standalone step, so trajectories are equivalent
    only up to float reassociation (Adam's sign-like early steps then
    amplify ~1e-7 gradient noise to ~lr-sized param differences — measured
    and documented in build_step_fns).  Pin the invariant that IS exact
    enough to test: the first scanned step computes the same loss as the
    standalone dispatch to float-noise tolerance."""
    model = models.build(
        "ResNetBigger", dropout_rate=0.5, linear_layer_size=24,
        filter_sizes=(8, 8, 8, 8),
    )
    res = _FakeResident(rng, n=16, t=100, f=44)
    trainer = Trainer(model=model)
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0))
    idx = np.arange(8, dtype=np.int32)
    key = jax.random.PRNGKey(3)
    _, _, _, m1 = trainer.train_batch_resident(
        params, state, opt_state, res, idx, key, 5
    )
    _, _, _, mk = trainer.train_k_steps_resident(
        params, state, opt_state, res, idx[None, :], key, 5
    )
    assert float(mk["loss"][0]) == pytest.approx(float(m1["loss"]), rel=1e-4)

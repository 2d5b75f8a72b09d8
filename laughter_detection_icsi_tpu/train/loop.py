"""Training loop: jitted step functions + host epoch driver.

Rebuild of the reference training driver (reference train.py:150-415) as a
TPU-first design: the hot path is ONE jitted ``train_step`` — forward, BCE
loss, backward, global-norm clip, Adam update, BN running-stat update — so
the device never round-trips activations or gradients to host; the host loop
only feeds batches and reads back scalar metrics.

Parity notes (SURVEY.md §2.4-2.5):
- Loss: torch ``BCELoss`` on sigmoid outputs, mean reduction, log clamped at
  -100 (reference train.py:277-287).
- Clip 1.0 + Adam lr 1e-3 every ``grad_accum`` batches (reference
  train.py:288-295; the reference's LR schedule is dead, SURVEY.md §2.5-1).
- Metrics: accuracy / precision / recall at threshold 0.5, precision := 1.0
  when there are no positive predictions (reference train.py:203-224).
- The reference's ``num_batches = +1`` bug makes run_epoch return total
  instead of mean loss (reference train.py:356,415); we return the mean,
  deliberately (documented fix).
- Checkpoint every ``log_frequency`` steps, best on lowest val loss
  (reference train.py:363-412).

Gradient accumulation uses a host micro-loop over a jitted grad step rather
than an in-graph ``lax.scan`` (scanning a conv net compiles ~60x slower —
see ops/windows.py note); gradients stay device-resident between micro-steps.
"""

from __future__ import annotations

import dataclasses
import time
import warnings
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from laughter_detection_icsi_tpu.models.zoo import Model
from laughter_detection_icsi_tpu.train import checkpoint as ckpt_lib
from laughter_detection_icsi_tpu.train.optim import Adam, AdamState

PyTree = Any


# --------------------------------------------------------------------------- #
# Loss + metrics (pure functions, used inside jit)
# --------------------------------------------------------------------------- #


@jax.custom_vjp
def bce_loss(probs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.BCELoss(mean): log terms clamped at -100 in the forward,
    denominator clamped in the backward.

    The custom VJP mirrors torch's backward, ``(p - y) / max(p(1-p), eps)``
    — NOT the naive autodiff of the clamped forward, which is NaN the
    moment a sigmoid saturates to exactly 0.0/1.0 in float32 (reverse mode
    through ``maximum(log(p), -100)`` computes ``0 * inf``; |logit| >= ~17
    reaches that, i.e. any confidently-classified example would poison the
    whole batch's gradient permanently)."""
    log_p = jnp.maximum(jnp.log(probs), -100.0)
    log_1p = jnp.maximum(jnp.log(1.0 - probs), -100.0)
    return -jnp.mean(targets * log_p + (1.0 - targets) * log_1p)


def _bce_fwd(probs, targets):
    return bce_loss(probs, targets), (probs, targets)


def _bce_bwd(res, g):
    probs, targets = res
    # torch BCELoss backward: (p - y) / clamp_min(p * (1 - p), eps), / N
    # for the mean reduction (aten EPSILON = 1e-12).
    denom = jnp.maximum(probs * (1.0 - probs), 1e-12)
    grad_p = g * (probs - targets) / denom / probs.size
    return grad_p, jnp.zeros_like(targets)


bce_loss.defvjp(_bce_fwd, _bce_bwd)


def batch_metrics(probs: jnp.ndarray, targets: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """accuracy/precision/recall at 0.5 (reference train.py:203-224).

    precision := 1.0 with no positive predictions matches the reference's
    explicit special case (train.py:216-218).  recall with no positive
    targets is 0/0 = NaN in the reference (train.py:221, which then poisons
    its logged means); we deliberately return 1.0 instead so metric
    averages stay finite — documented divergence, PARITY.md #13."""
    preds = (probs > 0.5).astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    tp = jnp.sum(preds * targets)
    pred_pos = jnp.sum(preds)
    actual_pos = jnp.sum(targets)
    acc = jnp.mean((preds == targets).astype(jnp.float32))
    precision = jnp.where(pred_pos == 0, 1.0, tp / jnp.maximum(pred_pos, 1.0))
    recall = jnp.where(actual_pos == 0, 1.0, tp / jnp.maximum(actual_pos, 1.0))
    return {"acc": acc, "precision": precision, "recall": recall}


# --------------------------------------------------------------------------- #
# Jitted steps
# --------------------------------------------------------------------------- #


def build_step_fns(
    model: Model, optimizer: Adam, constrain_batch=None, compute_dtype=None
):
    """Un-jitted train/eval step bodies shared by the single-device
    ``Trainer`` and ``parallel.data_parallel.DataParallelTrainer`` — ONE
    definition of the loss/grad/optimizer-update recipe, the metric set, and
    the resident ``fold_in(key, step)`` rng derivation (which the "streamed
    and resident epochs see IDENTICAL per-step dropout keys" invariant
    depends on), so the two trainers cannot silently drift.

    ``constrain_batch(x, y) -> (x, y)`` lets the data-parallel caller pin
    the HBM-gathered batch's sharding inside the resident steps (the gather
    crosses shards over ICI and must land batch-sharded); identity when
    None.  Callers jit the returned fns with their own sharding annotations.

    Returns (loss_fn, train_step, train_step_resident,
    train_k_steps_resident, eval_step, eval_step_resident):

    - train_step_resident: fused step for device-resident datasets — HBM
      batch gather + per-step rng derivation + train step in ONE dispatch
      (only the [B] index vector and the step scalar cross the link;
      link/dispatch latency is the loop bound once features are resident).
    - train_k_steps_resident: K optimizer steps in ONE dispatch — a
      ``lax.scan`` of train_step_resident over a [K, B] index matrix, so a
      tunneled/high-latency link pays its per-dispatch floor once per K
      steps instead of once per step.  Per-step metrics come back stacked
      [K].  Semantics are identical to K sequential train_step_resident
      calls (same ops, same order, same fold_in(key, step0+k) dropout
      keys); numerics are equivalent up to float reassociation — XLA
      compiles the scanned body separately and may pick different conv
      lowerings (measured: per-step loss matches to ~1e-7 relative, but
      Adam's early steps are sign-like, lr*g/(|g|+eps), so near-zero
      gradient elements amplify that noise into ~lr-sized param
      differences; matmul-only models reproduce bit-exactly).  Tradeoff:
      scanning the conv fwd+bwd body compiles markedly slower than the
      single step (the known conv-in-scan cliff — see the fused_conv probe
      lore); the compile is per (K, B) shape and amortizes across the run.
    - eval_step_resident: fused HBM gather + eval, the validation twin —
      online eval during --device_cache training never streams feature
      batches from host.

    ``compute_dtype='bfloat16'`` opts the forward/backward COMPUTE into
    bf16 (the standard TPU mixed-precision recipe): params/state/input are
    cast to bf16 at the model boundary, probabilities and the returned BN
    state are upcast back, and the loss, gradients (autodiff transposes
    the casts, so grads of the f32 masters come back f32), Adam moments
    and parameter masters all stay float32.  The reference trains fp32
    only (reference train.py:261-297); this mode exists because the f32
    step is HBM-bandwidth-bound on TPU — 86 GB of mostly-activation
    traffic per B=1024 step by XLA's cost model — and halving activation
    bytes is worth a measured 1.63x step speedup (tools/precision_probe.py,
    2026-08-20: 131 ms -> 80 ms at B=1024).  Numerics: one bf16 rounding
    of activations per layer; loss/metrics/optimizer trajectories stay
    f32-accumulated (see tests/test_mixed_precision.py for the pinned
    f32-vs-bf16 agreement bounds).
    """
    cb = constrain_batch or (lambda x, y: (x, y))
    if compute_dtype not in (None, "float32", "bfloat16"):
        # Eager rejection, same contract as Trainer.transfer_dtype: a typo
        # ('bf16', 'half') must not silently train in f32.
        raise ValueError(
            f"unknown compute_dtype {compute_dtype!r}; "
            "use 'bfloat16' or 'float32'/None"
        )
    bf16 = compute_dtype == "bfloat16"

    def _cast_floats(tree, dtype):
        return jax.tree_util.tree_map(
            lambda v: v.astype(dtype)
            if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating)
            else v,
            tree,
        )

    def apply_model(params, state, x, train, rng=None):
        """model.apply behind the precision boundary: f32 in, f32 out,
        bf16 (when opted in) strictly inside.

        In TRAIN mode the BN state is passed through in f32, NOT cast:
        batch_norm reduces batch stats in f32 and accumulates the running
        stats against the f32 masters (models/layers.py), while the
        normalization itself runs in the activation dtype — casting the
        state here would quantize `new = 0.9*old + 0.1*batch` onto the
        bf16 grid, silently freezing any update smaller than ~old/256.
        In EVAL mode there is no accumulation, so the state casts to bf16
        to keep the whole chain half-width (same recipe as the inference
        pipeline's precision='bfloat16')."""
        if not bf16:
            return model.apply(params, state, x, train=train, rng=rng)
        probs, new_state = model.apply(
            _cast_floats(params, jnp.bfloat16),
            state if train else _cast_floats(state, jnp.bfloat16),
            x.astype(jnp.bfloat16),
            train=train,
            rng=rng,
        )
        # Train-mode new_state is already f32 (stat updates run f32 in
        # batch_norm); the cast is a no-op there and restores f32 leaves
        # for the (discarded) eval-mode state.
        return probs.astype(jnp.float32), _cast_floats(new_state, jnp.float32)

    def loss_fn(params, state, x, y, rng):
        probs, new_state = apply_model(params, state, x, train=True, rng=rng)
        return bce_loss(probs, y), (probs, new_state)

    def train_step(params, state, opt_state, x, y, rng):
        (loss, (probs, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, state, x, y, rng)
        new_params, new_opt_state = optimizer.update(grads, opt_state, params)
        metrics = batch_metrics(probs, y)
        metrics["loss"] = loss
        return new_params, new_state, new_opt_state, metrics

    def train_step_resident(params, state, opt_state, data, labels, idx, key, step):
        x, y = cb(data[idx].astype(jnp.float32)[:, None, :, :], labels[idx])
        rng = jax.random.fold_in(key, step)
        return train_step(params, state, opt_state, x, y, rng)

    def train_k_steps_resident(
        params, state, opt_state, data, labels, idx_mat, key, step0
    ):
        ks = jnp.arange(idx_mat.shape[0], dtype=jnp.int32)

        def body(carry, xs):
            p, s, o = carry
            idx, k = xs
            p, s, o, metrics = train_step_resident(
                p, s, o, data, labels, idx, key, step0 + k
            )
            return (p, s, o), metrics

        (params, state, opt_state), metrics = jax.lax.scan(
            body, (params, state, opt_state), (idx_mat, ks)
        )
        return params, state, opt_state, metrics

    def eval_step(params, state, x, y):
        probs, _ = apply_model(params, state, x, train=False)
        metrics = batch_metrics(probs, y)
        metrics["loss"] = bce_loss(probs, y)
        return metrics

    def eval_step_resident(params, state, data, labels, idx):
        x, y = cb(data[idx].astype(jnp.float32)[:, None, :, :], labels[idx])
        return eval_step(params, state, x, y)

    return (
        loss_fn,
        train_step,
        train_step_resident,
        train_k_steps_resident,
        eval_step,
        eval_step_resident,
    )


@dataclasses.dataclass
class Trainer:
    """Owns the jitted train/eval steps for one (model, optimizer) pair.

    Batches are dicts with 'inputs' [B, T, F] float and 'is_laugh' [B]
    (the LadDataset contract, reference datasets.py:23-68); the channel dim
    is added inside the step (reference train.py:272 ``src[:, None, :, :]``).
    """

    model: Model
    optimizer: Adam = dataclasses.field(default_factory=Adam)
    grad_accum: int = 1
    # 'bfloat16' ships feature batches to the device at half the bytes
    # (features are bf16-rounded on host, restored to float32 on device).
    # Training numerics change by one bf16 rounding of the INPUTS only —
    # params/grads/optimizer stay float32.  Opt-in: host->device bandwidth
    # is only a bottleneck on tunneled dev chips, not PCIe-attached hosts.
    transfer_dtype: Optional[str] = None
    # 'bfloat16' runs the fwd/bwd COMPUTE in bf16 with f32 masters (see
    # build_step_fns) — measured 1.63x step speedup on the HBM-bound TPU
    # step.  Orthogonal to transfer_dtype (wire bytes vs compute bytes).
    compute_dtype: Optional[str] = None

    def __post_init__(self):
        if self.transfer_dtype not in (None, "float32", "bfloat16"):
            # Same eager rejection as ResidentLadDataset: a typo ('bf16',
            # 'float16') silently fell through to the float32 path, losing
            # the halved transfer bytes the flag exists for with no error.
            raise ValueError(
                f"unknown transfer_dtype {self.transfer_dtype!r}; "
                "use 'bfloat16' or 'float32'/None"
            )
        model, optimizer = self.model, self.optimizer
        (
            loss_fn,
            train_step,
            train_step_resident,
            train_k_steps_resident,
            eval_step,
            eval_step_resident,
        ) = build_step_fns(model, optimizer, compute_dtype=self.compute_dtype)
        train_step = jax.jit(train_step)
        train_step_resident = jax.jit(train_step_resident)
        train_k_steps_resident = jax.jit(train_k_steps_resident)
        eval_step = jax.jit(eval_step)
        eval_step_resident = jax.jit(eval_step_resident)

        @jax.jit
        def grad_step(params, state, acc_grads, x, y, rng):
            """One accumulation micro-step: adds grads/accum into acc_grads."""
            (loss, (probs, new_state)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, state, x, y, rng)
            scale = 1.0 / self.grad_accum
            acc_grads = jax.tree_util.tree_map(
                lambda a, g: a + g * scale, acc_grads, grads
            )
            metrics = batch_metrics(probs, y)
            metrics["loss"] = loss
            return acc_grads, new_state, metrics

        @jax.jit
        def apply_grads(params, opt_state, grads):
            return optimizer.update(grads, opt_state, params)

        self._eval_step_resident = eval_step_resident
        self._train_step = train_step
        self._train_step_resident = train_step_resident
        self._train_k_steps_resident = train_k_steps_resident
        self._grad_step = grad_step
        self._apply_grads = apply_grads
        self._eval_step = eval_step
        self._acc_grads: Optional[PyTree] = None
        self._accum_count = 0

    # ------------------------------------------------------------------ #

    def init(self, rng: jax.Array) -> Tuple[PyTree, PyTree, AdamState]:
        params, state = self.model.init(rng)
        return params, state, self.optimizer.init(params)

    def _prep(self, batch) -> Tuple[jnp.ndarray, jnp.ndarray]:
        inputs = batch["inputs"]
        if isinstance(inputs, jax.Array):
            # Device-resident batch (data.ResidentLadDataset): already
            # gathered in HBM as float32 [B, W, F] — nothing to transfer.
            x = inputs[:, None, :, :]
        elif self.transfer_dtype == "bfloat16":
            import ml_dtypes

            host = np.asarray(inputs).astype(ml_dtypes.bfloat16)
            x = jnp.asarray(host)[:, None, :, :].astype(jnp.float32)
        else:
            x = jnp.asarray(inputs, dtype=jnp.float32)[:, None, :, :]
        y = jnp.asarray(batch["is_laugh"], dtype=jnp.float32)
        return x, y

    def train_batch(self, params, state, opt_state, batch, rng):
        """Returns (params, state, opt_state, metrics).  With grad_accum > 1,
        parameters only change every ``grad_accum`` calls (reference
        train.py:288-295 semantics)."""
        x, y = self._prep(batch)
        if self.grad_accum == 1:
            return self._train_step(params, state, opt_state, x, y, rng)
        if self._acc_grads is None:
            self._acc_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        self._acc_grads, state, metrics = self._grad_step(
            params, state, self._acc_grads, x, y, rng
        )
        self._accum_count += 1
        if self._accum_count >= self.grad_accum:
            params, opt_state = self._apply_grads(params, opt_state, self._acc_grads)
            self._acc_grads = None
            self._accum_count = 0
        return params, state, opt_state, metrics

    @property
    def pending_micro_steps(self) -> int:
        """Micro-batches accumulated since the last optimizer apply (0 at an
        apply boundary).  The epoch driver uses this to place checkpoints at
        boundaries and to flush/drop partial groups."""
        return self._accum_count

    def drop_pending_group(self) -> None:
        """Discard a partially accumulated gradient group (preemption path:
        the rolled-back micro-batches will be replayed on resume)."""
        self._acc_grads = None
        self._accum_count = 0

    def flush_pending_group(self, params, opt_state):
        """Apply a partial accumulation group now (epoch end: groups never
        span epochs — see TrainLoop.run_epoch).  The partial group's
        gradient keeps the 1/grad_accum scale, i.e. a k-of-n tail group
        takes a k/n-sized step.  No-op at an apply boundary."""
        if self._accum_count:
            params, opt_state = self._apply_grads(params, opt_state, self._acc_grads)
            self.drop_pending_group()
        return params, opt_state

    def train_batch_resident(self, params, state, opt_state, resident, idx, key, step):
        """One step from a data.ResidentLadDataset: single fused dispatch
        when grad_accum == 1, else a device gather feeding the
        accumulation micro-path."""
        idx = np.asarray(idx, dtype=np.int32)
        if self.grad_accum == 1:
            return self._train_step_resident(
                params,
                state,
                opt_state,
                resident.feats,
                resident.labels,
                idx,
                key,
                np.int32(step),
            )
        x, _lens, y = resident.gather(idx)
        rng = jax.random.fold_in(key, step)
        return self.train_batch(
            params, state, opt_state, {"inputs": x, "is_laugh": y}, rng
        )

    def train_k_steps_resident(
        self, params, state, opt_state, resident, idx_mat, key, step0
    ):
        """K fused optimizer steps from a device-resident dataset in ONE
        dispatch (scan over the [K, B] index matrix).  Returns
        (params, state, opt_state, metrics) with each metric stacked [K]
        in step order.  Requires grad_accum == 1: accumulation groups are
        host-driven state the scanned body cannot thread."""
        if self.grad_accum != 1:
            raise ValueError(
                "train_k_steps_resident requires grad_accum == 1 "
                f"(got {self.grad_accum})"
            )
        idx_mat = np.asarray(idx_mat, dtype=np.int32)
        if idx_mat.ndim != 2:
            raise ValueError(f"idx_mat must be [K, B]; got {idx_mat.shape}")
        return self._train_k_steps_resident(
            params,
            state,
            opt_state,
            resident.feats,
            resident.labels,
            idx_mat,
            key,
            np.int32(step0),
        )

    def eval_batch(self, params, state, batch):
        if isinstance(batch, dict) and batch.get("resident") is not None:
            resident = batch["resident"]
            return self._eval_step_resident(
                params,
                state,
                resident.feats,
                resident.labels,
                np.asarray(batch["idx"], dtype=np.int32),
            )
        x, y = self._prep(batch)
        return self._eval_step(params, state, x, y)

    def eval_batches(self, params, state, batches: Iterable) -> Dict[str, float]:
        """Mean metrics over a set of batches (reference train.py:178-201)."""
        return mean_eval_metrics(self.eval_batch, params, state, batches)


def mean_eval_metrics(
    eval_batch_fn, params, state, batches: Iterable
) -> Dict[str, float]:
    """Unweighted mean of per-batch metrics — THE eval-batches driver,
    shared by Trainer and parallel.DataParallelTrainer so the averaging
    semantics can never drift between them.  Returns {} for an empty
    iterable (callers treat that as 'no validation')."""
    acc: Dict[str, float] = {}
    n = 0
    for batch in batches:
        m = eval_batch_fn(params, state, batch)
        # ONE device->host transfer per batch: per-value float() would issue
        # four blocking round-trips each, and per-RPC latency dominates on
        # tunneled links.
        m = jax.device_get(m)
        for k, v in m.items():
            acc[k] = acc.get(k, 0.0) + float(v)
        n += 1
    return {k: v / max(n, 1) for k, v in acc.items()}


# --------------------------------------------------------------------------- #
# Metrics bookkeeping + epoch driver
# --------------------------------------------------------------------------- #


def update_metrics_on_disk(metrics_rows: List[Dict[str, Any]], path: str) -> None:
    """Append-merge metric rows into a CSV keyed by global_step
    (reference train.py:488-504), dependency-free."""
    import csv
    import os

    existing: Dict[str, Dict[str, Any]] = {}
    fieldnames: List[str] = []
    if os.path.isfile(path):
        with open(path, newline="") as f:
            reader = csv.DictReader(f)
            fieldnames = list(reader.fieldnames or [])
            for row in reader:
                existing[row["global_step"]] = row
    for row in metrics_rows:
        row = {k: str(v) for k, v in row.items()}
        existing[row["global_step"]] = row
        for k in row:
            if k not in fieldnames:
                fieldnames.append(k)
    rows = sorted(existing.values(), key=lambda r: int(float(r["global_step"])))
    # Atomic publish (tmp + os.replace), like checkpoint.py: an in-place
    # rewrite killed between truncate and write would destroy every
    # previously persisted row of the merged history it just read.
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=fieldnames)
        writer.writeheader()
        writer.writerows(rows)
    os.replace(tmp, path)


@dataclasses.dataclass
class TrainLoop:
    """Epoch runner: online validation, metric logging, checkpointing
    (reference train.py:150-167, 170-415)."""

    trainer: Trainer
    checkpoint_dir: str
    log_frequency: int = 900  # reference config.py:13
    val_batches_per_log: int = 10
    #: where flush_metrics persists metric rows; when set, the preemption
    #: path also flushes so a SIGKILL after the grace period cannot lose
    #: the run's logged metrics (the checkpoint alone would survive).
    metrics_path: Optional[str] = None
    #: multi-host: only the coordinator process persists checkpoints and
    #: metrics (replicated training makes every process's copy identical;
    #: N processes racing the same path — or scattering checkpoints over
    #: host-local disks — serves nobody).  Resume READING is unaffected;
    #: parallel.distributed.sync_resume broadcasts the coordinator's
    #: checkpoint to processes whose local dir has none.
    write_artifacts: bool = True
    #: multi-host: called at voting step boundaries with this process's
    #: local preemption flag; returns the pod-wide disjunction so all
    #: processes stop at the SAME boundary
    #: (parallel.distributed.make_preemption_sync).  None (single-host)
    #: keeps the local flag.
    sync_preempt: Optional[Callable[[bool], bool]] = None
    #: multi-host vote cadence: the sync_preempt all-gather blocks the host
    #: on a cross-process round-trip, and doing that EVERY step would
    #: forfeit the async-dispatch pipelining the loop otherwise preserves
    #: (see the loss_sum comment in run_epoch).  Voting every K steps keeps
    #: the host async between votes and bounds preemption-detection latency
    #: at K steps — scheduler grace periods are seconds, many multiples of
    #: any sane K·step_time.  Votes happen when global_step % K == 0 (the
    #: step counter is identical across processes, so every process votes
    #: at the same boundaries) plus once unconditionally at epoch end, so a
    #: signal near the epoch tail cannot leak past run_epoch un-agreed.
    #: Single-host (sync_preempt None) is unaffected: the local flag is
    #: checked every step for free.
    preempt_vote_every: int = 10
    #: fuse up to K consecutive device-resident steps into ONE dispatch
    #: (Trainer.train_k_steps_resident): a tunneled/high-latency link pays
    #: its per-dispatch floor once per K steps instead of once per step.
    #: Groups are aligned to log points and (multi-host) preemption-vote
    #: boundaries, so logging/checkpoint/vote semantics are unchanged; the
    #: training semantics are identical to K=1 (same ops, same order, same
    #: per-step dropout keys — numerics equivalent up to float
    #: reassociation; see build_step_fns).  Cost: preemption latency grows
    #: to K steps,
    #: and the scanned step compiles slower (once per (K, B) shape).
    #: Requires grad_accum == 1; streamed (non-resident) batches ignore it.
    steps_per_dispatch: int = 1

    global_step: int = 0
    epoch: int = 0
    #: steps already trained inside the current epoch (0 = epoch boundary).
    #: Persisted in checkpoints so a mid-epoch save resumes EXACTLY: the
    #: epoch's batch order is a pure function of its seed, so the resumed
    #: run skips this many batches and continues as if never interrupted.
    epoch_step: int = 0
    best_val_loss: float = float("inf")
    metrics_rows: List[Dict[str, Any]] = dataclasses.field(default_factory=list)
    #: the ACTED-ON stop decision: once True, the epoch loop checkpoints and
    #: returns at the next step boundary.  Multi-host, this is only ever set
    #: from the sync_preempt AGREEMENT (or synchronously by the caller
    #: between batches), so it is identical on every process when run_epoch
    #: returns — callers branch on it, and divergent branches would desync
    #: the pod's collectives.
    preempted: bool = dataclasses.field(default=False, init=False)
    #: the RAW local signal (set by the SIGTERM handler, possibly mid-vote):
    #: read — never cleared — at each step boundary.  Keeping it separate
    #: means a signal landing DURING the sync_preempt all-gather is not
    #: clobbered by that vote's stale result; it simply joins the next vote.
    _preempt_pending: bool = dataclasses.field(default=False, init=False)

    def install_preemption_handler(self, signals=None) -> None:
        """Checkpoint-on-SIGTERM: schedulers (Borg/GKE/Slurm) signal before
        evicting a job; the reference survives eviction only through its
        periodic log_frequency saves (reference train.py:408-412), losing
        up to 900 steps.  The handler sets a flag; ``run_epoch`` finishes
        the in-flight step, saves ``last``, flushes metrics, and returns —
        the next run resumes the interrupted epoch exactly where it
        stopped (``epoch_step`` is checkpointed and the seeded batch order
        is deterministic) — interrupted + resumed training equals the
        uninterrupted run.  A second signal escalates: handlers restore to
        their defaults and SIGINT raises KeyboardInterrupt, so Ctrl-C can
        still break out of a hung step.
        """
        import signal as signal_mod

        if signals is None:
            signals = (signal_mod.SIGTERM, signal_mod.SIGINT)

        def _handler(signum, frame):
            if self._preempt_pending:  # second signal: stop being graceful
                for s in signals:
                    signal_mod.signal(s, signal_mod.SIG_DFL)
                if signum == signal_mod.SIGINT:
                    raise KeyboardInterrupt
            self._preempt_pending = True
            if self.sync_preempt is None:
                # Single-host: the local signal IS the decision — raise the
                # acted-on flag immediately (callers may consult it outside
                # run_epoch too).  Multi-host leaves it to the step-boundary
                # vote so every process raises it at the same boundary.
                self.preempted = True

        for s in signals:
            signal_mod.signal(s, _handler)

    def resume_if_possible(self, params, state, opt_state):
        """reference train.py:428-430: resume from last checkpoint if present.
        (The reference then discards optimizer state by recreating Adam,
        SURVEY.md §2.5-1 — we restore it, deliberately.)"""
        path = ckpt_lib.find_resume_checkpoint(self.checkpoint_dir)
        if path is None:
            return params, state, opt_state
        loaded = ckpt_lib.load_checkpoint(path)
        self.epoch = int(loaded["epoch"] or 0)
        self.global_step = int(loaded["global_step"] or 0)
        self.epoch_step = int(loaded.get("epoch_step") or 0)
        self.best_val_loss = float(
            loaded["best_val_loss"] if loaded["best_val_loss"] is not None else np.inf
        )
        opt = loaded["opt_state"]
        if opt is not None:
            opt_state = AdamState(
                step=jnp.asarray(opt["step"], jnp.int32),
                mu=opt["mu"],
                nu=opt["nu"],
            )
        return loaded["params"], loaded["state"], opt_state

    def save(self, params, state, opt_state, is_best: bool = False) -> None:
        """Public end-of-run checkpoint hook: writes ``last`` with the
        counters as they stand (callers should not reach for ``_save``)."""
        self._save(params, state, opt_state, is_best)

    def _save(self, params, state, opt_state, is_best: bool, step_offset: int = 0):
        """Write a checkpoint.  ``step_offset`` > 0 records the counters as
        of ``step_offset`` batches ago — how a mid-accumulation-group save
        points at the last optimizer-apply boundary without mutating the
        live counters (groups never span epochs, so the boundary is always
        inside the current epoch and both counters stay >= 0)."""
        if not self.write_artifacts:
            return
        ckpt_lib.save_checkpoint(
            self.checkpoint_dir,
            params,
            state,
            opt_state={
                "step": opt_state.step,
                "mu": opt_state.mu,
                "nu": opt_state.nu,
            },
            epoch=self.epoch,
            global_step=self.global_step - step_offset,
            best_val_loss=self.best_val_loss,
            is_best=is_best,
            epoch_step=self.epoch_step - step_offset,
        )

    def _dispatch_group_limit(self) -> int:
        """Largest fused-dispatch group that starts at the CURRENT
        global_step without skipping a log point or (multi-host) a
        preemption-vote boundary — both fire on ``global_step % cadence ==
        0`` after the increment, so a group of exactly the remaining
        distance ends on the boundary."""
        k = self.steps_per_dispatch
        if k <= 1:
            return 1
        if self.log_frequency:
            k = min(k, self.log_frequency - (self.global_step % self.log_frequency))
        if self.sync_preempt is not None:
            v = max(1, self.preempt_vote_every)
            k = min(k, v - (self.global_step % v))
        return max(k, 1)

    def run_epoch(
        self,
        params,
        state,
        opt_state,
        train_batches: Iterable,
        val_batches_fn: Optional[Callable[[int], List]] = None,
        rng: Optional[jax.Array] = None,
        verbose: bool = True,
    ):
        """One pass over ``train_batches``.  ``val_batches_fn(n)`` yields n
        validation batches for online eval every ``log_frequency`` steps.
        Returns (params, state, opt_state, mean_train_loss)."""
        if rng is None:
            rng = jax.random.PRNGKey(self.epoch)
        # Losses stay ON DEVICE between log points: float(loss) every step
        # would force a device->host sync per batch and stall the dispatch
        # pipeline (the async-dispatch win of the jitted step).
        # Running loss sum stays ON DEVICE (one tiny async add per step):
        # keeping a list of per-step loss buffers held O(steps) HBM blocks
        # alive all epoch and cost one device->host sync per step at the
        # end; the sum costs one sync total.
        loss_sum: Optional[jnp.ndarray] = None
        num_batches = 0
        stale = self.trainer.pending_micro_steps
        if stale:
            # A previous run_epoch aborted mid-accumulation-group (an
            # exception escaped between apply boundaries — e.g. a prefetch
            # assembly error or an escalated KeyboardInterrupt): entry
            # here must BE a boundary, or the stale micro-gradients would
            # silently fold into this epoch's first apply and every later
            # boundary (and the epoch_step >= pending rollback invariant)
            # would shift.  Roll the counters back exactly like the
            # preemption path and drop the stale group.
            self.global_step -= stale
            self.epoch_step = max(self.epoch_step - stale, 0)
            self.trainer.drop_pending_group()
        skip = self.epoch_step  # mid-epoch resume: already-trained batches
        # Model state (BN running stats) at the last optimizer-apply
        # boundary: grad_step updates state on every micro-batch, so a
        # preemption mid-accumulation-group must also roll state back or the
        # replayed micro-batches would be absorbed twice (exact resume would
        # hold for params but not BN stats).  Entry here IS a boundary
        # (groups from an aborted previous call were just dropped), so
        # initializing from `state` is exact.
        state_at_boundary = state
        # Loss accounting at the same boundary: the preemption path rolls
        # counters/state back to it, and the returned mean must count ONLY
        # batches whose updates survive — the resumed run replays (and
        # re-counts) the rolled-back micro-batches.
        loss_at_boundary: Optional[jnp.ndarray] = None
        nb_at_boundary = 0
        if self.steps_per_dispatch > 1:
            # Loud rejection over silent K=1 fallback: a user who set the
            # knob must not believe they amortized dispatch when they
            # didn't.
            if getattr(self.trainer, "grad_accum", 1) != 1:
                raise ValueError(
                    "steps_per_dispatch > 1 requires grad_accum == 1 "
                    "(accumulation groups are host-driven state the "
                    "scanned K-step body cannot thread)"
                )
            if not hasattr(self.trainer, "train_k_steps_resident"):
                raise ValueError(
                    f"trainer {type(self.trainer).__name__} has no "
                    "train_k_steps_resident; steps_per_dispatch > 1 needs it"
                )
        t0 = time.perf_counter()
        it = iter(train_batches)
        _NO_PENDING = object()  # None is a real (placeholder) batch value
        pending_next = _NO_PENDING
        max_group_n = 1  # largest fused dispatch actually formed this epoch
        while True:
            if pending_next is not _NO_PENDING:
                batch, pending_next = pending_next, _NO_PENDING
            else:
                try:
                    batch = next(it)
                except StopIteration:
                    break
            if skip > 0:
                # `batch` may be a real (discarded) batch or a None
                # placeholder from a skip-aware source
                # (LadDataset.batches(skip_assembly=...)).
                skip -= 1
                continue
            if batch is None:
                raise RuntimeError(
                    "skip placeholder (None) beyond epoch_step: the batch "
                    "source's skip_assembly disagrees with the loop's "
                    "resume position"
                )
            group_n = 1
            if isinstance(batch, dict) and batch.get("resident") is not None:
                # Gather up to limit consecutive SAME-resident, same-size
                # batches into one fused K-step dispatch.  The limit aligns
                # group ends to log points and (multi-host) vote
                # boundaries, so a log/checkpoint/vote never falls strictly
                # inside a group and the per-step semantics below hold
                # unchanged.
                group = [batch]
                limit = self._dispatch_group_limit()
                while len(group) < limit:
                    try:
                        nxt = next(it)
                    except StopIteration:
                        break
                    if (
                        isinstance(nxt, dict)
                        and nxt.get("resident") is batch["resident"]
                        and len(nxt["idx"]) == len(batch["idx"])
                    ):
                        group.append(nxt)
                    else:
                        pending_next = nxt  # epoch-tail partial batch etc.
                        break
                if len(group) > 1:
                    idx_mat = np.stack(
                        [np.asarray(g["idx"], np.int32) for g in group]
                    )
                    params, state, opt_state, k_metrics = (
                        self.trainer.train_k_steps_resident(
                            params, state, opt_state,
                            batch["resident"], idx_mat, rng, self.global_step,
                        )
                    )
                    group_n = len(group)
                    # Stacked [K] per-step metrics: the epoch mean needs the
                    # SUM of the group's losses; log points (at group end by
                    # alignment) report the last step's metrics, exactly as
                    # the per-step path would have.
                    loss_inc = k_metrics["loss"].sum()
                    metrics = {k: v[-1] for k, v in k_metrics.items()}
                else:
                    # Fused resident step: rng derives on device from
                    # (epoch key, global_step) — no per-step split dispatch.
                    params, state, opt_state, metrics = (
                        self.trainer.train_batch_resident(
                            params, state, opt_state,
                            batch["resident"], batch["idx"], rng,
                            self.global_step,
                        )
                    )
                    loss_inc = metrics["loss"]
            else:
                # Same derivation as the fused resident step, so streamed
                # and resident epochs see IDENTICAL per-step dropout keys
                # (switching --device_cache cannot change a run's results).
                step_rng = jax.random.fold_in(rng, self.global_step)
                params, state, opt_state, metrics = self.trainer.train_batch(
                    params, state, opt_state, batch, step_rng
                )
                loss_inc = metrics["loss"]
            loss_sum = loss_inc if loss_sum is None else loss_sum + loss_inc
            max_group_n = max(max_group_n, group_n)
            num_batches += group_n
            self.global_step += group_n
            self.epoch_step += group_n
            if self.trainer.pending_micro_steps == 0:
                # The PUBLIC boundary interface (both trainers implement
                # it), not a private attribute probe — a trainer with real
                # accumulation but no `_accum_count` would silently capture
                # post-group BN stats as the "boundary" state.
                state_at_boundary = state
                loss_at_boundary = loss_sum
                nb_at_boundary = num_batches
            if self.log_frequency and self.global_step % self.log_frequency == 0:
                # ONE device->host transfer for the metrics dict (per-value
                # float() would pay four blocking round-trips; same rule as
                # mean_eval_metrics).
                m = jax.device_get(metrics)
                row = {
                    "global_step": self.global_step,
                    "epoch": self.epoch,
                    "train_loss": float(m["loss"]),
                    "train_acc": float(m["acc"]),
                    "train_precision": float(m["precision"]),
                    "train_recall": float(m["recall"]),
                }
                # Checkpoints must sit at optimizer-apply boundaries: with
                # grad_accum > 1 a log point can fall mid-group, where the
                # pending micro-batches' gradients are not yet in params
                # (and BN already absorbed them).  Save the boundary
                # snapshot — a resume then replays the pending micro-batches
                # and reproduces the uninterrupted run exactly, same as the
                # preemption path below.
                pending = self.trainer.pending_micro_steps
                ckpt_state = state_at_boundary if pending else state
                if val_batches_fn is not None:
                    # Validate with the SAME state the checkpoint records:
                    # mid-group, `state` carries BN updates past the apply
                    # boundary, and best.ckpt must be the model that
                    # achieved the recorded best_val_loss.
                    val = self.trainer.eval_batches(
                        params, ckpt_state, val_batches_fn(self.val_batches_per_log)
                    )
                    row.update({f"val_{k}": v for k, v in val.items()})
                    # val == {} when the fn yielded no batches (tiny dev
                    # split + drop_remainder) — treat as no validation
                    # rather than KeyError-ing the run at the log point.
                    is_best = bool(val) and val["loss"] < self.best_val_loss
                    if is_best:
                        self.best_val_loss = val["loss"]
                else:
                    is_best = False
                self.metrics_rows.append(row)
                self._save(params, ckpt_state, opt_state, is_best, step_offset=pending)
                # Persist metrics WITH the checkpoint: a hard kill (OOM,
                # SIGKILL) between log points must not lose every row since
                # the last graceful flush while the checkpoint survives.
                # (The reference flushes only at end of run, train.py:537 —
                # and loses its METRICS_DICT on any crash; the append-merge
                # write, train.py:488-504, makes per-log-point flushing
                # idempotent.)  No-op without a metrics_path.
                self.flush_metrics()
                if verbose:
                    msg = " ".join(f"{k}={v:.4f}" for k, v in row.items() if k != "global_step")
                    print(f"step {self.global_step}: {msg}", flush=True)
            # Snapshot the raw local signal, then (multi-host) agree on it
            # BEFORE acting, so no process stops at a boundary the others
            # sailed past into the next step's collectives.  A signal
            # landing during the vote itself stays in _preempt_pending and
            # joins the NEXT vote — the acted-on decision is only ever an
            # agreed one, keeping it identical across processes.  Votes run
            # every preempt_vote_every steps (not every step: the
            # all-gather blocks the host and would stall the dispatch
            # pipeline); between votes a locally-set flag simply waits —
            # acting on it unilaterally would desert the pod's collectives.
            local_flag = self._preempt_pending or self.preempted
            if self.sync_preempt is None:
                act = local_flag
            elif self.global_step % max(1, self.preempt_vote_every) == 0:
                act = self.sync_preempt(local_flag)
            else:
                # Not a voting boundary: do NOT act even on a local
                # `preempted = True` set by the caller — unilateral exit
                # would desert the pod's collectives; the flag joins the
                # next vote (whose OR-reduction makes everyone see it).
                act = False
            self.preempted = self.preempted or act
            if act:
                # Graceful eviction: save at the step boundary and hand
                # control back without completing (or counting) the epoch.
                # Micro-batches of a partially accumulated gradient group
                # have not touched params — roll the counters back to the
                # last apply boundary so the resumed run replays them.
                pending = self.trainer.pending_micro_steps
                if pending:
                    self.global_step -= pending
                    self.epoch_step -= pending
                    self.trainer.drop_pending_group()
                    # Roll BN running stats back to the apply boundary too,
                    # so interrupted+resumed ≡ uninterrupted holds for the
                    # full train state, not just params/opt.
                    state = state_at_boundary
                    # And the loss accounting: the rolled-back micro-batch
                    # losses belong to the RESUMED run (which replays and
                    # re-counts them); keeping them here would double-count
                    # across the interrupted+resumed pair.
                    loss_sum = loss_at_boundary
                    num_batches = nb_at_boundary
                self._save(params, state, opt_state, is_best=False)
                # Metrics too: the docstring contract is save + flush +
                # return, and the grace period may end in SIGKILL before
                # the caller's own end-of-run flush.  (No-op unless
                # metrics_path is set.)
                self.flush_metrics()
                if verbose:
                    print(
                        f"preempted at step {self.global_step}; "
                        "checkpoint saved",
                        flush=True,
                    )
                mean_loss = (
                    float(loss_sum) / num_batches if num_batches else 0.0
                )
                return params, state, opt_state, mean_loss
        if skip > 0:
            # The source ended before yielding even the epoch_step batches
            # the checkpoint says were already trained — the batch
            # partition changed since the save (e.g. a different
            # --batch_size or a shrunk split).  Completing the "epoch"
            # would count it as trained with zero (or wrongly-offset)
            # optimizer steps and no warning.
            raise RuntimeError(
                f"mid-epoch resume: checkpoint records epoch_step="
                f"{self.epoch_step} already-trained batches, but the batch "
                f"source yielded only {self.epoch_step - skip} — the batch "
                f"partition changed since the checkpoint (different batch "
                f"size or dataset?); restart the epoch from scratch or "
                f"restore the original configuration"
            )
        # Accumulation groups never span epochs: a tail group smaller than
        # grad_accum applies HERE with its accumulated (1/grad_accum-scaled)
        # gradient.  The reference instead carries pending .grad buffers
        # into the next epoch (train.py:291 keys applies on global_step %
        # accum) — but its checkpoints cannot save those buffers, so a
        # resumed reference run silently drops them; closing groups at the
        # epoch boundary is what makes this loop's exact-resume guarantee
        # (and the epoch_step >= pending rollback invariant) hold.
        # Documented divergence: PARITY.md #22.
        params, opt_state = self.trainer.flush_pending_group(params, opt_state)
        self.epoch += 1
        self.epoch_step = 0
        if self.sync_preempt is not None:
            # Epoch-end vote, UNCONDITIONAL (every process reaches here
            # after the same number of batches, so the collective is safe):
            # with preempt_vote_every > 1 a signal landing after the last
            # in-epoch vote would otherwise leak out of run_epoch agreed by
            # nobody — this process's caller would stop while the others
            # started the next epoch's collectives.  The epoch is complete,
            # so an agreed stop here saves the NEXT epoch's clean boundary.
            if self.sync_preempt(self._preempt_pending or self.preempted):
                self.preempted = True
                self._save(params, state, opt_state, is_best=False)
                self.flush_metrics()
                if verbose:
                    print(
                        f"preempted at epoch boundary {self.epoch}; "
                        "checkpoint saved",
                        flush=True,
                    )
        if (
            self.steps_per_dispatch > 1
            and num_batches > 1
            and max_group_n == 1
            and not getattr(self, "_warned_degenerate_groups", False)
        ):
            # The grouping key is resident-object IDENTITY (`nxt["resident"]
            # is batch["resident"]`): a source that yields equal-but-distinct
            # resident wrappers per batch — or streamed host batches — never
            # forms a group, silently degrading K>1 to per-step dispatch.
            # Same policy as the loud grad_accum rejection above: a user who
            # set the knob must not believe they amortized dispatch when
            # they didn't.  Once per TrainLoop (every epoch would spam).
            self._warned_degenerate_groups = True
            warnings.warn(
                f"steps_per_dispatch={self.steps_per_dispatch} but no fused "
                "dispatch group formed this epoch: grouping requires "
                "consecutive batches that share ONE resident object "
                "(ResidentLadDataset reuses it; a source yielding a fresh "
                "equal-valued wrapper per batch, or streamed host batches, "
                "degrades to per-step dispatch)",
                RuntimeWarning,
                stacklevel=2,
            )
        if verbose:
            dt = time.perf_counter() - t0
            print(
                f"epoch {self.epoch}: {num_batches} batches in {dt:.1f}s "
                f"({num_batches / max(dt, 1e-9):.1f} it/s)",
                flush=True,
            )
        mean_loss = float(loss_sum) / num_batches if num_batches else 0.0
        return params, state, opt_state, mean_loss

    def flush_metrics(self, path: Optional[str] = None) -> None:
        if not self.write_artifacts:
            # Non-coordinator processes compute identical replicated metrics;
            # drop the rows (instead of accreting them forever) and write
            # nothing — the coordinator's flush is the run's record.
            self.metrics_rows = []
            return
        path = path or self.metrics_path
        if self.metrics_rows and path:
            update_metrics_on_disk(self.metrics_rows, path)
            self.metrics_rows = []

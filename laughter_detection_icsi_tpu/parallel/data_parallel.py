"""Data-parallel training: one jitted step over a device mesh.

Replaces the reference's "N identical single-GPU Slurm jobs resuming each
other's checkpoints" training scale-out (reference
cluster_scripts/gen_train_exp.py:49-62) with real synchronous data
parallelism: parameters/optimizer state replicated, the global batch sharded
over the ``data`` axis, gradients all-reduced over ICI by XLA (from the
sharding annotations — no hand-written collectives, SURVEY.md §2.2).

BatchNorm uses GLOBAL batch statistics: the batch mean/var reductions inside
``model.apply`` are over the sharded batch axis, which XLA lowers to psums —
so a data-parallel step is numerically a big-batch step, not N divergent
local-BN steps.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from laughter_detection_icsi_tpu.models.zoo import Model
from laughter_detection_icsi_tpu.parallel import mesh as mesh_lib
from laughter_detection_icsi_tpu.train.loop import build_step_fns
from laughter_detection_icsi_tpu.train.optim import Adam, AdamState

PyTree = Any


@dataclasses.dataclass
class DataParallelTrainer:
    """Jitted data-parallel train/eval steps over a mesh.

    Same batch contract as train.Trainer ({'inputs' [B, T, F],
    'is_laugh' [B]}); B must be divisible by the mesh size.
    """

    model: Model
    mesh: Mesh
    optimizer: Adam = dataclasses.field(default_factory=Adam)
    # 'bfloat16' = bf16 fwd/bwd compute with f32 masters, identical recipe
    # to train.Trainer(compute_dtype=...) — ONE definition in
    # build_step_fns, so single-device and data-parallel mixed precision
    # cannot drift.  Grad psums/BN-stat collectives ride the f32 side.
    compute_dtype: Any = None

    def __post_init__(self):
        repl = mesh_lib.replicated(self.mesh)
        dp = mesh_lib.data_sharding(self.mesh)
        # Multi-host mesh: host batches are interpreted as THIS PROCESS'S
        # rows (shard_local_batch) — on a multi-controller mesh no single
        # host ever holds the global batch, so local rows are the only
        # coherent host-batch semantics.  Single-process meshes keep the
        # plain global-batch contract.
        self._multi_process = mesh_lib.process_span(self.mesh) > 1

        def constrain(x, y):
            # The resident steps gather rows sharded over the 'data' axis;
            # the gather crosses shards over ICI (XLA inserts the collective
            # from the shardings) and must land batch-sharded so the rest IS
            # the plain data-parallel step.
            return (
                jax.lax.with_sharding_constraint(x, dp),
                jax.lax.with_sharding_constraint(y, dp),
            )

        # ONE step-body definition shared with the single-device trainer
        # (train.loop.build_step_fns) so the two can never drift.
        (
            _,
            train_step,
            train_step_resident,
            train_k_steps_resident,
            eval_step,
            eval_step_resident,
        ) = build_step_fns(
            self.model, self.optimizer, constrain,
            compute_dtype=self.compute_dtype,
        )
        self._train_step = jax.jit(
            train_step,
            in_shardings=(repl, repl, repl, dp, dp, repl),
            out_shardings=(repl, repl, repl, repl),
        )
        self._train_step_resident = jax.jit(
            train_step_resident,
            in_shardings=(repl, repl, repl, dp, dp, dp, repl, repl),
            out_shardings=(repl, repl, repl, repl),
        )
        # [K, B] index matrix: B (dim 1) sharded over 'data' so each scan
        # step sees the same dp-sharded idx vector as the per-step path;
        # each step's gather output is pinned batch-sharded by `constrain`,
        # so the scanned body is the plain data-parallel step.
        from jax.sharding import NamedSharding, PartitionSpec

        idx_k = NamedSharding(self.mesh, PartitionSpec(None, mesh_lib.DATA_AXIS))
        self._idx_k = idx_k
        self._train_k_steps_resident = jax.jit(
            train_k_steps_resident,
            in_shardings=(repl, repl, repl, dp, dp, idx_k, repl, repl),
            out_shardings=(repl, repl, repl, repl),
        )
        self._eval_step = jax.jit(
            eval_step, in_shardings=(repl, repl, dp, dp), out_shardings=repl
        )
        self._eval_step_resident = jax.jit(
            eval_step_resident,
            in_shardings=(repl, repl, dp, dp, dp),
            out_shardings=repl,
        )

    # ------------------------------------------------------------------ #

    def init(self, rng: jax.Array) -> Tuple[PyTree, PyTree, AdamState]:
        params, state = self.model.init(rng)
        opt_state = self.optimizer.init(params)
        repl = mesh_lib.replicated(self.mesh)
        return (
            jax.device_put(params, repl),
            jax.device_put(state, repl),
            jax.device_put(opt_state, repl),
        )

    def _prep(self, batch):
        inputs = batch["inputs"]
        if isinstance(inputs, jax.Array):
            # Device-resident batch (data.ResidentLadDataset.batches):
            # reshard device->device onto the mesh — never bounce through
            # host (np.asarray here would force a device sync + download).
            x = jax.device_put(
                inputs.astype(jnp.float32)[:, None, :, :],
                mesh_lib.data_sharding(self.mesh),
            )
            y = jax.device_put(
                jnp.asarray(batch["is_laugh"], jnp.float32),
                mesh_lib.data_sharding(self.mesh),
            )
            return {"x": x, "y": y}
        import numpy as np

        # Host batches stay NUMPY until shard_batch's device_put (building
        # device arrays here would just add an extra placement step;
        # shard_batch itself now reshard-s jax.Array leaves device-to-device
        # rather than bouncing them through host).  On a multi-process mesh
        # the rows are this process's LOCAL slice of the global batch
        # (see __post_init__).
        x = np.asarray(inputs, dtype=np.float32)[:, None, :, :]
        y = np.asarray(batch["is_laugh"], dtype=np.float32)
        shard = (
            mesh_lib.shard_local_batch if self._multi_process
            else mesh_lib.shard_batch
        )
        return shard({"x": x, "y": y}, self.mesh)

    # No gradient accumulation in the DP trainer: every train_batch applies,
    # so the loop is always at an optimizer-apply boundary.  Trivial
    # implementations of train.Trainer's boundary interface keep TrainLoop
    # trainer-agnostic.
    @property
    def pending_micro_steps(self) -> int:
        return 0

    def drop_pending_group(self) -> None:
        pass

    def flush_pending_group(self, params, opt_state):
        return params, opt_state

    def train_batch(self, params, state, opt_state, batch, rng: Optional[jax.Array] = None):
        """One data-parallel train step.

        Multi-host contract: on a multi-process mesh each process passes
        only ITS OWN rows — the global batch is the processes' rows
        concatenated in process order (``_prep`` routes host batches
        through mesh_lib.shard_local_batch, so each host's rows land on
        its addressable shards with no cross-host data movement), and
        XLA's grad all-reduce and global-BN psums ride the inter-process
        collectives.  That is what lets TrainLoop drive multi-host runs
        unchanged.  ``eval_batch`` has the same local-rows semantics.
        """
        # rng=None disables dropout (layers.dropout no-ops without a key) —
        # the same contract as train.Trainer.  Substituting a fixed key here
        # would silently apply the IDENTICAL dropout mask every step.
        sharded = self._prep(batch)
        return self._train_step(
            params, state, opt_state, sharded["x"], sharded["y"], rng
        )

    def train_batch_resident(self, params, state, opt_state, resident, idx, key, step):
        """TrainLoop's fused resident hook (same contract as
        train.Trainer.train_batch_resident): ``resident`` must hold
        mesh-sharded arrays (build ResidentLadDataset with
        sharding=data_sharding(mesh) extended over its dims) and ``idx``
        must divide by the mesh size."""
        import numpy as np

        idx = np.asarray(idx, dtype=np.int32)
        sharded_idx = mesh_lib.shard_batch({"i": idx}, self.mesh)["i"]
        return self._train_step_resident(
            params,
            state,
            opt_state,
            resident.feats,
            resident.labels,
            sharded_idx,
            key,
            np.int32(step),
        )

    def train_k_steps_resident(
        self, params, state, opt_state, resident, idx_mat, key, step0
    ):
        """K fused data-parallel steps in ONE dispatch (same contract as
        train.Trainer.train_k_steps_resident: [K, B] index matrix in,
        metrics stacked [K] out).  Every process passes the same GLOBAL
        index matrix (TrainLoop's epoch order is a pure function of the
        seed, so they agree); columns land on the owning process's shards
        via make_array_from_callback — no cross-host index movement."""
        import numpy as np

        idx_mat = np.asarray(idx_mat, dtype=np.int32)
        if idx_mat.ndim != 2:
            raise ValueError(f"idx_mat must be [K, B]; got {idx_mat.shape}")
        n = self.mesh.devices.size
        if idx_mat.shape[1] % n:
            raise ValueError(
                f"batch dim {idx_mat.shape[1]} not divisible by mesh size {n}"
            )
        sharded_idx = jax.make_array_from_callback(
            idx_mat.shape, self._idx_k, lambda i: idx_mat[i]
        )
        return self._train_k_steps_resident(
            params,
            state,
            opt_state,
            resident.feats,
            resident.labels,
            sharded_idx,
            key,
            np.int32(step0),
        )

    def eval_batch(self, params, state, batch):
        if isinstance(batch, dict) and batch.get("resident") is not None:
            import numpy as np

            resident = batch["resident"]
            idx = np.asarray(batch["idx"], dtype=np.int32)
            sharded_idx = mesh_lib.shard_batch({"i": idx}, self.mesh)["i"]
            return self._eval_step_resident(
                params, state, resident.feats, resident.labels, sharded_idx
            )
        sharded = self._prep(batch)
        return self._eval_step(params, state, sharded["x"], sharded["y"])

    def eval_batches(self, params, state, batches):
        """Mean metrics over batches (train.Trainer-compatible, so TrainLoop
        drives either trainer; shared driver — train.loop.mean_eval_metrics)."""
        from laughter_detection_icsi_tpu.train.loop import mean_eval_metrics

        return mean_eval_metrics(self.eval_batch, params, state, batches)

"""Ground-truth probe: does bf16 compute speed up the TRAIN step on-chip?

The inference pipeline already has an opt-in bf16 fast path
(inference.py `precision='bfloat16'`); training runs float32 for
reference parity (reference train.py:261-297 trains fp32).  On TPU, XLA
already lowers f32 matmuls/convs to one-pass bf16 MXU passes by default,
so the only possible win from a bf16 TRAINING mode is HBM bandwidth on
activations (stored for backward) and elementwise traffic.  This probe
measures that win empirically before we commit to building the mode:

  python tools/precision_probe.py [--batch 1024] [--iters 30]

It times, on whatever backend is live:
  1. the production f32 train step (Trainer._train_step)
  2. a bf16-activations value_and_grad step (params/state/input cast to
     bf16, loss in f32, Adam update on f32 masters)
and prints samples/sec for each plus the ratio.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from laughter_detection_icsi_tpu import models
    from laughter_detection_icsi_tpu.config import MODEL_MAP
    from laughter_detection_icsi_tpu.train.loop import Trainer

    preset = MODEL_MAP["resnet_base"]
    model = models.build(
        preset.model,
        dropout_rate=0.5,
        linear_layer_size=preset.linear_layer_size,
        filter_sizes=preset.filter_sizes,
    )
    trainer = Trainer(model)
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    B = args.batch
    x = jnp.asarray(rng.standard_normal((B, 1, 100, 44)), dtype=jnp.float32)
    y = jnp.asarray((rng.uniform(size=B) > 0.5), dtype=jnp.float32)
    key = jax.random.PRNGKey(1)

    from laughter_detection_icsi_tpu.utils.timing import slope_time

    def timeit(step, *state_args):
        """Honest per-step seconds via slope timing (utils/timing.py).

        The original version here timed repeats of IDENTICAL content and
        ended at block_until_ready — which the tunneled backend acks at
        DISPATCH (measured 2026-08-20: real 132 ms steps "completed" in
        ~1 ms).  Its conclusions were the RPC enqueue rate, not hardware.
        Now: params/opt_state chain through n steps (distinct content per
        execution, transport dedup can't fake it), keys vary, and each
        timed run ends in a loss VALUE readback; the (n_hi - n_lo) slope
        cancels dispatch + round-trip overhead."""
        chain = {"s": state_args}
        tick = {"i": 0}

        def run(n: int) -> None:
            p, s, o = chain["s"]
            for _ in range(n):
                tick["i"] += 1
                p, s, o, loss = step(
                    p, s, o, x_dev, y, jax.random.fold_in(key, tick["i"])
                )
            chain["s"] = (p, s, o)
            # f32 production step returns a metrics dict; the bf16
            # experiment returns the bare loss scalar.
            float(np.asarray(loss["loss"] if isinstance(loss, dict) else loss))

        # Compile + real completion off the clock, TWICE: the first chained
        # call can change carried dtypes (f32 state -> bf16 state in the
        # mixed-precision step) and the second signature must also be
        # compiled before the timed runs.
        run(1)
        run(1)
        per_step, _overhead = slope_time(
            run, n_lo=1, n_hi=max(4, args.iters // 4)
        )
        return per_step

    # --- 1. production f32 step ------------------------------------------
    x_dev = x

    def f32_step(params, state, opt_state, x, y, key):
        return trainer._train_step(params, state, opt_state, x, y, key)

    t_f32 = timeit(f32_step, params, state, opt_state)

    # --- 2. bf16-activations step ----------------------------------------
    def cast_bf16(tree):
        return jax.tree_util.tree_map(
            lambda v: v.astype(jnp.bfloat16)
            if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating)
            else v,
            tree,
        )

    @jax.jit
    def bf16_step(params, state, opt_state, x, y, key):
        # f32 masters -> bf16 compute copy (the standard mixed-precision
        # recipe); loss in f32; grads upcast; Adam on f32 masters.
        def loss_fn(p32):
            pbf = cast_bf16(p32)
            probs, new_state = model.apply(
                pbf, cast_bf16(state), x.astype(jnp.bfloat16), train=True, rng=key
            )
            probs = probs.astype(jnp.float32)
            eps = 1e-7
            probs = jnp.clip(probs, eps, 1 - eps)
            loss = -jnp.mean(y * jnp.log(probs) + (1 - y) * jnp.log1p(-probs))
            return loss, new_state

        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grads = jax.tree_util.tree_map(lambda g: g.astype(jnp.float32), grads)
        new_params, new_opt = trainer.optimizer.update(grads, opt_state, params)
        return new_params, new_state, new_opt, loss

    t_bf16 = timeit(bf16_step, params, state, opt_state)

    sps_f32 = B / t_f32
    sps_bf16 = B / t_bf16
    print(f"backend: {jax.devices()[0].platform}, batch {B}")
    print(f"f32  train step: {t_f32 * 1e3:8.3f} ms  ({sps_f32:12.0f} samples/s)")
    print(f"bf16 train step: {t_bf16 * 1e3:8.3f} ms  ({sps_bf16:12.0f} samples/s)")
    print(f"speedup: {sps_bf16 / sps_f32:.3f}x")


if __name__ == "__main__":
    main()

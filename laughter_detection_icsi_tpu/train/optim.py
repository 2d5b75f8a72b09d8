"""Optimizer: torch-exact Adam + global-norm gradient clipping, pure JAX.

The reference trains with ``optim.Adam(model.parameters())`` at defaults —
its LR-decay schedule writes a dead attribute, so effective training is plain
Adam at lr=1e-3 (reference train.py:336,346-349; SURVEY.md §2.5-1) — plus
``clip_grad_norm_(model.parameters(), 1.0)`` every optimizer step
(reference train.py:291-295).

The update rule mirrors ``torch.optim.Adam`` exactly (step-count bias
correction with eps OUTSIDE the sqrt) so loss curves are comparable
step-for-step.  Implemented as an optax-style (init, update) pair over
pytrees; everything is jit/pjit-compatible and dtype-preserving.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

PyTree = Any


class AdamState(NamedTuple):
    step: jnp.ndarray  # int32 scalar
    mu: PyTree  # first moment
    nu: PyTree  # second moment


@dataclasses.dataclass(frozen=True)
class Adam:
    """torch.optim.Adam semantics: m/v moments, bias correction, eps after
    sqrt; optional global-norm clip folded into ``update``."""

    lr: float = 1e-3
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    max_grad_norm: Optional[float] = 1.0  # reference train.py:292

    def init(self, params: PyTree) -> AdamState:
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdamState(
            step=jnp.zeros((), dtype=jnp.int32),
            mu=zeros,
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update(
        self, grads: PyTree, state: AdamState, params: PyTree
    ) -> Tuple[PyTree, AdamState]:
        """Returns (new_params, new_state)."""
        if self.max_grad_norm is not None:
            grads = clip_by_global_norm(grads, self.max_grad_norm)
        step = state.step + 1
        t = step.astype(jnp.float32)
        bc1 = 1.0 - self.b1**t
        bc2 = 1.0 - self.b2**t

        def upd(p, g, m, v):
            m = self.b1 * m + (1.0 - self.b1) * g
            v = self.b2 * v + (1.0 - self.b2) * (g * g)
            # bc1/bc2 are strong float32 arrays (derived from the int32
            # step); dividing bf16 moments by them would promote the whole
            # update to f32 and return f32 params for bf16 inputs — the
            # same promotion clip_by_global_norm casts its scale to avoid.
            # For f32 params the casts are identity.
            mhat = m / bc1.astype(m.dtype)
            vhat = v / bc2.astype(v.dtype)
            return p - self.lr * mhat / (jnp.sqrt(vhat) + self.eps), m, v

        flat_p, treedef = jax.tree_util.tree_flatten(params)
        flat_g = treedef.flatten_up_to(grads)
        flat_m = treedef.flatten_up_to(state.mu)
        flat_v = treedef.flatten_up_to(state.nu)
        new_p, new_m, new_v = [], [], []
        for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v):
            np_, nm, nv = upd(p, g, m, v)
            new_p.append(np_)
            new_m.append(nm)
            new_v.append(nv)
        return (
            jax.tree_util.tree_unflatten(treedef, new_p),
            AdamState(
                step=step,
                mu=jax.tree_util.tree_unflatten(treedef, new_m),
                nu=jax.tree_util.tree_unflatten(treedef, new_v),
            ),
        )


def global_norm(tree: PyTree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))


def clip_by_global_norm(grads: PyTree, max_norm: float) -> PyTree:
    """torch.nn.utils.clip_grad_norm_ semantics: scale by
    max_norm / (total_norm + 1e-6) when that is < 1."""
    norm = global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    # global_norm accumulates in float32, so cast the scale back to each
    # leaf's dtype: a strong f32 scalar would otherwise promote bf16 grads
    # (and then the Adam moments) to f32, breaking dtype preservation.
    return jax.tree_util.tree_map(lambda g: g * scale.astype(g.dtype), grads)

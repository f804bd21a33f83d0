"""Pytree Adam with per-leaf learning rates.

The reference drives 5-6 torch.optim.Adam param groups whose LRs are
re-assigned per stage every iteration (src/Mapper.py:365-419) and a fresh
Adam per camera (src/Tracker.py:212-219).  Here the optimizer is a pure
function over arbitrary pytrees; the learning rate is itself a pytree
(scalar or per-component array per leaf), so stage schedules and the
tracker's separate quaternion/translation LRs are just different lr trees.
Hyperparameters match torch.optim.Adam defaults (b1=0.9, b2=0.999,
eps=1e-8, bias correction).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    m: Any
    v: Any
    step: jnp.ndarray


def adam_init(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(m=zeros, v=jax.tree.map(jnp.zeros_like, params),
                     step=jnp.zeros((), jnp.int32))


def adam_update(params, grads, state: AdamState, lr,
                b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                frozen=None):
    """One Adam step.  `lr` is a pytree matching `params` (or a scalar
    broadcast to every leaf).  `frozen` is an optional pytree of PYTHON
    bools: True leaves are left completely untouched (params, m, v) and
    XLA prunes their whole update (and, combined with stop_gradient in
    the loss, their backward).  Returns (new_params, new_state)."""
    step = state.step + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t

    if isinstance(lr, (float, int)) or (hasattr(lr, "ndim") and getattr(lr, "ndim", 1) == 0):
        lr_tree = jax.tree.map(lambda p: lr, params)
    else:
        lr_tree = lr
    if frozen is None:
        frozen = jax.tree.map(lambda p: False, params)

    def upd_m(m, g, f):
        return m if f else b1 * m + (1 - b1) * g

    def upd_v(v, g, f):
        return v if f else b2 * v + (1 - b2) * g * g

    new_m = jax.tree.map(upd_m, state.m, grads, frozen)
    new_v = jax.tree.map(upd_v, state.v, grads, frozen)

    def upd(p, m, v, l, f):
        if f:
            return p
        mhat = m / bc1
        vhat = v / bc2
        return p - l * mhat / (jnp.sqrt(vhat) + eps)

    new_params = jax.tree.map(upd, params, new_m, new_v, lr_tree, frozen)
    return new_params, AdamState(m=new_m, v=new_v, step=step)

"""Optimizers and LR schedules.

Capability parity with the reference's training options
(/root/reference/ccsmeth/train.py:137-167): Adam, RMSprop, SGD(momentum 0.8), Ranger
(RAdam + gradient centralization + Lookahead, utils/ranger2020.py) and LookaheadAdam
(utils/lookahead.py) — built TPU-natively on optax transforms instead of torch
optimizer classes. Learning-rate schedules (StepLR / ReduceLROnPlateau) are host-side
state injected through optax.inject_hyperparams, so one compiled train step serves
every epoch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _gradient_centralization() -> optax.GradientTransformation:
    """Ranger's GC: subtract per-output-channel mean from grads of >=2D params
    (ranger2020.py behavior, use_gc=True, gc_conv_only=False)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def gc(g):
            if g.ndim > 1:
                axes = tuple(range(1, g.ndim))
                return g - jnp.mean(g, axis=axes, keepdims=True)
            return g

        return jax.tree_util.tree_map(gc, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


class LookaheadState(NamedTuple):
    slow: optax.Params
    count: jnp.ndarray


def _lookahead(k: int = 6, alpha: float = 0.5) -> optax.GradientTransformation:
    """Lookahead as a terminal update transform over parameter deltas.

    Tracks slow weights in state; every k steps the accumulated fast trajectory is
    pulled back toward the slow weights (utils/lookahead.py semantics) — implemented
    on updates so it chains after any inner optimizer.
    """

    def init_fn(params):
        return LookaheadState(slow=jax.tree_util.tree_map(jnp.asarray, params),
                              count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params):
        count = state.count + 1
        sync = count % k == 0

        def leaf(u, s, p):
            fast = p + u  # parameter after applying the fast update
            synced_slow = s + alpha * (fast - s)
            new_u = jnp.where(sync, synced_slow - p, u)
            new_s = jnp.where(sync, synced_slow, s)
            return new_u, new_s

        flat_u, tdef = jax.tree_util.tree_flatten(updates)
        flat_s = tdef.flatten_up_to(state.slow)
        flat_p = tdef.flatten_up_to(params)
        out = [leaf(u, s, p) for u, s, p in zip(flat_u, flat_s, flat_p)]
        new_updates = tdef.unflatten([o[0] for o in out])
        new_slow = tdef.unflatten([o[1] for o in out])
        return new_updates, LookaheadState(slow=new_slow, count=count)

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(optim_type: str, lr: float, grad_clip: float = 0.5):
    """Returns an optax optimizer with `learning_rate` injectable at runtime."""

    def with_clip(tx):
        return optax.chain(optax.clip_by_global_norm(grad_clip), tx)

    if optim_type == "Adam":
        core = optax.inject_hyperparams(optax.adam)(learning_rate=lr)
        return with_clip(core)
    if optim_type == "RMSprop":
        core = optax.inject_hyperparams(optax.rmsprop)(learning_rate=lr, decay=0.99,
                                                       eps=1e-8)
        return with_clip(core)
    if optim_type == "SGD":
        core = optax.inject_hyperparams(optax.sgd)(learning_rate=lr, momentum=0.8)
        return with_clip(core)
    if optim_type == "Ranger":
        def ranger(learning_rate):
            return optax.chain(
                _gradient_centralization(),
                optax.scale_by_radam(b1=0.95, b2=0.999, eps=1e-5),
                optax.scale(-learning_rate),
                _lookahead(k=6, alpha=0.5),
            )

        core = optax.inject_hyperparams(ranger)(learning_rate=lr)
        return with_clip(core)
    if optim_type == "LookaheadAdam":
        def la_adam(learning_rate):
            return optax.chain(
                optax.scale_by_adam(),
                optax.scale(-learning_rate),
                _lookahead(k=5, alpha=0.5),
            )

        core = optax.inject_hyperparams(la_adam)(learning_rate=lr)
        return with_clip(core)
    raise ValueError("--optim_type is not right!")


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning_rate hyperparam in-place (host side)."""

    def visit(state):
        if hasattr(state, "hyperparams") and "learning_rate" in state.hyperparams:
            state.hyperparams["learning_rate"] = jnp.asarray(
                lr, dtype=state.hyperparams["learning_rate"].dtype)
        if isinstance(state, tuple):
            for s in state:
                visit(s)

    visit(opt_state)
    return opt_state


class LrSchedule:
    """Host-side LR schedule: StepLR / ReduceLROnPlateau (train.py:161-167,315-326)."""

    def __init__(self, kind: str, lr: float, decay: float = 0.1, decay_step: int = 1,
                 patience: int = 0, mode_strategy: str = "last"):
        if kind not in ("StepLR", "ReduceLROnPlateau"):
            raise ValueError("--lr_scheduler is not right!")
        self.kind = kind
        self.lr = lr
        self.decay = decay
        self.decay_step = decay_step
        self.patience = patience
        self.mode_strategy = mode_strategy
        self._epochs = 0
        self._best = -np.inf
        self._bad = 0

    def epoch_end(self, accuracies_per_epoch: list[float]) -> float:
        """Advance one epoch; returns the (possibly updated) learning rate."""
        self._epochs += 1
        if self.kind == "StepLR":
            if self._epochs % self.decay_step == 0:
                self.lr *= self.decay
            return self.lr
        if self.mode_strategy == "mean":
            metric = float(np.mean(accuracies_per_epoch))
        elif self.mode_strategy == "last":
            metric = float(accuracies_per_epoch[-1])
        elif self.mode_strategy == "max":
            metric = float(np.max(accuracies_per_epoch))
        else:
            raise ValueError("--lr_mode_strategy is not right!")
        if metric > self._best:
            self._best = metric
            self._bad = 0
        else:
            self._bad += 1
            if self._bad > self.patience:
                self.lr *= self.decay
                self._bad = 0
        return self.lr

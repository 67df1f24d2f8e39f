"""Shared training engine.

The reference copy-pastes the same harness skeleton into all nine
``train.py`` files (seeding, AdamW + ReduceLROnPlateau, best-by-val
selection, n-runs mean±std aggregation — e.g.
``benchmark-datasets/ogbn-arxiv/train.py:178-210,269-300``). Here it is
factored once, TPU-style: a jitted train step over a flax TrainState, with
host-side epoch control.
"""

from __future__ import annotations

import dataclasses
import random
from typing import Any, Callable, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .schedulers import ReduceLROnPlateau, warmup_scale


def set_seed(seed: int) -> jax.Array:
    """Determinism kit (reference ``train.py:14-24``): seeds host RNGs and
    returns the root JAX PRNG key. Segment reductions are deterministic by
    construction (dst-sorted CSR, no atomics), so there is no TPU analog of
    ``torch.use_deterministic_algorithms`` to toggle."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    lr_scale: jax.Array  # plateau-scheduler scale, mutated host-side


def make_adamw(lr: float, weight_decay: float = 0.0):
    """AdamW exactly as ``torch.optim.AdamW`` defaults (betas 0.9/0.999,
    eps 1e-8, decoupled weight decay), with a runtime-adjustable LR scale
    slot (warmup x plateau) injected as a hyperparameter."""

    def tx(scale):
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.add_decayed_weights(weight_decay),
            optax.scale(-lr * scale),
        )

    return optax.inject_hyperparams(tx)(scale=1.0)


def init_state(variables: dict, tx) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        lr_scale=jnp.asarray(1.0),
    )


def set_lr_scale(state: TrainState, scale: float) -> TrainState:
    """Write warmup*plateau scale into the injected hyperparams."""
    opt_state = state.opt_state
    opt_state.hyperparams["scale"] = jnp.asarray(scale, jnp.float32)
    return dataclasses.replace(state, opt_state=opt_state,
                               lr_scale=jnp.asarray(scale))


def l1_l2_regularizer(params, l1: float, l2: float):
    """Reference ``regularizer`` (``benchmark-datasets/ogbn-arxiv/
    train.py:66-69``): l1 * sum|w| + l2 * sum w^2 over all parameters."""
    if l1 == 0.0 and l2 == 0.0:
        return 0.0
    leaves = jax.tree_util.tree_leaves(params)
    reg = 0.0
    if l1 > 0:
        reg += l1 * sum(jnp.sum(jnp.abs(p)) for p in leaves)
    if l2 > 0:
        reg += l2 * sum(jnp.sum(jnp.square(p)) for p in leaves)
    return reg


def param_count(params) -> int:
    """``torchinfo.summary`` replacement (reference ``train.py:288``)."""
    return int(sum(p.size for p in jax.tree_util.tree_leaves(params)))


def aggregate_runs(name: str, values: list[float]) -> tuple[float, float]:
    """n-runs mean ± std summary (reference ``train.py:295-300``)."""
    m, s = float(np.mean(values)), float(np.std(values))
    print(f"{name}: {values}")
    print(f"Average {name}: {m:.6f} ± {s:.6f}")
    return m, s


class EpochDriver:
    """Host-side epoch control: warmup, plateau scheduling, early stop,
    best-checkpoint selection — the ``run`` skeleton shared by every
    reference harness."""

    def __init__(self, *, epochs: int, warmup: int = 0, factor: float = 0.5,
                 patience: int = 10, log_every: int = 20,
                 better: Callable[[float, float], bool] = lambda a, b: a < b):
        self.epochs = epochs
        self.warmup = warmup
        self.plateau = ReduceLROnPlateau(factor=factor, patience=patience)
        self.log_every = log_every
        self.better = better
        self.best_metric: Optional[float] = None
        self.best_payload: Any = None

    def lr_scale(self, epoch: int) -> float:
        """Scale to apply BEFORE training this epoch: the reference sets
        the warmup LR at the top of each epoch (warmup_lr before train,
        e.g. ogbn-arxiv train.py:189-190), so epoch 1 trains at
        lr * 1/warmup — not at full LR."""
        return warmup_scale(epoch, self.warmup) * self.plateau.scale

    def plateau_step(self, epoch: int, metric: float) -> None:
        """Advance the plateau scheduler AFTER this epoch's evaluation
        (reference: scheduler.step(loss) after evaluate, train.py:193).
        During warmup, torch's warmup_lr overwrites the LR at the top of
        the next epoch, so an in-warmup plateau reduction never takes
        effect — replicated by resetting the scale."""
        self.plateau.step(metric)
        if epoch + 1 <= self.warmup:
            self.plateau.scale = 1.0

    def scale_for_epoch(self, epoch: int, plateau_metric: Optional[float]
                        ) -> float:
        """Deprecated post-epoch combination (applies warmup one epoch
        late); use lr_scale + plateau_step instead."""
        w = warmup_scale(epoch, self.warmup)
        p = (self.plateau.step(plateau_metric)
             if plateau_metric is not None else self.plateau.scale)
        return w * p

    def consider(self, metric: float, payload: Any) -> bool:
        if self.best_metric is None or self.better(metric, self.best_metric):
            self.best_metric = metric
            self.best_payload = payload
            return True
        return False

    def should_log(self, epoch: int) -> bool:
        return epoch == self.epochs or epoch % self.log_every == 0

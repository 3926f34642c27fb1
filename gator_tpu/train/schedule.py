"""LR schedules mirroring the reference's torch schedulers
(reference: lib/funcs_utils.py:100-107): 'step' (MultiStepLR, baked into a
step-indexed optax schedule) and 'platue' [sic] (ReduceLROnPlateau — metric
driven, so it runs as a host-side controller feeding an injected
learning_rate hyperparameter into the jitted optimizer).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import optax


def multistep_lr(base_lr: float, milestones_epochs: Sequence[int],
                 factor: float, steps_per_epoch: int):
    """torch MultiStepLR semantics: the reference calls scheduler.step()
    after every epoch, so epochs 1..m train at the old lr and the drop takes
    effect from epoch m+1 (reference: main/train.py:37-41). With 1-indexed
    epochs, epoch m+1 starts at global step m * steps_per_epoch."""
    boundaries = {m * steps_per_epoch: factor for m in milestones_epochs}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def _builder(name: str, momentum: float):
    """Optimizer constructors keyed by reference name
    (reference: lib/funcs_utils.py:76-97; adam uses torch defaults)."""
    if name == "adam":
        return lambda learning_rate: optax.adam(
            learning_rate, b1=0.9, b2=0.999, eps=1e-8)
    if name == "sgd":
        return lambda learning_rate: optax.sgd(
            learning_rate, momentum=momentum, nesterov=True)
    if name == "rmsprop":
        return lambda learning_rate: optax.rmsprop(learning_rate)
    raise ValueError(f"unknown optimizer {name!r}")


def make_optimizer(name: str, lr_schedule, momentum: float = 0.9,
                   inject: bool = False):
    """inject=True wraps the optimizer in optax.inject_hyperparams so
    `learning_rate` becomes a runtime leaf of the optimizer state — the
    plateau controller rewrites it between epochs without recompiling."""
    if inject:
        return optax.inject_hyperparams(_builder(name, momentum))(
            learning_rate=float(lr_schedule))
    return _builder(name, momentum)(lr_schedule)


class ReduceLROnPlateau:
    """Host-side torch ReduceLROnPlateau(mode='min', threshold=1e-4 rel,
    cooldown=0) controller (reference: lib/funcs_utils.py:106-107 with
    factor=cfg.TRAIN.lr_factor, patience=10, min_lr=1e-5). Call
    `update(metric)` once per epoch; it returns the lr to use next."""

    def __init__(self, base_lr: float, factor: float, patience: int = 10,
                 min_lr: float = 1e-5, threshold: float = 1e-4):
        self.lr = float(base_lr)
        self.factor = float(factor)
        self.patience = int(patience)
        self.min_lr = float(min_lr)
        self.threshold = float(threshold)
        self.best = float("inf")
        self.num_bad_epochs = 0

    def update(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = float(metric)
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
            if self.num_bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad_epochs = 0
        return self.lr

    # resume support: the controller state rides in the checkpoint
    def state_dict(self):
        return {"lr": self.lr, "best": self.best,
                "num_bad_epochs": self.num_bad_epochs}

    def load_state_dict(self, d):
        self.lr = float(d["lr"])
        self.best = float(d["best"])
        self.num_bad_epochs = int(d["num_bad_epochs"])


def set_learning_rate(state, lr: float):
    """Rewrite the injected learning_rate leaf of a TrainState whose
    optimizer was built with make_optimizer(inject=True)."""
    opt = state.opt_state
    if not hasattr(opt, "hyperparams"):
        raise ValueError("optimizer was not built with inject=True")
    hp = dict(opt.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=opt._replace(hyperparams=hp))

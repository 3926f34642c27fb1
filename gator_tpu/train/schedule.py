"""LR schedules mirroring the reference's torch schedulers
(reference: lib/funcs_utils.py:100-107)."""
from __future__ import annotations

from typing import Sequence

import optax


def multistep_lr(base_lr: float, milestones_epochs: Sequence[int],
                 factor: float, steps_per_epoch: int):
    """torch MultiStepLR semantics: the reference calls scheduler.step()
    after every epoch, so epochs 1..m train at the old lr and the drop takes
    effect from epoch m+1 (reference: main/train.py:37-41). With 1-indexed
    epochs, epoch m+1 starts at global step m * steps_per_epoch."""
    boundaries = {m * steps_per_epoch: factor for m in milestones_epochs}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_optimizer(name: str, lr_schedule, momentum: float = 0.9):
    """Optimizer factory (reference: lib/funcs_utils.py:76-97; adam uses
    torch defaults: b1=0.9 b2=0.999 eps=1e-8)."""
    if name == "adam":
        return optax.adam(lr_schedule, b1=0.9, b2=0.999, eps=1e-8)
    if name == "sgd":
        return optax.sgd(lr_schedule, momentum=momentum, nesterov=True)
    if name == "rmsprop":
        return optax.rmsprop(lr_schedule)
    raise ValueError(f"unknown optimizer {name!r}")

"""Scheduler parity: the plateau controller must track torch's
ReduceLROnPlateau exactly, and the injected-lr optimizer must honor
set_learning_rate inside an already-jitted step."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from gator_tpu.train import TrainState, make_optimizer
from gator_tpu.train.schedule import (ReduceLROnPlateau, multistep_lr,
                                      set_learning_rate)


def test_plateau_matches_torch():
    """Drive both controllers with the same metric sequence (improvements,
    stalls, a late improvement) and compare the lr trajectory."""
    rng = np.random.default_rng(0)
    metrics = list(100.0 - np.arange(5) * 3)          # improving
    metrics += [85.0] * 15                            # stall -> drop
    metrics += [60.0]                                 # improvement
    metrics += [60.0 + rng.uniform(0, 1e-3)] * 14     # tiny wiggles -> drop
    metrics += list(100 + rng.uniform(-1, 1, 30))     # noise around 100

    mine = ReduceLROnPlateau(base_lr=1e-3, factor=0.1)
    param = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([param], lr=1e-3)
    ref = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.1, patience=10, min_lr=1e-5)

    for i, m in enumerate(metrics):
        got = mine.update(m)
        ref.step(m)
        want = opt.param_groups[0]["lr"]
        assert got == want, f"step {i}: {got} != {want} (metric {m})"
    assert mine.lr < 1e-3  # the sequence must actually trigger drops


def test_injected_lr_changes_update_magnitude():
    tx = make_optimizer("adam", 1e-1, inject=True)
    params = {"w": jnp.ones((4,))}
    state = TrainState.create({"params": params}, tx)
    grads = {"w": jnp.ones((4,))}

    @jax.jit
    def step(s):
        return s.apply_gradients(tx, grads)

    s1 = step(state)
    delta_big = float(jnp.abs(s1.params["w"] - params["w"]).max())

    state_small = set_learning_rate(state, 1e-3)
    s2 = step(state_small)   # same compiled program, new lr leaf
    delta_small = float(jnp.abs(s2.params["w"] - params["w"]).max())
    np.testing.assert_allclose(delta_big, 1e-1, rtol=1e-3)
    np.testing.assert_allclose(delta_small, 1e-3, rtol=1e-3)


def test_multistep_schedule_epoch_boundaries():
    sched = multistep_lr(1.0, (2, 4), 0.1, steps_per_epoch=10)
    assert float(sched(0)) == 1.0
    assert float(sched(19)) == 1.0       # last step of epoch 2
    np.testing.assert_allclose(float(sched(20)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(sched(40)), 0.01, rtol=1e-6)

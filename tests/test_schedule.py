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


def test_plateau_state_survives_checkpoint_resume(tmp_path):
    """Kill/resume round trip for the plateau controller: the counters and
    the dropped lr ride in the checkpoint and restore through the exact
    resume path cli/train.py uses (load_checkpoint -> load_state_dict ->
    set_learning_rate)."""
    from gator_tpu.train import load_checkpoint, pick_checkpoint, \
        save_checkpoint

    tx = make_optimizer("adam", 1e-3, inject=True)
    params = {"w": jnp.ones((4,))}
    state = TrainState.create({"params": params}, tx)

    plateau = ReduceLROnPlateau(base_lr=1e-3, factor=0.1)
    plateau.update(50.0)
    for _ in range(12):                 # stall past patience -> lr drop
        plateau.update(55.0)
    plateau.update(56.0)                # partial bad-epoch count
    assert plateau.lr == 1e-4 and plateau.num_bad_epochs == 2
    state = set_learning_rate(state, plateau.lr)

    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, state, epoch=13,
                    scheduler_state=plateau.state_dict())

    # fresh process state: new controller at base lr, template TrainState
    fresh = TrainState.create({"params": params}, tx)
    restored = load_checkpoint(pick_checkpoint(ckpt_dir),
                               target_state=fresh)
    resumed = ReduceLROnPlateau(base_lr=1e-3, factor=0.1)
    assert restored.get("scheduler"), "scheduler state missing from ckpt"
    resumed.load_state_dict(
        {k: float(v) for k, v in restored["scheduler"].items()})

    assert resumed.lr == plateau.lr
    assert resumed.best == plateau.best
    assert resumed.num_bad_epochs == plateau.num_bad_epochs
    # the injected optimizer lr restored with the TrainState
    np.testing.assert_allclose(
        float(restored["state"].opt_state.hyperparams["learning_rate"]),
        plateau.lr, rtol=1e-6)   # f32 leaf vs python float
    # and the controller continues from the restored counters: 10 more bad
    # epochs trigger the NEXT drop exactly as the uninterrupted run would
    for _ in range(10):
        resumed.update(55.0)
        plateau.update(55.0)
    assert resumed.lr == plateau.lr == 1e-5

"""End-to-end smoke: synthetic data -> pipeline -> jitted train steps ->
eval, exactly the wiring the CLI uses."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gator_tpu import losses
from gator_tpu.data import (BatchPipeline, GtSynthesizer, ProcessOptions,
                            SyntheticDataset)
from gator_tpu.models import GatorSpec, init_gator
from gator_tpu.train import (TrainState, make_gator_eval_step,
                             make_gator_train_step, make_optimizer,
                             multistep_lr)


@pytest.mark.slow
def test_end_to_end_training_improves(small_assets):
    assets = small_assets
    synth = GtSynthesizer(assets)
    opts = ProcessOptions(input_joint_name="human36", is_train=True)
    ds = SyntheticDataset(assets, opts, n=64, seed=0, synthesizer=synth)
    pipe = BatchPipeline([ds], synth, batch_size=16, seed=0, prefetch=0)

    spec = GatorSpec.from_assets(assets, embed_dim=64, depth=1)
    tx = make_optimizer("adam", multistep_lr(1e-3, (20,), 0.95,
                                             steps_per_epoch=len(pipe)))
    state = TrainState.create(init_gator(spec, jax.random.PRNGKey(0)), tx)
    tstep = jax.jit(make_gator_train_step(
        spec, assets.faces, assets.j_regressor_h36m,
        losses.LossWeights(), tx))
    estep = jax.jit(make_gator_eval_step(
        spec, assets.j_regressor_h36m, assets.joint_set.eval_joints))

    key = jax.random.PRNGKey(0)
    first_losses, last_losses = [], []
    for epoch in range(3):
        pipe.set_epoch(epoch)
        for batch in pipe:
            state, m = tstep(state, batch, key, jnp.asarray(0.0))
            (first_losses if epoch == 0 else last_losses).append(
                float(m["loss"]))
    assert np.mean(last_losses) < np.mean(first_losses)

    eval_opts = ProcessOptions(input_joint_name="human36", is_train=False)
    eval_ds = SyntheticDataset(assets, eval_opts, n=32, seed=5,
                               synthesizer=synth)
    eval_pipe = BatchPipeline([eval_ds], synth, batch_size=16,
                              shuffle=False, stage="gator", prefetch=0)
    errs = [estep(state, b) for b in eval_pipe]
    j = np.mean(np.concatenate([np.asarray(e["joint_err"]) for e in errs]))
    s = np.mean(np.concatenate([np.asarray(e["surface_err"])
                                for e in errs]))
    assert np.isfinite(j) and np.isfinite(s)
    # synthetic bodies are near the template; a briefly-trained model must
    # already be in a sane error range (mm), not diverging
    assert s < 1000.0

"""Sharded-eval correctness: run_eval on the 8-virtual-device dp mesh must
match unsharded eval exactly, including a ragged final batch, and the
aggregation must be the exact per-sample mean (not a mean of batch means —
reference accumulates running sums, lib/core/base.py:224-230).
"""
import jax
import numpy as np

from gator_tpu import losses
from gator_tpu.data import (BatchPipeline, GtSynthesizer, ProcessOptions,
                            SyntheticDataset)
from gator_tpu.models import GatorSpec, init_gator
from gator_tpu.parallel import make_mesh, replicate
from gator_tpu.train import (TrainState, make_gator_eval_step,
                             make_optimizer, multistep_lr, run_eval)


def _setup(small_assets, n=44, batch=16):
    """n=44, batch=16 -> final batch of 12: ragged AND not a multiple of 8."""
    synth = GtSynthesizer(small_assets)
    opts = ProcessOptions(input_joint_name="human36", is_train=False)
    ds = SyntheticDataset(small_assets, opts, n=n, seed=3, synthesizer=synth)
    pipe = BatchPipeline([ds], synth, batch_size=batch, shuffle=False,
                         stage="gator", prefetch=0, drop_last=False)
    spec = GatorSpec.from_assets(small_assets, embed_dim=64, depth=1)
    tx = make_optimizer("adam", multistep_lr(1e-3, (20,), 0.9, 10))
    state = TrainState.create(init_gator(spec, jax.random.PRNGKey(1)), tx)
    estep = make_gator_eval_step(spec, small_assets.j_regressor_h36m,
                                 small_assets.joint_set.eval_joints)
    return pipe, state, estep


def test_sharded_eval_matches_single_device(small_assets):
    pipe, state, estep = _setup(small_assets)

    single = run_eval(estep, state, pipe, mesh=None,
                      collect_out=("pred_mesh_mm",))

    mesh = make_mesh()
    assert mesh.size == 8
    sharded = run_eval(estep, replicate(mesh, state), pipe,
                       mesh=mesh, collect_out=("pred_mesh_mm",))

    assert single["count"] == sharded["count"] == 44
    np.testing.assert_allclose(sharded["joint_err"], single["joint_err"],
                               rtol=1e-6)
    np.testing.assert_allclose(sharded["surface_err"],
                               single["surface_err"], rtol=1e-6)
    np.testing.assert_allclose(sharded["pred_mesh_mm"],
                               single["pred_mesh_mm"], atol=1e-3)


def test_aggregation_is_exact_per_sample_mean(small_assets):
    """A ragged final batch must NOT be over-weighted: the result equals the
    mean over per-sample errors computed in one unbatched pass."""
    pipe, state, estep = _setup(small_assets)
    res = run_eval(estep, state, pipe, mesh=None)

    # one pass collecting every per-sample error
    per_sample = []
    jstep = jax.jit(estep)
    for batch in pipe:
        per_sample.append(np.asarray(jstep(state, batch)["joint_err"]))
    exact = float(np.concatenate(per_sample).mean())
    np.testing.assert_allclose(res["joint_err"], exact, rtol=1e-6)

    # and it must differ from the biased mean-of-batch-means whenever the
    # final batch is ragged (sanity that the test can detect the bug)
    batch_means = [float(c.mean()) for c in per_sample]
    assert abs(np.mean(batch_means) - exact) > 0 or len(set(
        len(c) for c in per_sample)) == 1


def test_run_eval_rejects_overlapping_collect_keys(small_assets):
    """A key in both collect_out and collect_batch would interleave
    outputs and inputs into one corrupted concatenation — refuse it."""
    import pytest

    from gator_tpu.train import run_eval

    with pytest.raises(ValueError, match="overlap"):
        run_eval(lambda s, b: {}, None, [],
                 collect_out=("pred_mesh_mm",),
                 collect_batch=("pred_mesh_mm",))

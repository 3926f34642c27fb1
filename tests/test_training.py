"""Training-loop tests: loss decreases, batch stats update, multistep LR,
checkpoint round trip, and data-parallel sharding over the 8-device CPU
mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gator_tpu import losses
from gator_tpu.models import GatSpec, GatorSpec, init_gat, init_gator
from gator_tpu.parallel import make_mesh, replicate, shard_batch
from gator_tpu.train import (TrainState, jit_data_parallel, load_checkpoint,
                             make_gat_train_step, make_gator_eval_step,
                             make_gator_train_step, make_optimizer,
                             multistep_lr, pick_checkpoint, save_checkpoint)


def _synthetic_batch(assets, rng, b=8):
    j = assets.joint_num
    v = assets.vertex_num
    return {
        "pose2d": rng.normal(size=(b, j, 2)).astype(np.float32),
        "mesh": rng.normal(size=(b, v, 3)).astype(np.float32) * 0.1,
        "lift_pose3d": rng.normal(size=(b, j, 3)).astype(np.float32) * 100,
        "reg_pose3d": rng.normal(size=(b, 17, 3)).astype(np.float32) * 100,
        "mesh_valid": np.ones((b, v, 1), np.float32),
        "lift_valid": np.ones((b, j, 1), np.float32),
        "reg_valid": np.ones((b, 17, 1), np.float32),
    }


@pytest.fixture(scope="module")
def gator_setup(small_assets):
    spec = GatorSpec.from_assets(small_assets, embed_dim=64, depth=2)
    tx = make_optimizer("adam", multistep_lr(1e-3, (30,), 0.1, 100))
    variables = init_gator(spec, jax.random.PRNGKey(0))
    state = TrainState.create(variables, tx)
    step = make_gator_train_step(
        spec, small_assets.faces, small_assets.j_regressor_h36m,
        losses.LossWeights(), tx)
    return spec, tx, state, step


def test_gator_train_step_reduces_loss(small_assets, gator_setup, rng):
    spec, tx, state, step = gator_setup
    batch = _synthetic_batch(small_assets, rng)
    jstep = jax.jit(step)
    key = jax.random.PRNGKey(42)
    first = None
    for i in range(12):
        state, m = jstep(state, batch, key, jnp.asarray(0.0))
        if i == 0:
            first = float(m["loss"])
    assert float(m["loss"]) < first
    assert float(m["edge"]) == 0.0  # gated off
    state, m = jstep(state, batch, key, jnp.asarray(1.0))
    assert float(m["edge"]) > 0.0
    # batch stats must have moved
    bs = jax.tree_util.tree_leaves(state.batch_stats)
    assert any(float(np.abs(np.asarray(x)).max()) > 0 for x in bs)


def test_gator_eval_step(small_assets, gator_setup, rng):
    spec, tx, state, _ = gator_setup
    estep = jax.jit(make_gator_eval_step(
        spec, small_assets.j_regressor_h36m,
        small_assets.joint_set.eval_joints))
    batch = _synthetic_batch(small_assets, rng)
    out = estep(state, batch)
    assert out["joint_err"].shape == (8,)   # per-sample errors
    assert np.isfinite(np.asarray(out["joint_err"])).all()
    assert np.isfinite(np.asarray(out["surface_err"])).all()
    assert out["pred_mesh_mm"].shape == (8, small_assets.vertex_num, 3)


def test_gat_stage1_training(small_assets, rng):
    spec = GatSpec.from_assets(small_assets, embed_dim=64, depth=2)
    tx = make_optimizer("adam", multistep_lr(8e-4, (10,), 0.8, 100))
    state = TrainState.create(init_gat(spec, jax.random.PRNGKey(0)), tx)
    step = jax.jit(make_gat_train_step(spec, tx))
    batch = {
        "pose2d": rng.normal(size=(8, 17, 2)).astype(np.float32),
        "joint_cam": rng.normal(size=(8, 17, 3)).astype(np.float32) * 100,
        "joint_valid": np.ones((8, 17, 1), np.float32),
    }
    key = jax.random.PRNGKey(0)
    state, m0 = step(state, batch, key)
    for _ in range(10):
        state, m = step(state, batch, key)
    assert float(m["loss"]) < float(m0["loss"])


def test_multistep_lr_schedule():
    sched = multistep_lr(1e-3, (2, 4), 0.1, steps_per_epoch=10)
    # epochs 1-2 (steps 0..19) at 1e-3; epochs 3-4 at 1e-4; epoch 5+ at 1e-5
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(19)) == pytest.approx(1e-3)
    assert float(sched(20)) == pytest.approx(1e-4)
    assert float(sched(39)) == pytest.approx(1e-4)
    assert float(sched(40)) == pytest.approx(1e-5, rel=1e-4)


def test_data_parallel_step_matches_single_device(small_assets):
    """The sharded step on the 8-device mesh must agree with single-device
    execution (same math, GSPMD inserts the collectives)."""
    rng = np.random.default_rng(99)   # local: test must not depend on order
    assert jax.device_count() >= 8
    spec = GatorSpec.from_assets(small_assets, embed_dim=64, depth=1,
                                 alpha=True)
    tx = make_optimizer("adam", multistep_lr(1e-3, (30,), 0.1, 100))
    variables = init_gator(spec, jax.random.PRNGKey(0))
    step = make_gator_train_step(
        spec, small_assets.faces, small_assets.j_regressor_h36m,
        losses.LossWeights(), tx)
    batch = _synthetic_batch(small_assets, rng, b=16)
    key = jax.random.PRNGKey(7)

    # single device
    s1 = TrainState.create(variables, tx)
    s1, m1 = jax.jit(step)(s1, batch, key, jnp.asarray(1.0))

    # 8-device dp mesh
    mesh = make_mesh()
    s8 = replicate(mesh, TrainState.create(variables, tx))
    sharded_batch = shard_batch(mesh, batch)
    dstep = jit_data_parallel(step, mesh)
    s8, m8 = dstep(s8, sharded_batch, key, jnp.asarray(1.0))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=2e-4)
    # parameters agree after the update. Adam's first step is bounded by
    # ~lr per element and its SIGN flips when a gradient element sits at
    # float-reduction-noise scale, so the worst-case legitimate disagreement
    # is ~2*lr = 2e-3; real math bugs show up at O(1e-1).
    p1 = jax.tree_util.tree_leaves(s1.params)
    p8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.5e-3)


def test_checkpoint_roundtrip(tmp_path, small_assets):
    spec = GatorSpec.from_assets(small_assets, embed_dim=64, depth=1)
    tx = make_optimizer("adam", multistep_lr(1e-3, (30,), 0.1, 100))
    state = TrainState.create(init_gator(spec, jax.random.PRNGKey(0)), tx)
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, state, epoch=3, train_log=[1.0, 0.5],
                    test_log={"surface": [9.0], "joint": [8.0]},
                    is_best=True)
    path = pick_checkpoint(ckpt_dir, pick_best=True)
    restored = load_checkpoint(path, target_state=state)
    assert int(restored["epoch"]) == 3
    r_leaves = jax.tree_util.tree_leaves(restored["state"].params)
    o_leaves = jax.tree_util.tree_leaves(state.params)
    for a, b in zip(r_leaves, o_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # latest-checkpoint resolution
    save_checkpoint(ckpt_dir, state, epoch=5)
    assert pick_checkpoint(ckpt_dir).endswith("checkpoint5")


def test_pick_checkpoint_prefers_newer_numbered_over_final(
        tmp_path, small_assets):
    """An extended run preempted after final/ was written leaves
    checkpoint{N} dirs further along than final — resume must pick the
    newer one (and still pick final when final IS the newest)."""
    spec = GatorSpec.from_assets(small_assets, embed_dim=64, depth=1)
    tx = make_optimizer("adam", multistep_lr(1e-3, (30,), 0.1, 100))
    state = TrainState.create(init_gator(spec, jax.random.PRNGKey(0)), tx)
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, state, epoch=10, is_final=True)
    assert pick_checkpoint(ckpt_dir).endswith("final")
    save_checkpoint(ckpt_dir, state, epoch=14)
    assert pick_checkpoint(ckpt_dir).endswith("checkpoint14")
    # a stale numbered checkpoint older than final does not win
    import shutil
    shutil.rmtree(str(tmp_path / "ckpt" / "checkpoint14"))
    save_checkpoint(ckpt_dir, state, epoch=7)
    assert pick_checkpoint(ckpt_dir).endswith("final")


def test_multi_step_scan_matches_sequential(small_assets, gator_setup, rng):
    """K scanned steps (one dispatch) must reproduce K separate dispatches
    exactly: same param trajectory, same dropout keys (the inner fold_in
    uses state.step, which advances inside the scan), metrics = per-step
    mean."""
    from gator_tpu.train import make_multi_step

    spec, tx, state, step = gator_setup
    batches = [_synthetic_batch(small_assets, rng, b=8) for _ in range(3)]
    key = jax.random.PRNGKey(3)
    edge = jnp.asarray(1.0)

    s_seq, ms = state, []
    jstep = jax.jit(step)
    for b in batches:
        s_seq, m = jstep(s_seq, b, key, edge)
        ms.append(m)

    superbatch = jax.tree_util.tree_map(
        lambda *xs: np.stack(xs), *batches)
    s_scan, mm = jax.jit(make_multi_step(step))(state, superbatch, key,
                                                edge)

    for a, b in zip(jax.tree_util.tree_leaves(s_seq.params),
                    jax.tree_util.tree_leaves(s_scan.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6)
    assert int(s_scan.step) == int(s_seq.step)
    want = np.mean([float(m["loss"]) for m in ms])
    np.testing.assert_allclose(float(mm["loss"]), want, rtol=1e-5)


def test_multi_step_data_parallel_matches_per_step_dispatch(
        small_assets, gator_setup, rng):
    """On the 8-device dp mesh, the [K, B, ...] super-batch dispatch
    (stack_batches + superbatch sharding) matches K per-step dispatches on
    the same mesh."""
    from gator_tpu.parallel import stack_batches, superbatch_sharding
    from gator_tpu.train import make_multi_step

    spec, tx, state, step = gator_setup
    assert jax.device_count() >= 8
    mesh = make_mesh()
    batches = [_synthetic_batch(small_assets, rng, b=16) for _ in range(2)]
    key = jax.random.PRNGKey(5)
    edge = jnp.asarray(0.0)

    # device_put can alias buffers (the scalar step) rather than copy, and
    # dstep donates its state arg — replicate a deep copy per branch so the
    # first branch's donation can't delete the shared fixture state
    def fresh():
        return jax.tree_util.tree_map(jnp.array, state)

    s_seq = replicate(mesh, fresh())
    dstep = jit_data_parallel(step, mesh)
    for b in batches:
        s_seq, _ = dstep(s_seq, shard_batch(mesh, b), key, edge)

    s_multi = replicate(mesh, fresh())
    dmulti = jit_data_parallel(make_multi_step(step), mesh,
                               batch_spec=superbatch_sharding(mesh))
    s_multi, mm = dmulti(s_multi, stack_batches(mesh, batches), key, edge)

    for a, b in zip(jax.tree_util.tree_leaves(s_seq.params),
                    jax.tree_util.tree_leaves(s_multi.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6)
    assert np.isfinite(float(mm["loss"]))


def test_multi_slice_mesh_matches_single_device(small_assets, gator_setup,
                                                rng):
    """Multi-slice deployment: a 2-D ("dcn", "dp") mesh (2 slices x 4
    chips here) must reproduce single-device training and serving — the
    batch shards over both axes and GSPMD layers the gradient all-reduce
    per-slice (ICI) then cross-slice (DCN)."""
    from gator_tpu.serving import make_serving_fn, make_sharded_serving_fn

    spec, tx, state, step = gator_setup
    mesh2d = make_mesh(n_slices=2)
    assert mesh2d.axis_names == ("dcn", "dp")
    assert dict(mesh2d.shape) == {"dcn": 2, "dp": 4}
    batch = _synthetic_batch(small_assets, rng, b=16)
    key, edge = jax.random.PRNGKey(11), jnp.asarray(1.0)

    def fresh():
        return jax.tree_util.tree_map(jnp.array, state)

    s1, m1 = jax.jit(step)(fresh(), batch, key, edge)
    s2 = replicate(mesh2d, fresh())
    dstep = jit_data_parallel(step, mesh2d)
    s2, m2 = dstep(s2, shard_batch(mesh2d, batch), key, edge)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2.5e-3)

    # sharded serving on the same 2-D mesh equals the unsharded fn
    variables = jax.tree_util.tree_map(jnp.asarray,
                                       dict(s1.model_variables()))
    pose = np.asarray(batch["pose2d"])
    sfn = make_sharded_serving_fn(spec, variables, mesh=mesh2d,
                                  dtype=jnp.float32)
    smesh, _ = sfn(jnp.asarray(pose))
    umesh, _ = jax.jit(make_serving_fn(spec, variables,
                                       dtype=jnp.float32))(
        jnp.asarray(pose))
    np.testing.assert_allclose(np.asarray(smesh), np.asarray(umesh),
                               atol=1e-5)

"""Integration: the fused training forward (train/fused_forward.py) vs the
flax GATOR module.

With every dropout rate zero (GAT spec rates zeroed, LBF kernel rates
ZERO_RATES) and train-mode BatchNorm, the fused forward must reproduce
`GATOR.apply(deterministic=True, use_running_average=False)` — outputs,
updated batch statistics, AND parameter gradients. Kernels run through the
TPU-semantics interpreter on CPU.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from gator_tpu import losses
from gator_tpu.assets import build_assets
from gator_tpu.models import GATOR, GatorSpec, init_gator
from gator_tpu.nn.pallas_mdr_train import ZERO_RATES
from gator_tpu.train import TrainState
from gator_tpu.train.fused_forward import make_fused_forward
from gator_tpu.train.loop import make_gator_train_step


@pytest.fixture(scope="module")
def setup():
    assets = build_assets("human36", data_dirs=[],
                          synthetic_vertex_num=890, seed=0)
    spec = GatorSpec.from_assets(
        assets, embed_dim=64, depth=2, alpha=False,
        drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0)
    variables = init_gator(spec, jax.random.PRNGKey(0))
    rng = np.random.default_rng(4)
    pose2d = jnp.asarray(0.5 + 0.25 * rng.standard_normal((4, 17, 2)),
                         jnp.float32)
    return assets, spec, variables, pose2d


def _flax_train_forward(spec, variables, pose2d):
    model = GATOR(spec=spec)
    (mesh, pose3d), upd = model.apply(
        variables, pose2d, deterministic=True, use_running_average=False,
        mutable=["batch_stats"])
    return mesh, pose3d, upd["batch_stats"]


def test_fused_forward_matches_flax(setup):
    assets, spec, variables, pose2d = setup
    fwd = make_fused_forward(spec, dtype=jnp.float32, rates=ZERO_RATES,
                             interpret=True, gat_deterministic=True,
                             fused_gat=False)
    mesh_f, pose3d_f, bs_f = fwd(variables["params"],
                                 variables["batch_stats"], pose2d,
                                 jax.random.PRNGKey(1))
    mesh_x, pose3d_x, bs_x = _flax_train_forward(spec, variables, pose2d)

    np.testing.assert_allclose(np.asarray(mesh_f), np.asarray(mesh_x),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(pose3d_f),
                               np.asarray(pose3d_x), atol=1e-3)
    # train-mode BatchNorm running-stat updates agree with flax
    for key in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(bs_f["pose2mesh"]["bias_norm"][key]),
            np.asarray(bs_x["pose2mesh"]["bias_norm"][key]), atol=1e-5)


def test_fused_forward_grads_match_flax(setup):
    assets, spec, variables, pose2d = setup
    fwd = make_fused_forward(spec, dtype=jnp.float32, rates=ZERO_RATES,
                             interpret=True, gat_deterministic=True,
                             fused_gat=False)

    def loss_fused(params):
        mesh, pose3d, _ = fwd(params, variables["batch_stats"], pose2d,
                              jax.random.PRNGKey(1))
        return (mesh.astype(jnp.float32) ** 2).sum() \
            + 1e-6 * (pose3d.astype(jnp.float32) ** 2).sum()

    def loss_flax(params):
        mesh, pose3d, _ = _flax_train_forward(
            spec, {"params": params,
                   "batch_stats": variables["batch_stats"]}, pose2d)
        return (mesh ** 2).sum() + 1e-6 * (pose3d ** 2).sum()

    gf = jax.grad(loss_fused)(variables["params"])
    gx = jax.grad(loss_flax)(variables["params"])

    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_x = dict(jax.tree_util.tree_leaves_with_path(gx))
    checked = 0
    for path, leaf in flat_f:
        want = flat_x[path]
        name = jax.tree_util.keystr(path)
        if "linears_1" in name and "bias" in name:
            continue        # zero-true-grad key bias (noise both sides)
        scale = max(float(jnp.abs(want).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(leaf) / scale, np.asarray(want) / scale,
            atol=2e-4, err_msg=f"grad {name}")
        checked += 1
    assert checked > 50


def test_fused_train_step_runs_and_learns(setup):
    """One fused train step (default dropout rates, interpret kernels):
    finite loss, updated params, updated running stats."""
    assets, spec, variables, pose2d = setup
    tx = optax.adam(1e-4)
    step = make_gator_train_step(
        spec, assets.faces, assets.j_regressor_h36m,
        losses.LossWeights(), tx, dtype=jnp.float32, fused=True,
        fused_interpret=True)
    state = TrainState.create(
        jax.tree_util.tree_map(jnp.asarray, dict(variables)), tx)
    b, v = 4, 890
    rng = np.random.default_rng(1)
    batch = {
        "pose2d": np.asarray(pose2d),
        "mesh": rng.normal(size=(b, v, 3)).astype(np.float32) * 0.1,
        "lift_pose3d": rng.normal(size=(b, 17, 3)).astype(
            np.float32) * 100,
        "reg_pose3d": rng.normal(size=(b, 17, 3)).astype(
            np.float32) * 100,
        "mesh_valid": np.ones((b, v, 1), np.float32),
        "lift_valid": np.ones((b, 17, 1), np.float32),
        "reg_valid": np.ones((b, 17, 1), np.float32),
    }
    batch = {k: jnp.asarray(x) for k, x in batch.items()}
    state2, m = step(state, batch, jax.random.PRNGKey(0),
                     jnp.asarray(1.0))
    assert np.isfinite(float(m["loss"]))
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    bs0 = state.batch_stats["pose2mesh"]["bias_norm"]["mean"]
    bs1 = state2.batch_stats["pose2mesh"]["bias_norm"]["mean"]
    assert not np.allclose(np.asarray(bs0), np.asarray(bs1))


def test_fused_gat_trunk_forward_and_grads_match_flax(setup):
    """The FUSED-GAT training path (kernel trunk, zero rates incl. the
    GatMlp quirk rate) vs flax GATOR deterministic: outputs + grads."""
    assets, spec, variables, pose2d = setup
    fwd = make_fused_forward(spec, dtype=jnp.float32, rates=ZERO_RATES,
                             interpret=True, fused_gat=True,
                             gat_mlp_rate=0.0)
    mesh_f, pose3d_f, _ = fwd(variables["params"],
                              variables["batch_stats"], pose2d,
                              jax.random.PRNGKey(1))
    mesh_x, pose3d_x, _ = _flax_train_forward(spec, variables, pose2d)
    np.testing.assert_allclose(np.asarray(mesh_f), np.asarray(mesh_x),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(pose3d_f),
                               np.asarray(pose3d_x), atol=2e-3)

    def loss_fused(params):
        mesh, pose3d, _ = fwd(params, variables["batch_stats"], pose2d,
                              jax.random.PRNGKey(1))
        return (mesh.astype(jnp.float32) ** 2).sum() \
            + 1e-6 * (pose3d.astype(jnp.float32) ** 2).sum()

    def loss_flax(params):
        mesh, pose3d, _ = _flax_train_forward(
            spec, {"params": params,
                   "batch_stats": variables["batch_stats"]}, pose2d)
        return (mesh ** 2).sum() + 1e-6 * (pose3d ** 2).sum()

    gf = jax.grad(loss_fused)(variables["params"])
    gx = jax.grad(loss_flax)(variables["params"])
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_x = dict(jax.tree_util.tree_leaves_with_path(gx))
    checked = 0
    for path, leaf in flat_f:
        want = flat_x[path]
        name = jax.tree_util.keystr(path)
        if ("linears_1" in name and "bias" in name):
            continue        # MHA key bias: zero true grad
        a, b = np.asarray(leaf), np.asarray(want)
        if name.endswith("['qkv']['linear']['bias']"):
            c = a.shape[0] // 3
            keep = np.ones(a.shape, bool)
            keep[c:2 * c] = False       # fused-qkv key-bias slice
            a, b = a[keep], b[keep]
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-4,
                                   err_msg=f"grad {name}")
        checked += 1
    assert checked > 50


def test_fused_gat_stage1_step_matches_flax_rate0(setup):
    """Stage-1 (GAT pretrain) fused step == flax step with zero rates
    (GatMlp's fixed 0.1 silenced through the kernel's mlp_rate knob is
    NOT possible here — instead compare with mlp_rate active on neither
    side by rate-0 spec AND deterministic flax): use gradients through
    the trunk with all kernel rates 0 vs the flax eval-mode forward."""
    import optax

    from gator_tpu.nn.pallas_gat_train import gat_trunk_train
    from gator_tpu.serving import gat_serving_forward
    from gator_tpu.models.gat import GAT, GatSpec

    assets, spec, variables, pose2d = setup
    gspec = spec.gat
    gp = variables["params"]["pose_lifter"]
    seed = jnp.asarray([5], jnp.int32)

    def trunk(x, bias, block_params):
        return gat_trunk_train(x, bias, block_params, gspec.masks_xfeat,
                               gspec.num_heads, seed, attn_rate=0.0,
                               proj_rate=0.0, mlp_rate=0.0,
                               drop_path_rate=0.0, interpret=True)

    def loss_fused(params):
        p3, _ = gat_serving_forward(gspec, params, pose2d,
                                    dtype=jnp.float32, trunk=trunk)
        return (p3 ** 2).sum()

    gat = GAT(spec=gspec)

    def loss_flax(params):
        p3, _ = gat.apply({"params": params}, pose2d.reshape(4, -1),
                          deterministic=True)
        return (p3 ** 2).sum()

    np.testing.assert_allclose(float(loss_fused(gp)),
                               float(loss_flax(gp)), rtol=1e-5)
    gf = jax.grad(loss_fused)(gp)
    gx = jax.grad(loss_flax)(gp)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_x = dict(jax.tree_util.tree_leaves_with_path(gx))
    checked = 0
    for path, leaf in flat_f:
        want = flat_x[path]
        name = jax.tree_util.keystr(path)
        a, b = np.asarray(leaf), np.asarray(want)
        if name.endswith("['qkv']['linear']['bias']"):
            c = a.shape[0] // 3
            keep = np.ones(a.shape, bool)
            keep[c:2 * c] = False
            a, b = a[keep], b[keep]
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-4,
                                   err_msg=f"stage1 grad {name}")
        checked += 1
    assert checked > 30


def test_rates_from_spec_follows_dropout(setup):
    """Kernel rates derive from the spec: the cross-attn 0.2s are model
    constants, the self-attn/residual pair tracks spec.dropout
    (models/mdr.py:182-188) — guards against the fused path silently
    training a different model than the flax path."""
    import dataclasses

    from gator_tpu.train.fused_forward import rates_from_spec

    _, spec, _, _ = setup
    assert rates_from_spec(spec.mdr) == (0.2, 0.2, 0.2, 0.2,
                                         spec.mdr.dropout,
                                         spec.mdr.dropout)
    hot = dataclasses.replace(spec.mdr, dropout=0.3)
    assert rates_from_spec(hot) == (0.2, 0.2, 0.2, 0.2, 0.3, 0.3)


def test_kernel_cfg_rejects_unsupported_shapes():
    """Mask-id stream budgets are enforced, not silently exceeded."""
    from gator_tpu.nn.pallas_gat_train import GatBlockCfg
    from gator_tpu.nn.pallas_mdr_train import TrainLayerCfg

    with pytest.raises(ValueError, match="num_heads"):
        TrainLayerCfg(num_heads=9, nv0=431, nj0=17, layer=0)
    with pytest.raises(ValueError, match="num_heads"):
        GatBlockCfg(num_heads=9, num_joint=17, block=0)
    with pytest.raises(ValueError, match="group"):
        GatBlockCfg(num_heads=8, num_joint=17, block=0, group=16)


def test_mdr_batchnorm_requires_batch_stats(setup):
    """alpha=False (BatchNorm head) without running stats must fail with
    a clear error, not a TypeError deep in the trace."""
    from gator_tpu.train.fused_forward import mdr_train_forward

    _, spec, variables, _ = setup
    x = jnp.zeros((2, spec.mdr.num_joint, 2 + 3 + spec.gat.embed_dim))
    with pytest.raises(ValueError, match="bias_norm"):
        mdr_train_forward(spec.mdr, variables["params"]["pose2mesh"],
                          None, x, jnp.zeros((1,), jnp.int32),
                          interpret=True)


@pytest.mark.slow
def test_fused_forward_coco19_alpha_matches_flax():
    """Shape/branch generality of the FULL fused training path at the
    coco joint set (J=19 GAT tiling, 19 joint tokens in the LBF
    cross-attention) with alpha=True (LayerNorm head, no batch_stats):
    outputs and a parameter-gradient spot-check vs flax at rate 0."""
    from gator_tpu.assets import build_assets

    assets = build_assets("coco", data_dirs=[], synthetic_vertex_num=890,
                          seed=0)
    spec = GatorSpec.from_assets(
        assets, embed_dim=64, depth=2, alpha=True,
        drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0)
    variables = init_gator(spec, jax.random.PRNGKey(3))
    rng = np.random.default_rng(7)
    pose2d = jnp.asarray(0.5 + 0.25 * rng.standard_normal((4, 19, 2)),
                         jnp.float32)
    bs = variables.get("batch_stats")
    fwd = make_fused_forward(spec, dtype=jnp.float32, rates=ZERO_RATES,
                             interpret=True, fused_gat=True,
                             gat_mlp_rate=0.0)
    mesh_f, pose3d_f, _ = fwd(variables["params"], bs, pose2d,
                              jax.random.PRNGKey(1))
    model = GATOR(spec=spec)
    mesh_x, pose3d_x = model.apply(
        {"params": variables["params"]}, pose2d, deterministic=True)
    np.testing.assert_allclose(np.asarray(mesh_f), np.asarray(mesh_x),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(pose3d_f),
                               np.asarray(pose3d_x), atol=2e-3)

    def loss_fused(params):
        mesh, pose3d, _ = fwd(params, bs, pose2d, jax.random.PRNGKey(1))
        return (mesh.astype(jnp.float32) ** 2).sum()

    def loss_flax(params):
        mesh, _ = model.apply({"params": params}, pose2d,
                              deterministic=True)
        return (mesh ** 2).sum()

    gf = jax.grad(loss_fused)(variables["params"])
    gx = jax.grad(loss_flax)(variables["params"])
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_x = dict(jax.tree_util.tree_leaves_with_path(gx))
    checked = 0
    for path, leaf in flat_f:
        name = jax.tree_util.keystr(path)
        if "linears_1" in name and "bias" in name:
            continue        # zero-true-grad key bias (noise both sides)
        want = flat_x[path]
        scale = max(float(jnp.abs(want).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(leaf) / scale, np.asarray(want) / scale,
            atol=5e-4, err_msg=f"coco19 grad {name}")
        checked += 1
    assert checked > 50

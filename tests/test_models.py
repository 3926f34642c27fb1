"""Model-stack tests: shapes, determinism, jit, dropout behavior, and
numerical parity of the parity-critical layers against torch ops."""
import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np
import torch

from gator_tpu.models import (GAT, GATOR, GatSpec, GatorSpec, MDR, MdrSpec,
                              conv1d_len3, init_gator)
from gator_tpu.nn import GroupNormCF, StdLayerNorm


def test_std_layernorm_matches_torch():
    """The Annotated-Transformer LayerNorm (Bessel std, eps on std)."""
    x = np.random.default_rng(0).normal(size=(4, 7, 64)).astype(np.float32)
    xt = torch.from_numpy(x)
    mean = xt.mean(-1, keepdim=True)
    std = xt.std(-1, keepdim=True)           # unbiased by default
    expected = ((xt - mean) / (std + 1e-6)).numpy()

    mod = StdLayerNorm(64)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_group_norm_matches_torch():
    x = np.random.default_rng(1).normal(size=(3, 64, 17)).astype(np.float32)
    gn = torch.nn.GroupNorm(4, 64)
    with torch.no_grad():
        gn.weight.copy_(torch.linspace(0.5, 1.5, 64))
        gn.bias.copy_(torch.linspace(-0.2, 0.2, 64))
    expected = gn(torch.from_numpy(x)).detach().numpy()

    mod = GroupNormCF(num_groups=4, num_channels=64)
    params = {"params": {
        "scale": jnp.linspace(0.5, 1.5, 64),
        "bias": jnp.linspace(-0.2, 0.2, 64)}}
    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_conv1d_len3_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 56, 3)).astype(np.float32)
    w = rng.normal(size=(20, 56, 3)).astype(np.float32)
    b = rng.normal(size=(20,)).astype(np.float32)
    conv = torch.nn.Conv1d(56, 20, kernel_size=3, padding=1)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
        conv.bias.copy_(torch.from_numpy(b))
    expected = conv(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(conv1d_len3(jnp.asarray(x), jnp.asarray(w),
                                 jnp.asarray(b)))
    np.testing.assert_allclose(got, expected, atol=1e-4)


def _gator_spec(assets, alpha=False):
    return GatorSpec.from_assets(assets, embed_dim=128, depth=6, alpha=alpha)


def test_gat_forward_shapes(small_assets):
    spec = GatSpec.from_assets(small_assets, embed_dim=128, depth=2)
    model = GAT(spec=spec)
    pose = jnp.zeros((3, 17 * 2))
    variables = model.init(jax.random.PRNGKey(0), pose)
    pose3d, feat = model.apply(variables, pose)
    assert pose3d.shape == (3, 51)
    assert feat.shape == (3, 17, 128)


def test_gator_forward_and_jit(small_assets):
    spec = _gator_spec(small_assets)
    variables = init_gator(spec, jax.random.PRNGKey(0))
    assert "batch_stats" in variables  # alpha=False -> BatchNorm present
    model = GATOR(spec=spec)
    pose = jnp.asarray(np.random.default_rng(0).normal(
        size=(4, 17, 2)).astype(np.float32))

    @jax.jit
    def fwd(v, p):
        return model.apply(v, p, deterministic=True)

    mesh, pose3d = fwd(variables, pose)
    assert mesh.shape == (4, small_assets.vertex_num, 3)
    assert pose3d.shape == (4, 17, 3)
    # deterministic eval: same input -> same output
    mesh2, _ = fwd(variables, pose)
    np.testing.assert_array_equal(np.asarray(mesh), np.asarray(mesh2))


def test_gator_alpha_variant_has_no_batch_stats(small_assets):
    spec = _gator_spec(small_assets, alpha=True)
    variables = init_gator(spec, jax.random.PRNGKey(0))
    assert "batch_stats" not in variables
    p = variables["params"]["pose2mesh"]
    assert "scale_linear" in p and "bias_norm" in p


def test_gator_coco_joint_set(small_assets_coco):
    spec = _gator_spec(small_assets_coco)
    variables = init_gator(spec, jax.random.PRNGKey(0))
    model = GATOR(spec=spec)
    pose = jnp.zeros((2, 19, 2))
    mesh, pose3d = model.apply(variables, pose)
    assert pose3d.shape == (2, 19, 3)
    assert mesh.shape == (2, small_assets_coco.vertex_num, 3)


def test_dropout_training_path(small_assets):
    """Training mode must be stochastic across rng keys and update batch
    stats."""
    spec = _gator_spec(small_assets)
    variables = init_gator(spec, jax.random.PRNGKey(0))
    model = GATOR(spec=spec)
    pose = jnp.asarray(np.random.default_rng(0).normal(
        size=(4, 17, 2)).astype(np.float32))

    (m1, _), upd = model.apply(
        variables, pose, deterministic=False, use_running_average=False,
        rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"])
    (m2, _), _ = model.apply(
        variables, pose, deterministic=False, use_running_average=False,
        rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"])
    assert not np.allclose(np.asarray(m1), np.asarray(m2))
    # batch stats moved away from init (zeros mean)
    bs = jax.tree_util.tree_leaves(upd["batch_stats"])
    assert any(np.abs(np.asarray(x)).max() > 0 for x in bs)


def test_gradients_flow(small_assets):
    spec = _gator_spec(small_assets, alpha=True)
    variables = init_gator(spec, jax.random.PRNGKey(0))
    model = GATOR(spec=spec)
    pose = jnp.ones((2, 17, 2)) * 0.1

    def loss_fn(params):
        mesh, pose3d = model.apply({"params": params}, pose)
        return jnp.abs(mesh).mean() + jnp.abs(pose3d).mean()

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    nonzero = sum(float(np.abs(np.asarray(g)).sum()) > 0 for g in leaves)
    assert nonzero / len(leaves) > 0.9

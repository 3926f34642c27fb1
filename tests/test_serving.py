"""Serving path vs flax module equivalence (CPU: the fused layer routes to
its XLA form, so agreement is tight)."""
import jax
import jax.numpy as jnp
import numpy as np

from gator_tpu.models import GATOR, GatorSpec, init_gator
from gator_tpu.nn.pallas_mdr import (extract_layer_params, lbf_layer_xla)
from gator_tpu.serving import make_serving_fn


def _setup(small_assets, alpha):
    spec = GatorSpec.from_assets(small_assets, embed_dim=128, depth=2,
                                 alpha=alpha)
    variables = init_gator(spec, jax.random.PRNGKey(1))
    return spec, variables


def test_serving_matches_module_f32(small_assets, rng):
    for alpha in (False, True):
        spec, variables = _setup(small_assets, alpha)
        model = GATOR(spec=spec)
        pose = jnp.asarray(rng.normal(size=(4, 17, 2)).astype(np.float32))
        ref_mesh, ref_pose = model.apply(variables, pose,
                                         deterministic=True)
        fn = jax.jit(make_serving_fn(spec, variables, dtype=jnp.float32))
        mesh, pose3d = fn(pose)
        np.testing.assert_allclose(np.asarray(pose3d), np.asarray(ref_pose),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(mesh), np.asarray(ref_mesh),
                                   atol=1e-4)


def test_serving_bf16_close(small_assets, rng):
    spec, variables = _setup(small_assets, False)
    model = GATOR(spec=spec)
    pose = jnp.asarray(rng.normal(size=(2, 17, 2)).astype(np.float32))
    ref_mesh, _ = model.apply(variables, pose, deterministic=True)
    fn = jax.jit(make_serving_fn(spec, variables, dtype=jnp.bfloat16))
    mesh, _ = fn(pose)
    # bf16 activations: expect ~1e-2 agreement on meter-scale outputs
    err = np.abs(np.asarray(mesh, np.float32) - np.asarray(ref_mesh))
    assert err.max() < 5e-2


def test_lbf_layer_xla_matches_module_blocks(small_assets, rng):
    """The extracted per-layer function reproduces the module's layer
    output when fed the module's own intermediates."""
    spec, variables = _setup(small_assets, False)
    mdr_params = variables["params"]["pose2mesh"]
    verts = jnp.asarray(rng.normal(
        size=(3, spec.mdr.coarse_num, 64)).astype(np.float32))
    joints = jnp.asarray(rng.normal(size=(3, 17, 64)).astype(np.float32))
    for layer in range(3):
        p = extract_layer_params(mdr_params, layer)
        out = lbf_layer_xla(verts, joints, p, spec.mdr.num_heads)
        assert out.shape == verts.shape
        assert np.isfinite(np.asarray(out)).all()


def test_sharded_serving_matches_single(small_assets, rng):
    """Data-parallel serving over the 8-device virtual mesh produces the
    single-device results exactly (batch-sharded shard_map, replicated
    weights)."""
    from gator_tpu.parallel import make_mesh
    from gator_tpu.serving import make_sharded_serving_fn

    spec, variables = _setup(small_assets, False)
    pose = jnp.asarray(rng.normal(size=(16, 17, 2)).astype(np.float32))

    single = jax.jit(make_serving_fn(spec, variables, dtype=jnp.float32))
    mesh_fn = make_sharded_serving_fn(spec, variables, mesh=make_mesh(),
                                      dtype=jnp.float32)
    m1, p1 = single(pose)
    m8, p8 = mesh_fn(pose)
    assert len(m8.sharding.device_set) == len(jax.devices())
    np.testing.assert_allclose(np.asarray(m8), np.asarray(m1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(p8), np.asarray(p1), atol=1e-4)


def test_serving_matches_module_coco19_alpha(small_assets_coco, rng):
    """The serving path (fused-kernel fallbacks incl. the 19-joint GAT
    trunk tiling and 17+2-joint MDR cross-attention) matches the module
    for the coco joint set with alpha=True."""
    spec = GatorSpec.from_assets(small_assets_coco, embed_dim=128,
                                 depth=2, alpha=True)
    variables = init_gator(spec, jax.random.PRNGKey(2))
    model = GATOR(spec=spec)
    pose = jnp.asarray(rng.normal(size=(6, 19, 2)).astype(np.float32))
    ref_mesh, ref_pose = model.apply(variables, pose, deterministic=True)
    fn = jax.jit(make_serving_fn(spec, variables, dtype=jnp.float32))
    mesh, pose3d = fn(pose)
    np.testing.assert_allclose(np.asarray(pose3d), np.asarray(ref_pose),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(mesh), np.asarray(ref_mesh),
                               atol=1e-4)


def test_fused_kernels_interpret_coco19(small_assets_coco, rng):
    """Kernel-path (interpret mode) shape generality at J=19 / Nj=19."""
    from gator_tpu.models import GatSpec
    from gator_tpu.nn.pallas_gat import (extract_block_params,
                                         gat_block_xla, gat_blocks_fused)
    from gator_tpu.nn.pallas_mdr import (extract_layer_params,
                                         lbf_layer_xla, lbf_stack_fused)

    gspec = GatSpec.from_assets(small_assets_coco, embed_dim=128, depth=1)
    from gator_tpu.models.gat import GAT
    gat = GAT(spec=gspec)
    pose = jnp.asarray(rng.normal(size=(4, 38)).astype(np.float32))
    gparams = gat.init(jax.random.PRNGKey(0), pose)["params"]
    x = jnp.asarray(rng.normal(size=(4, 19, 128)).astype(np.float32))
    bias = jnp.asarray(rng.normal(
        size=(gspec.num_heads, 19, 19)).astype(np.float32))
    bps = [extract_block_params(gparams, 0, gspec.adjacency)]
    ref = gat_block_xla(x, bias, bps[0], gspec.masks_xfeat,
                        gspec.num_heads)
    got = gat_blocks_fused(x, bias, bps, gspec.masks_xfeat,
                           gspec.num_heads, group=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)

    spec = GatorSpec.from_assets(small_assets_coco, embed_dim=128,
                                 depth=2, alpha=True)
    variables = init_gator(spec, jax.random.PRNGKey(1))
    mdr_params = variables["params"]["pose2mesh"]
    verts = jnp.asarray(rng.normal(
        size=(4, spec.mdr.coarse_num, 64)).astype(np.float32))
    joints = jnp.asarray(rng.normal(size=(4, 19, 64)).astype(np.float32))
    lps = [extract_layer_params(mdr_params, i) for i in range(3)]
    ref = verts
    for lp in lps:
        ref = lbf_layer_xla(ref, joints, lp, spec.mdr.num_heads)
    got = lbf_stack_fused(verts, joints, lps, spec.mdr.num_heads,
                          group=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4)

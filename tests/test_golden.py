"""Golden-value regression tests: lock the numerical behavior of the
parity-critical functions on CPU so refactors across build rounds cannot
silently drift (the torch-checkpoint parity target is ≤0.1 mm — see
BASELINE.md). Values regenerate with REGEN=1 python -m pytest this file."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
REGEN = bool(os.environ.get("REGEN"))


def _check(name, value, atol=1e-5):
    path = os.path.join(GOLDEN, name + ".npy")
    value = np.asarray(value, np.float32)
    if REGEN or not os.path.isfile(path):
        os.makedirs(GOLDEN, exist_ok=True)
        np.save(path, value)
        if not REGEN:
            pytest.skip(f"golden {name} created; rerun to compare")
    expected = np.load(path)
    np.testing.assert_allclose(value, expected, atol=atol,
                               err_msg=f"golden drift in {name}")


def test_smpl_forward_golden(rng):
    from gator_tpu.assets import synthetic_smpl
    from gator_tpu.bodymodel import SmplParams, smpl_forward

    model = synthetic_smpl(vertex_num=500, seed=3)
    params = SmplParams.from_model(model)
    pose = (0.3 * np.random.default_rng(7).standard_normal(
        (2, 72))).astype(np.float32)
    betas = np.random.default_rng(8).standard_normal(
        (2, 10)).astype(np.float32)
    verts, joints = smpl_forward(params, jnp.asarray(pose),
                                 jnp.asarray(betas))
    _check("smpl_verts_500", np.asarray(verts)[:, ::50])
    _check("smpl_joints_500", np.asarray(joints))


def test_gator_forward_golden(small_assets):
    from gator_tpu.models import GATOR, GatorSpec, init_gator

    spec = GatorSpec.from_assets(small_assets, embed_dim=128, depth=2)
    variables = init_gator(spec, jax.random.PRNGKey(12))
    model = GATOR(spec=spec)
    pose = (np.random.default_rng(5).standard_normal(
        (2, 17, 2))).astype(np.float32)
    mesh, pose3d = model.apply(variables, jnp.asarray(pose),
                               deterministic=True)
    _check("gator_mesh_rows", np.asarray(mesh)[:, ::100], atol=5e-4)
    _check("gator_pose3d", np.asarray(pose3d), atol=5e-4)


def test_hop_path_tables_golden(small_assets):
    g = small_assets.graph
    _check("h36m_spatial_pos", g.spatial_pos.astype(np.float32))
    _check("h36m_edge_input", g.edge_input)
    _check("h36m_hop_recip", g.hop_recip)


def test_procrustes_golden(rng):
    from gator_tpu import metrics

    pred = np.random.default_rng(3).standard_normal(
        (3, 14, 3)).astype(np.float32) * 80
    gt = np.random.default_rng(4).standard_normal(
        (3, 14, 3)).astype(np.float32) * 80
    aligned = metrics.procrustes_align(jnp.asarray(pred), jnp.asarray(gt))
    _check("procrustes_aligned", np.asarray(aligned), atol=1e-3)

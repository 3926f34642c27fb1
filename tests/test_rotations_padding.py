"""Branch-complete rotation extraction + padding_idx training parity.

VERDICT round-1 items: rotmat_to_axis_angle previously used only the
trace-positive quaternion branch (useless near angle pi, where H36M
camera-rotated root poses live), and the padding_idx=0 embedding rows were
only zero-initialized, not gradient-pinned like torch's padding_idx.
"""
import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from gator_tpu.bodymodel.rotations import (axis_angle_to_rotmat,
                                           rotmat_to_axis_angle,
                                           rotmat_to_quat)
from gator_tpu.models import GATOR, GatorSpec, init_gator


def _rotvecs(angles, seed=0):
    rng = np.random.default_rng(seed)
    axes = rng.normal(size=(len(angles), 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    return axes * np.asarray(angles)[:, None]


def test_rotmat_to_axis_angle_all_branches():
    """Angles 1e-6 .. pi, several axes per angle: reconstruction error of
    the recovered rotation must stay <= 1e-6 (the old trace-only branch
    fails catastrophically at pi)."""
    angles = [1e-6, 0.3, 1.5, np.pi / 2, 3.0, np.pi - 1e-3, np.pi]
    for seed in range(4):
        rv = _rotvecs(angles, seed)
        mats = Rotation.from_rotvec(rv).as_matrix()          # f64 oracle
        out = np.asarray(rotmat_to_axis_angle(jnp.asarray(mats)))
        # recovered angle must be canonical [0, pi]
        assert (np.linalg.norm(out, axis=1) <= np.pi + 1e-5).all()
        recon = Rotation.from_rotvec(np.asarray(out, np.float64)).as_matrix()
        err = np.abs(recon - mats).max()
        assert err <= 1e-6, f"seed {seed}: rotation error {err:.2e}"


def test_rotmat_to_quat_matches_scipy():
    rv = _rotvecs([0.1, 1.0, 2.0, 3.1, np.pi], seed=7)
    mats = Rotation.from_rotvec(rv).as_matrix()
    got = np.asarray(rotmat_to_quat(jnp.asarray(mats)))      # (w, x, y, z)
    want = Rotation.from_matrix(mats).as_quat()              # (x, y, z, w)
    want = np.concatenate([want[:, 3:], want[:, :3]], axis=1)
    # q and -q are the same rotation (and at angle pi, w == 0 leaves the
    # sign genuinely ambiguous): compare up to sign per row
    diff = np.minimum(np.abs(got - want).max(1),
                      np.abs(got + want).max(1))
    assert diff.max() <= 1e-6, diff


def test_axis_angle_roundtrip_through_own_rodrigues():
    """rotmat_to_axis_angle inverts the SMPL-side quaternion Rodrigues."""
    rv = _rotvecs([1e-4, 0.8, 2.9, np.pi - 1e-4], seed=3).astype(np.float32)
    mats = axis_angle_to_rotmat(jnp.asarray(rv))
    back = rotmat_to_axis_angle(mats)
    mats2 = axis_angle_to_rotmat(back)
    np.testing.assert_allclose(np.asarray(mats2), np.asarray(mats),
                               atol=2e-6)


def test_padding_rows_stay_zero_under_training(small_assets):
    """Row 0 of every padding_idx embedding must receive ZERO gradient and
    stay exactly zero after an update — torch pins it forever
    (reference: modules.py:94, GAT.py:54,73, MDR.py:92-93). The spatial
    table's row 0 IS indexed (hop-0 diagonal), so this is the real case."""
    spec = GatorSpec.from_assets(small_assets, embed_dim=64, depth=1)
    variables = init_gator(spec, jax.random.PRNGKey(0))
    model = GATOR(spec=spec)
    pose = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 17, 2)).astype(np.float32))

    def loss_fn(params):
        mesh, pose3d = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pose, deterministic=True)
        return jnp.abs(mesh).sum() + jnp.abs(pose3d).sum()

    grads = jax.grad(loss_fn)(variables["params"])
    p = variables["params"]
    tables = {
        "pos_id_embed": grads["pose_lifter"]["pos_id_embed"],
        "pos_num_embed": grads["pose_lifter"]["pos_num_embed"],
        "spatial_pos_encoder":
            grads["pose_lifter"]["get_hop_path_encoding"][
                "spatial_pos_encoder"],
        "pos_j_id_embed": grads["pose2mesh"]["pos_j_id_embed"],
        "pos_v_id_embed": grads["pose2mesh"]["pos_v_id_embed"],
    }
    for name, g in tables.items():
        row0 = np.asarray(g)[0]
        assert np.all(row0 == 0.0), f"{name} row 0 grad nonzero"
    # the spatial table's OTHER rows must still learn (row 1+ is indexed)
    sp = np.asarray(tables["spatial_pos_encoder"])
    assert np.abs(sp[1:]).max() > 0

    # an sgd step keeps row 0 at exactly zero
    new = jax.tree_util.tree_map(lambda w, g: w - 0.1 * g,
                                 p, grads)
    assert np.all(np.asarray(
        new["pose_lifter"]["get_hop_path_encoding"]
        ["spatial_pos_encoder"])[0] == 0.0)

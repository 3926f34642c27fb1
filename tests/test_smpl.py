"""SMPL layer tests: rotation math vs closed-form Rodrigues, full forward
vs an independent torch oracle implementing the standard SMPL equations."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from gator_tpu.assets import smpl_assets
from gator_tpu.bodymodel import (SmplParams, axis_angle_to_rotmat,
                                 make_smpl_fn, smpl_forward,
                                 substitute_mean_betas)


def _rodrigues_closed_form(v):
    """Classic Rodrigues formula (independent of the quaternion path)."""
    theta = np.linalg.norm(v)
    if theta < 1e-9:
        return np.eye(3)
    k = v / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def test_axis_angle_matches_closed_form(rng):
    v = rng.normal(size=(32, 3)).astype(np.float32)
    got = np.asarray(axis_angle_to_rotmat(jnp.asarray(v)))
    for i in range(32):
        np.testing.assert_allclose(
            got[i], _rodrigues_closed_form(v[i]), atol=2e-6)


def test_axis_angle_zero_rotation():
    got = np.asarray(axis_angle_to_rotmat(jnp.zeros((1, 3))))
    np.testing.assert_allclose(got[0], np.eye(3), atol=1e-6)


def _torch_smpl_oracle(model, pose, betas):
    """Independent torch implementation of the standard SMPL equations
    (shape/pose blendshapes + kinematic chain + LBS)."""
    B = pose.shape[0]
    v_template = torch.from_numpy(model.v_template)
    shapedirs = torch.from_numpy(model.shapedirs)
    posedirs = torch.from_numpy(model.posedirs)
    j_reg = torch.from_numpy(model.j_regressor)
    weights = torch.from_numpy(model.weights)
    pose = torch.from_numpy(pose).view(B, 24, 3)
    betas_t = torch.from_numpy(betas)

    def rod(v):  # [N,3] -> [N,3,3] via quaternion like the reference
        angle = torch.norm(v + 1e-8, dim=1, keepdim=True)
        axis = v / angle
        half = angle * 0.5
        q = torch.cat([torch.cos(half), torch.sin(half) * axis], dim=1)
        q = q / q.norm(dim=1, keepdim=True)
        w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
        return torch.stack([
            w*w + x*x - y*y - z*z, 2*x*y - 2*w*z, 2*w*y + 2*x*z,
            2*w*z + 2*x*y, w*w - x*x + y*y - z*z, 2*y*z - 2*w*x,
            2*x*z - 2*w*y, 2*w*x + 2*y*z, w*w - x*x - y*y + z*z,
        ], dim=1).view(-1, 3, 3)

    R = rod(pose.reshape(-1, 3)).view(B, 24, 3, 3)
    v_shaped = v_template + torch.einsum("vcs,bs->bvc", shapedirs, betas_t)
    J = torch.einsum("jv,bvc->bjc", j_reg, v_shaped)
    pose_feat = (R[:, 1:] - torch.eye(3)).reshape(B, -1)
    v_posed = v_shaped + torch.einsum("vcp,bp->bvc", posedirs, pose_feat)

    parents = model.kintree_parents
    G = [None] * 24
    pad = torch.tensor([[0.0, 0, 0, 1]]).expand(B, 1, 4)

    def with_zeros(rt):  # [B,3,4] -> [B,4,4]
        return torch.cat([rt, pad], dim=1)

    G[0] = with_zeros(torch.cat([R[:, 0], J[:, 0, :, None]], dim=2))
    for i in range(1, 24):
        p = parents[i]
        local = with_zeros(torch.cat(
            [R[:, i], (J[:, i] - J[:, p])[:, :, None]], dim=2))
        G[i] = torch.bmm(G[p], local)
    Gs = torch.stack(G, dim=1)  # [B,24,4,4]
    joints = Gs[:, :, :3, 3]
    # subtract rest-joint contribution
    Jh = torch.cat([J, torch.zeros(B, 24, 1)], dim=2)
    correction = torch.einsum("bjxy,bjy->bjx", Gs, Jh)  # [B,24,4]
    Grel = Gs.clone()
    Grel[:, :, :, 3] = Gs[:, :, :, 3] - correction
    T = torch.einsum("vj,bjxy->bvxy", weights, Grel)
    v_h = torch.cat([v_posed, torch.ones(B, v_posed.shape[1], 1)], dim=2)
    verts = torch.einsum("bvxy,bvy->bvx", T, v_h)[:, :, :3]
    return verts.numpy(), joints.numpy()


@pytest.fixture(scope="module")
def small_model():
    return smpl_assets.synthetic_smpl(vertex_num=500, seed=3)


def test_smpl_forward_matches_torch_oracle(small_model, rng):
    B = 4
    pose = (0.4 * rng.normal(size=(B, 72))).astype(np.float32)
    betas = rng.normal(size=(B, 10)).astype(np.float32)
    params = SmplParams.from_model(small_model)
    verts_j, joints_j = smpl_forward(
        params, jnp.asarray(pose), jnp.asarray(betas))
    verts_t, joints_t = _torch_smpl_oracle(small_model, pose, betas)
    np.testing.assert_allclose(np.asarray(joints_j), joints_t, atol=2e-5)
    np.testing.assert_allclose(np.asarray(verts_j), verts_t, atol=2e-5)


def test_smpl_rest_pose_is_template(small_model):
    """Zero pose, zero betas -> template vertices exactly."""
    params = SmplParams.from_model(small_model)
    verts, joints = smpl_forward(
        params, jnp.zeros((1, 72)), jnp.zeros((1, 10)))
    np.testing.assert_allclose(
        np.asarray(verts[0]), small_model.v_template, atol=1e-5)
    rest_joints = small_model.j_regressor @ small_model.v_template
    np.testing.assert_allclose(np.asarray(joints[0]), rest_joints, atol=1e-5)


def test_smpl_trans_and_jit(small_model, rng):
    pose = (0.2 * rng.normal(size=(2, 72))).astype(np.float32)
    betas = np.zeros((2, 10), np.float32)
    trans = np.array([[1.0, 2.0, 3.0], [0.0, 0.0, 0.0]], np.float32)
    fn = jax.jit(make_smpl_fn(small_model))
    v0, j0 = fn(pose, betas)
    v1, j1 = fn(pose, betas, trans)
    np.testing.assert_allclose(
        np.asarray(v1[0]), np.asarray(v0[0]) + trans[0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(j1[1]), np.asarray(j0[1]),
                               atol=1e-6)


def test_smpl_vmap_grad_composable(small_model):
    """The layer must be differentiable (losses through GT synthesis are
    not needed, but camera fitting & future uses are)."""
    params = SmplParams.from_model(small_model)

    def loss(pose):
        v, _ = smpl_forward(params, pose, jnp.zeros((1, 10)))
        return jnp.sum(v ** 2)

    g = jax.grad(loss)(jnp.full((1, 72), 0.1))
    assert np.isfinite(np.asarray(g)).all()


def test_substitute_mean_betas():
    betas = np.array([[0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                      [1, 0, 0, 0, 0, 0, 0, 0, 0, 0]], np.float32)
    mean = np.full(10, 0.5, np.float32)
    out = substitute_mean_betas(betas, mean)
    np.testing.assert_allclose(out[0], mean)
    np.testing.assert_allclose(out[1], betas[1])

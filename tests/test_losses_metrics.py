"""Losses vs torch oracle; metrics vs the reference's numpy Procrustes."""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from gator_tpu import losses, metrics


def _rand_mesh(rng, b=3, v=120):
    return rng.normal(size=(b, v, 3)).astype(np.float32)


def _rand_faces(rng, v=120, f=80):
    faces = rng.integers(0, v, size=(f, 3))
    faces[:, 1] = (faces[:, 0] + 1) % v
    faces[:, 2] = (faces[:, 0] + 2) % v
    return faces.astype(np.int32)


def test_coord_l1_masked(rng):
    pred = _rand_mesh(rng)
    gt = _rand_mesh(rng)
    valid = (rng.uniform(size=(3, 120, 1)) > 0.3).astype(np.float32)
    got = float(losses.coord_l1_loss(
        jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(valid)))
    expected = float(np.abs(pred * valid - gt * valid).mean())
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def _torch_normal_loss(out, gt, face):
    out, gt = torch.from_numpy(out), torch.from_numpy(gt)
    face = torch.from_numpy(face).long()
    v1o = F.normalize(out[:, face[:, 1]] - out[:, face[:, 0]], p=2, dim=2)
    v2o = F.normalize(out[:, face[:, 2]] - out[:, face[:, 0]], p=2, dim=2)
    v3o = F.normalize(out[:, face[:, 2]] - out[:, face[:, 1]], p=2, dim=2)
    v1g = F.normalize(gt[:, face[:, 1]] - gt[:, face[:, 0]], p=2, dim=2)
    v2g = F.normalize(gt[:, face[:, 2]] - gt[:, face[:, 0]], p=2, dim=2)
    ng = F.normalize(torch.cross(v1g, v2g, dim=2), p=2, dim=2)
    cos = [torch.abs(torch.sum(v * ng, 2, keepdim=True))
           for v in (v1o, v2o, v3o)]
    return float(torch.cat(cos, 1).mean())


def test_normal_loss_matches_torch(rng):
    out, gt = _rand_mesh(rng), _rand_mesh(rng)
    faces = _rand_faces(rng)
    got = float(losses.normal_vector_loss(
        jnp.asarray(out), jnp.asarray(gt), faces))
    np.testing.assert_allclose(got, _torch_normal_loss(out, gt, faces),
                               rtol=1e-5)


def test_edge_loss_matches_torch(rng):
    out, gt = _rand_mesh(rng), _rand_mesh(rng)
    face = _rand_faces(rng)
    ot, gtt = torch.from_numpy(out), torch.from_numpy(gt)
    ft = torch.from_numpy(face).long()

    def d(c, a, b):
        return torch.sqrt(
            ((c[:, ft[:, a]] - c[:, ft[:, b]]) ** 2).sum(2, keepdim=True))

    expected = float(torch.cat([
        torch.abs(d(ot, 0, 1) - d(gtt, 0, 1)),
        torch.abs(d(ot, 0, 2) - d(gtt, 0, 2)),
        torch.abs(d(ot, 1, 2) - d(gtt, 1, 2))], 1).mean())
    got = float(losses.edge_length_loss(
        jnp.asarray(out), jnp.asarray(gt), face))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_gator_loss_assembly_and_edge_gating(rng):
    pred = _rand_mesh(rng)
    gt = _rand_mesh(rng)
    faces = _rand_faces(rng)
    pj = rng.normal(size=(3, 17, 3)).astype(np.float32)
    gj = rng.normal(size=(3, 17, 3)).astype(np.float32)
    ones_m = np.ones((3, 120, 1), np.float32)
    ones_j = np.ones((3, 17, 1), np.float32)
    w = losses.LossWeights()
    out_off = losses.gator_loss(pred, pj, pj, gt, gj, gj, ones_m, ones_j,
                                ones_j, faces, w, edge_enabled=0.0)
    out_on = losses.gator_loss(pred, pj, pj, gt, gj, gj, ones_m, ones_j,
                               ones_j, faces, w, edge_enabled=1.0)
    assert float(out_off.edge) == 0.0
    assert float(out_on.edge) > 0.0
    np.testing.assert_allclose(
        float(out_on.total),
        float(out_on.vertex + out_on.normal + out_on.edge
              + out_on.reg_joint + out_on.lift_joint), rtol=1e-6)


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------

def _np_rigid_align(A, B):
    """Reference similarity Procrustes (numpy, per sample) —
    clean-room copy of the math at lib/coord_utils.py:127-149."""
    n, _ = A.shape
    cA, cB = A.mean(0), B.mean(0)
    H = (A - cA).T @ (B - cB) / n
    U, s, V = np.linalg.svd(H)
    R = V.T @ U.T
    if np.linalg.det(R) < 0:
        s[-1] = -s[-1]
        V[2] = -V[2]
        R = V.T @ U.T
    varP = np.var(A, axis=0).sum()
    c = s.sum() / varP
    t = -(c * R) @ cA + cB
    return (c * R @ A.T).T + t


def test_procrustes_matches_reference_numpy(rng):
    pred = rng.normal(size=(5, 14, 3)).astype(np.float32) * 100
    gt = rng.normal(size=(5, 14, 3)).astype(np.float32) * 100
    got = np.asarray(metrics.procrustes_align(
        jnp.asarray(pred), jnp.asarray(gt)))
    for i in range(5):
        expected = _np_rigid_align(pred[i], gt[i])
        np.testing.assert_allclose(got[i], expected, atol=2e-3)


def test_procrustes_recovers_similarity_transform(rng):
    """pred = scale*R@gt + t must align exactly back onto gt."""
    gt = rng.normal(size=(4, 14, 3)).astype(np.float32) * 50
    theta = 0.7
    rot = np.array([[np.cos(theta), -np.sin(theta), 0],
                    [np.sin(theta), np.cos(theta), 0], [0, 0, 1]],
                   np.float32)
    pred = 2.5 * gt @ rot.T + np.array([10, -5, 3], np.float32)
    err = float(metrics.pa_mpjpe(jnp.asarray(pred), jnp.asarray(gt),
                                 align=False))
    assert err < 1e-2


def test_mpjpe_semantics(rng):
    pred = rng.normal(size=(2, 17, 3)).astype(np.float32) * 100
    gt = pred.copy()
    gt += 5.0  # uniform offset is removed by root alignment
    assert float(metrics.mpjpe(jnp.asarray(pred), jnp.asarray(gt))) < 1e-4
    # without alignment it is exactly the offset norm
    got = float(metrics.mpjpe(jnp.asarray(pred), jnp.asarray(gt),
                              align=False))
    np.testing.assert_allclose(got, np.sqrt(3 * 25), rtol=1e-5)


def test_mpjpe_eval_joint_subset(rng):
    pred = rng.normal(size=(2, 17, 3)).astype(np.float32)
    gt = pred.copy()
    gt[:, 0] += 100  # non-eval joint (root)
    gt[:, 9] += 100  # joint 9 (nose) excluded from h36m eval set
    ej = (1, 2, 3, 4, 5, 6, 8, 10, 11, 12, 13, 14, 15, 16)
    # errors at joints 0/9 leak in only via root alignment of gt
    pred0 = metrics.root_align(jnp.asarray(pred))
    gt0 = metrics.root_align(jnp.asarray(gt))
    got = float(metrics.mpjpe(pred0, gt0, eval_joints=ej, align=False))
    diff = np.asarray(gt0 - pred0)[:, list(ej)]
    np.testing.assert_allclose(
        got, np.sqrt((diff ** 2).sum(-1)).mean(), rtol=1e-5)


def test_accel_error(rng):
    seq = rng.normal(size=(10, 14, 3)).astype(np.float32)
    out = np.asarray(metrics.accel_error(jnp.asarray(seq), jnp.asarray(seq)))
    assert out.shape == (8,)
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_corner_gather_custom_vjp_matches_autodiff(small_assets):
    """The scatter-free loss backward (incidence-table gather+sum) must
    equal XLA's scatter-add autodiff exactly."""
    import jax
    import jax.numpy as jnp

    from gator_tpu import losses

    faces = np.asarray(small_assets.faces)
    v = small_assets.mean_vertices.shape[0]
    rng = np.random.default_rng(0)
    mesh = jnp.asarray(rng.normal(size=(3, v, 3)) * 0.1, jnp.float32)
    gt = jnp.asarray(rng.normal(size=(3, v, 3)) * 0.1, jnp.float32)
    cg = losses.make_corner_gather(faces, v)

    for loss_fn in (losses.normal_vector_loss, losses.edge_length_loss):
        g_fast = jax.grad(
            lambda m: loss_fn(m, gt, faces, corner_gather=cg))(mesh)
        g_ref = jax.grad(lambda m: loss_fn(m, gt, faces))(mesh)
        np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                                   atol=1e-7, err_msg=loss_fn.__name__)
    # values unchanged too
    a = losses.normal_vector_loss(mesh, gt, faces, corner_gather=cg)
    b = losses.normal_vector_loss(mesh, gt, faces)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-7)


def test_face_loss_grads_finite_on_degenerate_bf16_edges(small_assets):
    """bf16 meshes can have edges that round to EXACTLY zero length
    (nearby SMPL vertices at ~0.5 m coordinates; bf16 eps there ~4e-3).
    sqrt(0)'s gradient is inf and an outer max() clamp turns it into
    0*inf = NaN — one poisoned lane NaN'd whole bf16 training steps on
    chip (diverged at ~step 40). The clamp now sits INSIDE the sqrt."""
    import jax
    import jax.numpy as jnp

    from gator_tpu import losses

    faces = np.asarray(small_assets.faces)
    v = small_assets.mean_vertices.shape[0]
    rng = np.random.default_rng(0)
    mesh = rng.normal(size=(2, v, 3)).astype(np.float32) * 0.1
    # force degenerate geometry: the first face's corners coincide
    f0 = faces[0]
    mesh[:, f0[1]] = mesh[:, f0[0]]
    mesh[:, f0[2]] = mesh[:, f0[0]]
    gt = jnp.asarray(rng.normal(size=(2, v, 3)) * 0.1, jnp.bfloat16)
    mesh = jnp.asarray(mesh, jnp.bfloat16)
    cg = losses.make_corner_gather(faces, v)

    for loss_fn in (losses.normal_vector_loss, losses.edge_length_loss):
        g = jax.grad(lambda m: loss_fn(m, gt, faces, corner_gather=cg))(
            mesh)
        assert np.isfinite(np.asarray(g, np.float32)).all(), \
            loss_fn.__name__

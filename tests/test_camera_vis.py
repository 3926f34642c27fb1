"""Camera fitting, visualization, and fused-attention fallback tests."""
import os

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from gator_tpu import profiling, vis
from gator_tpu.models.camera import (CamParams, crop_cam_to_orig_img,
                                     fit_camera_adam,
                                     fit_camera_closed_form,
                                     project_weak_perspective)
from gator_tpu.nn.pallas_attention import _xla_attention, fused_attention


def test_projection_math():
    pose = jnp.asarray([[[0.5, -0.5, 1.0], [0.0, 0.0, 2.0]]])
    cam = CamParams(s=jnp.asarray([[2.0]]), t=jnp.asarray([[0.1, -0.1]]))
    out = np.asarray(project_weak_perspective(pose, cam, 500.0))
    # (x + tx) * s * 250 + 250
    np.testing.assert_allclose(out[0, 0], [(0.5 + 0.1) * 2 * 250 + 250,
                                           (-0.5 - 0.1) * 2 * 250 + 250])


def test_closed_form_fit_recovers_camera(rng):
    pose3d = jnp.asarray(rng.normal(size=(2, 17, 3)).astype(np.float32))
    true_cam = CamParams(s=jnp.asarray([[1.7], [0.9]]),
                         t=jnp.asarray([[0.2, -0.3], [0.05, 0.4]]))
    target = project_weak_perspective(pose3d, true_cam, 500.0)
    fit = fit_camera_closed_form(pose3d, target, 500.0)
    np.testing.assert_allclose(np.asarray(fit.s), np.asarray(true_cam.s),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(fit.t), np.asarray(true_cam.t),
                               atol=1e-4)


def test_adam_fit_converges(rng):
    pose3d = jnp.asarray(rng.normal(size=(1, 17, 3)).astype(np.float32))
    true_cam = CamParams(s=jnp.asarray([[1.3]]),
                         t=jnp.asarray([[0.1, 0.2]]))
    target = project_weak_perspective(pose3d, true_cam, 500.0)
    cam, loss = fit_camera_adam(pose3d, target, 500.0, steps=1500)
    assert float(loss) < 5.0   # pixels; reference runs the same schedule
    np.testing.assert_allclose(np.asarray(cam.s), [[1.3]], atol=0.05)


def test_crop_cam_conversion():
    cam = CamParams(s=jnp.asarray([[2.0]]), t=jnp.asarray([[0.0, 0.0]]))
    bbox = jnp.asarray([[100.0, 50.0, 200.0, 200.0]])
    out = np.asarray(crop_cam_to_orig_img(cam, bbox, 800.0, 600.0))
    # sx = s / (w_img / h_box)
    np.testing.assert_allclose(out[0, 0], 2.0 / (800.0 / 200.0))
    np.testing.assert_allclose(out[0, 1], 2.0 / (600.0 / 200.0))


def test_save_obj_and_render(tmp_path, rng):
    verts = rng.normal(size=(20, 3)).astype(np.float32) * 0.2
    faces = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8]], np.int32)
    path = str(tmp_path / "m.obj")
    vis.save_obj(verts, faces, path)
    lines = open(path).read().splitlines()
    assert sum(ln.startswith("v ") for ln in lines) == 20
    assert sum(ln.startswith("f ") for ln in lines) == 3
    assert lines[-1].split()[1] == "7"  # 1-indexed faces

    img = np.zeros((60, 80, 3), np.uint8)
    out = vis.render_mesh_overlay(img, verts, faces,
                                  np.array([1.0, 1.0, 0.0, 0.0]))
    assert out.shape == img.shape
    assert out.sum() > 0   # something was drawn


def test_vis_2d_and_3d(tmp_path, rng):
    img = np.zeros((100, 100, 3), np.uint8)
    kps = np.concatenate([rng.uniform(10, 90, (2, 5)),
                          np.ones((1, 5))]).astype(np.float32)
    out = vis.vis_2d_keypoints(img, kps, [(0, 1), (1, 2)])
    assert out.sum() > 0
    p = str(tmp_path / "pose.png")
    vis.vis_3d_pose(rng.normal(size=(17, 3)), [(0, 1)], p)
    assert os.path.getsize(p) > 0


def test_fused_attention_cpu_fallback_matches(rng):
    """On CPU the fused entry point must route to XLA and agree with the
    direct XLA formulation (incl. bias + grads)."""
    q = jnp.asarray(rng.normal(size=(2, 40, 2, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 24, 2, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 24, 2, 16)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(2, 40, 24)).astype(np.float32))
    out = fused_attention(q, k, v, bias, 0.25)
    ref = _xla_attention(q, k, v, bias, 0.25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    g1 = jax.grad(lambda q: fused_attention(q, k, v, bias, 0.25).sum())(q)
    g2 = jax.grad(lambda q: _xla_attention(q, k, v, bias, 0.25).sum())(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_step_timer():
    t = profiling.StepTimer(window=3)
    assert t.tick() is None
    for _ in range(4):
        t.tick()
    assert t.mean_step_time >= 0
    assert t.throughput(64) >= 0


def test_render_backend_dispatch(rng):
    """backend='auto' falls back to the software rasterizer when pyrender
    is absent; forcing 'pyrender' without the package raises."""
    from gator_tpu import vis

    img = np.zeros((64, 64, 3), np.uint8)
    verts = rng.normal(0, 0.3, (20, 3)).astype(np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8]], np.int32)
    cam = np.array([1.0, 1.0, 0.0, 0.0], np.float32)
    soft = vis.render_mesh_overlay(img, verts, faces, cam,
                                   backend="software")
    auto = vis.render_mesh_overlay(img, verts, faces, cam, backend="auto")
    if not vis.pyrender_available():
        np.testing.assert_array_equal(soft, auto)
        with pytest.raises(Exception):
            vis.render_mesh_overlay(img, verts, faces, cam,
                                    backend="pyrender")
    with pytest.raises(ValueError):
        vis.render_mesh_overlay(img, verts, faces, cam, backend="nope")

"""Demo CLI: 2D pose (.npy) -> SMPL mesh (.obj) + renders.

Mirrors demo/run.py (reference: demo/run.py:170-223): loads a [17, 2or3]
pose, adds pelvis/neck for the coco joint set, runs GATOR once, fits the
3-param weak-perspective camera (closed-form least squares by default; the
reference's 1500-step Adam schedule with --adam_fit), writes
demo_mesh.obj / demo_mesh.png / demo_pose2d.png.
"""
from __future__ import annotations

import argparse
import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from ..assets import build_assets
from ..data import augment, coords
from ..models import GATOR, GatorSpec, init_gator
from ..models.camera import (CamParams, crop_cam_to_orig_img,
                             fit_camera_adam, fit_camera_closed_form,
                             project_weak_perspective)
from ..vis import render_mesh_overlay, save_obj, vis_2d_keypoints
from .test import load_weights

VIRTUAL_CROP = 500  # square projection crop (reference: run.py:176)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="GATOR demo")
    p.add_argument("--input_pose", type=str, required=True)
    p.add_argument("--input_img", type=str, default=None)
    p.add_argument("--joint_set", type=str, default="coco",
                   choices=("coco", "human36"))
    p.add_argument("--weights", type=str, default=None)
    p.add_argument("--output_dir", type=str, default="./demo_result")
    p.add_argument("--adam_fit", action="store_true",
                   help="use the reference's 1500-step Adam camera fit")
    return p.parse_args(argv)


def add_pelvis_neck_3(joints, names):
    """Pelvis/neck synthesis for [J, 3] (x, y, score) input
    (reference: demo/run.py:103-121 — score = product of parents)."""
    from ..data.processing import add_pelvis_neck_scores
    return add_pelvis_neck_scores(joints[None], names)[0]


def run_demo(pose_path: str, joint_set: str = "coco",
             weights: str | None = None, output_dir: str = "./demo_result",
             input_img: str | None = None, adam_fit: bool = False,
             assets=None):
    os.makedirs(output_dir, exist_ok=True)
    assets = assets or build_assets(joint_set)
    spec = GatorSpec.from_assets(assets)
    variables = init_gator(spec, jax.random.PRNGKey(0))
    if weights:
        variables = load_weights(weights, variables)
    model = GATOR(spec=spec)

    joint_input = np.load(pose_path).reshape(17, -1).astype(np.float32)
    if joint_set == "coco":
        if joint_input.shape[1] == 2:
            joint_input = np.concatenate(
                [joint_input, np.ones((17, 1), np.float32)], axis=1)
        joint_input = add_pelvis_neck_3(
            joint_input, list(assets.joint_set.joints_name))[:, :2]
    else:
        joint_input = joint_input[:, :2]

    # two crops: square 500 for the projection target, model input crop
    # (reference: run.py:123-145)
    bbox = coords.get_bbox(joint_input)
    aspect_model = 288.0 / 384.0
    bbox1 = coords.process_bbox(bbox.copy(), 1.0, scale=1.25)
    bbox2 = coords.process_bbox(bbox.copy(), aspect_model)
    proj_target, _ = augment.j2d_processing(
        np.concatenate([joint_input,
                        np.ones((len(joint_input), 1), np.float32)], 1),
        (VIRTUAL_CROP, VIRTUAL_CROP), bbox1, 0, 0, None)
    model_in, _ = augment.j2d_processing(
        np.concatenate([joint_input,
                        np.ones((len(joint_input), 1), np.float32)], 1),
        (288, 384), bbox2, 0, 0, None)
    pose2d = augment.normalize_input_pose(model_in[:, :2], (384, 288))

    mesh, _ = jax.jit(
        lambda v, p: model.apply(v, p, deterministic=True))(
            variables, jnp.asarray(pose2d[None]))
    pred_mesh = np.asarray(mesh[0])                   # [V, 3] meters
    j_reg = (assets.j_regressor_coco if joint_set == "coco"
             else assets.j_regressor_h36m)
    pred_joints = jnp.einsum("jv,vc->jc", jnp.asarray(j_reg), mesh[0],
                             precision=jax.lax.Precision.HIGHEST)

    target = jnp.asarray(proj_target[None, :17, :2])
    if adam_fit:
        cam, loss = fit_camera_adam(pred_joints[None], target,
                                    VIRTUAL_CROP)
    else:
        cam = fit_camera_closed_form(pred_joints[None], target,
                                     VIRTUAL_CROP)
        loss = jnp.abs(project_weak_perspective(
            pred_joints[None], cam, VIRTUAL_CROP) - target).mean()
    print(f"camera fit: s={float(cam.s[0, 0]):.3f} "
          f"t=({float(cam.t[0, 0]):.3f}, {float(cam.t[0, 1]):.3f}) "
          f"L1={float(loss):.2f}px")

    # outputs
    obj_path = osp.join(output_dir, "demo_mesh.obj")
    save_obj(pred_mesh, assets.faces, obj_path)

    import cv2
    if input_img:
        orig_img = cv2.imread(input_img)
        oh, ow = orig_img.shape[:2]
    else:
        ow = int(joint_input[:, 0].max() * 1.5)
        oh = int(joint_input[:, 1].max() * 1.5)
        orig_img = np.zeros((oh, ow, 3), np.uint8)
    orig_cam = np.asarray(crop_cam_to_orig_img(
        cam, jnp.asarray(bbox1[None]), ow, oh))[0]
    mesh_img = render_mesh_overlay(orig_img, pred_mesh, assets.faces,
                                   orig_cam)
    cv2.imwrite(osp.join(output_dir, "demo_mesh.png"), mesh_img)

    kps = np.zeros((3, len(joint_input)), np.float32)
    kps[0], kps[1], kps[2] = joint_input[:, 0], joint_input[:, 1], 1
    pose_img = vis_2d_keypoints(orig_img.copy(), kps,
                                assets.joint_set.skeleton)
    cv2.imwrite(osp.join(output_dir, "demo_pose2d.png"), pose_img)
    print(f"results saved in {output_dir}")
    return {"mesh": pred_mesh, "cam": cam, "obj_path": obj_path}


def main(argv=None):
    from ._cache import enable_compile_cache
    enable_compile_cache()
    args = parse_args(argv)
    return run_demo(args.input_pose, args.joint_set, args.weights,
                    args.output_dir, args.input_img, args.adam_fit)


if __name__ == "__main__":
    main()

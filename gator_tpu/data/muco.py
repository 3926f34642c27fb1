"""MuCo-3DHP dataset reader (train only).

Multi-person composited dataset: per image the closest-to-camera person is
kept (reference: data/MuCo/dataset.py:138-141); SMPL params per annotation
with NaN filtering (:169-177); GT joints regressed from the fitted mesh and
projected with the full camera; fitting filter 45 mm against the MuCo
annotation joints transferred to the h36m joint set (:30,246-262 — note the
reference passes mesh-regressed joints into that filter, which would index
out of bounds; this implementation uses the annotation joints, the evident
intent).
"""
from __future__ import annotations

import dataclasses
import json
import os.path as osp
from typing import Dict

import numpy as np

from ..assets.bundle import GatorAssets
from . import coords, processing
from .base import assemble_batch
from .gt_synth import GtSynthesizer

MUCO_JOINTS_NAME = (
    "Head_top", "Thorax", "R_Shoulder", "R_Elbow", "R_Wrist", "L_Shoulder",
    "L_Elbow", "L_Wrist", "R_Hip", "R_Knee", "R_Ankle", "L_Hip", "L_Knee",
    "L_Ankle", "Pelvis", "Spine", "Head", "R_Hand", "L_Hand", "R_Toe",
    "L_Toe")
MUCO_ROOT_IDX = MUCO_JOINTS_NAME.index("Pelvis")
H36M_NAMES = (
    "Pelvis", "R_Hip", "R_Knee", "R_Ankle", "L_Hip", "L_Knee", "L_Ankle",
    "Torso", "Neck", "Nose", "Head", "L_Shoulder", "L_Elbow", "L_Wrist",
    "R_Shoulder", "R_Elbow", "R_Wrist")


@dataclasses.dataclass
class MucoTable:
    pose: np.ndarray        # [N, 72]
    shape: np.ndarray       # [N, 10]
    trans: np.ndarray       # [N, 3]
    focal: np.ndarray       # [N, 2]
    princpt: np.ndarray     # [N, 2]
    joint_cam_muco: np.ndarray  # [N, 21, 3]

    def __len__(self):
        return self.pose.shape[0]


class MucoDataset:
    name = "MuCo"
    fitting_thr = 45.0   # mm (reference: MuCo/dataset.py:30)

    def __init__(self, assets: GatorAssets, opts: processing.ProcessOptions,
                 data_dir: str, split: str = "train"):
        assert split == "train"
        self.assets = assets
        self.opts = processing.ProcessOptions(
            **{**opts.__dict__, "fitting_thr": self.fitting_thr,
               "is_train": True})
        self.joint_set = assets.joint_set
        self.table = self._load(data_dir)
        # static muco->h36m transfer mask
        self._h36m_from_muco = np.array(
            [MUCO_JOINTS_NAME.index(n) if n in MUCO_JOINTS_NAME else -1
             for n in H36M_NAMES])

    def _load(self, data_dir) -> MucoTable:
        base = osp.join(data_dir, "MuCo")
        with open(osp.join(base, "data",
                           "MuCo-3DHP.json")) as f:
            db = json.load(f)
        with open(osp.join(base, "data",
                           "smpl_param.json")) as f:
            smpl_params = json.load(f)

        anns_by_img: Dict[int, list] = {}
        for ann in db["annotations"]:
            anns_by_img.setdefault(ann["image_id"], []).append(ann)
        images = {img["id"]: img for img in db["images"]}

        aspect = self.opts.input_shape[1] / self.opts.input_shape[0]
        rows = []
        for iid, anns in anns_by_img.items():
            img = images[iid]
            focal = np.array(img["f"], np.float32).reshape(2)
            princpt = np.array(img["c"], np.float32).reshape(2)
            # closest person to the camera (reference: :138-141)
            depths = [a["keypoints_cam"][MUCO_ROOT_IDX][2] for a in anns]
            ann = anns[int(np.argmin(depths))]
            if coords.process_bbox(np.array(ann["bbox"]), aspect) is None:
                continue
            param = smpl_params.get(str(ann["id"]))
            if param is None:
                continue
            pose = np.array(param["pose"], np.float32).reshape(72)
            shape = np.array(param["shape"], np.float32).reshape(-1)[:10]
            trans = np.array(param["trans"], np.float32).reshape(3)
            if np.isnan(pose.sum() + shape.sum() + trans.sum()):
                continue
            rows.append(dict(
                pose=pose, shape=shape, trans=trans,
                focal=focal, princpt=princpt,
                joint_cam=np.array(ann["keypoints_cam"],
                                   np.float32).reshape(21, 3),
            ))
        if not rows:
            raise ValueError("MuCo annotations produced no usable samples")
        return MucoTable(
            pose=np.stack([r["pose"] for r in rows]),
            shape=np.stack([r["shape"] for r in rows]),
            trans=np.stack([r["trans"] for r in rows]),
            focal=np.stack([r["focal"] for r in rows]),
            princpt=np.stack([r["princpt"] for r in rows]),
            joint_cam_muco=np.stack([r["joint_cam"] for r in rows]),
        )

    def __len__(self):
        return len(self.table)

    def _fitting_error_batch(self, muco_joints, mesh_mm):
        """Translation-aligned error on muco->h36m transferred joints,
        batched on device — mesh_mm may be a jax array that never visits
        the host (reference: MuCo/dataset.py:246-262)."""
        import jax
        import jax.numpy as jnp
        rel = muco_joints - muco_joints[:, MUCO_ROOT_IDX:MUCO_ROOT_IDX + 1]
        mask = self._h36m_from_muco >= 0
        if getattr(self, "_fit_err_jit", None) is None:
            jreg = jnp.asarray(self.assets.j_regressor_h36m[mask])

            def f(gt, mesh):
                reg = jnp.einsum("jv,bvc->bjc", jreg, mesh,
                                 precision=jax.lax.Precision.HIGHEST)
                reg = reg - reg.mean(1, keepdims=True) \
                    + gt.mean(1, keepdims=True)
                return jnp.sqrt(((gt - reg) ** 2).sum(-1)).mean(-1)

            self._fit_err_jit = jax.jit(f)
        gt = rel[:, self._h36m_from_muco[mask]].astype(np.float32)
        return np.asarray(self._fit_err_jit(gt, mesh_mm))

    def packed_rows(self, synth: GtSynthesizer, indices):
        from .packed import muco_packed_rows
        return muco_packed_rows(self, synth, indices)

    def make_packed_batch(self, indices, rng):
        from .packed import make_packed_batch
        return make_packed_batch(self, indices, rng)

    def make_batch(self, indices, synth: GtSynthesizer,
                   rng: np.random.Generator,
                   stage: str = "gator") -> Dict[str, np.ndarray]:
        t = self.table
        idx = np.asarray(indices)
        mesh_mm, _ = synth.smpl_mesh_direct(
            t.pose[idx], t.shape[idx], t.trans[idx], "neutral", True)
        coco_cam, coco_img = synth.coco_from_mesh(
            mesh_mm, t.focal[idx], t.princpt[idx])
        coco_cam, coco_img = np.asarray(coco_cam), np.asarray(coco_img)
        h36m_dev = synth.h36m_from_mesh(mesh_mm)
        mesh_rel_m = synth.mesh_rel_m(mesh_mm, h36m_dev[:, :1])  # on device
        h36m_cam = np.asarray(h36m_dev)

        opts = self.opts
        cc = coco_cam - coco_cam[:, -2:-1]
        jh = h36m_cam - h36m_cam[:, :1]
        if opts.input_joint_name == "coco":
            joint_img_b, joint_cam_b = coco_img[:, :, :2], cc
        else:
            # h36m input: project regressed h36m joints (batched cam2pixel)
            ji = (h36m_cam[..., :2] / h36m_cam[..., 2:3]
                  * t.focal[idx][:, None, :] + t.princpt[idx][:, None, :])
            joint_img_b, joint_cam_b = ji.astype(np.float32), jh
        fit_err = self._fitting_error_batch(t.joint_cam_muco[idx], mesh_mm)
        # MuCo zeroes ALL masks on a bad fit (reference: dataset.py:316-319)
        return assemble_batch(
            opts, self.joint_set, rng, stage,
            mesh_rel_m=mesh_rel_m, joint_img_b=joint_img_b,
            joint_cam_b=joint_cam_b, reg_pose=jh, fit_err=fit_err,
            bad_zero_gator=("mesh", "reg", "lift"), bad_zero_gat=False)

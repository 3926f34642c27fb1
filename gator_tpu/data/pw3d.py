"""3DPW dataset reader + evaluation (test only).

Parses `3DPW_latest_{split}.json` (COCO-format) and the DarkPose detected
keypoints `darkpose_3dpw_{split}set_output.json` keyed by annotation id
(reference: data/PW3D/dataset.py:104-166). Gendered SMPL with translation
applied inside the layer; GT h36m/coco joints regressed from the GT mesh;
evaluation = H36M MPJPE / PA-MPJPE (14 joints) + SMPL MPJPE + MPVPE
(reference: PW3D/dataset.py:322-441).
"""
from __future__ import annotations

import dataclasses
import json
import os.path as osp
from typing import Dict, Optional

import numpy as np

from ..assets.bundle import GatorAssets
from . import coords, processing
from .base import GENDERS
from .gt_synth import GtSynthesizer

OPENPOSE_NAMES = (
    "Nose", "Neck", "R_Shoulder", "R_Elbow", "R_Wrist", "L_Shoulder",
    "L_Elbow", "L_Wrist", "R_Hip", "R_Knee", "R_Ankle", "L_Hip", "L_Knee",
    "L_Ankle", "R_Eye", "L_Eye", "R_Ear", "L_Ear", "Pelvis")


@dataclasses.dataclass
class Pw3dTable:
    pose: np.ndarray        # [N, 72]
    shape: np.ndarray       # [N, 10]
    trans: np.ndarray       # [N, 3]
    gender: np.ndarray      # [N] int
    focal: np.ndarray       # [N, 2]
    princpt: np.ndarray     # [N, 2]
    pred_pose2d: np.ndarray  # [N, 19, 3] darkpose + pelvis/neck
    vid_id: np.ndarray      # [N] video index (for accel metrics)

    def __len__(self):
        return self.pose.shape[0]


def _add_pelvis_neck(joints, names, only_pelvis=False):
    """(reference: PW3D/dataset.py:168-183)."""
    pelvis = 0.5 * (joints[names.index("L_Hip")]
                    + joints[names.index("R_Hip")])
    neck = 0.5 * (joints[names.index("L_Shoulder")]
                  + joints[names.index("R_Shoulder")])
    parts = [joints, pelvis[None]]
    if not only_pelvis:
        parts.append(neck[None])
    return np.concatenate(parts)


class PW3D:
    name = "PW3D"

    def __init__(self, assets: GatorAssets, opts: processing.ProcessOptions,
                 data_dir: str, split: str = "test"):
        self.assets = assets
        self.opts = processing.ProcessOptions(
            **{**opts.__dict__, "is_train": False})
        self.joint_set = assets.joint_set
        self.split = split
        self.table = self._load(data_dir, split)

    def _load(self, data_dir, split) -> Pw3dTable:
        data_path = osp.join(data_dir, "PW3D", "data")
        with open(osp.join(data_path,
                           f"3DPW_latest_{split}.json")) as f:
            db = json.load(f)
        with open(osp.join(
                data_path,
                f"darkpose_3dpw_{split}set_output.json")) as f:
            det = {str(item["annotation_id"]):
                   np.array(item["keypoints"], np.float32)[:, :3]
                   for item in json.load(f)}

        images = {img["id"]: img for img in db["images"]}
        gender_code = {"neutral": 0, "female": 1, "male": 2,
                       "f": 1, "m": 2}
        h, w = self.opts.input_shape
        aspect = w / h
        rows = []
        for ann in db["annotations"]:
            img = images[ann["image_id"]]
            smpl_param = ann["smpl_param"]
            cam = {k: np.array(v, np.float32)
                   for k, v in img["cam_param"].items()}
            # bbox sanity filter: skip annotations whose bbox can't be
            # processed (reference: PW3D/dataset.py:135-136)
            if "bbox" in ann and coords.process_bbox(
                    np.array(ann["bbox"], np.float32), aspect) is None:
                continue
            custom = det.get(str(ann["id"]))
            if custom is None:
                continue
            custom = _add_pelvis_neck(
                custom, list(self.joint_set.joints_name))
            rows.append(dict(
                sort_key=(ann["person_id"],
                          osp.join(img["sequence"], img["file_name"])),
                pose=np.array(smpl_param["pose"], np.float32).reshape(72),
                shape=np.array(smpl_param["shape"],
                               np.float32).reshape(-1)[:10],
                trans=np.array(smpl_param["trans"], np.float32).reshape(3),
                gender=gender_code.get(str(smpl_param.get(
                    "gender", "neutral")).lower(), 0),
                focal=cam["focal"].reshape(2),
                princpt=cam["princpt"].reshape(2),
                pred=custom.astype(np.float32),
                vid=img["sequence"] + str(ann["person_id"]),
            ))
        rows.sort(key=lambda r: r["sort_key"])
        if not rows:
            raise ValueError("3DPW annotations produced no usable samples")
        vids = {v: i for i, v in enumerate(
            dict.fromkeys(r["vid"] for r in rows))}
        return Pw3dTable(
            pose=np.stack([r["pose"] for r in rows]),
            shape=np.stack([r["shape"] for r in rows]),
            trans=np.stack([r["trans"] for r in rows]),
            gender=np.array([r["gender"] for r in rows], np.int64),
            focal=np.stack([r["focal"] for r in rows]),
            princpt=np.stack([r["princpt"] for r in rows]),
            pred_pose2d=np.stack([r["pred"] for r in rows]),
            vid_id=np.array([vids[r["vid"]] for r in rows], np.int64),
        )

    def __len__(self):
        return len(self.table)

    def synthesize_gt(self, indices, synth: GtSynthesizer):
        """GT mesh (mm) + regressed joints for the given rows, batched by
        gender (reference: PW3D/dataset.py:84-102,222-231)."""
        t = self.table
        idx = np.asarray(indices)
        v = self.assets.vertex_num
        mesh = np.empty((len(idx), v, 3), np.float32)
        for g_code, g_name in enumerate(GENDERS):
            sel = np.nonzero(t.gender[idx] == g_code)[0]
            if len(sel) == 0:
                continue
            sub = idx[sel]
            m, _ = synth.smpl_mesh_direct(
                t.pose[sub], t.shape[sub], t.trans[sub], g_name,
                False)  # no |beta|>3 cleaning in the 3DPW path
            mesh[sel] = np.asarray(m)
        return mesh

    def make_batch(self, indices, synth: GtSynthesizer,
                   rng: np.random.Generator,
                   stage: str = "gator") -> Dict[str, np.ndarray]:
        t = self.table
        idx = np.asarray(indices)
        mesh_mm = self.synthesize_gt(idx, synth)
        coco_cam, coco_img = synth.coco_from_mesh(
            mesh_mm, t.focal[idx], t.princpt[idx])
        coco_cam, coco_img = np.asarray(coco_cam), np.asarray(coco_img)
        h36m_cam = np.asarray(synth.h36m_from_mesh(mesh_mm))

        out = {"pose2d": [], "mesh": [], "reg_pose3d": [],
               "lift_pose3d": [], "mesh_valid": [], "reg_valid": [],
               "lift_valid": [], "joint_cam": [], "joint_valid": []}
        opts = self.opts
        for row, i in enumerate(idx):
            mesh_rel = mesh_mm[row] - h36m_cam[row][:1]
            cc = coco_cam[row] - coco_cam[row][-2:-1]
            jh = h36m_cam[row] - h36m_cam[row][:1]
            joint_img = (coco_img[row] if opts.use_gt_input
                         else t.pred_pose2d[i])
            pose2d = processing.crop_and_normalize_input(
                joint_img[:, :2], self.joint_set, opts, rng, 0, 0.0)
            out["pose2d"].append(pose2d)
            if stage == "gator":
                out["mesh"].append((mesh_rel / 1000.0).astype(np.float32))
                out["reg_pose3d"].append(jh.astype(np.float32))
                out["lift_pose3d"].append(cc.astype(np.float32))
                # [1, 1] per-sample masks broadcast in the loss
                out["mesh_valid"].append(np.ones((1, 1), np.float32))
                out["reg_valid"].append(np.ones((1, 1), np.float32))
                out["lift_valid"].append(np.ones((1, 1), np.float32))
            else:
                out["joint_cam"].append(cc.astype(np.float32))
                out["joint_valid"].append(np.ones((1, 1), np.float32))
        keys = (("pose2d", "mesh", "lift_pose3d", "reg_pose3d",
                 "mesh_valid", "reg_valid", "lift_valid")
                if stage == "gator" else
                ("pose2d", "joint_cam", "joint_valid"))
        return {k: np.stack(out[k]) for k in keys}

    def evaluate(self, pred_mesh_mm: np.ndarray, gt_mesh_mm: np.ndarray,
                 verbose: bool = True) -> Dict[str, float]:
        """(reference: PW3D/dataset.py:322-441)."""
        from .. import metrics as jm
        import jax.numpy as jnp

        jr_smpl = self.assets.j_regressor_smpl
        jr_h36m = self.assets.j_regressor_h36m
        # always the 14-joint h36m eval subset (reference: PW3D:46)
        ej = [1, 2, 3, 4, 5, 6, 8, 10, 11, 12, 13, 14, 15, 16]

        pj = np.einsum("jv,bvc->bjc", jr_smpl, pred_mesh_mm)
        gj = np.einsum("jv,bvc->bjc", jr_smpl, gt_mesh_mm)
        pm0 = pred_mesh_mm - pj[:, :1]
        gm0 = gt_mesh_mm - gj[:, :1]
        smpl_mpjpe = float(np.sqrt((((pj - pj[:, :1]) -
                                     (gj - gj[:, :1])) ** 2).sum(-1)).mean())
        mpvpe = float(np.sqrt(((pm0 - gm0) ** 2).sum(-1)).mean())

        ph = np.einsum("jv,bvc->bjc", jr_h36m, pm0)
        gh = np.einsum("jv,bvc->bjc", jr_h36m, gm0)
        ph = (ph - ph[:, :1])[:, ej]
        gh = (gh - gh[:, :1])[:, ej]
        mpjpe = float(np.sqrt(((ph - gh) ** 2).sum(-1)).mean())
        aligned = np.asarray(jm.procrustes_align(
            jnp.asarray(ph), jnp.asarray(gh)))
        pa_mpjpe = float(np.sqrt(((aligned - gh) ** 2).sum(-1)).mean())

        out = {"mpjpe": mpjpe, "pa_mpjpe": pa_mpjpe,
               "smpl_mpjpe": smpl_mpjpe, "mpvpe": mpvpe}
        if verbose:
            print(f"H36M MPJPE (mm)    >> tot: {mpjpe:.2f}")
            print(f"H36M PA-MPJPE (mm) >> tot: {pa_mpjpe:.2f}")
            print(f"SMPL MPJPE (mm)    >> tot: {smpl_mpjpe:.2f}")
            print(f"MPVPE (mm)         >> tot: {mpvpe:.2f}")
        return out

    def accel_errors(self, pred_joints_by_video):
        """Per-video acceleration error (the reference keeps this path in a
        commented block — PW3D/dataset.py:383-417; exposed here as a
        first-class metric)."""
        from .. import metrics as jm
        import jax.numpy as jnp
        return [float(np.mean(np.asarray(jm.accel_error(
            jnp.asarray(gt), jnp.asarray(pred)))))
            for pred, gt in pred_joints_by_video]

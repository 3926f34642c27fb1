"""Dataset base machinery: structure-of-arrays annotations + the common
batch assembly used by every dataset.

Design shift vs the reference: instead of per-sample Python dicts consumed
by DataLoader workers (each running SMPL on CPU), a dataset is a table of
numpy arrays over N samples; batches are assembled by slicing the table,
running ONE device program for GT synthesis (gt_synth), and doing the cheap
per-sample 2D work on host.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np

from ..assets.bundle import GatorAssets
from ..assets.skeletons import JointSet
from . import noise as noise_mod
from . import processing
from .gt_synth import GtSynthesizer

GENDERS = ("neutral", "female", "male")


@dataclasses.dataclass
class SmplTable:
    """SoA annotations for datasets with SMPL fits + full cameras."""

    pose: np.ndarray            # [N, 72]
    shape: np.ndarray           # [N, 10]
    trans: np.ndarray           # [N, 3]
    cam_r: np.ndarray           # [N, 3, 3]
    cam_t: np.ndarray           # [N, 3] (mm)
    focal: np.ndarray           # [N, 2]
    princpt: np.ndarray         # [N, 2]
    joint_cam_h36m: np.ndarray  # [N, 17, 3] dataset GT (mm, camera space)
    joint_img_h36m: np.ndarray  # [N, 17, 2]
    gender: np.ndarray          # [N] int: 0 neutral / 1 female / 2 male
    meta: Dict[str, np.ndarray] = dataclasses.field(default_factory=dict)

    def __len__(self):
        return self.pose.shape[0]


class SmplPoseDataset:
    """Common behavior for H36M/MuCo-style datasets (SMPL params + full
    camera annotations). Subclasses fill `table`, `fitting_thr`, and
    evaluation."""

    name = "base"

    def __init__(self, assets: GatorAssets, opts: processing.ProcessOptions,
                 table: SmplTable,
                 detected_pose: Optional[np.ndarray] = None):
        self.assets = assets
        self.opts = opts
        self.table = table
        self.joint_set: JointSet = assets.joint_set
        self.detected_pose = detected_pose  # [N, J, 3] test-time detections
        self._h36m_stats = noise_mod.h36m_error_stats(
            ("Pelvis", "R_Hip", "R_Knee", "R_Ankle", "L_Hip", "L_Knee",
             "L_Ankle", "Torso", "Neck", "Nose", "Head", "L_Shoulder",
             "L_Elbow", "L_Wrist", "R_Shoulder", "R_Elbow", "R_Wrist"))

    def __len__(self):
        return len(self.table)

    # -- batch assembly ----------------------------------------------------

    def make_batch(self, indices: np.ndarray, synth: GtSynthesizer,
                   rng: np.random.Generator,
                   stage: str = "gator") -> Dict[str, np.ndarray]:
        t = self.table
        idx = np.asarray(indices)
        # device GT synthesis, grouped by gender
        mesh_mm = np.empty((len(idx),) + (self.assets.vertex_num, 3),
                           np.float32)
        coco_cam = np.empty((len(idx), 19, 3), np.float32)
        coco_img = np.empty((len(idx), 19, 3), np.float32)
        fit_err = np.empty((len(idx),), np.float32)
        for g_code, g_name in enumerate(GENDERS):
            sel = np.nonzero(t.gender[idx] == g_code)[0]
            if len(sel) == 0:
                continue
            sub = idx[sel]
            out = synth.synthesize(
                t.pose[sub], t.shape[sub], t.trans[sub], t.cam_r[sub],
                t.cam_t[sub], t.focal[sub], t.princpt[sub],
                joint_cam_h36m=(t.joint_cam_h36m[sub]
                                - t.joint_cam_h36m[sub][:, :1]),
                gender=g_name)
            mesh_mm[sel] = out["mesh_mm"]
            coco_cam[sel] = out["joint_cam_coco"]
            coco_img[sel] = out["joint_img_coco"]
            fit_err[sel] = out.get(
                "fitting_error", np.zeros(len(sel), np.float32))

        return self._assemble(idx, mesh_mm, coco_cam, coco_img, fit_err,
                              rng, stage)

    def _assemble(self, idx, mesh_mm, coco_cam, coco_img, fit_err, rng,
                  stage) -> Dict[str, np.ndarray]:
        t = self.table
        opts = self.opts
        jset = self.joint_set
        out: Dict[str, list] = {k: [] for k in (
            "pose2d", "mesh", "lift_pose3d", "reg_pose3d", "mesh_valid",
            "reg_valid", "lift_valid", "joint_cam", "joint_valid")}
        for row, i in enumerate(idx):
            from .augment import augm_params
            flip, rot = augm_params(opts.is_train, opts.flip_enabled,
                                    opts.rotate_factor, rng)
            jc_h36m = t.joint_cam_h36m[i]
            # root-relative (reference: Human36M/dataset.py:352-356)
            mesh_rel = mesh_mm[row] - jc_h36m[:1]
            cc = coco_cam[row] - coco_cam[row][-2:-1]
            jh = jc_h36m - jc_h36m[:1]
            if opts.input_joint_name == "coco":
                joint_img, joint_cam = coco_img[row][:, :2], cc
            else:
                joint_img, joint_cam = t.joint_img_h36m[i], jh

            det = None
            area = None
            stats = None
            if not opts.use_gt_input:
                if not opts.is_train and self.detected_pose is not None:
                    det = self.detected_pose[i]
                elif opts.input_joint_name == "coco":
                    area = processing.crop_area(joint_img, opts)
                else:
                    stats = self._h36m_stats
            pose2d = processing.crop_and_normalize_input(
                joint_img, jset, opts, rng, flip, rot,
                detected_pose=det, h36m_noise_stats=stats,
                coco_noise_area=area)
            out["pose2d"].append(pose2d)

            if stage == "gator":
                tgt = processing.gator_targets(
                    mesh_rel, joint_cam, jh, float(fit_err[row]), opts,
                    flip, rot, jset)
                for k, v in tgt.items():
                    out[k].append(v)
            else:  # gat stage-1: lifted-joint targets only
                jc = processing.augment.j3d_processing(
                    joint_cam, rot, flip, jset.flip_pairs)
                valid = np.ones((len(jc), 1), np.float32)
                if opts.input_joint_name == "coco" \
                        and float(fit_err[row]) > opts.fitting_thr:
                    valid[:] = 0
                out["joint_cam"].append(jc)
                out["joint_valid"].append(valid)

        keys = (("pose2d", "mesh", "lift_pose3d", "reg_pose3d",
                 "mesh_valid", "reg_valid", "lift_valid")
                if stage == "gator" else
                ("pose2d", "joint_cam", "joint_valid"))
        return {k: np.stack(out[k]) for k in keys}


def mixed_epoch_indices(lengths, rng: np.random.Generator) -> np.ndarray:
    """MultipleDatasets(make_same_len=True) semantics: epoch length =
    max_len * n_dbs; each slot draws a uniform random dataset, index =
    (slot_in_db + random offset) % len(db)
    (reference: data/multiple_datasets.py:22-29)."""
    n_dbs = len(lengths)
    max_len = max(lengths)
    total = max_len * n_dbs
    db_choice = rng.integers(0, n_dbs, size=total)
    offsets = rng.integers(0, np.iinfo(np.int32).max, size=total)
    out = np.empty((total, 2), np.int64)
    out[:, 0] = db_choice
    for k in range(total):
        d = db_choice[k]
        out[k, 1] = (k // n_dbs + offsets[k]) % lengths[d]
    return out

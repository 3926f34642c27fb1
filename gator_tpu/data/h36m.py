"""Human3.6M dataset reader + evaluation.

Parses the same annotation files as the reference
(`Human36M_subject{S}_{data,camera,joint_3d,smpl_param}.json`,
`absnet_output_on_testset.json` for detected test input) into an SoA table
(reference: data/Human36M/dataset.py:157-252). Protocol behavior preserved:
protocol 2 subjects (train 1/5/6/7/8, test 9/11), frame subsampling 5/50,
fitting threshold 25 mm, final eval on camera 4 only with the 14-joint
subset and per-action breakdown (reference: dataset.py:33,108-133,515-636).
"""
from __future__ import annotations

import json
import os.path as osp
from typing import Dict, List, Optional

import numpy as np

from ..assets.bundle import GatorAssets
from . import coords, processing
from .base import SmplPoseDataset, SmplTable

ACTION_NAMES = (
    "Directions", "Discussion", "Eating", "Greeting", "Phoning", "Posing",
    "Purchases", "Sitting", "SittingDown", "Smoking", "Photo", "Waiting",
    "Walking", "WalkDog", "WalkTogether")

SUBJECTS = {  # (protocol, split) -> subject list
    (1, "train"): (1, 5, 6, 7, 8, 9), (1, "test"): (11,),
    (2, "train"): (1, 5, 6, 7, 8), (2, "test"): (9, 11),
}
SAMPLING = {"train": 5, "test": 50}


class Human36M(SmplPoseDataset):
    name = "Human36M"

    def __init__(self, assets: GatorAssets, opts: processing.ProcessOptions,
                 data_dir: str, split: str, protocol: int = 2,
                 debug: bool = False):
        opts = processing.ProcessOptions(
            **{**opts.__dict__, "fitting_thr": 25.0,
               "is_train": split == "train"})
        table, detected, meta = self._load(assets, data_dir, split,
                                           protocol, debug, opts)
        super().__init__(assets, opts, table, detected_pose=detected)
        self.split = split
        self.protocol = protocol

    # -- loading -----------------------------------------------------------

    def _load(self, assets, data_dir, split, protocol, debug, opts):
        annot_path = osp.join(data_dir, "Human36M", "annotations")
        subjects = SUBJECTS[(protocol, split)]
        if debug:
            subjects = subjects[:1]
        sampling = SAMPLING[split]

        images: Dict[int, dict] = {}
        ann_list: List[dict] = []
        cameras, joints3d, smpl_params = {}, {}, {}
        for s in subjects:
            with open(osp.join(annot_path,
                               f"Human36M_subject{s}_data.json")) as f:
                annot = json.load(f)
            for img in annot["images"]:
                images[img["id"]] = img
            ann_list.extend(annot["annotations"])
            with open(osp.join(annot_path,
                               f"Human36M_subject{s}_camera.json")) as f:
                cameras[str(s)] = json.load(f)
            with open(osp.join(annot_path,
                               f"Human36M_subject{s}_joint_3d.json")) as f:
                joints3d[str(s)] = json.load(f)
            with open(osp.join(annot_path,
                               f"Human36M_subject{s}_smpl_param.json")) as f:
                smpl_params[str(s)] = json.load(f)

        rows = []
        skip_img_names = []
        for ann in ann_list:
            img = images[ann["image_id"]]
            if img["frame_idx"] % sampling != 0:
                continue
            s, act, subact, frame = (str(img["subject"]),
                                     str(img["action_idx"]),
                                     str(img["subaction_idx"]),
                                     str(img["frame_idx"]))
            try:
                smpl_param = smpl_params[s][act][subact][frame]
            except KeyError:
                skip_img_names.append(img["file_name"].split("/")[-1])
                continue
            cam = cameras[s][str(img["cam_idx"])]
            r = np.array(cam["R"], np.float32)
            t = np.array(cam["t"], np.float32)
            f = np.array(cam["f"], np.float32)
            c = np.array(cam["c"], np.float32)
            joint_world = np.array(
                joints3d[s][act][subact][frame], np.float32)
            joint_cam = coords.world2cam(joint_world, r, t)
            joint_img = coords.cam2pixel(joint_cam, f, c)
            bbox = coords.process_bbox(
                np.array(ann["bbox"]), opts.input_shape[1] /
                opts.input_shape[0])
            if bbox is None:
                continue
            rows.append(dict(
                img_name=img["file_name"].split("/")[-1],
                pose=np.array(smpl_param["pose"], np.float32).reshape(72),
                shape=np.array(smpl_param["shape"], np.float32).reshape(10),
                trans=np.array(smpl_param["trans"], np.float32).reshape(3),
                cam_r=r, cam_t=t, focal=f, princpt=c,
                joint_cam=joint_cam.astype(np.float32),
                joint_img=joint_img[:, :2].astype(np.float32),
                cam_idx=img["cam_idx"], action_idx=int(act),
            ))
        rows.sort(key=lambda d: d["img_name"])

        n = len(rows)
        table = SmplTable(
            pose=np.stack([r["pose"] for r in rows]) if n else
            np.zeros((0, 72), np.float32),
            shape=np.stack([r["shape"] for r in rows]) if n else
            np.zeros((0, 10), np.float32),
            trans=np.stack([r["trans"] for r in rows]) if n else
            np.zeros((0, 3), np.float32),
            cam_r=np.stack([r["cam_r"] for r in rows]) if n else
            np.zeros((0, 3, 3), np.float32),
            cam_t=np.stack([r["cam_t"] for r in rows]) if n else
            np.zeros((0, 3), np.float32),
            focal=np.stack([r["focal"] for r in rows]) if n else
            np.zeros((0, 2), np.float32),
            princpt=np.stack([r["princpt"] for r in rows]) if n else
            np.zeros((0, 2), np.float32),
            joint_cam_h36m=np.stack([r["joint_cam"] for r in rows]) if n
            else np.zeros((0, 17, 3), np.float32),
            joint_img_h36m=np.stack([r["joint_img"] for r in rows]) if n
            else np.zeros((0, 17, 2), np.float32),
            gender=np.zeros(n, np.int64),   # neutral for all subjects
            meta={
                "cam_idx": np.array([r["cam_idx"] for r in rows], np.int64),
                "action_idx": np.array(
                    [r["action_idx"] for r in rows], np.int64),
            },
        )

        detected = None
        if split == "test" and not opts.use_gt_input:
            detected = self._load_detections(
                osp.join(data_dir, "Human36M",
                         "absnet_output_on_testset.json"),
                [r["img_name"] for r in rows], skip_img_names)
        return table, detected, None

    @staticmethod
    def _load_detections(path, img_names, skip_list):
        """Detected 2D test input, sorted by image name to align with the
        sorted datalist (reference: dataset.py:89-99,448-453)."""
        with open(path) as f:
            data = json.load(f)
        det = []
        for img_path, pose2d in data.items():
            if img_path in skip_list:
                continue
            det.append((img_path, np.array(pose2d, np.float32)))
        det.sort(key=lambda kv: kv[0])
        out = np.stack([p for _, p in det])
        assert len(out) == len(img_names), \
            f"detection count {len(out)} != annotation count {len(img_names)}"
        return out[..., :2].astype(np.float32)

    # -- evaluation --------------------------------------------------------

    def evaluate(self, pred_mesh_mm: np.ndarray, gt_mesh_mm: np.ndarray,
                 verbose: bool = True,
                 all_cameras: bool = False) -> Dict[str, float]:
        """Final H36M evaluation: camera-4 samples only (all_cameras=True
        evaluates every view, the reference's dataset_test_all.py variant);
        H36M-regressed MPJPE / PA-MPJPE on the 14-joint subset (GT joints
        from the dataset annotations), SMPL-joint MPJPE and MPVPE vs the GT
        mesh; per-action breakdown (reference: dataset.py:515-636,
        dataset_test_all.py:23)."""
        from .. import metrics as jm
        import jax.numpy as jnp

        cam_idx = self.table.meta["cam_idx"]
        sel = (np.arange(len(cam_idx)) if all_cameras
               else np.nonzero(cam_idx == 4)[0])
        pm, gm = pred_mesh_mm[sel], gt_mesh_mm[sel]
        jr_smpl = self.assets.j_regressor_smpl
        jr_h36m = self.assets.j_regressor_h36m
        ej = list(self.joint_set.eval_joints)

        pj = np.einsum("jv,bvc->bjc", jr_smpl, pm)
        gj = np.einsum("jv,bvc->bjc", jr_smpl, gm)
        pm0, gm0 = pm - pj[:, :1], gm - gj[:, :1]
        pj0, gj0 = pj - pj[:, :1], gj - gj[:, :1]
        smpl_mpjpe = float(np.sqrt(((pj0 - gj0) ** 2).sum(-1)).mean())
        mpvpe = float(np.sqrt(((pm0 - gm0) ** 2).sum(-1)).mean())

        ph = np.einsum("jv,bvc->bjc", jr_h36m, pm0)
        ph = (ph - ph[:, :1])[:, ej]
        gth = self.table.joint_cam_h36m[sel]
        gth = (gth - gth[:, :1])[:, ej]
        per_joint = np.sqrt(((ph - gth) ** 2).sum(-1))
        mpjpe = float(per_joint.mean())
        aligned = np.asarray(jm.procrustes_align(
            jnp.asarray(ph), jnp.asarray(gth)))
        pa_per_joint = np.sqrt(((aligned - gth) ** 2).sum(-1))
        pa_mpjpe = float(pa_per_joint.mean())

        out = {"mpjpe": mpjpe, "pa_mpjpe": pa_mpjpe,
               "smpl_mpjpe": smpl_mpjpe, "mpvpe": mpvpe}
        actions = self.table.meta["action_idx"][sel] - 2
        if verbose:
            for label, arr in (("MPJPE", per_joint),
                               ("PA-MPJPE", pa_per_joint)):
                line = (f"Protocol {self.protocol} H36M pose error "
                        f"({label}) >> tot: {arr.mean():.2f}\n")
                for a, aname in enumerate(ACTION_NAMES):
                    mask = actions == a
                    if mask.any():
                        line += f"{aname}: {arr[mask].mean():.2f} "
                print(line)
            print(f"SMPL MPJPE: {smpl_mpjpe:.2f}  MPVPE: {mpvpe:.2f}")
        return out

    def evaluate_joint(self, pred_joint_mm: np.ndarray,
                       gt_joint_mm: np.ndarray,
                       verbose: bool = True) -> Dict[str, float]:
        """Stage-1 (GAT lifter) final evaluation: root-aligned MPJPE and
        PA-MPJPE over the 14 eval joints, no camera filter, batched
        Procrustes on device (reference: dataset.py:480-513 evaluate_joint
        — per-sample numpy rigid_align loop there); per-action breakdown
        printed in the same format as `evaluate`."""
        from .. import metrics as jm
        import jax.numpy as jnp

        ej = list(self.joint_set.eval_joints)
        p = (pred_joint_mm - pred_joint_mm[:, :1])[:, ej]
        g = (gt_joint_mm - gt_joint_mm[:, :1])[:, ej]
        per_joint = np.sqrt(((p - g) ** 2).sum(-1))
        aligned = np.asarray(jm.procrustes_align(
            jnp.asarray(p), jnp.asarray(g)))
        pa_per_joint = np.sqrt(((aligned - g) ** 2).sum(-1))
        out = {"mpjpe": float(per_joint.mean()),
               "pa_mpjpe": float(pa_per_joint.mean())}
        if verbose:
            actions = self.table.meta["action_idx"] - 2
            for label, arr in (("MPJPE", per_joint),
                               ("PA-MPJPE", pa_per_joint)):
                line = f"{label} (mm)    >> tot: {arr.mean():.2f}\n"
                for a, aname in enumerate(ACTION_NAMES):
                    mask = actions[:len(arr)] == a
                    if mask.any():
                        line += f"{aname}: {arr[mask].mean():.2f} "
                print(line)
        return out

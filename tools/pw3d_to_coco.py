#!/usr/bin/env python
"""Offline converter: raw 3DPW sequence pickles -> COCO-format JSON.

Capability parity with the reference's standalone `data/3dpw2coco.py`
(225-line script producing `3DPW_latest_{split}.json`): walks the 3DPW
`sequenceFiles/{split}` pickles, emits one image record per frame and one
annotation per (frame, actor) with the smpl_param / bbox / openpose fields
the PW3D reader consumes (gator_tpu/data/pw3d.py).

Usage:
  python tools/pw3d_to_coco.py --pw3d_root /path/to/3DPW --split test \
      --out data/PW3D/data/3DPW_latest_test.json
"""
from __future__ import annotations

import argparse
import glob
import json
import os.path as osp
import pickle

import numpy as np


def bbox_from_pose2d(pose2d: np.ndarray) -> list:
    """Tight bbox (x, y, w, h) from valid 2D joints."""
    valid = pose2d[:, 2] > 0
    pts = pose2d[valid, :2] if valid.any() else pose2d[:, :2]
    x0, y0 = pts.min(axis=0)
    x1, y1 = pts.max(axis=0)
    return [float(x0), float(y0), float(x1 - x0), float(y1 - y0)]


def convert(pw3d_root: str, split: str, out_path: str):
    seq_dir = osp.join(pw3d_root, "sequenceFiles", split)
    images, annotations = [], []
    img_id = 0
    ann_id = 0
    for seq_path in sorted(glob.glob(osp.join(seq_dir, "*.pkl"))):
        with open(seq_path, "rb") as f:
            seq = pickle.load(f, encoding="latin1")
        seq_name = str(seq["sequence"])
        n_frames = len(seq["img_frame_ids"])
        n_actors = len(seq["poses"])
        genders = seq.get("genders", ["neutral"] * n_actors)
        cam_intr = np.asarray(seq["cam_intrinsics"])
        focal = [float(cam_intr[0, 0]), float(cam_intr[1, 1])]
        princpt = [float(cam_intr[0, 2]), float(cam_intr[1, 2])]
        cam_poses = np.asarray(seq["cam_poses"])  # [T, 4, 4] world->cam

        for t in range(n_frames):
            frame_img_id = img_id
            images.append({
                "id": frame_img_id,
                "sequence": seq_name,
                "file_name": f"image_{t:05d}.jpg",
                "width": 1920, "height": 1080,
                "cam_param": {"focal": focal, "princpt": princpt},
            })
            img_id += 1
            for a in range(n_actors):
                campose_valid = np.asarray(
                    seq.get("campose_valid", np.ones((n_actors, n_frames)))
                )[a]
                if not campose_valid[t]:
                    continue
                pose_world = np.asarray(seq["poses"][a][t],
                                        np.float64).reshape(72)
                trans_world = np.asarray(seq["trans"][a][t],
                                         np.float64).reshape(3)
                betas = np.asarray(seq["betas"][a],
                                   np.float64).reshape(-1)[:10]
                # world -> camera: rotate the global orient and transform
                # the translation with the extrinsics of frame t
                ext = cam_poses[t]
                r_cam = ext[:3, :3]
                t_cam = ext[:3, 3]
                import cv2
                root_mat, _ = cv2.Rodrigues(pose_world[:3])
                new_root, _ = cv2.Rodrigues(r_cam @ root_mat)
                pose_cam = pose_world.copy()
                pose_cam[:3] = new_root.reshape(3)
                trans_cam = r_cam @ trans_world + t_cam

                j2d = np.asarray(seq["poses2d"][a][t])  # [3, 18] COCO18
                j2d = j2d.T  # [18, 3]
                annotations.append({
                    "id": ann_id,
                    "image_id": frame_img_id,
                    "person_id": a,
                    "bbox": bbox_from_pose2d(j2d),
                    "smpl_param": {
                        "pose": pose_cam.tolist(),
                        "shape": betas.tolist(),
                        "trans": trans_cam.tolist(),
                        "gender": str(genders[a]),
                    },
                    "openpose_result": j2d.reshape(-1).tolist(),
                })
                ann_id += 1
    with open(out_path, "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)
    print(f"wrote {len(images)} images / {len(annotations)} annotations "
          f"to {out_path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--pw3d_root", required=True)
    p.add_argument("--split", default="test",
                   choices=("train", "validation", "test"))
    p.add_argument("--out", required=True)
    args = p.parse_args()
    convert(args.pw3d_root, args.split, args.out)

"""Evaluation CLI: `python -m gator_tpu.cli.test --cfg <yaml>`.

Mirrors main/test.py (reference: main/test.py:1-33): loads weights
(an orbax checkpoint dir OR a reference .pth.tar, converted on the fly),
runs the eval loop data-parallel over every visible chip with exact
per-sample aggregation, then the dataset's final `evaluate` /
`evaluate_joint` with the full metric suite. `cfg.TEST.vis` dumps every
10th predicted mesh as .obj (reference: data/PW3D/dataset.py:377-381 —
whose `n % 10` condition actually dumps 9 of every 10; sampling every
10th here is the evident intent).
"""
from __future__ import annotations

import argparse
import os
import os.path as osp

import jax
import numpy as np

from ..config import load_config
from ..convert import convert_checkpoint
from ..parallel import make_mesh, replicate
from ..train import TrainState, load_checkpoint, pick_checkpoint, run_eval
from ..vis import save_obj
from .common import Session


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluate GATOR/GAT")
    p.add_argument("--cfg", type=str, required=True)
    p.add_argument("--weights", type=str, default=None,
                   help="orbax checkpoint dir or reference .pth.tar "
                        "(default: cfg.TEST.weight_path)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--vis_dir", type=str, default="./vis_out",
                   help="output dir for cfg.TEST.vis mesh dumps")
    return p.parse_args(argv)


def load_weights(path: str, variables):
    if path.endswith(".pth.tar") or path.endswith(".pth"):
        return convert_checkpoint(path, variables)
    # a concrete orbax payload (best/, final/, or an explicit
    # checkpoint{N}/ — marked by orbax's _CHECKPOINT_METADATA) loads
    # directly; a container dir resolves via pick_checkpoint
    concrete = osp.exists(osp.join(path, "_CHECKPOINT_METADATA"))
    restored = load_checkpoint(
        path if concrete else pick_checkpoint(path, pick_best=True))
    state = restored["state"]
    out = {"params": state["params"]}
    if state.get("batch_stats"):
        out["batch_stats"] = state["batch_stats"]
    return jax.tree_util.tree_map(np.asarray, out)


def main(argv=None):
    args = parse_args(argv)
    cfg = load_config(args.cfg)
    sess = Session(cfg, is_train=False, debug=args.debug,
                   synthetic=args.synthetic)
    variables = sess.init_variables()
    weight_path = args.weights or cfg.TEST.weight_path
    if weight_path:
        variables = load_weights(weight_path, variables)
        print(f"loaded weights from {weight_path}")
    else:
        print("WARNING: evaluating randomly initialized weights")

    tx = sess.make_optimizer()
    _, eval_step = sess.make_steps(tx)
    mesh = make_mesh()
    state = replicate(mesh, TrainState.create(
        {k: jax.tree_util.tree_map(jax.numpy.asarray, v)
         for k, v in variables.items()}, tx))

    if sess.is_gator:
        res = run_eval(eval_step, state, sess.pipeline, mesh=mesh,
                       collect_out=("pred_mesh_mm",),
                       collect_batch=("mesh",))
    else:
        res = run_eval(eval_step, state, sess.pipeline, mesh=mesh,
                       collect_out=("pred_pose_mm",),
                       collect_batch=("joint_cam",))
    if "surface_err" in res:
        print(f"MPVPE: {res['surface_err']:.2f}, "
              f"MPJPE: {res['joint_err']:.2f}")
    else:
        print(f"MPJPE: {res['joint_err']:.2f}")

    # final evaluation with the dataset's full metric suite. The dataset
    # evaluate() methods index their tables by ROW, so predictions must be
    # in dataset row order — which holds only for a single unshuffled
    # test dataset (the reference tester always iterates sequentially).
    ds = sess.datasets[0]
    if cfg.TEST.shuffle or len(sess.datasets) > 1:
        print("skipping the dataset metric suite: predictions are not in "
              "dataset row order (TEST.shuffle or a multi-dataset test "
              "list); the aggregate errors above are exact")
        return {"mpjpe": float(res["joint_err"])}
    if sess.is_gator and "pred_mesh_mm" in res and hasattr(ds, "evaluate"):
        pred = res["pred_mesh_mm"][:len(ds)]
        gt = res["mesh"][:len(ds)] * 1000.0
        if cfg.TEST.vis:
            os.makedirs(args.vis_dir, exist_ok=True)
            for n in range(0, len(pred), 10):
                save_obj(pred[n] / 1000.0, sess.assets.faces,
                         osp.join(args.vis_dir, f"eval_{n:06d}.obj"))
            print(f"dumped {len(range(0, len(pred), 10))} meshes "
                  f"to {args.vis_dir}")
        return ds.evaluate(pred, gt)
    if not sess.is_gator and "pred_pose_mm" in res \
            and hasattr(ds, "evaluate_joint"):
        pred = res["pred_pose_mm"][:len(ds)]
        gt = res["joint_cam"][:len(ds)]
        return ds.evaluate_joint(pred, gt)
    return {"mpjpe": float(res["joint_err"])}


if __name__ == "__main__":
    main()

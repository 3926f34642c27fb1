"""Evaluation CLI: `python -m gator_tpu.cli.test --cfg <yaml>`.

Mirrors main/test.py (reference: main/test.py:1-33): loads weights
(an orbax checkpoint dir OR a reference .pth.tar, converted on the fly),
runs the jitted eval loop, then the dataset's final `evaluate` with the
full metric suite.
"""
from __future__ import annotations

import argparse

import jax
import numpy as np

from ..config import load_config
from ..convert import convert_checkpoint
from ..train import TrainState, load_checkpoint, pick_checkpoint
from .common import Session


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluate GATOR/GAT")
    p.add_argument("--cfg", type=str, required=True)
    p.add_argument("--weights", type=str, default=None,
                   help="orbax checkpoint dir or reference .pth.tar "
                        "(default: cfg.TEST.weight_path)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--debug", action="store_true")
    return p.parse_args(argv)


def load_weights(path: str, variables):
    if path.endswith(".pth.tar") or path.endswith(".pth"):
        return convert_checkpoint(path, variables)
    restored = load_checkpoint(
        pick_checkpoint(path, pick_best=True) if not
        path.rstrip("/").endswith(("best", "final")) else path)
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
    jeval = jax.jit(eval_step)
    state = TrainState.create(
        {k: jax.tree_util.tree_map(jax.numpy.asarray, v)
         for k, v in variables.items()}, tx)

    j_errs, s_errs = [], []
    pred_meshes, gt_meshes = [], []
    for batch in sess.pipeline:
        out = jeval(state, batch)
        j_errs.append(float(out["joint_err"]))
        if "surface_err" in out:
            s_errs.append(float(out["surface_err"]))
            pred_meshes.append(np.asarray(out["pred_mesh_mm"]))
            gt_meshes.append(np.asarray(batch["mesh"]) * 1000.0)
    print(f"MPVPE: {np.mean(s_errs):.2f}, MPJPE: {np.mean(j_errs):.2f}"
          if s_errs else f"MPJPE: {np.mean(j_errs):.2f}")

    # final evaluation with the dataset's full metric suite
    ds = sess.datasets[0]
    if pred_meshes and hasattr(ds, "evaluate"):
        pred = np.concatenate(pred_meshes)[:len(ds)]
        gt = np.concatenate(gt_meshes)[:len(ds)]
        return ds.evaluate(pred, gt)
    return {"mpjpe": float(np.mean(j_errs))}


if __name__ == "__main__":
    main()

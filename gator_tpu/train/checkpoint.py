"""Checkpoint save/resume via orbax.

Mirrors the reference's checkpoint contract — {epoch, model state, optimizer
state, scheduler position, train/test histories}, with `checkpoint{N}` /
`final` / `best` naming (reference: lib/funcs_utils.py:110-127, driven from
main/train.py:44-58) — as an orbax pytree directory per checkpoint.
"""
from __future__ import annotations

import os
import os.path as osp
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


def _checkpointer():
    return ocp.PyTreeCheckpointer()


def save_checkpoint(ckpt_dir: str, state: TrainState, epoch: int,
                    train_log=None, test_log=None, is_best: bool = False,
                    is_final: bool = False, scheduler_state=None) -> str:
    """Write checkpoint{epoch} (or final); also best/ on improvement.
    scheduler_state: optional plateau-controller dict (mirrors the
    reference persisting scheduler_state_dict, lib/funcs_utils.py:110-118).
    """
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {
        "epoch": np.asarray(epoch),
        "state": {
            "step": jax.device_get(state.step),
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "opt_state": jax.device_get(state.opt_state),
        },
    }
    if scheduler_state:
        payload["scheduler"] = {k: np.asarray(v)
                                for k, v in scheduler_state.items()}
    # orbax rejects zero-size arrays; only persist non-empty histories
    if train_log:
        payload["train_log"] = np.asarray(train_log, dtype=np.float64)
    payload["test_log"] = {
        k: np.asarray(v, dtype=np.float64)
        for k, v in (test_log or {}).items() if len(v)}
    name = "final" if is_final else f"checkpoint{epoch}"
    path = osp.abspath(osp.join(ckpt_dir, name))
    cp = _checkpointer()
    cp.save(path, payload, force=True)
    if is_best:
        cp.save(osp.abspath(osp.join(ckpt_dir, "best")), payload, force=True)
    return path


def load_checkpoint(path: str,
                    target_state: Optional[TrainState] = None
                    ) -> Dict[str, Any]:
    """Restore a checkpoint. With a target TrainState, the `state` entry is
    rebuilt as a TrainState whose pytree structure (incl. optimizer state
    classes) matches the target."""
    cp = _checkpointer()
    restored = cp.restore(osp.abspath(path))
    if target_state is not None:
        raw = restored["state"]

        def rebuild(target_tree, raw_tree):
            leaves = jax.tree_util.tree_leaves(raw_tree)
            treedef = jax.tree_util.tree_structure(target_tree)
            return jax.tree_util.tree_unflatten(treedef, leaves)

        restored["state"] = target_state.replace(
            step=jax.numpy.asarray(raw["step"]),
            params=rebuild(target_state.params, raw["params"]),
            batch_stats=rebuild(target_state.batch_stats,
                                raw["batch_stats"]),
            opt_state=rebuild(target_state.opt_state, raw["opt_state"]),
        )
    return restored


def pick_checkpoint(ckpt_dir: str, pick_best: bool = False) -> str:
    """Resolve best/final/latest like the reference's load path
    (reference: base.py:69, GAT.py:128-131 picks best.pth.tar)."""
    if pick_best and osp.isdir(osp.join(ckpt_dir, "best")):
        return osp.join(ckpt_dir, "best")
    nums = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("checkpoint"):
            try:
                nums.append(int(name[len("checkpoint"):]))
            except ValueError:
                pass
    final = osp.join(ckpt_dir, "final")
    if osp.isdir(final):
        if not nums:
            return final
        # an extended run (--resume_training with a larger --epochs) that
        # was preempted leaves checkpoint{N} dirs NEWER than final/ —
        # resume from whichever is further along, not blindly from final
        fin_epoch = int(_checkpointer().restore(
            osp.abspath(final))["epoch"])
        if fin_epoch >= max(nums):
            return final
    if not nums:
        raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    return osp.join(ckpt_dir, f"checkpoint{max(nums)}")

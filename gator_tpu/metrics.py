"""Evaluation metrics as batched jitted kernels.

The reference computes Procrustes alignment per sample in numpy on the host
(reference: lib/coord_utils.py:127-149, called in a Python loop at
Human36M/dataset.py:503 / PW3D/dataset.py:384); here PA-MPJPE runs as a
batched SVD on device.
All errors are millimeters when inputs are millimeters (the harness
multiplies meshes by 1000 before calling, like reference base.py:219).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def root_align(x, root_idx: int = 0):
    """Subtract the root joint/vertex row: [B, N, 3] -> [B, N, 3]."""
    return x - x[:, root_idx:root_idx + 1]


def mpjpe(pred, gt, eval_joints: Optional[Sequence[int]] = None,
          root_idx: int = 0, align: bool = True,
          per_sample: bool = False):
    """Mean per-joint position error; root-aligned, joint-subset selected
    (reference: Human36M/dataset.py:455-478). per_sample=True returns the
    [B] per-sample means so the caller can aggregate exactly over ragged
    batches (reference accumulates running sums, lib/core/base.py:224-230).
    """
    if align:
        pred = root_align(pred, root_idx)
        gt = root_align(gt, root_idx)
    if eval_joints is not None:
        idx = jnp.asarray(list(eval_joints))
        pred = pred[:, idx]
        gt = gt[:, idx]
    err = jnp.sqrt(((pred - gt) ** 2).sum(-1)).mean(-1)
    return err if per_sample else err.mean()


def per_sample_joint_error(pred, gt):
    """[B, N, 3] -> [B, N] Euclidean errors (no alignment)."""
    return jnp.sqrt(((pred - gt) ** 2).sum(-1))


def procrustes_align(pred, gt):
    """Batched similarity Procrustes: align pred -> gt.

    Math parity with the reference's per-sample numpy version
    (reference: lib/coord_utils.py:127-149): H = (A-cA)^T (B-cB)/n,
    R = V U^T with a det sign fix on the last right-singular vector,
    c = sum(s)/var(A), t = -cR cA + cB.
    pred/gt: [B, N, 3]; returns aligned pred [B, N, 3].
    """
    n = pred.shape[1]
    mu_a = pred.mean(axis=1, keepdims=True)
    mu_b = gt.mean(axis=1, keepdims=True)
    a0 = pred - mu_a
    b0 = gt - mu_b
    h = jnp.einsum("bni,bnj->bij", a0, b0,
                   precision=jax.lax.Precision.HIGHEST) / n
    u, s, vh = jnp.linalg.svd(h)
    # det(R) where R = V U^T; flip the last singular pair when negative
    det = jnp.linalg.det(jnp.einsum("bji,bkj->bik", vh, u,
                                    precision=jax.lax.Precision.HIGHEST))
    sign = jnp.where(det < 0, -1.0, 1.0)
    s_fixed = s.at[:, -1].multiply(sign)
    vh_fixed = vh.at[:, -1, :].multiply(sign[:, None])
    rot = jnp.einsum("bji,bkj->bik", vh_fixed, u,       # V U^T
                     precision=jax.lax.Precision.HIGHEST)
    var_a = a0.var(axis=1).sum(axis=-1)                 # biased var, summed
    scale = s_fixed.sum(axis=-1) / var_a
    aligned = (scale[:, None, None]
               * jnp.einsum("bij,bnj->bni", rot, pred,
                            precision=jax.lax.Precision.HIGHEST))
    t = mu_b - scale[:, None, None] * jnp.einsum(
        "bij,bnj->bni", rot, mu_a, precision=jax.lax.Precision.HIGHEST)
    return aligned + t


def pa_mpjpe(pred, gt, eval_joints: Optional[Sequence[int]] = None,
             root_idx: int = 0, align: bool = True):
    """Procrustes-aligned MPJPE (root-align + subset first, as the reference
    does at Human36M/dataset.py:496-504)."""
    if align:
        pred = root_align(pred, root_idx)
        gt = root_align(gt, root_idx)
    if eval_joints is not None:
        idx = jnp.asarray(list(eval_joints))
        pred = pred[:, idx]
        gt = gt[:, idx]
    aligned = procrustes_align(pred, gt)
    return jnp.sqrt(((aligned - gt) ** 2).sum(-1)).mean()


def mpvpe(pred_mesh, gt_mesh, pred_root, gt_root,
          per_sample: bool = False):
    """Mesh vertex error after root-joint alignment; roots are [B, 1, 3]
    (reference: compute_both_err, Human36M/dataset.py:466-478)."""
    pred = pred_mesh - pred_root
    gt = gt_mesh - gt_root
    err = jnp.sqrt(((pred - gt) ** 2).sum(-1)).mean(-1)
    return err if per_sample else err.mean()


def compute_errors(gt3ds, preds):
    """Per-sample (MPJPE, PA-MPJPE) over LSP-14-style joints after pelvis
    (hip-midpoint) alignment — the reference's HMR-lineage evaluation
    helper (reference: lib/eval_utils.py:311-334), batched on device.
    gt3ds/preds: [B, 14, 3]; returns (errors [B], pa_errors [B])."""
    def align(x):
        pelvis = (x[:, 2:3] + x[:, 3:4]) / 2.0
        return x - pelvis

    gt = align(gt3ds)
    pred = align(preds)
    errors = jnp.sqrt(((gt - pred) ** 2).sum(-1)).mean(-1)
    aligned = procrustes_align(pred, gt)
    pa_errors = jnp.sqrt(((gt - aligned) ** 2).sum(-1)).mean(-1)
    return errors, pa_errors


def accel_error(joints_gt, joints_pred):
    """Acceleration error over a [N, J, 3] sequence
    (reference: lib/coord_utils.py:194-222)."""
    accel_gt = joints_gt[:-2] - 2 * joints_gt[1:-1] + joints_gt[2:]
    accel_pred = joints_pred[:-2] - 2 * joints_pred[1:-1] + joints_pred[2:]
    return jnp.linalg.norm(accel_pred - accel_gt, axis=2).mean(axis=1)

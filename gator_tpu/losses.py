"""Training losses (reference: lib/core/loss.py) as pure jitted functions.

The face-based mesh losses (normal / edge / Laplacian) gather the 13776-face
index triplets once as constants and run as batched gathers + elementwise
ops — XLA fuses them with the surrounding graph; no per-batch `.cuda()`
index uploads like the reference (loss.py:67,96).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


def _l2_normalize(x, axis=-1, eps=1e-12):
    """torch F.normalize semantics: x / max(||x||, eps)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def coord_l1_loss(pred, target, valid=None):
    """Validity-masked L1, mean over ALL elements (masked entries contribute
    zeros to the mean — reference: loss.py:10-23 applies the mask to both
    operands and keeps reduction='mean')."""
    if valid is not None:
        pred = pred * valid
        target = target * valid
    return jnp.abs(pred - target).mean()


def normal_vector_loss(coord_out, coord_gt, faces: np.ndarray):
    """Cosine between predicted edges and GT face normals
    (reference: loss.py:61-87)."""
    f0, f1, f2 = faces[:, 0], faces[:, 1], faces[:, 2]
    v1_out = _l2_normalize(coord_out[:, f1] - coord_out[:, f0])
    v2_out = _l2_normalize(coord_out[:, f2] - coord_out[:, f0])
    v3_out = _l2_normalize(coord_out[:, f2] - coord_out[:, f1])

    v1_gt = _l2_normalize(coord_gt[:, f1] - coord_gt[:, f0])
    v2_gt = _l2_normalize(coord_gt[:, f2] - coord_gt[:, f0])
    normal_gt = _l2_normalize(jnp.cross(v1_gt, v2_gt))

    cos1 = jnp.abs((v1_out * normal_gt).sum(-1))
    cos2 = jnp.abs((v2_out * normal_gt).sum(-1))
    cos3 = jnp.abs((v3_out * normal_gt).sum(-1))
    return jnp.concatenate([cos1, cos2, cos3], axis=1).mean()


def edge_length_loss(coord_out, coord_gt, faces: np.ndarray):
    """|edge length difference| over the three face edges
    (reference: loss.py:90-113)."""
    f0, f1, f2 = faces[:, 0], faces[:, 1], faces[:, 2]

    def elen(c, a, b):
        return jnp.sqrt(((c[:, a] - c[:, b]) ** 2).sum(-1))

    d1 = jnp.abs(elen(coord_out, f0, f1) - elen(coord_gt, f0, f1))
    d2 = jnp.abs(elen(coord_out, f0, f2) - elen(coord_gt, f0, f2))
    d3 = jnp.abs(elen(coord_out, f1, f2) - elen(coord_gt, f1, f2))
    return jnp.concatenate([d1, d2, d3], axis=1).mean()


def build_laplacian(faces: np.ndarray, num_verts: int) -> np.ndarray:
    """Uniform graph Laplacian, row-normalized by degree (defined-but-unused
    in the reference — kept for capability parity; reference: loss.py:26-47).
    """
    lap = np.zeros((num_verts, num_verts), np.float32)
    for a, b in ((0, 1), (1, 0), (1, 2), (2, 1), (2, 0), (0, 2)):
        lap[faces[:, a], faces[:, b]] = -1
    np.fill_diagonal(lap, -lap.sum(1))
    lap /= (np.diag(lap)[:, None] + 1e-8)
    return lap


def laplacian_loss(coord_out, laplacian, average=False):
    x = jnp.einsum("vw,bwc->bvc", jnp.asarray(laplacian), coord_out)
    x = (x ** 2).sum(-1)
    if average:
        return x.sum() / coord_out.shape[0]
    return x.mean()


class LossWeights(NamedTuple):
    """Loss weighting (reference: config defaults lib/core/config.py:58-60;
    assembly lib/core/base.py:139-148)."""

    normal: float = 0.1
    edge: float = 20.0
    joint: float = 1e-3


class GatorLossOut(NamedTuple):
    total: jnp.ndarray
    vertex: jnp.ndarray
    normal: jnp.ndarray
    edge: jnp.ndarray
    reg_joint: jnp.ndarray
    lift_joint: jnp.ndarray


def gator_loss(
    pred_mesh, pred_reg_pose, pred_lift_pose,
    gt_mesh, gt_reg_pose, gt_lift_pose,
    mesh_valid, reg_valid, lift_valid,
    faces: np.ndarray, weights: LossWeights,
    edge_enabled,                      # scalar 0/1 (epoch-gated edge term)
) -> GatorLossOut:
    """Stage-2 loss: vertex L1 + normal + (gated) edge + two joint L1s
    (reference: lib/core/base.py:139-148; the edge term activates after
    cfg.TRAIN.edge_loss_start epochs)."""
    l_vert = coord_l1_loss(pred_mesh, gt_mesh, mesh_valid)
    l_norm = weights.normal * normal_vector_loss(pred_mesh, gt_mesh, faces)
    l_edge = (weights.edge * edge_enabled
              * edge_length_loss(pred_mesh, gt_mesh, faces))
    l_reg = weights.joint * coord_l1_loss(
        pred_reg_pose, gt_reg_pose, reg_valid)
    l_lift = weights.joint * coord_l1_loss(
        pred_lift_pose, gt_lift_pose, lift_valid)
    total = l_vert + l_norm + l_edge + l_reg + l_lift
    return GatorLossOut(total, l_vert, l_norm, l_edge, l_reg, l_lift)

"""Batched SMPL layer as a pure JAX function.

Replaces the reference's per-sample CPU loop (sequential Python kinematic
chain inside DataLoader workers — reference:
smplpytorch/smplpytorch/pytorch/smpl_layer.py:65-158, hot spot per
SURVEY.md §3) with one vectorized, jit-compiled program:

  * axis-angle -> rotmat for all 24 joints at once (quaternion Rodrigues);
  * shape/pose blendshapes as two einsums (MXU);
  * the kinematic chain unrolled over the static 24-joint topology
    (parents precede children), all batch elements in parallel;
  * linear blend skinning as a single [V,24] x [B,24,12] matmul.

Runs equally on TPU (GT-mesh synthesis on device, inference) and CPU.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..assets.smpl_assets import SmplModel
from .rotations import axis_angle_to_rotmat, rotmat_flat_minus_id


@struct.dataclass
class SmplParams:
    """Device-resident SMPL constants. A pytree: array fields are leaves,
    the kintree parents are static metadata (safe to pass through jit)."""

    v_template: jnp.ndarray    # [V, 3]
    shapedirs: jnp.ndarray     # [V, 3, 10]
    posedirs: jnp.ndarray      # [V, 3, 207]
    j_regressor: jnp.ndarray   # [24, V]
    weights: jnp.ndarray       # [V, 24]
    parents: tuple = struct.field(pytree_node=False, default=())

    @classmethod
    def from_model(cls, model: SmplModel,
                   dtype=jnp.float32) -> "SmplParams":
        return cls(
            v_template=jnp.asarray(model.v_template, dtype),
            shapedirs=jnp.asarray(model.shapedirs, dtype),
            posedirs=jnp.asarray(model.posedirs, dtype),
            j_regressor=jnp.asarray(model.j_regressor, dtype),
            weights=jnp.asarray(model.weights, dtype),
            parents=tuple(int(p) for p in model.kintree_parents),
        )


def smpl_forward(
    params: SmplParams,
    pose_axisang: jnp.ndarray,            # [B, 72]
    betas: jnp.ndarray,                   # [B, 10]
    trans: Optional[jnp.ndarray] = None,  # [B, 3]
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """SMPL function: (pose, shape[, trans]) -> (verts [B,V,3], joints [B,24,3]).

    Math follows the standard SMPL formulation, matching the reference
    layer's ordering (root-rotation-first kinematics, rest-joint translation
    subtraction, homogeneous LBS —
    reference: smplpytorch/smplpytorch/pytorch/smpl_layer.py:76-158).
    Outputs are in meters.
    """
    b = pose_axisang.shape[0]
    num_joints = len(params.parents)
    # GT-mesh parity needs true-f32 accumulation even on TPU, where the
    # default matmul precision is bf16 (costs ~nothing at these sizes)
    einsum = functools.partial(
        jnp.einsum, precision=jax.lax.Precision.HIGHEST)

    rotmats = axis_angle_to_rotmat(
        pose_axisang.reshape(b, num_joints, 3))      # [B, 24, 3, 3]
    pose_feature = rotmat_flat_minus_id(rotmats[:, 1:])  # [B, 207]

    # blendshapes (einsum -> MXU)
    v_shaped = params.v_template + einsum(
        "vcs,bs->bvc", params.shapedirs, betas)
    joints_rest = einsum("jv,bvc->bjc", params.j_regressor, v_shaped)
    v_posed = v_shaped + einsum(
        "vcp,bp->bvc", params.posedirs, pose_feature)

    # kinematic chain: global transforms, joints grouped by tree DEPTH.
    # A parent always sits exactly one level above its child, so each
    # level composes against the previous level's [B, n_l, 3, 3] tensor
    # in one batched einsum — 2 einsums per level (~8 levels) instead of
    # 2 per joint (46 tiny HIGHEST matmuls): the chain is dispatch-bound
    # on TPU at 3x3 sizes. Per-joint math (and f32 contraction order) is
    # identical to the sequential unroll.
    depth = [0] * num_joints
    for i in range(1, num_joints):
        depth[i] = depth[params.parents[i]] + 1
    levels = [np.asarray([i for i in range(num_joints) if depth[i] == d])
              for d in range(max(depth) + 1)]
    pos = {int(j): k for k, j in enumerate(levels[0])}
    rot_lv = [rotmats[:, levels[0]]]         # level 0 = root
    loc_lv = [joints_rest[:, levels[0]]]
    for ids in levels[1:]:
        par = np.asarray([params.parents[i] for i in ids])
        ppos = np.asarray([pos[int(p)] for p in par])
        prev_r = rot_lv[-1][:, ppos]         # [B, n_l, 3, 3]
        prev_l = loc_lv[-1][:, ppos]
        off = joints_rest[:, ids] - joints_rest[:, par]
        rot_lv.append(einsum("bjxy,bjyz->bjxz", prev_r, rotmats[:, ids]))
        loc_lv.append(prev_l + einsum("bjxy,bjy->bjx", prev_r, off))
        pos = {int(j): k for k, j in enumerate(ids)}
    inv = np.argsort(np.concatenate(levels))
    rot_global = jnp.concatenate(rot_lv, axis=1)[:, inv]  # [B, 24, 3, 3]
    joints = jnp.concatenate(loc_lv, axis=1)[:, inv]      # [B, 24, 3]

    # relative-to-rest transforms: t_rel = t_global - R_global @ j_rest
    t_rel = joints - einsum("bjxy,bjy->bjx", rot_global, joints_rest)
    a_rel = jnp.concatenate(
        [rot_global, t_rel[..., None]], axis=-1)  # [B, 24, 3, 4]

    # LBS: one matmul [V,24] @ [B,24,12] then apply the per-vertex 3x4
    t_vert = einsum(
        "vj,bjk->bvk", params.weights,
        a_rel.reshape(b, num_joints, 12)).reshape(b, -1, 3, 4)
    verts = (einsum("bvxy,bvy->bvx", t_vert[..., :3], v_posed)
             + t_vert[..., 3])

    if trans is not None:
        verts = verts + trans[:, None, :]
        joints = joints + trans[:, None, :]
    return verts, joints


def make_smpl_fn(model: SmplModel, dtype=jnp.float32):
    """Convenience: SmplModel -> jittable (pose, betas[, trans]) closure."""
    params = SmplParams.from_model(model, dtype)

    def fn(pose_axisang, betas, trans=None):
        return smpl_forward(params, pose_axisang, betas, trans)

    return fn


def substitute_mean_betas(betas: np.ndarray,
                          mean_betas: np.ndarray) -> np.ndarray:
    """Reference semantics: an all-zero beta row means 'use the model's mean
    betas' (reference: smpl_layer.py:87-95; datasets zero out |beta|>3 rows,
    Human36M/dataset.py:265)."""
    zero = np.all(betas == 0, axis=-1, keepdims=True)
    return np.where(zero, mean_betas[None], betas)

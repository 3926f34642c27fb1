"""MANO hand model as a pure JAX function.

Capability parity with the vendored manopth layer + wrapper
(reference: manopth/manopth/manolayer.py:12-273, lib/_mano.py:10-33):
16-joint kinematic hand, optional PCA pose space
(full_pose = root + hands_mean + coeffs @ components), same
blendshape/LBS machinery as SMPL, 21-joint regressor with fingertip
one-hots reordered to the Wrist->Thumb..Pinky convention. The rot6d /
SVD-rotation-projection utilities of manopth live in
`gator_tpu.bodymodel.rotations6d`.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .rotations import axis_angle_to_rotmat, rotmat_flat_minus_id

MANO_VERTEX_NUM = 778
MANO_JOINT_NUM = 16
# kintree parents for the 16 MANO joints (root + 3 per finger)
MANO_PARENTS = (0, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14)
# fingertip vertices (right hand): thumb, index, middle, ring, pinky
FINGERTIP_VERTEX = (745, 317, 445, 556, 673)
# reorder [16 joints + 5 tips] -> Wrist, Thumb1..4, Index1..4, ...
# (reference: lib/_mano.py:29)
JOINT_REORDER = (0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18, 10, 11, 12,
                 19, 7, 8, 9, 20)

MANO_JOINTS_NAME = (
    "Wrist", "Thumb_1", "Thumb_2", "Thumb_3", "Thumb_4", "Index_1",
    "Index_2", "Index_3", "Index_4", "Middle_1", "Middle_2", "Middle_3",
    "Middle_4", "Ring_1", "Ring_2", "Ring_3", "Ring_4", "Pinky_1",
    "Pinky_2", "Pinky_3", "Pinky_4")
MANO_SKELETON = ((0, 1), (0, 5), (0, 9), (0, 13), (0, 17), (1, 2), (2, 3),
                 (3, 4), (5, 6), (6, 7), (7, 8), (9, 10), (10, 11),
                 (11, 12), (13, 14), (14, 15), (15, 16), (17, 18),
                 (18, 19), (19, 20))


@dataclasses.dataclass(frozen=True)
class ManoModel:
    """Plain-numpy MANO parameters (load from pkl via
    assets.smpl_assets-style decoding, or synthesize for tests)."""

    v_template: np.ndarray        # [778, 3]
    shapedirs: np.ndarray         # [778, 3, 10]
    posedirs: np.ndarray          # [778, 3, 135]
    j_regressor: np.ndarray       # [16, 778]
    weights: np.ndarray           # [778, 16]
    faces: np.ndarray             # [F, 3]
    hands_components: np.ndarray  # [45, 45] PCA basis
    hands_mean: np.ndarray        # [45]
    parents: tuple = MANO_PARENTS

    def extended_regressor(self) -> np.ndarray:
        """[21, 778] regressor with fingertips, reordered
        (reference: lib/_mano.py:22-29)."""
        tips = np.zeros((5, self.v_template.shape[0]), np.float32)
        for i, vid in enumerate(FINGERTIP_VERTEX):
            tips[i, vid % self.v_template.shape[0]] = 1.0
        reg = np.concatenate([self.j_regressor.astype(np.float32), tips])
        return reg[list(JOINT_REORDER)]


@struct.dataclass
class ManoParams:
    v_template: jnp.ndarray
    shapedirs: jnp.ndarray
    posedirs: jnp.ndarray
    j_regressor: jnp.ndarray
    weights: jnp.ndarray
    selected_comps: jnp.ndarray   # [ncomps, 45]
    hands_mean: jnp.ndarray       # [45]
    parents: tuple = struct.field(pytree_node=False, default=MANO_PARENTS)

    @classmethod
    def from_model(cls, model: ManoModel, ncomps: int = 45,
                   use_pca: bool = True, flat_hand_mean: bool = False,
                   dtype=jnp.float32) -> "ManoParams":
        comps = model.hands_components[:ncomps] if use_pca else \
            np.eye(45, dtype=np.float32)
        mean = (np.zeros(45, np.float32) if flat_hand_mean
                else model.hands_mean)
        return cls(
            v_template=jnp.asarray(model.v_template, dtype),
            shapedirs=jnp.asarray(model.shapedirs, dtype),
            posedirs=jnp.asarray(model.posedirs, dtype),
            j_regressor=jnp.asarray(model.j_regressor, dtype),
            weights=jnp.asarray(model.weights, dtype),
            selected_comps=jnp.asarray(comps, dtype),
            hands_mean=jnp.asarray(mean, dtype),
            parents=tuple(model.parents),
        )


def mano_forward(params: ManoParams, pose_coeffs: jnp.ndarray,
                 betas: jnp.ndarray,
                 trans: Optional[jnp.ndarray] = None):
    """(pose [B, 3+ncomps], betas [B, 10][, trans [B, 3]]) ->
    (verts [B, 778, 3], joints [B, 16, 3]) in meters.

    full hand pose = hands_mean + coeffs @ selected_components; root
    rotation is the first 3 entries (reference: manolayer.py:109-155).
    """
    b = pose_coeffs.shape[0]
    root = pose_coeffs[:, :3]
    hand_pose = params.hands_mean + jnp.einsum(
        "bc,cp->bp", pose_coeffs[:, 3:], params.selected_comps,
        precision=jax.lax.Precision.HIGHEST)
    full_pose = jnp.concatenate([root, hand_pose], axis=1)  # [B, 48]

    n = len(params.parents)
    rotmats = axis_angle_to_rotmat(full_pose.reshape(b, n, 3))
    pose_feature = rotmat_flat_minus_id(rotmats[:, 1:])     # [B, 135]

    v_shaped = params.v_template + jnp.einsum(
        "vcs,bs->bvc", params.shapedirs, betas,
        precision=jax.lax.Precision.HIGHEST)
    joints_rest = jnp.einsum("jv,bvc->bjc", params.j_regressor, v_shaped,
        precision=jax.lax.Precision.HIGHEST)
    v_posed = v_shaped + jnp.einsum(
        "vcp,bp->bvc", params.posedirs, pose_feature,
        precision=jax.lax.Precision.HIGHEST)

    rots, locs = [rotmats[:, 0]], [joints_rest[:, 0]]
    for i in range(1, n):
        p = params.parents[i]
        off = joints_rest[:, i] - joints_rest[:, p]
        rots.append(jnp.einsum("bxy,byz->bxz", rots[p], rotmats[:, i],
        precision=jax.lax.Precision.HIGHEST))
        locs.append(locs[p] + jnp.einsum("bxy,by->bx", rots[p], off,
        precision=jax.lax.Precision.HIGHEST))
    rot_g = jnp.stack(rots, 1)
    joints = jnp.stack(locs, 1)
    t_rel = joints - jnp.einsum("bjxy,bjy->bjx", rot_g, joints_rest,
        precision=jax.lax.Precision.HIGHEST)
    a_rel = jnp.concatenate([rot_g, t_rel[..., None]], -1)
    t_vert = jnp.einsum("vj,bjk->bvk", params.weights,
                        a_rel.reshape(b, n, 12),
        precision=jax.lax.Precision.HIGHEST).reshape(b, -1, 3, 4)
    verts = jnp.einsum("bvxy,bvy->bvx", t_vert[..., :3], v_posed,
        precision=jax.lax.Precision.HIGHEST) \
        + t_vert[..., 3]
    if trans is not None:
        verts = verts + trans[:, None]
        joints = joints + trans[:, None]
    return verts, joints


def synthetic_mano(seed: int = 0) -> ManoModel:
    """Deterministic MANO-like model for tests (not the licensed hand)."""
    rng = np.random.default_rng(seed)
    # rest joints: wrist at origin, 5 fingers x 3 joints
    joints = [np.zeros(3, np.float32)]
    for f in range(5):
        base = np.array([0.02 + 0.018 * f, 0.09, 0.0], np.float32)
        d = np.array([0.005 * (f - 2), 0.028, 0.0], np.float32)
        for k in range(3):
            joints.append(base + (k + 1) * d)
    joints = np.stack(joints)
    parents = np.asarray(MANO_PARENTS)
    bone = rng.integers(1, MANO_JOINT_NUM, MANO_VERTEX_NUM)
    t = rng.uniform(0, 1, (MANO_VERTEX_NUM, 1)).astype(np.float32)
    v = (joints[parents[bone]] + t * (joints[bone] - joints[parents[bone]])
         + rng.normal(0, 0.008, (MANO_VERTEX_NUM, 3))).astype(np.float32)
    d2 = ((v[:, None] - joints[None]) ** 2).sum(-1)
    w = 1.0 / (d2 + 1e-4)
    thr = np.sort(w, 1)[:, -4][:, None]
    w = np.where(w >= thr, w, 0)
    weights = (w / w.sum(1, keepdims=True)).astype(np.float32)
    jr = 1.0 / (d2.T + 1e-4)
    thr = np.sort(jr, 1)[:, -8][:, None]
    jr = np.where(jr >= thr, jr, 0)
    j_regressor = (jr / jr.sum(1, keepdims=True)).astype(np.float32)
    faces = rng.integers(0, MANO_VERTEX_NUM, (1538, 3)).astype(np.int32)
    faces[:, 1] = (faces[:, 0] + 1) % MANO_VERTEX_NUM
    faces[:, 2] = (faces[:, 0] + 2) % MANO_VERTEX_NUM
    comps = np.linalg.qr(rng.normal(size=(45, 45)))[0].astype(np.float32)
    return ManoModel(
        v_template=v,
        shapedirs=rng.normal(0, .005, (MANO_VERTEX_NUM, 3, 10)).astype(
            np.float32),
        posedirs=rng.normal(0, .0005, (MANO_VERTEX_NUM, 3, 135)).astype(
            np.float32),
        j_regressor=j_regressor,
        weights=weights,
        faces=faces,
        hands_components=comps,
        hands_mean=rng.normal(0, 0.1, 45).astype(np.float32),
    )


def load_mano_pkl(path: str) -> ManoModel:
    """Decode a MANO_RIGHT/LEFT.pkl into a ManoModel (chumpy-free, same
    unpickler as the SMPL loader)."""
    import io
    from ..assets.smpl_assets import _SmplUnpickler, _to_array

    with open(path, "rb") as f:
        raw = _SmplUnpickler(io.BytesIO(f.read()),
                             encoding="latin1").load()
    data = {k: _to_array(v) for k, v in raw.items()}
    parents = tuple(int(p) for p in np.asarray(data["kintree_table"])[0])
    parents = (0,) + parents[1:]
    return ManoModel(
        v_template=np.asarray(data["v_template"], np.float32),
        shapedirs=np.asarray(data["shapedirs"], np.float32)[..., :10],
        posedirs=np.asarray(data["posedirs"], np.float32),
        j_regressor=np.asarray(data["J_regressor"], np.float32),
        weights=np.asarray(data["weights"], np.float32),
        faces=np.asarray(data["f"], np.int32),
        hands_components=np.asarray(data["hands_components"], np.float32),
        hands_mean=np.asarray(data["hands_mean"], np.float32),
        parents=parents,
    )

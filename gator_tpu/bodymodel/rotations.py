"""Rotation utilities: batched axis-angle -> rotation matrix via quaternions.

Math parity with the reference's quaternion Rodrigues
(reference: smplpytorch/smplpytorch/pytorch/rodrigues_layer.py:13-52),
including its `norm(v + 1e-8)` regularization, so converted checkpoints and
GT meshes match bit-for-bit at f32.
"""
from __future__ import annotations

import jax.numpy as jnp


def quat_to_rotmat(quat: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (w, x, y, z) quaternions -> [..., 3, 3] rotation matrices."""
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = (quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3])
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    rot = jnp.stack([
        w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
        2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
        2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
    ], axis=-1)
    return rot.reshape(rot.shape[:-1] + (3, 3))


def axis_angle_to_rotmat(axisang: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] axis-angle vectors -> [..., 3, 3] rotation matrices.

    Uses the same quaternion construction (half-angle cos/sin) and the same
    +1e-8 pre-norm regularizer as the reference so zero rotations behave
    identically.
    """
    angle = jnp.linalg.norm(axisang + 1e-8, axis=-1, keepdims=True)
    axis = axisang / angle
    half = angle * 0.5
    quat = jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)
    return quat_to_rotmat(quat)


def rotmat_to_axis_angle(rot: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] rotation matrices -> [..., 3] axis-angle vectors.

    Via quaternion extraction (Shepperd's method restricted to the
    trace-positive branch with clamping — adequate for camera/root poses,
    which stay away from the angle-pi singularity). Used to re-encode the
    camera-rotated SMPL root pose (the reference does this per sample with
    transforms3d on the host — Human36M/dataset.py:268-274)."""
    t = rot[..., 0, 0] + rot[..., 1, 1] + rot[..., 2, 2]
    w = 0.5 * jnp.sqrt(jnp.maximum(1.0 + t, 1e-12))
    x = (rot[..., 2, 1] - rot[..., 1, 2]) / (4 * w)
    y = (rot[..., 0, 2] - rot[..., 2, 0]) / (4 * w)
    z = (rot[..., 1, 0] - rot[..., 0, 1]) / (4 * w)
    xyz = jnp.stack([x, y, z], axis=-1)
    norm = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(norm[..., 0], w)
    axis = xyz / jnp.maximum(norm, 1e-12)
    return axis * angle[..., None]


def rotmat_flat_minus_id(rotmats: jnp.ndarray) -> jnp.ndarray:
    """[..., J, 3, 3] -> [..., J*9] flattened with identity subtracted
    (the SMPL pose-blendshape feature; reference: tensutils.py:41-48)."""
    eye = jnp.eye(3, dtype=rotmats.dtype)
    flat = (rotmats - eye).reshape(rotmats.shape[:-3] + (-1,))
    return flat

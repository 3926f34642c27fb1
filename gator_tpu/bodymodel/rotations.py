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


def rotmat_flat_minus_id(rotmats: jnp.ndarray) -> jnp.ndarray:
    """[..., J, 3, 3] -> [..., J*9] flattened with identity subtracted
    (the SMPL pose-blendshape feature; reference: tensutils.py:41-48)."""
    eye = jnp.eye(3, dtype=rotmats.dtype)
    flat = (rotmats - eye).reshape(rotmats.shape[:-3] + (-1,))
    return flat

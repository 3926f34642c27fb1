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


def rotmat_to_quat(rot: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 4] (w, x, y, z), branch-complete Shepperd
    extraction: the largest of {trace, r00, r11, r22} selects the branch,
    so the angle-pi neighborhood (trace -> -1, where the trace-only branch
    loses all precision) is exact. Camera-rotated H36M root poses routinely
    sit near pi (subject facing away from the camera)."""
    r00, r11, r22 = rot[..., 0, 0], rot[..., 1, 1], rot[..., 2, 2]
    r01, r02 = rot[..., 0, 1], rot[..., 0, 2]
    r10, r12 = rot[..., 1, 0], rot[..., 1, 2]
    r20, r21 = rot[..., 2, 0], rot[..., 2, 1]
    t = r00 + r11 + r22

    def _clamped_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-12))

    s0 = 2.0 * _clamped_sqrt(1.0 + t)                     # = 4w
    q0 = jnp.stack([0.25 * s0, (r21 - r12) / s0,
                    (r02 - r20) / s0, (r10 - r01) / s0], axis=-1)
    s1 = 2.0 * _clamped_sqrt(1.0 + r00 - r11 - r22)       # = 4x
    q1 = jnp.stack([(r21 - r12) / s1, 0.25 * s1,
                    (r01 + r10) / s1, (r02 + r20) / s1], axis=-1)
    s2 = 2.0 * _clamped_sqrt(1.0 - r00 + r11 - r22)       # = 4y
    q2 = jnp.stack([(r02 - r20) / s2, (r01 + r10) / s2,
                    0.25 * s2, (r12 + r21) / s2], axis=-1)
    s3 = 2.0 * _clamped_sqrt(1.0 - r00 - r11 + r22)       # = 4z
    q3 = jnp.stack([(r10 - r01) / s3, (r02 + r20) / s3,
                    (r12 + r21) / s3, 0.25 * s3], axis=-1)

    # pick the numerically largest pivot
    diag_q = jnp.where(
        ((r00 > r11) & (r00 > r22))[..., None], q1,
        jnp.where((r11 > r22)[..., None], q2, q3))
    q = jnp.where((t > 0.0)[..., None], q0, diag_q)
    # q and -q encode the same rotation; canonicalize to w >= 0 so the
    # recovered angle lands in [0, pi]
    q = jnp.where(q[..., :1] < 0.0, -q, q)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def rotmat_to_axis_angle(rot: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] rotation matrices -> [..., 3] axis-angle, angle in
    [0, pi]. Branch-complete (see rotmat_to_quat). Used to re-encode the
    camera-rotated SMPL root pose (the reference does this per sample with
    transforms3d on the host — Human36M/dataset.py:268-274)."""
    q = rotmat_to_quat(rot)
    w = q[..., 0]
    xyz = q[..., 1:]
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

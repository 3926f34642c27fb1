"""6D rotation representation + SVD rotation projection.

Capability parity with manopth's rot6d / rotproj utilities
(reference: manopth/manopth/rot6d.py:4-24, rotproj.py:4-21), as pure JAX.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rot6d_to_rotmat(x6d: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] -> [..., 3, 3] via Gram-Schmidt on two column vectors
    (Zhou et al. continuity representation; matches manopth's
    compute_rotation_matrix_from_ortho6d)."""
    a1 = x6d[..., 0:3]
    a2 = x6d[..., 3:6]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True).clip(1e-8)
    proj = (b1 * a2).sum(-1, keepdims=True)
    b2 = a2 - proj * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True).clip(1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rotmat_to_rot6d(rot: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 6] (first two columns)."""
    return jnp.concatenate([rot[..., :, 0], rot[..., :, 1]], axis=-1)


def project_to_rotation(mat: jnp.ndarray) -> jnp.ndarray:
    """Nearest rotation matrix by SVD with determinant correction
    (reference: manopth/manopth/rotproj.py:4-21), batched."""
    u, _, vh = jnp.linalg.svd(mat)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", u, vh,
        precision=jax.lax.Precision.HIGHEST))
    d = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None],
         det[..., None]], axis=-1)
    return jnp.einsum("...ij,...j,...jk->...ik", u, d, vh,
        precision=jax.lax.Precision.HIGHEST)

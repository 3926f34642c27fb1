"""Weak-perspective camera layer + fitting for the demo pipeline.

The reference fits 3 camera params (s, tx, ty) with 1500 host-driven Adam
steps and two manual LR drops (reference: lib/models/project_net.py:7-23,
demo/run.py:123-164). Here the projection is the same pure function and two
fitting paths are provided:

  * `fit_camera_closed_form` — the projection is LINEAR in (s, s*tx, s*ty),
    so the L1-optimal-ish fit is obtained instantly from a least-squares
    solve (the default for the demo; accuracy equals the converged Adam fit
    up to the L1-vs-L2 difference);
  * `fit_camera_adam` — parity path: the same 1500-step Adam schedule as
    the reference, but inside ONE jitted lax.fori_loop on device.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax


class CamParams(NamedTuple):
    s: jnp.ndarray    # [B, 1] scale
    t: jnp.ndarray    # [B, 2] translation


def project_weak_perspective(pose3d: jnp.ndarray, cam: CamParams,
                             crop_size: float) -> jnp.ndarray:
    """out = (xy + t) * s * res/2 + res/2 (reference: project_net.py:14-17).
    pose3d: [B, J, 3] -> [B, J, 2] pixel coords in the square crop."""
    res = crop_size / 2.0
    out = pose3d[..., :2] + cam.t[:, None, :]
    return out * cam.s[:, None, :] * res + res


def fit_camera_closed_form(pose3d: jnp.ndarray, target2d: jnp.ndarray,
                           crop_size: float) -> CamParams:
    """Least-squares (s, t): minimize ||(xy + t) * s * res - (target - res)||.

    With u = s and v = s*t the residual is linear: res*(xy*u + v) - y,
    solved per batch element in closed form.
    """
    res = crop_size / 2.0
    y = (target2d - res) / res            # [B, J, 2]
    x = pose3d[..., :2]                   # [B, J, 2]
    b, j, _ = x.shape
    # unknowns [u, vx, vy]; rows: x-coords then y-coords
    ones = jnp.ones((b, j, 1), x.dtype)
    zeros = jnp.zeros((b, j, 1), x.dtype)
    a_x = jnp.concatenate([x[..., :1], ones, zeros], axis=-1)
    a_y = jnp.concatenate([x[..., 1:2], zeros, ones], axis=-1)
    a = jnp.concatenate([a_x, a_y], axis=1)              # [B, 2J, 3]
    rhs = jnp.concatenate([y[..., 0], y[..., 1]], axis=1)  # [B, 2J]
    ata = jnp.einsum("bni,bnj->bij", a, a,
        precision=jax.lax.Precision.HIGHEST)
    atb = jnp.einsum("bni,bn->bi", a, rhs,
        precision=jax.lax.Precision.HIGHEST)
    sol = jnp.linalg.solve(ata, atb[..., None])[..., 0]  # [B, 3]
    s = sol[:, :1]
    t = sol[:, 1:] / jnp.where(jnp.abs(s) < 1e-8, 1e-8, s)
    return CamParams(s=s, t=t)


def fit_camera_adam(pose3d: jnp.ndarray, target2d: jnp.ndarray,
                    crop_size: float, steps: int = 1500,
                    seed: int = 0) -> Tuple[CamParams, jnp.ndarray]:
    """Reference-parity fit: Adam from uniform(0,1) init, lr 0.1 ->
    0.05@500 -> 0.001@1000, L1 loss (reference: demo/run.py:146-157), run
    as one on-device loop. Returns (params, final loss)."""
    schedule = optax.piecewise_constant_schedule(
        0.1, {500: 0.5, 1000: 0.02})
    tx = optax.adam(schedule)
    key = jax.random.PRNGKey(seed)
    init = jax.random.uniform(key, (pose3d.shape[0], 3))

    def loss_fn(p):
        cam = CamParams(s=p[:, :1], t=p[:, 1:])
        pred = project_weak_perspective(pose3d, cam, crop_size)
        return jnp.abs(pred - target2d).mean()

    def body(_, carry):
        p, opt_state = carry
        grads = jax.grad(loss_fn)(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state

    p, _ = jax.lax.fori_loop(0, steps, body, (init, tx.init(init)))
    return CamParams(s=p[:, :1], t=p[:, 1:]), loss_fn(p)


def crop_cam_to_orig_img(cam: CamParams, bbox, img_width: float,
                         img_height: float) -> jnp.ndarray:
    """Convert crop-space weak-perspective params (s, tx, ty) to
    original-image NDC params [sx, sy, tx, ty] for rendering
    (math parity with reference: demo/run.py:21-39). bbox: [..., 4]
    (x, y, w, h)."""
    x, y, w, h = bbox[..., 0], bbox[..., 1], bbox[..., 2], bbox[..., 3]
    cx, cy = x + w / 2.0, y + h / 2.0
    hw, hh = img_width / 2.0, img_height / 2.0
    sx = cam.s[..., 0] / (img_width / h)
    sy = cam.s[..., 0] / (img_height / h)
    tx = (cx - hw) / hw / sx + cam.t[..., 0]
    ty = (cy - hh) / hh / sy + cam.t[..., 1]
    return jnp.stack([sx, sy, tx, ty], axis=-1)

"""Temporal pose smoothing: One-Euro filter.

Parity with the reference's smooth_utils (reference: lib/smooth_utils.py:
OneEuroFilter + smooth_pose, used by the 3DPW accel-metric path). Provided
both as a stateful host-side filter and as a jitted `lax.scan` over a whole
sequence (the TPU-native form).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _smoothing_factor(t_e, cutoff):
    r = 2 * np.pi * cutoff * t_e
    return r / (r + 1)


def one_euro_smooth(seq: np.ndarray, min_cutoff: float = 0.004,
                    beta: float = 0.7, d_cutoff: float = 1.0,
                    fps: float = 1.0) -> np.ndarray:
    """Smooth a [T, ...] sequence with the One-Euro filter (host numpy)."""
    te = 1.0 / fps
    x_prev = seq[0].astype(np.float64)
    dx_prev = np.zeros_like(x_prev)
    out = [seq[0]]
    for t in range(1, len(seq)):
        x = seq[t].astype(np.float64)
        a_d = _smoothing_factor(te, d_cutoff)
        dx = (x - x_prev) / te
        dx_hat = a_d * dx + (1 - a_d) * dx_prev
        cutoff = min_cutoff + beta * np.abs(dx_hat)
        a = _smoothing_factor(te, cutoff)
        x_hat = a * x + (1 - a) * x_prev
        out.append(x_hat.astype(seq.dtype))
        x_prev, dx_prev = x_hat, dx_hat
    return np.stack(out)


@jax.jit
def one_euro_smooth_jax(seq: jnp.ndarray, min_cutoff: float = 0.004,
                        beta: float = 0.7, d_cutoff: float = 1.0
                        ) -> jnp.ndarray:
    """Same filter as a single jitted scan over time (fps = 1)."""
    te = 1.0

    def alpha(cutoff):
        r = 2 * jnp.pi * cutoff * te
        return r / (r + 1)

    def step(carry, x):
        x_prev, dx_prev = carry
        a_d = alpha(d_cutoff)
        dx = (x - x_prev) / te
        dx_hat = a_d * dx + (1 - a_d) * dx_prev
        cutoff = min_cutoff + beta * jnp.abs(dx_hat)
        a = alpha(cutoff)
        x_hat = a * x + (1 - a) * x_prev
        return (x_hat, dx_hat), x_hat

    init = (seq[0], jnp.zeros_like(seq[0]))
    _, smoothed = jax.lax.scan(step, init, seq[1:])
    return jnp.concatenate([seq[:1], smoothed], axis=0)

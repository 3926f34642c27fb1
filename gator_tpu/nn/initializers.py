"""Weight initializers matching PyTorch module defaults, so training from
scratch reproduces the reference's init distributions.

torch nn.Linear / nn.Conv1d default: kaiming_uniform(a=sqrt(5)) == U(-b, b)
with b = 1/sqrt(fan_in); bias U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
torch nn.Embedding default: N(0, 1).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def torch_linear_kernel(key, shape, dtype=jnp.float32):
    """Flax Dense kernel [in, out]: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    fan_in = shape[0]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_conv_kernel(key, shape, dtype=jnp.float32):
    """Flax Conv kernel [k, in, out]: fan_in = k * in."""
    fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_embedding(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


def embedding_padded0(key, shape, dtype=jnp.float32):
    """torch Embedding(padding_idx=0): N(0,1) with row 0 zeroed."""
    emb = jax.random.normal(key, shape, dtype)
    return emb.at[0].set(0.0)


def pin_row0(table):
    """torch padding_idx=0 *training* semantics: row 0 is pinned to zero
    forever — torch zeroes its gradient (so it never moves off the zero
    init); re-zeroing before lookup gives the identical forward AND a zero
    gradient to row 0 (reference: lib/models/backbones/modules.py:94,
    lib/models/GAT.py:54,73, lib/models/MDR.py:92-93)."""
    return jnp.asarray(table).at[0].set(0.0)


def uniform_pm(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def xavier_uniform_gain(gain: float):
    """torch nn.init.xavier_uniform_(gain=...) with torch's fan rule:
    fan_out = shape[0]*prod(shape[2:]), fan_in = shape[1]*prod(shape[2:])
    (2-D tensors reduce to the usual (out, in) convention)."""

    def init(key, shape, dtype=jnp.float32):
        receptive = int(np.prod(shape[2:])) if len(shape) > 2 else 1
        fan_out = shape[0] * receptive
        fan_in = shape[1] * receptive
        bound = gain * np.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init

"""Basic layers shared by GAT and MDR.

Parity-sensitive pieces (SURVEY.md §7 hard parts):
  * GraphLinear weight orientation [out, in] applied over channel-major
    [B, C, J] layout (reference: lib/models/backbones/modules.py:31-50);
  * StdLayerNorm — the Annotated-Transformer LayerNorm used by MDR's
    self-attention stack: std with Bessel correction, eps added to the std
    (NOT the variance), which differs numerically from standard LayerNorm
    (reference: lib/models/vanilla_transformer_encoder.py:24-34);
  * DropPath (per-sample stochastic depth) via broadcast dropout.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from . import initializers as tinit

# torch nn.GELU defaults to the exact erf form; flax nn.gelu defaults to the
# tanh approximation — parity requires exact
# (reference: lib/models/backbones/modules.py:188 et al.)
exact_gelu = partial(nn.gelu, approximate=False)


class GraphLinear(nn.Module):
    """1x1 graph convolution: x [B, C_in, J] -> [B, C_out, J].

    Weight [out, in] and the uniform(+-1/(in*out)) init match the reference
    (reference: lib/models/backbones/modules.py:39-50).
    """

    in_channels: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        bound = 1.0 / (self.in_channels * self.out_channels)
        w = self.param("W", tinit.uniform_pm(bound),
                       (self.out_channels, self.in_channels))
        b = self.param("b", tinit.uniform_pm(bound), (self.out_channels,))
        w = w.astype(self.dtype)
        x = x.astype(self.dtype)
        return jnp.einsum("oi,bij->boj", w, x) + b[None, :, None]


class TorchDense(nn.Module):
    """nn.Dense with PyTorch nn.Linear default init."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        return nn.Dense(
            self.features, use_bias=self.use_bias,
            kernel_init=tinit.torch_linear_kernel,
            bias_init=tinit.torch_bias(in_features),
            dtype=self.dtype, name="linear")(x)


class StdLayerNorm(nn.Module):
    """(x - mean) / (std + eps) * a + b with Bessel-corrected std.

    Numerically distinct from nn.LayerNorm: eps is added to the std, and the
    std uses the n-1 divisor (torch Tensor.std default). Required for
    checkpoint parity with MDR's self-attention stack
    (reference: lib/models/vanilla_transformer_encoder.py:24-34).
    """

    features: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        a = self.param("a_2", nn.initializers.ones, (self.features,))
        b = self.param("b_2", nn.initializers.zeros, (self.features,))
        x32 = x.astype(jnp.float32)
        mean = x32.mean(-1, keepdims=True)
        n = x.shape[-1]
        var = ((x32 - mean) ** 2).sum(-1, keepdims=True) / (n - 1)
        std = jnp.sqrt(var)
        out = a * (x32 - mean) / (std + self.eps) + b
        return out.astype(x.dtype)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath semantics: the kept
    samples are scaled by 1/keep_prob)."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if self.rate == 0.0:
            return x
        return nn.Dropout(
            rate=self.rate,
            broadcast_dims=tuple(range(1, x.ndim)))(
                x, deterministic=deterministic)


class Mlp(nn.Module):
    """timm-style MLP: fc1 -> act -> drop -> fc2 -> drop
    (used by MDR CrossAttentionBlock, reference: lib/models/MDR.py:62)."""

    hidden_features: int
    out_features: int
    drop: float = 0.0
    dtype: jnp.dtype = jnp.float32
    act: Callable = exact_gelu

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = TorchDense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = TorchDense(self.out_features, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class GatMlp(nn.Module):
    """GAT-block FFN; dropout is fixed at 0.1 regardless of the block's drop
    rate (reference: lib/models/backbones/modules.py:179-196)."""

    hidden_features: int
    out_features: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = TorchDense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = exact_gelu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = TorchDense(self.out_features, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class GroupNormCF(nn.Module):
    """torch nn.GroupNorm over channel-major [B, C, J] input: per-sample
    per-group statistics over (C/G, J), per-channel affine, biased variance,
    eps added to the variance (torch semantics; used by GAT's input embed,
    reference: lib/models/GAT.py:69-72)."""

    num_groups: int
    num_channels: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        b, c, j = x.shape
        g = self.num_groups
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        x32 = x.astype(jnp.float32).reshape(b, g, c // g * j)
        mean = x32.mean(-1, keepdims=True)
        var = ((x32 - mean) ** 2).mean(-1, keepdims=True)
        x32 = (x32 - mean) / jnp.sqrt(var + self.eps)
        out = x32.reshape(b, c, j) * scale[None, :, None] \
            + bias[None, :, None]
        return out.astype(x.dtype)

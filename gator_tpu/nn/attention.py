"""Attention variants used by GAT and MDR.

Sequences here are tiny (17–19 joint tokens in GAT, ~450 tokens in MDR), so
the win on TPU is keeping everything as a handful of fused batched matmuls —
no flash-attention machinery is needed; XLA fuses bias-add + softmax + matmul
chains at these sizes.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .layers import TorchDense


class BiasAttention(nn.Module):
    """MHSA with an additive per-head attention bias (the GAT hop/path
    encoding). Fused qkv projection
    (reference: lib/models/backbones/modules.py:109-138)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        b, n, c = x.shape
        h = self.num_heads
        head_dim = c // h
        scale = head_dim ** -0.5

        qkv = TorchDense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                         name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, h, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]          # [B, H, N, hd]

        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
        if attn_bias is not None:
            attn = attn + attn_bias.astype(attn.dtype)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
            self.dtype)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        out = TorchDense(c, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class CrossAttention(nn.Module):
    """MDR joint->vertex cross attention: queries are the first (seq-J)
    vertex tokens, keys/values the last J joint tokens
    (reference: lib/models/MDR.py:18-46)."""

    dim: int
    joint_num: int
    num_heads: int
    qkv_bias: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, n, c = x.shape
        h = self.num_heads
        head_dim = c // h
        scale = head_dim ** -0.5
        vert_num = n - self.joint_num

        q = TorchDense(c, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="wq")(x[:, :vert_num])
        k = TorchDense(c, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="wk")(x[:, -self.joint_num:])
        v = TorchDense(c, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="wv")(x[:, -self.joint_num:])
        q = q.reshape(b, vert_num, h, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, self.joint_num, h, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, self.joint_num, h, head_dim).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
            self.dtype)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, vert_num, c)
        out = TorchDense(c, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class MultiHeadedAttention(nn.Module):
    """Annotated-Transformer MHA: four separate linears (q, k, v, out),
    dropout applied to the attention probabilities
    (reference: lib/models/vanilla_transformer_encoder.py:72-94).
    MDR uses it for vertex-token self-attention."""

    num_heads: int
    d_model: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, deterministic: bool = True):
        b = query.shape[0]
        h = self.num_heads
        d_k = self.d_model // h

        def proj(x, name):
            y = TorchDense(self.d_model, dtype=self.dtype, name=name)(x)
            return y.reshape(b, -1, h, d_k).transpose(0, 2, 1, 3)

        q = proj(query, "linears_0")
        k = proj(key, "linears_1")
        v = proj(value, "linears_2")
        scores = jnp.einsum("bhnd,bhmd->bhnm", q, k) / jnp.sqrt(
            jnp.asarray(d_k, dtype=jnp.float32)).astype(self.dtype)
        p = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
            self.dtype)
        p = nn.Dropout(self.dropout)(p, deterministic=deterministic)
        out = jnp.einsum("bhnm,bhmd->bhnd", p, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, self.d_model)
        return TorchDense(self.d_model, dtype=self.dtype,
                          name="linears_3")(out)

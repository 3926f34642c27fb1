"""Attention variants used by GAT and MDR.

Sequences here are tiny (17–19 joint tokens in GAT, ~450 tokens in MDR).
The serving path routes through the Pallas fused kernel
(`pallas_attention.fused_attention`): per-(batch, head) score tiles live in
VMEM, so the [B, H, N, N] probability tensors (3 GB per MDR self-attention
at batch 2048) never hit HBM. Training with attention-prob dropout and
non-TPU backends fall back to the plain XLA formulation automatically.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .layers import TorchDense
from .pallas_attention import fused_attention


def _attend(q, k, v, bias, scale, attn_drop: float,
            deterministic: bool, dropout: Optional[nn.Dropout] = None,
            force_xla: bool = False):
    """q/k/v: [B, N, H, D]. Routes to the fused kernel unless the XLA path
    is required (prob dropout active, or forced)."""
    need_probs = (attn_drop > 0.0) and not deterministic
    if need_probs or force_xla:
        s = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
        if bias is not None:
            s = s + bias[None].astype(s.dtype)
        p = nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
        if dropout is not None:
            p = dropout(p, deterministic=deterministic)
        return jnp.einsum("bhnm,bmhd->bnhd", p, v)
    return fused_attention(q, k, v, bias, scale)


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
        qkv = qkv.reshape(b, n, 3, h, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, H, D]

        out = _attend(q, k, v, attn_bias, scale, self.attn_drop,
                      deterministic,
                      nn.Dropout(self.attn_drop, name="attn_dropout"))
        out = out.reshape(b, n, c)
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
        q = q.reshape(b, vert_num, h, head_dim)
        k = k.reshape(b, self.joint_num, h, head_dim)
        v = v.reshape(b, self.joint_num, h, head_dim)

        out = _attend(q, k, v, None, scale, self.attn_drop, deterministic,
                      nn.Dropout(self.attn_drop, name="attn_dropout"))
        out = out.reshape(b, vert_num, c)
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
        c = self.d_model
        # note: packing q/k/v into one [C, 3C] matmul was measured SLOWER
        # here (strided output slices force relayouts that cost more than
        # the saved input reads) — XLA handles three separate projections
        # at near-bandwidth for these shapes

        def proj(x, name):
            y = TorchDense(c, dtype=self.dtype, name=name)(x)
            return y.reshape(b, -1, h, d_k)

        q = proj(query, "linears_0")
        k = proj(key, "linears_1")
        v = proj(value, "linears_2")
        out = _attend(q, k, v, None, 1.0 / float(d_k) ** 0.5,
                      self.dropout, deterministic,
                      nn.Dropout(self.dropout, name="attn_dropout"))
        out = out.reshape(b, -1, self.d_model)
        return TorchDense(self.d_model, dtype=self.dtype,
                          name="linears_3")(out)

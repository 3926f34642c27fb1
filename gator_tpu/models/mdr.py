"""MDR — motion-disentangled regression head (joints -> mesh vertices).

TPU-first reimplementation of the reference head
(reference: lib/models/MDR.py:71-174):
  * vertex tokens = coarse template vertices + lifted-3D coords of each
    vertex's nearest joint (static gather via `vj_relation`);
  * 3x (joint->vertex cross-attention block + vertex self-attention with
    the Annotated-Transformer std-LayerNorm);
  * head: A[V2,20]/C[V2,3] from `motion_linear`, motion basis
    B = Conv1d(V2->20, k=3) over the 3-wide coordinate axis,
    vert = alpha * softmax(A) @ B + C, then Conv1d(V2->V0) upsample +
    template vertices.
  * the two Conv1d-over-length-3 ops are expressed as three shifted
    matmuls (einsum over the channel axis) — MXU-shaped, no conv lowering.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..assets.bundle import GatorAssets
from ..nn import (CrossAttention, DropPath, Mlp, MultiHeadedAttention,
                  StdLayerNorm, TorchDense)
from ..nn import initializers as tinit


@dataclasses.dataclass(frozen=True, eq=False)
class MdrSpec:
    num_joint: int
    gat_dim: int = 128           # feature dim arriving from GAT
    embed_dim: int = 64          # internal dim (reference: MDR.py:74)
    num_heads: int = 2
    dropout: float = 0.1
    num_basis: int = 20          # motion-basis size
    alpha: bool = False          # learned scale + LayerNorm vs BatchNorm
    init_verts_coarse: np.ndarray = None    # [V2, 3]
    init_verts_full: np.ndarray = None      # [V0, 3]
    vj_relation: np.ndarray = None          # [V2] nearest-joint indices

    @classmethod
    def from_assets(cls, assets: GatorAssets, gat_dim=128,
                    alpha=False) -> "MdrSpec":
        return cls(num_joint=assets.joint_num, gat_dim=gat_dim, alpha=alpha,
                   init_verts_coarse=assets.init_verts_coarse,
                   init_verts_full=assets.mean_vertices,
                   vj_relation=assets.vj_relation)

    @property
    def coarse_num(self) -> int:
        return self.init_verts_coarse.shape[0]

    @property
    def full_num(self) -> int:
        return self.init_verts_full.shape[0]


def conv1d_len3(x, kernel, bias):
    """torch Conv1d(C_in -> C_out, kernel=3, padding=1) on [B, C_in, 3]
    inputs, written as three shifted einsums over the channel axis so XLA
    maps it straight onto the MXU (the length axis is only 3).

    kernel: [C_out, C_in, 3]; returns [B, C_out, 3].
    """
    pad = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
    shifted = (
        jnp.concatenate([pad, x[..., :-1]], axis=-1),   # tap k=0 reads l-1
        x,                                              # tap k=1 reads l
        jnp.concatenate([x[..., 1:], pad], axis=-1),    # tap k=2 reads l+1
    )
    out = bias[None, :, None]
    for k in range(3):
        out = out + jnp.einsum("bcl,oc->bol", shifted[k], kernel[:, :, k])
    return out


class Conv1dLen3(nn.Module):
    """Parameterized conv1d_len3 with torch Conv1d default init."""

    in_channels: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = self.in_channels * 3
        kernel = self.param("weight", tinit.uniform_pm(1 / np.sqrt(fan_in)),
                            (self.out_channels, self.in_channels, 3))
        bias = self.param("bias", tinit.uniform_pm(1 / np.sqrt(fan_in)),
                          (self.out_channels,))
        return conv1d_len3(x.astype(self.dtype), kernel.astype(self.dtype),
                           bias.astype(self.dtype))


class CrossAttentionBlock(nn.Module):
    """Pre-norm cross-attention + MLP over the vertex tokens
    (reference: lib/models/MDR.py:48-69; defaults drop=attn_drop=
    drop_path=0.2)."""

    dim: int
    joint_num: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop: float = 0.2
    attn_drop: float = 0.2
    drop_path: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        vert_num = x.shape[1] - self.joint_num
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        attn = CrossAttention(
            dim=self.dim, joint_num=self.joint_num,
            num_heads=self.num_heads, attn_drop=self.attn_drop,
            proj_drop=self.drop, dtype=self.dtype, name="attn")(
                y, deterministic=deterministic)
        x = x[:, :vert_num] + DropPath(self.drop_path, name="dp1")(
            attn, deterministic=deterministic)
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = Mlp(hidden_features=int(self.dim * self.mlp_ratio),
                out_features=self.dim, drop=self.drop, dtype=self.dtype,
                name="mlp")(y, deterministic=deterministic)
        return x + DropPath(self.drop_path, name="dp2")(
            y, deterministic=deterministic)


class MDR(nn.Module):
    """Head: [B, J, 2+3+gat_dim] joint tokens -> [B, V0, 3] mesh."""

    spec: MdrSpec
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 use_running_average: bool | None = None):
        s = self.spec
        b = x.shape[0]
        if use_running_average is None:
            use_running_average = deterministic

        init_coarse = jnp.asarray(s.init_verts_coarse, self.dtype)
        init_full = jnp.asarray(s.init_verts_full, self.dtype)
        vj = jnp.asarray(s.vj_relation)

        # token build (reference: lib/models/MDR.py:126-137)
        verts_feat = jnp.broadcast_to(init_coarse[None],
                                      (b,) + init_coarse.shape)
        nearest = x[:, vj, 2:5].astype(self.dtype)   # lifted 3D / 1000
        verts_feat = jnp.concatenate([verts_feat, nearest], axis=2)
        joint_feat = TorchDense(s.embed_dim, dtype=self.dtype,
                                name="get_joint_feature")(x)
        verts_feat = TorchDense(s.embed_dim, dtype=self.dtype,
                                name="get_verts_feature")(verts_feat)

        pos_j = tinit.pin_row0(self.param(
            "pos_j_id_embed", tinit.embedding_padded0,
            (s.num_joint + 1, s.embed_dim)))
        pos_v = tinit.pin_row0(self.param(
            "pos_v_id_embed", tinit.embedding_padded0,
            (s.coarse_num + 1, s.embed_dim)))
        joint_feat = joint_feat + pos_j[jnp.arange(1, s.num_joint + 1)
                                        ].astype(self.dtype)
        verts_feat = verts_feat + pos_v[jnp.arange(1, s.coarse_num + 1)
                                        ].astype(self.dtype)

        # LBF: 3x (cross-attn + std-norm + self-attn)
        # (reference: lib/models/MDR.py:139-153)
        for i, (enc, att, norm) in enumerate((
                ("encoder", "selfatt", "norm"),
                ("encoder_1", "selfatt_1", "norm_1"),
                ("encoder_2", "selfatt_2", "norm_2"))):
            fusion = jnp.concatenate([verts_feat, joint_feat], axis=1)
            verts_feat = CrossAttentionBlock(
                dim=s.embed_dim, joint_num=s.num_joint, num_heads=s.num_heads,
                dtype=self.dtype, name=enc)(
                    fusion, deterministic=deterministic)
            verts_feat = StdLayerNorm(s.embed_dim, name=norm)(verts_feat)
            sa = MultiHeadedAttention(
                num_heads=s.num_heads, d_model=s.embed_dim,
                dropout=s.dropout, dtype=self.dtype, name=att)(
                    verts_feat, verts_feat, verts_feat,
                    deterministic=deterministic)
            verts_feat = verts_feat + nn.Dropout(
                s.dropout, name=f"dropout_{i}")(
                    sa, deterministic=deterministic)

        # MDR head (reference: lib/models/MDR.py:155-168)
        ac = TorchDense(s.num_basis + 3, dtype=self.dtype,
                        name="motion_linear")(verts_feat)
        mat_a, mat_c = ac[:, :, :s.num_basis], ac[:, :, -3:]
        mat_b = TorchDense(3, dtype=self.dtype,
                           name="bias_linear")(verts_feat)
        if s.alpha:
            mat_b = nn.LayerNorm(epsilon=1e-5, name="bias_norm")(mat_b)
        else:
            # BatchNorm1d(V2) over [B, V2, 3]: per-vertex-channel stats
            # across (batch, coord) — needs running stats for eval parity
            # (reference: lib/models/MDR.py:119,159)
            mat_b = nn.BatchNorm(
                use_running_average=use_running_average, axis=1,
                momentum=0.9, epsilon=1e-5, name="bias_norm")(mat_b)
        mat_b = nn.gelu(mat_b, approximate=False)
        mat_b = Conv1dLen3(s.coarse_num, s.num_basis, dtype=self.dtype,
                           name="bias_conv1d")(mat_b)        # [B, 20, 3]
        if s.alpha:
            scale = TorchDense(1, dtype=self.dtype,
                               name="scale_linear")(verts_feat)
            alpha = jnp.power(jnp.asarray(1.1, self.dtype), scale)
        else:
            alpha = jnp.asarray(1.0, self.dtype)
        attn_a = nn.softmax(mat_a.astype(jnp.float32), axis=-1).astype(
            self.dtype)
        vert = alpha * jnp.einsum("bvk,bkc->bvc", attn_a, mat_b) + mat_c
        vert = Conv1dLen3(s.coarse_num, s.full_num, dtype=self.dtype,
                          name="upsample_conv")(vert)        # [B, V0, 3]
        return vert + init_full

"""GAT — graph-aware transformer pose lifter (2D pose -> 3D pose + features).

TPU-first reimplementation of the reference lifter
(reference: lib/models/GAT.py:16-156):
  * graph tables (pruned adjacency, hop/path/edge encodings, X_Feat masks,
    degrees) are precomputed numpy constants from `assets` — the reference
    loads npy files and runs a Python path-expansion recursion inside
    `__init__` and recomputes the bias every step;
  * each block is `x + XFeat(DropPath(Attn(norm(x), bias) + MGCN(norm(x))))`
    then `x + DropPath(MLP(norm(x)))` — attention and graph conv run in
    parallel and are fused by the hop-masked X_Feat
    (reference: lib/models/GAT.py:33-43);
  * everything is a pure function of (params, pose2d) — no `.cuda()`
    buffers, no global config.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..assets.bundle import GatorAssets
from ..nn import (MGCN, BiasAttention, DropPath, GatMlp, GraphLinear,
                  GroupNormCF, HopPathEncoding, TorchDense, XFeat)
from ..nn import initializers as tinit


@dataclasses.dataclass(frozen=True, eq=False)
class GatSpec:
    """Static hyperparameters + graph tables for one GAT instance."""

    num_joint: int
    embed_dim: int = 128
    depth: int = 6
    num_heads: int = 8
    mlp_ratio: float = 4.0
    drop_rate: float = 0.4
    attn_drop_rate: float = 0.4
    drop_path_rate: float = 0.2
    num_spatial: int = 10
    # numpy tables (hashable by identity; captured as jit constants)
    adjacency: np.ndarray = None
    degree: np.ndarray = None
    spatial_pos: np.ndarray = None
    edge_input: np.ndarray = None
    hop_recip: np.ndarray = None
    masks_xfeat: np.ndarray = None

    @classmethod
    def from_assets(cls, assets: GatorAssets, embed_dim=128, depth=6,
                    **kw) -> "GatSpec":
        g = assets.graph
        return cls(num_joint=assets.joint_num, embed_dim=embed_dim,
                   depth=depth, adjacency=g.adjacency, degree=g.degree,
                   spatial_pos=g.spatial_pos, edge_input=g.edge_input,
                   hop_recip=g.hop_recip, masks_xfeat=g.masks_xfeat, **kw)


class GATBlock(nn.Module):
    """One lifter block (reference: lib/models/GAT.py:16-43)."""

    spec: GatSpec
    drop_path: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hop_path_bias, deterministic: bool = True):
        s = self.spec
        res = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        attn = BiasAttention(
            dim=s.embed_dim, num_heads=s.num_heads, qkv_bias=True,
            attn_drop=s.attn_drop_rate, proj_drop=s.drop_rate,
            dtype=self.dtype, name="attn")(
                y, hop_path_bias, deterministic=deterministic)
        gcn = MGCN(features=s.embed_dim, adjacency=s.adjacency,
                   dtype=self.dtype, name="gcn")(y)
        y = DropPath(self.drop_path, name="drop_path")(
            attn + gcn, deterministic=deterministic)
        x = res + XFeat(dim=s.embed_dim, masks=s.masks_xfeat,
                        dtype=self.dtype, name="x_feat")(y)
        res = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = GatMlp(hidden_features=int(s.embed_dim * s.mlp_ratio),
                   out_features=s.embed_dim, dtype=self.dtype,
                   name="mlp")(y, deterministic=deterministic)
        return res + DropPath(self.drop_path, name="drop_path2")(
            y, deterministic=deterministic)


class GAT(nn.Module):
    """Full lifter. Returns (pose3d [B, 3*J], features [B, J, D])."""

    spec: GatSpec
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pose2d, deterministic: bool = True):
        s = self.spec
        b = pose2d.shape[0]
        pose2d = pose2d.reshape(b, s.num_joint, 2)

        # input embed: GraphLinear(2->64) -> GroupNorm(4, 64) -> GELU ->
        # GraphLinear(64->D) over channel-major layout
        # (reference: lib/models/GAT.py:69-72,133-139)
        x = pose2d.transpose(0, 2, 1)                        # [B, 2, J]
        x = GraphLinear(2, 64, dtype=self.dtype, name="GLinear_0")(x)
        x = GroupNormCF(num_groups=64 // 16, num_channels=64,
                        name="GLinear_1")(x)
        x = nn.gelu(x, approximate=False)
        x = GraphLinear(64, s.embed_dim, dtype=self.dtype,
                        name="GLinear_3")(x)
        x = x.transpose(0, 2, 1)                             # [B, J, D]

        # joint-id + degree embeddings (reference: lib/models/GAT.py:141-144)
        pos_id_table = tinit.pin_row0(self.param(
            "pos_id_embed", tinit.embedding_padded0,
            (s.num_joint + 1, s.embed_dim)))
        pos_num_table = tinit.pin_row0(self.param(
            "pos_num_embed", tinit.embedding_padded0,
            (s.num_joint, s.embed_dim)))
        ids = jnp.arange(1, s.num_joint + 1)
        x = x + pos_id_table[ids].astype(self.dtype)
        degree = jnp.asarray(s.degree)
        x = x + pos_num_table[degree].astype(self.dtype)

        bias = HopPathEncoding(
            num_heads=s.num_heads, num_spatial=s.num_spatial,
            spatial_pos=s.spatial_pos, edge_input=s.edge_input,
            hop_recip=s.hop_recip, dtype=self.dtype,
            name="get_hop_path_encoding")()                  # [H, J, J]

        dpr = np.linspace(0.0, s.drop_path_rate, s.depth)
        for i in range(s.depth):
            x = GATBlock(spec=s, drop_path=float(dpr[i]), dtype=self.dtype,
                         name=f"blocks_{i}")(
                             x, bias, deterministic=deterministic)

        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        x = nn.gelu(x, approximate=False)
        pose3d = TorchDense(3 * s.num_joint, dtype=self.dtype,
                            name="lifter")(x.reshape(b, -1))
        return pose3d, x

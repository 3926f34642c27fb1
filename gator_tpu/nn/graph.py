"""Graph-structured layers: modulated graph conv (MGCN), hop-masked
multi-scale aggregation (X_Feat), and the hop/path attention-bias encoder.

All graph structure arrives as precomputed numpy tables
(gator_tpu.assets.graphs.GraphTables) baked into the jitted program — the
reference recomputes the hop/path encoding every forward step and keeps
`.cuda()` buffers inside modules (reference: lib/models/GAT.py:110-112,
lib/models/backbones/modules.py:98-107); here the expansion is a couple of
tiny einsums fused by XLA.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from . import initializers as tinit
from .layers import TorchDense


class MGCN(nn.Module):
    """Modulated graph convolution: separate self/neighbor weights,
    per-node modulation M, learned adjacency residual adj2, symmetrized
    (reference: lib/models/backbones/modules.py:213-255)."""

    features: int
    adjacency: np.ndarray          # [J, J] static pruned adjacency
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        j = self.adjacency.shape[0]
        in_f = x.shape[-1]
        w = self.param("W", tinit.xavier_uniform_gain(1.414),
                       (2, in_f, self.features))
        m = self.param("M", tinit.xavier_uniform_gain(1.414),
                       (j, self.features))
        adj2 = self.param("adj2", nn.initializers.constant(1e-6), (j, j))

        x = x.astype(self.dtype)
        h0 = jnp.einsum("bjf,fo->bjo", x, w[0].astype(self.dtype))
        h1 = jnp.einsum("bjf,fo->bjo", x, w[1].astype(self.dtype))
        adj = jnp.asarray(self.adjacency, self.dtype) + adj2.astype(
            self.dtype)
        adj = (adj.T + adj) / 2
        eye = jnp.eye(j, dtype=self.dtype)
        out = jnp.einsum("ij,bjo->bio", adj * eye, m * h0) \
            + jnp.einsum("ij,bjo->bio", adj * (1 - eye), m * h1)
        if self.use_bias:
            bias = self.param("bias",
                              tinit.uniform_pm(1.0 / np.sqrt(self.features)),
                              (self.features,))
            out = out + bias
        return out


class XFeat(nn.Module):
    """Hop-masked multi-scale aggregation: per-hop-ring linear (channel
    shrink by 8 for the 2-ring), masked sum over the ring, concat, project
    back (reference: lib/models/backbones/modules.py:140-177, s=1, l=2)."""

    dim: int
    masks: np.ndarray              # [2, J, J]: {hop<=1, hop==2} 0/1 masks
    shrink: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = []
        c_out = self.dim
        for ring in range(self.masks.shape[0]):
            proj = TorchDense(c_out, dtype=self.dtype,
                              name=f"linears_{ring}")(x)
            mask = jnp.asarray(self.masks[ring], self.dtype)
            feats.append(jnp.einsum("ij,bjc->bic", mask, proj))
            c_out = c_out // self.shrink
        features = jnp.concatenate(feats, axis=-1)
        return TorchDense(self.dim, dtype=self.dtype,
                          name="linearback")(features)


class HopPathEncoding(nn.Module):
    """Per-head [H, J, J] attention bias: hop-distance embedding + learned
    weighting of per-hop bone-length path features scaled by 1/(hops-1)
    (reference: lib/models/backbones/modules.py:77-107)."""

    num_heads: int
    num_spatial: int               # embedding table size (10)
    spatial_pos: np.ndarray        # [J, J] int hop distances
    edge_input: np.ndarray         # [J, J, D] per-hop bone lengths
    hop_recip: np.ndarray          # [J, J] 1/max(hops-1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        j = self.spatial_pos.shape[0]
        d = self.edge_input.shape[-1]
        h = self.num_heads

        spatial_table = tinit.pin_row0(self.param(
            "spatial_pos_encoder", tinit.embedding_padded0,
            (self.num_spatial, h)))
        # [J, J] indices -> [J, J, H] -> [H, J, J]; row 0 IS indexed (the
        # hop-0 diagonal), so without the pin it would drift under training
        spatial_bias = spatial_table[jnp.asarray(self.spatial_pos)]
        spatial_bias = spatial_bias.transpose(2, 0, 1).astype(self.dtype)

        # edge features: flatten [D, J*J] -> Linear(J*J -> J*J*H)
        edge = jnp.asarray(self.edge_input, self.dtype)        # [J, J, D]
        edge_flat = edge.transpose(2, 0, 1).reshape(d, j * j)  # [D, J*J]
        enc = TorchDense(j * j * h, dtype=self.dtype,
                         name="edge_encoder")(edge_flat)
        enc = enc.reshape(d, h, j, j).transpose(1, 2, 3, 0)    # [H, J, J, D]

        w = self.param("W", nn.initializers.ones, (h, j, j, d))
        edge_bias = (w.astype(self.dtype) * enc).sum(-1)       # [H, J, J]
        edge_bias = edge_bias * jnp.asarray(self.hop_recip, self.dtype)
        return spatial_bias + edge_bias

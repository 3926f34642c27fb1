"""Device-side mesh/graph operators.

Covers the reference's runtime mesh-coarsening ops and legacy graph layers
(reference: lib/models/backbones/mesh.py:93-123 sparse down/upsample;
lib/models/backbones/graph_layers.py:11-124 GraphConvolution /
GraphResBlock / SparseMM). On TPU the resampling matrices are DENSE
constants multiplied on the MXU — sparse matmul does not map to the
hardware, and at 1723x6890 dense is both faster and simpler.
"""
from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .assets.mesh_sampling import MeshSampling
from .nn import initializers as tinit


class MeshResampler:
    """Batched mesh down/upsampling through precomputed dense operators
    (replaces the reference's per-sample torch-sparse loops,
    mesh.py:93-123)."""

    def __init__(self, sampling: MeshSampling, dtype=jnp.float32):
        self.down = (jnp.asarray(sampling.down1, dtype),
                     jnp.asarray(sampling.down2, dtype))
        self.up = (jnp.asarray(sampling.up1, dtype),
                   jnp.asarray(sampling.up2, dtype))

    def downsample(self, x: jnp.ndarray, n1: int = 0,
                   n2: int = 1) -> jnp.ndarray:
        """x [..., V, C]; levels n1..n2 as in the reference API."""
        for i in range(n1, n2):
            x = jnp.einsum("wv,...vc->...wc", self.down[i], x,
        precision=jax.lax.Precision.HIGHEST)
        return x

    def upsample(self, x: jnp.ndarray, n1: int = 1,
                 n2: int = 0) -> jnp.ndarray:
        for i in reversed(range(n2, n1)):
            x = jnp.einsum("vw,...wc->...vc", self.up[i], x,
        precision=jax.lax.Precision.HIGHEST)
        return x


class GraphConvolution(nn.Module):
    """Kipf-style GCN layer over a fixed (row-normalized) adjacency
    (reference: graph_layers.py:11-53), dense adjacency on MXU."""

    features: int
    adjacency: np.ndarray
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        bound = 6.0 / np.sqrt(in_f + self.features)
        w = self.param("weight", tinit.uniform_pm(bound),
                       (in_f, self.features))
        adj = jnp.asarray(self.adjacency, self.dtype)
        out = jnp.einsum("vw,...wf,fo->...vo", adj,
                         x.astype(self.dtype), w.astype(self.dtype),
        precision=jax.lax.Precision.HIGHEST)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + b
        return out


class GraphResBlock(nn.Module):
    """Residual GCN block: GraphLinear shrink -> GCN -> GraphLinear expand
    with pre-norm ReLUs (reference: graph_layers.py:76-110)."""

    in_channels: int
    out_channels: int
    adjacency: np.ndarray
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from .nn import GraphLinear
        hidden = self.out_channels // 2
        y = nn.GroupNorm(num_groups=min(8, self.in_channels),
                         name="pre_norm")(x)
        y = nn.relu(y)
        # channel-major GraphLinear API: [B, C, V]
        y = GraphLinear(self.in_channels, hidden, dtype=self.dtype,
                        name="lin1")(y.swapaxes(-1, -2)).swapaxes(-1, -2)
        y = nn.GroupNorm(num_groups=min(8, hidden), name="norm")(y)
        y = nn.relu(y)
        y = GraphConvolution(hidden, self.adjacency, dtype=self.dtype,
                             name="conv")(y)
        y = nn.GroupNorm(num_groups=min(8, hidden), name="post_norm")(y)
        y = nn.relu(y)
        y = GraphLinear(hidden, self.out_channels, dtype=self.dtype,
                        name="lin2")(y.swapaxes(-1, -2)).swapaxes(-1, -2)
        if self.in_channels != self.out_channels:
            x = GraphLinear(self.in_channels, self.out_channels,
                            dtype=self.dtype, name="skip")(
                x.swapaxes(-1, -2)).swapaxes(-1, -2)
        return x + y


def row_normalized_adjacency(adj: np.ndarray, nsize: int = 1) -> np.ndarray:
    """Binary n-hop adjacency with self loops, row-normalized
    (reference: mesh.py:29-48 `adjmat_sparse`)."""
    a = (np.asarray(adj) != 0).astype(np.float64)
    out = a.copy()
    for _ in range(1, nsize):
        out = (out @ a > 0).astype(np.float64)
    np.fill_diagonal(out, 1.0)
    out = out / out.sum(axis=1, keepdims=True)
    return out.astype(np.float32)

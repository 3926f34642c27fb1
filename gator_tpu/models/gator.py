"""GATOR composite: GAT lifter + MDR regressor.

(reference: lib/models/GATOR.py:8-27). Returns (mesh [B, V0, 3] in meters,
lifted 3D pose [B, J, 3] in millimeters), same conventions as the reference
trainer (reference: lib/core/base.py:135-136).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..assets.bundle import GatorAssets
from .gat import GAT, GatSpec
from .mdr import MDR, MdrSpec


@dataclasses.dataclass(frozen=True, eq=False)
class GatorSpec:
    gat: GatSpec
    mdr: MdrSpec

    @classmethod
    def from_assets(cls, assets: GatorAssets, embed_dim: int = 128,
                    depth: int = 6, alpha: bool = False,
                    **gat_kw) -> "GatorSpec":
        return cls(
            gat=GatSpec.from_assets(assets, embed_dim=embed_dim,
                                    depth=depth, **gat_kw),
            mdr=MdrSpec.from_assets(assets, gat_dim=embed_dim, alpha=alpha),
        )


class GATOR(nn.Module):
    spec: GatorSpec
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pose2d, deterministic: bool = True,
                 use_running_average: Optional[bool] = None):
        s = self.spec
        b = pose2d.shape[0]
        pose2d = pose2d.reshape(b, s.gat.num_joint, 2).astype(self.dtype)

        pose3d_flat, feat = GAT(spec=s.gat, dtype=self.dtype,
                                name="pose_lifter")(
            pose2d.reshape(b, -1), deterministic=deterministic)
        pose3d = pose3d_flat.reshape(b, s.gat.num_joint, 3)

        # concat [2d, 3d/1000, feat] per joint (reference: GATOR.py:19)
        pose_combine = jnp.concatenate(
            [pose2d, pose3d / 1000.0, feat], axis=2)
        mesh = MDR(spec=s.mdr, dtype=self.dtype, name="pose2mesh")(
            pose_combine, deterministic=deterministic,
            use_running_average=use_running_average)
        return mesh, pose3d


def init_gator(spec: GatorSpec, rng: jax.Array, batch: int = 2,
               dtype=jnp.float32) -> Dict[str, Any]:
    """Initialize parameter/batch-stats collections for a GATOR model."""
    model = GATOR(spec=spec, dtype=dtype)
    pose2d = jnp.zeros((batch, spec.gat.num_joint, 2), dtype)
    variables = model.init({"params": rng}, pose2d, deterministic=True)
    return dict(variables)


def init_gat(spec: GatSpec, rng: jax.Array, batch: int = 2,
             dtype=jnp.float32) -> Dict[str, Any]:
    model = GAT(spec=spec, dtype=dtype)
    pose2d = jnp.zeros((batch, spec.num_joint * 2), dtype)
    variables = model.init({"params": rng}, pose2d, deterministic=True)
    return dict(variables)


def forward_gator(
    spec: GatorSpec, variables: Dict[str, Any], pose2d: jnp.ndarray,
    deterministic: bool = True, rngs: Optional[Dict[str, jax.Array]] = None,
    mutable: bool = False, dtype=jnp.float32,
) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], Optional[Dict[str, Any]]]:
    """Pure forward. With mutable=True also returns updated batch_stats."""
    model = GATOR(spec=spec, dtype=dtype)
    if mutable:
        out, updates = model.apply(
            variables, pose2d, deterministic=deterministic,
            use_running_average=False, rngs=rngs, mutable=["batch_stats"])
        return out, updates
    out = model.apply(variables, pose2d, deterministic=deterministic,
                      rngs=rngs)
    return out, None

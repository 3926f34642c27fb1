"""gator_tpu — a TPU-native (JAX/XLA/Pallas) framework for human mesh
reconstruction from 2D poses, providing the full capability surface of the
GATOR reference (graph-aware transformer lifter + motion-disentangled
regression head + SMPL body model + train/eval/demo harness).

Design (vs. the PyTorch reference):
  * all static tables (graph encodings, SMPL params, mesh resampling
    matrices) are precomputed ahead of time into a single pytree of
    constants (`gator_tpu.assets`), captured by jitted programs;
  * models are pure functions over parameter pytrees (flax.linen);
  * SMPL runs batched on device (the reference runs it per-sample on CPU
    inside DataLoader workers);
  * multi-chip scaling is data-parallel over a `jax.sharding.Mesh`
    (the reference is single-GPU; see SURVEY.md §2.6).

See docs/PARITY.md for the component-by-component mapping.
"""

from . import (assets, bodymodel, config, losses, metrics, models, ops,
               parallel, profiling, serving, smoothing, vis)
from .config import Config, load_config

__version__ = "0.1.0"

__all__ = [
    "Config", "assets", "bodymodel", "config", "load_config", "losses",
    "metrics", "models", "ops", "parallel", "profiling", "serving",
    "smoothing", "vis",
]

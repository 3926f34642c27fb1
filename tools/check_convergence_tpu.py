"""On-chip convergence gate for the bf16 fused training path.

Runs 60 fused bf16 train steps (both Pallas training-kernel stacks,
default dropout rates) on ONE real synthetic batch (full pipeline
semantics: crop/normalize/augment + on-device SMPL GT synthesis) and
asserts the loss drops by >30%. This is the check that caught the
bf16 NaN divergence (degenerate bf16 edges -> inf sqrt gradients) that
every value-level parity test missed.

Run: python tools/check_convergence_tpu.py   (on the TPU host)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import time
import jax
from gator_tpu.cli._cache import enable_compile_cache  # noqa: E402

enable_compile_cache()
import jax.numpy as jnp
import numpy as np
import optax
from gator_tpu import losses
from gator_tpu.assets import build_assets
from gator_tpu.data import GtSynthesizer, ProcessOptions, SyntheticDataset
from gator_tpu.models import GatorSpec, init_gator
from gator_tpu.train import TrainState
from gator_tpu.train.loop import make_gator_train_step

assets = build_assets("human36", synthetic_vertex_num=6890)
spec = GatorSpec.from_assets(assets, embed_dim=128, depth=6, alpha=False)
with jax.default_device(jax.devices("cpu")[0]):
    variables = init_gator(spec, jax.random.PRNGKey(0))
    # one real synthetic batch (full pipeline semantics)
    synth = GtSynthesizer(assets)
    opts = ProcessOptions(is_train=True)
    ds = SyntheticDataset(assets, opts, n=512, seed=0, synthesizer=synth)
    from gator_tpu.data import BatchPipeline
    batch = next(iter(BatchPipeline([ds], synth, batch_size=512,
                                    shuffle=False, seed=0)))
tx = optax.adam(1e-4)
state = TrainState.create(jax.tree_util.tree_map(np.asarray,
                                                 dict(variables)), tx)
state = jax.device_put(state, jax.devices()[0])
batch = jax.device_put({k: jnp.asarray(v) for k, v in batch.items()},
                       jax.devices()[0])
step = jax.jit(make_gator_train_step(
    spec, assets.faces, assets.j_regressor_h36m, losses.LossWeights(),
    tx, dtype=jnp.bfloat16, fused=True))
key = jax.random.PRNGKey(0)
one = jnp.asarray(1.0)
hist = []
for i in range(60):
    state, m = step(state, batch, jax.random.fold_in(key, i), one)
    if i % 10 == 0 or i == 59:
        hist.append((i, float(m["loss"])))
for i, l in hist:
    print(f"step {i:3d}  loss {l:.4f}", flush=True)
assert hist[-1][1] < hist[0][1] * 0.7, "no convergence"
print("CONVERGES (bf16 fused kernels, real synthetic batch)")

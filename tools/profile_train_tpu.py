"""Measure stage-2 train-step throughput variants on the real TPU chip.

Variants: f32 XLA (parity path), bf16 XLA + remat, bf16 fused kernels
(pallas_mdr_train) at several batch sizes. Methodology as bench.py: the
step loop runs on-device inside one jitted lax.fori_loop with a serial
dependency; per-step time = (long - short) / (L_long - L_short).

Run: python tools/profile_train_tpu.py [B ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

from gator_tpu.cli._cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from gator_tpu import losses
from gator_tpu.assets import build_assets
from gator_tpu.models import GatorSpec, init_gator
from gator_tpu.train import TrainState
from gator_tpu.train.loop import make_gator_train_step


def _timed(fn, *args):
    t0 = time.perf_counter()
    float(fn(*args))
    return time.perf_counter() - t0


def make_batch(b, v, seed=1):
    rng = np.random.default_rng(seed)
    batch = {
        "pose2d": rng.normal(size=(b, 17, 2)).astype(np.float32),
        "mesh": rng.normal(size=(b, v, 3)).astype(np.float32) * 0.1,
        "lift_pose3d": rng.normal(size=(b, 17, 3)).astype(
            np.float32) * 100,
        "reg_pose3d": rng.normal(size=(b, 17, 3)).astype(
            np.float32) * 100,
        "mesh_valid": np.ones((b, v, 1), np.float32),
        "lift_valid": np.ones((b, 17, 1), np.float32),
        "reg_valid": np.ones((b, 17, 1), np.float32),
    }
    return jax.device_put({k: jnp.asarray(x) for k, x in batch.items()},
                          jax.devices()[0])


def measure(step, state, batch, l_short=2, l_long=8):
    key = jax.random.PRNGKey(0)
    one = jnp.asarray(1.0)

    def loop(st, n):
        def body(_, s):
            s, _m = step(s, batch, key, one)
            return s
        st = lax.fori_loop(0, n, body, st)
        return jax.tree_util.tree_leaves(st.params)[0].ravel()[0]

    jloop = jax.jit(loop)
    t0 = time.perf_counter()
    _timed(jloop, state, 2)
    print(f"  compile+warm {time.perf_counter() - t0:.1f}s", flush=True)
    ts = min(_timed(jloop, state, l_short) for _ in range(2))
    tl = min(_timed(jloop, state, l_long) for _ in range(2))
    return (tl - ts) / (l_long - l_short)


def main():
    bs = [int(a) for a in sys.argv[1:]] or [512, 2048]
    assets = build_assets("human36", synthetic_vertex_num=6890)
    spec = GatorSpec.from_assets(assets, embed_dim=128, depth=6,
                                 alpha=False)
    tx = optax.adam(1e-4)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = init_gator(spec, jax.random.PRNGKey(0))

    def fresh_state():
        with jax.default_device(jax.devices("cpu")[0]):
            st = TrainState.create(
                jax.tree_util.tree_map(np.asarray, dict(variables)), tx)
        return jax.device_put(st, jax.devices()[0])

    variants = [
        ("f32-xla", dict(dtype=jnp.float32)),
        ("bf16-xla-remat", dict(dtype=jnp.bfloat16, remat=True)),
        ("bf16-fused", dict(dtype=jnp.bfloat16, fused=True)),
    ]
    for b in bs:
        batch = make_batch(b, spec.mdr.full_num)
        for name, kw in variants:
            if name == "f32-xla" and b > 512:
                continue        # OOMs HBM (the round-2 finding)
            step = make_gator_train_step(
                spec, assets.faces, assets.j_regressor_h36m,
                losses.LossWeights(), tx, **kw)
            print(f"B={b} {name}:", flush=True)
            try:
                per_step = measure(step, fresh_state(), batch)
                print(f"  {per_step * 1e3:.1f} ms/step = "
                      f"{b / per_step:,.0f} poses/s", flush=True)
            except Exception as e:
                print(f"  FAILED: {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()

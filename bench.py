"""Benchmark: batched pose->mesh inference throughput on one chip.

Prints ONE JSON line:
  {"metric": "poses_per_sec_per_chip", "value": N, "unit": "poses/s",
   "vs_baseline": N / 10000}
Baseline = the BASELINE.json north-star target of 10k poses/sec/chip batched
inference (the reference publishes no throughput numbers — SURVEY.md §6).

Methodology: the iteration loop runs on device inside one jitted lax.scan
with a serial dependency between iterations, synced by fetching a scalar;
per-step time is the difference between a long and a short scan, which
cancels dispatch/transfer overhead (this box reaches the TPU through a
relay with ~30 ms round-trip latency, so naive per-dispatch timing and
`block_until_ready` are unreliable).
"""
from __future__ import annotations

import json
import os
import time

import jax

# persistent compilation cache: repeat bench runs skip the multi-minute
# remote compiles through the TPU relay
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np
from jax import lax

BATCH = 2048
L_SHORT, L_LONG = 4, 16


def _loop_forward(serving_fn, pose, n):
    """n forward passes with a serial dependency; n is a traced scalar so
    both loop lengths share ONE compiled program (remote compiles through
    the relay cost ~1-2 min each)."""

    def body(_, p):
        mesh, _ = serving_fn(p)
        return p + 1e-9 * mesh[:, :p.shape[1], :2].astype(p.dtype)

    p = lax.fori_loop(0, n, body, pose)
    return p[0, 0, 0]


def _timed(fn, *args):
    t0 = time.perf_counter()
    float(fn(*args))          # scalar fetch waits for real completion
    return time.perf_counter() - t0


def main():
    from gator_tpu.assets import build_assets
    from gator_tpu.models import GatorSpec, init_gator
    from gator_tpu.serving import make_serving_fn

    assets = build_assets("human36", synthetic_vertex_num=6890)
    spec = GatorSpec.from_assets(assets, embed_dim=128, depth=6, alpha=False)
    # initialize on host CPU (remote-compiling the init program through the
    # TPU relay costs minutes); transfer params to the chip afterwards
    with jax.default_device(jax.devices("cpu")[0]):
        variables = init_gator(spec, jax.random.PRNGKey(0))
    variables = jax.device_put(variables, jax.devices()[0])
    # serving configuration: bf16 activations, fully-fused Pallas MDR
    # layers + fused attention (params stay f32; parity evals run f32)
    serving_fn = make_serving_fn(spec, variables, dtype=jnp.bfloat16)
    pose = jnp.asarray(
        np.random.default_rng(0).normal(size=(BATCH, 17, 2)), jnp.float32)

    loop = jax.jit(lambda p, n: _loop_forward(serving_fn, p, n))

    _timed(loop, pose, L_SHORT)   # compile + warm

    t_short = min(_timed(loop, pose, L_SHORT) for _ in range(2))
    t_long = min(_timed(loop, pose, L_LONG) for _ in range(2))
    per_step = (t_long - t_short) / (L_LONG - L_SHORT)

    poses_per_sec = BATCH / per_step
    print(json.dumps({
        "metric": "poses_per_sec_per_chip",
        "value": round(poses_per_sec, 1),
        "unit": "poses/s",
        "vs_baseline": round(poses_per_sec / 10000.0, 3),
    }))


if __name__ == "__main__":
    main()

"""Per-stage serving profile on the real chip.

Times each serving stage (GAT embeds+trunk+head, MDR token build, fused
LBF layers, MDR head+upsample) with the same on-device-loop methodology as
bench.py (relay-safe: serial-dependency fori_loop, scalar-fetch sync,
long-minus-short subtraction). Run: `python tools/profile_serving.py`.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from gator_tpu.cli._cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax.numpy as jnp
import numpy as np
from jax import lax

BATCH = int(os.environ.get("PROF_BATCH", "2048"))
L_SHORT, L_LONG = 4, 16
DTYPE = jnp.bfloat16


def _timed(fn, *args):
    t0 = time.perf_counter()
    float(fn(*args))
    return time.perf_counter() - t0


def _per_step(loop, *args):
    t_s = min(_timed(loop, *args, L_SHORT) for _ in range(2))
    t_l = min(_timed(loop, *args, L_LONG) for _ in range(2))
    return (t_l - t_s) / (L_LONG - L_SHORT)


def loop_of(fn, feedback):
    """fn: x -> y; feedback: y -> small delta with x's shape/dtype."""
    def run(x, n):
        def body(_, p):
            return p + feedback(fn(p)).astype(p.dtype)
        return lax.fori_loop(0, n, body, x)[(0,) * 1].ravel()[0]
    return jax.jit(run)


def main():
    from gator_tpu.assets import build_assets
    from gator_tpu.models import GatorSpec, init_gator
    from gator_tpu.nn.pallas_mdr import extract_layer_params, lbf_layer
    from gator_tpu import serving

    assets = build_assets("human36", synthetic_vertex_num=6890)
    spec = GatorSpec.from_assets(assets, embed_dim=128, depth=6,
                                 alpha=False)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = init_gator(spec, jax.random.PRNGKey(0))
    variables = jax.device_put(variables, jax.devices()[0])
    params = variables["params"]
    gat_p, mdr_p = params["pose_lifter"], params["pose2mesh"]
    bstats = variables.get("batch_stats", {}).get("pose2mesh")

    rng = np.random.default_rng(0)
    pose = jnp.asarray(rng.normal(size=(BATCH, 17, 2)), jnp.float32)

    # stage 1: GAT (embeds + fused trunk + lifter head)
    gat_fn = lambda p: serving.gat_serving_forward(spec.gat, gat_p, p,
                                                   dtype=DTYPE)
    gat_loop = loop_of(lambda p: gat_fn(p)[1],
                       lambda f: 1e-9 * f[:, :, :2])
    _timed(gat_loop, pose, L_SHORT)
    t_gat = _per_step(gat_loop, pose)

    # stage 2: full MDR from a pose_combine tensor
    x = jnp.asarray(rng.normal(size=(BATCH, 17, 133)), DTYPE)
    mdr_fn = lambda xx: serving.mdr_serving_forward(
        spec.mdr, mdr_p, bstats, xx, dtype=DTYPE)
    mdr_loop = loop_of(mdr_fn, lambda m: 1e-9 * jnp.tile(
        m[:, :17, :], (1, 1, 45))[:, :, :133])
    _timed(mdr_loop, x, L_SHORT)
    t_mdr = _per_step(mdr_loop, x)

    # stage 2a: the 3 fused LBF layers alone
    verts = jnp.asarray(rng.normal(size=(BATCH, spec.mdr.coarse_num, 64)),
                        DTYPE)
    joints = jnp.asarray(rng.normal(size=(BATCH, 17, 64)), DTYPE)
    lps = [extract_layer_params(mdr_p, i, dtype=DTYPE) for i in range(3)]

    def layers_fn(v):
        for lp in lps:
            v = lbf_layer(v, joints, lp, spec.mdr.num_heads)
        return v
    layers_loop = loop_of(layers_fn, lambda v: 1e-9 * v)
    _timed(layers_loop, verts, L_SHORT)
    t_layers = _per_step(layers_loop, verts)

    # stage 2b: the stacked v3 kernel (all layers in one program)
    from gator_tpu.nn.pallas_mdr import lbf_stack_fused
    v3_loop = loop_of(
        lambda v: lbf_stack_fused(v, joints, lps, spec.mdr.num_heads),
        lambda v: 1e-9 * v)
    _timed(v3_loop, verts, L_SHORT)
    t_v3 = _per_step(v3_loop, verts)

    # full serving step
    serve = serving.make_serving_fn(spec, variables, dtype=DTYPE)
    full_loop = loop_of(lambda p: serve(p)[0],
                        lambda m: 1e-9 * m[:, :17, :2])
    _timed(full_loop, pose, L_SHORT)
    t_full = _per_step(full_loop, pose)

    print(f"batch {BATCH}")
    print(f"  gat total      {t_gat * 1e3:8.3f} ms")
    print(f"  mdr total      {t_mdr * 1e3:8.3f} ms")
    print(f"    lbf layers   {t_layers * 1e3:8.3f} ms")
    print(f"    lbf v3 stack {t_v3 * 1e3:8.3f} ms")
    print(f"    head+embeds  {(t_mdr - t_layers) * 1e3:8.3f} ms")
    print(f"  full serving   {t_full * 1e3:8.3f} ms "
          f"({BATCH / t_full:,.0f} poses/s)")


if __name__ == "__main__":
    main()

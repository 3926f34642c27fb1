"""Training-step ablation harness (VERDICT r3 item 2) — the training
analog of tools/exp_mdr_ablate.py: measure every cheap lever on the fused
training path ON CHIP and publish the floor table (docs/PERFORMANCE.md).

Variants (all full stage-2 train steps — fwd+bwd+Adam+losses — at the
production bf16 operating point unless stated):
  * batch sweep 256/512/1024/2048 (root-causes the B=2048 per-pose
    regression),
  * forward kernel group size 2/4/8,
  * backward group size 2 (--group-bwd-2; Mosaic compile of the g=2
    recompute body measured ~10 min through the relay),
  * in-kernel dropout off (isolates the PRNG + mask-apply cost),
  * flax GAT trunk instead of the fused GAT training kernel,
  * pure-XLA paths: f32, f32+remat, bf16, bf16+remat,
  * forward-only (no grad) fused pass — the VJP share of the step, and a
    measured bound on what a save-activations backward could recover
    (the backward recomputes the forward in-kernel, so fwd-kernel time is
    an upper bound on the recoverable recompute).

Methodology: serial-dependency lax.fori_loop on device, two loop lengths,
scalar-fetch sync (the relay makes per-dispatch timing unreliable —
bench.py Methodology).

Run on the TPU:  python tools/exp_train_ablate.py [--quick] \
                     [--out artifacts/train_ablation.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

from gator_tpu.cli._cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402
from jax import lax  # noqa: E402


def _timed(fn, *args):
    t0 = time.perf_counter()
    float(fn(*args))
    return time.perf_counter() - t0


def _per_step(loop, *args, l_short=2, l_long=8, repeats=2):
    ts = min(_timed(loop, *args, l_short) for _ in range(repeats))
    tl = min(_timed(loop, *args, l_long) for _ in range(repeats))
    return (tl - ts) / (l_long - l_short)


def make_batch(b, j, v):
    rng = np.random.default_rng(1)
    return {
        "pose2d": rng.normal(size=(b, j, 2)).astype(np.float32),
        "mesh": rng.normal(size=(b, v, 3)).astype(np.float32) * 0.1,
        "lift_pose3d": rng.normal(size=(b, j, 3)).astype(np.float32) * 100,
        "reg_pose3d": rng.normal(size=(b, 17, 3)).astype(np.float32) * 100,
        "mesh_valid": np.ones((b, v, 1), np.float32),
        "lift_valid": np.ones((b, j, 1), np.float32),
        "reg_valid": np.ones((b, 17, 1), np.float32),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="skip the B-sweep extremes and XLA variants")
    ap.add_argument("--group-bwd-2", action="store_true",
                    help="include the group_bwd=2 variant (long Mosaic "
                         "compile)")
    ap.add_argument("--out", type=str,
                    default="artifacts/train_ablation.json")
    args = ap.parse_args()

    from gator_tpu import losses
    from gator_tpu.assets import build_assets
    from gator_tpu.models import GatorSpec, init_gator
    from gator_tpu.train import TrainState
    from gator_tpu.train.loop import make_gator_train_step

    assets = build_assets("human36", synthetic_vertex_num=6890)
    spec = GatorSpec.from_assets(assets, embed_dim=128, depth=6,
                                 alpha=False)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = init_gator(spec, jax.random.PRNGKey(0))
    variables = jax.device_put(variables, jax.devices()[0])
    tx = optax.adam(1e-4)
    j, v = spec.gat.num_joint, spec.mdr.full_num

    results = {}

    def measure(name, b, step_kwargs, fwd_only=False):
        step = make_gator_train_step(
            spec, assets.faces, assets.j_regressor_h36m,
            losses.LossWeights(), tx, **step_kwargs)
        with jax.default_device(jax.devices("cpu")[0]):
            state = TrainState.create(
                jax.tree_util.tree_map(np.asarray, dict(variables)), tx)
        state = jax.device_put(state, jax.devices()[0])
        batch = jax.device_put(
            {k: jnp.asarray(x) for k, x in make_batch(b, j, v).items()},
            jax.devices()[0])
        key = jax.random.PRNGKey(0)
        edge = jnp.asarray(1.0)

        if fwd_only:
            # forward + loss, NO grad/VJP — measures the step's fwd share
            from gator_tpu.train.fused_forward import make_fused_forward
            fwd = make_fused_forward(spec, dtype=jnp.bfloat16)
            jr = jnp.asarray(assets.j_regressor_h36m)

            def loop(st, n):
                def body(i, acc):
                    mesh, lift, _ = fwd(st.params, st.batch_stats,
                                        batch["pose2d"] + 1e-9 * acc,
                                        key)
                    pred = jnp.einsum(
                        "jv,bvc->bjc", jr,
                        mesh.astype(jnp.float32) * 1000.0,
                        precision=jax.lax.Precision.HIGHEST)
                    out = losses.gator_loss(
                        mesh.astype(jnp.float32), pred,
                        lift.astype(jnp.float32), batch["mesh"],
                        batch["reg_pose3d"], batch["lift_pose3d"],
                        batch["mesh_valid"], batch["reg_valid"],
                        batch["lift_valid"], assets.faces,
                        losses.LossWeights(), edge,
                        face_loss_dtype=jnp.bfloat16)
                    return acc + out.total
                return lax.fori_loop(0, n, body, jnp.asarray(0.0))

            jloop = jax.jit(loop)
            _timed(jloop, state, 2)
            dt = _per_step(jloop, state)
        else:
            def loop(st, n):
                def body(_, s):
                    s, _m = step(s, batch, key, edge)
                    return s
                st2 = lax.fori_loop(0, n, body, st)
                return jax.tree_util.tree_leaves(
                    st2.params)[0].ravel()[0]

            jloop = jax.jit(loop)
            _timed(jloop, state, 2)
            dt = _per_step(jloop, state)
        results[name] = {"batch": b, "ms_per_step": round(dt * 1e3, 2),
                         "poses_per_sec": round(b / dt, 1)}
        print(f"{name:44s} B={b:<5d} {dt*1e3:7.2f} ms  "
              f"{b/dt:10,.0f} poses/s", flush=True)

    FUSED = dict(dtype=jnp.bfloat16, fused=True)

    # baseline + batch sweep
    bs = [512, 2048] if args.quick else [256, 512, 1024, 2048]
    for b in bs:
        measure(f"fused bf16 (baseline)", b, FUSED) \
            if b == 512 else measure(f"fused bf16 B={b}", b, FUSED)

    # forward-only share -> VJP share + save-activations bound
    measure("fused bf16 fwd-only (no grad)", 512, FUSED, fwd_only=True)

    # kernel group sizes
    for g in (2, 8):
        measure(f"fused bf16 group_fwd={g}", 512,
                {**FUSED, "fused_opts": {"group_fwd": g}})
    if args.group_bwd_2:
        measure("fused bf16 group_bwd=2", 512,
                {**FUSED, "fused_opts": {"group_bwd": 2}})

    # in-kernel dropout off (PRNG + mask cost)
    measure("fused bf16 dropout-off", 512,
            {**FUSED, "fused_opts": {"rates": (0.0,) * 6}})

    # flax GAT trunk instead of the fused GAT training kernel
    measure("fused bf16 flax-GAT-trunk", 512,
            {**FUSED, "fused_opts": {"fused_gat": False}})

    if not args.quick:
        # pure-XLA paths
        measure("XLA f32", 512, {})
        measure("XLA f32 remat", 512, {"remat": True})
        measure("XLA bf16", 512, {"dtype": jnp.bfloat16})
        measure("XLA bf16 remat", 512,
                {"dtype": jnp.bfloat16, "remat": True})

    # derived: VJP share + the save-activations recovery bound
    base = results.get("fused bf16 (baseline)")
    fwd = results.get("fused bf16 fwd-only (no grad)")
    derived = {}
    if base and fwd:
        vjp_ms = base["ms_per_step"] - fwd["ms_per_step"]
        derived = {
            "fwd_share_ms": fwd["ms_per_step"],
            "vjp_share_ms": round(vjp_ms, 2),
            # the backward kernels recompute the forward in-kernel; a
            # save-activations variant could at MOST remove that
            # recompute, i.e. <= the measured fwd time (it would also pay
            # HBM residual traffic the recompute avoids)
            "save_activations_max_gain_ms": fwd["ms_per_step"],
            "save_activations_max_speedup": round(
                base["ms_per_step"]
                / (base["ms_per_step"] - fwd["ms_per_step"]), 3),
        }
        print(f"\nderived: fwd {fwd['ms_per_step']} ms, VJP+opt "
              f"{vjp_ms:.2f} ms -> save-activations could recover at most "
              f"{fwd['ms_per_step']} ms "
              f"({derived['save_activations_max_speedup']}x ceiling)")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"variants": results, "derived": derived,
                   "device": str(jax.devices()[0])}, f, indent=1)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()

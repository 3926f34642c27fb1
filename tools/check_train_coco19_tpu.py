"""On-chip gate for the fused TRAINING path at the COCO joint set
(J=19, alpha=True) — the shape the 3dpw/coco training configs run.

The interpret-mode parity test (tests/test_fused_step.py::
test_fused_forward_coco19_alpha_matches_flax) proves the math at this
shape on CPU; this script proves the real Mosaic lowering: the GAT
trunk tiles 152-row (8x19) sample groups and the LBF cross-attention
carries 19 joint tokens padded to 24.

Checks on the real chip:
  1. rate-0 f32 fused forward + parameter gradients vs the flax/XLA
     forward (relative max-abs-diff <= 1e-4);
  2. default-rate PRNG liveness at this shape: same seed bit-identical,
     different seed differs, dropout acts.

Run: python tools/check_train_coco19_tpu.py   (on the TPU host)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

from gator_tpu.cli._cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax.numpy as jnp
import numpy as np

from gator_tpu.assets import build_assets
from gator_tpu.models import GATOR, GatorSpec, init_gator
from gator_tpu.nn.pallas_mdr_train import ZERO_RATES
from gator_tpu.train.fused_forward import make_fused_forward

B = 8


def main():
    assets = build_assets("coco", data_dirs=[], synthetic_vertex_num=890,
                          seed=0)
    spec = GatorSpec.from_assets(
        assets, embed_dim=64, depth=2, alpha=True,
        drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = init_gator(spec, jax.random.PRNGKey(3))
        rng = np.random.default_rng(7)
        pose2d = jnp.asarray(
            0.5 + 0.25 * rng.standard_normal((B, 19, 2)), jnp.float32)
    dev = jax.devices()[0]
    params = jax.device_put(variables["params"], dev)
    pose2d = jax.device_put(pose2d, dev)

    # 1. rate-0 f32 fused vs flax/XLA on chip (values + grads)
    fwd0 = make_fused_forward(spec, dtype=jnp.float32, rates=ZERO_RATES,
                              fused_gat=True, gat_mlp_rate=0.0)
    model = GATOR(spec=spec)

    def loss_fused(p):
        mesh, pose3d, _ = fwd0(p, None, pose2d, jax.random.PRNGKey(1))
        return (mesh.astype(jnp.float32) ** 2).sum(), (mesh, pose3d)

    def loss_flax(p):
        mesh, pose3d = model.apply({"params": p}, pose2d,
                                   deterministic=True)
        return (mesh ** 2).sum(), (mesh, pose3d)

    # HIGHEST precision so the XLA oracle actually computes in f32 —
    # TPU default matmul precision is bf16, which alone moves the mesh
    # by ~4 mm (same context as bench.py's serving kernel gate)
    with jax.default_matmul_precision("highest"):
        (_, (mesh_f, _)), gf = jax.jit(
            jax.value_and_grad(loss_fused, has_aux=True))(params)
        (_, (mesh_x, _)), gx = jax.jit(
            jax.value_and_grad(loss_flax, has_aux=True))(params)
    dm = float(jnp.abs(mesh_f - mesh_x).max())
    print(f"coco19 fused-vs-XLA mesh max|diff| = {dm:.3e} m", flush=True)
    assert dm <= 1e-4, dm

    worst = ("", 0.0)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_x = dict(jax.tree_util.tree_leaves_with_path(gx))
    for path, leaf in flat_f:
        name = jax.tree_util.keystr(path)
        if "linears_1" in name and "bias" in name:
            continue        # zero-true-grad key bias (noise both sides)
        want = flat_x[path]
        scale = max(float(jnp.abs(want).max()), 1e-6)
        rel = float(jnp.abs(leaf - want).max()) / scale
        if rel > worst[1]:
            worst = (name, rel)
    print(f"coco19 grad worst relmax = {worst[1]:.3e} ({worst[0]})",
          flush=True)
    assert worst[1] <= 1e-4, worst

    # 2. PRNG liveness at this shape (default spec-derived rates)
    fwd = jax.jit(make_fused_forward(spec, dtype=jnp.bfloat16))

    def run(key):
        mesh, _, _ = fwd(params, None, pose2d, key)
        return np.asarray(mesh)

    o1 = run(jax.random.PRNGKey(5))
    o2 = run(jax.random.PRNGKey(5))
    o3 = run(jax.random.PRNGKey(6))
    assert np.array_equal(o1, o2), "same seed must be bit-identical"
    assert not np.array_equal(o1, o3), "different seed must differ"
    print("coco19 PRNG determinism + liveness: ok", flush=True)
    print("COCO19 ON-CHIP TRAINING-PATH CHECKS PASSED", flush=True)


if __name__ == "__main__":
    main()

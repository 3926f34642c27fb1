"""Component split of the fused train step at B=512: LBF-stack forward
alone, LBF-stack VJP (fwd+bwd kernels), and the GAT-lifter train fwd+bwd,
with the same on-device loop methodology as bench.py."""
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
from jax import lax

from gator_tpu.assets import build_assets
from gator_tpu.models import GatorSpec, init_gator
from gator_tpu.models.gat import GAT
from gator_tpu.nn.pallas_mdr import extract_layer_params
from gator_tpu.nn.pallas_mdr_train import lbf_stack_train

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
L_SHORT, L_LONG = 4, 16


def _timed(fn, *args):
    t0 = time.perf_counter()
    float(fn(*args))
    return time.perf_counter() - t0


def _per_step(loop, *args):
    ts = min(_timed(loop, *args, L_SHORT) for _ in range(2))
    tl = min(_timed(loop, *args, L_LONG) for _ in range(2))
    return (tl - ts) / (L_LONG - L_SHORT)


def main():
    assets = build_assets("human36", synthetic_vertex_num=6890)
    spec = GatorSpec.from_assets(assets, embed_dim=128, depth=6,
                                 alpha=False)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = init_gator(spec, jax.random.PRNGKey(0))
    variables = jax.device_put(variables, jax.devices()[0])
    mdr_p = variables["params"]["pose2mesh"]
    lps = [extract_layer_params(mdr_p, i) for i in range(3)]
    rng = np.random.default_rng(0)
    verts = jnp.asarray(
        rng.normal(size=(B, spec.mdr.coarse_num, 64)), jnp.bfloat16)
    joints = jnp.asarray(rng.normal(size=(B, 17, 64)), jnp.bfloat16)
    seed = jnp.asarray([3], jnp.int32)
    cot = jnp.asarray(rng.normal(size=verts.shape), jnp.bfloat16)

    import os
    gf = int(os.environ.get("GF", "4"))
    gb = int(os.environ.get("GB", "1"))

    def stack(v):
        return lbf_stack_train(v, joints, lps, spec.mdr.num_heads, seed,
                               group_fwd=gf, group_bwd=gb)

    def loop_fwd(v, n):
        def body(_, vv):
            return vv + (1e-9 * stack(vv)).astype(vv.dtype)
        return lax.fori_loop(0, n, body, v)[0, 0, 0].astype(jnp.float32)

    def loop_vjp(v, n):
        def body(_, vv):
            out, vjp = jax.vjp(stack, vv)
            (dv,) = vjp(cot)
            return vv + (1e-9 * dv).astype(vv.dtype)
        return lax.fori_loop(0, n, body, v)[0, 0, 0].astype(jnp.float32)

    jf = jax.jit(loop_fwd)
    jv = jax.jit(loop_vjp)
    t0 = time.perf_counter()
    _timed(jf, verts, L_SHORT)
    print(f"lbf fwd compile {time.perf_counter()-t0:.0f}s", flush=True)
    tf = _per_step(jf, verts)
    print(f"LBF stack fwd-only : {tf*1e3:7.2f} ms", flush=True)
    t0 = time.perf_counter()
    _timed(jv, verts, L_SHORT)
    print(f"lbf vjp compile {time.perf_counter()-t0:.0f}s", flush=True)
    tv = _per_step(jv, verts)
    print(f"LBF stack fwd+bwd  : {tv*1e3:7.2f} ms", flush=True)

    # GAT lifter train fwd+bwd (flax/XLA path)
    gat = GAT(spec=spec.gat, dtype=jnp.bfloat16)
    gp = variables["params"]["pose_lifter"]
    pose = jnp.asarray(rng.normal(size=(B, 34)), jnp.float32)
    key = jax.random.PRNGKey(0)

    def gat_loss(params, p2):
        p3, feat = gat.apply({"params": params}, p2,
                             deterministic=False,
                             rngs={"dropout": key})
        return (p3.astype(jnp.float32) ** 2).mean() \
            + (feat.astype(jnp.float32) ** 2).mean()

    def loop_gat(p2, n):
        def body(_, pp):
            g = jax.grad(gat_loss, argnums=1)(gp, pp)
            return pp + 1e-9 * g
        return lax.fori_loop(0, n, body, p2)[0, 0]

    jg = jax.jit(loop_gat)
    _timed(jg, pose, L_SHORT)
    tg = _per_step(jg, pose)
    print(f"GAT train fwd+bwd  : {tg*1e3:7.2f} ms", flush=True)


def profile_losses_and_head():
    """Loss fwd+bwd and MDR-head fwd+bwd in isolation."""
    from gator_tpu import losses

    assets = build_assets("human36", synthetic_vertex_num=6890)
    spec = GatorSpec.from_assets(assets, embed_dim=128, depth=6,
                                 alpha=False)
    v = spec.mdr.full_num
    rng = np.random.default_rng(0)
    mesh = jnp.asarray(rng.normal(size=(B, v, 3)) * 0.1, jnp.float32)
    gt = jnp.asarray(rng.normal(size=(B, v, 3)) * 0.1, jnp.float32)
    lift = jnp.asarray(rng.normal(size=(B, 17, 3)) * 100, jnp.float32)
    reg = jnp.asarray(rng.normal(size=(B, 17, 3)) * 100, jnp.float32)
    ones_v = jnp.ones((B, v, 1), jnp.float32)
    ones_j = jnp.ones((B, 17, 1), jnp.float32)
    j_reg = jnp.asarray(assets.j_regressor_h36m)
    faces = np.asarray(assets.faces)
    w = losses.LossWeights()

    def loss_of(mesh):
        pred_pose = jnp.einsum("jv,bvc->bjc", j_reg, mesh * 1000.0)
        out = losses.gator_loss(mesh, pred_pose, lift, gt, reg, lift,
                                ones_v, ones_j, ones_j, faces, w,
                                jnp.asarray(1.0))
        return out.total

    def loop_loss(m, n):
        def body(_, mm):
            g = jax.grad(loss_of)(mm)
            return mm + 1e-9 * g
        return lax.fori_loop(0, n, body, m)[0, 0, 0]

    jl = jax.jit(loop_loss)
    _timed(jl, mesh, L_SHORT)
    tl = _per_step(jl, mesh)
    print(f"losses fwd+bwd     : {tl*1e3:7.2f} ms", flush=True)

    # MDR head fwd+bwd from verts_feat (token build + head, no LBF)
    from gator_tpu.train.fused_forward import mdr_train_forward
    with jax.default_device(jax.devices("cpu")[0]):
        variables = init_gator(spec, jax.random.PRNGKey(0))
    variables = jax.device_put(variables, jax.devices()[0])
    mdr_p = variables["params"]["pose2mesh"]
    bs = variables["batch_stats"]["pose2mesh"]
    x = jnp.asarray(rng.normal(size=(B, 17, 133)), jnp.bfloat16)
    seed = jnp.asarray([3], jnp.int32)

    from gator_tpu.nn.pallas_mdr_train import ZERO_RATES

    def head_of(x):
        mesh, _ = mdr_train_forward(
            spec.mdr, mdr_p, bs, x, seed, dtype=jnp.bfloat16,
            rates=ZERO_RATES, group_fwd=4, group_bwd=1)
        return (mesh.astype(jnp.float32) ** 2).mean()

    def loop_head(x, n):
        def body(_, xx):
            g = jax.grad(head_of)(xx)
            return xx + (1e-9 * g).astype(xx.dtype)
        return lax.fori_loop(0, n, body, x)[0, 0, 0].astype(jnp.float32)

    jh = jax.jit(loop_head)
    _timed(jh, x, L_SHORT)
    th = _per_step(jh, x)
    print(f"mdr full fwd+bwd   : {th*1e3:7.2f} ms "
          f"(token build + LBF + head)", flush=True)




def profile_gat_fused():
    """Fused GAT trunk (training kernels) fwd and fwd+bwd in isolation."""
    from gator_tpu.nn.pallas_gat import extract_block_params
    from gator_tpu.nn.pallas_gat_train import gat_trunk_train
    from gator_tpu.nn import HopPathEncoding

    assets = build_assets("human36", synthetic_vertex_num=6890)
    spec = GatorSpec.from_assets(assets, embed_dim=128, depth=6,
                                 alpha=False)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = init_gator(spec, jax.random.PRNGKey(0))
    variables = jax.device_put(variables, jax.devices()[0])
    gp = variables["params"]["pose_lifter"]
    s = spec.gat
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, 17, 128)), jnp.bfloat16)
    bias = HopPathEncoding(
        num_heads=s.num_heads, num_spatial=s.num_spatial,
        spatial_pos=s.spatial_pos, edge_input=s.edge_input,
        hop_recip=s.hop_recip, dtype=jnp.float32).apply(
            {"params": gp["get_hop_path_encoding"]})
    bps = [extract_block_params(gp, i, s.adjacency)
           for i in range(s.depth)]
    seed = jnp.asarray([3], jnp.int32)
    cot = jnp.asarray(rng.normal(size=x.shape), jnp.bfloat16)

    def trunk(x):
        return gat_trunk_train(x, bias, bps, s.masks_xfeat, s.num_heads,
                               seed)

    def loop_fwd(v, n):
        def body(_, vv):
            return vv + (1e-9 * trunk(vv)).astype(vv.dtype)
        return lax.fori_loop(0, n, body, v)[0, 0, 0].astype(jnp.float32)

    def loop_vjp(v, n):
        def body(_, vv):
            out, vjp = jax.vjp(trunk, vv)
            (dv,) = vjp(cot)
            return vv + (1e-9 * dv).astype(vv.dtype)
        return lax.fori_loop(0, n, body, v)[0, 0, 0].astype(jnp.float32)

    jf, jv = jax.jit(loop_fwd), jax.jit(loop_vjp)
    _timed(jf, x, L_SHORT)
    print(f"GAT fused trunk fwd : {_per_step(jf, x)*1e3:7.2f} ms",
          flush=True)
    _timed(jv, x, L_SHORT)
    print(f"GAT fused trunk vjp : {_per_step(jv, x)*1e3:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    mode = sys.argv[2] if len(sys.argv) > 2 else "main"
    if mode == "losses":
        profile_losses_and_head()
    elif mode == "gat":
        profile_gat_fused()
    else:
        main()

"""Profile the in-step GT-synthesis cost on the real TPU chip.

The end-to-end training rate trails the bare step rate by the device-side
input-pipeline work (docs/PERFORMANCE.md e2e table); this harness breaks
that residual down: full device-pipeline step vs bare step, plus the
synthesis pieces (SMPL forward, kinematic chain, fitting error, input
assembly) timed standalone with the same on-device fori_loop methodology
as bench.py.

Run: python tools/profile_gt_synth.py [B]
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
from gator_tpu.data import processing
from gator_tpu.data.device_pipeline import with_device_input_pipeline
from gator_tpu.data.gt_synth import GtSynthesizer
from gator_tpu.data.synthetic import SyntheticDataset
from gator_tpu.models import GatorSpec, init_gator
from gator_tpu.train import TrainState
from gator_tpu.train.loop import make_gator_train_step


def _timed(fn, *args):
    t0 = time.perf_counter()
    float(fn(*args))
    return time.perf_counter() - t0


def per_step(make_loop, l_short=4, l_long=16):
    jloop = jax.jit(make_loop)
    _timed(jloop, l_short)
    ts = min(_timed(jloop, l_short) for _ in range(2))
    tl = min(_timed(jloop, l_long) for _ in range(2))
    return (tl - ts) / (l_long - l_short)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    assets = build_assets("human36", synthetic_vertex_num=6890)
    spec = GatorSpec.from_assets(assets, embed_dim=128, depth=6,
                                 alpha=False)
    synth = GtSynthesizer(assets)
    opts = processing.ProcessOptions(is_train=True, flip_enabled=True,
                                     rotate_factor=30.0)
    ds = SyntheticDataset(assets, opts, n=max(2 * b, 1024), seed=0,
                          synthesizer=synth)
    tx = optax.adam(1e-4)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = init_gator(spec, jax.random.PRNGKey(0))

    step = make_gator_train_step(
        spec, assets.faces, assets.j_regressor_h36m, losses.LossWeights(),
        tx, dtype=jnp.bfloat16, fused=True)
    dstep = with_device_input_pipeline(step, synth, ds.table,
                                       ds.joint_set, opts,
                                       opts.fitting_thr)
    idx_batch = ds.make_index_batch(np.arange(b) % len(ds),
                                    np.random.default_rng(0))
    idx_batch = jax.device_put(
        {k: jnp.asarray(v) for k, v in idx_batch.items()},
        jax.devices()[0])
    key, edge = jax.random.PRNGKey(0), jnp.asarray(1.0)

    def fresh_state():
        with jax.default_device(jax.devices("cpu")[0]):
            st = TrainState.create(
                jax.tree_util.tree_map(np.asarray, dict(variables)), tx)
        return jax.device_put(st, jax.devices()[0])

    # full device-pipeline step
    st = fresh_state()

    def loop_full(n):
        def body(_, s):
            s, _m = dstep(s, idx_batch, key, edge)
            return s
        out = lax.fori_loop(0, n, body, st)
        return jax.tree_util.tree_leaves(out.params)[0].ravel()[0]

    t_full = per_step(loop_full)
    print(f"B={b} device-pipeline step: {t_full*1e3:.2f} ms "
          f"({b/t_full:,.0f} poses/s)", flush=True)

    # bare train step on equivalent pre-made tensors
    rng = np.random.default_rng(1)
    v = spec.mdr.full_num
    bare = {
        "pose2d": rng.normal(size=(b, 17, 2)).astype(np.float32),
        "mesh": rng.normal(size=(b, v, 3)).astype(np.float32) * 0.1,
        "lift_pose3d": rng.normal(size=(b, 17, 3)).astype(np.float32),
        "reg_pose3d": rng.normal(size=(b, 17, 3)).astype(np.float32),
        "mesh_valid": np.ones((b, v, 1), np.float32),
        "lift_valid": np.ones((b, 17, 1), np.float32),
        "reg_valid": np.ones((b, 17, 1), np.float32),
    }
    bare = jax.device_put({k: jnp.asarray(x) for k, x in bare.items()},
                          jax.devices()[0])
    st2 = fresh_state()

    def loop_bare(n):
        def body(_, s):
            s, _m = step(s, bare, key, edge)
            return s
        out = lax.fori_loop(0, n, body, st2)
        return jax.tree_util.tree_leaves(out.params)[0].ravel()[0]

    t_bare = per_step(loop_bare)
    print(f"B={b} bare step:            {t_bare*1e3:.2f} ms "
          f"({b/t_bare:,.0f} poses/s)  -> pipeline adds "
          f"{(t_full-t_bare)*1e3:.2f} ms", flush=True)

    # pieces (each in its own serial fori_loop)
    tbl_pose = jnp.asarray(ds.table.pose)
    tbl_shape = jnp.asarray(ds.table.shape)
    tbl_trans = jnp.asarray(ds.table.trans)
    tbl_cam_r = jnp.asarray(ds.table.cam_r)
    tbl_cam_t = jnp.asarray(ds.table.cam_t)
    tbl_jc = jnp.asarray(ds.table.joint_cam_h36m)
    idx = idx_batch["idx"]

    def piece(name, fn):
        def loop(n):
            def body(i, carry):
                out = fn(i)
                return carry + out
            return lax.fori_loop(0, n, body, jnp.asarray(0.0))
        t = per_step(loop)
        print(f"  {name:34s} {t*1e3:6.2f} ms", flush=True)
        return t

    def f_smpl(i):
        mesh_mm, _ = synth.smpl_mesh_cam(
            tbl_pose[idx] + 1e-9 * i, tbl_shape[idx], tbl_trans[idx],
            tbl_cam_r[idx], tbl_cam_t[idx], "neutral")
        return mesh_mm[0, 0, 0]

    def f_chain(i):
        # rodrigues + PRE-OPTIMIZATION per-joint sequential chain — the
        # baseline that smpl_forward's level-batched chain replaced; kept
        # as a comparison point (the production chain's cost is inside
        # the full-layer f_smpl measurement above)
        from gator_tpu.bodymodel.rotations import axis_angle_to_rotmat
        params = synth.params["neutral"]
        pose = tbl_pose[idx] + 1e-9 * i
        rotm = axis_angle_to_rotmat(pose.reshape(b, 24, 3))
        joints_rest = jnp.einsum(
            "jv,vc->jc", params.j_regressor, params.v_template,
            precision=jax.lax.Precision.HIGHEST)
        joints_rest = jnp.broadcast_to(joints_rest, (b, 24, 3))
        ein = lambda s, *xs: jnp.einsum(         # noqa: E731
            s, *xs, precision=jax.lax.Precision.HIGHEST)
        rots = [rotm[:, 0]]
        locs = [joints_rest[:, 0]]
        for j in range(1, 24):
            p = params.parents[j]
            off = joints_rest[:, j] - joints_rest[:, p]
            rots.append(ein("bxy,byz->bxz", rots[p], rotm[:, j]))
            locs.append(locs[p] + ein("bxy,by->bx", rots[p], off))
        return jnp.stack(rots, 1)[0].sum() + jnp.stack(locs, 1)[0, 0, 0]

    def f_fit(i):
        jc = tbl_jc[idx]
        mesh = jnp.zeros((b, 6890, 3)) + i
        return synth.fitting_error(jc - jc[:, :1], mesh)[0]

    def f_input(i):
        from gator_tpu.data.device_pipeline import (_flip_perm,
                                                    crop_normalize_gt,
                                                    j3d_augment)
        perm = _flip_perm(ds.joint_set.joint_num, ds.joint_set.flip_pairs)
        ji = jnp.asarray(ds.table.joint_img_h36m)[..., :2][idx] + i * 1e-9
        p2 = crop_normalize_gt(ji, perm, opts.input_shape,
                               idx_batch["flips"], idx_batch["rots"])
        j3 = j3d_augment(tbl_jc[idx], perm, idx_batch["flips"],
                         idx_batch["rots"])
        return p2[0, 0, 0] + j3[0, 0, 0]

    piece("smpl_mesh_cam (full)", f_smpl)
    piece("rodrigues + chain (pre-opt form)", f_chain)
    piece("fitting_error", f_fit)
    piece("input assembly (crop+j3d)", f_input)


if __name__ == "__main__":
    main()

"""Break down the DEVICE-INPUT packed train step on the real chip: the
detector-input flagship recipe's per-step overhead over the bare train
step (VERDICT r4: e2e det sits at 82% of the step rate; this names the
milliseconds). Pieces timed standalone with the same on-device fori_loop
methodology as bench.py:

  * full packed/device step (device_pose2d + SMPL GT + step)
  * bare step on pre-made tensors
  * SMPL GT mesh synthesis (gendered_smpl_verts + offset)
  * in-step 2D input (gather + detector noise + crop/flip/normalize)
  * target gathers only (rows -> lift/reg/masks)

Run: python tools/profile_packed_step.py [B]
"""
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
from jax import lax  # noqa: E402


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
    import optax

    from gator_tpu import losses
    from gator_tpu.cli.common import Session
    from gator_tpu.config import load_config
    from gator_tpu.data.packed import gendered_smpl_verts
    from gator_tpu.train import TrainState
    from gator_tpu.train.loop import make_gator_train_step

    cfg = load_config("configs/gator_synthetic_e2e_det.yml")
    sess = Session(cfg, is_train=True, synthetic=True, synthetic_n=4096)
    assert sess.gt_in_step == "device", sess.gt_in_step
    table = sess.packed_table()
    synth = sess.synth
    spec = sess.spec
    tx = optax.adam(1e-4)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = sess.init_variables()

    step = make_gator_train_step(
        spec, sess.assets.faces, sess.target_regressor,
        losses.LossWeights(normal=cfg.MODEL.normal_loss_weight,
                           edge=cfg.MODEL.edge_loss_weight,
                           joint=cfg.MODEL.joint_loss_weight), tx,
        dtype=jnp.bfloat16, fused=True)
    dstep, _ = sess.make_steps(tx)   # the wrapped packed/device step

    from gator_tpu.data.packed import make_device_batch
    batch = make_device_batch(sess.datasets[0], np.arange(b) % 4096,
                              np.random.default_rng(0))
    batch = jax.device_put({k: jnp.asarray(v) for k, v in batch.items()},
                           jax.devices()[0])
    key, edge = jax.random.PRNGKey(0), jnp.asarray(1.0)

    def fresh_state():
        with jax.default_device(jax.devices("cpu")[0]):
            st = TrainState.create(
                jax.tree_util.tree_map(np.asarray, dict(variables)), tx)
        return jax.device_put(st, jax.devices()[0])

    st = fresh_state()

    def loop_full(n):
        def body(_, s):
            s, _m = dstep(s, batch, key, edge)
            return s
        out = lax.fori_loop(0, n, body, st)
        return jax.tree_util.tree_leaves(out.params)[0].ravel()[0]

    t_full = per_step(loop_full)
    print(f"B={b} device-input packed step: {t_full*1e3:6.2f} ms "
          f"({b/t_full:,.0f} poses/s)", flush=True)

    rng = np.random.default_rng(1)
    j, v = spec.gat.num_joint, spec.mdr.full_num
    bare = {
        "pose2d": rng.normal(size=(b, j, 2)).astype(np.float32),
        "mesh": rng.normal(size=(b, v, 3)).astype(np.float32) * 0.1,
        "lift_pose3d": rng.normal(size=(b, j, 3)).astype(np.float32),
        "reg_pose3d": rng.normal(size=(b, 17, 3)).astype(np.float32),
        "mesh_valid": np.ones((b, v, 1), np.float32),
        "lift_valid": np.ones((b, j, 1), np.float32),
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
    print(f"B={b} bare step:                {t_bare*1e3:6.2f} ms "
          f"({b/t_bare:,.0f} poses/s)  -> pipeline adds "
          f"{(t_full-t_bare)*1e3:.2f} ms", flush=True)

    # packed HOST-input step (device_input=False): in-step mesh/targets,
    # no in-step noise — isolates the noise cost from the target side
    from gator_tpu.data.packed import (make_packed_batch,
                                       with_packed_input_pipeline)
    pstep = with_packed_input_pipeline(
        step, table, synth, sess.assets.joint_set, stage="gator",
        opts=sess.datasets[0].opts, device_input=False)
    pbatch = make_packed_batch(sess.datasets[0], np.arange(b) % 4096,
                               np.random.default_rng(0))
    pbatch = jax.device_put({k: jnp.asarray(x) for k, x in pbatch.items()},
                            jax.devices()[0])
    st3 = fresh_state()

    def loop_packed(n):
        def body(_, s):
            s, _m = pstep(s, pbatch, key, edge)
            return s
        out = lax.fori_loop(0, n, body, st3)
        return jax.tree_util.tree_leaves(out.params)[0].ravel()[0]

    t_packed = per_step(loop_packed)
    print(f"B={b} packed host-input step:   {t_packed*1e3:6.2f} ms "
          f"(targets add {(t_packed-t_bare)*1e3:.2f}, noise+2D adds "
          f"{(t_full-t_packed)*1e3:.2f})", flush=True)

    # pieces
    genders = table.genders_present
    tbl = {
        "pose_eff": jnp.asarray(table.pose_eff, jnp.float32),
        "shape_eff": jnp.asarray(table.shape_eff, jnp.float32),
        "offset_m": jnp.asarray(table.trans_off - table.root_mm / 1000.0,
                                jnp.float32),
        "joint_img_input": jnp.asarray(table.joint_img_input, jnp.float32),
        "crop_area": jnp.asarray(table.crop_area, jnp.float32),
        "joint_cam_input": jnp.asarray(table.joint_cam_input, jnp.float32),
        "reg_pose": jnp.asarray(table.reg_pose, jnp.float32),
        "mesh_valid": jnp.asarray(table.mesh_valid, jnp.float32),
        "reg_valid": jnp.asarray(table.reg_valid, jnp.float32),
        "lift_valid": jnp.asarray(table.lift_valid, jnp.float32),
    }
    row = batch["row"]
    flips, rots = batch["flips"], batch["rots"]

    n_rows = len(table)

    def piece(name, fn):
        # every gather uses an i-dependent row so XLA cannot hoist any
        # loop-invariant computation out of the timing loop
        def loop(n):
            def body(i, carry):
                return carry + fn((row + i) % n_rows)
            return lax.fori_loop(0, n, body, jnp.asarray(0.0))
        t = per_step(loop)
        print(f"  {name:38s} {t*1e3:6.2f} ms", flush=True)
        return t

    def f_smpl(ri):
        verts = gendered_smpl_verts(synth.params, genders, None,
                                    tbl["pose_eff"][ri],
                                    tbl["shape_eff"][ri])
        mesh = verts + tbl["offset_m"][ri][:, None]
        return mesh[0, 0, 0]

    from gator_tpu.data.device_noise import synthesize_pose_device
    from gator_tpu.data.device_pipeline import (_flip_perm, affine_crop,
                                                flip_standardize,
                                                j3d_augment)
    jset = sess.assets.joint_set
    perm = _flip_perm(jset.joint_num, jset.flip_pairs)
    input_shape = tuple(sess.datasets[0].opts.input_shape)

    def f_input2d(ri):
        out = affine_crop(tbl["joint_img_input"][ri], input_shape, rots)
        nk = jax.random.fold_in(key, ri[0])
        synth2d = synthesize_pose_device(nk, out[:, :17],
                                         tbl["crop_area"][ri])
        out = out.at[:, :17].set(synth2d)
        return flip_standardize(out, perm, input_shape, flips)[0, 0, 0]

    def f_noise(ri):
        nk = jax.random.fold_in(key, ri[0])
        return synthesize_pose_device(
            nk, tbl["joint_img_input"][ri][:, :17],
            tbl["crop_area"][ri])[0, 0, 0]

    def f_targets(ri):
        lift = j3d_augment(tbl["joint_cam_input"][ri], perm,
                           flips, rots)
        return (lift[0, 0, 0] + tbl["reg_pose"][ri][0, 0, 0]
                + tbl["mesh_valid"][ri][0] + tbl["reg_valid"][ri][0]
                + tbl["lift_valid"][ri][0])

    piece("SMPL GT mesh (fwd + offset)", f_smpl)
    piece("2D input (crop+noise+flip/std)", f_input2d)
    piece("detector noise alone", f_noise)
    piece("target gathers (lift/reg/masks)", f_targets)


if __name__ == "__main__":
    main()

"""Benchmark: batched pose->mesh throughput + latency + train-step rate.

Prints ONE JSON line. Headline metric (driver contract):
  {"metric": "poses_per_sec_per_chip", "value": N, "unit": "poses/s",
   "vs_baseline": N / 10000, ...extras}
Baseline = the BASELINE.json north-star target of 10k poses/sec/chip batched
inference (the reference publishes no throughput numbers — SURVEY.md §6).

Extra keys in the same JSON object:
  p50_latency_ms          — median single-pose (B=1) pose->mesh step time,
                            BASELINE.json's "p50 pose→mesh latency" metric
  train_poses_per_sec     — full stage-2 GATOR train step (fwd+bwd+adam,
                            BatchNorm stats, all five loss terms) at B=512
  train_e2e_poses_per_sec — sustained END-TO-END training rate through the
                            real CLI data path (prefetch pipeline,
                            device-side input assembly + GT synthesis,
                            8-step scan dispatch; epoch 2 of the
                            gator_synthetic_e2e recipe)
  host_batch_poses_per_sec — input-pipeline supply rate: BatchPipeline
                            batch assembly + on-the-fly GT mesh synthesis
                            (SMPL on the host CPU backend) at B=2048
  train_stage1_e2e_poses_per_sec — same sustained e2e rate for the
                            stage-1 (GAT lifter pretrain) recipe
  spread                  — relative spread (max-min)/median of the BEST
                            3 of 5 repeated headline per-step
                            measurements (trimmed: one relay hiccup must
                            not poison the noise metric); >0.01 prints a
                            stderr warning — the headline is not
                            regression-trackable that run

Methodology: every device timing runs the iteration loop on device inside
one jitted lax.fori_loop with a serial dependency between iterations,
synced by fetching a scalar; per-step time is the difference between a
long and a short loop, which cancels dispatch/transfer overhead (this box
reaches the TPU through a relay with ~30 ms round-trip latency, so naive
per-dispatch timing and `block_until_ready` are unreliable).
"""
from __future__ import annotations

import json
import os
import statistics
import time

import jax

# persistent compilation cache: repeat bench runs skip the multi-minute
# remote compiles through the TPU relay
from gator_tpu.cli._cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax.numpy as jnp
import numpy as np
from jax import lax

BATCH = 2048
TRAIN_BATCH = 512
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


def _per_step(loop, *args, l_short=L_SHORT, l_long=L_LONG, repeats=2):
    t_short = min(_timed(loop, *args, l_short) for _ in range(repeats))
    t_long = min(_timed(loop, *args, l_long) for _ in range(repeats))
    return (t_long - t_short) / (l_long - l_short)


def _jit_serving(fn):
    """jit a serving fn with its weights as a runtime argument (constargs
    contract) — closure-constant weights make the relay compile
    pathological (gator_tpu/constargs.py)."""
    jitted = jax.jit(fn.with_consts)
    return lambda pose: jitted(fn.const_args, pose)


def bench_kernel_parity(spec, variables):
    """On-chip numerics gate for the fused Pallas kernels (VERDICT r2 §2):
    one batch through the fused serving path vs the math-identical pure-XLA
    forms ON THE TPU — the layer interpret-mode tests cannot exercise the
    real Mosaic lowering (A&S erf polynomial, f32 accumulate paths, pad-row
    masks). Returns (max_abs_diff_f32, max_abs_diff_bf16) in meters over
    the mesh output; f32 must be <=1e-4 m (the BASELINE parity target) or
    the bench aborts."""
    from gator_tpu.serving import make_serving_fn

    pose = jnp.asarray(
        np.random.default_rng(7).normal(size=(256, 17, 2)), jnp.float32)
    with jax.default_matmul_precision("highest"):
        ref_mesh, _ = _jit_serving(make_serving_fn(
            spec, variables, dtype=jnp.float32, use_fused=False))(pose)
        fused_mesh, _ = _jit_serving(make_serving_fn(
            spec, variables, dtype=jnp.float32))(pose)
    bf16_mesh, _ = _jit_serving(make_serving_fn(
        spec, variables, dtype=jnp.bfloat16))(pose)
    d32 = float(jnp.max(jnp.abs(fused_mesh - ref_mesh)))
    d16 = float(jnp.max(jnp.abs(bf16_mesh.astype(jnp.float32) - ref_mesh)))
    assert d32 <= 1e-4, (
        f"on-chip fused-kernel f32 parity FAILED: max|diff| = {d32:.2e} m "
        f"> 1e-4 m (bf16 path diff {d16:.2e} m)")
    return d32, d16


def bench_serving(spec, variables):
    from gator_tpu.serving import make_serving_fn

    serving_fn = make_serving_fn(spec, variables, dtype=jnp.bfloat16)
    # weights threaded as a runtime arg (constargs contract), bound here
    # so the timed call signature stays loop(pose, n)
    raw, cargs = serving_fn.with_consts, serving_fn.const_args
    jloop = jax.jit(lambda c, p, n: _loop_forward(
        lambda q: raw(c, q), p, n))
    loop = lambda p, n: jloop(cargs, p, n)

    pose = jnp.asarray(
        np.random.default_rng(0).normal(size=(BATCH, 17, 2)), jnp.float32)
    _timed(loop, pose, L_SHORT)   # compile + warm

    # 5 measurements x 3 repeats each; spread over the best 3 of 5
    # (trimmed): a single relay hiccup (tens of ms against a ~60 ms
    # long-loop run) must not poison the noise metric — round 4's 0.0495
    # spread was exactly that, one outlier among 3x2 samples. The
    # headline stays min() (the hiccup-free step time).
    steps = sorted(_per_step(loop, pose, repeats=3) for _ in range(5))
    per_step = steps[0]
    best3 = steps[:3]
    spread = (best3[-1] - best3[0]) / statistics.median(best3)

    # single-pose latency: same two-length trick at B=1, median of repeats;
    # loops are long (64/512) so the delta (~tens of ms) clears the relay
    # jitter — short loops measured negative deltas
    pose1 = pose[:1]
    _timed(loop, pose1, 64)       # compile + warm (new batch shape)
    lat = statistics.median(
        _per_step(loop, pose1, l_short=64, l_long=512) for _ in range(5))
    return BATCH / per_step, max(lat, 0.0) * 1e3, spread


def bench_train(spec, variables, faces, j_regressor):
    """Full stage-2 train step (reference hot loop: lib/core/base.py:122-183)
    on synthetic tensors of the real training shapes.

    Returns (fused_pps, f32_pps): the production config — bf16 compute,
    fused GAT + LBF training kernels (in-kernel dropout + custom VJP),
    B=512 (the best measured operating point; B=2048 also fits now but
    amortizes slightly worse) — and the reference-parity config
    (f32 XLA, B=512, the only batch that fits without the kernels)."""
    import optax

    from gator_tpu import losses
    from gator_tpu.train import TrainState
    from gator_tpu.train.loop import make_gator_train_step

    tx = optax.adam(1e-4)
    j, v = spec.gat.num_joint, spec.mdr.full_num

    def measure(step_kwargs, b):
        step = make_gator_train_step(
            spec, faces, j_regressor, losses.LossWeights(), tx,
            **step_kwargs)
        with jax.default_device(jax.devices("cpu")[0]):
            state = TrainState.create(
                jax.tree_util.tree_map(np.asarray, dict(variables)), tx)
        state = jax.device_put(state, jax.devices()[0])
        rng = np.random.default_rng(1)
        batch = {
            "pose2d": rng.normal(size=(b, j, 2)).astype(np.float32),
            "mesh": rng.normal(size=(b, v, 3)).astype(np.float32) * 0.1,
            "lift_pose3d": rng.normal(size=(b, j, 3)).astype(
                np.float32) * 100,
            "reg_pose3d": rng.normal(size=(b, 17, 3)).astype(
                np.float32) * 100,
            "mesh_valid": np.ones((b, v, 1), np.float32),
            "lift_valid": np.ones((b, j, 1), np.float32),
            "reg_valid": np.ones((b, 17, 1), np.float32),
        }
        batch = jax.device_put(
            {k: jnp.asarray(x) for k, x in batch.items()},
            jax.devices()[0])
        key = jax.random.PRNGKey(0)
        edge_on = jnp.asarray(1.0)

        def loop(st, n):
            def body(_, s):
                s, _m = step(s, batch, key, edge_on)
                return s
            st = lax.fori_loop(0, n, body, st)
            return jax.tree_util.tree_leaves(st.params)[0].ravel()[0]

        jloop = jax.jit(loop)
        _timed(jloop, state, 2)       # compile + warm
        per_step = _per_step(jloop, state, l_short=2, l_long=8)
        return b / per_step

    fused_pps = measure(dict(dtype=jnp.bfloat16, fused=True), TRAIN_BATCH)
    f32_pps = measure({}, TRAIN_BATCH)
    return fused_pps, f32_pps


def bench_train_e2e(cfg_path="configs/gator_synthetic_e2e.yml",
                    synthetic_n=20480):
    """Sustained END-TO-END training rate: the real CLI data path
    (BatchPipeline + prefetch worker) feeding the fused train step with
    the production fast recipe of `cfg_path` (device-side input pipeline
    + multi-step scan dispatch). Epoch 1 compiles; epoch 2 is timed.
    Unlike train_poses_per_sec (the step alone in an on-device loop),
    this includes input assembly, host->device traffic, GT synthesis,
    and dispatch overhead. Works for both stages and all gt_in_step fast
    modes (full: index-only batches; packed: host 2D input + device
    targets; device: index-only batches with IN-STEP detector-noise
    synthesis — what "auto" picks for the detector-input flagship
    recipe)."""
    from gator_tpu.cli.common import Session
    from gator_tpu.config import load_config
    from gator_tpu.parallel import (EpochDeviceStream, make_mesh, replicate,
                                    superbatch_sharding)
    from gator_tpu.train import (TrainState, jit_data_parallel,
                                 make_multi_step)

    cfg = load_config(cfg_path)
    k = cfg.TRAIN.steps_per_dispatch
    sess = Session(cfg, is_train=True, synthetic=True,
                   synthetic_n=synthetic_n)
    tx = sess.make_optimizer()
    train_step, _ = sess.make_steps(tx)
    with jax.default_device(jax.devices("cpu")[0]):
        state = TrainState.create(sess.init_variables(), tx)
    mesh = make_mesh()
    state = replicate(mesh, state)
    dstep = jit_data_parallel(train_step, mesh)
    dmulti = jit_data_parallel(make_multi_step(train_step), mesh,
                               batch_spec=superbatch_sharding(mesh))
    # epoch-resident batch stream (cli/train.py's fast path): ONE
    # device_put per epoch, per-dispatch payloads sliced on device
    sess.pipeline.chunk = k
    sess.pipeline.epoch_transfer = EpochDeviceStream(mesh, k)
    rng = jax.random.PRNGKey(0)
    extra = (rng, jnp.asarray(1.0)) if sess.is_gator else (rng,)

    def epoch(state, epoch_id):
        sess.pipeline.set_epoch(epoch_id)
        n_done, t0 = 0, time.perf_counter()
        loss = jnp.asarray(0.0)
        # epoch_transfer + chunk>1 yields (payload, n) pairs; chunk==1
        # would yield bare payloads (same normalization as cli/train.py)
        for item in sess.pipeline:
            payload, n = item if k > 1 else (item, 1)
            state, m = (dmulti if n > 1 else dstep)(state, payload,
                                                    *extra)
            loss = loss + m["loss"] * n
            n_done += n
        float(loss)        # sync: epoch truly finished
        return state, n_done * cfg.TRAIN.batch_size / (
            time.perf_counter() - t0)

    state, _ = epoch(state, 1)          # compile + warm
    _, pps = epoch(state, 2)
    return pps


def bench_serve_latency(spec, variables):
    """HOST-VISIBLE request latency through the serving path: numpy
    keypoints in -> device dispatch -> mesh fetched back to host numpy.
    Unlike p50_latency_ms (the on-device MARGINAL iteration time), this
    includes jit dispatch and BOTH transfer directions — on a
    relay-attached host that is dominated by the ~30 ms round-trip, which
    is what an actual client of cli/serve.py experiences. Returns
    (p50_b1_ms, p99_b1_ms, p50_b64_ms) over 40 requests each."""
    from gator_tpu.serving import make_serving_fn

    fn = _jit_serving(make_serving_fn(spec, variables,
                                      dtype=jnp.bfloat16))
    rng = np.random.default_rng(3)

    def percentiles(b, reps=40):
        pose = rng.normal(size=(b, 17, 2)).astype(np.float32)
        np.asarray(fn(jnp.asarray(pose))[0])        # compile + warm
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            mesh, _ = fn(jnp.asarray(pose))
            np.asarray(mesh)                        # host fetch completes
            times.append((time.perf_counter() - t0) * 1e3)
        return (float(np.percentile(times, 50)),
                float(np.percentile(times, 99)))

    p50_1, p99_1 = percentiles(1)
    p50_64, _ = percentiles(64)
    return p50_1, p99_1, p50_64


def bench_host_pipeline(assets):
    """Host-side batch-assembly rate: everything `make_batch` does on the
    host CPU (crop/normalize, augmentation draws, noise, masks, ordering)
    with GT synthesis excluded — in training the SMPL synthesis runs on
    the accelerator (device-resident mesh path) and overlaps the train
    step, so the host supply rate is the assembly rate."""
    import numpy as np_
    from gator_tpu.data import processing
    from gator_tpu.data.gt_synth import GtSynthesizer
    from gator_tpu.data.synthetic import SyntheticDataset

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        synth = GtSynthesizer(assets)
        opts = processing.ProcessOptions(is_train=True)
        ds = SyntheticDataset(assets, opts, n=BATCH, seed=0,
                              synthesizer=synth)
        rng = np_.random.default_rng(0)
        idx = np_.arange(BATCH)
        t = ds.table
        out = synth.synthesize(
            t.pose[idx], t.shape[idx], t.trans[idx], t.cam_r[idx],
            t.cam_t[idx], t.focal[idx], t.princpt[idx],
            joint_cam_h36m=(t.joint_cam_h36m[idx]
                            - t.joint_cam_h36m[idx][:, :1]))
        mesh_rel = synth.mesh_rel_m(out["mesh_mm"],
                                    t.joint_cam_h36m[idx][:, :1])
        args = (idx, mesh_rel, out["joint_cam_coco"],
                out["joint_img_coco"],
                np_.zeros(BATCH, np_.float32), rng, "gator")
        ds._assemble(*args)         # warm
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            ds._assemble(*args)
        dt = time.perf_counter() - t0
    return reps * BATCH / dt


def main():
    from gator_tpu.assets import build_assets
    from gator_tpu.models import GatorSpec, init_gator

    assets = build_assets("human36", synthetic_vertex_num=6890)
    spec = GatorSpec.from_assets(assets, embed_dim=128, depth=6, alpha=False)
    # initialize on host CPU (remote-compiling the init program through the
    # TPU relay costs minutes); transfer params to the chip afterwards
    with jax.default_device(jax.devices("cpu")[0]):
        variables = init_gator(spec, jax.random.PRNGKey(0))
    variables = jax.device_put(variables, jax.devices()[0])

    kdiff32, kdiff16 = bench_kernel_parity(spec, variables)
    poses_per_sec, p50_ms, spread = bench_serving(spec, variables)
    serve_p50_1, serve_p99_1, serve_p50_64 = bench_serve_latency(
        spec, variables)
    train_pps, train_f32_pps = bench_train(spec, variables, assets.faces,
                                           assets.j_regressor_h36m)
    train_e2e_pps = bench_train_e2e()
    train_e2e_det_pps = bench_train_e2e(
        "configs/gator_synthetic_e2e_det.yml", synthetic_n=4096)
    train_stage1_pps = bench_train_e2e(
        "configs/gat_synthetic_e2e.yml", synthetic_n=16384)
    host_pps = bench_host_pipeline(assets)

    if spread > 0.01:
        # regression guard (stderr — stdout stays one JSON line): the
        # serving headline is tracked at the ±0.1% level and a noisy
        # measurement session can't support that
        import sys
        print(f"WARNING: bench spread {spread:.4f} > 0.01 — headline "
              "not regression-trackable this run (relay noise?)",
              file=sys.stderr)

    print(json.dumps({
        "metric": "poses_per_sec_per_chip",
        "value": round(poses_per_sec, 1),
        "unit": "poses/s",
        "vs_baseline": round(poses_per_sec / 10000.0, 3),
        "p50_latency_ms": round(p50_ms, 3),
        "serve_request_p50_ms_b1": round(serve_p50_1, 2),
        "serve_request_p99_ms_b1": round(serve_p99_1, 2),
        "serve_request_p50_ms_b64": round(serve_p50_64, 2),
        "train_poses_per_sec": round(train_pps, 1),
        "train_e2e_poses_per_sec": round(train_e2e_pps, 1),
        "train_e2e_det_poses_per_sec": round(train_e2e_det_pps, 1),
        "train_stage1_e2e_poses_per_sec": round(train_stage1_pps, 1),
        "train_f32_xla_poses_per_sec": round(train_f32_pps, 1),
        "host_batch_poses_per_sec": round(host_pps, 1),
        "spread": round(spread, 4),
        "kernel_max_abs_diff_f32": kdiff32,
        "kernel_max_abs_diff_bf16": kdiff16,
    }))


if __name__ == "__main__":
    main()

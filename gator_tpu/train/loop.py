"""Jitted train/eval steps for both training stages.

Stage 1 (GAT pretrain) and stage 2 (full GATOR) mirror the reference's
LiftTrainer / Trainer loops (reference: lib/core/base.py:122-183, 279-315)
but as pure functions: one XLA program per step, batch sharded over the dp
mesh axis, gradient all-reduce inserted by GSPMD, dropout driven by explicit
PRNG keys folded with the step counter.
"""
from __future__ import annotations

import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import losses, metrics
from ..models import GAT, GATOR, GatSpec, GatorSpec
from ..parallel import mesh as pmesh
from .state import TrainState


def make_gator_train_step(
    spec: GatorSpec,
    faces: np.ndarray,
    j_regressor_target: np.ndarray,       # [17, V0] target joint set
    weights: losses.LossWeights,
    tx: optax.GradientTransformation,
    dtype=jnp.float32,
    remat: bool = False,
    fused: bool = False,
    fused_interpret: bool = False,
    fused_opts: Optional[Dict] = None,
) -> Callable:
    """Stage-2 step. batch dict keys: pose2d [B,J,2], mesh [B,V,3] (m),
    lift_pose3d [B,J,3] (mm), reg_pose3d [B,17,3] (mm), and validity masks
    mesh_valid / lift_valid / reg_valid that broadcast against their
    targets ([B,1,1] per-sample masks from the pipeline; [B,V,1]-style
    per-element masks also work).

    dtype=bfloat16 runs the model compute in bf16 with f32 master params
    (losses and the optimizer stay f32). remat=True rematerializes the
    whole forward in the backward pass (policy: save nothing), capping the
    activation footprint — the [B, H, 431, 431] attention-probability
    tensors otherwise pin HBM and cap the batch size. fused=True (TPU)
    routes the MDR LBF stack through the training Pallas kernels
    (in-kernel PRNG dropout + hand-derived VJP, train/fused_forward.py):
    no probability tensor ever reaches HBM in either pass.
    """
    model = GATOR(spec=spec, dtype=dtype)
    has_bn = not spec.mdr.alpha
    j_reg = jnp.asarray(j_regressor_target)

    if fused:
        from .fused_forward import make_fused_forward
        apply_model = make_fused_forward(spec, dtype=dtype,
                                         interpret=fused_interpret,
                                         **(fused_opts or {}))
    else:
        def apply_model(params, batch_stats, pose2d, dropout_rng):
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = batch_stats
                (mesh, lift_pose), upd = model.apply(
                    variables, pose2d, deterministic=False,
                    use_running_average=False,
                    rngs={"dropout": dropout_rng},
                    mutable=["batch_stats"])
                new_bs = upd["batch_stats"]
            else:
                mesh, lift_pose = model.apply(
                    variables, pose2d, deterministic=False,
                    rngs={"dropout": dropout_rng})
                new_bs = batch_stats
            return mesh, lift_pose, new_bs

    if remat and not fused:
        apply_model = jax.checkpoint(
            apply_model,
            policy=jax.checkpoint_policies.nothing_saveable)

    def step(state: TrainState, batch: Dict[str, jnp.ndarray],
             rng: jax.Array, edge_enabled: jnp.ndarray):
        dropout_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            mesh, lift_pose, new_bs = apply_model(
                params, state.batch_stats, batch["pose2d"], dropout_rng)
            mesh = mesh.astype(jnp.float32)
            lift_pose = lift_pose.astype(jnp.float32)
            # mesh->target-joint regression in mm (reference: base.py:136);
            # mesh is f32 here and the reg_joint loss is parity math — pin
            # true-f32 (the [17,6890] dot is ~0.4 GFLOP/batch, negligible)
            pred_pose = jnp.einsum("jv,bvc->bjc", j_reg, mesh * 1000.0,
                                   precision=jax.lax.Precision.HIGHEST)
            out = losses.gator_loss(
                mesh, pred_pose, lift_pose,
                batch["mesh"], batch["reg_pose3d"], batch["lift_pose3d"],
                batch["mesh_valid"], batch["reg_valid"],
                batch["lift_valid"],
                faces, weights, edge_enabled,
                face_loss_dtype=(dtype if dtype != jnp.float32
                                 else None))
            return out.total, (out, new_bs)

        grads, (out, new_bs) = jax.grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(tx, grads, new_bs)
        metrics_out = {
            "loss": out.total, "vertex": out.vertex, "normal": out.normal,
            "edge": out.edge, "reg_joint": out.reg_joint,
            "lift_joint": out.lift_joint,
        }
        return state, metrics_out

    return step


def make_gator_eval_step(
    spec: GatorSpec,
    j_regressor_target: np.ndarray,
    eval_joints,
    dtype=jnp.float32,
) -> Callable:
    """Per-batch eval: returns PER-SAMPLE joint/surface errors [B] plus
    per-sample predictions, matching compute_both_err semantics
    (reference: Human36M/dataset.py:466-478). The caller aggregates exact
    sums/counts over batches — the reference accumulates running sums, not
    means of batch means (reference: lib/core/base.py:224-230)."""
    model = GATOR(spec=spec, dtype=dtype)
    j_reg = jnp.asarray(j_regressor_target)
    eval_idx = tuple(eval_joints) if eval_joints is not None else None

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        # checkpoint-parity evals need true-f32 matmuls: the TPU default is
        # bf16 passthrough, which costs ~5 mm on meter-scale meshes (the
        # BASELINE target is <=0.1 mm)
        with jax.default_matmul_precision("highest"):
            mesh, lift_pose = model.apply(
                state.model_variables(), batch["pose2d"],
                deterministic=True)
            mesh_mm = mesh * 1000.0
            gt_mesh_mm = batch["mesh"] * 1000.0
            # joint regression is parity-critical too — keep it inside
            # the HIGHEST-precision scope (bf16 rounding is O(1) mm at
            # mm-scale meshes)
            pred_pose = jnp.einsum("jv,bvc->bjc", j_reg, mesh_mm)
        gt_pose = batch["reg_pose3d"]
        # root-align mesh by joint roots, joints by their own roots
        s_err = metrics.mpvpe(mesh_mm, gt_mesh_mm,
                              pred_pose[:, :1], gt_pose[:, :1],
                              per_sample=True)
        j_err = metrics.mpjpe(pred_pose, gt_pose, eval_joints=eval_idx,
                              per_sample=True)
        return {"joint_err": j_err, "surface_err": s_err,
                "pred_mesh_mm": mesh_mm, "pred_pose_mm": pred_pose}

    return step


def make_gat_train_step(
    spec: GatSpec,
    tx: optax.GradientTransformation,
    dtype=jnp.float32,
    fused: bool = False,
    fused_interpret: bool = False,
) -> Callable:
    """Stage-1 (lifter pretrain) step: CoordLoss on the lifted joints
    (reference: lib/core/base.py:279-315). batch keys: pose2d [B,J,2],
    joint_cam [B,J,3], joint_valid [B,J,1]. fused=True routes the
    6-block trunk through the training Pallas kernels (in-kernel PRNG
    dropout + custom VJP, nn/pallas_gat_train.py)."""
    model = GAT(spec=spec, dtype=dtype)

    if fused:
        from ..nn.pallas_gat_train import gat_trunk_train
        from ..serving import gat_serving_forward

        def apply_gat(params, pose2d_flat, dropout_rng):
            b = pose2d_flat.shape[0]
            seed = jax.random.randint(
                dropout_rng, (1,), 0, jnp.iinfo(jnp.int32).max,
                dtype=jnp.int32)

            def trunk(x, bias, block_params):
                return gat_trunk_train(
                    x, bias, block_params, spec.masks_xfeat,
                    spec.num_heads, seed,
                    attn_rate=spec.attn_drop_rate,
                    proj_rate=spec.drop_rate,
                    drop_path_rate=spec.drop_path_rate,
                    interpret=fused_interpret)

            pose3d, _ = gat_serving_forward(
                spec, params, pose2d_flat.reshape(b, spec.num_joint, 2),
                dtype=dtype, trunk=trunk)
            return pose3d
    else:
        def apply_gat(params, pose2d_flat, dropout_rng):
            pose3d, _ = model.apply(
                {"params": params}, pose2d_flat,
                deterministic=False, rngs={"dropout": dropout_rng})
            return pose3d

    def step(state: TrainState, batch: Dict[str, jnp.ndarray],
             rng: jax.Array):
        dropout_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            pose3d = apply_gat(
                params,
                batch["pose2d"].reshape(batch["pose2d"].shape[0], -1),
                dropout_rng)
            pose3d = pose3d.reshape(
                -1, spec.num_joint, 3).astype(jnp.float32)
            return losses.coord_l1_loss(
                pose3d, batch["joint_cam"], batch["joint_valid"])

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(tx, grads)
        return state, {"loss": loss}

    return step


def make_gat_eval_step(spec: GatSpec, eval_joints,
                       dtype=jnp.float32) -> Callable:
    model = GAT(spec=spec, dtype=dtype)
    eval_idx = tuple(eval_joints) if eval_joints is not None else None

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        # same HIGHEST-precision rule as make_gator_eval_step: stage-1
        # best-model selection rides this MPJPE, and the TPU's default
        # bf16 matmul passthrough costs O(1) mm
        with jax.default_matmul_precision("highest"):
            pose3d, _ = model.apply(
                state.model_variables(),
                batch["pose2d"].reshape(batch["pose2d"].shape[0], -1),
                deterministic=True)
        pose3d = pose3d.reshape(-1, spec.num_joint, 3)
        err = metrics.mpjpe(pose3d, batch["joint_cam"],
                            eval_joints=eval_idx, per_sample=True)
        return {"joint_err": err, "pred_pose_mm": pose3d}

    return step


_RAW_BATCH_KEYS = ("smpl_pose", "smpl_shape", "smpl_trans", "cam_r",
                   "cam_t", "mesh_root_mm")


def with_gt_synthesis(step_fn: Callable, synth, fitting_thr: float,
                      gender: str = "neutral") -> Callable:
    """Fuse GT mesh synthesis INTO the jitted train step.

    Consumes raw batches (`SmplPoseDataset.make_raw_batch`): instead of a
    [B, V, 3] mesh target, the batch carries raw SMPL/camera parameters,
    and the step synthesizes the mesh + fit-validity mask on device as
    part of the same XLA program. Same math as the pipeline-side
    synthesis (GtSynthesizer.smpl_mesh_cam / fitting_error — reference:
    Human36M/dataset.py:254-309), equal to ~1 ulp of XLA fusion
    reordering (test-pinned); what changes is the system shape: batches
    become ~100 host floats per
    sample, no device array ever sits in the prefetch queue, and a
    multi-step scan (make_multi_step) amortizes the per-dispatch overhead
    over the synthesis too."""
    from ..constargs import bind_consts
    from ..data.gt_synth import (fit_valid_mask_fn, fitting_error_fn,
                                 mesh_cam_fn)

    consts = {"smpl": synth.params[gender],
              "mean_b": synth.mean_betas[gender],
              "j_reg_h36m": synth.j_reg_h36m}

    def raw_step(c, state: TrainState, batch: Dict[str, jnp.ndarray],
                 *extra):
        mesh_mm, _ = mesh_cam_fn(
            c["smpl"], c["mean_b"],
            batch["smpl_pose"], batch["smpl_shape"], batch["smpl_trans"],
            batch["cam_r"], batch["cam_t"])
        inner = {k: v for k, v in batch.items()
                 if k not in _RAW_BATCH_KEYS}
        inner["mesh"] = ((mesh_mm - batch["mesh_root_mm"])
                         / 1000.0).astype(jnp.float32)
        # the fit-gate target IS reg_pose3d (root-relative h36m joints,
        # un-augmented on this path — make_raw_batch drops the duplicate)
        fit = fitting_error_fn(c["j_reg_h36m"], batch["reg_pose3d"],
                               mesh_mm)
        inner["mesh_valid"] = fit_valid_mask_fn(fit, fitting_thr)
        ones = jnp.ones_like(inner["mesh_valid"])
        inner["lift_valid"] = ones
        inner["reg_valid"] = ones
        return step_fn(state, inner, *extra)

    return bind_consts(raw_step, consts)


def make_multi_step(step_fn: Callable) -> Callable:
    """Wrap a per-batch train step into a K-step on-device loop.

    `multi(state, superbatch, *extra)` scans `step_fn` over the leading
    (step) axis of a [K, B, ...] super-batch (`parallel.stack_batches`)
    and returns (state after K steps, per-key metrics averaged over the K
    steps). One dispatch then covers K optimizer steps — the host-side
    per-step costs (jit dispatch, transfer setup, and on high-latency
    hosts the device round-trip) amortize K-fold. Per-step dropout keys
    stay exact: each inner step folds the epoch rng with `state.step`,
    which advances inside the scan, so K scanned steps use bit-identical
    keys to K separate dispatches (the reference's loop granularity,
    lib/core/base.py:122-183, is reproduced exactly — equivalence is
    test-pinned).

    A step carrying device-resident tables (constargs contract) keeps
    them as a runtime argument of the scanned program: the tables are
    loop-invariant, so XLA hoists the gathers' operand once.
    """
    raw = getattr(step_fn, "with_consts", None)

    def multi(state: TrainState, superbatch, *extra):
        def body(st, b):
            st, m = step_fn(st, b, *extra)
            return st, m
        state, ms = jax.lax.scan(body, state, superbatch)
        return state, jax.tree_util.tree_map(
            lambda x: jnp.mean(x, axis=0), ms)

    if raw is None:
        return multi

    from ..constargs import bind_consts

    def raw_multi(consts, state: TrainState, superbatch, *extra):
        def body(st, b):
            st, m = raw(consts, st, b, *extra)
            return st, m
        state, ms = jax.lax.scan(body, state, superbatch)
        return state, jax.tree_util.tree_map(
            lambda x: jnp.mean(x, axis=0), ms)

    return bind_consts(raw_multi, step_fn.const_args)


def jit_data_parallel(step_fn: Callable, mesh,
                      donate_state: bool = True,
                      n_array_args: int = 1,
                      batch_spec=None) -> Callable:
    """jit a step over a dp mesh: state (arg 0) replicated, the next
    n_array_args args batch-sharded (or `batch_spec`-sharded — pass
    `parallel.superbatch_sharding(mesh)` for a multi-step [K, B, ...]
    batch), everything after replicated.

    Steps carrying device-resident tables (constargs contract: a
    `.with_consts(consts, state, batch, ...)` raw form) are jitted in
    that raw form with the const pytree as a REPLICATED leading runtime
    argument — embedding multi-MB tables as closure constants makes the
    relay compile pathological (measured ~100x; see gator_tpu/constargs)."""
    rep = pmesh.replicated(mesh)
    bsh = batch_spec if batch_spec is not None \
        else pmesh.batch_sharding(mesh)
    raw = getattr(step_fn, "with_consts", None)
    n_const_args = 0 if raw is None else 1
    fn = step_fn if raw is None else raw

    def specs_for(n_args):
        out = [rep] * n_const_args          # const tables: replicated
        out += [rep]                        # state: replicated
        out += [bsh] * n_array_args         # batch: dp-sharded
        out += [rep] * (n_args - len(out))  # trailing extras: replicated
        return tuple(out)

    @functools.wraps(step_fn)
    def wrapped(*args):
        if raw is not None:
            return _get_jitted(1 + len(args))(step_fn.const_args, *args)
        return _get_jitted(len(args))(*args)

    @functools.lru_cache(maxsize=4)
    def _get_jitted(n_args):
        in_sh = specs_for(n_args)
        return jax.jit(
            fn, in_shardings=in_sh,
            donate_argnums=(n_const_args,) if donate_state else ())

    return wrapped

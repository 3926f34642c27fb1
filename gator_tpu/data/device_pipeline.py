"""Fully device-side input pipeline (TRAIN.gt_in_step="full").

The SoA annotation table lives in HBM (replicated over the dp mesh); each
training batch transfers only (row indices, flip flags, rotation angles)
— ~12 bytes per sample — and the jitted train step gathers the rows,
assembles/augments the 2D input, synthesizes the GT mesh (SMPL), and
gates losses, all inside one XLA program. On hosts that reach the TPU
through a relay this removes the per-batch host->device copy entirely
from the critical path; on any host it shrinks input bandwidth by ~50x.

The functions here are jnp ports of the host batch assembly
(`processing.batch_crop_and_normalize`'s GT branch and
`base.assemble_batch`'s 3D-target augmentation), test-pinned against the
numpy forms. Reference per-sample equivalents:
Human36M/dataset.py:339-419 (j2d/j3d processing inside __getitem__).

Scope (checked at construction): GT 2D input (detector noise draws
host-side rng) and a non-COCO joint set (the COCO input derives from the
fitted mesh) — detector-input / COCO-input / multi-dataset recipes ride
the packed pipeline (data/packed.py) instead. Gendered tables are
supported: one SMPL forward per gender present (static set) + per-row
select.
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _flip_perm(num_joint: int, flip_pairs) -> np.ndarray:
    perm = np.arange(num_joint)
    for a, b in np.asarray(flip_pairs).reshape(-1, 2):
        perm[a], perm[b] = perm[b], perm[a]
    return perm


def affine_crop(joint_img: jnp.ndarray, input_shape,
                rots: jnp.ndarray) -> jnp.ndarray:
    """Crop-space pixel joints: tight bbox -> aspect snap ->
    rotate-about-center affine (the first half of
    processing.batch_crop_and_normalize, before noise/flip/normalize)."""
    res_h, res_w = int(input_shape[0]), int(input_shape[1])
    aspect = input_shape[1] / input_shape[0]

    x0 = joint_img[..., 0].min(axis=1)
    x1 = joint_img[..., 0].max(axis=1)
    y0 = joint_img[..., 1].min(axis=1)
    y1 = joint_img[..., 1].max(axis=1)
    w = x1 - x0
    h = y1 - y0
    cx, cy = x0 + (w - 1) / 2.0, y0 + (h - 1) / 2.0
    bad = (w < 1.0) | (h < 1.0)
    w = w - 1.0
    h = h - 1.0
    h = jnp.where(w > aspect * h, w / aspect, h)
    w = jnp.where(w < aspect * h, h * aspect, w)
    w = jnp.where(bad, 1.0, w)
    cx = jnp.where(bad, 0.5, cx)
    cy = jnp.where(bad, 0.5, cy)

    rad = jnp.pi * rots / 180.0
    cs, sn = jnp.cos(rad), jnp.sin(rad)
    k = res_w / w
    rel = joint_img - jnp.stack([cx, cy], axis=1)[:, None, :]
    xr = cs[:, None] * rel[..., 0] + sn[:, None] * rel[..., 1]
    yr = -sn[:, None] * rel[..., 0] + cs[:, None] * rel[..., 1]
    return jnp.stack([xr * k[:, None] + res_w / 2.0,
                      yr * k[:, None] + res_h / 2.0], axis=-1)


def flip_standardize(out: jnp.ndarray, flip_perm: np.ndarray, input_shape,
                     flips: jnp.ndarray) -> jnp.ndarray:
    """Flip + [0,1] scaling + per-sample standardization (the second half
    of processing.batch_crop_and_normalize, after optional noise)."""
    res_h, res_w = int(input_shape[0]), int(input_shape[1])
    flipped = out[:, flip_perm]
    flipped = flipped.at[..., 0].set(res_w - flipped[..., 0] - 1)
    out = jnp.where((flips > 0)[:, None, None], flipped, out)

    out = out / jnp.asarray([[res_w, res_h]], jnp.float32)
    mean = out.mean(axis=1, keepdims=True)
    std = out.std(axis=1, keepdims=True)
    return ((out - mean) / std).astype(jnp.float32)


def crop_normalize_gt(joint_img: jnp.ndarray, flip_perm: np.ndarray,
                      input_shape, flips: jnp.ndarray,
                      rots: jnp.ndarray) -> jnp.ndarray:
    """jnp port of processing.batch_crop_and_normalize, GT-input branch:
    tight bbox -> aspect snap -> rotate-about-center affine -> flip ->
    [0,1] scaling -> per-sample standardization."""
    return flip_standardize(affine_crop(joint_img, input_shape, rots),
                            flip_perm, input_shape, flips)


def j3d_augment(s: jnp.ndarray, flip_perm: np.ndarray, flips: jnp.ndarray,
                rots: jnp.ndarray) -> jnp.ndarray:
    """jnp port of assemble_batch's batch_j3d: rotate the 3D target about
    z by -rot, flip-pair swap + x negation on flipped samples."""
    rad = -rots * jnp.pi / 180.0
    cs, sn = jnp.cos(rad), jnp.sin(rad)
    x = cs[:, None] * s[..., 0] - sn[:, None] * s[..., 1]
    y = sn[:, None] * s[..., 0] + cs[:, None] * s[..., 1]
    out = jnp.stack([x, y, s[..., 2]], axis=-1)
    fl = out[:, flip_perm]
    fl = fl.at[..., 0].set(-fl[..., 0])
    return jnp.where((flips > 0)[:, None, None], fl,
                     out).astype(jnp.float32)


GENDERS = ("neutral", "female", "male")


def _check_and_load_table(table, opts, need_smpl: bool):
    if not opts.use_gt_input:
        raise ValueError("device input pipeline: detector-noise input "
                         "draws host-side rng; needs use_gt_input "
                         "(the packed pipeline covers detector input)")
    if opts.input_joint_name == "coco":
        raise ValueError("device input pipeline: the COCO 2D input "
                         "derives from the fitted mesh on host "
                         "(the packed pipeline covers it)")
    tbl = {
        "joint_img": jnp.asarray(
            np.asarray(table.joint_img_h36m)[..., :2], jnp.float32),
        "joint_cam": jnp.asarray(table.joint_cam_h36m, jnp.float32),
    }
    if need_smpl:
        tbl.update({
            "pose": jnp.asarray(table.pose, jnp.float32),
            "shape": jnp.asarray(table.shape, jnp.float32),
            "trans": jnp.asarray(table.trans, jnp.float32),
            "cam_r": jnp.asarray(table.cam_r, jnp.float32),
            "cam_t": jnp.asarray(table.cam_t, jnp.float32),
        })
        # gendered rows: one SMPL forward per gender PRESENT in the table
        # (a static, build-time set — all-neutral tables keep the single
        # pass) with a per-row select, matching the host path's per-gender
        # grouping (base.make_batch; reference layers: lib/smpl.py:11-52)
        genders = tuple(
            g for code, g in enumerate(GENDERS)
            if (np.asarray(table.gender) == code).any()) or ("neutral",)
        tbl["_genders"] = genders
        if len(genders) > 1:
            tbl["gender"] = jnp.asarray(table.gender, jnp.int32)
    return tbl


def _gendered_mesh_cam(consts, genders, idx, pose, shape, trans, cam_r,
                       cam_t):
    """mesh_cam over every gender present in the table + per-row select;
    compiles to exactly one forward for all-neutral tables. `consts`
    carries the SMPL tables as traced arguments (constargs contract);
    `genders` is the static build-time gender set."""
    from .gt_synth import mesh_cam_fn

    out = None
    for g in genders:
        mesh_mm, _ = mesh_cam_fn(consts["smpl"][g], consts["mean_b"][g],
                                 pose, shape, trans, cam_r, cam_t)
        if out is None:
            out = mesh_mm
        else:
            sel = (consts["tbl"]["gender"][idx]
                   == GENDERS.index(g))[:, None, None]
            out = jnp.where(sel, mesh_mm, out)
    return out


def with_device_input_pipeline_gat(step_fn: Callable, table, jset,
                                   opts) -> Callable:
    """Stage-1 (GAT lifter pretrain) version of
    `with_device_input_pipeline`: no SMPL synthesis — the step assembles
    {pose2d, joint_cam, joint_valid} from the device-resident table
    (reference per-sample form: Human36M/dataset.py:409-419)."""
    from ..constargs import bind_consts

    tbl = _check_and_load_table(table, opts, need_smpl=False)
    perm = _flip_perm(jset.joint_num, jset.flip_pairs)
    input_shape = tuple(opts.input_shape)

    def raw_step(consts, state, batch: Dict[str, jnp.ndarray], *extra):
        t = consts["tbl"]
        idx = batch["idx"]
        flips, rots = batch["flips"], batch["rots"]
        jc = t["joint_cam"][idx]
        jh = jc - jc[:, :1]
        inner = {
            "pose2d": crop_normalize_gt(t["joint_img"][idx], perm,
                                        input_shape, flips, rots),
            "joint_cam": j3d_augment(jh, perm, flips, rots),
            "joint_valid": jnp.ones((idx.shape[0], 1, 1), jnp.float32),
        }
        return step_fn(state, inner, *extra)

    return bind_consts(raw_step, {"tbl": tbl})


def precompute_rows(fn: Callable, consts, n: int, chunk: int = 2048):
    """Run `fn(consts, rows) -> pytree of [chunk, ...]` over all n rows
    in device-sized chunks (lax.map: ONE compile) and return the
    concatenated [n, ...] pytree. The last chunk wraps around; the
    duplicate rows are sliced off. `consts` (the tables `fn` reads) is a
    runtime argument — see constargs: closure constants at table size
    make the relay compile pathological."""
    chunk = min(chunk, n)
    pad = (-n) % chunk
    idx = jnp.arange(n + pad) % n
    out = jax.jit(lambda c, ix: jax.lax.map(
        lambda i: fn(c, i), ix.reshape(-1, chunk)))(consts, idx)
    return jax.tree_util.tree_map(
        lambda a: a.reshape(n + pad, *a.shape[2:])[:n], out)


def with_device_input_pipeline(step_fn: Callable, synth, table, jset,
                               opts, fitting_thr: float,
                               mesh_cache: bool = False) -> Callable:
    """Wrap a stage-2 train step to run the WHOLE input pipeline on
    device from index-only batches (`SmplPoseDataset.make_index_batch`).
    The annotation table becomes jit constants (hoisted to HBM once,
    replicated over the dp mesh by GSPMD).

    mesh_cache=True: the GT mesh target and its fit-gate mask are
    EPOCH-INVARIANT per row (augmentation touches only the 2D input and
    the lift target — same as the host path, base.assemble_batch), so
    they precompute ONCE PER RUN into a device-resident [N, V, 3] table
    instead of re-running the SMPL forward every step of every epoch.
    Same math, same order — the per-step cost becomes a gather. Costs
    N*V*3*4 bytes of HBM; the session gates it by size
    (cfg.TRAIN.gt_mesh_cache)."""
    from .gt_synth import fit_valid_mask_fn, fitting_error_fn
    from ..constargs import bind_consts

    tbl = _check_and_load_table(table, opts, need_smpl=True)
    genders = tbl.pop("_genders")
    perm = _flip_perm(jset.joint_num, jset.flip_pairs)
    input_shape = tuple(opts.input_shape)
    consts = {
        "tbl": tbl,
        "smpl": {g: synth.params[g] for g in genders},
        "mean_b": {g: synth.mean_betas[g] for g in genders},
        "j_reg_h36m": synth.j_reg_h36m,
    }

    def mesh_and_valid(c, idx):
        """[B]-rows -> (mesh_rel [B, V, 3] meters, valid [B, 1, 1]) — the
        row-invariant target half of the step."""
        t = c["tbl"]
        jc = t["joint_cam"][idx]
        jh = jc - jc[:, :1]
        mesh_mm = _gendered_mesh_cam(
            c, genders, idx, t["pose"][idx], t["shape"][idx],
            t["trans"][idx], t["cam_r"][idx], t["cam_t"][idx])
        fit = fitting_error_fn(c["j_reg_h36m"], jh, mesh_mm)
        valid = fit_valid_mask_fn(fit, fitting_thr)
        return (((mesh_mm - jc[:, :1]) / 1000.0).astype(jnp.float32),
                valid)

    if mesh_cache:
        n = int(np.asarray(table.pose).shape[0])
        tbl["mesh_rel"], tbl["fit_valid"] = precompute_rows(
            mesh_and_valid, consts, n)

    def raw_step(c, state, batch: Dict[str, jnp.ndarray], *extra):
        t = c["tbl"]
        idx = batch["idx"]
        flips, rots = batch["flips"], batch["rots"]
        jc = t["joint_cam"][idx]
        jh = jc - jc[:, :1]
        if mesh_cache:
            mesh, valid = t["mesh_rel"][idx], t["fit_valid"][idx]
        else:
            mesh, valid = mesh_and_valid(c, idx)
        inner = {
            "pose2d": crop_normalize_gt(t["joint_img"][idx], perm,
                                        input_shape, flips, rots),
            "mesh": mesh,
            "lift_pose3d": j3d_augment(jh, perm, flips, rots),
            "reg_pose3d": jh.astype(jnp.float32),
            "mesh_valid": valid,
            "lift_valid": jnp.ones_like(valid),
            "reg_valid": jnp.ones_like(valid),
        }
        return step_fn(state, inner, *extra)

    return bind_consts(raw_step, consts)

"""Packed device pipeline: the detector-input / mixed-dataset / gendered
generalization of `device_pipeline` (TRAIN.gt_in_step="packed").

The GT-input "full" mode ships ~12 B/sample (row indices + aug params) and
assembles EVERYTHING in-step, but its scope is narrow: GT 2D input only
(detector noise draws host rng), one dataset, non-COCO joints. The packed
mode covers the recipes the reference actually ships — the flagship
H36M+COCO+MuCo detector-input mix (reference: asset/yaml/
gator_cocoJ_train_human36_coco_muco.yml, data/multiple_datasets.py) — by
splitting the work at the host/device boundary the data dictates:

  * host: the 2D INPUT path (`base.input_pose2d` — the exact code the
    host pipeline runs, so detector-noise synthesis
    [reference: lib/noise_utils.py:17, Human36M/dataset.py:421-438] and
    crop/flip/normalize are bitwise-identical GIVEN identical input
    joints; across the mode boundary the COCO-input joints come from the
    one-time chunked precompute instead of per-batch synthesis, which
    shifts ulps exactly like the host path's own batch composition does —
    the noise simulator's discrete draws are chaotic to that, so
    cross-path equivalence there is distributional, test-pinned),
    ~152 B/sample shipped;
  * device: every TARGET — the [B,V,3] GT mesh synthesized in-step from
    per-row EFFECTIVE SMPL inputs, lift/reg joint targets, and the
    fit-gate validity masks — gathered from one canonical device-resident
    table that concatenates all datasets in the mix.

The canonical table is built ONCE per session (`build_packed_tables`):
each dataset contributes epoch-invariant per-row columns via its
`packed_rows` hook (the dataset-specific SMPL path — camera-rotated
H36M [Human36M/dataset.py:254-300], plain COCO SMPLify fits
[COCO/dataset.py:147-166], translated MuCo [MuCo/dataset.py:196-216],
virtual-camera AMASS [AMASS/dataset.py:186-213] — folds into
(pose_eff, shape_eff, trans_off) with mesh = forward(pose_eff, shape_eff)
+ trans_off), the 2D input joints (COCO input derives from the fitted
mesh: COCO/dataset.py:182-194 — epoch-invariant, so precomputed), and the
fitting-filter masks with each dataset's zeroing policy.

Gendered rows are first-class: the step runs one SMPL forward per gender
PRESENT IN THE TABLE (a static, build-time set — all-neutral tables pay
exactly one pass) and selects per row (reference: lib/smpl.py:11-52).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..bodymodel.smpl import smpl_forward
from . import processing
from .base import input_pose2d
from .device_pipeline import (_flip_perm, affine_crop, flip_standardize,
                              j3d_augment)
from .gt_synth import prep_shape_fn

GENDER_CODES = {"neutral": 0, "female": 1, "male": 2}

# fold_in salt decorrelating the in-step detector-noise stream from the
# dropout stream (which is fold_in(rng, state.step) with no extra fold)
_NOISE_SALT = 0x6E6F69


@dataclasses.dataclass
class PackedTable:
    """Canonical per-row columns over the concatenated datasets (host
    numpy; the step wrapper hoists them to HBM as jit constants)."""

    pose_eff: np.ndarray         # [N, 72] effective axis-angle
    shape_eff: np.ndarray        # [N, 10] cleaned/substituted betas
    trans_off: np.ndarray        # [N, 3] mesh = fwd(...) + trans_off (m)
    root_mm: np.ndarray          # [N, 3] root joint (mm) for mesh_rel
    joint_cam_input: np.ndarray  # [N, J, 3] root-rel lift target (mm)
    reg_pose: np.ndarray         # [N, 17, 3] root-rel h36m target (mm)
    mesh_valid: np.ndarray       # [N] f32 fit gates (dataset policies
    reg_valid: np.ndarray        # [N]     pre-applied)
    lift_valid: np.ndarray       # [N]
    gat_valid: np.ndarray        # [N]
    gender: np.ndarray           # [N] int32 (GENDER_CODES)
    joint_img_input: np.ndarray  # [N, J, 2] input pixel joints (host 2D)
    # device-input extras (gt_in_step="device"): epoch-invariant per-row
    # OKS crop area driving the detector-noise radii, the rows whose
    # dataset applies h36m Gaussian noise, and that noise's [J,5] stats
    crop_area: Optional[np.ndarray] = None       # [N] f32
    h36m_noise_on: Optional[np.ndarray] = None   # [N] f32 0/1
    h36m_stats: Optional[np.ndarray] = None      # [J, 5] or None

    def __len__(self):
        return self.pose_eff.shape[0]

    @property
    def genders_present(self):
        return tuple(g for g, c in GENDER_CODES.items()
                     if (self.gender == c).any())


@dataclasses.dataclass
class PackedView:
    """Per-dataset host-side view used by `make_packed_batch`."""

    joint_img_input: np.ndarray   # [n, J, 2]
    row_offset: int
    h36m_stats: Optional[np.ndarray]


def valid_masks(bad: np.ndarray, zero_gator=("mesh",),
                zero_gat: bool = False) -> Dict[str, np.ndarray]:
    """Materialize the per-row fit-gate masks from a dataset's zeroing
    policy (the bad_zero_* arguments of `base.assemble_batch`)."""
    good = (~np.asarray(bad, bool)).astype(np.float32)
    ones = np.ones_like(good)
    return {
        "mesh_valid": good if "mesh" in zero_gator else ones,
        "reg_valid": good if "reg" in zero_gator else ones,
        "lift_valid": good if "lift" in zero_gator else ones,
        "gat_valid": good if zero_gat else ones,
    }


_COLUMNS = ("pose_eff", "shape_eff", "trans_off", "root_mm",
            "joint_cam_input", "reg_pose", "mesh_valid", "reg_valid",
            "lift_valid", "gat_valid", "gender", "joint_img_input")


def build_packed_tables(datasets: Sequence, synth,
                        chunk: int = 2048) -> PackedTable:
    """Run every dataset's `packed_rows` precompute in device-sized chunks,
    concatenate into one canonical table, and attach each dataset's
    `PackedView` (enabling its `make_packed_batch`). One-time cost: one
    SMPL synthesis pass over the table (the same work one training epoch's
    GT synthesis does)."""
    cols: Dict[str, list] = {k: [] for k in _COLUMNS}
    offset = 0
    areas = []
    for ds in datasets:
        if not hasattr(ds, "packed_rows"):
            raise ValueError(
                f"{type(ds).__name__} has no packed_rows precompute — "
                "the packed device pipeline cannot cover it")
        imgs = []
        for i in range(0, len(ds), chunk):
            rows = ds.packed_rows(synth, np.arange(i, min(i + chunk,
                                                          len(ds))))
            for k in _COLUMNS:
                cols[k].append(np.asarray(rows[k]))
            imgs.append(np.asarray(rows["joint_img_input"]))
        ds._packed = PackedView(
            joint_img_input=np.concatenate(imgs).astype(np.float32),
            row_offset=offset,
            h36m_stats=getattr(ds, "_h36m_stats", None))
        # OKS crop area is a pure function of the (epoch-invariant) input
        # joints and THIS dataset's crop geometry — matching the host
        # path, which calls crop_area with each dataset's own opts
        areas.append(processing.crop_area_batch(
            ds._packed.joint_img_input, ds.opts))
        offset += len(ds)
    table = PackedTable(**{k: np.concatenate(cols[k]) for k in _COLUMNS})
    # device-input extras: rows inherit their dataset's h36m-noise
    # eligibility and (shared) stats
    table.crop_area = np.concatenate(areas)
    noise_on, stats = [], None
    for ds in datasets:
        s = ds._packed.h36m_stats
        noise_on.append(np.full(len(ds), 0.0 if s is None else 1.0,
                                np.float32))
        if s is not None:
            if stats is not None and not np.array_equal(stats, s):
                raise ValueError("packed table: datasets disagree on "
                                 "h36m noise stats")
            stats = np.asarray(s, np.float32)
    table.h36m_noise_on = np.concatenate(noise_on)
    table.h36m_stats = stats
    return table


def make_packed_batch(ds, indices: np.ndarray,
                      rng: np.random.Generator) -> Dict[str, np.ndarray]:
    """Host batch for the packed pipeline: global row ids, aug params, and
    the fully-assembled 2D input (`base.input_pose2d` — the same function,
    rng draw order, and noise machinery as the host `make_batch` path,
    so the input distribution is identical by construction). ~152 B per
    sample at the COCO joint set. Packed batches are stage-agnostic:
    stage differentiation (which targets the loss consumes) happens in
    the step wrapper (`with_packed_input_pipeline`)."""
    from .augment import augm_params_batch

    pk: PackedView = ds._packed
    idx = np.asarray(indices)
    opts = ds.opts
    flips, rots = augm_params_batch(
        opts.is_train, opts.flip_enabled, opts.rotate_factor, len(idx),
        rng)
    pose2d = input_pose2d(opts, ds.joint_set, rng,
                          pk.joint_img_input[idx], flips, rots,
                          h36m_stats=pk.h36m_stats)
    return {"row": (pk.row_offset + idx).astype(np.int32),
            "flips": flips.astype(np.float32),
            "rots": rots.astype(np.float32),
            "pose2d": pose2d}


def make_device_batch(ds, indices: np.ndarray,
                      rng: np.random.Generator) -> Dict[str, np.ndarray]:
    """Host batch for the DEVICE-input packed pipeline (gt_in_step=
    "device"): global row ids + aug params only (~12 B/sample) — the 2D
    input, including detector-noise synthesis, assembles inside the step
    (`with_packed_input_pipeline(device_input=True)`). Stage-agnostic,
    like `make_packed_batch`."""
    from .augment import augm_params_batch

    pk: PackedView = ds._packed
    idx = np.asarray(indices)
    opts = ds.opts
    flips, rots = augm_params_batch(
        opts.is_train, opts.flip_enabled, opts.rotate_factor, len(idx),
        rng)
    return {"row": (pk.row_offset + idx).astype(np.int32),
            "flips": flips.astype(np.float32),
            "rots": rots.astype(np.float32)}


def gendered_smpl_verts(params_by_gender: Dict, genders_present,
                        gender_codes: jnp.ndarray, pose: jnp.ndarray,
                        shape: jnp.ndarray) -> jnp.ndarray:
    """[B,V,3] SMPL vertices with one forward per gender PRESENT (static
    set) and a per-row select — all-neutral tables compile to exactly one
    forward (reference gendered layers: lib/smpl.py:11-52)."""
    out = None
    for g in genders_present:
        verts, _ = smpl_forward(params_by_gender[g], pose, shape)
        if out is None:
            out = verts
        else:
            sel = (gender_codes == GENDER_CODES[g])[:, None, None]
            out = jnp.where(sel, verts, out)
    return out


def with_packed_input_pipeline(step_fn: Callable, table: PackedTable,
                               synth, jset, stage: str = "gator",
                               input_shape=None, opts=None,
                               device_input: bool = False,
                               mesh_cache: bool = False) -> Callable:
    """Wrap a train step to assemble all TARGETS on device from the packed
    table: gather rows, synthesize the GT mesh (per-present-gender SMPL),
    augment the lift target, and gather the precomputed fit-gate masks.

    device_input=False (gt_in_step="packed"): the batch ships the
    host-assembled 2D input (row, flips, rots, pose2d) — bitwise-identical
    input to the host path. device_input=True (gt_in_step="device"): the
    batch is index-only (row, flips, rots) and the 2D input — gather,
    in-step detector-noise synthesis (device_noise), crop/flip/normalize —
    assembles on device too; requires `opts` (the session ProcessOptions)
    and, for noisy recipes, the table's crop_area/h36m columns.

    mesh_cache=True (gator stage): the GT mesh target is EPOCH-INVARIANT
    per row (mesh = fwd(pose_eff, shape_eff) + offset, no augmentation —
    same as the host path), so it precomputes ONCE PER RUN into a
    device-resident [N, V, 3] table instead of re-running the SMPL
    forward every step of every epoch; the per-step cost becomes a
    gather. Costs N*V*3*4 bytes of HBM — the session gates it by size
    (cfg.TRAIN.gt_mesh_cache)."""
    if device_input:
        if opts is None:
            raise ValueError("device_input=True needs the session opts")
        if table.crop_area is None:
            raise ValueError("device_input=True needs a table built by "
                             "build_packed_tables (crop_area column)")
        input_shape = tuple(opts.input_shape)
        want_coco_noise = (opts.is_train and not opts.use_gt_input
                           and opts.input_joint_name == "coco")
        want_h36m_noise = (opts.is_train and not opts.use_gt_input
                           and opts.input_joint_name == "human36"
                           and table.h36m_stats is not None)
    else:
        del input_shape  # the 2D input arrives fully assembled
    perm = _flip_perm(jset.joint_num, jset.flip_pairs)
    genders = table.genders_present
    tbl = {
        "joint_cam_input": jnp.asarray(table.joint_cam_input, jnp.float32),
        "gat_valid": jnp.asarray(table.gat_valid, jnp.float32),
    }
    if device_input:
        tbl["joint_img_input"] = jnp.asarray(table.joint_img_input,
                                             jnp.float32)
        if want_coco_noise:
            tbl["crop_area"] = jnp.asarray(table.crop_area, jnp.float32)
        if want_h36m_noise:
            tbl["h36m_noise_on"] = jnp.asarray(table.h36m_noise_on,
                                               jnp.float32)
            tbl["h36m_stats"] = jnp.asarray(table.h36m_stats, jnp.float32)
    if stage == "gator":
        tbl.update({
            "pose_eff": jnp.asarray(table.pose_eff, jnp.float32),
            "shape_eff": jnp.asarray(table.shape_eff, jnp.float32),
            # fold the root subtraction into the per-row offset:
            # mesh_target = fwd(pose_eff, shape_eff) + trans_off - root/1000
            "offset_m": jnp.asarray(
                table.trans_off - table.root_mm / 1000.0, jnp.float32),
            "reg_pose": jnp.asarray(table.reg_pose, jnp.float32),
            "mesh_valid": jnp.asarray(table.mesh_valid, jnp.float32),
            "reg_valid": jnp.asarray(table.reg_valid, jnp.float32),
            "lift_valid": jnp.asarray(table.lift_valid, jnp.float32),
        })
    if len(genders) > 1:
        tbl["gender"] = jnp.asarray(table.gender, jnp.int32)

    # constargs contract: the table, SMPL params, and (optionally) the
    # GT-mesh cache ride as a replicated runtime ARGUMENT of the jitted
    # step — closure constants at these sizes (10 MB–2 GB) make the relay
    # compile pathological (see gator_tpu/constargs.py)
    consts = {
        "tbl": tbl,
        "smpl": {g: synth.params[g] for g in genders},
    }

    def mesh_rows(c, row):
        """[B]-rows -> GT mesh target [B, V, 3] (meters, root-relative) —
        the row-invariant SMPL half of the gator step."""
        t = c["tbl"]
        codes = t["gender"][row] if len(genders) > 1 else None
        verts = gendered_smpl_verts(c["smpl"], genders, codes,
                                    t["pose_eff"][row],
                                    t["shape_eff"][row])
        return (verts + t["offset_m"][row][:, None]).astype(jnp.float32)

    if mesh_cache and stage == "gator":
        from .device_pipeline import precompute_rows
        tbl["mesh_m"] = precompute_rows(mesh_rows, consts, len(table))

    def device_pose2d(c, state, row, flips, rots, rng):
        """In-step 2D input: gather -> affine crop -> detector noise
        (device_noise, keyed per optimizer step like dropout) -> flip +
        standardize. Host-path order: processing.batch_crop_and_normalize."""
        t = c["tbl"]
        out = affine_crop(t["joint_img_input"][row], input_shape, rots)
        if want_coco_noise or want_h36m_noise:
            from .device_noise import (h36m_syn_error_device,
                                       synthesize_pose_device)
            nk = jax.random.fold_in(jax.random.fold_in(rng, state.step),
                                    _NOISE_SALT)
            if want_coco_noise:
                # noise on the 17 coco keypoints in crop space; extra
                # pelvis/neck rows pass through untouched
                synth2d = synthesize_pose_device(nk, out[:, :17],
                                                 t["crop_area"][row])
                out = out.at[:, :17].set(synth2d)
            else:
                noise = h36m_syn_error_device(
                    nk, t["h36m_stats"], row.shape[0], input_shape)
                out = out + noise * t["h36m_noise_on"][row][:, None,
                                                            None]
        return flip_standardize(out, perm, input_shape, flips)

    def raw_step(c, state, batch: Dict[str, jnp.ndarray], *extra):
        t = c["tbl"]
        row = batch["row"]
        flips, rots = batch["flips"], batch["rots"]
        pose2d = (device_pose2d(c, state, row, flips, rots, extra[0])
                  if device_input else batch["pose2d"])
        lift = j3d_augment(t["joint_cam_input"][row], perm, flips, rots)
        if stage != "gator":
            inner = {
                "pose2d": pose2d,
                "joint_cam": lift,
                "joint_valid": t["gat_valid"][row][:, None, None],
            }
            return step_fn(state, inner, *extra)
        mesh = (t["mesh_m"][row] if "mesh_m" in t
                else mesh_rows(c, row))
        inner = {
            "pose2d": pose2d,
            "mesh": mesh,
            "lift_pose3d": lift,
            "reg_pose3d": t["reg_pose"][row],
            "mesh_valid": t["mesh_valid"][row][:, None, None],
            "reg_valid": t["reg_valid"][row][:, None, None],
            "lift_valid": t["lift_valid"][row][:, None, None],
        }
        return step_fn(state, inner, *extra)

    from ..constargs import bind_consts
    return bind_consts(raw_step, consts)


# -- per-dataset packed_rows hooks (installed onto the dataset classes by
#    their modules importing the helpers below) -----------------------------


def smpl_pose_packed_rows(ds, synth, indices) -> Dict[str, np.ndarray]:
    """`packed_rows` for SmplPoseDataset-family tables (H36M, Synthetic):
    the camera-rotated SMPL path with per-gender grouping
    (reference: Human36M/dataset.py:254-300,339-419)."""
    t = ds.table
    idx = np.asarray(indices)
    n = len(idx)
    opts = ds.opts
    want_coco = opts.input_joint_name == "coco"
    jh = t.joint_cam_h36m[idx] - t.joint_cam_h36m[idx][:, :1]

    pose_eff = np.empty((n, 72), np.float32)
    shape_eff = np.empty((n, 10), np.float32)
    trans_off = np.empty((n, 3), np.float32)
    fit = np.empty(n, np.float32)
    jnum = ds.joint_set.joint_num
    cam_in = np.empty((n, jnum, 3), np.float32)
    img_in = np.empty((n, jnum, 2), np.float32)
    for g_name, g_code in GENDER_CODES.items():
        sel = np.nonzero(t.gender[idx] == g_code)[0]
        if len(sel) == 0:
            continue
        sub = idx[sel]
        pe, se, off, mesh_mm = synth.smpl_cam_decompose(
            t.pose[sub], t.shape[sub], t.trans[sub], t.cam_r[sub],
            t.cam_t[sub], g_name)
        pose_eff[sel] = np.asarray(pe)
        shape_eff[sel] = np.asarray(se)
        trans_off[sel] = np.asarray(off)
        fit[sel] = np.asarray(synth.fitting_error(jh[sel], mesh_mm))
        if want_coco:
            cam, img = synth.coco_from_mesh(mesh_mm, t.focal[sub],
                                            t.princpt[sub])
            cam, img = np.asarray(cam), np.asarray(img)
            cam_in[sel] = cam - cam[:, -2:-1]
            img_in[sel] = img[..., :2]
    if not want_coco:
        cam_in = jh.astype(np.float32)
        img_in = t.joint_img_h36m[idx][..., :2].astype(np.float32)

    bad = fit > opts.fitting_thr
    # policies mirror base._assemble: coco input zeroes mesh+lift (gator)
    # and joint_valid (gat); h36m input gates the mesh only
    masks = valid_masks(bad,
                        zero_gator=("mesh", "lift") if want_coco
                        else ("mesh",),
                        zero_gat=want_coco)
    return dict(
        pose_eff=pose_eff, shape_eff=shape_eff, trans_off=trans_off,
        root_mm=t.joint_cam_h36m[idx][:, 0].astype(np.float32),
        joint_cam_input=cam_in, reg_pose=jh.astype(np.float32),
        gender=t.gender[idx].astype(np.int32),
        joint_img_input=img_in, **masks)


def coco_packed_rows(ds, synth, indices) -> Dict[str, np.ndarray]:
    """`packed_rows` for CocoDataset: plain SMPLify fits, weak-perspective
    projection, 64x64-crop 2D fitting filter
    (reference: COCO/dataset.py:147-214)."""
    t = ds.table
    idx = np.asarray(indices)
    pose = t.pose[idx]
    shape = t.shape[idx]
    # plain path: no camera rotation, no translation — pose passes through
    # untouched and only the beta cleaning folds into shape_eff
    mesh_mm, _ = synth.smpl_mesh_plain(pose, shape, "neutral", True)
    pe = pose.astype(np.float32)
    se = np.asarray(prep_shape_fn(jnp.asarray(shape),
                                  synth.mean_betas["neutral"], True))
    coco_cam, coco_img = synth.coco_weak_perspective(
        mesh_mm, t.cam_s[idx], t.cam_t[idx])
    coco_cam, coco_img = np.asarray(coco_cam), np.asarray(coco_img)
    h36m_cam = np.asarray(synth.h36m_from_mesh(mesh_mm))
    jh = h36m_cam - h36m_cam[:, :1]
    fit = ds._fitting_error_2d_batch(
        t.bbox[idx], t.joint_img[idx], t.joint_valid[idx],
        coco_img[:, :17])
    # COCO zeroes ALL validity masks on a bad fit (dataset.py:270)
    masks = valid_masks(fit > ds.opts.fitting_thr,
                        zero_gator=("mesh", "reg", "lift"), zero_gat=True)
    return dict(
        pose_eff=np.asarray(pe), shape_eff=np.asarray(se),
        trans_off=np.zeros((len(idx), 3), np.float32),
        root_mm=h36m_cam[:, 0].astype(np.float32),
        joint_cam_input=(coco_cam - coco_cam[:, -2:-1]).astype(np.float32),
        reg_pose=jh.astype(np.float32),
        gender=np.zeros(len(idx), np.int32),
        joint_img_input=coco_img[..., :2].astype(np.float32), **masks)


def muco_packed_rows(ds, synth, indices) -> Dict[str, np.ndarray]:
    """`packed_rows` for MucoDataset: SMPL with in-layer translation, full
    cameras, 45 mm fitting filter (reference: MuCo/dataset.py:196-262)."""
    t = ds.table
    idx = np.asarray(indices)
    n = len(idx)
    mesh_mm, _ = synth.smpl_mesh_direct(
        t.pose[idx], t.shape[idx], t.trans[idx], "neutral", True)
    coco_cam, coco_img = synth.coco_from_mesh(
        mesh_mm, t.focal[idx], t.princpt[idx])
    coco_cam, coco_img = np.asarray(coco_cam), np.asarray(coco_img)
    h36m_cam = np.asarray(synth.h36m_from_mesh(mesh_mm))
    jh = h36m_cam - h36m_cam[:, :1]
    fit = ds._fitting_error_batch(t.joint_cam_muco[idx], mesh_mm)

    # shape cleaning is folded (smpl_mesh_direct clean=True); translation
    # rides in-layer -> trans_off = trans
    shape_eff = np.asarray(prep_shape_fn(
        jnp.asarray(t.shape[idx]), synth.mean_betas["neutral"], True))
    if ds.opts.input_joint_name == "coco":
        cam_in = (coco_cam - coco_cam[:, -2:-1]).astype(np.float32)
        img_in = coco_img[..., :2].astype(np.float32)
    else:
        ji = (h36m_cam[..., :2] / h36m_cam[..., 2:3]
              * t.focal[idx][:, None, :] + t.princpt[idx][:, None, :])
        cam_in, img_in = jh.astype(np.float32), ji.astype(np.float32)
    # MuCo zeroes all gator masks on a bad fit but NOT the gat mask
    # (reference: dataset.py:316-319)
    masks = valid_masks(fit > ds.opts.fitting_thr,
                        zero_gator=("mesh", "reg", "lift"), zero_gat=False)
    return dict(
        pose_eff=t.pose[idx].astype(np.float32), shape_eff=shape_eff,
        trans_off=t.trans[idx].astype(np.float32),
        root_mm=h36m_cam[:, 0].astype(np.float32),
        joint_cam_input=cam_in, reg_pose=jh.astype(np.float32),
        gender=np.zeros(n, np.int32), joint_img_input=img_in, **masks)


def amass_packed_rows(ds, synth, indices) -> Dict[str, np.ndarray]:
    """`packed_rows` for AmassDataset: camera-rotated root + additive
    meter translation, exact mocap GT (no fitting filter)
    (reference: AMASS/dataset.py:186-238)."""
    from .amass import CAM_T_M, FOCAL, PRINCPT
    from .gt_synth import rotate_root_pose

    t = ds.table
    idx = np.asarray(indices)
    n = len(idx)
    cam_t = np.tile(CAM_T_M, (n, 1))
    mesh_mm, _ = synth.smpl_mesh_rotated(
        t.pose[idx], t.shape[idx], t.cam_r[idx], cam_t)
    pose_eff = np.asarray(jax.jit(rotate_root_pose)(
        jnp.asarray(t.pose[idx]), jnp.asarray(t.cam_r[idx])))
    shape_eff = np.asarray(prep_shape_fn(
        jnp.asarray(t.shape[idx]), synth.mean_betas["neutral"], False))
    focal = np.tile(FOCAL, (n, 1))
    princpt = np.tile(PRINCPT, (n, 1))
    coco_cam, coco_img = synth.coco_from_mesh(mesh_mm, focal, princpt)
    coco_cam, coco_img = np.asarray(coco_cam), np.asarray(coco_img)
    h36m_cam = np.asarray(synth.h36m_from_mesh(mesh_mm))
    jh = h36m_cam - h36m_cam[:, :1]
    if ds.opts.input_joint_name == "coco":
        cam_in = (coco_cam - coco_cam[:, -2:-1]).astype(np.float32)
        img_in = coco_img[..., :2].astype(np.float32)
    else:
        xy = (h36m_cam[..., :2] / h36m_cam[..., 2:3]
              * FOCAL[None, None] + PRINCPT[None, None])
        cam_in, img_in = jh.astype(np.float32), xy.astype(np.float32)
    masks = valid_masks(np.zeros(n, bool))
    return dict(
        pose_eff=pose_eff, shape_eff=shape_eff,
        trans_off=cam_t.astype(np.float32),
        root_mm=h36m_cam[:, 0].astype(np.float32),
        joint_cam_input=cam_in, reg_pose=jh.astype(np.float32),
        gender=np.zeros(n, np.int32), joint_img_input=img_in, **masks)

"""On-device ground-truth synthesis (the reference's biggest data-side
bottleneck restructured).

The reference runs the SMPL layer once per sample on CPU inside DataLoader
workers (reference: Human36M/dataset.py:254-300 `get_smpl_coord`, called
from `__getitem__:345`; see SURVEY.md §3 hot loops). Here GT meshes/joints
for a whole batch are synthesized by ONE jitted program on the TPU:
camera-rotation compensation of the root pose, gendered SMPL forward,
translation compensation, joint regression, and COCO pelvis/neck synthesis
are all batched einsums. Every einsum pins Precision.HIGHEST: these
produce TRAINING TARGETS and fit-validity decisions, and the TPU's
default bf16 matmul passthrough is multi-mm at mm-scale meshes (same
rule as smpl_forward and the eval steps).

COMPILE-COST RULE (measured on the axon relay): multi-MB tables must be
RUNTIME ARGUMENTS, never jit-closure constants — the same smpl_forward
compiles in ~6 s with SMPL params passed as a pytree argument and ~700 s
(with a 90 MB executable) with them embedded as HLO constants. Every
function below therefore takes its tables (SmplParams, joint regressors,
mean betas) as explicit leading arguments; the jitted entry points are
module-level so one compile serves every GtSynthesizer instance AND every
gender (gender selection is just which params pytree is passed). Code
that fuses synthesis into a larger jitted step must call the pure `*_fn`
forms with tables threaded through that step's own arguments (see
data/device_pipeline.py) — calling the jitted methods inside another
trace would re-embed the tables as constants.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..assets.bundle import GatorAssets
from ..bodymodel.rotations import axis_angle_to_rotmat, rotmat_to_axis_angle
from ..bodymodel.smpl import SmplParams, smpl_forward


def rotate_root_pose(pose: jnp.ndarray, cam_r: jnp.ndarray) -> jnp.ndarray:
    """Rotate the global (root) axis-angle by the camera rotation:
    aa_root' = log(R_cam @ exp(aa_root))
    (reference: Human36M/dataset.py:268-274, done per sample with
    transforms3d)."""
    root = pose[:, :3]
    rot = axis_angle_to_rotmat(root)
    new_root = rotmat_to_axis_angle(jnp.einsum("bij,bjk->bik", cam_r, rot,
                           precision=jax.lax.Precision.HIGHEST))
    return jnp.concatenate([new_root, pose[:, 3:]], axis=1)


def _clean_shape(shape: jnp.ndarray) -> jnp.ndarray:
    """Zero out beta rows with any |b| > 3 (fit failures)
    (reference: Human36M/dataset.py:265)."""
    bad = (jnp.abs(shape) > 3).any(axis=1, keepdims=True)
    return jnp.where(bad, 0.0, shape)


# ---------------------------------------------------------------------------
# Pure functions (tables as arguments). These are the forms other jitted
# programs compose with; the GtSynthesizer methods below add the jit
# boundary + table binding for host callers.
# ---------------------------------------------------------------------------


def prep_shape_fn(shape, mean_b, clean: bool):
    """Beta cleaning + the reference's zero-row -> mean-betas substitution
    (smpl_layer.py:87-95)."""
    if clean:
        shape = _clean_shape(shape)
    zero = jnp.all(shape == 0, axis=1, keepdims=True)
    return jnp.where(zero, mean_b[None], shape)


def mesh_cam_parts_fn(params: SmplParams, mean_b, pose, shape, trans,
                      cam_r, cam_t):
    """Shared core of smpl_mesh_cam / smpl_cam_decompose: camera-rotated
    effective inputs + the translation-compensation offset
    (reference: Human36M/dataset.py:254-300)."""
    pose_eff = rotate_root_pose(pose, cam_r)
    shape_eff = prep_shape_fn(shape, mean_b, clean=True)
    verts, joints = smpl_forward(params, pose_eff, shape_eff)

    # translation compensation: the root rotation was about the origin,
    # not the root joint (reference: dataset.py:287-295)
    smpl_trans = (jnp.einsum("bij,bj->bi", cam_r, trans,
                             precision=jax.lax.Precision.HIGHEST)
                  + cam_t / 1000.0)
    root = joints[:, :1]                                 # [B,1,3]
    smpl_trans = (smpl_trans[:, None]
                  - root + jnp.einsum(
                      "bij,bkj->bki", cam_r, root,
                      precision=jax.lax.Precision.HIGHEST))
    return pose_eff, shape_eff, smpl_trans, verts, joints


def mesh_cam_fn(params: SmplParams, mean_b, pose, shape, trans, cam_r,
                cam_t):
    """Batched get_smpl_coord: (mesh_mm [B,V,3], smpl_joints_mm [B,24,3])
    in camera space, millimeters (reference: Human36M/dataset.py:254-300)."""
    _, _, smpl_trans, verts, joints = mesh_cam_parts_fn(
        params, mean_b, pose, shape, trans, cam_r, cam_t)
    return (verts + smpl_trans) * 1000.0, (joints + smpl_trans) * 1000.0


def cam_decompose_fn(params: SmplParams, mean_b, pose, shape, trans,
                     cam_r, cam_t):
    """mesh_cam split into per-row EFFECTIVE inputs for the packed device
    pipeline (data/packed.py): returns (pose_eff [B,72], shape_eff [B,10],
    trans_off_m [B,3], mesh_mm [B,V,3]) such that
    (smpl_forward(params, pose_eff, shape_eff)[0]
     + trans_off_m[:, None]) * 1000 == mesh_mm — the camera rotation, beta
    cleaning, mean-beta substitution, and translation compensation are all
    folded into epoch-invariant per-row constants."""
    pose_eff, shape_eff, smpl_trans, verts, _ = mesh_cam_parts_fn(
        params, mean_b, pose, shape, trans, cam_r, cam_t)
    return (pose_eff, shape_eff, smpl_trans[:, 0],
            (verts + smpl_trans) * 1000.0)


def mesh_direct_fn(params: SmplParams, mean_b, pose, shape, trans,
                   clean: bool):
    """SMPL with translation applied inside the layer, no camera rotation
    — the MuCo / 3DPW path (reference: MuCo/dataset.py:196-216 with
    |beta|>3 cleaning, PW3D/dataset.py:84-102 without)."""
    shape = prep_shape_fn(shape, mean_b, clean)
    verts, joints = smpl_forward(params, pose, shape, trans)
    return verts * 1000.0, joints * 1000.0


def mesh_plain_fn(params: SmplParams, mean_b, pose, shape, clean: bool):
    """SMPL with neither translation nor camera rotation — the COCO
    SMPLify-fit path (reference: COCO/dataset.py:147-166)."""
    shape = prep_shape_fn(shape, mean_b, clean)
    verts, joints = smpl_forward(params, pose, shape)
    return verts * 1000.0, joints * 1000.0


def mesh_rotated_fn(params: SmplParams, mean_b, pose, shape, cam_r,
                    cam_t_m, clean: bool):
    """Camera-rotated root pose + additive translation in meters — the
    AMASS virtual-camera path (reference: AMASS/dataset.py:186-213)."""
    pose = rotate_root_pose(pose, cam_r)
    shape = prep_shape_fn(shape, mean_b, clean)
    verts, joints = smpl_forward(params, pose, shape)
    verts = (verts + cam_t_m[:, None]) * 1000.0
    joints = (joints + cam_t_m[:, None]) * 1000.0
    return verts, joints


_LHIP, _RHIP = 11, 12       # coco joint indices
_LSHO, _RSHO = 5, 6


def _coco_cam_joints(j_reg_coco, mesh_mm):
    cam = jnp.einsum("jv,bvc->bjc", j_reg_coco, mesh_mm,
                     precision=jax.lax.Precision.HIGHEST)
    pelvis = 0.5 * (cam[:, _LHIP] + cam[:, _RHIP])
    neck = 0.5 * (cam[:, _LSHO] + cam[:, _RSHO])
    return jnp.concatenate([cam, pelvis[:, None], neck[:, None]], axis=1)


def coco_weak_perspective_fn(j_reg_coco, mesh_mm, s, t):
    """COCO joints from mesh + weak-perspective projection
    img = (cam_xy/1000) * s + t (reference: COCO/dataset.py:183-194)."""
    cam = _coco_cam_joints(j_reg_coco, mesh_mm)
    xy = cam[..., :2] / 1000.0 * s[:, None] + t[:, None]
    img = jnp.concatenate([xy, jnp.ones_like(cam[..., :1])], axis=-1)
    return cam, img


def coco_from_mesh_fn(j_reg_coco, mesh_mm, focal, princpt):
    """COCO joints regressed from the mesh + pelvis/neck, camera and pixel
    coordinates (reference: Human36M/dataset.py:311-334)."""
    cam = _coco_cam_joints(j_reg_coco, mesh_mm)
    xy = (cam[..., :2] / cam[..., 2:3] * focal[:, None]
          + princpt[:, None])
    img = jnp.concatenate([xy, jnp.ones_like(cam[..., :1])], axis=-1)
    return cam, img


def h36m_from_mesh_fn(j_reg_h36m, mesh_mm):
    return jnp.einsum("jv,bvc->bjc", j_reg_h36m, mesh_mm,
                      precision=jax.lax.Precision.HIGHEST)


def mesh_rel_m_fn(mesh_mm, root_mm):
    """Root-relative mesh in meters — the training target. Runs on device
    so the [B, V, 3] mesh never round-trips through the host (reference
    does this per sample on CPU: Human36M/dataset.py:352-356 then /1000 in
    __getitem__)."""
    return ((mesh_mm - root_mm) / 1000.0).astype(jnp.float32)


def fitting_error_fn(j_reg_h36m, joint_cam_h36m, mesh_mm):
    """Translation-aligned joint error of the fitted mesh vs dataset GT
    (reference: Human36M/dataset.py:302-309); root-relative gt in, error
    in mm out [B]."""
    gt = joint_cam_h36m - joint_cam_h36m[:, :1]
    reg = h36m_from_mesh_fn(j_reg_h36m, mesh_mm)
    reg = reg - reg.mean(axis=1, keepdims=True) \
        + gt.mean(axis=1, keepdims=True)
    return jnp.sqrt(((gt - reg) ** 2).sum(-1)).mean(-1)


def fit_valid_mask_fn(fitting_error, thr: float):
    """[B, 1, 1] f32 per-sample mask: 1 where the fitted mesh is within
    `thr` mm of the dataset GT joints (reference gates losses the same way
    host-side: Human36M/dataset.py:396-401). Computed on device so the
    training batch path needs NO host sync."""
    return (fitting_error <= thr).astype(jnp.float32)[:, None, None]


# module-level jitted entries: ONE compile per shape for every synthesizer
# instance and every gender
_jit_mesh_cam = jax.jit(mesh_cam_fn)
_jit_cam_decompose = jax.jit(cam_decompose_fn)
_jit_mesh_direct = jax.jit(mesh_direct_fn, static_argnums=5)
_jit_mesh_plain = jax.jit(mesh_plain_fn, static_argnums=4)
_jit_mesh_rotated = jax.jit(mesh_rotated_fn, static_argnums=6)
_jit_coco_weak = jax.jit(coco_weak_perspective_fn)
_jit_coco_from_mesh = jax.jit(coco_from_mesh_fn)
_jit_h36m_from_mesh = jax.jit(h36m_from_mesh_fn)
_jit_mesh_rel_m = jax.jit(mesh_rel_m_fn)
_jit_fitting_error = jax.jit(fitting_error_fn)
_jit_fit_valid_mask = jax.jit(fit_valid_mask_fn, static_argnums=1)


class GtSynthesizer:
    """Batched GT mesh/joint synthesis bound to one asset bundle.

    Holds the device-resident tables (SMPL params per gender, joint
    regressors, mean betas) and passes them as ARGUMENTS to the shared
    module-level jitted functions — see the compile-cost rule in the
    module docstring."""

    def __init__(self, assets: GatorAssets, dtype=jnp.float32):
        self.assets = assets
        self.params = {
            g: SmplParams.from_model(m, dtype)
            for g, m in assets.smpl_gendered.items()}
        self.mean_betas = {
            g: jnp.asarray(m.mean_betas, dtype)
            for g, m in assets.smpl_gendered.items()}
        self.j_reg_h36m = jnp.asarray(assets.j_regressor_h36m)
        self.j_reg_coco = jnp.asarray(assets.j_regressor_coco)

    def smpl_mesh_cam(self, pose, shape, trans, cam_r, cam_t,
                      gender: str = "neutral"):
        return _jit_mesh_cam(self.params[gender], self.mean_betas[gender],
                             pose, shape, trans, cam_r, cam_t)

    def smpl_cam_decompose(self, pose, shape, trans, cam_r, cam_t,
                           gender: str = "neutral"):
        return _jit_cam_decompose(self.params[gender],
                                  self.mean_betas[gender],
                                  pose, shape, trans, cam_r, cam_t)

    def smpl_mesh_direct(self, pose, shape, trans,
                         gender: str = "neutral", clean: bool = True):
        return _jit_mesh_direct(self.params[gender],
                                self.mean_betas[gender],
                                pose, shape, trans, clean)

    def smpl_mesh_plain(self, pose, shape, gender: str = "neutral",
                        clean: bool = True):
        return _jit_mesh_plain(self.params[gender],
                               self.mean_betas[gender], pose, shape, clean)

    def smpl_mesh_rotated(self, pose, shape, cam_r, cam_t_m,
                          gender: str = "neutral", clean: bool = False):
        return _jit_mesh_rotated(self.params[gender],
                                 self.mean_betas[gender],
                                 pose, shape, cam_r, cam_t_m, clean)

    def coco_weak_perspective(self, mesh_mm, s, t):
        return _jit_coco_weak(self.j_reg_coco, mesh_mm, s, t)

    def coco_from_mesh(self, mesh_mm, focal, princpt):
        return _jit_coco_from_mesh(self.j_reg_coco, mesh_mm, focal,
                                   princpt)

    def h36m_from_mesh(self, mesh_mm):
        return _jit_h36m_from_mesh(self.j_reg_h36m, mesh_mm)

    def mesh_rel_m(self, mesh_mm, root_mm):
        return _jit_mesh_rel_m(mesh_mm, root_mm)

    def fitting_error(self, joint_cam_h36m, mesh_mm):
        return _jit_fitting_error(self.j_reg_h36m, joint_cam_h36m, mesh_mm)

    def fit_valid_mask(self, fitting_error, thr: float):
        return _jit_fit_valid_mask(fitting_error, thr)

    def synthesize(self, pose: np.ndarray, shape: np.ndarray,
                   trans: np.ndarray, cam_r: np.ndarray, cam_t: np.ndarray,
                   focal: np.ndarray, princpt: np.ndarray,
                   joint_cam_h36m: Optional[np.ndarray] = None,
                   gender: str = "neutral",
                   want_coco: bool = True,
                   host_fetch: bool = True) -> Dict[str, np.ndarray]:
        """Full GT bundle for a batch (host numpy in/out).

        want_coco=False skips the COCO joint regression + its host
        fetches — human36-input training never reads them, and each
        blocking fetch costs a full relay round-trip. host_fetch=False
        skips the device sync entirely and returns DEVICE arrays: the
        non-COCO training path consumes fitting_error only as a device
        mask (fit_valid_mask), so its batches can assemble with zero
        blocking round-trips — the sync otherwise serializes the prefetch
        thread against the train step through the relay."""
        mesh_mm, smpl_joints_mm = self.smpl_mesh_cam(
            pose, shape, trans, cam_r, cam_t, gender)
        small = {"smpl_joints_mm": smpl_joints_mm}
        if want_coco:
            coco_cam, coco_img = self.coco_from_mesh(mesh_mm, focal,
                                                     princpt)
            small["joint_cam_coco"] = coco_cam
            small["joint_img_coco"] = coco_img
        if joint_cam_h36m is not None:
            small["fitting_error"] = self.fitting_error(joint_cam_h36m,
                                                        mesh_mm)
        # ONE device sync for every small array; the [B, V, 3] mesh stays
        # a DEVICE array (the training path never pulls it to host)
        out = jax.device_get(small) if host_fetch else small
        out["mesh_mm"] = mesh_mm
        return out

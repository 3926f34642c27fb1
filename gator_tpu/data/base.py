"""Dataset base machinery: structure-of-arrays annotations + the common
batch assembly used by every dataset.

Design shift vs the reference: instead of per-sample Python dicts consumed
by DataLoader workers (each running SMPL on CPU), a dataset is a table of
numpy arrays over N samples; batches are assembled by slicing the table,
running ONE device program for GT synthesis (gt_synth), and doing the cheap
per-sample 2D work on host.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np

from ..assets.bundle import GatorAssets
from ..assets.skeletons import JointSet
from . import noise as noise_mod
from . import processing
from .gt_synth import GtSynthesizer

GENDERS = ("neutral", "female", "male")


@dataclasses.dataclass
class SmplTable:
    """SoA annotations for datasets with SMPL fits + full cameras."""

    pose: np.ndarray            # [N, 72]
    shape: np.ndarray           # [N, 10]
    trans: np.ndarray           # [N, 3]
    cam_r: np.ndarray           # [N, 3, 3]
    cam_t: np.ndarray           # [N, 3] (mm)
    focal: np.ndarray           # [N, 2]
    princpt: np.ndarray         # [N, 2]
    joint_cam_h36m: np.ndarray  # [N, 17, 3] dataset GT (mm, camera space)
    joint_img_h36m: np.ndarray  # [N, 17, 2]
    gender: np.ndarray          # [N] int: 0 neutral / 1 female / 2 male
    meta: Dict[str, np.ndarray] = dataclasses.field(default_factory=dict)

    def __len__(self):
        return self.pose.shape[0]


class SmplPoseDataset:
    """Common behavior for H36M/MuCo-style datasets (SMPL params + full
    camera annotations). Subclasses fill `table`, `fitting_thr`, and
    evaluation."""

    name = "base"

    def __init__(self, assets: GatorAssets, opts: processing.ProcessOptions,
                 table: SmplTable,
                 detected_pose: Optional[np.ndarray] = None):
        self.assets = assets
        self.opts = opts
        self.table = table
        self.joint_set: JointSet = assets.joint_set
        self.detected_pose = detected_pose  # [N, J, 3] test-time detections
        self._h36m_stats = noise_mod.h36m_error_stats(
            ("Pelvis", "R_Hip", "R_Knee", "R_Ankle", "L_Hip", "L_Knee",
             "L_Ankle", "Torso", "Neck", "Nose", "Head", "L_Shoulder",
             "L_Elbow", "L_Wrist", "R_Shoulder", "R_Elbow", "R_Wrist"))

    def __len__(self):
        return len(self.table)

    # -- batch assembly ----------------------------------------------------

    def make_batch(self, indices: np.ndarray, synth: GtSynthesizer,
                   rng: np.random.Generator,
                   stage: str = "gator") -> Dict[str, np.ndarray]:
        t = self.table
        idx = np.asarray(indices)
        # device GT synthesis, grouped by gender; the [B, V, 3] mesh stays
        # ON DEVICE (root-relativized there). The COCO-input path pulls
        # the small per-joint arrays to host (the 2D input is derived from
        # the fitted mesh and needs host-side noise/crop); the non-COCO
        # path is fully SYNC-FREE: fitting_error only gates losses, so it
        # stays on device as a [B, 1, 1] mask — a blocking fetch here
        # serializes the prefetch thread against the train step (measured
        # 135 -> ~60 ms/step end to end through the TPU relay)
        want_coco = self.opts.input_joint_name == "coco"
        if not want_coco and stage == "gat":
            # non-COCO GAT batches carry no mesh and no fit gate — the
            # SMPL synthesis would be computed and discarded (the
            # reference pays it per sample anyway: dataset.py:345,409-419)
            return self._assemble(
                idx, np.zeros((len(idx), 0, 3), np.float32), None, None,
                None, rng, stage)
        groups = []
        coco_cam = np.empty((len(idx), 19, 3), np.float32)
        coco_img = np.empty((len(idx), 19, 3), np.float32)
        fit_err = np.empty((len(idx),), np.float32)
        for g_code, g_name in enumerate(GENDERS):
            sel = np.nonzero(t.gender[idx] == g_code)[0]
            if len(sel) == 0:
                continue
            sub = idx[sel]
            out = synth.synthesize(
                t.pose[sub], t.shape[sub], t.trans[sub], t.cam_r[sub],
                t.cam_t[sub], t.focal[sub], t.princpt[sub],
                joint_cam_h36m=(t.joint_cam_h36m[sub]
                                - t.joint_cam_h36m[sub][:, :1]),
                gender=g_name, want_coco=want_coco,
                host_fetch=want_coco)
            mesh_part = synth.mesh_rel_m(out["mesh_mm"],
                                         t.joint_cam_h36m[sub][:, :1])
            if want_coco:
                groups.append((sel, mesh_part, None))
                coco_cam[sel] = out["joint_cam_coco"]
                coco_img[sel] = out["joint_img_coco"]
                fit_err[sel] = out.get(
                    "fitting_error", np.zeros(len(sel), np.float32))
            else:
                groups.append((sel, mesh_part, synth.fit_valid_mask(
                    out["fitting_error"], self.opts.fitting_thr)))

        if len(groups) == 1:
            mesh_rel_m = groups[0][1]
            valid_dev = groups[0][2]
        else:
            import jax.numpy as jnp
            mesh_rel_m = jnp.zeros(
                (len(idx), self.assets.vertex_num, 3), jnp.float32)
            valid_dev = (None if want_coco else
                         jnp.zeros((len(idx), 1, 1), jnp.float32))
            for sel, part, mask in groups:
                mesh_rel_m = mesh_rel_m.at[sel].set(part)
                if mask is not None:
                    valid_dev = valid_dev.at[sel].set(mask)

        return self._assemble(idx, mesh_rel_m, coco_cam, coco_img,
                              None if not want_coco else fit_err, rng,
                              stage, mesh_valid_dev=valid_dev)

    @property
    def supports_raw_batches(self) -> bool:
        """True when this dataset uses the shared make_batch path, so a
        raw (pre-synthesis) batch can feed in-step GT synthesis. Datasets
        with bespoke make_batch flows (COCO/MuCo/AMASS/PW3D) return
        False automatically."""
        return type(self).make_batch is SmplPoseDataset.make_batch

    def make_raw_batch(self, indices: np.ndarray,
                       rng: np.random.Generator,
                       stage: str = "gator") -> Dict[str, np.ndarray]:
        """Host-only batch for IN-STEP GT synthesis
        (`train.loop.with_gt_synthesis`): instead of a [B, V, 3] mesh the
        batch carries the raw SMPL/camera parameters (~100 floats per
        sample), and the jitted train step synthesizes the mesh target +
        fit-validity mask on device. Input/target assembly (crop, noise,
        flip/rot augmentation) consumes the SAME rng draws as make_batch,
        so the two paths match exactly on the host side and to ~1 ulp of
        XLA fusion reordering on the synthesized mesh (test-pinned).
        Requires the non-COCO input path (COCO derives its
        2D input from the fitted mesh, which needs host access) and
        neutral-gender rows (one SMPL parameter set per program)."""
        t = self.table
        idx = np.asarray(indices)
        if self.opts.input_joint_name == "coco":
            raise ValueError("make_raw_batch: COCO-input batches derive "
                             "their 2D input from the fitted mesh and "
                             "cannot defer synthesis")
        if stage != "gator":
            # GAT batches need no mesh at all — the normal path already
            # skips synthesis
            return self.make_batch(idx, None, rng, stage=stage)
        if (t.gender[idx] != 0).any():       # GENDERS[0] == "neutral"
            raise ValueError("make_raw_batch requires neutral-gender rows")
        batch = self._assemble(
            idx, np.zeros((len(idx), 0, 3), np.float32), None, None,
            None, rng, stage)
        # synthesized / reconstituted in-step (per-call transfer latency
        # dominates host->device copies, so every dropped leaf counts):
        # mesh + mesh_valid come from the in-step synthesis; lift/reg
        # masks are constant ones on this path (bad_zero_gator=("mesh",));
        # the fit-gate target equals reg_pose3d (both are the
        # root-relative h36m joints, un-augmented)
        del batch["mesh"], batch["mesh_valid"]
        del batch["lift_valid"], batch["reg_valid"]
        root = t.joint_cam_h36m[idx][:, :1]
        batch.update({
            "smpl_pose": t.pose[idx].astype(np.float32),
            "smpl_shape": t.shape[idx].astype(np.float32),
            "smpl_trans": t.trans[idx].astype(np.float32),
            "cam_r": t.cam_r[idx].astype(np.float32),
            "cam_t": t.cam_t[idx].astype(np.float32),
            "mesh_root_mm": root.astype(np.float32),
        })
        return batch

    def packed_rows(self, synth: GtSynthesizer, indices: np.ndarray):
        """Epoch-invariant canonical rows for the packed device pipeline
        (data/packed.py) — camera-rotated SMPL path with per-gender
        grouping."""
        from .packed import smpl_pose_packed_rows
        return smpl_pose_packed_rows(self, synth, indices)

    def make_packed_batch(self, indices: np.ndarray,
                          rng: np.random.Generator) -> Dict[str, np.ndarray]:
        """Host batch for the packed pipeline: (row, flips, rots) plus the
        fully-assembled 2D input (det-noise/crop/flip/normalize — the
        exact host-path code). Requires `build_packed_tables` to have
        attached this dataset's PackedView. Stage-agnostic (stage
        differentiation happens in the step wrapper)."""
        from .packed import make_packed_batch
        return make_packed_batch(self, indices, rng)

    def make_index_batch(self, indices: np.ndarray,
                         rng: np.random.Generator,
                         stage: str = "gator") -> Dict[str, np.ndarray]:
        """Index-only batch for the fully device-side input pipeline
        (`data.device_pipeline.with_device_input_pipeline`): ships just
        (row indices, flip flags, rotation angles) — the step gathers the
        annotation rows from the device-resident table and does the rest
        in-program. Augmentation params come from the same
        `augm_params_batch` draws as the host path. Stage-independent:
        the gator and gat wrappers assemble their own targets from the
        same (idx, flips, rots)."""
        from .augment import augm_params_batch

        idx = np.asarray(indices)
        flips, rots = augm_params_batch(
            self.opts.is_train, self.opts.flip_enabled,
            self.opts.rotate_factor, len(idx), rng)
        return {"idx": idx.astype(np.int32),
                "flips": flips.astype(np.float32),
                "rots": rots.astype(np.float32)}

    def _assemble(self, idx, mesh_rel_m, coco_cam, coco_img, fit_err, rng,
                  stage, mesh_valid_dev=None) -> Dict[str, np.ndarray]:
        t = self.table
        opts = self.opts
        # vectorized root-relativization (reference: dataset.py:352-356)
        jc_h36m = t.joint_cam_h36m[idx]
        jh = jc_h36m - jc_h36m[:, :1]
        if opts.input_joint_name == "coco":
            cc = coco_cam - coco_cam[:, -2:-1]
            joint_img_b, joint_cam_b = coco_img[:, :, :2], cc
        else:
            joint_img_b, joint_cam_b = t.joint_img_h36m[idx], jh
        is_coco = opts.input_joint_name == "coco"
        return assemble_batch(
            opts, self.joint_set, rng, stage,
            mesh_rel_m=mesh_rel_m, joint_img_b=joint_img_b,
            joint_cam_b=joint_cam_b, reg_pose=jh, fit_err=fit_err,
            detected_pose=(self.detected_pose[idx]
                           if self.detected_pose is not None else None),
            h36m_stats=self._h36m_stats,
            bad_zero_gator=("mesh", "lift") if is_coco else ("mesh",),
            bad_zero_gat=is_coco, mesh_valid_dev=mesh_valid_dev)


def input_pose2d(
    opts: processing.ProcessOptions,
    jset: JointSet,
    rng: np.random.Generator,
    joint_img_b: np.ndarray,                      # [B, J, 2]
    flips: np.ndarray, rots: np.ndarray,          # [B]
    detected_pose: Optional[np.ndarray] = None,   # [B, J, 2+] test dets
    h36m_stats: Optional[np.ndarray] = None,
) -> np.ndarray:
    """The 2D-input half of `assemble_batch`, shared verbatim with the
    packed device pipeline (data/packed.py) so both paths consume identical
    rng draws and produce bitwise-equal inputs: optional detector
    replacement (test), h36m Gaussian detector noise or the COCO keypoint
    noise simulator (det-input training), then the vectorized
    crop/flip/normalize (reference per-sample forms:
    Human36M/dataset.py:364-389,421-453)."""
    noise = None
    coco_noise = None
    dets = None
    b = len(joint_img_b)
    if not opts.use_gt_input and not opts.is_train \
            and detected_pose is not None:
        dets = detected_pose
    if not opts.use_gt_input and opts.is_train \
            and opts.input_joint_name == "human36" \
            and h36m_stats is not None:
        noise = np.stack([
            noise_mod.generate_h36m_syn_error(h36m_stats, rng)
            for _ in range(b)])
        noise = noise / 256.0 * np.array(
            [opts.input_shape[1], opts.input_shape[0]], np.float32)
    if not opts.use_gt_input and opts.is_train \
            and opts.input_joint_name == "coco":
        coco_noise = {
            "areas": processing.crop_area_batch(joint_img_b, opts),
            "rng": rng}
    return processing.batch_crop_and_normalize(
        joint_img_b.astype(np.float32), jset, opts, flips, rots,
        h36m_noise=noise, coco_noise=coco_noise, detected_pose=dets)


def assemble_batch(
    opts: processing.ProcessOptions,
    jset: JointSet,
    rng: np.random.Generator,
    stage: str,
    *,
    mesh_rel_m,                  # [B, V, 3] root-relative mesh in METERS;
                                 # a device (jax) array on the train path
    joint_img_b: np.ndarray,     # [B, J, 2] input pixel joints
    joint_cam_b: np.ndarray,     # [B, J, 3] root-relative lift target, mm
    reg_pose: np.ndarray,        # [B, 17, 3] root-relative h36m target, mm
    fit_err: Optional[np.ndarray] = None,     # [B] or None (all good)
    detected_pose: Optional[np.ndarray] = None,   # [B, J, 3] test dets
    h36m_stats: Optional[np.ndarray] = None,
    bad_zero_gator=("mesh",),    # masks zeroed on a bad fit (gator stage)
    bad_zero_gat: bool = False,  # zero joint_valid on a bad fit (gat stage)
    mesh_valid_dev=None,         # [B, 1, 1] DEVICE fit mask replacing the
                                 # host fit_err path (sync-free pipeline);
                                 # only valid when the mesh is the sole
                                 # fit-gated target
) -> Dict[str, np.ndarray]:
    """Vectorized batch assembly shared by every dataset (the reference
    runs all of this per sample in DataLoader workers —
    Human36M/dataset.py:339-419 and the equivalents in COCO/MuCo/AMASS).

    Everything is batched numpy except two inherently per-sample input
    paths: detector replacement and the COCO detector-noise simulator."""
    from .augment import augm_params_batch

    b = len(joint_img_b)
    flips, rots = augm_params_batch(
        opts.is_train, opts.flip_enabled, opts.rotate_factor, b, rng)

    pose2d = input_pose2d(opts, jset, rng, joint_img_b, flips, rots,
                          detected_pose=detected_pose,
                          h36m_stats=h36m_stats)

    # vectorized 3D-target augmentation (augment.j3d_processing math)
    def batch_j3d(s):
        rad = -rots * np.pi / 180.0
        cs, sn = np.cos(rad), np.sin(rad)
        x = cs[:, None] * s[..., 0] - sn[:, None] * s[..., 1]
        y = sn[:, None] * s[..., 0] + cs[:, None] * s[..., 1]
        out = np.stack([x, y, s[..., 2]], axis=-1)
        if flips.any():
            fl = out.copy()
            pairs = np.asarray(jset.flip_pairs)
            if len(pairs):
                tmp = fl[:, pairs[:, 0]].copy()
                fl[:, pairs[:, 0]] = fl[:, pairs[:, 1]]
                fl[:, pairs[:, 1]] = tmp
            fl[..., 0] = -fl[..., 0]
            out = np.where(flips[:, None, None].astype(bool), fl, out)
        return out.astype(np.float32)

    if mesh_valid_dev is not None:
        # sync-free path: the device mask carries the fit gate; nothing
        # else may depend on the (never-fetched) fit error
        assert fit_err is None and tuple(bad_zero_gator) == ("mesh",) \
            and not bad_zero_gat, \
            "mesh_valid_dev only supports mesh-only fit gating"
    bad = (fit_err > opts.fitting_thr if fit_err is not None
           else np.zeros(b, bool))
    if stage == "gator":
        # per-SAMPLE validity masks are [B, 1, 1] and broadcast inside the
        # loss — materializing [B, V, 1] (56 MB at B=2048) bought nothing
        good = (mesh_valid_dev if mesh_valid_dev is not None
                else (~bad).astype(np.float32)[:, None, None])
        ones = np.ones((b, 1, 1), np.float32)
        return {
            "pose2d": pose2d,
            "mesh": mesh_rel_m,
            "lift_pose3d": batch_j3d(joint_cam_b),
            "reg_pose3d": reg_pose.astype(np.float32),
            "mesh_valid": good if "mesh" in bad_zero_gator else ones,
            "reg_valid": good if "reg" in bad_zero_gator else ones,
            "lift_valid": good if "lift" in bad_zero_gator else ones,
        }
    joint_valid = np.ones((b, 1, 1), np.float32)
    if bad_zero_gat:
        joint_valid[bad] = 0
    return {
        "pose2d": pose2d,
        "joint_cam": batch_j3d(joint_cam_b),
        "joint_valid": joint_valid,
    }


def mixed_epoch_indices(lengths, rng: np.random.Generator) -> np.ndarray:
    """MultipleDatasets(make_same_len=True) semantics, exactly: epoch
    length = max_len * n_dbs; each slot draws a uniform random dataset;
    data index = (slot % max_len) % len(db), EXCEPT in the modular tail
    (slot positions beyond len(db) * (max_len // len(db))) which resamples
    uniformly — preserving the reference's per-epoch coverage property
    (every sample of every db appears ~max_len/len(db) times per epoch)
    (reference: data/multiple_datasets.py:22-29)."""
    lengths = np.asarray(lengths, np.int64)
    n_dbs = len(lengths)
    max_len = int(lengths.max())
    total = max_len * n_dbs
    db_choice = rng.integers(0, n_dbs, size=total)
    slot = np.arange(total, dtype=np.int64) % max_len
    db_len = lengths[db_choice]
    cutoff = db_len * (max_len // db_len)
    resampled = rng.integers(0, db_len)           # vectorized per-slot draw
    data_idx = np.where(slot >= cutoff, resampled, slot % db_len)
    return np.stack([db_choice, data_idx], axis=1)

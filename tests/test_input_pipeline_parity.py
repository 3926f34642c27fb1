"""Input-pipeline oracle parity: drive the reference's OWN aug/coord
functions (imported from /root/reference/lib) through the exact per-sample
recipe of its `__getitem__` (reference: data/Human36M/dataset.py:339-419,
421-453) and assert the repo's `crop_and_normalize_input` /
`batch_crop_and_normalize` / target assembly reproduce (inputs, targets)
bit-for-bit up to float rounding.

Covers the GT-input branch and the detected-input branches (h36m synthetic
error with a shared seeded draw, h36m/coco test-split detector replacement)
for both joint sets. The COCO train-split `synthesize_pose` branch is
distribution-tested in test_data.py (its draws are not stream-compatible
with the reference's global-np.random use, by design).
"""
import importlib.util
import os
import sys

import numpy as np
import pytest

import reference_oracle as oracle
from gator_tpu.data import augment, coords, noise, processing


@pytest.fixture(scope="module")
def ref_mods():
    """Import the reference's aug_utils / coord_utils themselves."""
    _, cfg = oracle.import_reference()  # sys.path + fake core.config
    # process_bbox reads the model input shape off the global cfg
    # (reference: lib/coord_utils.py:57); H, W as the reference sets it
    cfg.MODEL.input_shape = (384, 288)
    import aug_utils as ref_aug        # noqa: E402
    import coord_utils as ref_coord    # noqa: E402
    return ref_aug, ref_coord


def _jset(name, small_assets, small_assets_coco):
    return (small_assets if name == "human36"
            else small_assets_coco).joint_set


def _rand_pixels(jnum, seed):
    rng = np.random.default_rng(seed)
    base = rng.uniform(200, 800, size=(1, 2))
    return (base + rng.uniform(-120, 120, size=(jnum, 2))).astype(
        np.float32)


def _reference_recipe(ref_aug, ref_coord, joint_img, res_wh, flip, rot,
                      flip_pairs, replace=None):
    """dataset.py:364-389 driven by the reference's own functions.

    replace(proc, trans) -> proc models replace_joint_img (dataset.py:
    421-453); the flip and the normalization happen after it, exactly as
    in the reference."""
    tight = ref_coord.get_bbox(joint_img)
    bbox = ref_coord.process_bbox(tight.copy())
    proc, trans = ref_aug.j2d_processing(
        joint_img.copy().astype(np.float32), res_wh, bbox, rot, 0, None)
    if replace is not None:
        proc = replace(proc, trans)
    if flip:
        proc = ref_aug.flip_2d_joint(proc[:, :2], res_wh[0],
                                     [list(p) for p in flip_pairs])
    proc = proc[:, :2] / np.array([[res_wh[0], res_wh[1]]], np.float32)
    mean, std = np.mean(proc, axis=0), np.std(proc, axis=0)
    return ((proc - mean) / std).astype(np.float32)


@pytest.mark.parametrize("joint_set,flip,rot", [
    ("human36", 0, 0.0), ("human36", 1, 13.7), ("human36", 0, -24.0),
    ("coco", 0, 0.0), ("coco", 1, -9.25),
])
def test_gt_input_branch_matches_reference(joint_set, flip, rot, ref_mods,
                                           small_assets,
                                           small_assets_coco):
    ref_aug, ref_coord = ref_mods
    jset = _jset(joint_set, small_assets, small_assets_coco)
    joint_img = _rand_pixels(jset.joint_num, seed=hash((joint_set, flip,
                                                        int(rot))) % 1000)
    opts = processing.ProcessOptions(is_train=True,
                                     input_joint_name=joint_set)

    want = _reference_recipe(ref_aug, ref_coord, joint_img, opts.res_wh,
                             flip, rot, jset.flip_pairs)
    got = processing.crop_and_normalize_input(
        joint_img, jset, opts, np.random.default_rng(0), flip, rot)
    np.testing.assert_allclose(got, want, atol=1e-5)

    # and the batched path reproduces the same sample
    got_b = processing.batch_crop_and_normalize(
        joint_img[None], jset, opts,
        np.array([flip], np.int64), np.array([rot], np.float32))
    np.testing.assert_allclose(got_b[0], want, atol=2e-4)


def test_h36m_synth_error_branch_matches_reference(ref_mods, small_assets):
    """Train-split detected-input for h36m: GT + (syn_error/256)*input_shape
    (reference: dataset.py:443-447); the same seeded draw feeds both sides
    so the placement and scaling are compared exactly."""
    ref_aug, ref_coord = ref_mods
    jset = small_assets.joint_set
    joint_img = _rand_pixels(jset.joint_num, seed=5)
    opts = processing.ProcessOptions(is_train=True, use_gt_input=False,
                                     input_joint_name="human36")
    stats = noise.h36m_error_stats(jset.joints_name)
    err = noise.generate_h36m_syn_error(stats, np.random.default_rng(17))

    def replace(proc, trans):
        scaled = err / 256.0 * np.array(
            [opts.input_shape[1], opts.input_shape[0]], np.float32)
        return proc[:, :2] + scaled

    want = _reference_recipe(ref_aug, ref_coord, joint_img, opts.res_wh,
                             1, 8.5, jset.flip_pairs, replace=replace)
    got = processing.crop_and_normalize_input(
        joint_img, jset, opts, np.random.default_rng(17), 1, 8.5,
        h36m_noise_stats=stats)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("joint_set", ["human36", "coco"])
def test_detected_input_branch_matches_reference(joint_set, ref_mods,
                                                 small_assets,
                                                 small_assets_coco):
    """Test-split detector replacement: the detector keypoints ride through
    the GT-bbox crop affine (reference: dataset.py:436-440, 448-453)."""
    ref_aug, ref_coord = ref_mods
    jset = _jset(joint_set, small_assets, small_assets_coco)
    joint_img = _rand_pixels(jset.joint_num, seed=31)
    det = (joint_img + np.random.default_rng(7).normal(
        0, 8, joint_img.shape)).astype(np.float32)
    opts = processing.ProcessOptions(is_train=False, use_gt_input=False,
                                     input_joint_name=joint_set)

    def replace(proc, trans):
        out = det.copy()
        for i in range(len(out)):
            out[i, :2] = ref_aug.affine_transform(out[i, :2].copy(), trans)
        return out

    want = _reference_recipe(ref_aug, ref_coord, joint_img, opts.res_wh,
                             0, 0.0, jset.flip_pairs, replace=replace)
    got = processing.crop_and_normalize_input(
        joint_img, jset, opts, np.random.default_rng(0), 0, 0.0,
        detected_pose=det)
    np.testing.assert_allclose(got, want, atol=1e-5)

    got_b = processing.batch_crop_and_normalize(
        joint_img[None], jset, opts, np.zeros(1, np.int64),
        np.zeros(1, np.float32), detected_pose=det[None])
    np.testing.assert_allclose(got_b[0], want, atol=2e-4)


def test_3d_targets_match_reference(ref_mods, small_assets):
    """j3d_processing (rot+flip) and the GATOR target/validity assembly
    (reference: dataset.py:374,391-407)."""
    ref_aug, _ = ref_mods
    jset = small_assets.joint_set
    rng = np.random.default_rng(3)
    joint_cam = rng.normal(0, 300, (jset.joint_num, 3)).astype(np.float32)

    for rot, flip in ((0.0, 0), (33.0, 1), (-12.0, 0)):
        want = ref_aug.j3d_processing(
            joint_cam.copy(), rot, flip, [list(p) for p in jset.flip_pairs])
        got = augment.j3d_processing(joint_cam.copy(), rot, flip,
                                     jset.flip_pairs)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)

    # fitting-error gating of the validity masks (dataset.py:391-399)
    mesh_mm = rng.normal(0, 100, (small_assets.mean_vertices.shape[0], 3))
    opts = processing.ProcessOptions(is_train=True, fitting_thr=25.0,
                                     input_joint_name="coco")
    tgt_ok = processing.gator_targets(
        mesh_mm, joint_cam, joint_cam[:17] if jset.joint_num >= 17
        else joint_cam, 10.0, opts, 0, 0.0, jset)
    tgt_bad = processing.gator_targets(
        mesh_mm, joint_cam, joint_cam[:17] if jset.joint_num >= 17
        else joint_cam, 30.0, opts, 0, 0.0, jset)
    assert tgt_ok["mesh_valid"].all() and tgt_ok["lift_valid"].all()
    assert not tgt_bad["mesh_valid"].any()
    assert not tgt_bad["lift_valid"].any()      # coco input drops lift too
    np.testing.assert_allclose(tgt_ok["mesh"], mesh_mm / 1000.0,
                               atol=1e-7)

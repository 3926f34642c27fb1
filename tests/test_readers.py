"""Dataset-reader tests on fabricated annotation fixtures that follow the
real JSON schemas (the external downloads are not available in CI)."""
import json
import os

import numpy as np
import pytest

from gator_tpu.data import (GtSynthesizer, Human36M, PW3D, ProcessOptions,
                            coords)


@pytest.fixture(scope="module")
def synth(small_assets):
    return GtSynthesizer(small_assets)


def _write_h36m_fixture(root, n_frames=8):
    rng = np.random.default_rng(0)
    annot = os.path.join(root, "Human36M", "annotations")
    os.makedirs(annot, exist_ok=True)
    for subject in (9, 11):
        images, annotations = [], []
        joints, smpls = {}, {}
        cam_r = np.eye(3).tolist()
        cam_t = [0.0, 0.0, 0.0]
        cameras = {str(c): {"R": cam_r, "t": cam_t,
                            "f": [1500.0, 1500.0], "c": [500.0, 500.0]}
                   for c in (1, 2, 3, 4)}
        act, subact = 2, 1
        joints[str(act)] = {str(subact): {}}
        smpls[str(act)] = {str(subact): {}}
        for frame in range(0, n_frames * 50, 50):
            img_id = frame
            images.append({
                "id": img_id, "frame_idx": frame, "subject": subject,
                "action_idx": act, "subaction_idx": subact, "cam_idx": 4,
                "height": 1000, "width": 1000,
                "file_name": (f"s_{subject:02d}_act_{act:02d}_subact_"
                              f"{subact:02d}_ca_04/{frame:06d}.jpg"),
            })
            annotations.append({
                "id": img_id, "image_id": img_id,
                "bbox": [300.0, 200.0, 400.0, 600.0],
            })
            jw = (rng.normal(0, 200, (17, 3))
                  + np.array([0, 0, 4500.0])).tolist()
            joints[str(act)][str(subact)][str(frame)] = jw
            smpls[str(act)][str(subact)][str(frame)] = {
                "pose": (0.1 * rng.normal(size=72)).tolist(),
                "shape": rng.normal(size=10).tolist(),
                "trans": [0.0, 0.0, 4.5],
            }
        base = os.path.join(annot, f"Human36M_subject{subject}")
        json.dump({"images": images, "annotations": annotations},
                  open(base + "_data.json", "w"))
        json.dump(cameras, open(base + "_camera.json", "w"))
        json.dump(joints, open(base + "_joint_3d.json", "w"))
        json.dump(smpls, open(base + "_smpl_param.json", "w"))


def test_h36m_reader_and_eval(tmp_path, small_assets, synth):
    _write_h36m_fixture(str(tmp_path))
    opts = ProcessOptions(input_joint_name="human36", use_gt_input=True)
    ds = Human36M(small_assets, opts, str(tmp_path), "test")
    assert len(ds) == 16  # 8 frames x 2 subjects, sampling 50 keeps all
    assert ds.table.meta["cam_idx"].tolist() == [4] * 16
    batch = ds.make_batch(np.arange(4), synth,
                          np.random.default_rng(0), stage="gator")
    assert batch["pose2d"].shape == (4, 17, 2)
    assert batch["mesh"].shape == (4, small_assets.vertex_num, 3)

    # eval runs end to end: predicted == GT mesh -> ~0 errors
    mesh = np.repeat(
        batch["mesh"][:1] * 1000, len(ds), axis=0).astype(np.float32)
    out = ds.evaluate(mesh, mesh, verbose=False)
    assert out["mpvpe"] == 0.0
    assert out["mpjpe"] > 0  # gt joints come from annotations, not mesh
    assert np.isfinite(out["pa_mpjpe"])


def test_h36m_train_subjects_excluded(tmp_path, small_assets):
    _write_h36m_fixture(str(tmp_path))
    opts = ProcessOptions(input_joint_name="human36")
    # train subjects (1,5,6,7,8) are absent from the fixture
    with pytest.raises(FileNotFoundError):
        Human36M(small_assets, opts, str(tmp_path), "train")


def _write_pw3d_fixture(root, n=6):
    rng = np.random.default_rng(1)
    data_dir = os.path.join(root, "PW3D", "data")
    os.makedirs(data_dir, exist_ok=True)
    images, annotations, dets = [], [], []
    for i in range(n):
        images.append({
            "id": i, "width": 1920, "height": 1080,
            "sequence": "downtown_walking_00",
            "file_name": f"image_{i:05d}.jpg",
            "cam_param": {"focal": [1960.0, 1969.0],
                          "princpt": [960.0, 540.0]},
        })
        annotations.append({
            "id": i, "image_id": i, "person_id": 0,
            "bbox": [500.0, 200.0, 400.0, 700.0],
            "smpl_param": {
                "pose": (0.2 * rng.normal(size=72)).tolist(),
                "shape": rng.normal(size=10).tolist(),
                "trans": [0.0, 0.2, 4.0],
                "gender": "female" if i % 2 else "male",
            },
            "openpose_result": rng.uniform(
                200, 900, size=(18 * 3,)).tolist(),
        })
        dets.append({"annotation_id": i,
                     "keypoints": rng.uniform(
                         200, 900, size=(17, 3)).tolist()})
    json.dump({"images": images, "annotations": annotations},
              open(os.path.join(data_dir, "3DPW_latest_test.json"), "w"))
    json.dump(dets, open(os.path.join(
        data_dir, "darkpose_3dpw_testset_output.json"), "w"))


def test_pw3d_reader_batches_and_eval(tmp_path, small_assets_coco, synth):
    _write_pw3d_fixture(str(tmp_path))
    a = small_assets_coco
    synth_c = GtSynthesizer(a)
    opts = ProcessOptions(input_joint_name="coco", use_gt_input=False)
    ds = PW3D(a, opts, str(tmp_path), "test")
    assert len(ds) == 6
    assert set(ds.table.gender.tolist()) == {1, 2}  # gendered models
    batch = ds.make_batch(np.arange(6), synth_c,
                          np.random.default_rng(0))
    assert batch["pose2d"].shape == (6, 19, 2)
    assert batch["mesh"].shape == (6, a.vertex_num, 3)
    gt = ds.synthesize_gt(np.arange(6), synth_c)
    out = ds.evaluate(gt, gt, verbose=False)
    assert out["mpjpe"] == 0.0 and out["mpvpe"] == 0.0
    # a perturbed prediction yields nonzero finite errors, PA <= MPJPE
    pred = gt + np.random.default_rng(2).normal(0, 20, gt.shape)
    out2 = ds.evaluate(pred.astype(np.float32), gt, verbose=False)
    assert 0 < out2["pa_mpjpe"] <= out2["mpjpe"] * 1.2


def test_pw3d_gt_input_uses_projected_joints(tmp_path, small_assets_coco,
                                             synth):
    _write_pw3d_fixture(str(tmp_path))
    a = small_assets_coco
    synth_c = GtSynthesizer(a)
    gt_opts = ProcessOptions(input_joint_name="coco", use_gt_input=True)
    det_opts = ProcessOptions(input_joint_name="coco", use_gt_input=False)
    ds_gt = PW3D(a, gt_opts, str(tmp_path), "test")
    ds_det = PW3D(a, det_opts, str(tmp_path), "test")
    b_gt = ds_gt.make_batch(np.arange(2), synth_c,
                            np.random.default_rng(0))
    b_det = ds_det.make_batch(np.arange(2), synth_c,
                              np.random.default_rng(0))
    assert not np.allclose(b_gt["pose2d"], b_det["pose2d"])


def test_pw3d_bbox_sanity_filter(tmp_path, small_assets_coco):
    """Annotations whose bbox fails process_bbox are skipped
    (reference: PW3D/dataset.py:135-136)."""
    _write_pw3d_fixture(str(tmp_path))
    path = os.path.join(str(tmp_path), "PW3D", "data",
                        "3DPW_latest_test.json")
    db = json.load(open(path))
    db["annotations"][2]["bbox"] = [100.0, 100.0, 0.0, 0.0]  # degenerate
    db["annotations"][4]["bbox"] = [100.0, 100.0, -5.0, 30.0]
    json.dump(db, open(path, "w"))
    opts = ProcessOptions(input_joint_name="coco", use_gt_input=False)
    ds = PW3D(small_assets_coco, opts, str(tmp_path), "test")
    assert len(ds) == 4


def test_mixed_epoch_indices_reference_semantics():
    """make_same_len sampler: modular slots map deterministically
    (slot % len(db)), only the tail resamples — preserving per-epoch
    coverage (reference: data/multiple_datasets.py:22-29)."""
    from gator_tpu.data.base import mixed_epoch_indices

    lengths = [10, 4]
    rng = np.random.default_rng(0)
    idx = mixed_epoch_indices(lengths, rng)
    assert idx.shape == (20, 2)
    max_len = 10
    for k, (d, i) in enumerate(idx):
        L = lengths[d]
        slot = k % max_len
        cutoff = L * (max_len // L)
        if slot < cutoff:
            assert i == slot % L, (k, d, i)   # modular, not random-offset
        assert 0 <= i < L
    # coverage: over many epochs every sample of the small db appears
    counts = np.zeros(4)
    for e in range(200):
        for d, i in mixed_epoch_indices(lengths,
                                        np.random.default_rng(e)):
            if d == 1:
                counts[i] += 1
    assert counts.min() > 0
    # modular structure makes coverage near-uniform
    assert counts.max() / counts.min() < 1.3


# ---------------------------------------------------------------- COCO


def _write_coco_fixture(root, n=6):
    """person_keypoints JSON + SMPLify fits, plus rows every filter drops
    (crowd, zero keypoints, degenerate bbox, missing fit)."""
    rng = np.random.default_rng(0)
    anns, fits = [], {}
    for i in range(n):
        kp = np.zeros((17, 3), np.float32)
        kp[:, :2] = rng.uniform(100, 400, (17, 2))
        kp[:, 2] = 2
        anns.append({"id": i, "iscrowd": 0, "num_keypoints": 17,
                     "keypoints": np.round(kp, 3).flatten().tolist(),
                     "bbox": [90.0, 80.0, 320.0, 380.0]})
        fits[str(i)] = {
            "smpl_param": {
                "pose": (0.1 * rng.standard_normal(72)).tolist(),
                "shape": rng.uniform(-1, 1, 10).tolist()},
            "cam_param": {"s": [200.0], "t": [150.0, 200.0]}}
    kp0 = anns[0]["keypoints"]
    anns.append({"id": 100, "iscrowd": 1, "num_keypoints": 17,
                 "keypoints": kp0, "bbox": [90.0, 80.0, 320.0, 380.0]})
    anns.append({"id": 101, "iscrowd": 0, "num_keypoints": 0,
                 "keypoints": [0.0] * 51,
                 "bbox": [90.0, 80.0, 320.0, 380.0]})
    anns.append({"id": 102, "iscrowd": 0, "num_keypoints": 17,
                 "keypoints": kp0, "bbox": [90.0, 80.0, 0.0, 0.0]})
    anns.append({"id": 103, "iscrowd": 0, "num_keypoints": 17,
                 "keypoints": kp0, "bbox": [90.0, 80.0, 320.0, 380.0]})
    fits["100"] = fits["101"] = fits["102"] = fits["0"]   # 103 has no fit
    d = os.path.join(root, "COCO", "annotations")
    os.makedirs(d, exist_ok=True)
    json.dump({"annotations": anns},
              open(os.path.join(d, "person_keypoints_train2017.json"), "w"))
    json.dump(fits, open(os.path.join(d, "coco_smplify_train.json"), "w"))


def test_coco_reader_filters_and_batches(tmp_path, small_assets_coco):
    from gator_tpu.data import CocoDataset

    _write_coco_fixture(str(tmp_path))
    a = small_assets_coco
    synth_c = GtSynthesizer(a)
    opts = ProcessOptions(input_joint_name="coco", is_train=True)
    ds = CocoDataset(a, opts, str(tmp_path))
    # crowd / zero-kp / bad-bbox / missing-fit rows all dropped
    assert len(ds) == 6
    batch = ds.make_batch(np.arange(6), synth_c,
                          np.random.default_rng(0), stage="gator")
    assert batch["pose2d"].shape == (6, 19, 2)
    assert batch["mesh"].shape == (6, a.vertex_num, 3)
    assert np.isfinite(batch["pose2d"]).all()
    # COCO zeroes every mask on a bad fit (reference: COCO/dataset.py:270)
    for key in ("mesh_valid", "reg_valid", "lift_valid"):
        assert batch[key].shape == (6, 1, 1)
    gat = ds.make_batch(np.arange(6), synth_c,
                        np.random.default_rng(0), stage="gat")
    assert gat["joint_cam"].shape == (6, 19, 3)


def test_coco_fitting_error_batch_matches_scalar(tmp_path,
                                                 small_assets_coco):
    """The batched 2D fitting filter (similarity-factored) equals the
    scalar crop-affine computation."""
    from gator_tpu.data import CocoDataset

    _write_coco_fixture(str(tmp_path))
    a = small_assets_coco
    opts = ProcessOptions(input_joint_name="coco", is_train=True)
    ds = CocoDataset(a, opts, str(tmp_path))
    t = ds.table
    rng = np.random.default_rng(1)
    smpl_kp = t.joint_img + rng.normal(0, 8, t.joint_img.shape)
    smpl_kp = np.concatenate(
        [smpl_kp, np.ones(smpl_kp.shape[:2] + (1,), np.float32)],
        axis=-1).astype(np.float32)
    t.joint_valid[1, :5] = 0            # partial validity
    t.joint_valid[2] = 0                # no valid joints -> inf
    batched = ds._fitting_error_2d_batch(t.bbox, t.joint_img,
                                         t.joint_valid, smpl_kp)
    scalar = np.array([
        ds._fitting_error_2d(t.bbox[i], t.joint_img[i], t.joint_valid[i],
                             smpl_kp[i]) for i in range(len(ds))],
        np.float32)
    np.testing.assert_allclose(batched, scalar, rtol=1e-4)
    assert np.isinf(batched[2])


# ---------------------------------------------------------------- MuCo


def _write_muco_fixture(root):
    """Two persons in one image (closest wins), a NaN-param row and a
    missing-param row (both dropped)."""
    rng = np.random.default_rng(0)

    def kp_cam(depth):
        k = rng.uniform(-400, 400, (21, 3)).astype(np.float32)
        k[:, 2] = depth + rng.uniform(0, 100, 21)
        k[14, 2] = depth                       # pelvis depth
        return k

    def param():
        return {"pose": (0.1 * rng.standard_normal(72)).tolist(),
                "shape": rng.uniform(-1, 1, 10).tolist(),
                "trans": [0.0, 0.0, 3.0]}

    images = [{"id": 0, "f": [1500.0, 1500.0], "c": [1000.0, 1000.0]},
              {"id": 1, "f": [1500.0, 1500.0], "c": [1000.0, 1000.0]},
              {"id": 2, "f": [1500.0, 1500.0], "c": [1000.0, 1000.0]}]
    anns = [
        {"id": 0, "image_id": 0, "bbox": [50.0, 50.0, 300.0, 400.0],
         "keypoints_cam": kp_cam(4000.0).tolist()},
        {"id": 1, "image_id": 0, "bbox": [60.0, 60.0, 300.0, 400.0],
         "keypoints_cam": kp_cam(2500.0).tolist()},   # closer -> chosen
        {"id": 2, "image_id": 1, "bbox": [50.0, 50.0, 300.0, 400.0],
         "keypoints_cam": kp_cam(3000.0).tolist()},   # NaN params
        {"id": 3, "image_id": 2, "bbox": [50.0, 50.0, 300.0, 400.0],
         "keypoints_cam": kp_cam(3000.0).tolist()},   # no params
    ]
    params = {"0": param(), "1": param(), "2": param()}
    params["2"]["pose"][0] = float("nan")
    d = os.path.join(root, "MuCo", "data")
    os.makedirs(d, exist_ok=True)
    json.dump({"images": images, "annotations": anns},
              open(os.path.join(d, "MuCo-3DHP.json"), "w"))
    json.dump(params, open(os.path.join(d, "smpl_param.json"), "w"))


def test_muco_reader_filters_and_batches(tmp_path, small_assets_coco):
    from gator_tpu.data import MucoDataset
    from gator_tpu.data.muco import MUCO_ROOT_IDX

    _write_muco_fixture(str(tmp_path))
    a = small_assets_coco
    synth_c = GtSynthesizer(a)
    opts = ProcessOptions(input_joint_name="coco", is_train=True)
    ds = MucoDataset(a, opts, str(tmp_path))
    # image 0 contributes its CLOSEST person; NaN and missing params drop
    assert len(ds) == 1
    assert ds.table.joint_cam_muco[0, MUCO_ROOT_IDX, 2] == 2500.0
    batch = ds.make_batch(np.arange(1), synth_c,
                          np.random.default_rng(0), stage="gator")
    assert batch["pose2d"].shape == (1, 19, 2)
    assert batch["mesh"].shape == (1, a.vertex_num, 3)
    assert np.isfinite(batch["pose2d"]).all()


# ---------------------------------------------------------------- AMASS


def _write_amass_fixture(root):
    d = os.path.join(root, "AMASS", "data", "CMU", "subj01")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    np.savez(os.path.join(d, "walk_poses.npz"),
             poses=0.1 * rng.standard_normal((121, 156)),
             betas=rng.uniform(-1, 1, 16))
    # a non-CMU subject the GATOR subset rule skips
    d2 = os.path.join(root, "AMASS", "data", "BMLrub", "s1")
    os.makedirs(d2, exist_ok=True)
    np.savez(os.path.join(d2, "run_poses.npz"),
             poses=0.1 * rng.standard_normal((30, 156)),
             betas=rng.uniform(-1, 1, 16))


def test_amass_reader_subsets_and_batches(tmp_path, small_assets):
    from gator_tpu.data import AmassDataset

    _write_amass_fixture(str(tmp_path))
    a = small_assets
    synth_h = GtSynthesizer(a)
    opts = ProcessOptions(input_joint_name="human36", is_train=True)
    ds = AmassDataset(a, opts, str(tmp_path), model_name="GATOR")
    # CMU only for GATOR: 121 frames / 60 sampling = 3 frames x 4 cameras
    assert len(ds) == 12
    ds_gat = AmassDataset(a, opts, str(tmp_path), model_name="GAT")
    assert len(ds_gat) > len(ds)       # BML joins for the GAT stage
    batch = ds.make_batch(np.arange(8), synth_h,
                          np.random.default_rng(0), stage="gator")
    assert batch["pose2d"].shape == (8, 17, 2)
    assert batch["mesh"].shape == (8, a.vertex_num, 3)
    # mocap GT is exact: all masks stay 1 (no fitting filter)
    assert float(np.asarray(batch["mesh_valid"]).min()) == 1.0

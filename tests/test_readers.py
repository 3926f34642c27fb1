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

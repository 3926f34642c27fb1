"""Tests against the REAL data bundled with the reference repo
(/root/reference/data, read-only): the genuine 17x6890 J_regressors and the
genuine demo input pose (reference: demo/coco_joint_input.npy). Everything
else (SMPL pkls, dataset JSONs) is an external download and stays synthetic.
"""
import os

import numpy as np
import pytest

from gator_tpu.assets import build_assets

REF_DATA = "/root/reference/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference data not present")


@pytest.fixture(scope="module")
def real_assets_coco():
    return build_assets("coco", data_dirs=[REF_DATA])


def test_real_regressors_flow_through_bundle(real_assets_coco):
    """build_assets picks up the bundled regressors byte-for-byte
    (reference files: data/Human36M/J_regressor_h36m_correct.npy,
    data/COCO/J_regressor_coco.npy)."""
    a = real_assets_coco
    want_h36m = np.load(
        os.path.join(REF_DATA, "Human36M", "J_regressor_h36m_correct.npy"))
    want_coco = np.load(
        os.path.join(REF_DATA, "COCO", "J_regressor_coco.npy"))
    np.testing.assert_array_equal(a.j_regressor_h36m,
                                  want_h36m.astype(np.float32))
    np.testing.assert_array_equal(a.j_regressor_coco,
                                  want_coco.astype(np.float32))
    # real regressors are convex-ish vertex weightings: rows sum to ~1
    np.testing.assert_allclose(a.j_regressor_h36m.sum(1), 1.0, atol=1e-3)
    assert a.j_regressor_h36m.shape == (17, 6890)


def test_demo_on_real_input_pose(tmp_path, real_assets_coco):
    """Full demo pipeline on the genuine bundled 2D pose
    (reference: demo/run.py:192-222 with demo/coco_joint_input.npy)."""
    from gator_tpu.cli.demo import run_demo

    pose_path = os.path.join(os.path.dirname(REF_DATA),
                             "demo", "coco_joint_input.npy")
    out = run_demo(pose_path, "coco", None, str(tmp_path / "out"),
                   assets=real_assets_coco)
    mesh = out["mesh"]
    assert mesh.shape == (6890, 3)
    assert np.isfinite(mesh).all()
    # untrained weights still produce a template-anchored mesh: the MDR
    # output is init_vertices + a bounded perturbation, so extent stays
    # body-scale (meters)
    extent = mesh.max(0) - mesh.min(0)
    assert (extent < 5.0).all() and (extent > 0.05).all()
    cam = out["cam"]
    # untrained weights give arbitrary 3D joints, so the closed-form fit's
    # scale sign is unconstrained — just require a finite, nonzero fit
    assert np.isfinite(float(cam.s[0, 0])) and float(cam.s[0, 0]) != 0.0
    assert os.path.getsize(str(tmp_path / "out" / "demo_mesh.obj")) > 0

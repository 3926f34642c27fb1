"""Run the reference's OWN PyTorch model (/root/reference/lib) against the
flax rebuild on identical converted weights, in both conversion directions.

This is the proof behind every parity-by-construction claim: the two model
stacks share nothing but the asset tables (which are synthesized once and
fed to both sides) and the converted state dict. Eval-mode forward outputs
must agree to <=1e-4 m on the mesh.

Covers: alpha=False (BatchNorm head) and alpha=True (LayerNorm+scale head),
17-joint (human36) and 19-joint (coco) variants, the GAT stage-1 lifter
alone, and the real bundled J_regressors from /root/reference/data.
"""
import numpy as np
import pytest
import torch

import reference_oracle as oracle
from gator_tpu import assets as gassets
from gator_tpu.convert import torch_loader
from gator_tpu.models import (GAT, GatSpec, GatorSpec, forward_gator,
                              init_gat, init_gator)

import jax


@pytest.fixture(scope="module")
def real_assets_h36m():
    return gassets.build_assets("human36", data_dirs=[oracle.REF_DATA])


@pytest.fixture(scope="module")
def real_assets_coco():
    return gassets.build_assets("coco", data_dirs=[oracle.REF_DATA])


@pytest.fixture(scope="module")
def workdirs(tmp_path_factory, real_assets_h36m, real_assets_coco):
    d = {}
    for name, assets in (("human36", real_assets_h36m),
                         ("coco", real_assets_coco)):
        p = tmp_path_factory.mktemp(f"refdata_{name}")
        oracle.write_base_data(str(p), assets, name)
        d[name] = str(p)
    return d


def _assets(name, h36m, coco):
    return h36m if name == "human36" else coco


def _forward_torch(model, pose2d):
    with torch.no_grad():
        mesh, pose3d = model(torch.from_numpy(pose2d))
    return mesh.numpy(), pose3d.numpy()


def _rand_pose(jnum, b=4, seed=0):
    rng = np.random.default_rng(seed)
    return (0.5 + 0.25 * rng.standard_normal((b, jnum, 2))).astype(np.float32)


def _assert_close(got, ref, atol, what):
    diff = np.abs(got - ref).max()
    assert diff <= atol, f"{what}: max abs diff {diff:.3e} > {atol:g}"


@pytest.mark.parametrize("joint_set,alpha", [
    ("human36", False), ("human36", True),
    ("coco", False), ("coco", True),
])
def test_torch_to_flax_forward_parity(joint_set, alpha, workdirs,
                                      real_assets_h36m, real_assets_coco):
    """Reference torch weights -> convert_state_dict -> flax forward match."""
    assets = _assets(joint_set, real_assets_h36m, real_assets_coco)
    torch.manual_seed(11)
    ref_model = oracle.build_reference_gator(
        assets, workdirs[joint_set], alpha=alpha)
    if not alpha:
        oracle.randomize_running_stats(ref_model)

    spec = GatorSpec.from_assets(assets, embed_dim=128, depth=6, alpha=alpha)
    template = init_gator(spec, jax.random.PRNGKey(0))
    variables = torch_loader.convert_state_dict(
        oracle.torch_state_numpy(ref_model), template)

    pose2d = _rand_pose(assets.joint_num)
    ref_mesh, ref_pose3d = _forward_torch(ref_model, pose2d)
    (mesh, pose3d), _ = forward_gator(spec, variables, pose2d)

    _assert_close(np.asarray(mesh), ref_mesh, 1e-4, "mesh (m)")
    scale = max(1.0, float(np.abs(ref_pose3d).max()))
    _assert_close(np.asarray(pose3d) / scale, ref_pose3d / scale,
                  1e-5, "pose3d (rel)")


@pytest.mark.parametrize("joint_set,alpha", [
    ("human36", False), ("coco", True),
])
def test_flax_to_torch_export_parity(joint_set, alpha, workdirs,
                                     real_assets_h36m, real_assets_coco):
    """Flax-initialized weights -> export_state_dict -> torch forward match
    (the direction a user takes back to the reference)."""
    assets = _assets(joint_set, real_assets_h36m, real_assets_coco)
    spec = GatorSpec.from_assets(assets, embed_dim=128, depth=6, alpha=alpha)
    variables = init_gator(spec, jax.random.PRNGKey(3))
    exported = {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in torch_loader.export_state_dict(variables).items()}

    torch.manual_seed(5)
    ref_model = oracle.build_reference_gator(
        assets, workdirs[joint_set], alpha=alpha)
    result = ref_model.load_state_dict(exported, strict=False)
    assert result.unexpected_keys == []
    # only non-parameter buffers may be missing from the export; they are
    # baked into the flax program as asset constants
    buffers = {"pose_lifter.graph_adj", "pose_lifter.init_vertices",
               "pose2mesh.init_vertices", "pose2mesh.init_vertices_6890"}
    assert set(result.missing_keys) <= buffers
    ref_model.eval()

    pose2d = _rand_pose(assets.joint_num, seed=42)
    ref_mesh, ref_pose3d = _forward_torch(ref_model, pose2d)
    (mesh, pose3d), _ = forward_gator(spec, variables, pose2d)

    _assert_close(np.asarray(mesh), ref_mesh, 1e-4, "mesh (m)")
    scale = max(1.0, float(np.abs(ref_pose3d).max()))
    _assert_close(np.asarray(pose3d) / scale, ref_pose3d / scale,
                  1e-5, "pose3d (rel)")


def test_gat_stage_parity(workdirs, real_assets_h36m):
    """Stage-1 GAT lifter alone: torch -> flax conversion forward match."""
    assets = real_assets_h36m
    torch.manual_seed(23)
    ref_model = oracle.build_reference_gat(assets, workdirs["human36"])

    spec = GatSpec.from_assets(assets, embed_dim=128, depth=6)
    template = init_gat(spec, jax.random.PRNGKey(0))
    variables = torch_loader.convert_state_dict(
        oracle.torch_state_numpy(ref_model), template)

    pose2d = _rand_pose(assets.joint_num, seed=9)
    with torch.no_grad():
        ref_pose3d, ref_feat = ref_model(
            torch.from_numpy(pose2d.reshape(4, -1)))
    model = GAT(spec=spec)
    pose3d, feat = model.apply(variables, pose2d.reshape(4, -1))

    scale = max(1.0, float(np.abs(ref_pose3d.numpy()).max()))
    _assert_close(np.asarray(pose3d) / scale, ref_pose3d.numpy() / scale,
                  1e-5, "pose3d (rel)")
    fscale = max(1.0, float(np.abs(ref_feat.numpy()).max()))
    _assert_close(np.asarray(feat) / fscale, ref_feat.numpy() / fscale,
                  1e-5, "features (rel)")


def test_check_real_checkpoint_tool(tmp_path, workdirs, real_assets_h36m):
    """tools/check_real_checkpoint.py — the docs/REPRODUCE.md converter
    gate — passes on a reference-format .pth.tar (DataParallel 'module.'
    prefixes + model_state_dict wrapper) and exits 0."""
    import importlib.util
    import os

    torch.manual_seed(31)
    ref_model = oracle.build_reference_gator(
        real_assets_h36m, workdirs["human36"], alpha=True)
    ckpt = {"model_state_dict": {
        "module." + k: v for k, v in ref_model.state_dict().items()},
        "epoch": 30}
    path = str(tmp_path / "fake_h36m.pth.tar")
    torch.save(ckpt, path)

    tool = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools", "check_real_checkpoint.py")
    spec_ = importlib.util.spec_from_file_location("check_real_ckpt", tool)
    mod = importlib.util.module_from_spec(spec_)
    spec_.loader.exec_module(mod)
    assert mod.main([path, "--joint_set", "human36", "--cpu"]) == 0

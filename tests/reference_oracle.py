"""Load the *actual* PyTorch reference model (/root/reference/lib) as a
parity oracle.

The reference needs three things this sandbox doesn't have:
  * `easydict` / `timm` packages -> tiny faithful shims registered in
    sys.modules (DropPath is identity in eval; timm Mlp is
    fc1 -> act -> drop -> fc2 -> drop with those exact attribute names);
  * a CUDA device -> `torch.Tensor.cuda` / `torch.nn.Module.cuda` patched to
    identity, and `Mesh.__init__`'s default device flipped to cpu
    (reference: lib/models/backbones/mesh.py:61-63);
  * asset npy/npz files under ./data/base_data (smpl_mean_vertices,
    shortest_path_*/path_*, J_regressor_h36m, mesh_downsampling.npz) -> all
    synthesized from this repo's own asset bundle so both sides consume
    byte-identical tables (reference loads: lib/models/GAT.py:66,89-93,
    lib/models/MDR.py:79,85, lib/models/backbones/mesh.py:61).

`core.config` is NOT imported for real: importing it rmtree's+creates
experiment dirs under the (read-only) reference tree
(reference: lib/core/config.py:26-39), so a minimal fake cfg module is
registered first. Only the keys the model files read exist on it
(DATASET.BASE_DATA_DIR, MODEL.alpha, MODEL.posenet_pretrained).
"""
from __future__ import annotations

import contextlib
import os
import sys
import types

import numpy as np
import scipy.sparse as sp
import torch

REF_LIB = "/root/reference/lib"
REF_DATA = "/root/reference/data"


def _install_easydict():
    if "easydict" in sys.modules:
        return sys.modules["easydict"].EasyDict

    class EasyDict(dict):
        def __getattr__(self, name):
            try:
                return self[name]
            except KeyError:
                raise AttributeError(name)

        def __setattr__(self, name, value):
            self[name] = value

    mod = types.ModuleType("easydict")
    mod.EasyDict = EasyDict
    sys.modules["easydict"] = mod
    return EasyDict


def _install_timm():
    if "timm" in sys.modules:
        return
    import torch.nn as tnn

    class DropPath(tnn.Module):
        """timm stochastic depth; identity in eval mode."""

        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob or 0.0

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.floor(
                keep + torch.rand(shape, dtype=x.dtype, device=x.device))
            return x / keep * mask

    class Mlp(tnn.Module):
        """timm MLP exactly as the reference-era timm defines it (param
        names fc1/fc2 matter for checkpoint keys)."""

        def __init__(self, in_features, hidden_features=None,
                     out_features=None, act_layer=tnn.GELU, drop=0.0):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = tnn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = tnn.Linear(hidden_features, out_features)
            self.drop = tnn.Dropout(drop)

        def forward(self, x):
            return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    layers.DropPath = DropPath
    vit = types.ModuleType("timm.models.vision_transformer")
    vit.Mlp = Mlp
    timm.models = timm_models
    timm_models.layers = layers
    timm_models.vision_transformer = vit
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = timm_models
    sys.modules["timm.models.layers"] = layers
    sys.modules["timm.models.vision_transformer"] = vit


def _install_fake_core_config():
    if "core.config" in sys.modules:
        return sys.modules["core.config"].cfg
    EasyDict = _install_easydict()
    cfg = EasyDict()
    cfg.DATASET = EasyDict()
    cfg.DATASET.BASE_DATA_DIR = "data/base_data"
    cfg.MODEL = EasyDict()
    cfg.MODEL.alpha = False
    cfg.MODEL.posenet_pretrained = False
    cfg.MODEL.posenet_path = ""
    core = types.ModuleType("core")
    core.__path__ = []  # mark as package so core.config resolves
    config = types.ModuleType("core.config")
    config.cfg = cfg
    core.config = config
    sys.modules["core"] = core
    sys.modules["core.config"] = config
    return cfg


_REF = None


def import_reference():
    """Import the reference model modules once; returns (module dict, cfg)."""
    global _REF
    if _REF is not None:
        return _REF
    _install_easydict()
    _install_timm()
    cfg = _install_fake_core_config()
    if REF_LIB not in sys.path:
        sys.path.insert(0, REF_LIB)
    # no GPU in this sandbox: .cuda() becomes identity (the reference calls
    # it on tensors and modules all through the model constructors)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    import models.GAT as ref_GAT          # noqa: E402
    import models.MDR as ref_MDR          # noqa: E402
    import models.GATOR as ref_GATOR      # noqa: E402
    from models.backbones import mesh as ref_mesh  # noqa: E402

    # Mesh defaults: (filename, num_downsampling, nsize, device) — flip the
    # device default to cpu (reference: lib/models/backbones/mesh.py:61-63)
    ref_mesh.Mesh.__init__.__defaults__ = (
        "data/base_data/mesh_downsampling.npz", 1, 1, torch.device("cpu"))

    _REF = ({"GAT": ref_GAT, "MDR": ref_MDR, "GATOR": ref_GATOR,
             "mesh": ref_mesh}, cfg)
    return _REF


def write_base_data(dirpath: str, assets, joint_set_name: str) -> None:
    """Synthesize the reference's ./data/base_data files from this repo's
    asset bundle so the torch oracle and the flax model share tables."""
    base = os.path.join(dirpath, "data", "base_data")
    os.makedirs(base, exist_ok=True)
    np.save(os.path.join(base, "smpl_mean_vertices.npy"),
            assets.mean_vertices.astype(np.float32))
    np.save(os.path.join(base, "J_regressor_h36m.npy"),
            assets.j_regressor_h36m.astype(np.float32))
    tag = "3dpw" if joint_set_name == "coco" else "h36m"
    np.save(os.path.join(base, f"shortest_path_{tag}.npy"),
            assets.graph.spatial_pos.astype(np.int64))
    np.save(os.path.join(base, f"path_{tag}.npy"),
            assets.graph.path.astype(np.int64))
    s = assets.sampling
    sizes = s.sizes  # (V0, V1, V2)
    a = np.empty(3, dtype=object)
    for i, n in enumerate(sizes):
        a[i] = sp.identity(n, format="csr", dtype=np.float32)
    u = np.empty(2, dtype=object)
    u[0] = sp.csr_matrix(s.up1.astype(np.float32))
    u[1] = sp.csr_matrix(s.up2.astype(np.float32))
    d = np.empty(2, dtype=object)
    d[0] = sp.csr_matrix(s.down1.astype(np.float32))
    d[1] = sp.csr_matrix(s.down2.astype(np.float32))
    np.savez(os.path.join(base, "mesh_downsampling.npz"), A=a, U=u, D=d)


@contextlib.contextmanager
def chdir(path):
    old = os.getcwd()
    os.chdir(path)
    try:
        yield
    finally:
        os.chdir(old)


def build_reference_gator(assets, workdir: str, alpha: bool = False):
    """Construct the reference torch GATOR in eval mode.

    assets: this repo's GatorAssets for the same joint set; workdir: a
    directory where write_base_data() has been run. Returns the torch
    module."""
    ref, cfg = import_reference()
    cfg.MODEL.alpha = alpha
    jset = assets.joint_set
    # unpruned build_adj output (skeleton + flip pairs + I); the reference
    # GAT prunes the fixed symmetric pairs itself (lib/models/GAT.py:57-64)
    graph_adj = [sp.csr_matrix(jset.adjacency())]
    if jset.name == "coco":
        j_reg = assets.j_regressor_coco
    else:
        j_reg = assets.j_regressor_h36m
    with chdir(workdir):
        model = ref["GATOR"].get_model(
            num_joint=jset.joint_num, embed_dim=128, depth=6,
            graph_adj=graph_adj, GCN_depth=1,
            J_regressor=torch.from_numpy(np.asarray(j_reg, np.float32)))
    model.eval()
    return model


def build_reference_gat(assets, workdir: str):
    """Construct the reference torch GAT lifter alone (stage-1 model)."""
    ref, _ = import_reference()
    jset = assets.joint_set
    graph_adj = [sp.csr_matrix(jset.adjacency())]
    j_reg = (assets.j_regressor_coco if jset.name == "coco"
             else assets.j_regressor_h36m)
    with chdir(workdir):
        model = ref["GAT"].get_model(
            num_joint=jset.joint_num, embed_dim=128, depth=6,
            graph_adj=graph_adj, GCN_depth=1,
            J_regressor=torch.from_numpy(np.asarray(j_reg, np.float32)),
            pretrained=False)
    model.eval()
    return model


def torch_state_numpy(model) -> dict:
    return {k: v.detach().cpu().numpy()
            for k, v in model.state_dict().items()}


def randomize_running_stats(model, seed: int = 7) -> None:
    """Give BatchNorm layers non-trivial running stats so eval-mode parity
    actually exercises them."""
    g = torch.Generator().manual_seed(seed)
    for mod in model.modules():
        if isinstance(mod, torch.nn.BatchNorm1d):
            with torch.no_grad():
                mod.running_mean.copy_(
                    torch.randn(mod.running_mean.shape, generator=g) * 0.1)
                mod.running_var.copy_(
                    1.0 + 0.5 * torch.rand(mod.running_var.shape,
                                           generator=g))

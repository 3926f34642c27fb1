"""Verify a released reference checkpoint end to end: load the .pth.tar
into the reference's OWN torch GATOR (/root/reference/lib), convert the
same weights onto the flax rebuild, and print the max vertex deviation
between the two eval-mode forwards on a random pose batch.

This is the converter sanity gate from docs/REPRODUCE.md — run it on each
of the four released checkpoints (h36m[_det].pth.tar, 3dpw[_det].pth.tar,
reference README "Pretrained model weights") before trusting an accuracy
delta. Pass bar: <= 1e-4 m, the same tolerance the random-weight parity
suite enforces (tests/test_reference_parity.py).

Usage:
    python tools/check_real_checkpoint.py /path/to/h36m_det.pth.tar \
        --joint_set human36 [--no-alpha] [--batch 4]

joint_set must match the checkpoint's training config: human36 for the
h36m* checkpoints, coco for the 3dpw* ones (reference asset/yaml/gator_*).
"""
import argparse
import os
import sys
import tempfile

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", help="reference .pth.tar / .pth file")
    p.add_argument("--joint_set", choices=["human36", "coco"],
                   default="human36")
    p.add_argument("--no-alpha", dest="alpha", action="store_false",
                   help="checkpoint trained with MODEL.alpha=false "
                        "(BatchNorm head instead of LayerNorm+scale)")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the parity check is "
                        "host-side; avoids remote TPU compiles)")
    args = p.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import torch

    import reference_oracle as oracle
    from gator_tpu import assets as gassets
    from gator_tpu.convert import torch_loader
    from gator_tpu.convert.torch_loader import load_torch_checkpoint
    from gator_tpu.models import GatorSpec, forward_gator, init_gator

    import jax

    assets = gassets.build_assets(args.joint_set,
                                  data_dirs=[oracle.REF_DATA])

    with tempfile.TemporaryDirectory() as workdir:
        oracle.write_base_data(workdir, assets, args.joint_set)
        ref_model = oracle.build_reference_gator(
            assets, workdir, alpha=args.alpha)
    torch_state = load_torch_checkpoint(args.checkpoint)
    missing, unexpected = ref_model.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in torch_state.items()},
        strict=True)
    assert not missing and not unexpected
    ref_model.eval()
    print(f"loaded {len(torch_state)} tensors into the reference model")

    spec = GatorSpec.from_assets(assets, embed_dim=128, depth=6,
                                 alpha=args.alpha)
    template = init_gator(spec, jax.random.PRNGKey(0))
    variables = torch_loader.convert_state_dict(torch_state, template)
    print("converted onto the flax tree (key-exact)")

    rng = np.random.default_rng(args.seed)
    pose2d = rng.standard_normal(
        (args.batch, assets.joint_num, 2)).astype(np.float32)
    with torch.no_grad():
        ref_mesh, _ref_pose3d = ref_model(torch.from_numpy(pose2d))
    ref_mesh = ref_mesh.cpu().numpy()
    (mesh, _pose3d), _ = forward_gator(spec, variables, pose2d)

    dv = float(np.abs(np.asarray(mesh) - ref_mesh).max())
    print(f"max |vertex deviation| = {dv:.3e} m   "
          f"({'PASS' if dv <= 1e-4 else 'FAIL'}, bar 1e-4 m)")
    return 0 if dv <= 1e-4 else 1


if __name__ == "__main__":
    raise SystemExit(main())

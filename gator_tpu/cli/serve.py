"""Batch serving CLI: 2D poses (.npy) -> SMPL meshes (.npy [, .obj]).

Beyond-reference surface (the reference's only inference entry point is
the single-image demo, demo/run.py): loads [N, 17, 2-or-3] raw pixel
keypoints, preprocesses them with the same crop/normalize pipeline the
datasets use, and runs the fused bf16 serving path data-parallel over
every visible chip (`serving.make_sharded_serving_fn`).

    python -m gator_tpu.cli.serve --input_poses poses.npy \
        --joint_set coco --weights ckpt/ --output meshes.npy
"""
from __future__ import annotations

import argparse
import os
import os.path as osp
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..assets import build_assets
from ..data import processing
from ..models import GatorSpec, init_gator
from ..parallel import make_mesh, pad_to_multiple
from ..serving import make_serving_fn, make_sharded_serving_fn
from ..vis import save_obj


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="GATOR batch serving")
    p.add_argument("--input_poses", type=str, required=True,
                   help=".npy of [N, 17, 2or3] pixel keypoints")
    p.add_argument("--joint_set", type=str, default="coco",
                   choices=("coco", "human36"))
    p.add_argument("--weights", type=str, default=None)
    p.add_argument("--output", type=str, default="meshes.npy")
    p.add_argument("--joints_output", type=str, default=None,
                   help="optional .npy for the lifted 3D joints")
    p.add_argument("--obj_dir", type=str, default=None,
                   help="also dump every --obj_every-th mesh as .obj")
    p.add_argument("--obj_every", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=("bfloat16", "float32"),
                   help="serving compute dtype. The bfloat16 DEFAULT "
                        "maximizes throughput at a measured ~2.9 mm MPVPE "
                        "accuracy cost vs float32 (docs/PERFORMANCE.md); "
                        "pass float32 for parity-accurate meshes "
                        "(eval CLIs always run float32)")
    p.add_argument("--f32", action="store_true",
                   help="alias for --dtype float32")
    return p.parse_args(argv)


def add_pelvis_neck_batch(joints: np.ndarray, names) -> np.ndarray:
    """[N, 17, 3] (x, y, score) -> [N, 19, 3] with synthesized pelvis and
    neck (reference: demo/run.py:103-121); shared implementation in
    data/processing.py."""
    from ..data.processing import add_pelvis_neck_scores
    return add_pelvis_neck_scores(joints, names)


def run_serve(pose_path: str, joint_set: str = "coco",
              weights: str | None = None, output: str = "meshes.npy",
              joints_output: str | None = None,
              obj_dir: str | None = None, obj_every: int = 100,
              batch_size: int = 256, f32: bool = False, assets=None):
    assets = assets or build_assets(joint_set)
    spec = GatorSpec.from_assets(assets)
    variables = init_gator(spec, jax.random.PRNGKey(0))
    if weights:
        from .test import load_weights   # lazy: pulls the
        # training/convert stack only when weights are given
        variables = load_weights(weights, variables)
    else:
        print("WARNING: serving randomly initialized weights")

    poses = np.load(pose_path).astype(np.float32)
    poses = poses.reshape(len(poses), 17, -1)
    if poses.shape[-1] == 2:
        poses = np.concatenate(
            [poses, np.ones(poses.shape[:2] + (1,), np.float32)], axis=-1)
    if joint_set == "coco":
        poses = add_pelvis_neck_batch(
            poses, list(assets.joint_set.joints_name))
    n = len(poses)

    # same crop/normalize the datasets apply (reference demo crop path:
    # run.py:123-145 on the model-input bbox)
    opts = processing.ProcessOptions(is_train=False,
                                     input_joint_name=joint_set)
    pose2d = processing.batch_crop_and_normalize(
        poses[..., :2], assets.joint_set, opts,
        np.zeros(n, np.int64), np.zeros(n, np.float32))

    mesh = make_mesh()
    dtype = jnp.float32 if f32 else jnp.bfloat16
    if mesh.size > 1:
        fn = make_sharded_serving_fn(spec, variables, mesh=mesh,
                                     dtype=dtype)
        # every chunk must shard evenly over the mesh; rounding the chunk
        # size up keeps ONE compiled shape for full and padded-final chunks
        if batch_size % mesh.size:
            batch_size = -(-batch_size // mesh.size) * mesh.size
            print(f"batch_size rounded up to {batch_size} "
                  f"(multiple of {mesh.size} devices)")
    else:
        # weights as a runtime arg (constargs contract): closure-constant
        # weights make relay compiles pathological
        sfn = make_serving_fn(spec, variables, dtype=dtype)
        jfn = jax.jit(sfn.with_consts)
        fn = lambda pose: jfn(sfn.const_args, pose)  # noqa: E731

    meshes = np.empty((n, spec.mdr.full_num, 3), np.float32)
    joints3d = np.empty((n, spec.gat.num_joint, 3), np.float32)
    t0 = time.perf_counter()
    for lo in range(0, n, batch_size):
        chunk = pose2d[lo:lo + batch_size]
        padded, real = pad_to_multiple({"x": chunk}, batch_size)
        m, p3 = fn(jnp.asarray(padded["x"]))
        meshes[lo:lo + real] = np.asarray(m, np.float32)[:real]
        joints3d[lo:lo + real] = np.asarray(p3, np.float32)[:real]
    dt = time.perf_counter() - t0
    print(f"served {n} poses in {dt:.2f}s "
          f"({n / max(dt, 1e-9):,.0f} poses/s on {mesh.size} device(s))")

    np.save(output, meshes)
    print(f"meshes -> {output}  [{n}, {spec.mdr.full_num}, 3] (meters)")
    if joints_output:
        np.save(joints_output, joints3d)
        print(f"3D joints -> {joints_output} (mm)")
    if obj_dir:
        os.makedirs(obj_dir, exist_ok=True)
        for i in range(0, n, max(1, obj_every)):
            save_obj(meshes[i], assets.faces,
                     osp.join(obj_dir, f"mesh_{i:06d}.obj"))
        print(f"objs -> {obj_dir}")
    return {"meshes": meshes, "joints3d": joints3d}


def main(argv=None):
    from ._cache import enable_compile_cache
    enable_compile_cache()
    a = parse_args(argv)
    return run_serve(a.input_poses, a.joint_set, a.weights, a.output,
                     a.joints_output, a.obj_dir, a.obj_every,
                     a.batch_size, a.f32 or a.dtype == "float32")


if __name__ == "__main__":
    main()

"""Serving path: maximum-throughput pose->mesh inference.

`make_serving_fn(spec, variables)` returns a jittable function numerically
equivalent to `GATOR.apply(..., deterministic=True)` but with the MDR LBF
stack executed by the fully-fused Pallas layer kernel
(`nn.pallas_mdr.lbf_layer`) — each layer's ~25 HBM-resident XLA ops
collapse into one VMEM-resident program per sample tile. The GAT trunk and
the MDR head (tiny tensors / single large matmuls) stay on XLA.

`bench.py` uses this path; `tests/test_serving.py` pins it against the
flax module output.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from .models.gat import GAT
from .models.gator import GatorSpec
from .models.mdr import conv1d_len3
from .nn.pallas_mdr import extract_layer_params, lbf_layer


def mdr_serving_forward(spec, params: Dict[str, Any],
                        batch_stats: Dict[str, Any] | None,
                        x: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """MDR forward from the raw param tree (mirror of models.mdr.MDR with
    deterministic=True; reference math: lib/models/MDR.py:124-170)."""
    s = spec
    b = x.shape[0]
    x = x.astype(dtype)

    def dense(mod, y):
        return y @ mod["linear"]["kernel"].astype(dtype) \
            + mod["linear"]["bias"].astype(dtype)

    init_coarse = jnp.asarray(s.init_verts_coarse, dtype)
    init_full = jnp.asarray(s.init_verts_full, dtype)
    vj = jnp.asarray(s.vj_relation)

    verts_feat = jnp.broadcast_to(init_coarse[None],
                                  (b,) + init_coarse.shape)
    verts_feat = jnp.concatenate(
        [verts_feat, x[:, vj, 2:5]], axis=2)
    joint_feat = dense(params["get_joint_feature"], x)
    verts_feat = dense(params["get_verts_feature"], verts_feat)
    joint_feat = joint_feat + params["pos_j_id_embed"][
        jnp.arange(1, s.num_joint + 1)].astype(dtype)
    verts_feat = verts_feat + params["pos_v_id_embed"][
        jnp.arange(1, s.coarse_num + 1)].astype(dtype)

    for layer in range(3):
        lp = extract_layer_params(params, layer)
        verts_feat = lbf_layer(verts_feat, joint_feat, lp, s.num_heads)

    ac = dense(params["motion_linear"], verts_feat)
    mat_a, mat_c = ac[:, :, :s.num_basis], ac[:, :, -3:]
    mat_b = dense(params["bias_linear"], verts_feat)
    if s.alpha:
        bn = params["bias_norm"]
        m32 = mat_b.astype(jnp.float32)
        mean = m32.mean(-1, keepdims=True)
        var = ((m32 - mean) ** 2).mean(-1, keepdims=True)
        mat_b = ((m32 - mean) * jax.lax.rsqrt(var + 1e-5)
                 * bn["scale"] + bn["bias"]).astype(dtype)
    else:
        bn = params["bias_norm"]
        mean = batch_stats["bias_norm"]["mean"].astype(jnp.float32)
        var = batch_stats["bias_norm"]["var"].astype(jnp.float32)
        m32 = mat_b.astype(jnp.float32)
        norm = ((m32 - mean[None, :, None])
                * jax.lax.rsqrt(var[None, :, None] + 1e-5))
        mat_b = (norm * bn["scale"][None, :, None]
                 + bn["bias"][None, :, None]).astype(dtype)
    mat_b = jax.nn.gelu(mat_b, approximate=False)
    mat_b = conv1d_len3(mat_b, params["bias_conv1d"]["weight"].astype(dtype),
                        params["bias_conv1d"]["bias"].astype(dtype))
    if s.alpha:
        scale = dense(params["scale_linear"], verts_feat)
        alpha = jnp.power(jnp.asarray(1.1, dtype), scale)
    else:
        alpha = jnp.asarray(1.0, dtype)
    attn_a = jax.nn.softmax(mat_a.astype(jnp.float32), axis=-1).astype(
        dtype)
    vert = alpha * jnp.einsum("bvk,bkc->bvc", attn_a, mat_b) + mat_c
    vert = conv1d_len3(vert, params["upsample_conv"]["weight"].astype(dtype),
                       params["upsample_conv"]["bias"].astype(dtype))
    return vert + init_full


def make_serving_fn(spec: GatorSpec, variables: Dict[str, Any],
                    dtype=jnp.bfloat16):
    """-> jittable pose2d [B, J, 2] -> (mesh [B, V, 3], pose3d [B, J, 3])."""
    gat = GAT(spec=spec.gat, dtype=dtype)
    gat_vars = {"params": variables["params"]["pose_lifter"]}
    mdr_params = variables["params"]["pose2mesh"]
    batch_stats = None
    if "batch_stats" in variables and variables["batch_stats"]:
        batch_stats = variables["batch_stats"]["pose2mesh"]

    def fn(pose2d):
        b = pose2d.shape[0]
        pose2d = pose2d.reshape(b, spec.gat.num_joint, 2).astype(dtype)
        pose3d_flat, feat = gat.apply(gat_vars, pose2d.reshape(b, -1),
                                      deterministic=True)
        pose3d = pose3d_flat.reshape(b, spec.gat.num_joint, 3)
        pose_combine = jnp.concatenate(
            [pose2d, pose3d / 1000.0, feat], axis=2)
        mesh = mdr_serving_forward(spec.mdr, mdr_params, batch_stats,
                                   pose_combine, dtype=dtype)
        return mesh, pose3d

    return fn

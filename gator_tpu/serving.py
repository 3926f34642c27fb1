"""Serving path: maximum-throughput pose->mesh inference.

`make_serving_fn(spec, variables)` returns a jittable function numerically
equivalent to `GATOR.apply(..., deterministic=True)` but with the hot
stacks executed by fully-fused Pallas kernels:
  * the MDR LBF stack (`nn.pallas_mdr.lbf_stack`) — the 3 layers' ~75
    HBM-resident XLA ops collapse into VMEM-resident per-G-sample-tile
    programs with folded V-projections;
  * the GAT trunk (`nn.pallas_gat.gat_blocks`) — the WHOLE 6-block trunk
    runs as ONE block-diagonal tile program per G samples.
The embeds and the MDR head (tiny tensors / single large matmuls) stay on
XLA.

`bench.py` uses this path; `tests/test_serving.py` pins it against the
flax module output.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from .models.gator import GatorSpec
from .models.mdr import conv1d_len3
from .nn import HopPathEncoding
from .nn.pallas_gat import extract_block_params, gat_blocks, \
    gat_blocks_xla
from .nn.pallas_mdr import _ln, extract_layer_params, lbf_stack, \
    lbf_stack_xla


def gat_serving_forward(spec, params: Dict[str, Any], pose2d: jnp.ndarray,
                        dtype=jnp.float32, use_fused: bool = True,
                        trunk=None):
    """GAT forward from the raw param tree (mirror of models.gat.GAT with
    deterministic=True; reference math: lib/models/GAT.py:133-152) with the
    6-block trunk running as fused Pallas kernels on TPU.

    `trunk`: optional override fn(x, bias, block_params) -> x — the
    training path injects the dropout-capable fused trunk here
    (train/fused_forward.py); everything around it (embeds, hop/path
    bias, final norm, lifter) is shared, differentiable jnp.

    Returns (pose3d [B, 3*J], features [B, J, C])."""
    s = spec
    b = pose2d.shape[0]
    x = pose2d.reshape(b, s.num_joint, 2).astype(dtype)

    # input embed: GraphLinear(2->64) -> GroupNorm(4, 64) -> GELU ->
    # GraphLinear(64->D), channel-major (reference: GAT.py:69-72,133-139)
    x = x.transpose(0, 2, 1)                                   # [B, 2, J]
    g0 = params["GLinear_0"]
    x = jnp.einsum("oi,bij->boj", g0["W"].astype(dtype), x) \
        + g0["b"].astype(dtype)[None, :, None]
    gn = params["GLinear_1"]
    c64, grp = x.shape[1], x.shape[1] // 16
    x32 = x.astype(jnp.float32).reshape(b, grp, -1)
    mean = x32.mean(-1, keepdims=True)
    var = ((x32 - mean) ** 2).mean(-1, keepdims=True)
    x32 = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    x = (x32.reshape(b, c64, s.num_joint) * gn["scale"][None, :, None]
         + gn["bias"][None, :, None]).astype(dtype)
    x = jax.nn.gelu(x, approximate=False)
    g3 = params["GLinear_3"]
    x = jnp.einsum("oi,bij->boj", g3["W"].astype(dtype), x) \
        + g3["b"].astype(dtype)[None, :, None]
    x = x.transpose(0, 2, 1)                                   # [B, J, C]

    # joint-id + degree embeddings (reference: GAT.py:141-144); row 0 of
    # the padded tables is pinned to zero (torch padding_idx semantics)
    pos_id = params["pos_id_embed"].at[0].set(0.0)
    x = x + pos_id[jnp.arange(1, s.num_joint + 1)].astype(dtype)
    x = x + params["pos_num_embed"].at[0].set(0.0)[
        jnp.asarray(s.degree)].astype(dtype)

    bias = HopPathEncoding(
        num_heads=s.num_heads, num_spatial=s.num_spatial,
        spatial_pos=s.spatial_pos, edge_input=s.edge_input,
        hop_recip=s.hop_recip, dtype=jnp.float32).apply(
            {"params": params["get_hop_path_encoding"]})       # [H, J, J]

    block_params = [extract_block_params(params, i, s.adjacency)
                    for i in range(s.depth)]
    if trunk is not None:
        x = trunk(x, bias, block_params)
    else:
        trunk_fn = gat_blocks if use_fused else gat_blocks_xla
        x = trunk_fn(x, bias, block_params, s.masks_xfeat, s.num_heads)

    xn = params["norm"]
    feat = _ln(x, xn["scale"], xn["bias"]).astype(dtype)
    feat = jax.nn.gelu(feat, approximate=False)
    lif = params["lifter"]["linear"]
    pose3d = feat.reshape(b, -1) @ lif["kernel"].astype(dtype) \
        + lif["bias"].astype(dtype)
    return pose3d, feat


def mdr_serving_forward(spec, params: Dict[str, Any],
                        batch_stats: Dict[str, Any] | None,
                        x: jnp.ndarray, dtype=jnp.float32,
                        use_fused: bool = True) -> jnp.ndarray:
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

    lps = [extract_layer_params(params, layer) for layer in range(3)]
    stack = lbf_stack if use_fused else lbf_stack_xla
    verts_feat = stack(verts_feat, joint_feat, lps, s.num_heads)

    ac = dense(params["motion_linear"], verts_feat)
    mat_a, mat_c = ac[:, :, :s.num_basis], ac[:, :, -3:]
    mat_b = dense(params["bias_linear"], verts_feat)
    if s.alpha:
        bn = params["bias_norm"]
        mat_b = _ln(mat_b, bn["scale"], bn["bias"]).astype(dtype)
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
                    dtype=jnp.bfloat16, cast_weights: bool = True,
                    use_fused: bool = True):
    """-> jittable pose2d [B, J, 2] -> (mesh [B, V, 3], pose3d [B, J, 3]).

    With `cast_weights` (default) the f32 weights are cast to `dtype` once
    here instead of per call — halves the weight HBM traffic per step (the
    431->6890 upsample conv alone is 36 MB in f32). BatchNorm running
    stats stay f32 (their rsqrt is precision-sensitive).

    `use_fused=False` forces the math-identical pure-XLA forms of the two
    fused kernels ON THE SAME PLATFORM — the on-chip numerics oracle for
    the parity gate in bench.py."""
    if cast_weights and dtype != jnp.float32:
        params = jax.tree_util.tree_map(
            lambda a: a.astype(dtype)
            if jnp.asarray(a).dtype == jnp.float32 else a,
            variables["params"])
        variables = dict(variables, params=params)
    gat_params = variables["params"]["pose_lifter"]
    mdr_params = variables["params"]["pose2mesh"]
    batch_stats = None
    if "batch_stats" in variables and variables["batch_stats"]:
        batch_stats = variables["batch_stats"]["pose2mesh"]
    if not spec.mdr.alpha and not (batch_stats
                                   and "bias_norm" in batch_stats):
        raise ValueError(
            "alpha=False MDR uses BatchNorm1d: variables must carry the "
            "batch_stats collection with its 'bias_norm' running stats")

    # constargs contract: the weights ride as a runtime argument of the
    # jitted program, not closure constants — large literals make the
    # relay compile pathological (gator_tpu/constargs.py). jit sites use
    # `fn.with_consts` / `fn.const_args`; `fn(pose2d)` stays callable.
    consts = {"gat": gat_params, "mdr": mdr_params, "bn": batch_stats}

    def raw_fn(c, pose2d):
        b = pose2d.shape[0]
        pose2d = pose2d.reshape(b, spec.gat.num_joint, 2).astype(dtype)
        pose3d_flat, feat = gat_serving_forward(spec.gat, c["gat"],
                                                pose2d, dtype=dtype,
                                                use_fused=use_fused)
        pose3d = pose3d_flat.reshape(b, spec.gat.num_joint, 3)
        pose_combine = jnp.concatenate(
            [pose2d, pose3d / 1000.0, feat], axis=2)
        mesh = mdr_serving_forward(spec.mdr, c["mdr"], c["bn"],
                                   pose_combine, dtype=dtype,
                                   use_fused=use_fused)
        return mesh, pose3d

    from .constargs import bind_consts
    return bind_consts(raw_fn, consts)


def make_sharded_serving_fn(spec: GatorSpec, variables: Dict[str, Any],
                            mesh=None, dtype=jnp.bfloat16,
                            cast_weights: bool = True):
    """Data-parallel serving over an ICI mesh: the pose batch is sharded
    on its leading axis, weights are replicated, and each chip runs the
    fused kernels on its local shard (shard_map — Pallas custom calls
    don't auto-partition under GSPMD). The batch size must be a multiple
    of the mesh size; pad with `parallel.pad_to_multiple` if ragged."""
    from jax.sharding import PartitionSpec as P

    from .parallel import mesh as pmesh

    mesh = mesh if mesh is not None else pmesh.make_mesh()
    fn = make_serving_fn(spec, variables, dtype=dtype,
                         cast_weights=cast_weights)
    # shard the batch over EVERY mesh axis (a multi-slice ("dcn", "dp")
    # mesh is pure data parallelism here too); the weights (constargs
    # contract) are a replicated runtime argument
    axes = tuple(mesh.axis_names)
    sfn = jax.shard_map(fn.with_consts, mesh=mesh, in_specs=(P(), P(axes)),
                        out_specs=(P(axes), P(axes)), check_vma=False)
    jitted = jax.jit(sfn)

    def serve(pose2d):
        return jitted(fn.const_args, pose2d)

    return serve

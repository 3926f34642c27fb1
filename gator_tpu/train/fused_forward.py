"""Fused TRAINING forward for GATOR: the MDR LBF stack runs as the
custom-VJP Pallas kernels (in-kernel PRNG dropout, recompute-in-backward
— nn/pallas_mdr_train.py); the GAT lifter keeps its flax form (its
17-token tensors are tiny; dropout rides the usual rng collection); the
MDR head's BatchNorm runs in train mode with manually-computed batch
statistics so the whole forward is a pure function of
(params, batch_stats, pose2d, rng).

Numerics: with all kernel rates zero and a fixed rng this forward equals
`GATOR.apply(deterministic=True, use_running_average=False)` — pinned by
tests/test_fused_step.py, values and gradients.

Reference hot loop being replaced: lib/core/base.py:122-183 (the torch
Trainer's forward+backward); layer math as in lib/models/MDR.py.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..models.gat import GAT
from ..models.gator import GatorSpec
from ..models.mdr import conv1d_len3
from ..nn.pallas_gat_train import gat_trunk_train
from ..nn.pallas_mdr import extract_layer_params
from ..nn.pallas_mdr_train import lbf_stack_train


def rates_from_spec(mdr_spec) -> tuple:
    """LBF kernel dropout rates for an MdrSpec, matching the flax model:
    the cross-attn block's 0.2s are model constants (models/mdr.py
    CrossAttentionBlock defaults; reference lib/models/MDR.py:48-69),
    while the self-attn and residual rates follow spec.dropout
    (models/mdr.py:182-188)."""
    d = mdr_spec.dropout
    return (0.2, 0.2, 0.2, 0.2, d, d)


def _dense(mod, y, dtype):
    return y @ mod["linear"]["kernel"].astype(dtype) \
        + mod["linear"]["bias"].astype(dtype)


def mdr_train_forward(spec, params: Dict[str, Any],
                      batch_stats: Dict[str, Any] | None,
                      x: jnp.ndarray, seed: jnp.ndarray,
                      dtype=jnp.bfloat16, rates=None,
                      interpret: bool = False,
                      group_fwd: int = 4, group_bwd: int = 1
                      ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """MDR in train mode from the raw param tree. Returns (mesh, new
    batch_stats). Mirrors models/mdr.py MDR.__call__ with
    deterministic=False except that LBF dropout comes from the on-core
    PRNG (reference: lib/models/MDR.py:124-170). rates=None derives the
    kernel dropout rates from the spec (`rates_from_spec`)."""
    s = spec
    if rates is None:
        rates = rates_from_spec(s)
    if not s.alpha and not (batch_stats and "bias_norm" in batch_stats):
        raise ValueError(
            "alpha=False MDR uses BatchNorm1d: batch_stats must carry "
            "the 'bias_norm' running stats (init the model to get them)")
    b = x.shape[0]
    x = x.astype(dtype)

    init_coarse = jnp.asarray(s.init_verts_coarse, dtype)
    init_full = jnp.asarray(s.init_verts_full, dtype)
    vj = jnp.asarray(s.vj_relation)

    verts_feat = jnp.broadcast_to(init_coarse[None],
                                  (b,) + init_coarse.shape)
    verts_feat = jnp.concatenate([verts_feat, x[:, vj, 2:5]], axis=2)
    joint_feat = _dense(params["get_joint_feature"], x, dtype)
    verts_feat = _dense(params["get_verts_feature"], verts_feat, dtype)
    joint_feat = joint_feat + params["pos_j_id_embed"][
        jnp.arange(1, s.num_joint + 1)].astype(dtype)
    verts_feat = verts_feat + params["pos_v_id_embed"][
        jnp.arange(1, s.coarse_num + 1)].astype(dtype)

    lps = [extract_layer_params(params, layer) for layer in range(3)]
    verts_feat = lbf_stack_train(
        verts_feat, joint_feat, lps, s.num_heads, seed, rates=rates,
        interpret=interpret, group_fwd=group_fwd, group_bwd=group_bwd)

    ac = _dense(params["motion_linear"], verts_feat, dtype)
    mat_a, mat_c = ac[:, :, :s.num_basis], ac[:, :, -3:]
    mat_b = _dense(params["bias_linear"], verts_feat, dtype)
    new_bs = batch_stats
    if s.alpha:
        bn = params["bias_norm"]
        m32 = mat_b.astype(jnp.float32)
        mean = m32.mean(-1, keepdims=True)
        var = ((m32 - mean) ** 2).mean(-1, keepdims=True)
        mat_b = ((m32 - mean) * jax.lax.rsqrt(var + 1e-5)
                 * bn["scale"] + bn["bias"]).astype(dtype)
    else:
        # train-mode BatchNorm1d(431): batch stats over (batch, coord)
        # per vertex channel; running stats updated with momentum 0.9
        # (flax semantics — biased batch var on both paths)
        bn = params["bias_norm"]
        m32 = mat_b.astype(jnp.float32)
        bmean = m32.mean(axis=(0, 2))
        bvar = ((m32 - bmean[None, :, None]) ** 2).mean(axis=(0, 2))
        norm = ((m32 - bmean[None, :, None])
                * jax.lax.rsqrt(bvar[None, :, None] + 1e-5))
        mat_b = (norm * bn["scale"][None, :, None]
                 + bn["bias"][None, :, None]).astype(dtype)
        old = batch_stats["bias_norm"]
        new_bs = dict(batch_stats)
        new_bs["bias_norm"] = {
            "mean": jax.lax.stop_gradient(
                0.9 * old["mean"] + 0.1 * bmean),
            "var": jax.lax.stop_gradient(
                0.9 * old["var"] + 0.1 * bvar),
        }
    mat_b = jax.nn.gelu(mat_b, approximate=False)
    mat_b = conv1d_len3(mat_b, params["bias_conv1d"]["weight"].astype(
        dtype), params["bias_conv1d"]["bias"].astype(dtype))
    if s.alpha:
        scale = _dense(params["scale_linear"], verts_feat, dtype)
        alpha = jnp.power(jnp.asarray(1.1, dtype), scale)
    else:
        alpha = jnp.asarray(1.0, dtype)
    attn_a = jax.nn.softmax(mat_a.astype(jnp.float32), axis=-1).astype(
        dtype)
    vert = alpha * jnp.einsum("bvk,bkc->bvc", attn_a, mat_b) + mat_c
    vert = conv1d_len3(vert, params["upsample_conv"]["weight"].astype(
        dtype), params["upsample_conv"]["bias"].astype(dtype))
    return vert + init_full, new_bs


def make_fused_forward(spec: GatorSpec, dtype=jnp.bfloat16,
                       rates=None, interpret: bool = False,
                       group_fwd: int = 4, group_bwd: int = 1,
                       gat_deterministic: bool = False,
                       fused_gat: bool = True,
                       gat_mlp_rate: float = 0.1):
    """-> fwd(params, batch_stats, pose2d, dropout_rng) ->
    (mesh, pose3d, new_batch_stats).

    Drop-in replacement for GATOR.apply(deterministic=False,
    use_running_average=False) with BOTH hot stacks on training kernels:
    the GAT trunk (fused_gat=True; dropout rates from the spec, GatMlp's
    fixed 0.1 via gat_mlp_rate) and the MDR LBF stack. batch_stats is
    the full batch_stats collection, as stored on TrainState."""
    gat_model = GAT(spec=spec.gat, dtype=dtype)
    s = spec

    def fwd(params, batch_stats, pose2d, dropout_rng):
        b = pose2d.shape[0]
        pose2d = pose2d.reshape(b, s.gat.num_joint, 2).astype(dtype)
        seed = jax.random.randint(
            jax.random.fold_in(dropout_rng, 0), (1,), 0,
            jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
        gat_rng = jax.random.fold_in(dropout_rng, 1)
        if fused_gat:
            from ..serving import gat_serving_forward

            def trunk(x, bias, block_params):
                return gat_trunk_train(
                    x, bias, block_params, s.gat.masks_xfeat,
                    s.gat.num_heads, seed,
                    attn_rate=s.gat.attn_drop_rate,
                    proj_rate=s.gat.drop_rate,
                    mlp_rate=gat_mlp_rate,
                    drop_path_rate=s.gat.drop_path_rate,
                    interpret=interpret)

            pose3d_flat, feat = gat_serving_forward(
                s.gat, params["pose_lifter"], pose2d, dtype=dtype,
                trunk=trunk)
        else:
            # flax fallback path; gat_deterministic=True exists for
            # parity tests only (GatMlp's dropout is FIXED at 0.1, so
            # zeroing the spec rates cannot silence it)
            pose3d_flat, feat = gat_model.apply(
                {"params": params["pose_lifter"]}, pose2d.reshape(b, -1),
                deterministic=gat_deterministic,
                rngs={"dropout": gat_rng})
        pose3d = pose3d_flat.reshape(b, s.gat.num_joint, 3)
        pose_combine = jnp.concatenate(
            [pose2d, pose3d.astype(dtype) / 1000.0, feat.astype(dtype)],
            axis=2)
        bs_mdr = (batch_stats or {}).get("pose2mesh")
        mesh, new_mdr_bs = mdr_train_forward(
            s.mdr, params["pose2mesh"], bs_mdr, pose_combine, seed,
            dtype=dtype, rates=rates, interpret=interpret,
            group_fwd=group_fwd, group_bwd=group_bwd)
        new_bs = batch_stats
        if not s.mdr.alpha:
            new_bs = dict(batch_stats)
            new_bs["pose2mesh"] = new_mdr_bs
        return mesh, pose3d, new_bs

    return fwd

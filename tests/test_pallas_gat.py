"""Fused GAT trunk: block-diagonal kernel math vs the flax module.

The TPU kernel itself is exercised via pallas interpret mode on CPU; the
XLA fallback (`gat_block_xla`) is pinned against the flax GATBlock so the
serving path and the module agree layer by layer
(reference math: lib/models/GAT.py:16-43).
"""
import jax
import jax.numpy as jnp
import numpy as np

from gator_tpu.models import GatSpec
from gator_tpu.models.gat import GAT, GATBlock
from gator_tpu.nn.pallas_gat import (extract_block_params, gat_block_xla,
                                     gat_blocks, gat_blocks_fused)


def _gat(small_assets, rng, depth=2):
    spec = GatSpec.from_assets(small_assets, embed_dim=128, depth=depth)
    model = GAT(spec=spec)
    pose = jnp.asarray(
        rng.normal(size=(4, spec.num_joint * 2)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(3), pose)
    return spec, model, variables, pose


def test_block_xla_matches_module(small_assets, rng):
    spec, model, variables, pose = _gat(small_assets, rng)
    params = variables["params"]
    x = jnp.asarray(
        rng.normal(size=(4, spec.num_joint, 128)).astype(np.float32))
    bias = jnp.asarray(
        rng.normal(size=(spec.num_heads, spec.num_joint,
                         spec.num_joint)).astype(np.float32))
    for i in range(spec.depth):
        blk = GATBlock(spec=spec, drop_path=0.1)
        ref = blk.apply({"params": params[f"blocks_{i}"]}, x, bias,
                        deterministic=True)
        p = extract_block_params(params, i, spec.adjacency)
        got = gat_block_xla(x, bias, p, spec.masks_xfeat, spec.num_heads)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)


def test_fused_kernel_interpret_matches_xla(small_assets, rng):
    """The block-diagonal tile trick (attention mask, MGCN split, X_Feat
    masks) reproduces the per-sample math, including a group that doesn't
    divide the batch evenly (group shrinks to 1)."""
    spec, model, variables, pose = _gat(small_assets, rng)
    params = variables["params"]
    b = 4
    x = jnp.asarray(
        rng.normal(size=(b, spec.num_joint, 128)).astype(np.float32))
    bias = jnp.asarray(
        rng.normal(size=(spec.num_heads, spec.num_joint,
                         spec.num_joint)).astype(np.float32))
    bps = [extract_block_params(params, i, spec.adjacency)
           for i in range(spec.depth)]

    ref = x
    for p in bps:
        ref = gat_block_xla(ref, bias, p, spec.masks_xfeat, spec.num_heads)

    for group in (2, 3):   # 3 -> shrinks to 1 (b % 3 != 0)
        got = gat_blocks_fused(x, bias, bps, spec.masks_xfeat,
                               spec.num_heads, group=group, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4)


def test_gat_blocks_dispatch_cpu(small_assets, rng):
    """Off-TPU the dispatcher runs the XLA form under jit."""
    spec, model, variables, pose = _gat(small_assets, rng)
    params = variables["params"]
    x = jnp.asarray(
        rng.normal(size=(2, spec.num_joint, 128)).astype(np.float32))
    bias = jnp.zeros((spec.num_heads, spec.num_joint, spec.num_joint),
                     jnp.float32)
    bps = [extract_block_params(params, i, spec.adjacency)
           for i in range(spec.depth)]
    out = jax.jit(lambda xx: gat_blocks(xx, bias, bps, spec.masks_xfeat,
                                        spec.num_heads))(x)
    ref = x
    for p in bps:
        ref = gat_block_xla(ref, bias, p, spec.masks_xfeat, spec.num_heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_lbf_stack_interpret_matches_xla(small_assets, rng):
    """The stacked tile-batched MDR kernel (pad rows, iota block-diag
    masks, folded V-projections) equals the per-sample XLA form."""
    from gator_tpu.models import GatorSpec, init_gator
    from gator_tpu.nn.pallas_mdr import (extract_layer_params,
                                         lbf_layer_xla, lbf_stack_fused)
    spec = GatorSpec.from_assets(small_assets, embed_dim=128, depth=2,
                                 alpha=False)
    variables = init_gator(spec, jax.random.PRNGKey(5))
    mdr_params = variables["params"]["pose2mesh"]
    nv, nj = spec.mdr.coarse_num, spec.mdr.num_joint
    b = 4
    verts = jnp.asarray(rng.normal(size=(b, nv, 64)).astype(np.float32))
    joints = jnp.asarray(rng.normal(size=(b, nj, 64)).astype(np.float32))
    lps = [extract_layer_params(mdr_params, i) for i in range(3)]

    ref = verts
    for lp in lps:
        ref = lbf_layer_xla(ref, joints, lp, spec.mdr.num_heads)

    for group in (2, 4):
        got = lbf_stack_fused(verts, joints, lps, spec.mdr.num_heads,
                              group=group, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4)

"""Fully-fused GAT block for serving.

One GAT block = `x + XFeat(Attn(LN(x), bias) + MGCN(LN(x)))` then
`x + MLP(LN(x))` (reference: lib/models/GAT.py:16-43). The XLA path runs it
as ~30 small HBM-resident ops over [B, 17, 128] tensors whose 17-row joint
axis underfills TPU tiles; this kernel flattens the joint axis into the
batch axis ([B*17, 128] tiles of G samples = G*17 rows) so every linear is
one well-filled MXU matmul, and rewrites the per-sample graph operators as
block-diagonal matmuls on the tile:

  * attention: per-head scores over the whole [G*17, G*17] tile with an
    off-block -inf mask — cross-sample entries softmax to exactly 0, and
    the hop/path bias rides in on the same block-diagonal constant;
  * MGCN: the `adj*eye` term is a row scale by the tiled adjacency
    diagonal; the off-diagonal term is one block-diag(adj_off) matmul;
  * X_Feat: the two hop-ring masks become block-diagonal 0/1 matmuls, and
    the 144->128 projection is split (128+16 rows) to avoid a lane-dim
    concat.

The whole 6-block trunk runs as ONE program per tile: the token tile is
read from HBM once and written once, and the block-diagonal structure
(attention mask, tiled hop/path bias, MGCN adjacency, X_Feat masks) is
rebuilt in-kernel from iota + small [J, J] tables instead of streaming
multi-MB [G*J, G*J] constants. Used by
`gator_tpu.serving`; the math-identical XLA form (`gat_block_xla`) is the
CPU fallback and the test oracle. Serving is forward-only (dropout and
drop-path are identity), so no VJP is defined.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .pallas_mdr import _gelu_exact, _ln, _round_up

try:
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAVE_PLTPU = False

# per-block parameter keys, in pallas_call argument order
BLOCK_PARAM_KEYS = (
    "norm1_scale", "norm1_bias",
    "qkv_w", "qkv_b", "proj_w", "proj_b",
    "gcn_w0", "gcn_w1", "gcn_m", "gcn_adj_diag", "gcn_adj_off", "gcn_b",
    "x0_w", "x0_b", "x1_w", "x1_b", "back_w0", "back_w1", "back_b",
    "norm2_scale", "norm2_bias",
    "fc1_w", "fc1_b", "fc2_w", "fc2_b",
)


def extract_block_params(gat_params: Dict, i: int,
                         adjacency: np.ndarray) -> Dict[str, jnp.ndarray]:
    """Pull one GAT block's weights out of the flax param tree and fold the
    static adjacency into the learned residual: adj = sym(A + adj2), split
    into its diagonal and off-diagonal parts
    (reference: lib/models/backbones/modules.py:243-249)."""
    blk = gat_params[f"blocks_{i}"]

    def dense(mod):
        return mod["linear"]["kernel"], mod["linear"]["bias"]

    gcn = blk["gcn"]
    j = adjacency.shape[0]
    adj = jnp.asarray(adjacency, jnp.float32) + gcn["adj2"].astype(
        jnp.float32)
    adj = (adj.T + adj) / 2
    eye = jnp.eye(j, dtype=jnp.float32)

    out = {
        "norm1_scale": blk["norm1"]["scale"],
        "norm1_bias": blk["norm1"]["bias"],
        "gcn_w0": gcn["W"][0], "gcn_w1": gcn["W"][1],
        "gcn_m": gcn["M"],
        "gcn_adj_diag": jnp.diagonal(adj)[:, None],      # [J, 1]
        "gcn_adj_off": adj * (1 - eye),                  # [J, J]
        "gcn_b": gcn["bias"],
        "norm2_scale": blk["norm2"]["scale"],
        "norm2_bias": blk["norm2"]["bias"],
    }
    out["qkv_w"], out["qkv_b"] = dense(blk["attn"]["qkv"])
    out["proj_w"], out["proj_b"] = dense(blk["attn"]["proj"])
    out["x0_w"], out["x0_b"] = dense(blk["x_feat"]["linears_0"])
    out["x1_w"], out["x1_b"] = dense(blk["x_feat"]["linears_1"])
    back_w, out["back_b"] = dense(blk["x_feat"]["linearback"])
    c = out["x0_w"].shape[1]
    out["back_w0"], out["back_w1"] = back_w[:c], back_w[c:]
    out["fc1_w"], out["fc1_b"] = dense(blk["mlp"]["fc1"])
    out["fc2_w"], out["fc2_b"] = dense(blk["mlp"]["fc2"])
    return out


# stacked per-block parameter keys for the trunk kernel, in pallas_call
# argument order; each array is stacked over blocks along axis 0
TRUNK_PARAM_KEYS = (
    "norm1_scale", "norm1_bias",
    "qk_w", "qk_b", "wvp", "vp_b",
    "gcn_w0", "gcn_w1", "gcn_m", "gcn_mdiag", "gcn_adj_off", "gcn_b",
    "x0_w", "x0_b", "x1_w", "x1_b", "back_w0", "back_w1", "back_b",
    "norm2_scale", "norm2_bias",
    "fc1_w", "fc1_b", "fc2_w", "fc2_b",
)


def fold_trunk_params(block_params, num_heads: int,
                      dtype=None) -> Dict[str, jnp.ndarray]:
    """Stack per-block params over a leading block axis and pre-fold the
    attention V path: o @ proj = sum_h prob_h @ (y @ wv)[:, h] @ proj[h]
    -> prob_h @ (y @ wvp_h); the v-bias and proj bias collapse into one
    row (softmax rows sum to 1). The [J, *] graph tables are zero-padded
    to 32 rows so the in-kernel P-matmuls run at a Mosaic-supported K
    (K=17 matmuls fail to lower); P never selects the pad rows."""
    c = block_params[0]["proj_w"].shape[0]
    d = c // num_heads
    j = block_params[0]["gcn_m"].shape[0]
    jp = _round_up(j, 32)

    def padj(a, axes):
        pads = [(0, jp - a.shape[ax]) if ax in axes else (0, 0)
                for ax in range(a.ndim)]
        return jnp.pad(jnp.asarray(a), pads)

    def fold(p):
        wv = p["qkv_w"][:, 2 * c:]
        vb = p["qkv_b"][2 * c:]
        wvp = jnp.stack([wv[:, h * d:(h + 1) * d]
                         @ p["proj_w"][h * d:(h + 1) * d]
                         for h in range(num_heads)])        # [H, C, C]
        vp_b = vb @ p["proj_w"] + p["proj_b"]
        return wvp, vp_b

    folds = [fold(p) for p in block_params]
    out = {}
    for key in TRUNK_PARAM_KEYS:
        if key == "qk_w":
            arrs = [p["qkv_w"][:, :2 * c] for p in block_params]
        elif key == "qk_b":
            arrs = [p["qkv_b"][:2 * c] for p in block_params]
        elif key == "wvp":
            arrs = [f[0] for f in folds]
        elif key == "vp_b":
            arrs = [f[1] for f in folds]
        elif key == "gcn_m":
            arrs = [padj(p["gcn_m"], (0,)) for p in block_params]
        elif key == "gcn_mdiag":
            arrs = [padj(p["gcn_adj_diag"] * p["gcn_m"], (0,))
                    for p in block_params]
        elif key == "gcn_adj_off":
            arrs = [padj(p["gcn_adj_off"], (0, 1)) for p in block_params]
        else:
            arrs = [p[key] for p in block_params]
        arrs = [jnp.asarray(a) for a in arrs]
        if dtype is not None:
            arrs = [a.astype(dtype) for a in arrs]
        out[key] = jnp.stack(arrs)
    return out


def _trunk_kernel(x_ref, bias_ref, m0_ref, m1_ref, *rest,
                  num_heads, dtype, j, n_blocks):
    """The WHOLE GAT trunk in one program per G-sample tile.

    The joint axis is flattened into the tile rows ([G*J, C]); per-sample
    graph structure is rebuilt in-kernel from iota (the alternative — a
    streamed [H, G*J, G*J] block-diag bias — costs ~2.4 MB of HBM per
    program): P[r, r mod J] = 1 tiles any [J, J] table to [R, R] via
    P @ T @ P^T, and an off-block -inf mask makes attention and the graph
    operators block-diagonal.
    """
    p_refs = rest[:-1]
    out_ref = rest[-1]
    stacked = {key: ref[...] for key, ref in
               zip(TRUNK_PARAM_KEYS, p_refs)}
    x = x_ref[...].astype(jnp.float32)
    r, c = x.shape
    d = c // num_heads
    scale = d ** -0.5

    # structural constants, built once per program; P has 32 columns so
    # its matmuls run at a Mosaic-supported K (cols >= j never match)
    jp = _round_up(j, 32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, jp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (r, jp), 1)
    p_f32 = (rows % j == cols).astype(jnp.float32)          # [R, JP]
    rowg = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0) // j
    colg = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1) // j
    onblock = (rowg == colg).astype(jnp.float32)
    offmask = -1e9 * (1.0 - onblock)

    def tile(t32):
        """[JP, JP] (zero-padded) -> block-diagonal [R, R] (f32)."""
        return onblock * (p_f32 @ (t32 @ p_f32.T))

    bias = bias_ref[...]        # [H, JP, JP], zero-padded past j; tile()
                                # only reads the block-diagonal j range
    bias_bd = [tile(bias[h]) + offmask for h in range(num_heads)]
    m0_bd = tile(m0_ref[...].astype(jnp.float32)).astype(dtype)
    m1_bd = tile(m1_ref[...].astype(jnp.float32)).astype(dtype)
    pd = p_f32.astype(dtype)

    def mm(a, w):
        return jnp.dot(a.astype(dtype), w.astype(dtype),
                       preferred_element_type=jnp.float32)

    for l in range(n_blocks):
        p = {key: val[l] for key, val in stacked.items()}

        y32 = _ln(x, p["norm1_scale"], p["norm1_bias"])
        y = y32.astype(dtype)

        # --- attention over the block-diagonal tile (modules.py:121-138)
        qk = mm(y, p["qk_w"]) + p["qk_b"].astype(jnp.float32)
        attn32 = jnp.zeros_like(y32)
        for h in range(num_heads):
            qh = qk[:, h * d:(h + 1) * d].astype(dtype)
            kh = qk[:, c + h * d:c + (h + 1) * d].astype(dtype)
            s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * scale + bias_bd[h]
            prob = jax.nn.softmax(s, axis=-1).astype(dtype)
            vp = mm(y, p["wvp"][h])
            attn32 = attn32 + jnp.dot(prob, vp.astype(dtype),
                                      preferred_element_type=jnp.float32)
        attn32 = attn32 + p["vp_b"].astype(jnp.float32)

        # --- MGCN (modules.py:213-255): the adj-diagonal row scale is
        # pre-folded into the modulation (gcn_mdiag = diag(adj) * M), so
        # both terms are P-matmul row tables + one block-diag matmul
        mt = mm(pd, p["gcn_m"])
        mdiag_t = mm(pd, p["gcn_mdiag"])
        h0 = mm(y, p["gcn_w0"])
        h1 = mm(y, p["gcn_w1"]) * mt
        off_bd = tile(p["gcn_adj_off"].astype(jnp.float32)).astype(dtype)
        gcn = mdiag_t * h0 + mm(off_bd, h1.astype(dtype)) \
            + p["gcn_b"].astype(jnp.float32)

        z = (attn32 + gcn).astype(dtype)

        # --- X_Feat (modules.py:140-177)
        f0 = mm(z, p["x0_w"]) + p["x0_b"].astype(jnp.float32)
        f1 = mm(z, p["x1_w"]) + p["x1_b"].astype(jnp.float32)
        f0 = mm(m0_bd, f0.astype(dtype))
        f1 = mm(m1_bd, f1.astype(dtype))
        xf = mm(f0.astype(dtype), p["back_w0"]) \
            + mm(f1.astype(dtype), p["back_w1"]) \
            + p["back_b"].astype(jnp.float32)
        x = x + xf

        # --- MLP (modules.py:179-196)
        y2 = _ln(x, p["norm2_scale"], p["norm2_bias"]).astype(dtype)
        m = _gelu_exact(mm(y2, p["fc1_w"])
                        + p["fc1_b"].astype(jnp.float32))
        m = mm(m.astype(dtype), p["fc2_w"]) + p["fc2_b"].astype(
            jnp.float32)
        x = x + m
    out_ref[...] = x.astype(out_ref.dtype)


def gat_blocks_fused(x, bias, block_params, masks_xfeat, num_heads: int,
                     group: int | None = None, interpret: bool = False
                     ) -> jnp.ndarray:
    """Run the whole GAT trunk as ONE Pallas kernel.

    x: [B, J, C]; bias: [H, J, J] hop/path encoding; block_params: list of
    per-block dicts from `extract_block_params`; masks_xfeat: [2, J, J].
    """
    b, j, c = x.shape
    dtype = x.dtype
    if group is None:
        # f32 tiles cost twice the scoped VMEM of bf16; halve the group
        group = 8 if dtype == jnp.float32 else 16
    while group > 1 and b % group:
        group //= 2
    r = group * j

    folded = fold_trunk_params(
        block_params, num_heads,
        dtype=dtype if dtype != jnp.float32 else None)
    plist = [folded[key] for key in TRUNK_PARAM_KEYS]
    jp = _round_up(j, 32)
    pad2 = ((0, 0), (0, jp - j), (0, jp - j))
    bias32 = jnp.pad(bias.astype(jnp.float32), pad2)
    m01 = jnp.pad(jnp.asarray(masks_xfeat[:2], jnp.float32), pad2)
    m0, m1 = m01[0], m01[1]

    x2d = x.reshape(b * j, c)
    mspace = pltpu.VMEM if (_HAVE_PLTPU and not interpret) else None

    def _spec(shape, imap):
        if mspace is None:
            return pl.BlockSpec(shape, imap)
        return pl.BlockSpec(shape, imap, memory_space=mspace)

    xspec = _spec((r, c), lambda i: (i, 0))

    def _const(shape):
        nd = len(shape)
        return _spec(shape, lambda i, nd=nd: (0,) * nd)

    kwargs = {}
    if not interpret and _HAVE_PLTPU:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",))
    out = pl.pallas_call(
        functools.partial(_trunk_kernel, num_heads=num_heads, dtype=dtype,
                          j=j, n_blocks=len(block_params)),
        grid=(b // group,),
        in_specs=[xspec, _const(bias32.shape), _const(m0.shape),
                  _const(m1.shape)] + [_const(a.shape) for a in plist],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        interpret=interpret,
        **kwargs,
    )(x2d, bias32, m0, m1, *plist)
    return out.reshape(b, j, c)


def gat_block_xla(x, bias, p, masks_xfeat, num_heads: int) -> jnp.ndarray:
    """Math-identical XLA form on [B, J, C] (single block); the CPU
    fallback and the test oracle for the fused kernel."""
    b, j, c = x.shape
    d = c // num_heads
    scale = d ** -0.5
    dtype = x.dtype

    y = _ln(x, p["norm1_scale"], p["norm1_bias"]).astype(dtype)
    qkv = y @ p["qkv_w"].astype(dtype) + p["qkv_b"].astype(dtype)
    qkv = qkv.reshape(b, j, 3, num_heads, d)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
    s = s + bias[None].astype(s.dtype)
    prob = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(dtype)
    attn = jnp.einsum("bhnm,bmhd->bnhd", prob, v).reshape(b, j, c)
    attn = attn @ p["proj_w"].astype(dtype) + p["proj_b"].astype(dtype)

    mt = p["gcn_m"].astype(dtype)
    h0 = (y @ p["gcn_w0"].astype(dtype)) * mt
    h1 = (y @ p["gcn_w1"].astype(dtype)) * mt
    gcn = p["gcn_adj_diag"].astype(dtype) * h0 \
        + jnp.einsum("ij,bjc->bic", p["gcn_adj_off"].astype(dtype), h1) \
        + p["gcn_b"].astype(dtype)

    z = attn + gcn
    f0 = jnp.einsum("ij,bjc->bic", jnp.asarray(masks_xfeat[0], dtype),
                    z @ p["x0_w"].astype(dtype) + p["x0_b"].astype(dtype))
    f1 = jnp.einsum("ij,bjc->bic", jnp.asarray(masks_xfeat[1], dtype),
                    z @ p["x1_w"].astype(dtype) + p["x1_b"].astype(dtype))
    xf = f0 @ p["back_w0"].astype(dtype) + f1 @ p["back_w1"].astype(dtype) \
        + p["back_b"].astype(dtype)
    x = x + xf

    y2 = _ln(x, p["norm2_scale"], p["norm2_bias"]).astype(dtype)
    m = _gelu_exact(y2 @ p["fc1_w"].astype(dtype)
                    + p["fc1_b"].astype(dtype))
    m = m @ p["fc2_w"].astype(dtype) + p["fc2_b"].astype(dtype)
    return x + m.astype(x.dtype)


def gat_blocks_xla(x, bias, block_params, masks_xfeat,
                   num_heads: int) -> jnp.ndarray:
    """Pure-XLA GAT trunk — the kernel's math oracle, callable on ANY
    platform (the on-chip parity gate in bench.py runs it on the TPU
    against the fused form)."""
    for p in block_params:
        x = gat_block_xla(x, bias, p, masks_xfeat, num_heads)
    return x


def gat_blocks(x, bias, block_params, masks_xfeat,
               num_heads: int) -> jnp.ndarray:
    """Platform-dispatched GAT trunk (fused on TPU, XLA elsewhere)."""
    def run_xla(x, bias, *flat):
        ps = _unflatten(flat, len(block_params))
        for p in ps:
            x = gat_block_xla(x, bias, p, masks_xfeat, num_heads)
        return x

    flat = [p[k] for p in block_params for k in BLOCK_PARAM_KEYS]
    if not _HAVE_PLTPU:
        return run_xla(x, bias, *flat)

    def run_tpu(x, bias, *flat):
        ps = _unflatten(flat, len(block_params))
        return gat_blocks_fused(x, bias, ps, masks_xfeat, num_heads)

    return jax.lax.platform_dependent(x, bias, *flat,
                                      tpu=run_tpu, default=run_xla)


def _unflatten(flat, n_blocks):
    k = len(BLOCK_PARAM_KEYS)
    return [dict(zip(BLOCK_PARAM_KEYS, flat[i * k:(i + 1) * k]))
            for i in range(n_blocks)]

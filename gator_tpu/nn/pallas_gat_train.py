"""Fused GAT block for TRAINING: forward + hand-derived backward.

One `jax.custom_vjp` per lifter block (reference: lib/models/GAT.py:16-43),
mirroring the LBF training kernels (pallas_mdr_train.py):

  * the 17-joint axis flattens into tile rows ([G*17, 128]); per-sample
    graph structure (attention bias, MGCN adjacency, X_Feat hop masks) is
    rebuilt in-kernel from iota as block-diagonal operators — the same
    scheme as the serving trunk kernel (pallas_gat.py);
  * dropout masks come from the on-core PRNG with one stream per
    (seed, block, program, mask-id); forward and backward run the same
    tile grouping, so the backward regenerates identical masks;
  * DropPath is per SAMPLE: G scalar draws per tile expand to rows via an
    iota one-hot matmul;
  * backward recomputes the block from its saved input and backpropagates
    in-kernel, including gradients for the hop/path attention BIAS and
    the MGCN graph tensors (their mapping back to the raw flax params —
    adj2 symmetrization, diagonal split — stays in jnp autodiff through
    `extract_block_params`). Parameter gradients accumulate across the
    sequential grid.

Rates mirror the flax modules: BiasAttention attn/proj = spec rates
(0.4 default), GatMlp dropout FIXED at 0.1 (reference quirk), DropPath
linspace(0, drop_path_rate) per block on both residual branches.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .pallas_gat import BLOCK_PARAM_KEYS
from .pallas_mdr import _gelu_exact, _round_up
from .pallas_mdr_train import _gelu_grad, _ln_bwd, _ln_fwd, _softmax_bwd

try:
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAVE_PLTPU = False


# kernel-facing parameter keys (graph tables pre-padded to JP rows; the
# adjacency diagonal pre-broadcast to [JP, C] so no N=1 dots appear)
TRAIN_BLOCK_KEYS = (
    "norm1_scale", "norm1_bias",
    "qkv_w", "qkv_b", "proj_w", "proj_b",
    "gcn_w0", "gcn_w1", "gcn_m_p", "gcn_diag_t", "gcn_off_p", "gcn_b",
    "x0_w", "x0_b", "x1_w", "x1_b", "back_w0", "back_w1", "back_b",
    "norm2_scale", "norm2_bias",
    "fc1_w", "fc1_b", "fc2_w", "fc2_b",
)

# mask-id streams per block
_M_ATTN_BASE = 0        # + head index (num_heads <= 8)
_M_PROJ, _M_DP1, _M_MLP1, _M_MLP2, _M_DP2 = 8, 9, 10, 11, 12


@dataclasses.dataclass(frozen=True)
class GatBlockCfg:
    num_heads: int
    num_joint: int
    block: int
    attn_rate: float = 0.4
    proj_rate: float = 0.4
    mlp_rate: float = 0.1       # GatMlp fixed 0.1 (reference quirk)
    path_rate: float = 0.0
    group: int = 8              # SAME for fwd and bwd (mask streams are
                                # keyed per tile program)
    interpret: bool = False

    def __post_init__(self):
        if not 1 <= self.num_heads <= 8:
            raise ValueError(
                f"num_heads={self.num_heads}: mask-id streams budget 8 "
                "heads (_M_ATTN_BASE..7)")
        if self.group > 8:
            # row_mask draws DropPath scalars from one (8, 128) bit block
            # — sample index within the tile must be < 8
            raise ValueError(f"group={self.group} > 8: per-sample "
                             "DropPath masks support at most 8 "
                             "samples per tile")


def _mask_fns(seed, block, pid):
    s1 = seed + block * jnp.int32(0x61C88647) + jnp.int32(0x7F4A7C15)

    def mask(mid, shape, rate):
        if rate == 0.0:
            return None
        pltpu.prng_seed(s1, pid * 16 + mid)
        bits = pltpu.prng_random_bits(shape)
        u = jax.lax.shift_right_logical(bits.astype(jnp.uint32),
                                        jnp.uint32(8))
        thresh = jnp.uint32(int(round((1.0 - rate) * (1 << 24))))
        return (u < thresh).astype(jnp.float32) * (1.0 / (1.0 - rate))

    def row_mask(mid, rate, g, j, r):
        """Per-sample DropPath scalars expanded to tile rows [R, 1]:
        sample s (< 8 = max group) takes draw [s, 0] of an (8, 128) bit
        block; a [R, 8] one-hot of (row // j) routes it to its rows."""
        if rate == 0.0:
            return None
        pltpu.prng_seed(s1, pid * 16 + mid)
        bits = pltpu.prng_random_bits((8, 128))
        u = jax.lax.shift_right_logical(bits.astype(jnp.uint32),
                                        jnp.uint32(8))
        thresh = jnp.uint32(int(round((1.0 - rate) * (1 << 24))))
        vals = (u < thresh).astype(jnp.float32) / (1.0 - rate)  # [8, 128]
        rows8 = jax.lax.broadcasted_iota(jnp.int32, (r, 8), 0)
        cols8 = jax.lax.broadcasted_iota(jnp.int32, (r, 8), 1)
        sel = (cols8 == rows8 // j).astype(jnp.float32)         # [R, 8]
        return jnp.dot(sel, vals[:, :1],
                       preferred_element_type=jnp.float32)      # [R, 1]

    return mask, row_mask


def _structurals(g, j, r, jp):
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, jp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (r, jp), 1)
    p_f32 = (rows % j == cols).astype(jnp.float32)              # [R, JP]
    rowg = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0) // j
    colg = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1) // j
    onblock = (rowg == colg).astype(jnp.float32)
    offmask = -1e9 * (1.0 - onblock)

    def tile(t32):
        return onblock * (p_f32 @ (t32 @ p_f32.T))

    return p_f32, tile, onblock, offmask


def _block_fwd(x, p, bias_p, m0_bd, m1_bd, structs, mask, row_mask, cfg,
               dtype, g, j, r, want_inter=False):
    """One GAT block on the [R, C] f32 tile. Returns (x_out, inter)."""
    p_f32, tile, onblock, offmask = structs
    c = x.shape[-1]
    h = cfg.num_heads
    d = c // h
    scale = d ** -0.5

    def mm(a, w):
        return jnp.dot(a.astype(dtype), w.astype(dtype),
                       preferred_element_type=jnp.float32)

    y = _ln_fwd(x, p["norm1_scale"], p["norm1_bias"])
    yd = y.astype(dtype)
    qkv = mm(yd, p["qkv_w"]) + p["qkv_b"].astype(jnp.float32)
    ps, pds, m_attns, o_parts = [], [], [], []
    for hi in range(h):
        qh = qkv[:, hi * d:(hi + 1) * d].astype(dtype)
        kh = qkv[:, c + hi * d:c + (hi + 1) * d].astype(dtype)
        vh = qkv[:, 2 * c + hi * d:2 * c + (hi + 1) * d].astype(dtype)
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * scale + tile(bias_p[hi]) + offmask
        prob = jax.nn.softmax(s, axis=-1)
        m = mask(_M_ATTN_BASE + hi, (r, r), cfg.attn_rate)
        pd = prob if m is None else prob * m
        o_parts.append(jnp.dot(pd.astype(dtype), vh,
                               preferred_element_type=jnp.float32))
        ps.append(prob)
        pds.append(pd)
        m_attns.append(m)
    a1 = jnp.concatenate(o_parts, axis=-1)
    attn_pre = mm(a1, p["proj_w"]) + p["proj_b"].astype(jnp.float32)
    m_proj = mask(_M_PROJ, (r, c), cfg.proj_rate)
    attn = attn_pre if m_proj is None else attn_pre * m_proj

    # MGCN (reference: modules.py:213-255); both terms modulated by M
    mt = p_f32 @ p["gcn_m_p"].astype(jnp.float32)               # [R, C]
    diag_t = p_f32 @ p["gcn_diag_t"].astype(jnp.float32)        # [R, C]
    off_bd = tile(p["gcn_off_p"].astype(jnp.float32))           # [R, R]
    h0 = mm(yd, p["gcn_w0"]) * mt
    h1 = mm(yd, p["gcn_w1"]) * mt
    gcn = diag_t * h0 + jnp.dot(off_bd.astype(dtype), h1.astype(dtype),
                                preferred_element_type=jnp.float32) \
        + p["gcn_b"].astype(jnp.float32)

    zpre = attn + gcn
    dp1 = row_mask(_M_DP1, cfg.path_rate, g, j, r)
    z = zpre if dp1 is None else zpre * dp1

    f0p = mm(z, p["x0_w"]) + p["x0_b"].astype(jnp.float32)
    f1p = mm(z, p["x1_w"]) + p["x1_b"].astype(jnp.float32)
    f0 = jnp.dot(m0_bd.astype(dtype), f0p.astype(dtype),
                 preferred_element_type=jnp.float32)
    f1 = jnp.dot(m1_bd.astype(dtype), f1p.astype(dtype),
                 preferred_element_type=jnp.float32)
    xf = mm(f0, p["back_w0"]) + mm(f1, p["back_w1"]) \
        + p["back_b"].astype(jnp.float32)
    x1 = x + xf

    y2 = _ln_fwd(x1, p["norm2_scale"], p["norm2_bias"])
    y2d = y2.astype(dtype)
    pre = mm(y2d, p["fc1_w"]) + p["fc1_b"].astype(jnp.float32)
    hh = _gelu_exact(pre)
    m_mlp1 = mask(_M_MLP1, pre.shape, cfg.mlp_rate)
    hhd = hh if m_mlp1 is None else hh * m_mlp1
    mm2 = mm(hhd, p["fc2_w"]) + p["fc2_b"].astype(jnp.float32)
    m_mlp2 = mask(_M_MLP2, (r, c), cfg.mlp_rate)
    mm2d = mm2 if m_mlp2 is None else mm2 * m_mlp2
    dp2 = row_mask(_M_DP2, cfg.path_rate, g, j, r)
    x_out = x1 + (mm2d if dp2 is None else mm2d * dp2)
    if not want_inter:
        return x_out, None
    inter = dict(y=y, yd=yd, qkv=qkv, ps=ps, pds=pds, m_attns=m_attns,
                 a1=a1, m_proj=m_proj, mt=mt, diag_t=diag_t,
                 off_bd=off_bd, h0=h0, h1=h1, zpre=zpre, dp1=dp1, z=z,
                 f0p=f0p, f1p=f1p, f0=f0, f1=f1, x1=x1, y2=y2,
                 pre=pre, hhd=hhd, m_mlp1=m_mlp1, m_mlp2=m_mlp2,
                 dp2=dp2)
    return x_out, inter


def _ap(x, m):
    return x if m is None else x * m


def _block_bwd(g_out, x, p, bias_p, m0_bd, m1_bd, structs, inter, cfg,
               dtype, g, j, r):
    """VJP of `_block_fwd`: returns (dx, dbias [H, JP, JP], dparams)."""
    p_f32, tile, onblock, offmask = structs
    c = x.shape[-1]
    h = cfg.num_heads
    d = c // h
    scale = d ** -0.5
    dp = {}

    def mmd(a, b):
        return jnp.dot(a.astype(dtype), b.astype(dtype),
                       preferred_element_type=jnp.float32)

    def mmT(a, b):
        return jax.lax.dot_general(
            a.astype(dtype), b.astype(dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def mTm(a, b):
        return jax.lax.dot_general(
            a.astype(dtype), b.astype(dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # x_out = x1 + dp2 * (m_mlp2 * mm2)
    dx1 = g_out
    dmm2 = _ap(_ap(g_out, inter["dp2"]), inter["m_mlp2"])
    dhhd = mmT(dmm2, p["fc2_w"])
    dp["fc2_w"] = mTm(inter["hhd"], dmm2)
    dp["fc2_b"] = dmm2.sum(0)
    dhh = _ap(dhhd, inter["m_mlp1"])
    dpre = dhh * _gelu_grad(inter["pre"])
    dp["fc1_w"] = mTm(inter["y2"], dpre)
    dp["fc1_b"] = dpre.sum(0)
    dy2 = mmT(dpre, p["fc1_w"])
    dx1_ln, dp["norm2_scale"], dp["norm2_bias"] = _ln_bwd(
        dy2, inter["x1"], p["norm2_scale"])
    dx1 = dx1 + dx1_ln

    # x1 = x + xf
    dx = dx1
    dxf = dx1
    df0 = mmT(dxf, p["back_w0"])
    df1 = mmT(dxf, p["back_w1"])
    dp["back_w0"] = mTm(inter["f0"], dxf)
    dp["back_w1"] = mTm(inter["f1"], dxf)
    dp["back_b"] = dxf.sum(0)
    df0p = mTm(m0_bd, df0)          # m0_bd^T @ df0
    df1p = mTm(m1_bd, df1)
    dz = mmT(df0p, p["x0_w"]) + mmT(df1p, p["x1_w"])
    dp["x0_w"] = mTm(inter["z"], df0p)
    dp["x0_b"] = df0p.sum(0)
    dp["x1_w"] = mTm(inter["z"], df1p)
    dp["x1_b"] = df1p.sum(0)

    dzpre = _ap(dz, inter["dp1"])
    dattn = dzpre
    dgcn = dzpre

    # MGCN backward
    dp["gcn_b"] = dgcn.sum(0)
    dh0 = inter["diag_t"] * dgcn
    dh1 = mTm(inter["off_bd"], dgcn)         # off_bd^T @ dgcn
    d_off_bd = onblock * mmT(dgcn, inter["h1"])
    dp["gcn_off_p"] = mTm(p_f32, mmd(d_off_bd, p_f32))  # P^T @ (..) @ P
    dp["gcn_diag_t"] = mTm(p_f32, inter["h0"] * dgcn)
    dmt = dh0 * mmd(inter["yd"], p["gcn_w0"]) \
        + dh1 * mmd(inter["yd"], p["gcn_w1"])
    dp["gcn_m_p"] = mTm(p_f32, dmt)
    dyd = mmT(dh0 * inter["mt"], p["gcn_w0"]) \
        + mmT(dh1 * inter["mt"], p["gcn_w1"])
    dp["gcn_w0"] = mTm(inter["yd"], dh0 * inter["mt"])
    dp["gcn_w1"] = mTm(inter["yd"], dh1 * inter["mt"])

    # attention backward
    dattn_pre = _ap(dattn, inter["m_proj"])
    da1 = mmT(dattn_pre, p["proj_w"])
    dp["proj_w"] = mTm(inter["a1"], dattn_pre)
    dp["proj_b"] = dattn_pre.sum(0)
    dbias, dqhs, dkhs, dvhs = [], [], [], []
    for hi in range(h):
        da_h = da1[:, hi * d:(hi + 1) * d]
        vh = inter["qkv"][:, 2 * c + hi * d:2 * c + (hi + 1) * d]
        dpd = mmT(da_h, vh)
        dvhs.append(mTm(inter["pds"][hi], da_h))
        dprob = _ap(dpd, inter["m_attns"][hi])
        ds = _softmax_bwd(dprob, inter["ps"][hi])
        dbias.append(mTm(p_f32, mmd(onblock * ds, p_f32)))
        qh = inter["qkv"][:, hi * d:(hi + 1) * d]
        kh = inter["qkv"][:, c + hi * d:c + (hi + 1) * d]
        dqhs.append(mmd(ds, kh) * scale)
        dkhs.append(mTm(ds, qh) * scale)
    # per-head concat (a zero-width zeros-pad variant fails Mosaic:
    # "vector types must have positive constant sizes")
    dqkv = jnp.concatenate(
        [jnp.concatenate(dqhs, axis=-1),
         jnp.concatenate(dkhs, axis=-1),
         jnp.concatenate(dvhs, axis=-1)], axis=-1)
    dp["qkv_b"] = dqkv.sum(0)
    dp["qkv_w"] = mTm(inter["yd"], dqkv)
    dyd = dyd + mmT(dqkv, p["qkv_w"])

    dx_ln, dp["norm1_scale"], dp["norm1_bias"] = _ln_bwd(
        dyd, x, p["norm1_scale"])
    dx = dx + dx_ln
    return dx, jnp.stack(dbias), dp


def _fwd_kernel(seed_ref, x_ref, bias_ref, m0_ref, m1_ref, *rest,
                cfg, dtype, g, j, r, jp):
    p_refs = rest[:-1]
    out_ref = rest[-1]
    p = {key: ref[...] for key, ref in zip(TRAIN_BLOCK_KEYS, p_refs)}
    structs = _structurals(g, j, r, jp)
    _, tile, _, _ = structs
    bias_p = [bias_ref[hi].astype(jnp.float32)
              for hi in range(cfg.num_heads)]
    m0_bd = tile(m0_ref[...].astype(jnp.float32))
    m1_bd = tile(m1_ref[...].astype(jnp.float32))
    mask, row_mask = _mask_fns(seed_ref[0], cfg.block, pl.program_id(0))
    x = x_ref[...].astype(jnp.float32)
    out, _ = _block_fwd(x, p, bias_p, m0_bd, m1_bd, structs, mask,
                        row_mask, cfg, dtype, g, j, r)
    out_ref[...] = out.astype(out_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, bias_ref, m0_ref, m1_ref, g_ref, *rest,
                cfg, dtype, g, j, r, jp):
    n_p = len(TRAIN_BLOCK_KEYS)
    p_refs = rest[:n_p]
    dx_ref, dbias_ref = rest[n_p], rest[n_p + 1]
    dp_refs = rest[n_p + 2:]
    p = {key: ref[...] for key, ref in zip(TRAIN_BLOCK_KEYS, p_refs)}
    structs = _structurals(g, j, r, jp)
    _, tile, _, _ = structs
    bias_p = [bias_ref[hi].astype(jnp.float32)
              for hi in range(cfg.num_heads)]
    m0_bd = tile(m0_ref[...].astype(jnp.float32))
    m1_bd = tile(m1_ref[...].astype(jnp.float32))

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)
        for ref in dp_refs:
            ref[...] = jnp.zeros_like(ref)

    mask, row_mask = _mask_fns(seed_ref[0], cfg.block, pl.program_id(0))
    x = x_ref[...].astype(jnp.float32)
    gout = g_ref[...].astype(jnp.float32)
    _, inter = _block_fwd(x, p, bias_p, m0_bd, m1_bd, structs, mask,
                          row_mask, cfg, dtype, g, j, r, want_inter=True)
    dx, dbias, dparams = _block_bwd(gout, x, p, bias_p, m0_bd, m1_bd,
                                    structs, inter, cfg, dtype, g, j, r)
    dx_ref[...] = dx.astype(dx_ref.dtype)
    dbias_ref[...] += dbias.astype(dbias_ref.dtype)
    for key, ref in zip(TRAIN_BLOCK_KEYS, dp_refs):
        ref[...] += dparams[key].astype(ref.dtype)


def _interpret_arg(cfg):
    if not cfg.interpret:
        return False
    return pltpu.InterpretParams()


def _specs(interpret):
    def spec(shape, imap):
        if interpret is not False:
            return pl.BlockSpec(shape, imap)
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    def const(shape):
        nd = len(shape)
        return spec(shape, lambda i, nd=nd: (0,) * nd)

    sspec = pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM)
    return spec, const, sspec


def _run_fwd(cfg: GatBlockCfg, seed, x, bias_p, m0_p, m1_p, plist):
    b, j, c = x.shape
    g = cfg.group
    while g > 1 and b % g:
        g //= 2
    r = g * j
    jp = bias_p.shape[-1]
    x2d = x.reshape(b * j, c)
    interpret = _interpret_arg(cfg)
    spec, const, sspec = _specs(interpret)
    kwargs = {}
    if interpret is False:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, cfg=cfg, dtype=x.dtype, g=g, j=j,
                          r=r, jp=jp),
        grid=(b // g,),
        in_specs=[sspec, spec((r, c), lambda i: (i, 0)),
                  const(bias_p.shape), const(m0_p.shape),
                  const(m1_p.shape)] + [const(a.shape) for a in plist],
        out_specs=spec((r, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * j, c), x.dtype),
        interpret=interpret,
        **kwargs,
    )(seed, x2d, bias_p, m0_p, m1_p, *plist)
    return out.reshape(b, j, c)


def _run_bwd(cfg: GatBlockCfg, seed, x, bias_p, m0_p, m1_p, plist, gout):
    b, j, c = x.shape
    g = cfg.group
    while g > 1 and b % g:
        g //= 2
    r = g * j
    jp = bias_p.shape[-1]
    x2d = x.reshape(b * j, c)
    g2d = gout.astype(x.dtype).reshape(b * j, c)
    interpret = _interpret_arg(cfg)
    spec, const, sspec = _specs(interpret)
    out_shapes = (
        jax.ShapeDtypeStruct((b * j, c), x.dtype),
        jax.ShapeDtypeStruct(bias_p.shape, jnp.float32),
    ) + tuple(jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in plist)
    out_specs = (
        spec((r, c), lambda i: (i, 0)),
        const(bias_p.shape),
    ) + tuple(const(a.shape) for a in plist)
    kwargs = {}
    if interpret is False:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",))
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg=cfg, dtype=x.dtype, g=g, j=j,
                          r=r, jp=jp),
        grid=(b // g,),
        in_specs=[sspec, spec((r, c), lambda i: (i, 0)),
                  const(bias_p.shape), const(m0_p.shape),
                  const(m1_p.shape), spec((r, c), lambda i: (i, 0))]
        + [const(a.shape) for a in plist],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        **kwargs,
    )(seed, x2d, bias_p, m0_p, m1_p, g2d, *plist)
    dx = outs[0].reshape(b, j, c)
    dbias = outs[1]
    dplist = [d.astype(a.dtype) for d, a in zip(outs[2:], plist)]
    return dx, dbias, dplist


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def gat_block_train(cfg: GatBlockCfg, seed, x, bias_p, m0_p, m1_p,
                    *plist):
    """One GAT block, training mode, fused fwd+bwd on TPU.

    x: [B, J, C]; bias_p: [H, JP, JP] zero-padded hop/path bias (gets a
    gradient — its tables are learned); m0_p/m1_p: [JP, JP] X_Feat hop
    masks (constants); plist: TRAIN_BLOCK_KEYS order."""
    return _run_fwd(cfg, seed, x, bias_p, m0_p, m1_p, list(plist))


def _vjp_fwd(cfg, seed, x, bias_p, m0_p, m1_p, *plist):
    out = _run_fwd(cfg, seed, x, bias_p, m0_p, m1_p, list(plist))
    return out, (seed, x, bias_p, m0_p, m1_p, plist)


def _vjp_bwd(cfg, res, gout):
    seed, x, bias_p, m0_p, m1_p, plist = res
    dx, dbias, dplist = _run_bwd(cfg, seed, x, bias_p, m0_p, m1_p,
                                 list(plist), gout)
    # the X_Feat hop masks are constants; explicit zero cotangents
    return (None, dx, dbias.astype(bias_p.dtype),
            jnp.zeros_like(m0_p), jnp.zeros_like(m1_p), *dplist)


gat_block_train.defvjp(_vjp_fwd, _vjp_bwd)


def prep_block_params(bp: Dict, jp: int, c: int) -> list:
    """extract_block_params output -> kernel primals (jnp ops only, so
    gradients flow back to the raw flax params through jax autodiff:
    adj2 symmetrization/diag-split, M, the qkv/proj weights)."""
    j = bp["gcn_m"].shape[0]

    def padj(a, axes):
        pads = [(0, jp - a.shape[ax]) if ax in axes else (0, 0)
                for ax in range(a.ndim)]
        return jnp.pad(jnp.asarray(a), pads)

    out = {
        "gcn_m_p": padj(bp["gcn_m"], (0,)),
        # materialized broadcast: Mosaic rejects a lazy broadcast_in_dim
        # as a pallas_call operand ("Invalid type")
        "gcn_diag_t": padj(bp["gcn_adj_diag"], (0,))
        * jnp.ones((1, c), jnp.float32),
        "gcn_off_p": padj(bp["gcn_adj_off"], (0, 1)),
    }
    for key in TRAIN_BLOCK_KEYS:
        if key not in out:
            out[key] = jnp.asarray(bp[key])
    return [out[key] for key in TRAIN_BLOCK_KEYS]


def gat_trunk_train(x, bias, block_params: Sequence[Dict],
                    masks_xfeat, num_heads: int, seed,
                    attn_rate=0.4, proj_rate=0.4, mlp_rate=0.1,
                    drop_path_rate=0.2, group: int = 8,
                    interpret: bool = False):
    """The whole lifter trunk in training mode: 6 custom-VJP fused
    blocks. bias: [H, J, J] hop/path encoding (differentiable input);
    masks_xfeat: [2, J, J] constants."""
    b, j, c = x.shape
    jp = _round_up(j, 32)
    depth = len(block_params)
    pad2 = ((0, 0), (0, jp - j), (0, jp - j))
    bias_p = jnp.pad(bias, pad2)
    m01 = jnp.pad(jnp.asarray(masks_xfeat[:2], jnp.float32),
                  pad2)
    dpr = np.linspace(0.0, drop_path_rate, depth)
    for bi, bp in enumerate(block_params):
        cfg = GatBlockCfg(num_heads=num_heads, num_joint=j, block=bi,
                          attn_rate=attn_rate, proj_rate=proj_rate,
                          mlp_rate=mlp_rate, path_rate=float(dpr[bi]),
                          group=group, interpret=interpret)
        plist = prep_block_params(bp, jp, c)
        x = gat_block_train(cfg, seed, x, bias_p, m01[0], m01[1], *plist)
    return x


# ---------------------------------------------------------------------------
# pure-jnp oracle with EXPLICIT masks (tests drive kernel + oracle through
# identical masks and compare values and VJPs)


def gat_block_train_ref(x, bias, p: Dict, masks_xfeat, masks: Dict,
                        num_heads: int):
    """Reference block on [B, J, C] with explicit scaled dropout masks:
    attn [B,H,J,J], proj [B,J,C], dp1/dp2 [B,1,1], mlp1 [B,J,4C],
    mlp2 [B,J,C] (values in {0, 1/keep}; None disables one). Parameter
    dict: BLOCK_PARAM_KEYS (unpadded graph tables)."""
    b, j, c = x.shape
    h = num_heads
    d = c // h
    scale = d ** -0.5
    x32 = x.astype(jnp.float32)

    def m(name):
        return masks.get(name)

    y = _ln_fwd(x32, p["norm1_scale"], p["norm1_bias"])
    qkv = (y @ p["qkv_w"] + p["qkv_b"]).reshape(b, j, 3, h, d)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale + bias[None]
    prob = jax.nn.softmax(s, axis=-1)
    pd = _ap(prob, m("attn"))
    a1 = jnp.einsum("bhnm,bmhd->bnhd", pd, v).reshape(b, j, c)
    attn = a1 @ p["proj_w"] + p["proj_b"]
    attn = _ap(attn, m("proj"))

    mt = p["gcn_m"]
    h0 = (y @ p["gcn_w0"]) * mt
    h1 = (y @ p["gcn_w1"]) * mt
    gcn = p["gcn_adj_diag"] * h0 \
        + jnp.einsum("ij,bjc->bic", p["gcn_adj_off"], h1) + p["gcn_b"]

    z = _ap(attn + gcn, m("dp1"))
    f0 = jnp.einsum("ij,bjc->bic", jnp.asarray(masks_xfeat[0],
                                               jnp.float32),
                    z @ p["x0_w"] + p["x0_b"])
    f1 = jnp.einsum("ij,bjc->bic", jnp.asarray(masks_xfeat[1],
                                               jnp.float32),
                    z @ p["x1_w"] + p["x1_b"])
    xf = f0 @ p["back_w0"] + f1 @ p["back_w1"] + p["back_b"]
    x1 = x32 + xf

    y2 = _ln_fwd(x1, p["norm2_scale"], p["norm2_bias"])
    hh = _gelu_exact(y2 @ p["fc1_w"] + p["fc1_b"])
    hh = _ap(hh, m("mlp1"))
    mm2 = hh @ p["fc2_w"] + p["fc2_b"]
    mm2 = _ap(mm2, m("mlp2"))
    return (x1 + _ap(mm2, m("dp2"))).astype(x.dtype)

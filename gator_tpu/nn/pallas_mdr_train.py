"""Fused MDR LBF layer for TRAINING: forward + hand-derived backward.

The training problem the serving kernel (pallas_mdr.py) cannot solve:
attention-probability dropout needs randomness *inside* the kernel, and
the backward pass needs the probabilities again — the XLA formulation
materializes [B, H, 431, 431] probability tensors in HBM for the VJP
(~3 GB at batch 2048), capping the train batch and dominating step time
(reference training hot loop: lib/core/base.py:122-183; layer math:
lib/models/MDR.py:18-69,139-153 + lib/models/vanilla_transformer_encoder.py).

TPU-native answer, one `jax.custom_vjp` per LBF layer:
  * forward kernel: the whole layer per sample tile in VMEM, dropout masks
    generated with the on-core PRNG (`pltpu.prng_seed/prng_random_bits`),
    seeded per (seed, layer, sample, mask-id) so ANY mask is regenerable
    anywhere — no mask ever touches HBM;
  * backward kernel: recomputes the forward from the saved layer input
    (recompute-in-backward; residual = layer input only), regenerates the
    same masks from the same seeds, and backpropagates through softmax /
    LayerNorm / Bessel-std LayerNorm / exact-erf GELU / DropPath in-kernel.
    Parameter gradients accumulate across the sequential grid into
    constant-index output blocks (f32).

Dropout placements and rates mirror the flax model exactly
(CrossAttentionBlock drop=attn=path=0.2, MDR self-attn + residual 0.1):
  cross probs -> proj out -> DropPath(attn branch) -> MLP drop x2 ->
  DropPath(mlp branch) -> self probs -> sa-residual dropout.

`lbf_layer_train_ref` is the pure-jnp oracle taking explicit mask arrays;
tests drive both through identical masks and compare values and VJPs.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .pallas_mdr import LAYER_PARAM_KEYS, _erf, _gelu_exact, _round_up

try:
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAVE_PLTPU = False


# (attn, proj, path, mlp, self_attn, out) — flax model defaults
# (models/mdr.py CrossAttentionBlock + MDR self-attention stack)
DEFAULT_RATES = (0.2, 0.2, 0.2, 0.2, 0.1, 0.1)
ZERO_RATES = (0.0,) * 6

# mask ids (PRNG stream per (seed, layer, sample, mask_id)); the two
# attention families get an 8-head budget each (matching the GAT kernel)
# so per-head streams can never collide with the per-tensor streams
_M_ATTN0 = 0                         # + head index (num_heads <= 8)
_M_PROJ, _M_DP1, _M_MLP1, _M_MLP2, _M_DP2 = 8, 9, 10, 11, 12
_M_SELF0 = 16                        # + head index (num_heads <= 8)
_M_OUT = 24
_MID_STRIDE = 32                     # mids < 32 pack injectively


@dataclasses.dataclass(frozen=True)
class TrainLayerCfg:
    num_heads: int
    nv0: int                    # real vertex-token count (431)
    nj0: int                    # real joint-token count (17/19)
    layer: int                  # layer index (seeds the PRNG stream)
    rates: tuple = DEFAULT_RATES
    group_fwd: int = 4
    # one sample per backward program: the recompute+bwd body is ~3x the
    # forward and the sample loop unrolls — g=2 measured >9 min Mosaic
    # compiles through the relay
    group_bwd: int = 1
    interpret: bool = False

    def __post_init__(self):
        if not 1 <= self.num_heads <= 8:
            raise ValueError(
                f"num_heads={self.num_heads}: the per-head dropout mask "
                "streams budget 8 heads (_M_ATTN0/_M_SELF0 spacing)")


def _ln_fwd(x32, scale, bias, eps=1e-5):
    mean = x32.mean(-1, keepdims=True)
    var = ((x32 - mean) ** 2).mean(-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _ln_bwd(dy, x32, scale, eps=1e-5):
    """VJP of `_ln_fwd` w.r.t. (x, scale, bias); per-feature params."""
    mean = x32.mean(-1, keepdims=True)
    var = ((x32 - mean) ** 2).mean(-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x32 - mean) * rstd
    dscale = (dy * xhat).sum(0)
    dbias = dy.sum(0)
    g = dy * scale
    dx = rstd * (g - g.mean(-1, keepdims=True)
                 - xhat * (g * xhat).mean(-1, keepdims=True))
    return dx, dscale, dbias


def _stdln_fwd(x32, a2, b2, eps=1e-6):
    n = x32.shape[-1]
    mean = x32.mean(-1, keepdims=True)
    var = ((x32 - mean) ** 2).sum(-1, keepdims=True) / (n - 1)
    return a2 * (x32 - mean) / (jnp.sqrt(var) + eps) + b2


def _stdln_bwd(dy, x32, a2, eps=1e-6):
    """VJP of the Annotated-Transformer LayerNorm (Bessel std, eps added
    to the std — reference: vanilla_transformer_encoder.py:24-34)."""
    n = x32.shape[-1]
    mean = x32.mean(-1, keepdims=True)
    u = x32 - mean
    var = (u ** 2).sum(-1, keepdims=True) / (n - 1)
    std = jnp.sqrt(var)
    denom = std + eps
    xh = u / denom
    da2 = (dy * xh).sum(0)
    db2 = dy.sum(0)
    g = dy * a2
    s1 = g.sum(-1, keepdims=True)
    s2 = (g * u).sum(-1, keepdims=True)
    dx = (g - s1 / n) / denom \
        - u * (s2 / ((n - 1) * jnp.maximum(std, 1e-20) * denom * denom))
    return dx, da2, db2


def _gelu_grad(pre32):
    c = 0.7071067811865476
    cdf = 0.5 * (1.0 + _erf(pre32 * c))
    pdf = jnp.exp(-0.5 * pre32 * pre32) * 0.3989422804014327
    return cdf + pre32 * pdf


def _softmax_bwd(dp, p):
    return p * (dp - (dp * p).sum(-1, keepdims=True))


def _make_mask_fn(seed, layer, sample, rates):
    """mask(mid, shape, rate) -> scaled keep mask (f32) or None.

    Each mask has its own PRNG stream, so forward and backward regenerate
    identical masks with no draw-order coupling. Mosaic's prng_seed takes
    AT MOST two seed words, so (seed, layer, sample, mask-id) folds into
    two: layer perturbs the base seed by a Weyl constant; (sample, mid)
    pack injectively into the second word (mid < _MID_STRIDE)."""
    s1 = seed + layer * jnp.int32(0x61C88647)

    def _seed_for(mid):
        pltpu.prng_seed(s1, sample * _MID_STRIDE + mid)

    def mask(mid, shape, rate):
        if rate == 0.0:
            return None
        _seed_for(mid)
        bits = pltpu.prng_random_bits(shape)
        u = jax.lax.shift_right_logical(bits.astype(jnp.uint32),
                                        jnp.uint32(8))
        thresh = jnp.uint32(int(round((1.0 - rate) * (1 << 24))))
        return (u < thresh).astype(jnp.float32) * (1.0 / (1.0 - rate))

    def scalar_mask(mid, rate):
        if rate == 0.0:
            return None
        _seed_for(mid)
        bits = pltpu.prng_random_bits((8, 128))
        u = jax.lax.shift_right_logical(bits.astype(jnp.uint32),
                                        jnp.uint32(8))[0, 0]
        thresh = jnp.uint32(int(round((1.0 - rate) * (1 << 24))))
        return (u < thresh).astype(jnp.float32) * (1.0 / (1.0 - rate))

    return mask, scalar_mask


def _apply(x, m):
    return x if m is None else x * m


def _heads(x, h):
    d = x.shape[-1] // h
    return [x[:, i * d:(i + 1) * d] for i in range(h)]


def _sample_fwd(x, jt, p, mask, scalar_mask, rates, num_heads, dtype,
                crossmask, selfmask, want_inter=False):
    """One LBF layer on padded [Nv, C] verts + [Nj, C] joints (f32 in);
    returns out (f32) and, for the backward, every intermediate."""
    r_attn, r_proj, r_path, r_mlp, r_self, r_out = rates
    c = x.shape[-1]
    h = num_heads
    d = c // h
    scale = d ** -0.5
    nv, nj = x.shape[0], jt.shape[0]

    def mm(a, w):
        return jnp.dot(a.astype(dtype), w.astype(dtype),
                       preferred_element_type=jnp.float32)

    yv = _ln_fwd(x, p["norm1_scale"], p["norm1_bias"])
    yj = _ln_fwd(jt, p["norm1_scale"], p["norm1_bias"])
    q = mm(yv, p["wq"])
    k = mm(yj, p["wk"])
    v = mm(yj, p["wv"])
    ps, pds, m_attns, a1_parts = [], [], [], []
    for hi, (qh, kh, vh) in enumerate(zip(_heads(q, h), _heads(k, h),
                                          _heads(v, h))):
        s = jax.lax.dot_general(
            qh.astype(dtype), kh.astype(dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + crossmask
        prob = jax.nn.softmax(s, axis=-1)
        m = mask(_M_ATTN0 + hi, (nv, nj), r_attn)
        pd = _apply(prob, m)
        o = jnp.dot(pd.astype(dtype), vh.astype(dtype),
                    preferred_element_type=jnp.float32)
        ps.append(prob)
        pds.append(pd)
        m_attns.append(m)
        a1_parts.append(o)
    a1 = jnp.concatenate(a1_parts, axis=-1)
    o_pre = mm(a1, p["proj_w"]) + p["proj_b"].astype(jnp.float32)
    m_proj = mask(_M_PROJ, (nv, c), r_proj)
    o = _apply(o_pre, m_proj)
    dp1 = scalar_mask(_M_DP1, r_path)
    x1 = x + _apply(o, dp1)

    y2 = _ln_fwd(x1, p["norm2_scale"], p["norm2_bias"])
    pre1 = mm(y2, p["fc1_w"]) + p["fc1_b"].astype(jnp.float32)
    h1 = _gelu_exact(pre1)
    m_mlp1 = mask(_M_MLP1, pre1.shape, r_mlp)
    h1d = _apply(h1, m_mlp1)
    h2 = mm(h1d, p["fc2_w"]) + p["fc2_b"].astype(jnp.float32)
    m_mlp2 = mask(_M_MLP2, (nv, c), r_mlp)
    h2d = _apply(h2, m_mlp2)
    dp2 = scalar_mask(_M_DP2, r_path)
    x2 = x1 + _apply(h2d, dp2)

    y3 = _stdln_fwd(x2, p["a2"], p["b2"])
    y3d = y3.astype(dtype)
    q2 = mm(y3d, p["l0_w"]) + p["l0_b"].astype(jnp.float32)
    k2 = mm(y3d, p["l1_w"]) + p["l1_b"].astype(jnp.float32)
    v2 = mm(y3d, p["l2_w"]) + p["l2_b"].astype(jnp.float32)
    p2s, p2ds, m_selfs, a2_parts = [], [], [], []
    for hi, (qh, kh, vh) in enumerate(zip(_heads(q2, h), _heads(k2, h),
                                          _heads(v2, h))):
        s = jax.lax.dot_general(
            qh.astype(dtype), kh.astype(dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + selfmask
        prob = jax.nn.softmax(s, axis=-1)
        m = mask(_M_SELF0 + hi, (nv, nv), r_self)
        pd = _apply(prob, m)
        o = jnp.dot(pd.astype(dtype), vh.astype(dtype),
                    preferred_element_type=jnp.float32)
        p2s.append(prob)
        p2ds.append(pd)
        m_selfs.append(m)
        a2_parts.append(o)
    a2 = jnp.concatenate(a2_parts, axis=-1)
    sa = mm(a2, p["l3_w"]) + p["l3_b"].astype(jnp.float32)
    m_out = mask(_M_OUT, (nv, c), r_out)
    out = y3 + _apply(sa, m_out)
    if not want_inter:
        return out, None
    inter = dict(yv=yv, yj=yj, q=q, k=k, v=v, ps=ps, pds=pds,
                 m_attns=m_attns, a1=a1, m_proj=m_proj, dp1=dp1, x1=x1,
                 y2=y2, pre1=pre1, h1d=h1d, m_mlp1=m_mlp1, m_mlp2=m_mlp2,
                 dp2=dp2, x2=x2, y3=y3, y3d=y3d, q2=q2, k2=k2, v2=v2,
                 p2s=p2s, p2ds=p2ds, m_selfs=m_selfs, a2=a2, m_out=m_out)
    return out, inter


def _sample_bwd(g, x, jt, p, inter, rates, num_heads, dtype):
    """Hand-derived VJP of `_sample_fwd` for one sample: returns
    (dx, djt, dparams dict). g: [Nv, C] f32 cotangent of the output."""
    r_attn, r_proj, r_path, r_mlp, r_self, r_out = rates
    c = x.shape[-1]
    h = num_heads
    d = c // h
    scale = d ** -0.5
    dp = {}

    # backward matmuls run at the kernel dtype (bf16 operands / f32
    # accumulate in production; full f32 when the primal is f32 — the
    # tight-tolerance parity tests rely on that)
    def mmf(a, b):
        return jnp.dot(a.astype(dtype), b.astype(dtype),
                       preferred_element_type=jnp.float32)

    def mmT(a, b):      # a @ b.T
        return jax.lax.dot_general(
            a.astype(dtype), b.astype(dtype),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    def mTm(a, b):      # a.T @ b
        return jax.lax.dot_general(
            a.astype(dtype), b.astype(dtype),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    # 13. out = y3 + m_out * sa
    dy3 = g
    dsa = _apply(g, inter["m_out"])
    # 12. sa = a2 @ L3 + b3
    da2 = mmT(dsa, p["l3_w"])
    dp["l3_w"] = mTm(inter["a2"], dsa)
    dp["l3_b"] = dsa.sum(0)
    # 11. self-attention heads
    dq2s, dk2s, dv2s = [], [], []
    for hi in range(h):
        da_h = da2[:, hi * d:(hi + 1) * d]
        pd = inter["p2ds"][hi]
        prob = inter["p2s"][hi]
        dpd = mmT(da_h, _heads(inter["v2"], h)[hi])
        dv2s.append(mTm(pd, da_h))
        dprob = _apply(dpd, inter["m_selfs"][hi])
        ds = _softmax_bwd(dprob, prob) * scale
        dq2s.append(mmf(ds, _heads(inter["k2"], h)[hi]))
        dk2s.append(mTm(ds, _heads(inter["q2"], h)[hi]))
    dq2 = jnp.concatenate(dq2s, axis=-1)
    dk2 = jnp.concatenate(dk2s, axis=-1)
    dv2 = jnp.concatenate(dv2s, axis=-1)
    # 10. q2/k2/v2 = y3 @ L + b
    y3 = inter["y3"]
    dy3 = dy3 + mmT(dq2, p["l0_w"]) + mmT(dk2, p["l1_w"]) \
        + mmT(dv2, p["l2_w"])
    dp["l0_w"] = mTm(y3, dq2)
    dp["l0_b"] = dq2.sum(0)
    dp["l1_w"] = mTm(y3, dk2)
    dp["l1_b"] = dk2.sum(0)
    dp["l2_w"] = mTm(y3, dv2)
    dp["l2_b"] = dv2.sum(0)
    # 9. y3 = stdLN(x2)
    dx2, dp["a2"], dp["b2"] = _stdln_bwd(dy3, inter["x2"], p["a2"])
    # 8. x2 = x1 + dp2 * h2d
    dx1 = dx2
    dh2d = _apply(dx2, inter["dp2"])
    dh2 = _apply(dh2d, inter["m_mlp2"])
    # 7. MLP
    dh1d = mmT(dh2, p["fc2_w"])
    dp["fc2_w"] = mTm(inter["h1d"], dh2)
    dp["fc2_b"] = dh2.sum(0)
    dh1 = _apply(dh1d, inter["m_mlp1"])
    dpre1 = dh1 * _gelu_grad(inter["pre1"])
    dp["fc1_w"] = mTm(inter["y2"], dpre1)
    dp["fc1_b"] = dpre1.sum(0)
    dy2 = mmT(dpre1, p["fc1_w"])
    # 6. y2 = LN2(x1)
    dx1_ln, dp["norm2_scale"], dp["norm2_bias"] = _ln_bwd(
        dy2, inter["x1"], p["norm2_scale"])
    dx1 = dx1 + dx1_ln
    # 5. x1 = x + dp1 * (m_proj * o_pre)
    dx = dx1
    do = _apply(_apply(dx1, inter["dp1"]), inter["m_proj"])
    # 4. o_pre = a1 @ proj + b
    da1 = mmT(do, p["proj_w"])
    dp["proj_w"] = mTm(inter["a1"], do)
    dp["proj_b"] = do.sum(0)
    # 3. cross-attention heads
    dqs, dks, dvs = [], [], []
    for hi in range(h):
        da_h = da1[:, hi * d:(hi + 1) * d]
        pd = inter["pds"][hi]
        prob = inter["ps"][hi]
        dpd = mmT(da_h, _heads(inter["v"], h)[hi])
        dvs.append(mTm(pd, da_h))
        dprob = _apply(dpd, inter["m_attns"][hi])
        ds = _softmax_bwd(dprob, prob) * scale
        dqs.append(mmf(ds, _heads(inter["k"], h)[hi]))
        dks.append(mTm(ds, _heads(inter["q"], h)[hi]))
    dq = jnp.concatenate(dqs, axis=-1)
    dk = jnp.concatenate(dks, axis=-1)
    dv = jnp.concatenate(dvs, axis=-1)
    # 2. q/k/v projections (no biases)
    yv, yj = inter["yv"], inter["yj"]
    dyv = mmT(dq, p["wq"])
    dyj = mmT(dk, p["wk"]) + mmT(dv, p["wv"])
    dp["wq"] = mTm(yv, dq)
    dp["wk"] = mTm(yj, dk)
    dp["wv"] = mTm(yj, dv)
    # 1. shared LN1 over verts and joints rows
    dx_ln, ds_v, db_v = _ln_bwd(dyv, x, p["norm1_scale"])
    djt, ds_j, db_j = _ln_bwd(dyj, jt, p["norm1_scale"])
    dx = dx + dx_ln
    dp["norm1_scale"] = ds_v + ds_j
    dp["norm1_bias"] = db_v + db_j
    return dx, djt, dp


def _masks_for_kernel(nv, nj, nv0, nj0):
    """-inf column masks for pad joints (cross) / pad verts (self)."""
    cm = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, nj), 1) < nj0, 0.0,
        -1e9).astype(jnp.float32)
    sm = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, nv), 1) < nv0, 0.0,
        -1e9).astype(jnp.float32)
    return cm, sm


def _fwd_kernel(seed_ref, x_ref, j_ref, *rest, cfg, g, nv, nj, dtype):
    p_refs = rest[:-1]
    out_ref = rest[-1]
    p = {key: ref[...] for key, ref in zip(LAYER_PARAM_KEYS, p_refs)}
    crossmask, selfmask = _masks_for_kernel(nv, nj, cfg.nv0, cfg.nj0)
    for gi in range(g):
        sample = pl.program_id(0) * g + gi
        mask, smask = _make_mask_fn(seed_ref[0], cfg.layer, sample,
                                    cfg.rates)
        x = x_ref[gi * nv:(gi + 1) * nv, :].astype(jnp.float32)
        jt = j_ref[gi * nj:(gi + 1) * nj, :].astype(jnp.float32)
        out, _ = _sample_fwd(x, jt, p, mask, smask, cfg.rates,
                             cfg.num_heads, dtype, crossmask, selfmask)
        out_ref[gi * nv:(gi + 1) * nv, :] = out.astype(out_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, j_ref, g_ref, *rest, cfg, g, nv, nj,
                dtype):
    n_p = len(LAYER_PARAM_KEYS)
    p_refs = rest[:n_p]
    dx_ref, dj_ref = rest[n_p], rest[n_p + 1]
    dp_refs = rest[n_p + 2:]
    p = {key: ref[...] for key, ref in zip(LAYER_PARAM_KEYS, p_refs)}
    crossmask, selfmask = _masks_for_kernel(nv, nj, cfg.nv0, cfg.nj0)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in dp_refs:
            ref[...] = jnp.zeros_like(ref)

    for gi in range(g):
        sample = pl.program_id(0) * g + gi
        mask, smask = _make_mask_fn(seed_ref[0], cfg.layer, sample,
                                    cfg.rates)
        x = x_ref[gi * nv:(gi + 1) * nv, :].astype(jnp.float32)
        jt = j_ref[gi * nj:(gi + 1) * nj, :].astype(jnp.float32)
        gout = g_ref[gi * nv:(gi + 1) * nv, :].astype(jnp.float32)
        _, inter = _sample_fwd(x, jt, p, mask, smask, cfg.rates,
                               cfg.num_heads, dtype, crossmask, selfmask,
                               want_inter=True)
        dx, djt, dparams = _sample_bwd(gout, x, jt, p, inter, cfg.rates,
                                       cfg.num_heads, dtype)
        dx_ref[gi * nv:(gi + 1) * nv, :] = dx.astype(dx_ref.dtype)
        dj_ref[gi * nj:(gi + 1) * nj, :] = djt.astype(dj_ref.dtype)
        for key, ref in zip(LAYER_PARAM_KEYS, dp_refs):
            ref[...] += dparams[key].astype(ref.dtype)


def _interpret_arg(cfg):
    if not cfg.interpret:
        return False
    # TPU-semantics interpreter: emulates the pltpu PRNG primitives on CPU
    return pltpu.InterpretParams()


def _pad2(x, n0, n):
    b = x.shape[0]
    c = x.shape[2]
    return jnp.pad(x, ((0, 0), (0, n - n0), (0, 0))).reshape(b * n, c)


def _run_fwd(cfg: TrainLayerCfg, seed, x, jt, plist):
    b, nv0, c = x.shape
    nj0 = jt.shape[1]
    nv = _round_up(nv0, 16)
    nj = _round_up(nj0, 8)
    g = cfg.group_fwd
    while g > 1 and b % g:
        g //= 2
    x2d = _pad2(x, nv0, nv)
    j2d = _pad2(jt, nj0, nj)
    interpret = _interpret_arg(cfg)

    def _spec(shape, imap):
        if interpret is not False:
            return pl.BlockSpec(shape, imap)
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    def _const(shape):
        nd = len(shape)
        return _spec(shape, lambda i, nd=nd: (0,) * nd)

    sspec = pl.BlockSpec((1,), lambda i: (0,),
                         memory_space=pltpu.SMEM)
    kwargs = {}
    if interpret is False:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, cfg=cfg, g=g, nv=nv, nj=nj,
                          dtype=x.dtype),
        grid=(b // g,),
        in_specs=[sspec,
                  _spec((g * nv, c), lambda i: (i, 0)),
                  _spec((g * nj, c), lambda i: (i, 0))]
        + [_const(pl_.shape) for pl_ in plist],
        out_specs=_spec((g * nv, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * nv, c), x.dtype),
        interpret=interpret,
        **kwargs,
    )(seed, x2d, j2d, *plist)
    return out.reshape(b, nv, c)[:, :nv0]


def _run_bwd(cfg: TrainLayerCfg, seed, x, jt, plist, gout):
    b, nv0, c = x.shape
    nj0 = jt.shape[1]
    nv = _round_up(nv0, 16)
    nj = _round_up(nj0, 8)
    g = cfg.group_bwd
    while g > 1 and b % g:
        g //= 2
    x2d = _pad2(x, nv0, nv)
    j2d = _pad2(jt, nj0, nj)
    g2d = _pad2(gout.astype(x.dtype), nv0, nv)
    interpret = _interpret_arg(cfg)

    def _spec(shape, imap):
        if interpret is not False:
            return pl.BlockSpec(shape, imap)
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    def _const(shape):
        nd = len(shape)
        return _spec(shape, lambda i, nd=nd: (0,) * nd)

    sspec = pl.BlockSpec((1,), lambda i: (0,),
                         memory_space=pltpu.SMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((b * nv, c), x.dtype),          # dx
        jax.ShapeDtypeStruct((b * nj, c), jt.dtype),         # djt
    ) + tuple(jax.ShapeDtypeStruct(pl_.shape, jnp.float32)
              for pl_ in plist)
    out_specs = (
        _spec((g * nv, c), lambda i: (i, 0)),
        _spec((g * nj, c), lambda i: (i, 0)),
    ) + tuple(_const(pl_.shape) for pl_ in plist)
    kwargs = {}
    if interpret is False:
        # param-grad accumulation revisits the same output blocks: the
        # grid must run sequentially
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",))
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg=cfg, g=g, nv=nv, nj=nj,
                          dtype=x.dtype),
        grid=(b // g,),
        in_specs=[sspec,
                  _spec((g * nv, c), lambda i: (i, 0)),
                  _spec((g * nj, c), lambda i: (i, 0)),
                  _spec((g * nv, c), lambda i: (i, 0))]
        + [_const(pl_.shape) for pl_ in plist],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        **kwargs,
    )(seed, x2d, j2d, g2d, *plist)
    dx = outs[0].reshape(b, nv, c)[:, :nv0]
    djt = outs[1].reshape(b, nj, c)[:, :nj0]
    dplist = [d.astype(p_.dtype) for d, p_ in zip(outs[2:], plist)]
    return dx, djt, dplist


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def lbf_layer_train(cfg: TrainLayerCfg, seed, x, jt, *plist):
    """One LBF layer, training mode, fused fwd+bwd on TPU.

    seed: int32 scalar array (fold the step counter in upstream);
    x: [B, Nv0, C] verts, jt: [B, Nj0, C] joints; plist: the layer's
    parameters in LAYER_PARAM_KEYS order (f32 master copies are fine —
    matmuls cast to x.dtype in-kernel, accumulate f32)."""
    return _run_fwd(cfg, seed, x, jt, list(plist))


def _vjp_fwd(cfg, seed, x, jt, *plist):
    out = _run_fwd(cfg, seed, x, jt, list(plist))
    return out, (seed, x, jt, plist)


def _vjp_bwd(cfg, res, gout):
    seed, x, jt, plist = res
    dx, djt, dplist = _run_bwd(cfg, seed, x, jt, list(plist), gout)
    return (None, dx, djt, *dplist)


lbf_layer_train.defvjp(_vjp_fwd, _vjp_bwd)


def lbf_stack_train(x, jt, layer_params: Sequence[Dict], num_heads: int,
                    seed, rates=DEFAULT_RATES, interpret: bool = False,
                    group_fwd: int = 4, group_bwd: int = 1):
    """The 3-layer LBF stack in training mode (fused kernels with
    in-kernel dropout + custom VJP). jt is shared by every layer; its
    gradient accumulates across layers through the chain rule."""
    nv0, nj0 = x.shape[1], jt.shape[1]
    for li, lp in enumerate(layer_params):
        cfg = TrainLayerCfg(num_heads=num_heads, nv0=nv0, nj0=nj0,
                            layer=li, rates=tuple(rates),
                            group_fwd=group_fwd, group_bwd=group_bwd,
                            interpret=interpret)
        x = lbf_layer_train(cfg, seed, x, jt,
                            *[lp[key] for key in LAYER_PARAM_KEYS])
    return x


# ---------------------------------------------------------------------------
# pure-jnp oracle with EXPLICIT masks (tests drive kernel + oracle through
# identical masks and compare values and VJPs)


def lbf_layer_train_ref(x, jt, p: Dict, masks: Dict, num_heads: int):
    """Reference layer on [B, Nv, C] / [B, Nj, C] with explicit scaled
    dropout masks: attn [B,H,Nv,Nj], proj [B,Nv,C], dp1/dp2 [B,1,1],
    mlp1 [B,Nv,4C], mlp2 [B,Nv,C], self [B,H,Nv,Nv], out [B,Nv,C]
    (values in {0, 1/keep}; pass None to disable one)."""
    c = x.shape[-1]
    h = num_heads
    d = c // h
    scale = d ** -0.5

    def getm(name, bi, hi=None):
        m = masks.get(name)
        if m is None:
            return None
        return m[bi] if hi is None else m[bi, hi]

    outs = []
    for bi in range(x.shape[0]):
        xb = x[bi].astype(jnp.float32)
        jb = jt[bi].astype(jnp.float32)
        yv = _ln_fwd(xb, p["norm1_scale"], p["norm1_bias"])
        yj = _ln_fwd(jb, p["norm1_scale"], p["norm1_bias"])
        q, k, v = yv @ p["wq"], yj @ p["wk"], yj @ p["wv"]
        parts = []
        for hi in range(h):
            qh, kh, vh = (t[:, hi * d:(hi + 1) * d] for t in (q, k, v))
            prob = jax.nn.softmax(qh @ kh.T * scale, axis=-1)
            prob = _apply(prob, getm("attn", bi, hi))
            parts.append(prob @ vh)
        o = jnp.concatenate(parts, -1) @ p["proj_w"] + p["proj_b"]
        o = _apply(o, getm("proj", bi))
        x1 = xb + _apply(o, masks["dp1"][bi, 0, 0]
                         if masks.get("dp1") is not None else None)
        y2 = _ln_fwd(x1, p["norm2_scale"], p["norm2_bias"])
        h1 = _gelu_exact(y2 @ p["fc1_w"] + p["fc1_b"])
        h1 = _apply(h1, getm("mlp1", bi))
        h2 = h1 @ p["fc2_w"] + p["fc2_b"]
        h2 = _apply(h2, getm("mlp2", bi))
        x2 = x1 + _apply(h2, masks["dp2"][bi, 0, 0]
                         if masks.get("dp2") is not None else None)
        y3 = _stdln_fwd(x2, p["a2"], p["b2"])
        q2 = y3 @ p["l0_w"] + p["l0_b"]
        k2 = y3 @ p["l1_w"] + p["l1_b"]
        v2 = y3 @ p["l2_w"] + p["l2_b"]
        parts = []
        for hi in range(h):
            qh, kh, vh = (t[:, hi * d:(hi + 1) * d] for t in (q2, k2, v2))
            prob = jax.nn.softmax(qh @ kh.T * scale, axis=-1)
            prob = _apply(prob, getm("self", bi, hi))
            parts.append(prob @ vh)
        sa = jnp.concatenate(parts, -1) @ p["l3_w"] + p["l3_b"]
        outs.append(y3 + _apply(sa, getm("out", bi)))
    return jnp.stack(outs).astype(x.dtype)

"""Fully-fused MDR LBF layer for serving.

One MDR layer = joint->vertex cross-attention block (pre-LN, MLP) +
std-LayerNorm + vertex self-attention with residual
(reference: lib/models/MDR.py:139-153). The XLA path executes it as ~25
separate HBM-resident ops over [B, 448, 64] tensors; this kernel runs the
ENTIRE layer per G-sample tile inside VMEM — the token block is read from
HBM once and written once per layer.

Used by `gator_tpu.serving`; the math-identical XLA form (`lbf_layer_xla`)
is the CPU fallback and the test oracle. Serving is forward-only
(dropout-free), so no VJP is defined.

Row-wise LayerNorms commute with the verts/joints concat, so the kernel
never materializes the fused sequence: q comes from the normalized vertex
rows, k/v from the normalized joint rows.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAVE_PLTPU = False

# parameter keys of one LBF layer, in pallas_call argument order
LAYER_PARAM_KEYS = (
    "norm1_scale", "norm1_bias",
    "wq", "wk", "wv", "proj_w", "proj_b",
    "norm2_scale", "norm2_bias",
    "fc1_w", "fc1_b", "fc2_w", "fc2_b",
    "a2", "b2",
    "l0_w", "l0_b", "l1_w", "l1_b", "l2_w", "l2_b", "l3_w", "l3_b",
)


def _ln(x, scale, bias, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = ((x32 - mean) ** 2).mean(-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _stdln(x, a2, b2, eps=1e-6):
    x32 = x.astype(jnp.float32)
    n = x.shape[-1]
    mean = x32.mean(-1, keepdims=True)
    var = ((x32 - mean) ** 2).sum(-1, keepdims=True) / (n - 1)
    return a2 * (x32 - mean) / (jnp.sqrt(var) + eps) + b2


def _erf(x):
    """erf via the Abramowitz–Stegun 7.1.26 rational approximation (max abs
    error 1.5e-7): Mosaic has no erf/erfc primitive, and the serving path is
    bf16 (eps ~8e-3) so this is exact for all practical purposes."""
    p = 0.3275911
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    """Exact (erf-form) gelu, matching torch nn.GELU / the flax model."""
    x32 = x.astype(jnp.float32)
    return (0.5 * x32 * (1.0 + _erf(x32 * 0.7071067811865476))).astype(
        x.dtype)


def _heads(x, num_heads):
    return [x[:, h * (x.shape[1] // num_heads):
              (h + 1) * (x.shape[1] // num_heads)]
            for h in range(num_heads)]


def _layer_math(verts, joints, p, num_heads, dtype):
    """One LBF layer on [Nv, C] verts + [Nj, C] joints (single sample)."""
    c = verts.shape[-1]
    d = c // num_heads
    scale = d ** -0.5

    def mm(a, w):
        # Mosaic requires 32-bit matmul accumulation for bf16 operands
        return jnp.dot(a, w.astype(dtype),
                       preferred_element_type=jnp.float32).astype(dtype)

    yv = _ln(verts, p["norm1_scale"], p["norm1_bias"]).astype(dtype)
    yj = _ln(joints, p["norm1_scale"], p["norm1_bias"]).astype(dtype)
    q = mm(yv, p["wq"])
    k = mm(yj, p["wk"])
    v = mm(yj, p["wv"])
    outs = []
    for qh, kh, vh in zip(_heads(q, num_heads), _heads(k, num_heads),
                          _heads(v, num_heads)):
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        prob = jax.nn.softmax(s, axis=-1).astype(dtype)
        outs.append(jnp.dot(prob, vh, preferred_element_type=jnp.float32))
    attn = jnp.concatenate(outs, axis=-1).astype(dtype)
    attn = mm(attn, p["proj_w"]) + p["proj_b"].astype(dtype)
    x1 = verts.astype(jnp.float32) + attn.astype(jnp.float32)

    y2 = _ln(x1, p["norm2_scale"], p["norm2_bias"]).astype(dtype)
    m = _gelu_exact(mm(y2, p["fc1_w"]) + p["fc1_b"].astype(dtype))
    m = mm(m, p["fc2_w"]) + p["fc2_b"].astype(dtype)
    x2 = x1 + m.astype(jnp.float32)

    y3 = _stdln(x2, p["a2"], p["b2"]).astype(dtype)
    q2 = mm(y3, p["l0_w"]) + p["l0_b"].astype(dtype)
    k2 = mm(y3, p["l1_w"]) + p["l1_b"].astype(dtype)
    v2 = mm(y3, p["l2_w"]) + p["l2_b"].astype(dtype)
    outs = []
    for qh, kh, vh in zip(_heads(q2, num_heads), _heads(k2, num_heads),
                          _heads(v2, num_heads)):
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        prob = jax.nn.softmax(s, axis=-1).astype(dtype)
        outs.append(jnp.dot(prob, vh, preferred_element_type=jnp.float32))
    sa = jnp.concatenate(outs, axis=-1).astype(dtype)
    sa = mm(sa, p["l3_w"]) + p["l3_b"].astype(dtype)
    return (y3.astype(jnp.float32) + sa.astype(jnp.float32)).astype(dtype)


def lbf_layer_xla(verts, joints, params: Dict[str, jnp.ndarray],
                  num_heads: int) -> jnp.ndarray:
    """Reference XLA form, batched: verts [B, Nv, C], joints [B, Nj, C]."""
    dtype = verts.dtype
    fn = lambda vv, jj: _layer_math(vv, jj, params, num_heads, dtype)
    return jax.vmap(fn, in_axes=(0, 0))(verts, joints)


def _kernel(verts_ref, joints_ref, *rest, num_heads, dtype):
    p_refs = rest[:-1]
    out_ref = rest[-1]
    p = {key: ref[...] for key, ref in zip(LAYER_PARAM_KEYS, p_refs)}
    g_n = verts_ref.shape[0]
    for g in range(g_n):
        out_ref[g] = _layer_math(verts_ref[g], joints_ref[g], p,
                                 num_heads, dtype)


def lbf_layer_fused(verts, joints, params: Dict[str, jnp.ndarray],
                    num_heads: int, group: int = 8,
                    interpret: bool = False) -> jnp.ndarray:
    """Pallas form: one grid program per G samples, everything in VMEM."""
    b, nv, c = verts.shape
    nj = joints.shape[1]
    while group > 1 and b % group:
        group //= 2
    mspace = {} if interpret else {"memory_space": pltpu.VMEM}
    vspec = pl.BlockSpec((group, nv, c), lambda i: (i, 0, 0), **mspace)
    jspec = pl.BlockSpec((group, nj, c), lambda i: (i, 0, 0), **mspace)
    def _const_map(nd):
        return lambda i: (0,) * nd

    pspecs = [
        pl.BlockSpec(params[key].shape, _const_map(params[key].ndim),
                     **mspace)
        for key in LAYER_PARAM_KEYS
    ]
    kwargs = {} if interpret else {
        "compiler_params": pltpu.CompilerParams(
            dimension_semantics=("parallel",))}
    return pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, dtype=verts.dtype),
        grid=(b // group,),
        in_specs=[vspec, jspec] + pspecs,
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct(verts.shape, verts.dtype),
        interpret=interpret,
        **kwargs,
    )(verts, joints, *[params[k] for k in LAYER_PARAM_KEYS])


def lbf_layer(verts, joints, params: Dict[str, jnp.ndarray],
              num_heads: int) -> jnp.ndarray:
    """Platform-dispatched LBF layer (fused on TPU, XLA elsewhere)."""
    if not _HAVE_PLTPU:
        return lbf_layer_xla(verts, joints, params, num_heads)

    plist = [params[k] for k in LAYER_PARAM_KEYS]

    def tpu_fn(verts, joints, *plist):
        p = dict(zip(LAYER_PARAM_KEYS, plist))
        return lbf_layer_fused(verts, joints, p, num_heads)

    def other_fn(verts, joints, *plist):
        p = dict(zip(LAYER_PARAM_KEYS, plist))
        return lbf_layer_xla(verts, joints, p, num_heads)

    return jax.lax.platform_dependent(verts, joints, *plist,
                                      tpu=tpu_fn, default=other_fn)


def _round_up(n: int, mult: int) -> int:
    return -(-n // mult) * mult


# folded-weight keys for the stacked kernel, in pallas_call argument order;
# each array is stacked over layers along axis 0
STACK_PARAM_KEYS = (
    "norm1_scale", "norm1_bias",
    "wq", "wk", "wvp", "proj_b",
    "norm2_scale", "norm2_bias",
    "fc1_w", "fc1_b", "fc2_w", "fc2_b",
    "a2", "b2",
    "l0_w", "l0_b", "l1_w", "l1_b", "l23", "bias23",
)


def fold_stack_params(layer_params, num_heads: int,
                      dtype=jnp.bfloat16) -> Dict[str, jnp.ndarray]:
    """Stack per-layer LBF params over a leading layer axis and pre-fold
    the V projections so the attention output dots run at N=C instead of
    N=C/H followed by a K=C/H projection:

      cross:  o @ proj = sum_h prob_h @ (yj @ wv)[:, h] @ proj[h]
              -> prob_h @ (yj @ wvp_h),  wvp_h = wv[:, hD:] @ proj[hD:, :]
      self:   likewise l2/l3 fold into l23_h; their biases collapse into a
              constant row (softmax rows sum to 1): bias23 = l2_b@l3_w+l3_b.
    """
    c = layer_params[0]["wq"].shape[0]
    d = c // num_heads

    def fold(w_v, w_o):
        return jnp.stack([w_v[:, h * d:(h + 1) * d]
                          @ w_o[h * d:(h + 1) * d] for h in
                          range(num_heads)])            # [H, C, C]

    out = {}
    for key in STACK_PARAM_KEYS:
        if key == "wvp":
            arrs = [fold(p["wv"], p["proj_w"]) for p in layer_params]
        elif key == "l23":
            arrs = [fold(p["l2_w"], p["l3_w"]) for p in layer_params]
        elif key == "bias23":
            arrs = [p["l2_b"] @ p["l3_w"] + p["l3_b"]
                    for p in layer_params]
        else:
            arrs = [p[key] for p in layer_params]
        out[key] = jnp.stack([jnp.asarray(a, dtype) for a in arrs])
    return out


def _kernel_stack(verts_ref, joints_ref, *rest,
                  num_heads, dtype, g, nv, nj, nv0, nj0, n_layers):
    """ALL LBF layers in one program per G-sample tile.

    verts_ref [g*nv, C] (each sample padded from nv0=431 to nv=432 rows so
    per-sample slices stay sublane-aligned), joints_ref [g*nj, C]. The
    token tile is read from HBM once and written once for the whole stack.
    All linears run as single tile-wide matmuls; cross-attention is one
    block-diag-masked matmul pair per head; only the self-attention
    score/prob dots stay per-sample (a [g*nv, g*nv] tile would be ~47 MB).
    Attention masks are built from iota in-kernel (a [g*nv, g*nj] f32 mask
    input would re-stream ~1.9 MB per program).

    Pad-row handling: pad rows produce garbage activations, but they never
    leak into real rows — the only cross-row ops are the attentions, whose
    pad KEY columns are masked to -inf; pad QUERY rows only corrupt pad
    outputs, which the caller slices off.
    """
    p_refs = rest[:-1]
    out_ref = rest[-1]
    stacked = {key: ref[...] for key, ref in
               zip(STACK_PARAM_KEYS, p_refs)}
    x = verts_ref[...].astype(jnp.float32)
    joints2d = joints_ref[...]
    r, c = x.shape
    d = c // num_heads
    scale = d ** -0.5

    rowg = jax.lax.broadcasted_iota(jnp.int32, (r, g * nj), 0) // nv
    col = jax.lax.broadcasted_iota(jnp.int32, (r, g * nj), 1)
    # own-sample block AND real (non-pad) joint column
    on = (rowg == col // nj) & (col % nj < nj0)
    crossmask = jnp.where(on, 0.0, -1e9).astype(jnp.float32)
    padmask = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, nv), 1) < nv0,
        0.0, -1e9).astype(jnp.float32)

    def mm(a, w):
        return jnp.dot(a.astype(dtype), w.astype(dtype),
                       preferred_element_type=jnp.float32)

    for l in range(n_layers):
        p = {key: val[l] for key, val in stacked.items()}

        yv = _ln(x, p["norm1_scale"], p["norm1_bias"]).astype(dtype)
        yj = _ln(joints2d.astype(jnp.float32), p["norm1_scale"],
                 p["norm1_bias"]).astype(dtype)
        q = mm(yv, p["wq"])
        k = mm(yj, p["wk"])
        attn32 = jnp.zeros((r, c), jnp.float32)
        for h in range(num_heads):
            qh = q[:, h * d:(h + 1) * d].astype(dtype)
            kh = k[:, h * d:(h + 1) * d].astype(dtype)
            s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * scale + crossmask
            prob = jax.nn.softmax(s, axis=-1).astype(dtype)
            vp = mm(yj, p["wvp"][h])
            attn32 = attn32 + jnp.dot(prob, vp.astype(dtype),
                                      preferred_element_type=jnp.float32)
        x1 = x + attn32 + p["proj_b"].astype(jnp.float32)

        y2 = _ln(x1, p["norm2_scale"], p["norm2_bias"]).astype(dtype)
        m = _gelu_exact(mm(y2, p["fc1_w"])
                        + p["fc1_b"].astype(jnp.float32))
        m = mm(m.astype(dtype), p["fc2_w"]) + p["fc2_b"].astype(
            jnp.float32)
        x2 = x1 + m

        y3 = _stdln(x2, p["a2"], p["b2"])
        y3d = y3.astype(dtype)
        q2 = mm(y3d, p["l0_w"]) + p["l0_b"].astype(jnp.float32)
        k2 = mm(y3d, p["l1_w"]) + p["l1_b"].astype(jnp.float32)
        sa_rows = []
        vps = [mm(y3d, p["l23"][h]) for h in range(num_heads)]
        for gi in range(g):
            rows = slice(gi * nv, (gi + 1) * nv)
            sa32 = jnp.zeros((nv, c), jnp.float32)
            for h in range(num_heads):
                cols = slice(h * d, (h + 1) * d)
                qh = q2[rows, cols].astype(dtype)
                kh = k2[rows, cols].astype(dtype)
                s = jax.lax.dot_general(qh, kh,
                                        (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                s = s * scale + padmask
                prob = jax.nn.softmax(s, axis=-1).astype(dtype)
                sa32 = sa32 + jnp.dot(
                    prob, vps[h][rows].astype(dtype),
                    preferred_element_type=jnp.float32)
            sa_rows.append(sa32)
        sa = jnp.concatenate(sa_rows, axis=0)
        x = y3 + sa + p["bias23"].astype(jnp.float32)
    out_ref[...] = x.astype(out_ref.dtype)


def lbf_stack_fused(verts, joints, layer_params, num_heads: int,
                    group: int | None = None, layers_per_call: int = 1,
                    interpret: bool = False) -> jnp.ndarray:
    """Run the LBF stack as `ceil(L / layers_per_call)` pallas_calls.

    verts: [B, Nv, C], joints: [B, Nj, C]. Pads Nv (431->432) and Nj
    (17->24) up to 16/8-row multiples once so every per-sample slice and
    tile stays sublane-aligned, flattens sample and token axes together so
    every linear fills the MXU, and slices the pad rows off at the end.
    group=8 with one layer per call fits the 16 MB scoped-VMEM limit
    (3 layers in one g=8 program measured 19.4 MB and OOMed; g=4 fits but
    the halved tile costs more than the saved launches)."""
    b, nv0, c = verts.shape
    nj0 = joints.shape[1]
    dtype = verts.dtype
    if group is None:
        # g=8 bf16 measures best and fits the 16 MB scoped-VMEM limit;
        # f32 tiles are twice the bytes (g=8 f32 = 20.6 MB -> compile OOM)
        group = 4 if dtype == jnp.float32 else 8
    while group > 1 and b % group:
        group //= 2
    nv = _round_up(nv0, 16)
    nj = _round_up(nj0, 8)

    verts_p = jnp.pad(verts, ((0, 0), (0, nv - nv0), (0, 0)))
    v2d = verts_p.reshape(b * nv, c)
    j2d = jnp.pad(joints, ((0, 0), (0, nj - nj0), (0, 0))).reshape(
        b * nj, c)

    mspace = pltpu.VMEM if (_HAVE_PLTPU and not interpret) else None

    def _spec(shape, imap):
        if mspace is None:
            return pl.BlockSpec(shape, imap)
        return pl.BlockSpec(shape, imap, memory_space=mspace)

    vspec = _spec((group * nv, c), lambda i: (i, 0))
    jspec = _spec((group * nj, c), lambda i: (i, 0))

    def _const(shape):
        nd = len(shape)
        return _spec(shape, lambda i, nd=nd: (0,) * nd)

    for lo in range(0, len(layer_params), layers_per_call):
        chunk = layer_params[lo:lo + layers_per_call]
        folded = fold_stack_params(chunk, num_heads,
                                   dtype=dtype if dtype != jnp.float32
                                   else jnp.float32)
        plist = [folded[key] for key in STACK_PARAM_KEYS]
        kwargs = {}
        if not interpret and _HAVE_PLTPU:
            # grid programs are independent sample tiles: tell Mosaic so
            # it can pipeline block fetch/compute across programs
            kwargs["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel",))
        v2d = pl.pallas_call(
            functools.partial(_kernel_stack, num_heads=num_heads,
                              dtype=dtype, g=group, nv=nv, nj=nj,
                              nv0=nv0, nj0=nj0, n_layers=len(chunk)),
            grid=(b // group,),
            in_specs=[vspec, jspec] + [_const(a.shape) for a in plist],
            out_specs=vspec,
            out_shape=jax.ShapeDtypeStruct(v2d.shape, v2d.dtype),
            interpret=interpret,
            **kwargs,
        )(v2d, j2d, *plist)
    return v2d.reshape(b, nv, c)[:, :nv0]


def lbf_stack_xla(verts, joints, layer_params,
                  num_heads: int) -> jnp.ndarray:
    """Pure-XLA LBF stack — the kernel's math oracle, callable on ANY
    platform (the on-chip parity gate in bench.py runs it on the TPU
    against the fused form)."""
    for p in layer_params:
        verts = lbf_layer_xla(verts, joints, p, num_heads)
    return verts


def lbf_stack(verts, joints, layer_params, num_heads: int) -> jnp.ndarray:
    """Platform-dispatched LBF stack (one fused program on TPU, per-layer
    XLA elsewhere)."""
    def run_xla(verts, joints, *flat):
        k = len(LAYER_PARAM_KEYS)
        for i in range(len(layer_params)):
            p = dict(zip(LAYER_PARAM_KEYS, flat[i * k:(i + 1) * k]))
            verts = lbf_layer_xla(verts, joints, p, num_heads)
        return verts

    flat = [p[key] for p in layer_params for key in LAYER_PARAM_KEYS]
    if not _HAVE_PLTPU:
        return run_xla(verts, joints, *flat)

    def run_tpu(verts, joints, *flat):
        k = len(LAYER_PARAM_KEYS)
        ps = [dict(zip(LAYER_PARAM_KEYS, flat[i * k:(i + 1) * k]))
              for i in range(len(layer_params))]
        return lbf_stack_fused(verts, joints, ps, num_heads)

    return jax.lax.platform_dependent(verts, joints, *flat,
                                      tpu=run_tpu, default=run_xla)


def extract_layer_params(mdr_params: Dict, layer: int,
                         dtype=None) -> Dict[str, jnp.ndarray]:
    """Pull one LBF layer's weights out of the flax param tree (converter
    naming: encoder[_i], selfatt[_i], norm[_i])."""
    sfx = "" if layer == 0 else f"_{layer}"
    enc = mdr_params[f"encoder{sfx}"]
    sa = mdr_params[f"selfatt{sfx}"]
    nrm = mdr_params[f"norm{sfx}"]

    def dense(mod):
        return mod["linear"]["kernel"], mod["linear"]["bias"]

    out = {
        "norm1_scale": enc["norm1"]["scale"],
        "norm1_bias": enc["norm1"]["bias"],
        "wq": enc["attn"]["wq"]["linear"]["kernel"],
        "wk": enc["attn"]["wk"]["linear"]["kernel"],
        "wv": enc["attn"]["wv"]["linear"]["kernel"],
        "norm2_scale": enc["norm2"]["scale"],
        "norm2_bias": enc["norm2"]["bias"],
        "a2": nrm["a_2"],
        "b2": nrm["b_2"],
    }
    out["proj_w"], out["proj_b"] = dense(enc["attn"]["proj"])
    out["fc1_w"], out["fc1_b"] = dense(enc["mlp"]["fc1"])
    out["fc2_w"], out["fc2_b"] = dense(enc["mlp"]["fc2"])
    for i in range(4):
        out[f"l{i}_w"], out[f"l{i}_b"] = dense(sa[f"linears_{i}"])
    if dtype is not None:
        out = {k: jnp.asarray(v, dtype) for k, v in out.items()}
    return out

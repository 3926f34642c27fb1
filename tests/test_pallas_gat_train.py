"""Training GAT-block kernel: value + VJP parity (TPU-semantics
interpreter on CPU; same strategy as tests/test_pallas_mdr_train.py —
rate-0 exact vs the serving XLA block, all-keep masks vs the
explicit-mask oracle)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gator_tpu.nn import pallas_gat as pg
from gator_tpu.nn import pallas_gat_train as pgt
from gator_tpu.nn.pallas_mdr import _round_up

C, H, J = 64, 4, 17
CM = 4 * C
JP = _round_up(J, 32)
B = 4
ATTN, PROJ, MLP, PATH = 0.4, 0.4, 0.1, 0.2


def _block_params(seed=0):
    rng = np.random.default_rng(seed)

    def w(*shape):
        return jnp.asarray(rng.normal(0, 0.08, shape), jnp.float32)

    p = {
        "norm1_scale": 1.0 + w(C), "norm1_bias": w(C),
        "qkv_w": w(C, 3 * C), "qkv_b": w(3 * C),
        "proj_w": w(C, C), "proj_b": w(C),
        "gcn_w0": w(C, C), "gcn_w1": w(C, C),
        "gcn_m": w(J, C),
        "gcn_adj_diag": 1.0 + w(J, 1),
        "gcn_adj_off": w(J, J) * (1 - np.eye(J, dtype=np.float32)),
        "gcn_b": w(C),
        "x0_w": w(C, C), "x0_b": w(C), "x1_w": w(C, C), "x1_b": w(C),
        "back_w0": w(C, C), "back_w1": w(C, C), "back_b": w(C),
        "norm2_scale": 1.0 + w(C), "norm2_bias": w(C),
        "fc1_w": w(C, CM), "fc1_b": w(CM),
        "fc2_w": w(CM, C), "fc2_b": w(C),
    }
    return p


def _inputs(seed=1):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (B, J, C)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.3, (H, J, J)), jnp.float32)
    masks_xfeat = (rng.uniform(size=(2, J, J)) < 0.4).astype(np.float32)
    return x, bias, masks_xfeat


def _kernel_fn(bp, masks_xfeat, rates, seed=7):
    attn, proj, mlp, path = rates
    cfg = pgt.GatBlockCfg(num_heads=H, num_joint=J, block=0,
                          attn_rate=attn, proj_rate=proj, mlp_rate=mlp,
                          path_rate=path, interpret=True)
    m01 = jnp.pad(jnp.asarray(masks_xfeat, jnp.float32),
                  ((0, 0), (0, JP - J), (0, JP - J)))
    sd = jnp.asarray([seed], jnp.int32)

    def f(x, bias, *plist_flat):
        bp2 = dict(zip(pg.BLOCK_PARAM_KEYS, plist_flat))
        bias_p = jnp.pad(bias, ((0, 0), (0, JP - J), (0, JP - J)))
        plist = pgt.prep_block_params(bp2, JP, C)
        return pgt.gat_block_train(cfg, sd, x, bias_p, m01[0], m01[1],
                                   *plist)

    return f


def _flat(bp):
    return [bp[k] for k in pg.BLOCK_PARAM_KEYS]


def test_rate0_forward_matches_serving_xla():
    bp = _block_params()
    x, bias, mx = _inputs()
    f = _kernel_fn(bp, mx, (0.0, 0.0, 0.0, 0.0))
    got = f(x, bias, *_flat(bp))
    want = pg.gat_block_xla(x, bias, bp, mx, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5)


def test_rate0_vjp_matches_serving_xla():
    bp = _block_params()
    x, bias, mx = _inputs()
    f = _kernel_fn(bp, mx, (0.0, 0.0, 0.0, 0.0))
    cot = jnp.asarray(
        np.random.default_rng(3).normal(0, 1, (B, J, C)), jnp.float32)

    _, vjp = jax.vjp(f, x, bias, *_flat(bp))
    got = vjp(cot)

    def ref(x, bias, *plist):
        bp2 = dict(zip(pg.BLOCK_PARAM_KEYS, plist))
        return pg.gat_block_xla(x, bias, bp2, mx, H)

    _, rvjp = jax.vjp(ref, x, bias, *_flat(bp))
    want = rvjp(cot)

    for name, a, b in zip(("dx", "dbias") + pg.BLOCK_PARAM_KEYS, got,
                          want):
        a, b = np.asarray(a), np.asarray(b)
        if name == "qkv_b":
            keep = np.ones(a.shape, bool)
            keep[C:2 * C] = False       # zero-true-grad key bias slice
            a, b = a[keep], b[keep]
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-4,
                                   err_msg=f"cotangent {name}")


def _allkeep_masks():
    def full(shape, rate):
        return jnp.full(shape, 1.0 / (1.0 - rate), jnp.float32)

    return {
        "attn": full((B, H, J, J), ATTN),
        "proj": full((B, J, C), PROJ),
        "dp1": full((B, 1, 1), PATH),
        "mlp1": full((B, J, CM), MLP),
        "mlp2": full((B, J, C), MLP),
        "dp2": full((B, 1, 1), PATH),
    }


def test_dropout_scales_match_explicit_mask_oracle():
    """Default rates + the interpreter's all-keep masks: forward AND VJP
    vs the explicit-mask oracle (every 1/keep factor, DropPath placement
    and the attn/proj/mlp rate split are load-bearing)."""
    bp = _block_params()
    x, bias, mx = _inputs()
    f = _kernel_fn(bp, mx, (ATTN, PROJ, MLP, PATH))
    masks = _allkeep_masks()
    cot = jnp.asarray(
        np.random.default_rng(5).normal(0, 1, (B, J, C)), jnp.float32)

    got_out, vjp = jax.vjp(f, x, bias, *_flat(bp))
    got = vjp(cot)

    def ref(x, bias, *plist):
        bp2 = dict(zip(pg.BLOCK_PARAM_KEYS, plist))
        return pgt.gat_block_train_ref(x, bias, bp2, mx, masks, H)

    want_out, rvjp = jax.vjp(ref, x, bias, *_flat(bp))
    want = rvjp(cot)

    np.testing.assert_allclose(np.asarray(got_out),
                               np.asarray(want_out), atol=3e-5)
    for name, a, b in zip(("dx", "dbias") + pg.BLOCK_PARAM_KEYS, got,
                          want):
        a, b = np.asarray(a), np.asarray(b)
        if name == "qkv_b":
            keep = np.ones(a.shape, bool)
            keep[C:2 * C] = False
            a, b = a[keep], b[keep]
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-4,
                                   err_msg=f"cotangent {name}")


def test_trunk_rate0_matches_serving_trunk():
    bps = [_block_params(s) for s in range(2)]
    x, bias, mx = _inputs()
    got = pgt.gat_trunk_train(
        x, bias, bps, mx, H, jnp.asarray([3], jnp.int32),
        attn_rate=0.0, proj_rate=0.0, mlp_rate=0.0, drop_path_rate=0.0,
        interpret=True)
    want = pg.gat_blocks_xla(x, bias, bps, mx, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5)

"""Training LBF kernel: value + VJP parity.

Runs the fused fwd/bwd kernels through the TPU-semantics interpreter
(pltpu.InterpretParams) on CPU. Two facts make the tests exact:
  * with all rates 0 the kernel takes no PRNG draws — it must match the
    serving XLA layer (`lbf_layer_xla`) and its jax.vjp bit-closely;
  * the interpreter's PRNG emits all-zero bits, so every generated keep
    mask is the constant 1/keep — reproducible in the explicit-mask
    oracle (`lbf_layer_train_ref`), whose jax.vjp then checks the
    hand-derived backward INCLUDING every dropout/droppath scale factor.
On-chip mask statistics + fwd/bwd mask consistency are covered by the
finite-difference gate in tools/check_train_kernel_tpu.py (real PRNG).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gator_tpu.nn import pallas_mdr as pm
from gator_tpu.nn import pallas_mdr_train as pmt

C, CM, H = 64, 256, 2
NV, NJ = 37, 5
B = 4


def _params(seed=0):
    rng = np.random.default_rng(seed)

    def w(*shape):
        return jnp.asarray(rng.normal(0, 0.08, shape), jnp.float32)

    p = {
        "norm1_scale": 1.0 + w(C), "norm1_bias": w(C),
        "wq": w(C, C), "wk": w(C, C), "wv": w(C, C),
        "proj_w": w(C, C), "proj_b": w(C),
        "norm2_scale": 1.0 + w(C), "norm2_bias": w(C),
        "fc1_w": w(C, CM), "fc1_b": w(CM),
        "fc2_w": w(CM, C), "fc2_b": w(C),
        "a2": 1.0 + w(C), "b2": w(C),
    }
    for i in range(4):
        p[f"l{i}_w"] = w(C, C)
        p[f"l{i}_b"] = w(C)
    return p


def _inputs(seed=1):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (B, NV, C)), jnp.float32)
    jt = jnp.asarray(rng.normal(0, 1, (B, NJ, C)), jnp.float32)
    return x, jt


def _run_train(x, jt, p, rates, seed=7):
    cfg = pmt.TrainLayerCfg(num_heads=H, nv0=NV, nj0=NJ, layer=0,
                            rates=rates, interpret=True)
    plist = [p[k] for k in pm.LAYER_PARAM_KEYS]
    return pmt.lbf_layer_train(cfg, jnp.asarray([seed], jnp.int32),
                               x, jt, *plist)


def test_rate0_forward_matches_serving_xla():
    p = _params()
    x, jt = _inputs()
    got = _run_train(x, jt, p, pmt.ZERO_RATES)
    want = pm.lbf_layer_xla(x, jt, p, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)


def test_rate0_vjp_matches_serving_xla():
    p = _params()
    x, jt = _inputs()
    plist = [p[k] for k in pm.LAYER_PARAM_KEYS]
    cot = jnp.asarray(
        np.random.default_rng(3).normal(0, 1, (B, NV, C)), jnp.float32)

    cfg = pmt.TrainLayerCfg(num_heads=H, nv0=NV, nj0=NJ, layer=0,
                            rates=pmt.ZERO_RATES, interpret=True)
    seed = jnp.asarray([7], jnp.int32)
    _, vjp = jax.vjp(
        lambda x, jt, *pl_: pmt.lbf_layer_train(cfg, seed, x, jt, *pl_),
        x, jt, *plist)
    got = vjp(cot)

    def ref(x, jt, *pl_):
        pd = dict(zip(pm.LAYER_PARAM_KEYS, pl_))
        return pm.lbf_layer_xla(x, jt, pd, H)

    _, rvjp = jax.vjp(ref, x, jt, *plist)
    want = rvjp(cot)

    for name, g, w_ in zip(("dx", "djt") + pm.LAYER_PARAM_KEYS, got,
                           want):
        if name == "l1_b":
            # key-projection bias: softmax is invariant to a uniform key
            # shift, so the TRUE gradient is zero and both sides emit only
            # rounding noise (see test_training_parity._zero_grad_mask)
            assert float(jnp.abs(g).max()) < 1e-5
            continue
        scale = max(float(jnp.abs(w_).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(g) / scale, np.asarray(w_) / scale, atol=5e-5,
            err_msg=f"cotangent {name}")


def _allkeep_masks(rates):
    """The interpreter PRNG emits zero bits -> every mask keeps every
    element, scaled 1/keep. Reproduce that as explicit mask arrays."""
    r_attn, r_proj, r_path, r_mlp, r_self, r_out = rates

    def full(shape, rate):
        if rate == 0.0:
            return None
        return jnp.full(shape, 1.0 / (1.0 - rate), jnp.float32)

    return {
        "attn": full((B, H, NV, NJ), r_attn),
        "proj": full((B, NV, C), r_proj),
        "dp1": full((B, 1, 1), r_path),
        "mlp1": full((B, NV, CM), r_mlp),
        "mlp2": full((B, NV, C), r_mlp),
        "dp2": full((B, 1, 1), r_path),
        "self": full((B, H, NV, NV), r_self),
        "out": full((B, NV, C), r_out),
    }


def test_dropout_scales_match_explicit_mask_oracle():
    """Default rates, all-keep masks: forward AND the hand-derived VJP
    must match the jnp oracle driven with identical masks — every 1/keep
    factor and DropPath placement is load-bearing here."""
    p = _params()
    x, jt = _inputs()
    plist = [p[k] for k in pm.LAYER_PARAM_KEYS]
    masks = _allkeep_masks(pmt.DEFAULT_RATES)
    cot = jnp.asarray(
        np.random.default_rng(5).normal(0, 1, (B, NV, C)), jnp.float32)

    cfg = pmt.TrainLayerCfg(num_heads=H, nv0=NV, nj0=NJ, layer=0,
                            rates=pmt.DEFAULT_RATES, interpret=True)
    seed = jnp.asarray([7], jnp.int32)
    got_out, vjp = jax.vjp(
        lambda x, jt, *pl_: pmt.lbf_layer_train(cfg, seed, x, jt, *pl_),
        x, jt, *plist)
    got = vjp(cot)

    def ref(x, jt, *pl_):
        pd = dict(zip(pm.LAYER_PARAM_KEYS, pl_))
        return pmt.lbf_layer_train_ref(x, jt, pd, masks, H)

    want_out, rvjp = jax.vjp(ref, x, jt, *plist)
    want = rvjp(cot)

    np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out),
                               atol=2e-5)
    for name, g, w_ in zip(("dx", "djt") + pm.LAYER_PARAM_KEYS, got,
                           want):
        if name == "l1_b":
            # key-projection bias: softmax is invariant to a uniform key
            # shift, so the TRUE gradient is zero and both sides emit only
            # rounding noise (see test_training_parity._zero_grad_mask)
            assert float(jnp.abs(g).max()) < 1e-5
            continue
        scale = max(float(jnp.abs(w_).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(g) / scale, np.asarray(w_) / scale, atol=5e-5,
            err_msg=f"cotangent {name}")


def test_stack_rate0_matches_serving_stack():
    ps = [_params(s) for s in range(3)]
    x, jt = _inputs()
    got = pmt.lbf_stack_train(x, jt, ps, H,
                              jnp.asarray([3], jnp.int32),
                              rates=pmt.ZERO_RATES, interpret=True)
    want = pm.lbf_stack_xla(x, jt, ps, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5)


def test_stack_joint_grads_accumulate_across_layers():
    """jt feeds all 3 layers; its cotangent must be the sum of per-layer
    contributions (checked against jax.grad of the XLA stack)."""
    ps = [_params(s) for s in range(3)]
    x, jt = _inputs()

    def f_train(jt):
        out = pmt.lbf_stack_train(x, jt, ps, H,
                                  jnp.asarray([3], jnp.int32),
                                  rates=pmt.ZERO_RATES, interpret=True)
        return (out ** 2).sum()

    def f_ref(jt):
        return (pm.lbf_stack_xla(x, jt, ps, H) ** 2).sum()

    g = jax.grad(f_train)(jt)
    w = jax.grad(f_ref)(jt)
    scale = float(jnp.abs(w).max())
    np.testing.assert_allclose(np.asarray(g) / scale,
                               np.asarray(w) / scale, atol=1e-4)

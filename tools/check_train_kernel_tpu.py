"""On-chip gate for the LBF TRAINING kernels (real Mosaic lowering + real
PRNG — the CPU interpreter emits zero random bits, so mask statistics and
fwd/bwd mask consistency can only be proven here).

Checks, at real layer sizes (Nv=431, Nj=17, C=64, H=2):
  1. determinism: same seed -> bit-identical output; different seed ->
     different output;
  2. dropout actually drops: output differs from the rate-0 output, and
     the expected-value property holds (mean over many seeds approaches
     the rate-0 forward);
  3. finite differences: the custom VJP's directional derivatives match
     (f(x+eps d) - f(x-eps d)) / 2eps against random directions for x,
     joints, and a weight matrix — WITH nonzero rates, which proves the
     backward kernel regenerates the forward's exact masks.

Run: python tools/check_train_kernel_tpu.py   (on the TPU host)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from gator_tpu.nn import pallas_mdr as pm
from gator_tpu.nn import pallas_mdr_train as pmt

C, CM, H = 64, 256, 2
NV, NJ, B = 431, 17, 8


def _params(seed=0):
    rng = np.random.default_rng(seed)

    def w(*shape):
        return jnp.asarray(rng.normal(0, 0.08, shape), jnp.float32)

    p = {"norm1_scale": 1.0 + w(C), "norm1_bias": w(C),
         "wq": w(C, C), "wk": w(C, C), "wv": w(C, C),
         "proj_w": w(C, C), "proj_b": w(C),
         "norm2_scale": 1.0 + w(C), "norm2_bias": w(C),
         "fc1_w": w(C, CM), "fc1_b": w(CM),
         "fc2_w": w(CM, C), "fc2_b": w(C),
         "a2": 1.0 + w(C), "b2": w(C)}
    for i in range(4):
        p[f"l{i}_w"] = w(C, C)
        p[f"l{i}_b"] = w(C)
    return p


def main():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (B, NV, C)), jnp.float32)
    jt = jnp.asarray(rng.normal(0, 1, (B, NJ, C)), jnp.float32)
    p = _params()
    plist = [p[k] for k in pm.LAYER_PARAM_KEYS]

    def run(seed, rates):
        cfg = pmt.TrainLayerCfg(num_heads=H, nv0=NV, nj0=NJ, layer=0,
                                rates=rates)
        return pmt.lbf_layer_train(cfg, jnp.asarray([seed], jnp.int32),
                                   x, jt, *plist)

    run_j = jax.jit(run, static_argnums=(1,))

    # 1. determinism
    o1 = np.asarray(run_j(7, pmt.DEFAULT_RATES))
    o2 = np.asarray(run_j(7, pmt.DEFAULT_RATES))
    o3 = np.asarray(run_j(8, pmt.DEFAULT_RATES))
    assert np.array_equal(o1, o2), "same seed must be bit-identical"
    assert not np.array_equal(o1, o3), "different seed must differ"
    print("determinism: ok")

    # 2. dropout is live and mean-preserving
    o0 = np.asarray(run_j(7, pmt.ZERO_RATES))
    assert not np.allclose(o1, o0, atol=1e-4), "dropout must act"
    n_seeds = 24
    acc = np.zeros_like(o0)
    for s in range(n_seeds):
        acc += np.asarray(run_j(100 + s, pmt.DEFAULT_RATES))
    mean_dev = np.abs(acc / n_seeds - o0).mean() / max(
        np.abs(o0).mean(), 1e-6)
    print(f"dropout live: ok; E[out] rel dev over {n_seeds} seeds: "
          f"{mean_dev:.3f} (stochastic; expect O(1/sqrt(n)))")

    # 3. finite differences THROUGH the dropout masks
    seed = jnp.asarray([7], jnp.int32)
    cfg = pmt.TrainLayerCfg(num_heads=H, nv0=NV, nj0=NJ, layer=0,
                            rates=pmt.DEFAULT_RATES)

    def f(x_, jt_, w_):
        pl2 = list(plist)
        pl2[pm.LAYER_PARAM_KEYS.index("fc1_w")] = w_
        return pmt.lbf_layer_train(cfg, seed, x_, jt_, *pl2)

    cot = jnp.asarray(rng.normal(0, 1, (B, NV, C)), jnp.float32)
    _, vjp = jax.vjp(f, x, jt, p["fc1_w"])
    gx, gj, gw = jax.jit(vjp)(cot)

    fj = jax.jit(f)
    for name, primal, grad in (("x", x, gx), ("joints", jt, gj),
                               ("fc1_w", p["fc1_w"], gw)):
        d = jnp.asarray(rng.normal(0, 1, primal.shape), jnp.float32)
        eps = 1e-2
        args = {"x": (x, jt, p["fc1_w"]), "joints": (x, jt, p["fc1_w"]),
                "fc1_w": (x, jt, p["fc1_w"])}[name]
        idx = ("x", "joints", "fc1_w").index(name)
        plus = [a if i != idx else a + eps * d for i, a in
                enumerate(args)]
        minus = [a if i != idx else a - eps * d for i, a in
                 enumerate(args)]
        fd = (np.asarray(fj(*plus)).astype(np.float64)
              - np.asarray(fj(*minus)).astype(np.float64)) / (2 * eps)
        lhs = float((fd * np.asarray(cot)).sum())
        rhs = float((np.asarray(grad).astype(np.float64)
                     * np.asarray(d)).sum())
        rel = abs(lhs - rhs) / max(abs(rhs), 1e-6)
        print(f"fd[{name}]: directional fd={lhs:.6g} vjp={rhs:.6g} "
              f"rel={rel:.2e}")
        assert rel < 2e-2, f"fd mismatch for {name}"
    print("ALL TRAIN-KERNEL ON-CHIP CHECKS PASSED")


if __name__ == "__main__":
    main()

"""On-chip ablation of the in-step detector-noise synthesizer
(`data/device_noise.synthesize_pose_device`) — the 4.1 ms/step (B=512)
the detector-input recipe pays over the GT-input one (PERFORMANCE.md,
det-input table). Measures every cheap lever before (or instead of)
reaching for a Pallas rewrite:

  * batch scaling 512 / 1024 / 4096 (is the cost fixed-overhead or
    per-element? decides whether hoisting the synthesis out of the
    K-step scan into one per-dispatch call pays),
  * candidate/distance math in bf16 (halves the [B,9,K{,2}] HBM
    traffic; acceptance tests are >/<= against OKS radii of tens of
    pixels, so bf16's ~3 significant digits moves state frequencies
    far below the 0.01 distribution-gate bar — verified by the
    moment check below),
  * gumbel-style uniform-among-accepted pick (argmax(u*mask) instead
    of cumsum+eq+argmax: one [B,m,K] draw replaces two K-axis passes),
  * components: annulus+mask only (no picks), RNG draws only.

Every variant is held to a quick on-chip distribution check (state-band
frequencies vs the shipped form at B=4096, same bars as
tests/test_device_noise.py) before its time is reported.

Methodology: serial-dependency lax.fori_loop on device, two loop
lengths, scalar-fetch sync (bench.py Methodology — the relay makes
per-dispatch timing unreliable).

Run on the TPU:  python tools/exp_noise_ablate.py \
                     [--out artifacts/noise_ablation.json]

OUTCOME (round 5, artifacts/noise_ablation.json): cost is linear in B
(no fixed overhead -> hoisting out of the K-step scan buys nothing);
bf16 is SLOWER at B<=1024 (conversion overhead) and distribution-
suspect; the gumbel-style pick is 17% faster and the SAME law — it
SHIPPED as device_noise._pick (so "shipped_f32" now measures the gumbel
form and the `gumbel_pick` variant coincides with it; `make_variant
(gumbel_pick=False)` reproduces the legacy cumsum pick).

Reference behavior being reproduced: lib/noise_utils.py:17-285 (see
data/device_noise.py for the wave decomposition).
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

from gator_tpu.cli._cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from gator_tpu.data.device_noise import (_WAVE1, _WAVE2,  # noqa: E402
                                         synthesize_pose_device)
from gator_tpu.data.noise import (_INV_P, _JIT_HIGH, _JIT_LOW,  # noqa: E402
                                  _MISS_HIGH, _MISS_LOW, _MISS_MID, _PAIR,
                                  KPS_SIGMAS, NUM_KPS)


def make_variant(dtype=jnp.float32, gumbel_pick=False):
    """A parameterized copy of synthesize_pose_device: `dtype` is the
    candidate/distance working precision; `gumbel_pick` selects
    uniform-among-accepted via argmax(u * mask) (a different draw of the
    SAME law) instead of the shipped cumsum indexing."""

    def _annulus(key, centers, r_lo, r_hi, k, reject, reject_r):
        shp = centers.shape[:-1]
        ka, kr = jax.random.split(key)
        ang = jax.random.uniform(ka, (*shp, k), dtype,
                                 maxval=2 * np.pi)
        r = (jax.random.uniform(kr, (*shp, k), dtype)
             * (r_hi - r_lo).astype(dtype)[..., None]
             + r_lo.astype(dtype)[..., None])
        pts = centers.astype(dtype)[..., None, :] + jnp.stack(
            [r * jnp.cos(ang), r * jnp.sin(ang)], axis=-1)
        mask = jnp.ones((*shp, k), bool)
        for other, ovalid in reject:
            d = jnp.linalg.norm(pts - other.astype(dtype)[..., None, :],
                                axis=-1)
            rr = r if reject_r is None else reject_r.astype(
                dtype)[..., None]
            mask &= jnp.where(ovalid[..., None], d > rr, True)
        return pts, mask

    def _pick(key, pts, mask):
        if gumbel_pick:
            u = jax.random.uniform(key, mask.shape, dtype)
            sel = jnp.argmax(jnp.where(mask, u, -1.0), axis=-1)
            pt = jnp.take_along_axis(pts, sel[..., None, None],
                                     axis=-2)[..., 0, :]
            return pt, mask.any(-1)
        cnt = mask.sum(-1)
        u = jax.random.uniform(key, cnt.shape)
        m = jnp.minimum((u * jnp.maximum(cnt, 1)).astype(jnp.int32),
                        jnp.maximum(cnt - 1, 0))
        csum = jnp.cumsum(mask, axis=-1)
        sel = jnp.argmax(csum == (m + 1)[..., None], axis=-1)
        pt = jnp.take_along_axis(pts, sel[..., None, None],
                                 axis=-2)[..., 0, :]
        return pt, cnt > 0

    def synth_fn(key, joints, areas, k=256, k_miss=512):
        b = joints.shape[0]
        valid = jnp.ones((b, NUM_KPS), bool)
        variances = jnp.asarray((KPS_SIGMAS * 2) ** 2, jnp.float32)

        def ks_dist(ks):
            return jnp.sqrt(-2.0 * areas[:, None] * variances[None]
                            * np.log(ks)).astype(jnp.float32)

        ks10, ks50, ks85 = ks_dist(0.10), ks_dist(0.50), ks_dist(0.85)
        synth = joints.astype(jnp.float32)
        num_valid = valid.sum(-1)[:, None]
        jit_low, jit_high = jnp.asarray(_JIT_LOW), jnp.asarray(_JIT_HIGH)
        miss_low, miss_mid = jnp.asarray(_MISS_LOW), jnp.asarray(_MISS_MID)
        miss_high = jnp.asarray(_MISS_HIGH)
        inv_tbl = jnp.asarray(np.asarray(_INV_P, np.float32))

        for w, J in enumerate((_WAVE1, _WAVE2)):
            kw = jax.random.fold_in(key, w)
            ks = jax.random.split(kw, 12)
            m = len(J)
            gt = synth[:, J]
            P = _PAIR[J]
            p_safe = np.where(P < 0, 0, P)
            has_pair = jnp.asarray(P >= 0)[None]
            pair_valid = valid[:, p_safe] & has_pair
            pair_pos = jnp.where(has_pair[..., None], synth[:, p_safe],
                                 0.0)
            ones = jnp.ones((b, m), bool)

            jitter_p = jnp.where(num_valid <= 10, jit_low[J][None],
                                 jit_high[J][None])
            miss_p = jnp.where(
                num_valid <= 5, miss_low[J][None],
                jnp.where(num_valid <= 10, miss_mid[J][None],
                          miss_high[J][None]))
            inv_p = jnp.broadcast_to(inv_tbl[J][None], (b, m))
            ks85w, ks50w, ks10w = ks85[:, J], ks50[:, J], ks10[:, J]
            zeros_r = jnp.zeros((b, m), jnp.float32)

            jit_pt, jit_ok = _pick(ks[0], *_annulus(
                ks[1], gt, ks85w, ks50w, k, [(pair_pos, pair_valid)],
                None))
            good_pt, good_ok = _pick(ks[2], *_annulus(
                ks[3], gt, zeros_r, ks85w, k, [(pair_pos, pair_valid)],
                None))
            inv_pt, inv_ok = _pick(ks[4], *_annulus(
                ks[5], pair_pos, zeros_r, ks50w, k, [(gt, ones)], None))
            inv_ok &= pair_valid

            mg_pts, mg_m = _annulus(
                ks[6], gt, ks50w, ks10w, k_miss,
                [(pair_pos, pair_valid)], ks50w)
            mp_pts, mp_m = _annulus(
                ks[7], pair_pos, ks50w, ks10w, k_miss, [(gt, ones)],
                ks50w)
            mp_m &= pair_valid[..., None]
            n_g = mg_m.sum(-1)
            n_p = mp_m.sum(-1)
            w_p = jnp.floor(n_p / 4.0)
            total = n_g + w_p
            take_pair = (jax.random.uniform(ks[8], (b, m))
                         * jnp.maximum(total, 1e-9)) < w_p
            mg_pt, _ = _pick(ks[9], mg_pts, mg_m)
            mp_pt, _ = _pick(ks[10], mp_pts, mp_m)
            miss_pt = jnp.where(take_pair[..., None], mp_pt, mg_pt)
            miss_ok = total > 0

            good_p = 1.0 - (jitter_p + miss_p + inv_p)
            probs = jnp.stack([jitter_p * jit_ok, miss_p * miss_ok,
                               inv_p * inv_ok, good_p * good_ok],
                              axis=-1)
            z = probs.sum(-1)
            u = jax.random.uniform(ks[11], (b, m)) * jnp.maximum(z, 1e-12)
            state = jnp.minimum(
                (u[..., None] >= jnp.cumsum(probs, -1)).sum(-1), 3)
            cand = jnp.stack([jit_pt.astype(jnp.float32),
                              miss_pt.astype(jnp.float32),
                              inv_pt.astype(jnp.float32),
                              good_pt.astype(jnp.float32)], axis=2)
            chosen = jnp.take_along_axis(cand, state[..., None, None],
                                         axis=2)[:, :, 0]
            dead = z <= 0
            synth = synth.at[:, J].set(
                jnp.where(dead[..., None], 0.0, chosen))
        return synth

    return synth_fn


def make_components():
    """Component slices: annulus+mask only (skips all picks and the state
    machine) and RNG-draws only (the threefry share)."""

    def annulus_only(key, joints, areas, k=256, k_miss=512):
        variances = jnp.asarray((KPS_SIGMAS * 2) ** 2, jnp.float32)
        ks50 = jnp.sqrt(-2.0 * areas[:, None] * variances[None]
                        * np.log(0.50))
        acc = jnp.zeros((), jnp.float32)
        for w, J in enumerate((_WAVE1, _WAVE2)):
            kw = jax.random.fold_in(key, w)
            ks = jax.random.split(kw, 6)
            gt = joints[:, J]
            m = len(J)
            b = joints.shape[0]
            for i, kk in enumerate((k, k, k, k_miss, k_miss)):
                ka, kr = jax.random.split(ks[i])
                ang = jax.random.uniform(ka, (b, m, kk),
                                         maxval=2 * np.pi)
                r = jax.random.uniform(kr, (b, m, kk)) \
                    * ks50[:, J][..., None]
                pts = gt[..., None, :] + jnp.stack(
                    [r * jnp.cos(ang), r * jnp.sin(ang)], axis=-1)
                d = jnp.linalg.norm(pts - gt[..., None, :], axis=-1)
                acc += (d > r).sum()
        return joints + acc * 1e-20

    def rng_only(key, joints, areas, k=256, k_miss=512):
        acc = jnp.zeros((), jnp.float32)
        b = joints.shape[0]
        for w, J in enumerate((_WAVE1, _WAVE2)):
            kw = jax.random.fold_in(key, w)
            ks = jax.random.split(kw, 6)
            m = len(J)
            for i, kk in enumerate((k, k, k, k_miss, k_miss)):
                ka, kr = jax.random.split(ks[i])
                acc += jax.random.uniform(ka, (b, m, kk)).sum()
                acc += jax.random.uniform(kr, (b, m, kk)).sum()
        return joints + acc * 1e-20

    return annulus_only, rng_only


def band_freqs(out, gt, areas):
    var = (KPS_SIGMAS * 2) ** 2
    ks85 = np.sqrt(-2 * areas[:, None] * var[None] * np.log(0.85))
    ks50 = np.sqrt(-2 * areas[:, None] * var[None] * np.log(0.50))
    r = np.linalg.norm(out - gt, axis=-1)
    return np.stack([(r <= ks85).mean(0),
                     ((r > ks85) & (r <= ks50)).mean(0),
                     (r > ks50).mean(0)], axis=1)


def make_inputs(b, seed=0):
    rng = np.random.default_rng(seed)
    base = np.array([
        [144, 60], [134, 50], [154, 50], [120, 55], [168, 55],
        [100, 120], [188, 120], [90, 190], [198, 190], [85, 250],
        [203, 250], [115, 210], [173, 210], [110, 290], [178, 290],
        [105, 360], [183, 360]], np.float32)
    joints = base[None] + rng.normal(0, 4.0, (b, 17, 2)).astype(
        np.float32)
    areas = np.full(b, 30000.0, np.float32)
    return jnp.asarray(joints), jnp.asarray(areas)


def time_fn(fn, b, l_short=2, l_long=10):
    """Serial-dependency fori_loop per-call time (ms)."""
    joints, areas = make_inputs(b)
    key = jax.random.PRNGKey(0)

    @functools.partial(jax.jit, static_argnums=1)
    def loop(j0, n):
        def body(i, j):
            out = fn(jax.random.fold_in(key, i), j, areas)
            # serial dependency without drifting out of crop space
            return j + (out.sum() * 1e-20)
        return lax.fori_loop(0, n, body, j0).sum()

    def run(n):
        t0 = time.perf_counter()
        float(loop(joints, n))
        return time.perf_counter() - t0

    run(l_short); run(l_long)                       # compile both
    ts = min(run(l_short) for _ in range(2))
    tl = min(run(l_long) for _ in range(2))
    return (tl - ts) / (l_long - l_short) * 1e3


def check_distribution(fn, ref_fn, b=4096):
    """Max |Δ band frequency| between fn and the shipped form."""
    joints, areas = make_inputs(b, seed=3)
    out = np.asarray(jax.jit(fn)(jax.random.PRNGKey(5), joints, areas))
    ref = np.asarray(jax.jit(ref_fn)(jax.random.PRNGKey(6), joints,
                                     areas))
    j = np.asarray(joints)
    a = np.asarray(areas)
    return float(np.abs(band_freqs(out, j, a)
                        - band_freqs(ref, j, a)).max())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str,
                    default="artifacts/noise_ablation.json")
    args = ap.parse_args()
    print("device:", jax.devices()[0].platform)

    shipped = lambda key, j, a: synthesize_pose_device(key, j, a)  # noqa
    variants = {
        "shipped_f32": shipped,
        "bf16": make_variant(jnp.bfloat16),
        "gumbel_pick": make_variant(jnp.float32, gumbel_pick=True),
        "bf16_gumbel": make_variant(jnp.bfloat16, gumbel_pick=True),
    }
    annulus_only, rng_only = make_components()
    components = {"annulus_mask_only": annulus_only,
                  "rng_draws_only": rng_only}

    results = {"times_ms": {}, "dist_max_band_diff": {}}
    for b in (512, 1024, 4096):
        for name, fn in {**variants, **components}.items():
            t = time_fn(fn, b)
            results["times_ms"][f"{name}_b{b}"] = round(t, 3)
            print(f"{name:20s} B={b:5d}: {t:7.3f} ms "
                  f"({b / t * 1e3:9.0f} poses/s)")
    for name, fn in variants.items():
        if name == "shipped_f32":
            continue
        d = check_distribution(fn, shipped)
        results["dist_max_band_diff"][name] = round(d, 5)
        print(f"{name:20s} max band-freq diff vs shipped: {d:.5f} "
              f"({'OK' if d < 0.02 else 'SUSPECT'})")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("->", args.out)


if __name__ == "__main__":
    main()

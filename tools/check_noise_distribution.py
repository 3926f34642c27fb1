"""One-shot statistical gate for the batched detector-noise simulator
(VERDICT r3 item 7): `noise.synthesize_pose_batch` carries two documented
deviations from the scalar oracle (candidate counts k=256/512 vs the
scalar's 125-2000, and the floor(n/4) pair-resample weighting realized as
a weighted center pick). This tool turns the "rare-event-only" argument
into numbers: at recipe-representative OKS areas it draws N poses from
both forms and compares

  * per-state frequencies (good / jitter / miss / inversion / dropped,
    classified from the synthesized point's distance to the GT and to the
    symmetric pair — the same radii that define the states,
    reference: lib/noise_utils.py:70-243), and
  * the Kolmogorov-Smirnov distance between the error-radius
    distributions (conditioned on kept joints).

Round 4 extends the gate three-way: the DEVICE synthesizer
(`device_noise.synthesize_pose_device`, the gt_in_step="device" in-step
form) is held to the same bars against the scalar oracle, so all three
forms — scalar oracle, host batch, device — are pinned to one
distribution in one artifact.

Run:  python tools/check_noise_distribution.py [--n 100000] \
          [--out artifacts/noise_distribution.json]

Pass criteria (two independent N-sample draws of the SAME distribution
give KS ~ 1.36*sqrt(2/N) at 95%): state-frequency |diff| <= 0.01 and
KS <= max(0.01, 3*sqrt(2/N)).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from gator_tpu.data import noise  # noqa: E402

# crop-space areas spanning the training recipe: the OKS area is the
# post-crop tight-bbox area at the 288x384 input (data/processing.py
# crop_area_batch); people fill most of the crop, so areas cluster in the
# tens of thousands of px^2 with a small-person tail
RECIPE_AREAS = (8000.0, 30000.0, 80000.0)


def make_pose(rng):
    """One plausible 17-kp COCO pose in crop space (pixels), all valid."""
    base = np.array([
        [144, 60], [134, 50], [154, 50], [120, 55], [168, 55],
        [100, 120], [188, 120], [90, 190], [198, 190], [85, 250],
        [203, 250], [115, 210], [173, 210], [110, 290], [178, 290],
        [105, 360], [183, 360]], np.float32)
    jitter = rng.normal(0, 4.0, base.shape).astype(np.float32)
    return np.concatenate([base + jitter, np.ones((17, 1), np.float32)],
                          axis=1)


def classify(synth, gt, area):
    """[J] state codes: 0 good, 1 jitter, 2 miss, 3 inversion, 4 dropped —
    from the synthesized point's distances against the state-defining
    radii (the annuli are disjoint, so classification is exact except for
    miss-near-pair vs inversion overlap, resolved inversion-first like
    the generator's candidate sets)."""
    variances = (noise.KPS_SIGMAS * 2) ** 2
    ks85 = np.sqrt(-2 * area * variances * np.log(0.85))
    ks50 = np.sqrt(-2 * area * variances * np.log(0.50))
    out = np.empty(17, np.int64)
    for j in range(17):
        if synth[j, 2] <= 0:
            out[j] = 4
            continue
        d_gt = np.linalg.norm(synth[j, :2] - gt[j, :2])
        pair = noise._pair_index(j)
        d_pair = (np.linalg.norm(synth[j, :2] - gt[pair, :2])
                  if pair is not None else np.inf)
        if d_pair <= ks50[j] and d_pair < d_gt:
            out[j] = 3
        elif d_gt <= ks85[j]:
            out[j] = 0
        elif d_gt <= ks50[j]:
            out[j] = 1
        else:
            out[j] = 2
    return out


def run(n: int, seed: int = 0):
    rng_pose = np.random.default_rng(seed)
    per_area = max(1, n // len(RECIPE_AREAS))
    results = {}
    for area in RECIPE_AREAS:
        poses = np.stack([make_pose(rng_pose) for _ in range(per_area)])
        areas = np.full(per_area, area, np.float32)

        t0 = time.time()
        rng_s = np.random.default_rng((seed, 1))
        scalar = np.stack([
            noise.synthesize_pose(poses[i], float(area), rng_s)
            for i in range(per_area)])
        t_scalar = time.time() - t0
        t0 = time.time()
        rng_b = np.random.default_rng((seed, 2))
        batch = noise.synthesize_pose_batch(poses, areas, rng_b)
        t_batch = time.time() - t0

        t0 = time.time()
        dev2 = np.asarray(_device_form(poses[..., :2], areas, seed))
        t_dev = time.time() - t0
        # the device form returns [B,17,2] with zeroed dead rows; rebuild
        # the [B,17,3] validity the classifier expects
        dead = np.abs(dev2).sum(-1, keepdims=True) <= 0
        device = np.concatenate([dev2, (~dead).astype(np.float32)],
                                axis=-1)

        st_s = np.stack([classify(scalar[i], poses[i], area)
                         for i in range(per_area)]).ravel()
        st_b = np.stack([classify(batch[i], poses[i], area)
                         for i in range(per_area)]).ravel()
        st_d = np.stack([classify(device[i], poses[i], area)
                         for i in range(per_area)]).ravel()
        freq_s = np.bincount(st_s, minlength=5) / len(st_s)
        freq_b = np.bincount(st_b, minlength=5) / len(st_b)
        freq_d = np.bincount(st_d, minlength=5) / len(st_d)

        def radii(synth):
            kept = synth[..., 2] > 0
            d = np.linalg.norm(synth[..., :2] - poses[..., :2], axis=-1)
            return np.sort(d[kept])

        def ks_dist(r_a, r_b):
            grid = np.unique(np.concatenate([r_a, r_b]))
            cdf_a = np.searchsorted(r_a, grid, side="right") / len(r_a)
            cdf_b = np.searchsorted(r_b, grid, side="right") / len(r_b)
            return float(np.abs(cdf_a - cdf_b).max())

        r_s, r_b, r_d = radii(scalar), radii(batch), radii(device)
        results[f"area_{int(area)}"] = {
            "n_poses": per_area,
            "state_freq_scalar": [round(float(x), 5) for x in freq_s],
            "state_freq_batch": [round(float(x), 5) for x in freq_b],
            "state_freq_device": [round(float(x), 5) for x in freq_d],
            "state_freq_max_abs_diff": round(
                float(np.abs(freq_s - freq_b).max()), 5),
            "state_freq_max_abs_diff_device": round(
                float(np.abs(freq_s - freq_d).max()), 5),
            "radius_ks_distance": round(ks_dist(r_s, r_b), 5),
            "radius_ks_distance_device": round(ks_dist(r_s, r_d), 5),
            "scalar_poses_per_sec": round(per_area / t_scalar, 1),
            "batch_poses_per_sec": round(per_area / t_batch, 1),
            "device_poses_per_sec": round(per_area / t_dev, 1),
        }
    return results


def _device_form(joints2, areas, seed):
    """The in-step device synthesizer on the CPU backend (the tool is a
    host-side statistical gate; the TPU bit-stream is the same threefry)."""
    import jax

    from gator_tpu.data.device_noise import synthesize_pose_device

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        return jax.jit(synthesize_pose_device)(
            jax.random.PRNGKey(seed), joints2.astype(np.float32),
            areas.astype(np.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100000,
                    help="total poses (split across the recipe areas)")
    ap.add_argument("--out", type=str,
                    default="artifacts/noise_distribution.json")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    results = run(args.n, args.seed)
    n_per = args.n // len(RECIPE_AREAS)
    # two independent draws of N joints: KS 95% bound 1.36*sqrt(2/N); use
    # 3 sigma-ish slack since the samples share no rng
    ks_bound = max(0.01, 3.0 * np.sqrt(2.0 / (n_per * 17)))
    ok = True
    for k, r in results.items():
        passed = (r["state_freq_max_abs_diff"] <= 0.01
                  and r["radius_ks_distance"] <= ks_bound
                  and r["state_freq_max_abs_diff_device"] <= 0.01
                  and r["radius_ks_distance_device"] <= ks_bound)
        ok &= passed
        print(f"{k}: freq_diff={r['state_freq_max_abs_diff']} "
              f"ks={r['radius_ks_distance']} "
              f"dev_freq_diff={r['state_freq_max_abs_diff_device']} "
              f"dev_ks={r['radius_ks_distance_device']} "
              f"(bound {ks_bound:.4f}) {'OK' if passed else 'FAIL'}")
    payload = {"n_total": args.n, "ks_bound": round(float(ks_bound), 5),
               "passed": bool(ok), "areas": results}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"-> {args.out}")
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()

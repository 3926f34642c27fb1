"""Measure the TPU relay's host-visible transfer budget: round-trip
latency and effective bandwidth in each direction, then reconstruct the
`serve_request_p50_ms_b64` number from first principles (VERDICT r4
weak-5: 117.8 ms vs a ~30 ms RTT — the rest is the [64, 6890, 3] mesh
download at relay bandwidth, not extra per-request transfers).

Run on the TPU:  python tools/profile_relay.py \
                     [--out artifacts/relay_budget.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def median_time(fn, reps=15):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="artifacts/relay_budget.json")
    args = ap.parse_args()
    dev = jax.devices()[0]
    print("device:", dev)

    # RTT: dispatch a trivial op and fetch its scalar
    one = jax.device_put(jnp.float32(1.0), dev)
    inc = jax.jit(lambda x: x + 1)
    float(inc(one))  # compile
    rtt_ms = median_time(lambda: float(inc(one)))

    results = {"rtt_ms": round(rtt_ms, 2), "download": {}, "upload": {}}
    for mb in (0.25, 1.0, 2.65, 5.3):
        n = int(mb * 1e6 / 4)
        arr = jax.device_put(jnp.zeros(n, jnp.float32), dev)
        np.asarray(arr)  # warm
        t_down = median_time(lambda: np.asarray(arr))
        host = np.zeros(n, np.float32)
        jax.device_put(host, dev).block_until_ready()
        t_up = median_time(
            lambda: jax.device_put(host, dev).block_until_ready())
        bw_down = mb / max(t_down - rtt_ms, 1e-6) * 1e3
        bw_up = mb / max(t_up - rtt_ms, 1e-6) * 1e3
        results["download"][f"{mb}MB"] = {
            "ms": round(t_down, 2), "MB_per_s": round(bw_down, 1)}
        results["upload"][f"{mb}MB"] = {
            "ms": round(t_up, 2), "MB_per_s": round(bw_up, 1)}
        print(f"{mb:5.2f} MB  down {t_down:7.2f} ms ({bw_down:6.1f} MB/s)"
              f"  up {t_up:7.2f} ms ({bw_up:6.1f} MB/s)")

    # reconstruct the bench's serve b64 request: upload [64,19ish,2] f32
    # (~10 KB, ~free), one dispatch RTT, download the bf16 mesh
    # [64, 6890, 3] = 2.65 MB
    mesh_mb = 64 * 6890 * 3 * 2 / 1e6
    bw = results["download"]["2.65MB"]["MB_per_s"]
    predicted = rtt_ms + mesh_mb / bw * 1e3
    results["serve_b64_budget_ms"] = {
        "rtt": round(rtt_ms, 2),
        "mesh_download_mb": round(mesh_mb, 2),
        "download_bw_MB_per_s": bw,
        "predicted_total": round(predicted, 2),
    }
    print(f"predicted serve b64 request: {predicted:.1f} ms "
          f"(rtt {rtt_ms:.1f} + {mesh_mb:.2f} MB @ {bw:.0f} MB/s)")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("->", args.out)


if __name__ == "__main__":
    main()

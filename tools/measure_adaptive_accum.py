"""A/B the adaptive sampler's accumulation modes on the real TPU.

accum="host" (round-2 path): three K-sized device->host pulls + host f64
math + pad re-upload per batch — each a ~30 ms tunnel RPC class cost, the
measured wall-time dominator (BENCHMARKS.md production loop: 0.87-3.47 s
for a ~100 ms-of-device-compute render).

accum="device" (round-3 path): accumulators, stderr test and active-set
compaction stay in HBM; the host pulls ONE scalar per test round.

Workloads: the two quality-table configs (two_red_cubes 8..100 and 4..64,
rel_tol 0.02) plus the smoke tool's headline 8..32 — wall seconds,
best of REPS warm runs, plus a cross-mode image check.

Usage: python tools/measure_adaptive_accum.py
"""
import os
import sys

if os.environ.get("PYTHONHASHSEED") != "0":
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import jax
import numpy as np

import raytrace_tpu as rt
from raytrace_tpu import adaptive as adaptive_mod
from raytrace_tpu import trace as trace_mod

W, H = 800, 600
REPS = int(os.environ.get("REPS", "3"))


def load(name):
    for base in ("/root/reference/demo-assets",
                 os.path.join(os.path.dirname(__file__), "../assets")):
        p = os.path.join(base, name)
        if os.path.exists(p):
            with open(p) as f:
                data = json.load(f)
            # Mirror the camera to +Z like bench.py (PARITY.md #2).
            pos = data["camera"]["position"]
            data["camera"]["position"] = [pos[0], pos[1], abs(pos[2])]
            return rt.scene_from_dict(data)[0]
    raise FileNotFoundError(name)


def run(scene, label, accum, **kw):
    """Wall time per mode's natural product: host mode materializes the
    image on host by construction; device mode hands the next pipeline
    stage (denoise/tonemap) device-resident arrays, so it is synced with
    ONE scalar checksum (the repo's bench methodology — a full 800x600
    pull through the tunnel costs 150-350 ms and is pure waste
    mid-pipeline)."""
    cfg = trace_mod.TraceConfig(max_depth=50)
    dev = accum == "device"

    def call():
        out = adaptive_mod.render_adaptive(
            scene, width=W, height=H, cfg=cfg, engine="pallas",
            accum=accum, as_numpy=not dev, **kw)
        if dev:
            float(sum(a.astype("float32").sum() for a in out))  # sync
        return out
    t0 = time.perf_counter()
    img, spp = call()
    first = time.perf_counter() - t0
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        call()
        best = min(best, time.perf_counter() - t0)
    img, spp = np.asarray(img), np.asarray(spp)
    print(f"{label:44s} accum={accum:6s} best {best:7.3f} s "
          f"(first {first:6.1f} s) mean spp {float(np.mean(spp)):5.1f}",
          flush=True)
    return img, spp, best


def main():
    print("devices:", jax.devices(), flush=True)
    cubes = load("two_red_cubes_scene.json")
    headline = load("sphere_reflections_light.json")
    results = {}
    for label, scene, kw in [
        ("headline 8..32 rel 0.02 batch 8", headline,
         dict(min_spp=8, max_spp=32, batch=8, rel_tol=0.02)),
        ("two_red_cubes 4..64 rel 0.02 batch 8", cubes,
         dict(min_spp=4, max_spp=64, batch=8, rel_tol=0.02)),
        ("two_red_cubes 8..100 rel 0.02 batch 8", cubes,
         dict(min_spp=8, max_spp=100, batch=8, rel_tol=0.02)),
    ]:
        ih, sh, th = run(scene, label, "host", **kw)
        idv, sdv, td = run(scene, label, "device", **kw)
        same_spp = float(np.mean(sh == sdv))
        maxerr = float(np.abs(ih - idv).max())
        print(f"  -> device/host wall = {td / th:.3f}x   img maxerr "
              f"{maxerr:.2e}   spp agree {same_spp:.4f}", flush=True)
        results[label] = (th, td)
    print(json.dumps({k: {"host_s": a, "device_s": b, "speedup": a / b}
                      for k, (a, b) in results.items()}, indent=1))


if __name__ == "__main__":
    main()

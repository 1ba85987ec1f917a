"""Where does the 14.9 ms headline frame go? Shadow/depth ablation (TPU).

Times the Pallas unroll-mode kernel on sphere_reflections_light (bench
camera mirroring, 800x600/100spp) under:
  - d50 soft16          (bench config)
  - d50 soft4 / soft1   (marginal cost per shadow sample: each sample
                         pays RNG draws [pcg4d + sincos + cbrt] + per-prim
                         occlusion tests; the slope separates the
                         per-sample tail from fixed bounce work)
  - d50 hard            (per-sample loop removed entirely)
  - d50 no-lights       (all shadow/lighting work removed)
  - d2  soft16          (bounce-0 dominance check)
Reports ms/frame (device-resident, pipelined, one sync per batch).
"""
import json
import os
import sys

if os.environ.get("PYTHONHASHSEED") != "0":
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import time

import jax.numpy as jnp

import raytrace_tpu as rt
from raytrace_tpu import renderer as renderer_mod
from raytrace_tpu import trace as trace_mod

W, H, SPP = 800, 600, 100
SCENE = "/root/reference/demo-assets/sphere_reflections_light.json"


def time_cfg(scene, cfg, tag, batch=16, reps=3):
    kw = dict(width=W, height=H, samples=SPP, cfg=cfg, go_camera=True)
    frame = lambda: renderer_mod.render_wavefront(
        scene, as_numpy=False, assume_capacity=True, **kw)
    t0 = time.perf_counter()
    float(jnp.sum(frame()))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        acc = [frame() for _ in range(batch)]
        float(jnp.sum(acc[-1]))
        best = min(best, (time.perf_counter() - t0) / batch)
    renderer_mod.flush_capacity_checks()
    print(f"{tag:24s} {best*1e3:8.2f} ms/frame  (compile {compile_s:.0f}s)",
          flush=True)
    return best


def main():
    with open(SCENE) as f:
        data = json.load(f)
    data["camera"]["position"] = [0, 0, 8]  # bench.py mirroring (PARITY #2)
    scene, _ = rt.scene_from_dict(data)
    nolight = dataclasses.replace(
        scene, lights=dataclasses.replace(
            scene.lights,
            position=scene.lights.position[:0],
            color=scene.lights.color[:0],
            intensity=scene.lights.intensity[:0]))
    base = trace_mod.TraceConfig(max_depth=50)
    time_cfg(scene, base, "d50 soft16")
    time_cfg(scene, dataclasses.replace(base, shadow_samples=4),
             "d50 soft4")
    time_cfg(scene, dataclasses.replace(base, shadow_samples=1),
             "d50 soft1")
    time_cfg(scene, dataclasses.replace(base, soft_shadows=False),
             "d50 hard")
    time_cfg(nolight, base, "d50 no-lights")
    time_cfg(scene, dataclasses.replace(base, max_depth=2), "d2 soft16")


if __name__ == "__main__":
    main()

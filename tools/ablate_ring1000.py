"""Where does the ring-1000 frame go? Depth / shadow ablation (TPU).

Times the Pallas bvh-mode kernel at 800x600/20spp on ring-1000 under:
  - depth 50, soft 16        (bench config, scaled spp)
  - depth 50, hard shadows   (fused soft walk removed)
  - depth 50, no shadow work (lights emptied)
  - depth 2,  soft 16        (bounce-0 dominance check)
Reports ms/frame (device-resident, pipelined) per config.
"""
import os
import sys

if os.environ.get("PYTHONHASHSEED") != "0":
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import time

import jax.numpy as jnp
import numpy as np

import raytrace_tpu as rt
from raytrace_tpu import renderer as renderer_mod
from raytrace_tpu import scene as scene_mod
from raytrace_tpu import trace as trace_mod
from raytrace_tpu.bench.suite import ring_scene_dict

W, H, SPP = 800, 600, 20


def time_cfg(scene, cfg, tag, batch=4, reps=3):
    kw = dict(width=W, height=H, samples=SPP, cfg=cfg)
    frame = lambda: renderer_mod.render_wavefront(
        scene, as_numpy=False, assume_capacity=True, **kw)
    t0 = time.perf_counter()
    float(jnp.sum(frame()))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        acc = [frame() for _ in range(batch)]
        float(jnp.sum(sum(jnp.sum(a) for a in acc)))
        best = min(best, (time.perf_counter() - t0) / batch)
    print(f"{tag:24s} {best*1e3:8.1f} ms/frame  (compile {compile_s:.0f}s)",
          flush=True)
    return best


def main():
    scene, _ = rt.scene_from_dict(ring_scene_dict(1000))
    scene = scene_mod.with_accel(scene)
    nolight = dataclasses.replace(
        scene, lights=dataclasses.replace(
            scene.lights,
            position=scene.lights.position[:0],
            color=scene.lights.color[:0],
            intensity=scene.lights.intensity[:0]))
    base = trace_mod.TraceConfig(max_depth=50)
    time_cfg(scene, base, "d50 soft16")
    time_cfg(scene, dataclasses.replace(base, soft_shadows=False),
             "d50 hard")
    time_cfg(nolight, base, "d50 no-lights")
    time_cfg(scene, dataclasses.replace(base, max_depth=2), "d2 soft16")


if __name__ == "__main__":
    main()

"""A/B the interval soft-shadow guard on TPU: per-frame device time on
two_red_cubes (worst-case: overhead mostly-unoccluded light -> every block
pays the 16-sample loop) and the headline sphere scene (sanity: must not
regress). Committed baselines (BENCHMARKS.md): two_red_cubes 426.4 ms,
sphere 14.9 ms.

Usage: python tools/measure_soft_guard.py [scene ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

if os.environ.get("PYTHONHASHSEED") != "0":
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402

import raytrace_tpu as rt  # noqa: E402
from raytrace_tpu import renderer as renderer_mod  # noqa: E402
from raytrace_tpu.ops import tonemap as tm  # noqa: E402

W, H, SPP, DEPTH = 800, 600, 100, 50
ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets")


def bench_scene(name: str, batch: int = 32, reps: int = 3) -> float:
    with open(os.path.join(ASSETS, name)) as f:
        data = json.load(f)
    data["camera"]["position"][2] = abs(data["camera"]["position"][2])
    scene, _ = rt.scene_from_dict(data, base_dir=ASSETS)
    r = rt.Renderer()
    r.set_samples(SPP)
    r.set_max_depth(DEPTH)
    cfg = r.trace_config()
    kw = dict(width=W, height=H, samples=SPP, cfg=cfg, go_camera=True)

    def frame():
        return renderer_mod.render_wavefront(
            scene, as_numpy=False, assume_capacity=True,
            post=tm.tonemap_rgb8, **kw)

    checksum = int(jnp.sum(frame().astype(jnp.int32)))
    assert checksum > 0, name
    renderer_mod.flush_capacity_checks()

    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [frame() for _ in range(batch)]
        int(jnp.sum(outs[-1].astype(jnp.int32)))
        renderer_mod.flush_capacity_checks()
        best = min(best, (time.perf_counter() - t0) / batch)
    return best


if __name__ == "__main__":
    scenes = sys.argv[1:] or ["two_red_cubes_scene.json",
                              "sphere_reflections_light.json"]
    for name in scenes:
        batch = 8 if "cubes" in name else (4 if "mesh" in name else 32)
        ms = bench_scene(name, batch=batch) * 1e3
        print(f"{name}: {ms:.1f} ms/frame")

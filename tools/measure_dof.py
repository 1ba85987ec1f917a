"""DoF headline A/B (round 5, VERDICT r4 #4): the tightened
distance-proportional DoF mask vs the non-DoF frame on the bench scene.

Round 4's global k' = k + L/F widening made the DoF frame 68.1 ms vs
14.0 non-DoF (5x) - the mask over-included depth-independently. The
round-5 mask inflates each primitive by Le*|1 - dist/(F*|d|)| (zero at
the focal surface). Prints both frames plus the mask-included pixel
counts, same device-resident methodology as bench.py.
"""
import os as _os0
import sys as _sys0

if _os0.environ.get("PYTHONHASHSEED") != "0":
    _os0.environ["PYTHONHASHSEED"] = "0"
    _os0.execv(_sys0.executable, [_sys0.executable] + _sys0.argv)

import dataclasses
import json
import os
import sys
import time

import faulthandler

faulthandler.dump_traceback_later(240, repeat=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

import raytrace_tpu as rt
from raytrace_tpu import renderer as renderer_mod
from raytrace_tpu import trace as trace_mod

W, H, SPP, DEPTH = 800, 600, 100, 50


def main():
    path = "/root/reference/demo-assets/sphere_reflections_light.json"
    with open(path) as f:
        data = json.load(f)
    data["camera"]["position"] = [0, 0, 8]  # +Z mirror (PARITY.md #2)
    scene, _ = rt.scene_from_dict(data)

    base = trace_mod.TraceConfig(max_depth=DEPTH)
    for name, cfg in (
            ("noDoF", base),
            ("DoF", dataclasses.replace(base, depth_of_field=True))):
        hit_px, _, k_dev = renderer_mod._pixel_mask(
            scene, width=W, height=H, samples=SPP, cfg=cfg,
            go_camera=True)
        k_px = int(k_dev)
        kw = dict(width=W, height=H, samples=SPP, cfg=cfg)
        img = renderer_mod.render_wavefront(scene, as_numpy=False, **kw)
        float(jnp.max(img))
        frame = lambda: renderer_mod.render_wavefront(
            scene, as_numpy=False, assume_capacity=True, **kw)
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            acc = 0.0
            for _ in range(4):
                acc = acc + frame()[0][0, 0]
            float(acc)
            renderer_mod.flush_capacity_checks()
            best = min(best, (time.perf_counter() - t0) / 4)
        print(f"[{name}] {best*1e3:6.1f} ms/frame "
              f"({W*H*SPP/best/1e6:,.0f}M rays/s)  mask-included px "
              f"{k_px} ({k_px/(W*H):.1%})", flush=True)


if __name__ == "__main__":
    main()

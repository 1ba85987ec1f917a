"""Is the 1-pixel n=1000 divergence the BVH walk or kernel arithmetic?

Renders ring-1000 at 160x120/2spp/depth-1/hard shadows with:
  - jnp brute force (oracle)
  - pallas loop mode (fori over SMEM rows, NO tree)
  - pallas bvh mode (packet walk)
and prints pairwise diffs at pixel (52,95) and globally.
"""
import os
import sys

if os.environ.get("PYTHONHASHSEED") != "0":
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import raytrace_tpu as rt
from raytrace_tpu import renderer as renderer_mod
from raytrace_tpu import scene as scene_mod
from raytrace_tpu import trace as trace_mod
from raytrace_tpu.bench.suite import ring_scene_dict
from raytrace_tpu.ops import megakernel as mk

W, H = 160, 120
cfg = trace_mod.TraceConfig(max_depth=1, soft_shadows=False)


def main():
    import dataclasses
    accel, _ = rt.scene_from_dict(ring_scene_dict(1000))
    accel = scene_mod.with_accel(accel)
    scene = dataclasses.replace(accel, accel=None)
    img_j = np.asarray(renderer_mod.render_band(
        scene, np.int32(0), width=W, height=H, band_h=H, samples=2,
        cfg=cfg))
    assert mk._kernel_mode(scene) == "loop"
    img_loop = np.asarray(renderer_mod.render_wavefront(
        scene, width=W, height=H, samples=2, cfg=cfg))
    assert mk._kernel_mode(accel) == "bvh"
    img_bvh = np.asarray(renderer_mod.render_wavefront(
        accel, width=W, height=H, samples=2, cfg=cfg))
    for tag, a, b in (("loop vs jnp", img_loop, img_j),
                      ("bvh  vs jnp", img_bvh, img_j),
                      ("bvh  vs loop", img_bvh, img_loop)):
        d = np.abs(a - b)
        bad = int((d.max(axis=-1) > 1e-3).sum())
        print(f"{tag}: maxerr {d.max():.3e}  bad-px {bad}", flush=True)
    print("px(52,95): jnp", img_j[52, 95], " loop", img_loop[52, 95],
          " bvh", img_bvh[52, 95], flush=True)


if __name__ == "__main__":
    main()

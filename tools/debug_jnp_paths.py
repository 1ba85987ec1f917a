"""CPU cross-check of the jnp engine's n=1000 paths.

Compares, at 120x90/2spp/depth-6 on the ring-1000 scene:
  1. chunked brute force (PRIM_CHUNK scan; TPU default for big scenes)
  2. unchunked brute force (PRIM_CHUNK bumped past n; the historical oracle)
  3. gather-walk BVH traversal (CPU default with accel)
All three must agree bit-for-bit (same draws, same argmin semantics).
"""
import os
import sys

os.environ["RT_PLATFORM"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

import raytrace_tpu as rt
from raytrace_tpu import renderer as renderer_mod
from raytrace_tpu import scene as scene_mod
from raytrace_tpu import trace as trace_mod
from raytrace_tpu.bench.suite import ring_scene_dict
from raytrace_tpu.ops import intersect

W, H = 120, 90
cfg = trace_mod.TraceConfig(max_depth=6)


def render(scene):
    return np.asarray(renderer_mod.render_band(
        scene, np.int32(0), width=W, height=H, band_h=H, samples=2,
        cfg=cfg))


def main():
    scene, _ = rt.scene_from_dict(ring_scene_dict(1000))
    accel_scene = scene_mod.with_accel(scene)

    orig_use = intersect.use_accel
    intersect.use_accel = lambda accel: False
    try:
        img_chunk = render(scene)
        orig_chunk = intersect.PRIM_CHUNK
        intersect.PRIM_CHUNK = 1024
        try:
            img_flat = render(scene)
        finally:
            intersect.PRIM_CHUNK = orig_chunk
    finally:
        intersect.use_accel = orig_use

    img_bvh = render(accel_scene)

    for tag, a, b in (("chunk vs flat", img_chunk, img_flat),
                      ("bvh   vs flat", img_bvh, img_flat)):
        d = np.abs(a - b)
        bad = int((d.max(axis=-1) > 1e-3).sum())
        print(f"{tag}: maxerr {d.max():.3e}  bad-px {bad}", flush=True)


if __name__ == "__main__":
    main()

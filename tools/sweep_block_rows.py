"""Block-rows sweep for the packet-BVH megakernel (ring-1000, TPU).

Smaller blocks = tighter ray packets (fewer union node visits per block)
but more sequential blocks; this measures where the trade lands for
bvh-mode scenes. d50/soft16 at 800x600/20spp.
"""
import os
import sys

if os.environ.get("PYTHONHASHSEED") != "0":
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax.numpy as jnp

import raytrace_tpu as rt
from raytrace_tpu import renderer as renderer_mod
from raytrace_tpu import trace as trace_mod
from raytrace_tpu.bench.suite import ring_scene_dict

W, H, SPP = 800, 600, 20
cfg = trace_mod.TraceConfig(max_depth=50)


def main():
    scene, _ = rt.scene_from_dict(ring_scene_dict(1000))
    for br in [int(a) for a in sys.argv[1:]] or [4, 8, 16]:
        frame = lambda: renderer_mod.render_wavefront(
            scene, width=W, height=H, samples=SPP, cfg=cfg,
            block_rows=br, as_numpy=False, assume_capacity=True)
        t0 = time.perf_counter()
        float(jnp.sum(frame()))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            acc = [frame() for _ in range(4)]
            float(jnp.sum(sum(jnp.sum(a) for a in acc)))
            best = min(best, (time.perf_counter() - t0) / 4)
        print(f"block_rows {br:3d}: {best*1e3:8.1f} ms/frame  "
              f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()

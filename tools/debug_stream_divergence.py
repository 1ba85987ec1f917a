"""Isolate the TPU stream-mode divergence: run the SAME ~3000-prim grid
scene through bvh mode (SMEM tables) and stream mode (DMA'd leaf rows,
forced by patching MAX_BVH_KERNEL_PRIMS), same leaf size, same
block_rows, and diff the raw trace outputs at increasing depth.
bvh-vs-stream should be bit-identical (identical arithmetic, identical
walk order) - any difference is a stream bug, while bvh-vs-jnp
differences are the known Mosaic/XLA f32 rounding class.
"""
import os as _os0
import sys as _sys0

if _os0.environ.get("PYTHONHASHSEED") != "0":
    _os0.environ["PYTHONHASHSEED"] = "0"
    _os0.execv(_sys0.executable, [_sys0.executable] + _sys0.argv)

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

import raytrace_tpu as rt
from raytrace_tpu import renderer as renderer_mod
from raytrace_tpu import trace as trace_mod
from raytrace_tpu import rng
from raytrace_tpu import camera as cam_mod
from raytrace_tpu import scene as scene_mod
from raytrace_tpu.ops import megakernel as mk
from tools.tpu_stream_smoke import grid_scene_dict


def lanes(scene, W, H, spp, cfg):
    n_px = W * H
    pix = jnp.repeat(jnp.arange(n_px, dtype=jnp.uint32), spp)
    samp = jnp.tile(jnp.arange(spp, dtype=jnp.uint32), n_px)
    ju, jv, _, _ = rng.uniform4(pix, samp, rng.Streams.CAMERA_JITTER,
                                cfg.seed)
    x = (pix % np.uint32(W)).astype(jnp.float32)
    y = (pix // np.uint32(W)).astype(jnp.float32)
    o, d = cam_mod.go_rays(scene.camera, (x + ju) / W, (y + jv) / H)
    return o, d, pix, samp


def main():
    d = grid_scene_dict(14)  # 14^3 = 2744 + ground = 2745 prims
    s, _ = rt.scene_from_dict(d)
    # identical tree in both modes
    s = scene_mod.with_accel(s, leaf_size=32)
    print("prims:", renderer_mod.scene_prim_count(s),
          "default mode:", mk._kernel_mode(s))
    W, H, spp = 128, 96, 2
    for depth in (1, 2, 4):
        cfg = trace_mod.TraceConfig(max_depth=depth, shadow_samples=2)
        o, dd, pix, samp = lanes(s, W, H, spp, cfg)
        assert mk._kernel_mode(s) == "bvh"
        a = np.asarray(mk.trace_pallas(s, o, dd, pix, samp, cfg,
                                       block_rows=16))
        orig = mk.MAX_BVH_KERNEL_PRIMS
        mk.MAX_BVH_KERNEL_PRIMS = 8
        try:
            assert mk._kernel_mode(s) == "stream"
            b = np.asarray(mk.trace_pallas(s, o, dd, pix, samp, cfg,
                                           block_rows=16))
        finally:
            mk.MAX_BVH_KERNEL_PRIMS = orig
        err = np.abs(a - b)
        print(f"depth {depth}: bvh-vs-stream maxerr {err.max():.3g} "
              f"divergent lanes {(err.max(axis=-1) > 1e-5).mean():.2e}")
        # and vs the jnp oracle (Mosaic/XLA rounding class)
        ref = np.asarray(trace_mod.trace(s, o, dd, pix, samp, cfg))
        for nm, img in (("bvh", a), ("stream", b)):
            e = np.abs(img - ref)
            print(f"  {nm}-vs-jnp maxerr {e.max():.3g} divergent "
                  f"{(e.max(axis=-1) > 1e-4).mean():.2e}")


if __name__ == "__main__":
    main()

"""Isolate the n=1000 pallas-vs-jnp mismatch.

Renders the ring scene at 160x120 and compares engines under several
configs to localize the bug:
  A. full (soft shadows 16, depth 8)
  B. hard shadows (soft_shadows=False)     -> rules fused soft walk in/out
  C. depth 1 (primary only, soft shadows)  -> bounce-0 only
  D. depth 1 hard                           -> closest-hit + any-hit only

Usage: python tools/debug_equiv_1000.py [n ...]
Set RT_NO_FUSED_SOFT=1 to force per-sample walks in bvh mode.
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
from raytrace_tpu import trace as trace_mod
from raytrace_tpu.bench.suite import ring_scene_dict
from raytrace_tpu.ops import megakernel as mk

W, H = 160, 120


def compare(scene, cfg, tag):
    r = rt.Renderer()
    r.engine = "jnp"
    r.set_samples(2)
    img_j = np.asarray(renderer_mod.render_band(
        scene, np.int32(0), width=W, height=H, band_h=H, samples=2,
        cfg=cfg))
    img_p = np.asarray(renderer_mod.render_wavefront(
        scene, width=W, height=H, samples=2, cfg=cfg))
    d = np.abs(img_p - img_j)
    err = float(d.max())
    bad = int((d.max(axis=-1) > 1e-3).sum())
    iy, ix = np.unravel_index(d.max(axis=-1).argmax(), (H, W))
    print(f"  {tag:28s} maxerr {err:.3e}  bad-px {bad:5d}  "
          f"argmax ({iy},{ix}) jnp={img_j[iy, ix]} pallas={img_p[iy, ix]}",
          flush=True)
    return err


def main():
    ns = [int(a) for a in sys.argv[1:]] or [250, 1000]
    for n in ns:
        scene, _ = rt.scene_from_dict(ring_scene_dict(n))
        from raytrace_tpu import scene as scene_mod
        scene = scene_mod.with_accel(scene)
        print(f"n={n}  mode={mk._kernel_mode(scene)}  "
              f"fused_off={os.environ.get('RT_NO_FUSED_SOFT', '')}",
              flush=True)
        mkcfg = lambda **kw: trace_mod.TraceConfig(**kw)
        compare(scene, mkcfg(max_depth=8), "A full soft d8")
        compare(scene, mkcfg(max_depth=8, soft_shadows=False),
                "B hard d8")
        compare(scene, mkcfg(max_depth=1), "C soft d1")
        compare(scene, mkcfg(max_depth=1, soft_shadows=False),
                "D hard d1")


if __name__ == "__main__":
    main()

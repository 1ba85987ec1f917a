"""Engine-divergence curve toward the 262,144-prim stream cap
(round 5, VERDICT r4 #7).

Dense glass scenes accumulate Mosaic-vs-XLA 1-2 ulp verdict flips
linearly in primitive count (~0.8% of pixels at 5,833 prims / depth 4,
BENCHMARKS "Beyond 4096"). This measures the divergent-pixel fraction
of the stream kernel vs the jnp oracle at ~6K, ~50K and ~195K
primitives so the advertised cap carries a TESTED gate
(tpu_stream_smoke gains a >=50K-prim scene).

Usage: python tools/measure_divergence_cap.py [sides...]  (default 18 37 58)
"""
import os as _os0
import sys as _sys0

if _os0.environ.get("PYTHONHASHSEED") != "0":
    _os0.environ["PYTHONHASHSEED"] = "0"
    _os0.execv(_sys0.executable, [_sys0.executable] + _sys0.argv)

import os
import sys
import time

import faulthandler

faulthandler.dump_traceback_later(300, repeat=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

import raytrace_tpu as rt
from raytrace_tpu import renderer as renderer_mod
from raytrace_tpu import trace as trace_mod
from raytrace_tpu.ops import megakernel as mk
from tools.tpu_stream_smoke import grid_scene_dict

# Small frame + shallow depth + 2 soft samples: the jnp oracle is
# brute-force chunked on TPU (~minutes at 195K prims even at this size).
W, H, SPP, DEPTH = 96, 72, 2, 4


def measure(side):
    t0 = time.perf_counter()
    scene = rt.scene_from_dict(grid_scene_dict(side))[0]
    n = renderer_mod.scene_prim_count(scene)
    build_s = time.perf_counter() - t0
    assert mk._kernel_mode(scene) == "stream", mk._kernel_mode(scene)
    cfg = trace_mod.TraceConfig(max_depth=DEPTH, shadow_samples=2)
    t0 = time.perf_counter()
    img = np.asarray(renderer_mod.render_wavefront(
        scene, width=W, height=H, samples=SPP, cfg=cfg))
    t_stream = time.perf_counter() - t0
    r = rt.Renderer()
    r.engine, r.samples, r.max_depth = "jnp", SPP, DEPTH
    cfg_r = r.trace_config()
    import dataclasses as dc
    cfg_r = dc.replace(cfg_r, shadow_samples=2)
    t0 = time.perf_counter()
    ref = np.asarray(renderer_mod.render_band(
        scene, jnp.int32(0), width=W, height=H, band_h=H, samples=SPP,
        cfg=cfg_r))
    t_jnp = time.perf_counter() - t0
    err = np.abs(img - ref)
    div = float((err.max(axis=-1) > 1e-4).mean())
    assert img.max() > 0
    print(f"side {side:3d}  prims {n:7d}  divergent-px {div:.3e}  "
          f"maxerr {err.max():.3g}  (stream {t_stream:.0f}s jnp {t_jnp:.0f}s "
          f"build {build_s:.0f}s)", flush=True)
    return n, div


def main():
    sides = [int(a) for a in sys.argv[1:]] or [18, 37, 58]
    for s in sides:
        measure(s)


if __name__ == "__main__":
    main()

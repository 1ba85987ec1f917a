"""Decompose grid-5833's hard floor (round 5): the closest-hit walks
through deep glass bounces are most of the frame after the soft-walk
fixes. Configs at 800x600/5spp: hard d50 / d8 / d2; no lights d50;
full d50 with RT_SPLIT honored (mid-trace survivor re-compaction A/B).
"""
import os, sys
if os.environ.get("PYTHONHASHSEED") != "0":
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses, time
import faulthandler; faulthandler.dump_traceback_later(300, repeat=True)
import jax.numpy as jnp
import numpy as np
import raytrace_tpu as rt
from raytrace_tpu import renderer as renderer_mod
from raytrace_tpu import trace as trace_mod
from tools.tpu_stream_smoke import grid_scene_dict

W, H, SPP = 800, 600, 5

def bench(scene, cfg, reps=2):
    kw = dict(width=W, height=H, samples=SPP, cfg=cfg)
    img = renderer_mod.render_wavefront(scene, as_numpy=False, **kw)
    float(jnp.max(img))
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        img = renderer_mod.render_wavefront(
            scene, as_numpy=False, assume_capacity=True, **kw)
        float(img[0][0, 0])
        renderer_mod.flush_capacity_checks()
        best = min(best, time.perf_counter() - t0)
    return best

def main():
    scene = rt.scene_from_dict(grid_scene_dict(18))[0]
    base = trace_mod.TraceConfig(max_depth=50)
    runs = [
        ("hard d50", dataclasses.replace(base, soft_shadows=False)),
        ("hard d8", dataclasses.replace(base, soft_shadows=False,
                                        max_depth=8)),
        ("hard d2", dataclasses.replace(base, soft_shadows=False,
                                        max_depth=2)),
        ("full d50", base),
    ]
    import dataclasses as dc
    for name, cfg in runs:
        t = bench(scene, cfg)
        print(f"[grid] {name:10s} {t*1e3:8.0f} ms  "
              f"split={renderer_mod.pick_split(scene, cfg)}", flush=True)
    # no lights: empty the light table (shadow + direct lighting gone)
    s2 = dc.replace(scene, lights=dc.replace(
        scene.lights,
        position=jnp.zeros((0, 3), jnp.float32),
        color=jnp.zeros((0, 3), jnp.float32),
        intensity=jnp.zeros((0,), jnp.float32)))
    t = bench(s2, dataclasses.replace(base, soft_shadows=False))
    print(f"[grid] {'nolight d50':10s} {t*1e3:8.0f} ms", flush=True)

if __name__ == "__main__":
    main()

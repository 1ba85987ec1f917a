"""Round-5 stream-tier decomposition under the TIGHT fused cone walk.

The distance-proportional node inflation (megakernel.soft_fused_fn,
round 5) made the fused walk the best stream soft mode (grid 20.2->16.3 s
@5spp, mesh 7.70->6.33 s @20spp vs per-sample). This sweep says where the
remaining time goes before picking the next lever:

  soft16 / soft4 / hard   -> sample-test share vs walk-structure share
  block_rows 8/16/32      -> packet-width sensitivity of the cone walk
  leaf 64                 -> walk-steps vs row-tests balance

Usage: python tools/sweep_stream_r5.py [grid|mesh] [fused|persample]
"""
import os as _os0
import sys as _sys0

if _os0.environ.get("PYTHONHASHSEED") != "0":
    _os0.environ["PYTHONHASHSEED"] = "0"
    _os0.execv(_sys0.executable, [_sys0.executable] + _sys0.argv)

import dataclasses
import os
import sys
import tempfile
import time

import faulthandler

faulthandler.dump_traceback_later(240, repeat=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

which = sys.argv[1] if len(sys.argv) > 1 else "mesh"
soft_mode = sys.argv[2] if len(sys.argv) > 2 else "fused"
if soft_mode == "fused":
    os.environ["RT_STREAM_FUSED_SOFT"] = "1"

import numpy as np
import jax.numpy as jnp

import raytrace_tpu as rt
from raytrace_tpu import renderer as renderer_mod
from raytrace_tpu import scene as scene_mod
from raytrace_tpu import trace as trace_mod
from raytrace_tpu.ops import megakernel as mk
from tools.tpu_stream_smoke import mesh_scene_dict, grid_scene_dict

W, H = 800, 600


def bench(scene, cfg, spp, block_rows=None, reps=2):
    kw = dict(width=W, height=H, samples=spp, cfg=cfg,
              block_rows=block_rows)
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
    tmp = tempfile.mkdtemp(prefix="rt_sw5_")
    if which == "mesh":
        scene = rt.scene_from_dict(mesh_scene_dict(tmp, 4), base_dir=tmp)[0]
        spp = 20
    else:
        scene = rt.scene_from_dict(grid_scene_dict(18))[0]
        spp = 5
    assert mk._kernel_mode(scene) == "stream"
    base = trace_mod.TraceConfig(max_depth=50)
    runs = [
        ("soft16 br16", base, None, None),
        ("soft4  br16", dataclasses.replace(base, shadow_samples=4),
         None, None),
        ("hard   br16", dataclasses.replace(base, soft_shadows=False),
         None, None),
        ("soft16 br8", base, 8, None),
        ("soft16 br32", base, 32, None),
        ("soft16 br16 leaf64", base, None, 64),
    ]
    for name, cfg, br, leaf in runs:
        sc = scene
        if leaf is not None:
            sc = scene_mod.with_accel(scene, leaf_size=leaf)
        t = bench(sc, cfg, spp, block_rows=br)
        print(f"[{which}/{soft_mode}] {name:20s} {t*1e3:8.0f} ms "
              f"({W*H*spp/t:,.0f} rays/s)", flush=True)


if __name__ == "__main__":
    main()

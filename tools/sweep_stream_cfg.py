"""Stream-kernel tuning sweep: leaf size x block_rows on the 10K-tri
mesh scene (the stream mode's acceptance workload).

Bigger leaves halve the serial walk steps AND the per-leaf DMAs at the
cost of more (vectorized) prim tests per visited leaf; wider blocks
amortize walk latency over more lanes at the cost of bigger per-packet
node unions. 20 spp, d50, soft16; best-of-3 warm frames, one scalar
sync per frame (bench methodology).
"""
import os as _os0
import sys as _sys0

if _os0.environ.get("PYTHONHASHSEED") != "0":
    _os0.environ["PYTHONHASHSEED"] = "0"
    _os0.execv(_sys0.executable, [_sys0.executable] + _sys0.argv)

import os
import sys
import tempfile
import time

import faulthandler

faulthandler.dump_traceback_later(240, repeat=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

import raytrace_tpu as rt
from raytrace_tpu import renderer as renderer_mod
from raytrace_tpu import scene as scene_mod
from raytrace_tpu.ops import megakernel as mk
from tools.tpu_stream_smoke import mesh_scene_dict

W, H, SPP, DEPTH = 800, 600, 20, 50


def bench(scene, block_rows, reps=3):
    r = rt.Renderer()
    r.set_samples(SPP)
    r.set_max_depth(DEPTH)
    cfg = r.trace_config()
    kw = dict(width=W, height=H, samples=SPP, cfg=cfg,
              block_rows=block_rows)
    img = renderer_mod.render_wavefront(scene, as_numpy=False, **kw)
    ref = float(jnp.max(img))
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        img = renderer_mod.render_wavefront(
            scene, as_numpy=False, assume_capacity=True, **kw)
        float(img[0][0, 0])
        renderer_mod.flush_capacity_checks()
        best = min(best, time.perf_counter() - t0)
    return best, ref


def main():
    tmp = tempfile.mkdtemp(prefix="rt_sweep_")
    base = rt.scene_from_dict(mesh_scene_dict(tmp, 4), base_dir=tmp)[0]
    results = {}
    for leaf in (32, 64):
        s = scene_mod.with_accel(base, leaf_size=leaf)
        assert mk._kernel_mode(s) == "stream"
        for br in (8,):
            t, ref = bench(s, br)
            rays = W * H * SPP / t
            results[(leaf, br)] = t
            print(f"leaf={leaf} block_rows={br}: {t*1e3:.0f} ms "
                  f"({rays:,.0f} rays/s, max={ref:.4f})", flush=True)
    print("best:", min(results, key=results.get))


if __name__ == "__main__":
    main()

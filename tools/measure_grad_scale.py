"""Gradient cost at 1K / 10K primitives (round 5, VERDICT r4 #6).

Times the differentiable scan path (CPU) forward vs value_and_grad at
64x48/2spp/depth 3 on:
  * grid-1001: 10^3 sphere grid + plane (brute-chunked AND keep_accel);
  * ico-10241: two smooth icosphere meshes + plane (keep_accel).

Numbers feed BENCHMARKS.md "Gradients at scale".
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

import raytrace_tpu as rt
from raytrace_tpu import diff as diff_mod
from raytrace_tpu import trace as trace_mod
from tools.tpu_stream_smoke import mesh_scene_dict

W, H, SPP = 64, 48, 2
CFG = trace_mod.TraceConfig(max_depth=3, shadow_samples=2)


def grid_scene(side=10):
    objs = [{"type": "plane", "position": [0, -0.6, 0],
             "normal": [0, 1, 0],
             "material": {"type": "lambertian", "color": [0.5, 0.5, 0.5]}}]
    mats = [{"type": "lambertian", "color": [0.8, 0.3, 0.3]},
            {"type": "metal", "color": [0.8, 0.8, 0.9], "roughness": 0.2}]
    for i in range(side ** 3):
        ix, iy, iz = i % side, (i // side) % side, i // side ** 2
        objs.append({"type": "sphere",
                     "position": [(ix - side / 2) * 1.1, iy * 1.1 + 0.2,
                                  (iz - side / 2) * 1.1 - 9.0],
                     "radius": 0.32, "material": mats[i % 2]})
    return rt.scene_from_dict({
        "camera": {"position": [0, 3, 9], "aspectRatio": 1.33},
        "objects": objs,
        "lights": [{"type": "point", "position": [6, 20, 12],
                    "color": [1, 1, 1], "intensity": 2.0}]})[0]


def timeit(fn, reps=2):
    out = fn()
    jax.block_until_ready(out)
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def measure(name, scene, keep_accel):
    params, merge = diff_mod.split_params(scene, keep_accel=keep_accel)

    @jax.jit
    def fwd(p):
        return jnp.sum(diff_mod.render_image(merge(p), W, H, SPP, CFG))

    @jax.jit
    def both(p):
        return jax.value_and_grad(fwd.__wrapped__)(p)

    t_f = timeit(lambda: fwd(params))
    t_g = timeit(lambda: both(params))
    print(f"[{name}] accel={keep_accel}  forward {t_f:6.2f} s   "
          f"value_and_grad {t_g:6.2f} s   ratio {t_g/t_f:.2f}x", flush=True)


def main():
    g = grid_scene(10)
    measure("grid-1001", g, False)
    measure("grid-1001", g, True)
    tmp = tempfile.mkdtemp(prefix="rt_gs_")
    m = rt.scene_from_dict(mesh_scene_dict(tmp, 4), base_dir=tmp)[0]
    measure("ico-10241", m, True)
    measure("ico-10241", m, False)


if __name__ == "__main__":
    main()

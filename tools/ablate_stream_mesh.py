"""Decompose the stream-mode mesh frame cost (fresh profile before any
optimization, per CLAUDE.md): soft-shadow share, bounce tail, mask cost.

Configs at 800x600/20spp on the 10K-tri mesh scene:
  full     d50 soft16      (the headline config)
  hard     d50 soft off    (soft loop share)
  d1       d1  soft16      (bounce-0 only)
  d8       d8  soft16      (tail share)
  eps      d50 soft16 + throughput_epsilon=5e-4 (production tail cut)
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

import numpy as np
import jax.numpy as jnp

import raytrace_tpu as rt
from raytrace_tpu import renderer as renderer_mod
from raytrace_tpu import trace as trace_mod
from raytrace_tpu.ops import megakernel as mk
from tools.tpu_stream_smoke import mesh_scene_dict

W, H, SPP = 800, 600, 20


def bench(scene, cfg, reps=3):
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
    tmp = tempfile.mkdtemp(prefix="rt_abl_")
    scene = rt.scene_from_dict(mesh_scene_dict(tmp, 4), base_dir=tmp)[0]
    assert mk._kernel_mode(scene) == "stream"
    base = trace_mod.TraceConfig(max_depth=50)
    configs = [
        ("full d50 soft16", base),
        ("hard d50", dataclasses.replace(base, soft_shadows=False)),
        ("d1 soft16", dataclasses.replace(base, max_depth=1)),
        ("d8 soft16", dataclasses.replace(base, max_depth=8)),
        ("d50 soft16 eps5e-4",
         dataclasses.replace(base, throughput_epsilon=5e-4)),
    ]
    for name, cfg in configs:
        t = bench(scene, cfg)
        print(f"{name:24s} {t*1e3:8.0f} ms "
              f"({W*H*SPP/t:,.0f} rays/s)", flush=True)


if __name__ == "__main__":
    main()

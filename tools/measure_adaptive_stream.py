"""Adaptive sampling ON a stream scene, measured on TPU (round 5,
VERDICT r4 #3): ico-10241, adaptive 8..100 rel_tol 0.02 vs the
fixed-100 chunked frame. Decisions: host-f64 vs device-f32 accumulation
must agree (spp maps identical) — checked at 320x240 to keep the
host-accum tunnel pulls bounded; the headline wall number runs
device-accum at 800x600.
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

faulthandler.dump_traceback_later(300, repeat=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

import raytrace_tpu as rt
from raytrace_tpu import adaptive as adaptive_mod
from raytrace_tpu import trace as trace_mod
from raytrace_tpu.ops import megakernel as mk
from tools.tpu_stream_smoke import mesh_scene_dict

CFG = trace_mod.TraceConfig(max_depth=50)


def main():
    tmp = tempfile.mkdtemp(prefix="rt_as_")
    scene = rt.scene_from_dict(mesh_scene_dict(tmp, 4), base_dir=tmp)[0]
    assert mk._kernel_mode(scene) == "stream"

    # decisions: host-f64 oracle vs device accumulation, 320x240
    kw_s = dict(width=320, height=240, cfg=CFG, min_spp=8, max_spp=100,
                batch=8, rel_tol=0.02, abs_tol=1e-3, engine="pallas")
    _, spp_h = adaptive_mod.render_adaptive(scene, **kw_s)
    _, spp_d = adaptive_mod.render_adaptive(scene, accum="device", **kw_s)
    same = np.array_equal(np.asarray(spp_h), np.asarray(spp_d))
    print(f"[ico-10241] 320x240 host/device spp decisions identical: "
          f"{same}  mean spp {np.asarray(spp_d).mean():.1f}", flush=True)
    assert same

    # headline: 800x600 device accumulation, warm wall
    kw = dict(width=800, height=600, cfg=CFG, min_spp=8, max_spp=100,
              batch=8, rel_tol=0.02, abs_tol=1e-3, engine="pallas",
              accum="device")
    adaptive_mod.render_adaptive(scene, **kw)  # compile/warm
    t0 = time.perf_counter()
    img, spp = adaptive_mod.render_adaptive(scene, **kw)
    wall = time.perf_counter() - t0
    spp = np.asarray(spp)
    print(f"[ico-10241] adaptive 8..100 tol 0.02 (device accum): "
          f"{wall:.1f} s wall, mean spp {spp.mean():.1f} "
          f"(hit-px mean {spp[spp > 0].mean():.1f}), max {spp.max()}  "
          f"vs fixed-100 chunked 34.0 s", flush=True)


if __name__ == "__main__":
    main()

"""A/B the per-row cone guard in the fused stream soft walk (round 5).

Run once per env setting (the knobs are read at trace time and are not
part of the jit key, so comparisons need fresh processes):

    RT_STREAM_FUSED_SOFT=1 python tools/measure_guard.py mesh
    RT_STREAM_FUSED_SOFT=1 RT_SOFT_ROW_GUARD=0 python tools/measure_guard.py mesh

Prints ms/frame plus a sha256 of a small deterministic render — equal
hashes across guard on/off prove the guard never flipped a verdict.
"""
import os as _os0
import sys as _sys0

if _os0.environ.get("PYTHONHASHSEED") != "0":
    _os0.environ["PYTHONHASHSEED"] = "0"
    _os0.execv(_sys0.executable, [_sys0.executable] + _sys0.argv)

import hashlib
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
from tools.tpu_stream_smoke import mesh_scene_dict, grid_scene_dict

W, H = 800, 600


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "mesh"
    tmp = tempfile.mkdtemp(prefix="rt_g5_")
    if which == "mesh":
        scene = rt.scene_from_dict(mesh_scene_dict(tmp, 4), base_dir=tmp)[0]
        spp = 20
    else:
        scene = rt.scene_from_dict(grid_scene_dict(18))[0]
        spp = 5
    assert mk._kernel_mode(scene) == "stream"
    tag = (f"fused={os.environ.get('RT_STREAM_FUSED_SOFT', '0')} "
           f"guard={os.environ.get('RT_SOFT_ROW_GUARD', '0')} "
           f"wide={os.environ.get('RT_WIDE_BVH', '1')}")

    # bit-identity probe: small deterministic frame, full depth
    cfg_small = trace_mod.TraceConfig(max_depth=6, shadow_samples=4)
    img_s = np.asarray(renderer_mod.render_wavefront(
        scene, width=160, height=120, samples=2, cfg=cfg_small))
    digest = hashlib.sha256(img_s.tobytes()).hexdigest()[:16]

    cfg = trace_mod.TraceConfig(max_depth=50)
    kw = dict(width=W, height=H, samples=spp, cfg=cfg)
    img = renderer_mod.render_wavefront(scene, as_numpy=False, **kw)
    float(jnp.max(img))
    best = 1e30
    for _ in range(2):
        t0 = time.perf_counter()
        img = renderer_mod.render_wavefront(
            scene, as_numpy=False, assume_capacity=True, **kw)
        float(img[0][0, 0])
        renderer_mod.flush_capacity_checks()
        best = min(best, time.perf_counter() - t0)
    print(f"[{which}] {tag}  {best*1e3:.0f} ms @ {spp} spp "
          f"({W*H*spp/best:,.0f} rays/s)  hash {digest}", flush=True)


if __name__ == "__main__":
    main()

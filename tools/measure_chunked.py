"""Full production-spp frames on stream scenes via chunked dispatch
(round 5, VERDICT r4 #2): ico-10241 and grid-5833 render REAL
800x600/100spp frames end to end — sample rounds of RT_CHUNK_SPP
samples per dispatch keep every dispatch under the tunneled worker's
execution watchdog. Also pins chunked == unchunked at small scale on
the real chip.

Usage: python tools/measure_chunked.py [mesh|grid|both]
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
from raytrace_tpu import renderer as renderer_mod
from raytrace_tpu import trace as trace_mod
from raytrace_tpu.ops import megakernel as mk
from tools.tpu_stream_smoke import mesh_scene_dict, grid_scene_dict

W, H, SPP = 800, 600, 100


def full_frame(name, scene, chunk):
    cfg = trace_mod.TraceConfig(max_depth=50)
    t0 = time.perf_counter()
    img = renderer_mod.render_wavefront_chunked(
        scene, width=W, height=H, samples=SPP, cfg=cfg, chunk=chunk,
        as_numpy=False)
    s = float(jnp.sum(img))  # one sync: the frame really completed
    wall = time.perf_counter() - t0
    # steady state: capacity cached, per-round pipelining
    t0 = time.perf_counter()
    img = renderer_mod.render_wavefront_chunked(
        scene, width=W, height=H, samples=SPP, cfg=cfg, chunk=chunk,
        as_numpy=False, assume_capacity=True)
    s2 = float(jnp.sum(img))
    renderer_mod.flush_capacity_checks()
    warm = time.perf_counter() - t0
    assert np.isfinite(s) and s > 0
    print(f"[{name}] FULL {W}x{H}/{SPP}spp frame: cold {wall:.1f} s, "
          f"warm {warm:.1f} s ({W*H*SPP/warm:,.0f} rays/s), "
          f"chunk {chunk} spp/dispatch, checksum {s2:.6g}", flush=True)


def equality(name, scene):
    cfg = trace_mod.TraceConfig(max_depth=6, shadow_samples=4)
    a = np.asarray(renderer_mod.render_wavefront(
        scene, width=160, height=120, samples=4, cfg=cfg))
    b = np.asarray(renderer_mod.render_wavefront_chunked(
        scene, width=160, height=120, samples=4, cfg=cfg, chunk=2))
    err = np.abs(a - b).max()
    print(f"[{name}] chunked-vs-unchunked 160x120/4spp maxerr {err:.3g} "
          f"(round-boundary f32 reassociation only)", flush=True)
    assert err < 1e-5


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    tmp = tempfile.mkdtemp(prefix="rt_ck_")
    if which in ("mesh", "both"):
        mesh = rt.scene_from_dict(mesh_scene_dict(tmp, 4), base_dir=tmp)[0]
        equality("ico-10241", mesh)
        full_frame("ico-10241", mesh, chunk=10)
    if which in ("grid", "both"):
        grid = rt.scene_from_dict(grid_scene_dict(18))[0]
        equality("grid-5833", grid)
        full_frame("grid-5833", grid, chunk=5)


if __name__ == "__main__":
    main()

"""A/B the 4-wide BVH stack walk vs the binary skip walk on TPU.

Ring-N scenes, d50/soft16 at 800x600/20spp. Settled 2026-08-19: wide4
measured 0.900x/0.893x the binary walk on ring-250/1000 and is the
default (BENCHMARKS.md optimization history). The binary variant is
selected by stripping accel.wide4 from the scene pytree (a different
pytree -> its own jit program), so both run in one process/tunnel
session.

Usage: python tools/measure_wide_bvh.py [n_spheres ...]
"""
import dataclasses
import os
import sys

if os.environ.get("PYTHONHASHSEED") != "0":
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax.numpy as jnp

import raytrace_tpu as rt
from raytrace_tpu import renderer as renderer_mod
from raytrace_tpu import trace as trace_mod
from raytrace_tpu.bench.suite import ring_scene_dict

W, H, SPP = 800, 600, 20
cfg = trace_mod.TraceConfig(max_depth=50)


def measure(scene, label):
    frame = lambda: renderer_mod.render_wavefront(
        scene, width=W, height=H, samples=SPP, cfg=cfg,
        as_numpy=False, assume_capacity=True)
    t0 = time.perf_counter()
    first = float(jnp.sum(frame()))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s = float(jnp.sum(frame()))
        best = min(best, time.perf_counter() - t0)
    renderer_mod.flush_capacity_checks()
    print(f"{label}: best {best * 1e3:8.1f} ms/frame "
          f"(first+compile {compile_s:6.1f} s, checksum {s:.4f} "
          f"vs first {first:.4f})", flush=True)
    return best, s


def main():
    ns = [int(a) for a in sys.argv[1:]] or [250, 1000]
    for n in ns:
        scene, _ = rt.scene_from_dict(ring_scene_dict(n_spheres=n))
        assert scene.accel is not None and scene.accel.wide4 is not None
        scene_bin = dataclasses.replace(
            scene, accel=dataclasses.replace(scene.accel, wide4=None))
        t_w, s_w = measure(scene, f"ring-{n} wide4 ")
        t_b, s_b = measure(scene_bin, f"ring-{n} binary")
        assert abs(s_w - s_b) < 1e-3 * max(abs(s_w), 1.0), (s_w, s_b)
        print(f"ring-{n}: wide/binary = {t_w / t_b:.3f}x "
              f"({'WIDE WINS' if t_w < t_b else 'binary wins'})",
              flush=True)


if __name__ == "__main__":
    main()

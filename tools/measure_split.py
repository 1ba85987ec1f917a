"""A/B the bounce-2 survivor re-compaction split on TPU ring scenes.

The bvh-mode bounce tail (bounces 2..50) costs ~75% of a ring frame on
<=1% live lanes spread over every block (tools/ablate_ring1000.py);
RT_SPLIT=2 re-packs survivors at bounce 2 (the default is OFF since the
2026-08-19 TPU measurement: split2/unsplit = 1.93x on ring-250, 1.18x on
ring-1000 - a regression). RT_SPLIT is read per-frame by pick_split
(outside jit), so one process measures both variants. d50/soft16,
800x600/20spp.

Usage: python tools/measure_split.py [n_spheres ...]
"""
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
        os.environ["RT_SPLIT"] = "2"
        assert renderer_mod.pick_split(scene, cfg) > 0
        t_s, c_s = measure(scene, f"ring-{n} split2 ")
        os.environ.pop("RT_SPLIT", None)
        assert renderer_mod.pick_split(scene, cfg) == 0
        t_u, c_u = measure(scene, f"ring-{n} unsplit")
        # fp reassociation only (radA + radB): checksums agree closely
        assert abs(c_s - c_u) < 1e-3 * max(abs(c_u), 1.0), (c_s, c_u)
        print(f"ring-{n}: split/unsplit = {t_s / t_u:.3f}x "
              f"({'SPLIT WINS' if t_s < t_u else 'unsplit wins'})",
              flush=True)


if __name__ == "__main__":
    main()

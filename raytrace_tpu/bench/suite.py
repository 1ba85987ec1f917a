"""Benchmark suite: the WORKING form of internal/benchmarking + cmd/benchmark.

The reference's suite never compiled (imports the broken optimization
package, comprehensive_benchmark.go:15) and its CLI "benchmark" started a
worker pool then slept (cmd/benchmark/main.go:111-152), *deriving* rays/s
from pixel count instead of measuring. This suite actually renders:

  * grid sweep over samples x resolution x scenes with warmup
    (comprehensive_benchmark.go:78-120);
  * the same synthetic scene family (10-sphere ring, :163-185);
  * min/max/avg/median/stddev stats (:227-297);
  * JSON report + table printout (cmd/benchmark/main.go:161-287);
  * rays/s uses the reference's definition (pixels/s x samples,
    cmd/benchmark/main.go:125-127) so numbers are comparable.
"""

from __future__ import annotations

import dataclasses
import json
import math
import statistics
import time
from typing import Dict, List, Optional, Sequence

import numpy as np

from .. import renderer as renderer_mod
from .. import scene as scene_mod


def ring_scene_dict(n_spheres: int = 10, radius: float = 5.0):
    """Synthetic benchmark scene (comprehensive_benchmark.go:163-185):
    a ring of spheres around the origin with mixed materials, plus a
    ground sphere standing in for the plane (the JSON schema cannot
    express planes; scene.go:69-83 supports only sphere/cube)."""
    objs = [{"type": "sphere", "position": [0, -1000.5, 0], "radius": 1000,
             "material": {"type": "lambertian", "color": [0.5, 0.5, 0.5]}}]
    mats = [{"type": "lambertian", "color": [0.8, 0.3, 0.3]},
            {"type": "metal", "color": [0.8, 0.8, 0.9], "roughness": 0.1},
            {"type": "glass", "color": [0.9, 0.9, 0.9]}]
    for i in range(n_spheres):
        ang = 2.0 * math.pi * i / n_spheres
        objs.append({
            "type": "sphere",
            "position": [radius * math.cos(ang), 0.0,
                         radius * math.sin(ang) - 8.0],
            "radius": 0.5,
            "material": mats[i % len(mats)],
        })
    return {
        "camera": {"position": [0, 1, 8], "aspectRatio": 1.333},
        "objects": objs,
        "lights": [{"type": "point", "position": [5, 10, 5],
                    "color": [1, 1, 1], "intensity": 2.0}],
    }


@dataclasses.dataclass
class BenchmarkConfig:
    """Sweep axes (cmd/benchmark/main.go:290-301)."""

    width: int = 400
    height: int = 300
    samples_list: Sequence[int] = (4, 16)
    max_depth: int = 50
    scenes: Sequence[str] = ("ring",)
    repetitions: int = 3
    warmup: int = 1


@dataclasses.dataclass
class BenchmarkResult:
    scene: str
    width: int
    height: int
    samples: int
    max_depth: int
    times_seconds: List[float]
    min_s: float
    max_s: float
    avg_s: float
    median_s: float
    stddev_s: float
    pixels_per_second: float
    rays_per_second: float

    def to_dict(self) -> Dict:
        return dataclasses.asdict(self)


def _stats(times: List[float]) -> Dict[str, float]:
    return {
        "min_s": min(times),
        "max_s": max(times),
        "avg_s": sum(times) / len(times),
        "median_s": statistics.median(times),
        "stddev_s": statistics.pstdev(times) if len(times) > 1 else 0.0,
    }


class BenchmarkSuite:
    """Actually-rendering grid sweep (comprehensive_benchmark.go:62-110)."""

    def __init__(self, config: Optional[BenchmarkConfig] = None):
        self.config = config or BenchmarkConfig()
        self.results: List[BenchmarkResult] = []

    def _scene(self, name: str):
        if name == "ring":
            s, _ = scene_mod.from_dict(ring_scene_dict())
            return s
        s, _ = scene_mod.load(name)
        return s

    def run(self, progress: bool = True) -> List[BenchmarkResult]:
        cfg = self.config
        for scene_name in cfg.scenes:
            scene = self._scene(scene_name)
            for samples in cfg.samples_list:
                r = renderer_mod.Renderer()
                r.set_samples(samples)
                r.set_max_depth(cfg.max_depth)
                for _ in range(cfg.warmup):
                    r.render_linear(scene, cfg.width, cfg.height)
                times = []
                for _ in range(cfg.repetitions):
                    t0 = time.perf_counter()
                    r.render_linear(scene, cfg.width, cfg.height)
                    times.append(time.perf_counter() - t0)
                st = _stats(times)
                px_s = cfg.width * cfg.height / st["min_s"]
                res = BenchmarkResult(
                    scene=scene_name, width=cfg.width, height=cfg.height,
                    samples=samples, max_depth=cfg.max_depth,
                    times_seconds=times, pixels_per_second=px_s,
                    # rays/s = px/s * samples (cmd/benchmark/main.go:125-127)
                    rays_per_second=px_s * samples, **st)
                self.results.append(res)
                if progress:
                    print(f"{scene_name} {cfg.width}x{cfg.height} "
                          f"spp={samples}: {st['min_s']:.3f}s  "
                          f"{res.rays_per_second / 1e6:.1f}M rays/s")
        return self.results

    # -- reporting (cmd/benchmark/main.go:161-287) --------------------------
    def report_dict(self) -> Dict:
        return {
            "config": dataclasses.asdict(self.config),
            "results": [r.to_dict() for r in self.results],
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
        }

    def save_report(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.report_dict(), f, indent=2, default=list)

    def print_table(self) -> None:
        hdr = (f"{'scene':<24} {'res':>9} {'spp':>5} {'min':>8} "
               f"{'median':>8} {'rays/s':>12}")
        print(hdr)
        print("-" * len(hdr))
        for r in self.results:
            print(f"{r.scene:<24} {r.width}x{r.height:>4} {r.samples:>5} "
                  f"{r.min_s:>8.3f} {r.median_s:>8.3f} "
                  f"{r.rays_per_second:>12,.0f}")


def quick_benchmark(width: int = 200, height: int = 150,
                    samples: int = 4) -> BenchmarkResult:
    """QuickBenchmark (comprehensive_benchmark.go:393-404)."""
    suite = BenchmarkSuite(BenchmarkConfig(
        width=width, height=height, samples_list=(samples,),
        repetitions=2, warmup=1))
    return suite.run(progress=False)[0]


def memory_benchmark(n_spheres: int = 1000) -> Dict:
    """MemoryBenchmark (comprehensive_benchmark.go:406-424): device/host
    memory delta for building a large scene + its BVH."""
    from .. import bvh as bvh_mod
    from .. import obs
    before = obs.host_memory_in_use()
    d = ring_scene_dict(n_spheres=n_spheres)
    scene, _ = scene_mod.from_dict(d)
    t0 = time.perf_counter()
    tree = bvh_mod.build_sphere_bvh(np.asarray(scene.geometry.sph_center),
                                    np.asarray(scene.geometry.sph_radius))
    build_s = time.perf_counter() - t0
    return {
        "spheres": n_spheres,
        "bvh_nodes": int(tree.node_min.shape[0]),
        "bvh_build_seconds": build_s,
        "host_memory_delta_bytes": obs.host_memory_in_use() - before,
    }


def scaling_benchmark(width: int = 400, height: int = 300,
                      samples: int = 8,
                      mesh_shapes: Sequence[int] = (1, 2, 4, 8)) -> Dict:
    """Scaling-efficiency sweep over virtual mesh sizes.

    The reference computed a degenerate efficiency (always 100/workers,
    comprehensive_benchmark.go:385); this measures real renders over
    meshes of increasing size. On a single chip the mesh is virtual (one
    device repeated is impossible, so shapes are capped at the device
    count) - on a pod slice this is the 1-chip/1-host/N-host curve.
    """
    import jax
    from .. import parallel
    from .. import trace as trace_mod

    scene, _ = scene_mod.from_dict(ring_scene_dict())
    cfg = trace_mod.TraceConfig(max_depth=10, shadow_samples=4)
    n_dev = jax.device_count()
    out = {"shapes": [], "times": [], "efficiency": []}
    base = None
    for n in mesh_shapes:
        if n > n_dev:
            break
        mesh = parallel.make_mesh(jax.devices()[:n], px=n, sp=1)
        f = lambda: parallel.render_linear_sharded(
            scene, width, height, samples=samples, cfg=cfg, mesh=mesh)
        f()
        t0 = time.perf_counter()
        f()
        dt = time.perf_counter() - t0
        base = base if base is not None else dt
        out["shapes"].append(n)
        out["times"].append(dt)
        out["efficiency"].append(base / (dt * n))
    return out

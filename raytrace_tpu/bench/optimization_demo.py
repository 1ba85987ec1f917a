"""Optimization demo CLI: working form of cmd/optimization_demo (which
never compiled - it called a phantom NewOptimizedParallelRenderer,
cmd/optimization_demo/main.go:224).

Demos, matching the reference's intended flow (main.go:19-42):
  1. fast-math printout (:44-76);
  2. BVH/Octree/KD-tree build over 1000 procedural spheres +
     naive-vs-BVH intersection timing (:78-135);
  3. memory accounting for the structures (:137-183 object-pool demo ->
     on TPU there is no object churn; reported as allocation stats);
  4. a real benchmark-suite run (:185-211);
  5. an "optimized" render reporting BVH build time - the metric the
     demo-asset benchmark JSONs carry (bvh_build_time, README.md:53).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

# Honor RT_PLATFORM before any JAX computation (see ../cli.py).
if os.environ.get("RT_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["RT_PLATFORM"])


def demo_fast_math() -> None:
    import jax.numpy as jnp
    from .. import fastmath as fm
    print("=== fast math ===")
    x = jnp.asarray([2.0, 16.0, 0.5])
    print("sqrt:", np.asarray(fm.fast_sqrt(x)))
    print("rsqrt:", np.asarray(fm.fast_inv_sqrt(x)))
    print("smoothstep(0,1,0.3):",
          float(fm.fast_smooth_step(0.0, 1.0, 0.3)))
    r = fm.FastRandom(42)
    print("xorshift64* x3:", [f"{r.float64():.6f}" for _ in range(3)])


def demo_spatial(n_spheres: int = 1000, n_rays: int = 4096) -> dict:
    import jax.numpy as jnp
    from .. import bvh as bvh_mod
    from ..ops import intersect
    print(f"=== spatial acceleration over {n_spheres} spheres ===")
    rng = np.random.default_rng(0)
    centers = rng.uniform(-50, 50, (n_spheres, 3)).astype(np.float32)
    radii = rng.uniform(0.2, 1.5, n_spheres).astype(np.float32)

    t0 = time.perf_counter()
    tree = bvh_mod.build_sphere_bvh(centers, radii)
    bvh_build_s = time.perf_counter() - t0
    print(f"BVH: {int(tree.node_min.shape[0])} nodes "
          f"in {bvh_build_s * 1e3:.2f} ms")

    lo = centers - radii[:, None]
    hi = centers + radii[:, None]
    t0 = time.perf_counter()
    octree = bvh_mod.Octree(lo, hi)
    print(f"Octree: {octree.node_count()} nodes "
          f"in {(time.perf_counter() - t0) * 1e3:.2f} ms")
    t0 = time.perf_counter()
    kd = bvh_mod.KDTree(lo, hi)
    print(f"KD-tree: depth {kd.depth()} "
          f"in {(time.perf_counter() - t0) * 1e3:.2f} ms")

    o = rng.uniform(-60, 60, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    cj, rj = jnp.asarray(centers), jnp.asarray(radii)

    def time_it(f):
        f()  # compile
        t0 = time.perf_counter()
        np.asarray(f())
        return time.perf_counter() - t0

    naive_s = time_it(lambda: intersect.sphere_t(
        oj, dj, cj, rj, 1e-3, intersect.BIG).min(axis=1))
    bvh_s = time_it(lambda: bvh_mod.closest_hit_bvh(
        tree, cj, rj, oj, dj)[0])
    print(f"naive closest-hit: {naive_s * 1e3:.2f} ms; "
          f"BVH: {bvh_s * 1e3:.2f} ms "
          f"({naive_s / max(bvh_s, 1e-9):.1f}x)")

    # Host-side octree/KD ray traversal (spatial_acceleration.go:141-300
    # made to work): mean candidate count per ray vs the n_spheres scan.
    sub = min(64, n_rays)
    t0 = time.perf_counter()
    oc_cands = [len(octree.query_ray(o[i], d[i])) for i in range(sub)]
    oc_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    kd_cands = [len(kd.query_ray(o[i], d[i])) for i in range(sub)]
    kd_s = time.perf_counter() - t0
    print(f"octree ray query: {np.mean(oc_cands):.1f} candidates/ray "
          f"(vs {n_spheres} naive), {oc_s / sub * 1e3:.2f} ms/ray; "
          f"kd: {np.mean(kd_cands):.1f}, {kd_s / sub * 1e3:.2f} ms/ray")
    return {"bvh_build_seconds": bvh_build_s, "naive_seconds": naive_s,
            "bvh_seconds": bvh_s}


def demo_benchmark_suite() -> None:
    from .suite import BenchmarkConfig, BenchmarkSuite
    print("=== benchmark suite (ring scene) ===")
    suite = BenchmarkSuite(BenchmarkConfig(
        width=200, height=150, samples_list=(4,), max_depth=10,
        repetitions=2, warmup=1))
    suite.run()
    suite.print_table()


def demo_optimized_render() -> None:
    from .suite import ring_scene_dict
    from .. import bvh as bvh_mod
    from .. import renderer as renderer_mod
    from .. import scene as scene_mod
    print("=== optimized render with BVH metrics ===")
    scene, _ = scene_mod.from_dict(ring_scene_dict(n_spheres=10))
    t0 = time.perf_counter()
    bvh_mod.build_sphere_bvh(np.asarray(scene.geometry.sph_center),
                             np.asarray(scene.geometry.sph_radius))
    bvh_build_s = time.perf_counter() - t0
    r = renderer_mod.Renderer()
    r.set_samples(4)
    r.set_max_depth(10)
    t0 = time.perf_counter()
    r.render_linear(scene, 200, 150)
    render_s = time.perf_counter() - t0
    print(f"bvh_build_time: {bvh_build_s * 1e6:.1f} us; "
          f"render: {render_s:.3f} s")


def main(argv=None) -> int:
    demo_fast_math()
    demo_spatial()
    demo_benchmark_suite()
    demo_optimized_render()
    return 0


if __name__ == "__main__":
    sys.exit(main())

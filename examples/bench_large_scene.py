"""Large-scene TPU benchmark: the reference's 1000-sphere ring workload.

The reference's benchmark suite builds ring scenes up to 1000 spheres
(internal/benchmarking/comprehensive_benchmark.go:163-185;
cmd/optimization_demo/main.go:78-135) but its BVH was never wired into
rendering, so those scenes ran the O(n) hitWorld scan. Here the same
scene family runs the packet-BVH Pallas megakernel (scene tables in
SMEM, skip-pointer walk) and is compared against the jnp engine (which
walks the BVH on CPU but stays brute-force on TPU - gather-walk traversal
is a net loss there, see intersect.use_accel).

Usage:  python examples/bench_large_scene.py [n_spheres ...]
"""

import os as _os0
import sys as _sys0

# Stable Pallas cache keys (see bench.py).
if _os0.environ.get("PYTHONHASHSEED") != "0":
    _os0.environ["PYTHONHASHSEED"] = "0"
    _os0.execv(_sys0.executable, [_sys0.executable] + _sys0.argv)

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

import raytrace_tpu as rt
from raytrace_tpu import renderer as renderer_mod
from raytrace_tpu.bench.suite import ring_scene_dict
from raytrace_tpu.ops import megakernel

W, H, SPP, DEPTH = 800, 600, 100, 50
# The uncompacted jnp engine pays every bounce over every lane x every
# primitive; at depth 50 that is minutes/frame for 1000 primitives (and a
# single band program would outlive the tunneled worker's execution
# watchdog). Its rays/s are spp-independent to first order, so measure it
# at a lighter sample count and report the normalized rate.
JNP_SPP = 10


def measure(scene, engine, batch=8, reps=3, spp=SPP):
    r = rt.Renderer()
    r.engine = engine
    r.set_samples(spp)
    r.set_max_depth(DEPTH)
    cfg = r.trace_config()
    t0 = time.perf_counter()
    img = r.render_linear(scene, W, H)
    compile_s = time.perf_counter() - t0
    assert float(np.asarray(img).max()) > 0.0
    kw = dict(width=W, height=H, samples=spp, cfg=cfg)
    if engine == "pallas":
        frame = lambda: renderer_mod.render_wavefront(
            scene, as_numpy=False, assume_capacity=True, **kw)
    else:
        bh = renderer_mod.pick_band_height(
            W, H, spp, n_prims=renderer_mod.scene_prim_count(scene))

        def frame():
            bands = [renderer_mod.render_band(
                scene, jnp.int32(y0), width=W, height=H, band_h=bh,
                samples=spp, cfg=cfg) for y0 in range(0, H, bh)]
            return jnp.concatenate(bands, axis=0)[:H]
    float(jnp.sum(frame()))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [frame() for _ in range(batch)]
        float(jnp.sum(outs[-1]))
        best = min(best, (time.perf_counter() - t0) / batch)
    return best, compile_s, img


def equivalence_check(scene):
    """Small-frame pallas-vs-jnp check (full-size equivalence is pinned by
    tests/test_bvh_accel.py and test_megakernel.py).

    Returns (maxerr, bad_px, total_px). On the ring-N scenes the N ring
    spheres are spaced 2*pi*5/N apart with radius 0.5, so past ~60 spheres
    they interpenetrate and grazing rays produce sphere discriminants
    below f32 resolution (|half_b^2 - a*c| < ulp(half_b^2)); whether such
    a ray hits is undecidable in f32 and Mosaic/XLA legitimately round the
    fused expression differently. Those knife-edge lanes (O(1e-4) of
    pixels at n=1000) then walk divergent paths. The gate is therefore
    statistical here - bad-pixel FRACTION - while the non-degenerate test
    scenes keep strict maxerr gates (see tools/debug_pixel.py for the
    measurement that pinned this)."""
    r = rt.Renderer()
    r.engine = "jnp"
    r.set_samples(2)
    r.set_max_depth(8)
    cfg = r.trace_config()
    img_j = np.asarray(r.render_linear(scene, 160, 120))
    img_p = np.asarray(renderer_mod.render_wavefront(
        scene, width=160, height=120, samples=2, cfg=cfg))
    d = np.abs(img_p - img_j).max(axis=-1)
    return float(d.max()), int((d > 1e-3).sum()), d.size


def main():
    ns = [int(a) for a in sys.argv[1:]] or [250, 1000]
    for n in ns:
        scene, _ = rt.scene_from_dict(ring_scene_dict(n_spheres=n))
        nprim = int(scene.geometry.sph_center.shape[0])
        assert scene.accel is not None, "BVH should auto-attach"
        mode = megakernel._kernel_mode(scene)
        print(f"--- ring n={n} ({nprim} prims, kernel mode={mode}) ---",
              flush=True)
        best, compile_s, img_p = measure(scene, "pallas")
        rps = W * H * SPP / best
        print(f"pallas: {best*1e3:8.1f} ms/frame  {rps:,.0f} rays/s  "
              f"({SPP} spp, compile {compile_s:.0f}s)", flush=True)
        best_j, compile_j, _ = measure(scene, "jnp", batch=1, reps=2,
                                       spp=JNP_SPP)
        rps_j = W * H * JNP_SPP / best_j
        print(f"jnp:    {best_j*1e3:8.1f} ms/frame  {rps_j:,.0f} rays/s  "
              f"({JNP_SPP} spp, compile {compile_j:.0f}s)", flush=True)
        err, bad, tot = equivalence_check(scene)
        frac = bad / tot
        print(f"pallas vs jnp (160x120/2spp/depth-8): maxerr {err:.2e}, "
              f"divergent px {bad}/{tot} ({frac:.1e}; f32-undecidable "
              f"grazing hits on interpenetrating spheres)", flush=True)
        assert frac <= 1e-3, "engine divergence beyond knife-edge budget"


if __name__ == "__main__":
    main()

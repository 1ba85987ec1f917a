"""TPU validation + perf for the DMA-streamed BVH kernel (round 4).

Two >4096-primitive workloads that the round-3 framework could only
render via the chunked-jnp fallback (250-500x slower):

  * grid-5833: an 18^3 grid of non-overlapping mixed-material spheres
    over a ground PLANE (non-degenerate spheres by construction; the
    plane ground avoids the giant-sphere f32-undecidable grazing
    predicates, BENCHMARKS.md "Engine equivalence");
  * ico-10241: two 4x-subdivided smooth-shaded icosphere meshes
    (10,240 triangles - the OBJ-import workload class, models/mesh.py)
    over a ground plane.

For each: correctness vs the jnp oracle at small res, then the
sustained-frame benchmark (device-resident outputs, pipelined batch,
one checksum sync - bench.py methodology).

Usage: python tools/tpu_stream_smoke.py [--perf-only|--check-only]
"""

import os as _os0
import sys as _sys0

if _os0.environ.get("PYTHONHASHSEED") != "0":
    _os0.environ["PYTHONHASHSEED"] = "0"
    _os0.execv(_sys0.executable, [_sys0.executable] + _sys0.argv)

import os
import sys
import time

import faulthandler

# Periodic stack dumps: first-compile waits through the tunnel can look
# like hangs (CLAUDE.md); the dumps say which call is actually blocked.
faulthandler.dump_traceback_later(180, repeat=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

import raytrace_tpu as rt
from raytrace_tpu import renderer as renderer_mod
from raytrace_tpu.ops import megakernel as mk

W, H, SPP, DEPTH = 800, 600, 100, 50


def grid_scene_dict(side: int = 18):
    # Ground is a PLANE, not the ring scenes' r=1000 sphere: giant-sphere
    # grazing rays have f32-undecidable discriminants that Mosaic and XLA
    # round differently (BENCHMARKS.md "Engine equivalence"; measured
    # identically in bvh and stream modes by tools/
    # debug_stream_divergence.py), while the plane's denominator test is
    # exact in both engines.
    objs = [{"type": "plane", "position": [0, -0.5, 0],
             "normal": [0, 1, 0],
             "material": {"type": "lambertian", "color": [0.5, 0.5, 0.5]}}]
    mats = [{"type": "lambertian", "color": [0.8, 0.3, 0.3]},
            {"type": "metal", "color": [0.8, 0.8, 0.9], "roughness": 0.1},
            {"type": "glass", "color": [0.9, 0.9, 0.9]}]
    k = 0
    for ix in range(side):
        for iy in range(side):
            for iz in range(side):
                objs.append({
                    "type": "sphere",
                    "position": [(ix - side / 2) * 1.2,
                                 iy * 1.2 + 0.2,
                                 (iz - side / 2) * 1.2 - 16.0],
                    "radius": 0.35,
                    "material": mats[k % 3]})
                k += 1
    return {
        "camera": {"position": [0, 6, 18], "aspectRatio": 1.333},
        "objects": objs,
        "lights": [{"type": "point", "position": [10, 30, 20],
                    "color": [1, 1, 1], "intensity": 2.0}],
    }


def icosphere_obj(subdiv: int = 4) -> str:
    """Midpoint-subdivided unit icosphere OBJ text (20*4^subdiv faces)
    with per-vertex normals (= positions on the unit sphere)."""
    t = (1.0 + 5 ** 0.5) / 2.0
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = [(0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
             (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
             (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
             (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1)]
    verts = [tuple(v) for v in verts]
    cache = {}

    def mid(a, b):
        key = (min(a, b), max(a, b))
        if key not in cache:
            m = np.asarray(verts[a]) + np.asarray(verts[b])
            m /= np.linalg.norm(m)
            cache[key] = len(verts)
            verts.append(tuple(m))
        return cache[key]

    for _ in range(subdiv):
        nxt = []
        for (a, b, c) in faces:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            nxt += [(a, ab, ca), (ab, b, bc), (ca, bc, c), (ab, bc, ca)]
        faces = nxt
    lines = []
    for v in verts:
        lines.append(f"v {v[0]:.9f} {v[1]:.9f} {v[2]:.9f}")
    for v in verts:
        lines.append(f"vn {v[0]:.9f} {v[1]:.9f} {v[2]:.9f}")
    for (a, b, c) in faces:
        lines.append(f"f {a+1}//{a+1} {b+1}//{b+1} {c+1}//{c+1}")
    return "\n".join(lines) + "\n"


def mesh_scene_dict(tmpdir: str, subdiv: int = 4):
    path = os.path.join(tmpdir, f"ico{subdiv}.obj")
    if not os.path.exists(path):
        with open(path, "w") as f:
            f.write(icosphere_obj(subdiv))
    return {
        "camera": {"position": [0, 1, 6], "aspectRatio": 1.333},
        "objects": [
            {"type": "plane", "position": [0, -0.8, 0],
             "normal": [0, 1, 0],
             "material": {"type": "lambertian",
                          "color": [0.5, 0.5, 0.5]}},
            {"type": "mesh", "path": path, "position": [0, 0.6, 0],
             "scale": 1.4, "smooth": True,
             "material": {"type": "metal", "color": [0.8, 0.8, 0.9],
                          "roughness": 0.1}},
            {"type": "mesh", "path": path, "position": [-2.6, 0.4, -1],
             "scale": 1.0, "smooth": True,
             "material": {"type": "lambertian",
                          "color": [0.8, 0.3, 0.3]}},
        ],
        "lights": [{"type": "point", "position": [6, 10, 8],
                    "color": [1, 1, 1], "intensity": 2.0}],
    }


def check_equivalence(name, scene, w=128, h=96, spp=2, depth=4,
                      bvh_bitgate=False, gates=None):
    """Correctness gates, by what each can actually prove:

    1. (bvh_bitgate, scenes small enough for SMEM tables) stream mode
       must be BIT-IDENTICAL to the trusted bvh mode at full depth -
       identical arithmetic, identical walk; any difference is a stream
       bug. This is the real kernel-correctness statement.
    2. vs the jnp oracle: strict divergent-pixel gate at depth 2, a
       loose one at depth `depth`. Dense multi-thousand-prim scenes
       accumulate Mosaic-vs-XLA 1-2 ulp verdict flips LINEARLY in
       primitive count (~0.8% of pixels at 5833 prims, depth 4, 2 spp;
       tools/debug_stream_divergence.py measured the flips IDENTICAL in
       bvh and stream modes), so the deep-gate is on fraction, and the
       flips average out at production spp (each flips one sample's
       path).
    """
    cfg_r = rt.Renderer()
    cfg_r.samples, cfg_r.max_depth = spp, depth
    assert mk._kernel_mode(scene) == "stream", mk._kernel_mode(scene)

    import dataclasses as dc
    if gates is None:
        gates = ((2, 2e-3), (depth, 2e-2))
    for d, gate in gates:
        cfg = dc.replace(cfg_r.trace_config(), max_depth=d)
        t0 = time.perf_counter()
        img = np.asarray(renderer_mod.render_wavefront(
            scene, width=w, height=h, samples=spp, cfg=cfg))
        t1 = time.perf_counter()
        cfg_r.engine = "jnp"
        cfg_r.max_depth = d
        ref = cfg_r.render_linear(scene, w, h)
        t2 = time.perf_counter()
        err = np.abs(img - ref)
        div = (err.max(axis=-1) > 1e-4).mean()
        print(f"[{name}] d{d}: stream {t1-t0:.1f}s jnp {t2-t1:.1f}s "
              f"maxerr {err.max():.3g} divergent-px {div:.2e} "
              f"img-mean {img.mean():.6f}")
        assert img.max() > 0, "black image"
        assert div <= gate, f"d{d} divergence {div} above gate {gate}"

    if bvh_bitgate:
        cfg = dc.replace(cfg_r.trace_config(), max_depth=depth)
        from raytrace_tpu import rng as rng_mod
        from raytrace_tpu import camera as cam_mod
        n_px = w * h
        pix = jnp.repeat(jnp.arange(n_px, dtype=jnp.uint32), spp)
        samp = jnp.tile(jnp.arange(spp, dtype=jnp.uint32), n_px)
        ju, jv, _, _ = rng_mod.uniform4(pix, samp,
                                        rng_mod.Streams.CAMERA_JITTER,
                                        cfg.seed)
        x = (pix % np.uint32(w)).astype(jnp.float32)
        y = (pix // np.uint32(w)).astype(jnp.float32)
        o, d_ = cam_mod.go_rays(scene.camera, (x + ju) / w, (y + jv) / h)
        sm = np.asarray(mk.trace_pallas(scene, o, d_, pix, samp, cfg,
                                        block_rows=16))
        orig = mk.MAX_BVH_KERNEL_PRIMS
        mk.MAX_BVH_KERNEL_PRIMS = 1 << 30  # force bvh (SMEM) mode
        try:
            assert mk._kernel_mode(scene) == "bvh"
            bv = np.asarray(mk.trace_pallas(scene, o, d_, pix, samp, cfg,
                                            block_rows=16))
        finally:
            mk.MAX_BVH_KERNEL_PRIMS = orig
        same = np.array_equal(sm, bv)
        print(f"[{name}] stream==bvh bit-identical: {same}")
        assert same, "stream mode diverged from SMEM bvh mode"
    return True


def measure_perf(name, scene, batch=2, reps=3, spp=None):
    """Sustained rate at `spp` samples (default: 20 — a single 100-spp
    dispatch on these hit-heavy >5K-prim scenes exceeds the tunneled
    worker's ~60-90 s execution watchdog; per-frame cost is linear in
    spp, so the 100-spp frame time is reported scaled, same methodology
    as BENCHMARKS.md's jnp rows)."""
    spp = spp or 20
    r = rt.Renderer()
    r.set_samples(spp)
    r.set_max_depth(DEPTH)
    cfg = r.trace_config()
    kw = dict(width=W, height=H, samples=spp, cfg=cfg)
    t0 = time.perf_counter()
    img = renderer_mod.render_wavefront(scene, as_numpy=False, **kw)
    compile_s = time.perf_counter() - t0
    assert float(jnp.max(img)) > 0
    frame = lambda: renderer_mod.render_wavefront(
        scene, as_numpy=False, assume_capacity=True, **kw)
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(batch):
            acc = acc + frame()[0][0, 0]
        float(acc)  # ONE scalar sync for the whole batch
        renderer_mod.flush_capacity_checks()
        best = min(best, (time.perf_counter() - t0) / batch)
    rays = W * H * spp / best
    print(f"[{name}] {best*1e3:.1f} ms/frame at {spp} spp  "
          f"{rays:,.0f} rays/s  (~{best*1e3*SPP/spp:.0f} ms at {SPP} spp; "
          f"first compile {compile_s:.0f}s)")
    return best, rays


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else ""
    grid = rt.scene_from_dict(grid_scene_dict(18))[0]
    import tempfile
    tmp = tempfile.mkdtemp(prefix="rt_stream_")
    mesh = rt.scene_from_dict(mesh_scene_dict(tmp, 4),
                              base_dir=tmp)[0]
    n_grid = renderer_mod.scene_prim_count(grid)
    n_mesh = renderer_mod.scene_prim_count(mesh)
    print(f"grid prims: {n_grid}  mesh prims: {n_mesh}  "
          f"modes: {mk._kernel_mode(grid)}/{mk._kernel_mode(mesh)}")
    if mode != "--perf-only":
        check_equivalence("grid-5833", grid, bvh_bitgate=True)
        check_equivalence("ico-10241", mesh)
        # Toward the 262,144-prim cap (round 5, VERDICT r4 #7): the
        # Mosaic-vs-XLA 1-2 ulp verdict-flip fraction grows with
        # primitive count (measured curve in BENCHMARKS "Engine
        # equivalence": 9.4e-3 at 5,833 / 3.4e-2 at 50,654 prims at
        # 96x72/2spp/depth 4). Gate a >=50K-prim scene at 2x the
        # measured fraction so the advertised cap is a tested claim.
        grid50 = rt.scene_from_dict(grid_scene_dict(37))[0]
        n50 = renderer_mod.scene_prim_count(grid50)
        print(f"grid-50K prims: {n50}")
        check_equivalence("grid-50654", grid50, w=96, h=72,
                          gates=((4, 8e-2),))
    if mode != "--check-only":
        measure_perf("grid-5833", grid, spp=5)
        measure_perf("ico-10241", mesh, spp=20)


if __name__ == "__main__":
    main()

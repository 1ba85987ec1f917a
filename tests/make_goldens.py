"""Regenerate the golden-image regression anchors (tests/goldens/*.npz).

Run from the repo root on the CPU backend:

    RT_PLATFORM=cpu python tests/make_goldens.py

The goldens are small fixed-seed linear-radiance renders of scenes chosen
to cover the shading surface (metal tiers, glass, diffuselight, soft
shadows, triangles, planes, extended materials + textures). They are the
repo's analog of the reference's demo PNGs (SURVEY.md §4: the de-facto
golden artifacts) - any change to shading/material/RNG math that slips
past the unit tests fails the comparison in test_goldens.py.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from raytrace_tpu import renderer as renderer_mod
from raytrace_tpu import scene as scene_mod
from raytrace_tpu import trace as trace_mod

W, H, SPP = 96, 72, 4
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def icosphere_obj_path():
    """Deterministic 1x-subdivided icosahedron (42 verts, 80 faces) with
    per-vertex normals (= normalized positions: exact for a sphere) as
    an OBJ with ``vn`` + ``f i//n`` records. Written on demand into the
    goldens dir; pure arithmetic, so every regeneration is identical."""
    path = os.path.join(GOLDEN_DIR, "icosphere.obj")
    if os.path.exists(path):
        return path
    phi = (1.0 + np.sqrt(5.0)) / 2.0
    base = [(-1, phi, 0), (1, phi, 0), (-1, -phi, 0), (1, -phi, 0),
            (0, -1, phi), (0, 1, phi), (0, -1, -phi), (0, 1, -phi),
            (phi, 0, -1), (phi, 0, 1), (-phi, 0, -1), (-phi, 0, 1)]
    verts = [np.array(v, np.float64) / np.linalg.norm(v) for v in base]
    faces = [(0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
             (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
             (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
             (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1)]
    mid_cache = {}

    def midpoint(a, b):
        key = (min(a, b), max(a, b))
        if key not in mid_cache:
            m = verts[a] + verts[b]
            verts.append(m / np.linalg.norm(m))
            mid_cache[key] = len(verts) - 1
        return mid_cache[key]

    out = []
    for a, b, c in faces:
        ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
        out += [(a, ab, ca), (b, bc, ab), (c, ca, bc), (ab, bc, ca)]
    lines = [f"v {v[0]:.9f} {v[1]:.9f} {v[2]:.9f}" for v in verts]
    lines += [f"vn {v[0]:.9f} {v[1]:.9f} {v[2]:.9f}" for v in verts]
    lines += [f"f {a+1}//{a+1} {b+1}//{b+1} {c+1}//{c+1}"
              for a, b, c in out]
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return path


def scenes():
    """name -> (scene dict, TraceConfig kwargs)."""
    yield "spheres_metal_glass", {
        "camera": {"position": [0, 0, 8], "aspectRatio": 1.3333},
        "objects": [
            {"type": "sphere", "position": [0, 0, 0], "radius": 1.0,
             "material": {"type": "metal", "color": [0.8, 0.8, 0.9],
                          "roughness": 0.1, "metallic": 0.95}},
            {"type": "sphere", "position": [-2, 0, 0], "radius": 0.7,
             "material": {"type": "glass", "color": [0.9, 0.5, 0.5],
                          "refractionIndex": 1.5}},
            {"type": "sphere", "position": [2, 0, 0], "radius": 0.7,
             "material": {"type": "shiny", "color": [0.4, 0.7, 0.4],
                          "roughness": 0.2, "specular": 0.8}},
            {"type": "sphere", "position": [0, -101, 0], "radius": 100.0,
             "material": {"type": "lambertian", "color": [0.6, 0.6, 0.55]}},
            {"type": "sphere", "position": [0, 2.2, 0], "radius": 0.5,
             "material": {"type": "diffuselight", "color": [1, 0.9, 0.7]}},
        ],
        "lights": [
            {"position": [5, 6, 5], "color": [1, 1, 1], "intensity": 40.0},
            {"position": [-4, 3, 3], "color": [0.7, 0.8, 1.0],
             "intensity": 15.0},
        ],
    }, dict(max_depth=8, shadow_samples=8)

    yield "cubes_dielectric_plane", {
        "camera": {"position": [0, 1, 7], "aspectRatio": 1.3333},
        "objects": [
            {"type": "cube", "position": [-1.2, 0, 0], "size": [1, 1, 1],
             "material": {"type": "metal", "color": [0.9, 0.3, 0.3],
                          "roughness": 0.05}},
            {"type": "cube", "position": [1.2, 0.2, -1],
             "size": [1.2, 1.4, 1.2],
             "material": {"type": "lambertian", "color": [0.3, 0.3, 0.9]}},
            {"type": "sphere", "position": [0, 0.3, 1.5], "radius": 0.5,
             "material": {"type": "dielectric", "refractionIndex": 1.5}},
            {"type": "plane", "position": [0, -0.7, 0],
             "normal": [0, 1, 0],
             "material": {"type": "lambertian", "color": [0.5, 0.5, 0.45]}},
        ],
        "lights": [
            {"position": [4, 6, 4], "color": [1, 1, 1], "intensity": 50.0},
        ],
    }, dict(max_depth=6, shadow_samples=8)

    yield "prism_perfectmirror", {
        "camera": {"position": [0, 0.5, 6], "aspectRatio": 1.3333},
        "objects": [
            {"type": "triangularPrism", "vertices": [
                [-1.0, -0.5, 0.5], [0.0, 1.0, 0.5], [1.0, -0.5, 0.5],
                [-1.0, -0.5, -0.5], [0.0, 1.0, -0.5], [1.0, -0.5, -0.5]],
             "material": {"type": "perfectmirror",
                          "color": [0.95, 0.95, 0.98]}},
            {"type": "sphere", "position": [2.2, 0, -1], "radius": 0.6,
             "material": {"type": "lambertian", "color": [0.8, 0.4, 0.8]}},
            {"type": "sphere", "position": [0, -101, 0], "radius": 100.0,
             "material": {"type": "lambertian", "color": [0.55, 0.6, 0.5]}},
        ],
        "lights": [
            {"position": [3, 5, 5], "color": [1, 1, 1], "intensity": 45.0},
        ],
    }, dict(max_depth=6, shadow_samples=8)

    yield "extended_textured", {
        "camera": {"position": [0, 1.0, 7], "aspectRatio": 1.3333},
        "objects": [
            {"type": "sphere", "position": [-1.4, 0.3, 0], "radius": 0.8,
             "material": {"type": "mirror", "color": [0.95, 0.95, 0.95],
                          "roughness": 0.05}},
            {"type": "sphere", "position": [1.4, 0.3, 0], "radius": 0.8,
             "material": {"type": "sheen", "color": [0.7, 0.3, 0.3],
                          "sheenColor": [1.0, 0.9, 0.8],
                          "sheenRoughness": 0.3}},
            {"type": "sphere", "position": [0, 0.1, -1.8], "radius": 0.9,
             "material": {"type": "emission", "color": [0.3, 0.8, 1.0],
                          "intensity": 2.0}},
            {"type": "sphere", "position": [0, -100.5, 0], "radius": 100.0,
             "material": {"type": "lambertian", "color": [1, 1, 1],
                          "texture": {"type": "checkerboard", "scale": 0.8,
                                      "color1": [0.85, 0.85, 0.9],
                                      "color2": [0.15, 0.15, 0.2]}}},
        ],
        "lights": [
            {"position": [4, 6, 5], "color": [1, 0.98, 0.92],
             "intensity": 55.0},
        ],
    }, dict(max_depth=6, shadow_samples=8)


    yield "mesh_smooth_icosphere", {
        # Smooth-shaded OBJ mesh: barycentric vertex-normal
        # interpolation (triangle.go:84-88). The icosphere's vn-bearing
        # faces must render with sphere-like highlights, not facets -
        # this anchors the vn pipeline (parser -> loader -> interp).
        "camera": {"position": [0, 0.4, 5], "aspectRatio": 1.3333},
        "objects": [
            {"type": "mesh", "path": icosphere_obj_path(),
             "position": [0, 0.2, 0], "scale": 1.1,
             "material": {"type": "metal", "color": [0.8, 0.7, 0.5],
                          "roughness": 0.15}},
            {"type": "sphere", "position": [0, -101, 0], "radius": 100.0,
             "material": {"type": "lambertian", "color": [0.6, 0.6, 0.55]}},
        ],
        "lights": [
            {"position": [4, 6, 5], "color": [1, 1, 1], "intensity": 45.0},
        ],
    }, dict(max_depth=5, shadow_samples=4)


def bvh_scene():
    """A >96-prim scene that naturally selects the packet-BVH kernel
    mode: anchors the bvh walk + in-kernel shading to committed pixels
    (VERDICT r2 weak #6 - the bvh path was guarded only by jnp-vs-Pallas
    agreement, which a shared-helper bug would slip past). Tiny frame:
    interpret-mode Pallas is ~minutes per kernel call."""
    objs = [{"type": "sphere", "position": [0, -101, 0], "radius": 100.0,
             "material": {"type": "lambertian", "color": [0.55, 0.6, 0.5]}}]
    for i in range(108):
        a = 2 * np.pi * i / 108
        ring = 3.0 + 0.8 * ((i * 7) % 3)
        objs.append({
            "type": "sphere",
            "position": [ring * np.cos(a), 0.25 * ((i * 5) % 4),
                         ring * np.sin(a) - 4.0],
            "radius": 0.35,
            "material": [
                {"type": "lambertian", "color": [0.8, 0.3, 0.3]},
                {"type": "metal", "color": [0.7, 0.7, 0.8],
                 "roughness": 0.1},
                {"type": "glass", "refractionIndex": 1.5},
            ][i % 3]})
    data = {
        "camera": {"position": [0, 1.2, 6], "aspectRatio": 1.3333},
        "objects": objs,
        "lights": [{"position": [4, 8, 4], "color": [1, 1, 1],
                    "intensity": 40.0}],
    }
    return data, dict(max_depth=4, shadow_samples=2)


BVH_W, BVH_H, BVH_SPP = 16, 12, 1


def render_golden_bvh():
    from raytrace_tpu.ops import megakernel as mk
    data, cfg_kwargs = bvh_scene()
    scene, _ = scene_mod.from_dict(data)   # >=BVH_THRESHOLD: accel auto
    assert mk._kernel_mode(scene) == "bvh", mk._kernel_mode(scene)
    cfg = trace_mod.TraceConfig(seed=0, **cfg_kwargs)
    img = renderer_mod.render_wavefront(
        scene, width=BVH_W, height=BVH_H, samples=BVH_SPP, cfg=cfg)
    return np.asarray(img)


def render_golden(data, cfg_kwargs):
    scene, _ = scene_mod.from_dict(data)
    cfg = trace_mod.TraceConfig(seed=0, **cfg_kwargs)
    img = renderer_mod.render_band(
        scene, jnp.int32(0), width=W, height=H, band_h=H, samples=SPP,
        cfg=cfg)
    return np.asarray(img)


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, data, cfg_kwargs in scenes():
        img = render_golden(data, cfg_kwargs)
        assert np.isfinite(img).all() and img.max() > 0, name
        path = os.path.join(GOLDEN_DIR, f"{name}.npz")
        np.savez_compressed(path, linear=img.astype(np.float32),
                            width=W, height=H, spp=SPP)
        nb = (img.sum(-1) > 0).mean()
        print(f"{name}: max={img.max():.3f} nonblack={nb:.2f} -> {path}")
    img = render_golden_bvh()
    assert np.isfinite(img).all() and img.max() > 0, "bvh_ring"
    path = os.path.join(GOLDEN_DIR, "bvh_ring.npz")
    np.savez_compressed(path, linear=img.astype(np.float32),
                        width=BVH_W, height=BVH_H, spp=BVH_SPP)
    print(f"bvh_ring: max={img.max():.3f} "
          f"nonblack={(img.sum(-1) > 0).mean():.2f} -> {path}")


if __name__ == "__main__":
    main()

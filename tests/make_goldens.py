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


if __name__ == "__main__":
    main()

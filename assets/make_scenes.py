"""Generate the bundled demo scene JSONs.

The benchmark workloads reference scenes equivalent to the upstream demo
assets; generating them here keeps the repo self-contained (bench.py
falls back to assets/ when the reference checkout is absent).

Run: python assets/make_scenes.py
"""

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))


def sphere_reflections_light():
    """5 spheres (metal/glass), 2 point lights - the headline benchmark
    workload (800x600, 100 spp, depth 50)."""
    sph = lambda pos, radius, mat: {
        "type": "sphere", "position": pos, "radius": radius,
        "material": mat}
    return {
        "camera": {"position": [0, 0, -8], "lookAt": [0, 0, 0],
                   "up": [0, 1, 0], "fov": 60, "aspectRatio": 1.33},
        "objects": [
            sph([0, 0, 0], 1.0, {"type": "metal",
                                 "color": [0.8, 0.8, 0.9],
                                 "roughness": 0.1}),
            sph([2, 0, 0], 0.5, {"type": "metal",
                                 "refractionIndex": 1.5}),
            sph([-2, 0, 0], 0.7, {"type": "glass",
                                  "color": [0.8, 0.2, 0.2]}),
            sph([0, 2, 0], 0.3, {"type": "metal",
                                 "color": [0.9, 0.9, 0.1],
                                 "roughness": 0.3}),
            sph([0, -2, 0], 0.4, {"type": "glass",
                                  "color": [0.2, 0.8, 0.2]}),
        ],
        "lights": [
            {"type": "point", "position": [5, 5, 5],
             "color": [1, 1, 1], "intensity": 1.0},
            {"type": "point", "position": [-3, 3, 3],
             "color": [0.8, 0.8, 1], "intensity": 0.5},
        ],
    }


def two_red_cubes():
    """Cube/triangle primitives + soft shadows (800x600)."""
    cube = lambda pos, size, mat: {
        "type": "cube", "position": pos, "size": size, "material": mat}
    red = {"type": "lambertian", "color": [0.85, 0.15, 0.12]}
    return {
        "camera": {"position": [0, 1, -7], "lookAt": [0, 0, 0],
                   "up": [0, 1, 0], "fov": 60, "aspectRatio": 1.33},
        "objects": [
            cube([-1.5, 0, 0], [1.2, 1.2, 1.2], red),
            cube([1.5, 0.4, 0.5], [0.9, 0.9, 0.9], red),
            {"type": "sphere", "position": [0, -501, 0], "radius": 500,
             "material": {"type": "lambertian",
                          "color": [0.6, 0.6, 0.6]}},
        ],
        "lights": [
            {"type": "point", "position": [4, 6, -4],
             "color": [1, 1, 1], "intensity": 1.5},
        ],
    }


def silver_prism_purple_cube():
    """Mixed prism + cube + sphere scene (1200x900) with the extended
    config blocks the reference schema advertises."""
    return {
        "camera": {"position": [0, 0, -8], "lookAt": [0, 0, 0],
                   "up": [0, 1, 0], "fov": 60, "aspectRatio": 1.33},
        "objects": [
            {"type": "triangularPrism",
             "vertices": [[-2.2, -0.8, -0.5], [-1.0, -0.8, -0.5],
                          [-1.6, 0.6, -0.5], [-2.2, -0.8, 0.8],
                          [-1.0, -0.8, 0.8], [-1.6, 0.6, 0.8]],
             "material": {"type": "perfectmirror",
                          "color": [0.92, 0.92, 0.95]}},
            {"type": "cube", "position": [1.6, 0, 0],
             "size": [1.3, 1.3, 1.3],
             "material": {"type": "shiny", "color": [0.55, 0.2, 0.8],
                          "roughness": 0.15, "specular": 0.9}},
            {"type": "sphere", "position": [0, -0.2, 1.5], "radius": 0.6,
             "material": {"type": "glass", "color": [0.9, 0.9, 0.95]}},
            {"type": "cube", "position": [0, -501.2, 0],
             "size": [1000, 1000, 1000],
             "material": {"type": "lambertian",
                          "color": [0.5, 0.5, 0.55]}},
        ],
        "lights": [
            {"type": "point", "position": [4, 5, -5],
             "color": [1, 1, 1], "intensity": 1.2},
            {"type": "point", "position": [-4, 3, -2],
             "color": [0.9, 0.85, 1.0], "intensity": 0.6},
        ],
        "renderer": {"samples": 100, "maxDepth": 50,
                     "softShadows": True},
        "atmospheric": {"enabled": False, "preset": "default"},
        "fog": {"enabled": False, "mode": "exp", "density": 0.02},
        "bloom": {"enabled": False, "threshold": 1.0, "intensity": 0.4},
        "vignette": {"enabled": False, "strength": 0.4},
    }


def atmosphere_demo():
    """Rayleigh/Mie sky + fog + volumetric lighting over a metal scene."""
    d = sphere_reflections_light()
    d["atmospheric"] = {"enabled": True, "preset": "sunset"}
    d["fog"] = {"enabled": True, "mode": "exp", "density": 0.03}
    d["volumetric"] = {"enabled": True, "steps": 32, "density": 0.02,
                       "scattering": 0.4, "maxDist": 15.0}
    return d


def _icosahedron_obj():
    """Unit icosahedron as OBJ text (12 verts / 20 faces, outward CCW)."""
    phi = (1.0 + 5.0 ** 0.5) / 2.0
    raw = [(-1, phi, 0), (1, phi, 0), (-1, -phi, 0), (1, -phi, 0),
           (0, -1, phi), (0, 1, phi), (0, -1, -phi), (0, 1, -phi),
           (phi, 0, -1), (phi, 0, 1), (-phi, 0, -1), (-phi, 0, 1)]
    norm = (1.0 + phi * phi) ** 0.5
    faces = [(0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
             (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
             (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
             (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1)]
    lines = [f"v {x / norm:.9f} {y / norm:.9f} {z / norm:.9f}"
             for x, y, z in raw]
    lines += [f"f {a + 1} {b + 1} {c + 1}" for a, b, c in faces]
    return "\n".join(lines) + "\n"


def mesh_demo():
    """OBJ model import showcase: a glass icosahedron and a gold metal
    one over a lambertian ground (models/mesh.py; the type the Go loader
    would silently skip, scene.go:80-83)."""
    return {
        "camera": {"position": [0, 0.6, -6], "lookAt": [0, 0, 0],
                   "up": [0, 1, 0], "fov": 60, "aspectRatio": 1.33},
        "objects": [
            {"type": "mesh", "path": "mesh_demo.obj",
             "position": [-1.4, 0.2, 0], "scale": 1.1, "rotationY": 15,
             "material": {"type": "glass", "color": [0.85, 0.9, 1.0],
                          "refractionIndex": 1.5}},
            {"type": "mesh", "path": "mesh_demo.obj",
             "position": [1.4, 0.2, 0], "scale": 1.1, "rotationY": -20,
             "material": {"type": "metal", "color": [0.95, 0.78, 0.3],
                          "roughness": 0.15, "metallic": 0.9}},
            {"type": "sphere", "position": [0, -101, 0], "radius": 100,
             "material": {"type": "lambertian",
                          "color": [0.55, 0.55, 0.6]}},
        ],
        "lights": [
            {"type": "point", "position": [4, 6, 4],
             "color": [1, 1, 1], "intensity": 60},
            {"type": "point", "position": [-5, 3, 2],
             "color": [0.8, 0.85, 1.0], "intensity": 25},
        ],
    }


SCENES = {
    "sphere_reflections_light.json": sphere_reflections_light,
    "two_red_cubes_scene.json": two_red_cubes,
    "final_silver_prism_purple_cube.json": silver_prism_purple_cube,
    "atmosphere_demo.json": atmosphere_demo,
    "mesh_demo.json": mesh_demo,
}


def main():
    for name, fn in SCENES.items():
        path = os.path.join(HERE, name)
        with open(path, "w") as f:
            json.dump(fn(), f, indent=2)
        print("wrote", path)
    obj_path = os.path.join(HERE, "mesh_demo.obj")
    with open(obj_path, "w") as f:
        f.write(_icosahedron_obj())
    print("wrote", obj_path)


if __name__ == "__main__":
    main()

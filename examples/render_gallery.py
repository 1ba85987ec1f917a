"""Render the bundled demo scenes to PNGs (docs/gallery/).

Run: python examples/render_gallery.py [--size WxH] [--spp N]
(RT_PLATFORM=cpu to force the CPU backend.)

Cameras are mirrored to +Z so the fixed-viewport parity camera actually
faces the geometry (see PARITY.md #2).
"""

import argparse
import json
import os
import sys
import time

if os.environ.get("RT_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["RT_PLATFORM"])

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import raytrace_tpu as rt

SCENES = [
    "sphere_reflections_light.json",
    "two_red_cubes_scene.json",
    "final_silver_prism_purple_cube.json",
    "atmosphere_demo.json",
    "mesh_demo.json",
    "smooth_shading_demo.json",  # smooth (vn) vs flat icosphere pair
]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="200x150")
    p.add_argument("--spp", type=int, default=16)
    p.add_argument("--max-depth", type=int, default=12)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    w, h = (int(x) for x in args.size.split("x"))

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = args.out or os.path.join(root, "docs", "gallery")
    os.makedirs(out_dir, exist_ok=True)

    for name in SCENES:
        path = os.path.join(root, "assets", name)
        with open(path) as f:
            d = json.load(f)
        if d["camera"]["position"][2] < 0:
            d["camera"]["position"][2] *= -1
        scene, cfg = rt.scene_from_dict(d, base_dir=os.path.dirname(path))
        r = rt.Renderer()
        r.set_samples(args.spp)
        r.set_max_depth(args.max_depth)
        t0 = time.perf_counter()
        img = r.render(scene, w, h, scene_config=cfg)
        dt = time.perf_counter() - t0
        out = os.path.join(out_dir, name.replace(".json", ".png"))
        r.save_image(img, out)
        print(f"{name}: {dt:.2f}s -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

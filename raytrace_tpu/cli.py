"""CLI parity with cmd/raytracer/main.go:14-70.

Usage: python -m raytrace_tpu.cli <scene.json> <out.png> <width> <height>
Extra flags extend the reference CLI (it had positional args only).
"""

from __future__ import annotations

import os as _os0
import sys as _sys0

# Fixed hash seed keeps Pallas program fingerprints (and thus the
# persistent compilation cache keys) stable across processes; see bench.py.
# Invoked as `python -m raytrace_tpu.cli`, argv[0] is this file's path, so
# re-exec through -m to keep package-relative imports working.
if _os0.environ.get("PYTHONHASHSEED") != "0":
    _os0.environ["PYTHONHASHSEED"] = "0"
    _os0.execv(_sys0.executable,
               [_sys0.executable, "-m", "raytrace_tpu.cli"]
               + _sys0.argv[1:])

import argparse
import os
import sys
import time

# Honor RT_PLATFORM before any JAX computation. The environment may
# force-register a TPU plugin via sitecustomize, so a plain JAX_PLATFORMS
# env var is not enough.
if os.environ.get("RT_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["RT_PLATFORM"])

from . import renderer as renderer_mod
from . import scene as scene_mod


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="raytracer",
        description="TPU-native path tracer (reference-parity CLI)")
    p.add_argument("scene_file")
    p.add_argument("output_file")
    p.add_argument("width", type=int)
    p.add_argument("height", type=int)
    p.add_argument("--samples", type=int, default=100)
    p.add_argument("--max-depth", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-soft-shadows", action="store_true")
    p.add_argument("--no-recursive-reflections", action="store_true")
    p.add_argument("--fast-mc", action="store_true",
                   help="expectation-preserving MC accelerators (RR + "
                        "throughput cutoff)")
    p.add_argument("--lookat-camera", action="store_true",
                   help="honor lookAt/up/fov instead of the reference's "
                        "fixed-viewport camera (renderer.go:377-390)")
    p.add_argument("--go-parity", action="store_true",
                   help="reproduce reference loader quirks (skip prisms, "
                        "ignore scene renderer block)")
    p.add_argument("--ascii-preview", action="store_true")
    p.add_argument("--adaptive", action="store_true",
                   help="variance-guided per-pixel sampling: --samples "
                        "becomes the per-pixel cap (adaptive.py)")
    p.add_argument("--min-spp", type=int, default=8,
                   help="adaptive mode: samples every pixel must take "
                        "before it may stop")
    p.add_argument("--adaptive-tol", type=float, default=0.02,
                   help="adaptive mode: relative luminance standard-"
                        "error tolerance")
    p.add_argument("--denoise", action="store_true",
                   help="AOV-guided cross-bilateral denoise of the "
                        "linear image before tonemapping (with "
                        "--adaptive the per-pixel variance also guides "
                        "the radiance term)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    print(f"Loading scene from: {args.scene_file}")
    try:
        scene, cfg = scene_mod.load(args.scene_file, go_parity=args.go_parity)
    except (OSError, ValueError, KeyError) as e:
        # main.go:41-44 prints the error and exits 1.
        print(f"Error loading scene: {e}")
        return 1

    r = renderer_mod.Renderer()
    r.set_samples(args.samples)
    r.set_max_depth(args.max_depth)
    r.seed = args.seed
    if args.no_soft_shadows:
        r.set_soft_shadows(False)
    if args.no_recursive_reflections:
        r.set_recursive_reflections(False)
    r.fast_mc = args.fast_mc
    r.go_camera = not args.lookat_camera

    print(f"Rendering at {args.width}x{args.height} resolution...")
    if args.adaptive:
        img, spp = r.render_adaptive(
            scene, args.width, args.height,
            scene_config=None if args.go_parity else cfg,
            min_spp=args.min_spp, rel_tol=args.adaptive_tol,
            denoise=args.denoise)
        print(f"Adaptive sampling: mean {spp.mean():.1f} spp "
              f"(cap {args.samples}, floor {min(args.min_spp, args.samples)})")
    else:
        img = r.render(scene, args.width, args.height,
                       scene_config=None if args.go_parity else cfg,
                       denoise=args.denoise)

    out = args.output_file
    if not os.path.splitext(out)[1]:
        out += ".png"  # main.go:53-56
    print(f"Saving to: {out}")
    r.save_image(img, out)

    bench_path = os.path.join(os.path.dirname(out) or ".",
                              "benchmark_data.json")  # main.go:64-69
    r.save_benchmark_data(bench_path)
    print("Benchmark data saved")

    if args.ascii_preview:
        r.print_ascii_preview(img)
    return 0


if __name__ == "__main__":
    sys.exit(main())

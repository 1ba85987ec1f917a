"""Regenerate docs/gallery/denoise_comparison.png.

Side-by-side strip of the production low-spp loop: a 4 spp adaptive
render (with its variance map), the variance-guided denoise of it, and
a 64 spp reference. Run: RT_PLATFORM=cpu python examples/denoise_compare.py
"""

import os
import sys
import time

if os.environ.get("RT_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["RT_PLATFORM"])

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

import raytrace_tpu as rt
from raytrace_tpu import renderer as renderer_mod
from raytrace_tpu import trace as trace_mod
from raytrace_tpu.ops import tonemap
from raytrace_tpu.utils.image import write_png

W, H = 160, 120
NOISY_SPP, REF_SPP = 4, 64

SCENE = {
    "camera": {"position": [0, 0, 8], "aspectRatio": W / H},
    "objects": [
        {"type": "sphere", "position": [0, 0, 0], "radius": 1.0,
         "material": {"type": "metal", "color": [0.8, 0.8, 0.9],
                      "roughness": 0.25, "metallic": 0.9}},
        {"type": "sphere", "position": [-2, 0, 0], "radius": 0.7,
         "material": {"type": "glass", "color": [0.9, 0.5, 0.5],
                      "refractionIndex": 1.5}},
        {"type": "sphere", "position": [2, 0, 0], "radius": 0.7,
         "material": {"type": "shiny", "color": [0.4, 0.7, 0.4],
                      "roughness": 0.3, "specular": 0.8}},
        {"type": "sphere", "position": [0, -101, 0], "radius": 100.0,
         "material": {"type": "lambertian", "color": [0.6, 0.6, 0.55]}},
    ],
    "lights": [
        {"position": [5, 6, 5], "color": [1, 1, 1], "intensity": 40.0},
        {"position": [-4, 3, 3], "color": [0.7, 0.8, 1.0],
         "intensity": 15.0},
    ],
}


def main():
    scene, _ = rt.scene_from_dict(SCENE)
    cfg = trace_mod.TraceConfig(seed=0, max_depth=8, shadow_samples=4)

    t0 = time.perf_counter()
    noisy, spp, var = rt.render_adaptive(
        scene, width=W, height=H, cfg=cfg, min_spp=NOISY_SPP,
        max_spp=NOISY_SPP, batch=NOISY_SPP, rel_tol=0.0,
        return_variance=True)
    aovs = rt.render_aovs(scene, width=W, height=H)
    clean = rt.denoise(noisy, aovs, variance=var, sigma_lum=4.0)
    t_loop = time.perf_counter() - t0

    ref = np.asarray(renderer_mod.render_band(
        scene, jnp.int32(0), width=W, height=H, band_h=H,
        samples=REF_SPP, cfg=cfg))

    e_noisy = float(np.abs(noisy - ref).mean())
    e_clean = float(np.abs(clean - ref).mean())
    print(f"{NOISY_SPP}spp loop {t_loop:.1f}s; MAE vs {REF_SPP}spp: "
          f"noisy {e_noisy:.6f}, denoised {e_clean:.6f} "
          f"({1 - e_clean / max(e_noisy, 1e-12):.1%} lower)")

    strip = np.concatenate([noisy, clean, ref], axis=1)
    img8 = np.asarray(tonemap.to_rgb8(tonemap.tonemap(jnp.asarray(strip))))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "gallery",
        "denoise_comparison.png")
    write_png(out, img8)
    print("wrote", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())

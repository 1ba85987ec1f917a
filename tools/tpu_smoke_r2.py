"""TPU smoke + timing for the round-2 production-loop modules.

Three questions this answers on the real chip (all were built and
CPU-validated during a tunnel outage — see CLAUDE.md):

1. Does `render_adaptive(engine="pallas")` compile and run on TPU, and
   what does an adaptive headline-scene frame cost vs fixed-spp?
2. What does a jitted `denoising.denoise` call cost on an 800x600 frame
   (docs/DESIGN.md currently *estimates* ~1 ms — replace with a number)?
3. What does `render_aovs` cost (one center ray per pixel)?

Usage: python tools/tpu_smoke_r2.py
"""
import os
import sys

if os.environ.get("PYTHONHASHSEED") != "0":
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

import raytrace_tpu as rt
from raytrace_tpu import adaptive as adaptive_mod
from raytrace_tpu import aov as aov_mod
from raytrace_tpu import denoising as denoising_mod
from raytrace_tpu import trace as trace_mod

W = int(os.environ.get("SMOKE_W", "800"))
H = int(os.environ.get("SMOKE_H", "600"))
ENGINE = os.environ.get("SMOKE_ENGINE", "pallas")


def find_scene() -> str:
    for p in ("/root/reference/demo-assets/sphere_reflections_light.json",
              os.path.join(os.path.dirname(__file__),
                           "../assets/sphere_reflections_light.json")):
        if os.path.exists(p):
            return p
    raise FileNotFoundError("sphere_reflections_light.json not found")


def timed(label, fn, reps=3):
    """Device time: sync via ONE scalar checksum per call, never the full
    arrays - an 800x600 framebuffer pull through the tunnel costs
    150-350 ms and once polluted exactly this class of measurement
    (BENCHMARKS.md measurement postmortem)."""
    def checksum(out):
        leaves = jax.tree_util.tree_leaves(out)
        return float(sum(jnp.sum(a.astype(jnp.float32)) for a in leaves))
    t0 = time.perf_counter()
    out = fn()
    checksum(out)
    first = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        checksum(fn())
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: best {best * 1e3:8.1f} ms (first {first:6.1f} s)",
          flush=True)
    return jax.tree_util.tree_map(np.asarray, out), best


def main():
    print("devices:", jax.devices(), flush=True)
    import json
    with open(find_scene()) as f:
        data = json.load(f)
    # Shipped camera faces away from the scene under the reference's
    # fixed -Z viewport camera; mirror to +Z like bench.py (PARITY.md #2).
    data["camera"]["position"] = [0, 0, 8]
    scene, _cfg = rt.scene_from_dict(data)
    cfg = trace_mod.TraceConfig(max_depth=50)

    # --- 1. adaptive sampling on the Pallas engine -----------------
    t0 = time.perf_counter()
    img_a, spp_map, var = adaptive_mod.render_adaptive(
        scene, width=W, height=H, cfg=cfg, min_spp=8, max_spp=32,
        batch=8, rel_tol=0.02, engine=ENGINE, return_variance=True)
    t_adaptive = time.perf_counter() - t0
    print(f"adaptive {ENGINE} (8..32 spp): {t_adaptive:6.1f} s total "
          f"(incl compile), mean spp {float(np.mean(spp_map)):.1f}, "
          f"mean radiance {float(np.mean(img_a)):.4f}", flush=True)
    # second call = warm
    t0 = time.perf_counter()
    img_a2, spp2 = adaptive_mod.render_adaptive(
        scene, width=W, height=H, cfg=cfg, min_spp=8, max_spp=32,
        batch=8, rel_tol=0.02, engine=ENGINE)
    print(f"adaptive {ENGINE} warm: {time.perf_counter() - t0:6.2f} s, "
          f"bit-identical to first: {np.array_equal(img_a, img_a2)}",
          flush=True)

    # --- 2. AOV pass ------------------------------------------------
    aovs, t_aov = timed(
        f"render_aovs {W}x{H}",
        lambda: aov_mod.render_aovs(scene, width=W, height=H,
                                    as_numpy=False))

    # --- 3. denoiser, jitted, device-resident ----------------------
    img_dev = jnp.asarray(img_a)
    var_dev = jnp.asarray(var)
    aovs_dev = {k: jnp.asarray(v) for k, v in aovs.items()}

    def run_dense():
        return denoising_mod.denoise(img_dev, aovs_dev, variance=var_dev,
                                     as_numpy=False)

    def run_atrous():
        return denoising_mod.denoise(img_dev, aovs_dev, variance=var_dev,
                                     passes=4, as_numpy=False)

    timed(f"denoise dense r=3 {W}x{H}", run_dense)
    timed(f"denoise a-trous x4 {W}x{H}", run_atrous)
    print("SMOKE OK", flush=True)


if __name__ == "__main__":
    main()

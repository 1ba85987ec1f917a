"""two_red_cubes with the PRODUCTION recipe vs the parity default
(round 5, VERDICT r4 #8): one controlled A/B — fixed 100 spp (the
reference's only quality lever) vs the recommended config
(16 spp + throughput_epsilon=5e-4 + variance-free denoise), PSNR in
the tonemapped display domain vs an 8x128-spp ground truth. Same
methodology as tools/quality_table.py (as-shipped camera).
"""
import os
import sys

if os.environ.get("PYTHONHASHSEED") != "0":
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import time

import faulthandler

faulthandler.dump_traceback_later(240, repeat=True)

import jax.numpy as jnp
import numpy as np

import raytrace_tpu as rt
from raytrace_tpu import aov as aov_mod
from raytrace_tpu import denoising as denoising_mod
from raytrace_tpu import renderer as renderer_mod
from raytrace_tpu import trace as trace_mod
from raytrace_tpu.ops import tonemap as tm

W, H = 800, 600
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = trace_mod.TraceConfig(max_depth=50)


def psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return 10.0 * np.log10(1.0 / mse) if mse > 0 else float("inf")


def fixed(scene, spp, cfg, reps=3):
    frame = lambda ac: renderer_mod.render_wavefront(
        scene, width=W, height=H, samples=spp, cfg=cfg, as_numpy=False,
        assume_capacity=ac)
    img = frame(False)
    float(jnp.sum(frame(False)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(frame(True)))
        best = min(best, time.perf_counter() - t0)
    renderer_mod.flush_capacity_checks()
    return np.asarray(img), best * 1e3


def main():
    scene, _ = rt.load_scene(os.path.join(
        ROOT, "assets/two_red_cubes_scene.json"))
    disp = lambda img: np.asarray(tm.tonemap(jnp.asarray(img)))

    acc = None
    for k in range(8):
        img, _ = fixed(scene, 128, dataclasses.replace(BASE, seed=1000 + k))
        acc = img if acc is None else acc + img
    gt = disp(acc / 8.0)
    print("ground truth done", flush=True)

    img100, ms100 = fixed(scene, 100, BASE)
    print(f"| fixed 100 spp (parity default) | {ms100:.0f} ms | "
          f"{psnr(disp(img100), gt):.2f} dB |", flush=True)

    cfg_p = dataclasses.replace(BASE, throughput_epsilon=5e-4)
    img16, ms16 = fixed(scene, 16, cfg_p)
    aovs = aov_mod.render_aovs(scene, width=W, height=H, as_numpy=False)
    img_j = jnp.asarray(img16)
    run = lambda: denoising_mod.denoise(img_j, aovs, as_numpy=False)
    float(jnp.sum(run()))  # warm
    t0 = time.perf_counter()
    img_d = run()
    float(jnp.sum(img_d))
    dt = (time.perf_counter() - t0) * 1e3
    print(f"| 16 spp + eps 5e-4 + denoise (production) | "
          f"{ms16:.0f}+{dt:.0f} ms | {psnr(disp(np.asarray(img_d)), gt):.2f} dB |",
          flush=True)


if __name__ == "__main__":
    main()

"""Ablate the RNG transcendentals (sincos_2pi polynomial, cbrt01 Newton)
to bound the "soft-shadow RNG" lever on TPU (CLAUDE.md next levers).

Per soft-shadow sample the kernel draws a unit-ball jitter: one pcg4d
hash + sincos_2pi + cbrt01 + sqrt + normalize. Three arms, same frame
bench as measure_soft_guard.py (device-resident, one sync per batch):

  base     — committed helpers.
  divfree  — cbrt01 via reciprocal-cbrt Newton (y = y*(4 - x*y^3)/3, no
             divide; the current form pays one f32 divide per step). A
             REAL candidate: same ~1e-7 accuracy class, but different
             bits, so adopting it means regenerating goldens.
  ceiling  — sincos and cbrt replaced by linear fakes (wrong images, same
             loop structure): the upper bound of ANY transcendental win.

Monkeypatching rng.* before the jit traces is enough — the changed HLO
re-keys the compilation cache, so arms never collide.

Usage: python tools/measure_soft_rng.py [scene ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

if os.environ.get("PYTHONHASHSEED") != "0":
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import raytrace_tpu as rt  # noqa: E402
from raytrace_tpu import renderer as renderer_mod  # noqa: E402
from raytrace_tpu import rng  # noqa: E402
from raytrace_tpu.ops import tonemap as tm  # noqa: E402

W, H, SPP, DEPTH = 800, 600, 100, 50
ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets")

_REAL_SINCOS = rng.sincos_2pi
_REAL_CBRT = rng.cbrt01


def cbrt01_divfree(u):
    """x**(1/3) via reciprocal-cbrt Newton: no divides (the committed
    form pays one f32 divide per step). 4 steps from the 0x548c2b4b
    bit seed: measured 1e-9-class relative error on the k/2^24 input
    domain (3 steps leave 2.1e-5 — the bit seed is ~5% off), vs the
    committed 2-step direct Newton's 1.2e-6."""
    u = jnp.asarray(u, jnp.float32)
    zero = u <= 0.0
    x = jnp.where(zero, 1.0, u)
    i = jax.lax.bitcast_convert_type(x, jnp.int32)
    g = jax.lax.bitcast_convert_type(np.int32(0x548C2B4B) - i // 3,
                                     jnp.float32)
    for _ in range(4):
        g = g * (np.float32(4.0 / 3.0)
                 - np.float32(1.0 / 3.0) * x * g * g * g)
    return jnp.where(zero, 0.0, x * g * g)


def sincos_fake(u):
    u = jnp.asarray(u, jnp.float32)
    s = u * 2.0 - 1.0
    return s, 1.0 - jnp.abs(s)


def cbrt_fake(u):
    return jnp.asarray(u, jnp.float32)


def bench_scene(name: str, batch: int = 8, reps: int = 3) -> float:
    with open(os.path.join(ASSETS, name)) as f:
        data = json.load(f)
    data["camera"]["position"][2] = abs(data["camera"]["position"][2])
    scene, _ = rt.scene_from_dict(data, base_dir=ASSETS)
    r = rt.Renderer()
    r.set_samples(SPP)
    r.set_max_depth(DEPTH)
    cfg = r.trace_config()
    kw = dict(width=W, height=H, samples=SPP, cfg=cfg, go_camera=True)

    def frame():
        return renderer_mod.render_wavefront(
            scene, as_numpy=False, assume_capacity=True,
            post=tm.tonemap_rgb8, **kw)

    checksum = int(jnp.sum(frame().astype(jnp.int32)))
    assert checksum > 0, name
    renderer_mod.flush_capacity_checks()

    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [frame() for _ in range(batch)]
        int(jnp.sum(outs[-1].astype(jnp.int32)))
        renderer_mod.flush_capacity_checks()
        best = min(best, (time.perf_counter() - t0) / batch)
    return best


def main():
    scenes = sys.argv[1:] or ["two_red_cubes_scene.json",
                              "mesh_demo.json",
                              "sphere_reflections_light.json"]
    arms = [
        ("base", _REAL_SINCOS, _REAL_CBRT),
        ("divfree-cbrt", _REAL_SINCOS, cbrt01_divfree),
        ("ceiling", sincos_fake, cbrt_fake),
    ]
    for name in scenes:
        batch = 2 if "mesh" in name else 8
        base_ms = None
        for arm, sc, cb in arms:
            rng.sincos_2pi, rng.cbrt01 = sc, cb
            try:
                ms = bench_scene(name, batch=batch) * 1e3
            finally:
                rng.sincos_2pi, rng.cbrt01 = _REAL_SINCOS, _REAL_CBRT
            rel = "" if base_ms is None else f"  ({ms / base_ms:.3f}x base)"
            if base_ms is None:
                base_ms = ms
            print(f"{name:36s} {arm:12s} {ms:8.1f} ms/frame{rel}",
                  flush=True)


if __name__ == "__main__":
    main()

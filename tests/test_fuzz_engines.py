"""Randomized-scene engine equivalence: jnp trace vs Pallas megakernel.

Property: for ANY loadable scene, both engines produce the same image
(the kernel mirrors trace._bounce_body op-for-op and shares the counter
RNG). Each seed builds a random mix of primitives/materials/lights,
including degenerate shapes (no lights, single primitive, all-miss
cameras) that unit tests tend to skip.
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

import raytrace_tpu as rt
from raytrace_tpu import camera as cam_mod
from raytrace_tpu import rng as rng_mod
from raytrace_tpu import trace as trace_mod
from raytrace_tpu.ops import megakernel as mk

MATS = [
    lambda r: {"type": "lambertian", "color": [r(), r(), r()]},
    lambda r: {"type": "metal", "color": [r(), r(), r()],
               "roughness": r()},
    lambda r: {"type": "shiny", "color": [r(), r(), r()],
               "roughness": r(), "specular": r()},
    lambda r: {"type": "perfectmirror", "color": [r(), r(), r()]},
    lambda r: {"type": "glass", "color": [r(), r(), r()],
               "refractionIndex": 1.1 + r()},
    lambda r: {"type": "dielectric", "refractionIndex": 1.1 + r()},
    lambda r: {"type": "diffuselight", "color": [r(), r(), r()]},
]


def random_scene(seed: int):
    rnd = random.Random(seed)
    r = rnd.random
    objs = []
    for i in range(rnd.randint(1, 5)):
        mat = rnd.choice(MATS)(r)
        kind = rnd.choice(["sphere", "sphere", "cube", "plane"])
        if kind == "sphere":
            objs.append({"type": "sphere",
                         "position": [4 * r() - 2, 4 * r() - 2,
                                      4 * r() - 2],
                         "radius": 0.3 + r(), "material": mat})
        elif kind == "cube":
            objs.append({"type": "cube",
                         "position": [4 * r() - 2, 4 * r() - 2,
                                      4 * r() - 2],
                         "size": [0.5 + r()] * 3, "material": mat})
        else:
            objs.append({"type": "plane",
                         "position": [0, -2.0 - r(), 0],
                         "normal": [0.2 * r(), 1.0, 0.2 * r()],
                         "material": mat})
    lights = [{"type": "point",
               "position": [8 * r() - 4, 4 + 2 * r(), 8 * r() - 4],
               "color": [r(), r(), r()], "intensity": 2 * r()}
              for _ in range(rnd.randint(0, 2))]
    return {
        "camera": {"position": [0, 0, 6 + 2 * r()],
                   "aspectRatio": 0.8 + r()},
        "objects": objs,
        "lights": lights,
    }


def _trace_both(scene, cfg, W, H, seed):
    n_px = W * H
    pix = jnp.arange(n_px, dtype=jnp.uint32)
    samp = jnp.zeros(n_px, jnp.uint32)
    ju, jv, _, _ = rng_mod.uniform4(pix, samp,
                                    rng_mod.Streams.CAMERA_JITTER,
                                    cfg.seed)
    x = (pix % np.uint32(W)).astype(jnp.float32)
    y = (pix // np.uint32(W)).astype(jnp.float32)
    o, d = cam_mod.go_rays(scene.camera, (x + ju) / W, (y + jv) / H)
    ref = np.asarray(trace_mod.trace(scene, o, d, pix, samp, cfg))
    out = np.asarray(mk.trace_pallas(scene, o, d, pix, samp, cfg,
                                     interpret=True))
    assert np.isfinite(ref).all() and np.isfinite(out).all()
    np.testing.assert_allclose(out, ref, atol=1e-4,
                               err_msg=f"seed {seed}")


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_engines_agree_on_random_scene(seed):
    scene, _ = rt.scene_from_dict(random_scene(seed))
    cfg = trace_mod.TraceConfig(max_depth=3, shadow_samples=1)
    _trace_both(scene, cfg, 10, 8, seed)


@pytest.mark.parametrize("seed", [10, 11])
def test_engines_agree_on_random_bvh_scene(seed, monkeypatch):
    """Same property through the packet-BVH kernel (wide stack walk +
    fused soft-shadow walk): random clustered scenes, accel attached,
    UNROLL_PRIM_LIMIT forced below the primitive count."""
    from raytrace_tpu import scene as scene_mod
    rnd = random.Random(seed)
    r = rnd.random
    objs = []
    for _ in range(rnd.randint(3, 5)):  # clusters so the tree has depth
        cx, cy, cz = 6 * r() - 3, 6 * r() - 3, 6 * r() - 3
        for _ in range(rnd.randint(4, 8)):
            mat = rnd.choice(MATS)(r)
            objs.append({"type": "sphere",
                         "position": [cx + r() - 0.5, cy + r() - 0.5,
                                      cz + r() - 0.5],
                         "radius": 0.15 + 0.3 * r(), "material": mat})
    if rnd.random() < 0.5:
        objs.append({"type": "cube", "position": [0, -1, 0],
                     "size": [0.5 + r()] * 3,
                     "material": rnd.choice(MATS)(r)})
    lights = [{"type": "point",
               "position": [8 * r() - 4, 4 + 2 * r(), 8 * r() - 4],
               "color": [r(), r(), r()], "intensity": 2 * r()}
              for _ in range(rnd.randint(1, 2))]
    scene, _ = rt.scene_from_dict({
        "camera": {"position": [0, 0, 8], "aspectRatio": 1.0},
        "objects": objs, "lights": lights})
    scene = scene_mod.with_accel(scene, leaf_size=4)
    monkeypatch.setattr(mk, "UNROLL_PRIM_LIMIT", 4)
    assert mk._kernel_mode(scene) == "bvh"
    cfg = trace_mod.TraceConfig(max_depth=3, shadow_samples=2)
    _trace_both(scene, cfg, 8, 6, seed)


@pytest.mark.parametrize("seed", [20, 21])
def test_engines_agree_on_random_stream_scene(seed, monkeypatch):
    """Round 5: the same fuzz property through the DMA-STREAM kernel
    mode (unified leaf rows DMA'd from HBM, tight fused soft cone,
    4-wide stack walk when the SMEM budget allows): random clustered
    scenes forced past MAX_BVH_KERNEL_PRIMS."""
    from raytrace_tpu import scene as scene_mod
    rnd = random.Random(seed)
    r = rnd.random
    objs = []
    for _ in range(rnd.randint(3, 5)):
        cx, cy, cz = 6 * r() - 3, 6 * r() - 3, 6 * r() - 3
        for _ in range(rnd.randint(4, 8)):
            mat = rnd.choice(MATS)(r)
            objs.append({"type": "sphere",
                         "position": [cx + r() - 0.5, cy + r() - 0.5,
                                      cz + r() - 0.5],
                         "radius": 0.15 + 0.3 * r(), "material": mat})
    if rnd.random() < 0.5:
        objs.append({"type": "plane", "position": [0, -3.5, 0],
                     "normal": [0, 1, 0],
                     "material": rnd.choice(MATS)(r)})
    lights = [{"type": "point",
               "position": [8 * r() - 4, 4 + 2 * r(), 8 * r() - 4],
               "color": [r(), r(), r()], "intensity": 2 * r()}
              for _ in range(rnd.randint(1, 2))]
    scene, _ = rt.scene_from_dict({
        "camera": {"position": [0, 0, 8], "aspectRatio": 1.0},
        "objects": objs, "lights": lights})
    scene = scene_mod.with_accel(scene, leaf_size=4)
    monkeypatch.setattr(mk, "UNROLL_PRIM_LIMIT", 4)
    monkeypatch.setattr(mk, "MAX_BVH_KERNEL_PRIMS", 8)
    assert mk._kernel_mode(scene) == "stream"
    cfg = trace_mod.TraceConfig(max_depth=3, shadow_samples=2)
    _trace_both(scene, cfg, 8, 6, seed)

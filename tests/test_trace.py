"""End-to-end trace parity vs the scalar Go oracle.

Deterministic configurations compare exactly (f32 vs f64 tolerance);
Monte Carlo configurations compare converged means statistically.
"""

import numpy as np
import jax.numpy as jnp

import raytrace_tpu as rt
from raytrace_tpu import camera as cam_mod
from raytrace_tpu import trace as trace_mod

import go_oracle


def _trace_grid(scene, oracle_scene_dict, cfg, nu=8, nv=6, **oracle_kw):
    """Trace a deterministic (no jitter) grid of rays through both paths."""
    us, vs = np.meshgrid(np.linspace(0.05, 0.95, nu),
                         np.linspace(0.05, 0.95, nv))
    u = jnp.asarray(us.ravel(), jnp.float32)
    v = jnp.asarray(vs.ravel(), jnp.float32)
    o, d = cam_mod.go_rays(scene.camera, u, v)
    pix = jnp.arange(u.shape[0], dtype=jnp.uint32)
    samp = jnp.zeros_like(pix)
    mine = np.asarray(trace_mod.trace(scene, o, d, pix, samp, cfg))

    orc = go_oracle.Oracle(oracle_scene_dict, max_depth=cfg.max_depth,
                           soft_shadows=cfg.soft_shadows,
                           recursive_reflections=cfg.recursive_reflections,
                           **oracle_kw)
    theirs = np.stack([orc.trace(*orc.get_ray(float(uu), float(vv)))
                       for uu, vv in zip(us.ravel(), vs.ravel())])
    return mine, theirs


METAL_SCENE = {
    "camera": {"position": [0, 0, 6], "aspectRatio": 1.33},
    "objects": [
        {"type": "sphere", "position": [0, 0, 0], "radius": 1.2,
         "material": {"type": "metal", "color": [0.8, 0.8, 0.9],
                      "roughness": 0.0, "metallic": 1.0}},
        {"type": "sphere", "position": [2.2, 0.5, -1], "radius": 0.8,
         "material": {"type": "metal", "color": [0.9, 0.5, 0.2],
                      "roughness": 0.0, "metallic": 0.6}},
        {"type": "sphere", "position": [-2, -0.5, 1], "radius": 0.6,
         "material": {"type": "diffuselight", "color": [2, 1.5, 1]}},
    ],
    "lights": [
        {"type": "point", "position": [4, 5, 6], "color": [1, 1, 1],
         "intensity": 3.0},
        {"type": "point", "position": [-4, 2, 5], "color": [0.9, 0.8, 1],
         "intensity": 1.5},
    ],
}


def test_deterministic_metal_scene_matches_oracle():
    scene, _ = rt.scene_from_dict(METAL_SCENE)
    cfg = trace_mod.TraceConfig(max_depth=50, soft_shadows=False)
    mine, theirs = _trace_grid(scene, METAL_SCENE, cfg, nu=12, nv=9)
    np.testing.assert_allclose(mine, theirs, rtol=2e-3, atol=2e-4)


def test_max_depth_truncation():
    scene, _ = rt.scene_from_dict(METAL_SCENE)
    for depth in (1, 2, 5):
        cfg = trace_mod.TraceConfig(max_depth=depth, soft_shadows=False)
        mine, theirs = _trace_grid(scene, METAL_SCENE, cfg, nu=6, nv=4)
        np.testing.assert_allclose(mine, theirs, rtol=2e-3, atol=2e-4,
                                   err_msg=f"depth={depth}")


def test_recursive_reflections_off():
    scene, _ = rt.scene_from_dict(METAL_SCENE)
    cfg = trace_mod.TraceConfig(max_depth=50, soft_shadows=False,
                                recursive_reflections=False)
    mine, theirs = _trace_grid(scene, METAL_SCENE, cfg, nu=6, nv=4)
    np.testing.assert_allclose(mine, theirs, rtol=2e-3, atol=2e-4)


def test_lambertian_single_sphere_deterministic():
    d = {
        "camera": {"position": [0, 0, 3], "aspectRatio": 1.0},
        "objects": [{"type": "sphere", "position": [0, 0, 0], "radius": 1.0,
                     "material": {"type": "lambertian",
                                  "color": [0.5, 0.6, 0.7]}}],
        "lights": [{"type": "point", "position": [0, 5, 5],
                    "color": [1, 1, 1], "intensity": 2.0}],
    }
    scene, _ = rt.scene_from_dict(d)
    cfg = trace_mod.TraceConfig(max_depth=50, soft_shadows=False)
    mine, theirs = _trace_grid(scene, d, cfg, nu=10, nv=10,
                               lambertian_terminal=True)
    np.testing.assert_allclose(mine, theirs, rtol=1e-3, atol=1e-5)


def test_while_and_scan_loops_agree():
    scene, _ = rt.scene_from_dict(METAL_SCENE)
    a = trace_mod.TraceConfig(max_depth=10, soft_shadows=True, loop="while")
    b = trace_mod.TraceConfig(max_depth=10, soft_shadows=True, loop="scan")
    mine_a, _ = _trace_grid(scene, METAL_SCENE, a, nu=6, nv=4)
    mine_b, _ = _trace_grid(scene, METAL_SCENE, b, nu=6, nv=4)
    np.testing.assert_allclose(mine_a, mine_b, rtol=1e-6, atol=1e-7)


def test_glass_scene_statistical(sphere_scene_dict):
    """MC mean parity on the full demo scene (glass branches are random)."""
    scene, _ = rt.scene_from_dict(sphere_scene_dict)
    w, h, spp = 6, 4, 256
    cfg = trace_mod.TraceConfig(max_depth=8, soft_shadows=False, seed=1)

    # mine: spp samples per pixel at pixel centers + jitter-free grid
    us = (np.arange(w) + 0.5) / w
    vs = (np.arange(h) + 0.5) / h
    uu, vv = np.meshgrid(us, vs)
    u = jnp.asarray(np.repeat(uu.ravel(), spp), jnp.float32)
    v = jnp.asarray(np.repeat(vv.ravel(), spp), jnp.float32)
    pix = jnp.asarray(np.repeat(np.arange(w * h), spp), jnp.uint32)
    samp = jnp.asarray(np.tile(np.arange(spp), w * h), jnp.uint32)
    o, d = cam_mod.go_rays(scene.camera, u, v)
    mine = np.asarray(trace_mod.trace(scene, o, d, pix, samp, cfg))
    mine = mine.reshape(w * h, spp, 3)
    mine_mean = mine.mean(axis=1)
    mine_sem = mine.std(axis=1) / np.sqrt(spp)

    orc = go_oracle.Oracle(sphere_scene_dict, max_depth=8,
                           soft_shadows=False,
                           rng=np.random.default_rng(7))
    n_oracle = 96
    for i, (uu_, vv_) in enumerate(zip(uu.ravel(), vv.ravel())):
        o_, d_ = orc.get_ray(float(uu_), float(vv_))
        samples = np.stack([orc.trace(o_, d_) for _ in range(n_oracle)])
        om = samples.mean(axis=0)
        osem = samples.std(axis=0) / np.sqrt(n_oracle)
        tol = 5.0 * np.sqrt(mine_sem[i] ** 2 + osem ** 2) + 5e-3
        assert np.all(np.abs(mine_mean[i] - om) < tol), (
            f"pixel {i}: mine={mine_mean[i]} oracle={om} tol={tol}")

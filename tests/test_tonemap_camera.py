"""Tone map + camera parity."""

import numpy as np
import jax.numpy as jnp

import raytrace_tpu as rt
from raytrace_tpu import camera as cam_mod
from raytrace_tpu.ops import tonemap

import go_oracle


def test_tonemap_formula():
    c = jnp.asarray([[0.0, 0.5, 3.0], [10.0, 0.01, 1.0]], jnp.float32)
    got = np.asarray(tonemap.tonemap(c))
    want = np.clip((1.0 - np.exp(-np.asarray(c))) ** (1 / 2.2), 0, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_to_rgb8_truncates_like_go():
    # Go: uint8(clamped * 255) truncates (vector.go:106-109)
    vals = jnp.asarray([0.0, 0.9999, 1.0, 0.5, 100.7 / 255.0], jnp.float32)
    got = np.asarray(tonemap.to_rgb8(vals))
    assert got.tolist() == [0, 254, 255, 127, 100]


def test_go_camera_matches_oracle():
    d = {"camera": {"position": [1.5, -2.0, 8.0], "lookAt": [9, 9, 9],
                    "up": [0, 0, 1], "fov": 120, "aspectRatio": 1.77},
         "objects": [], "lights": []}
    scene, _ = rt.scene_from_dict(d)
    orc = go_oracle.Oracle(d)
    for u, v in [(0.0, 0.0), (0.5, 0.5), (1.0, 1.0), (0.25, 0.75)]:
        o, dirn = cam_mod.go_rays(scene.camera,
                                  jnp.asarray([u], jnp.float32),
                                  jnp.asarray([v], jnp.float32))
        oo, od = orc.get_ray(u, v)
        np.testing.assert_allclose(np.asarray(o[0]), oo, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(dirn[0]), od,
                                   rtol=1e-5, atol=1e-6)
        # lookAt/up/fov must be ignored (renderer.go:377-390)


def test_lookat_camera_center_ray_points_at_target():
    d = {"camera": {"position": [0, 0, 5], "lookAt": [0, 0, 0],
                    "up": [0, 1, 0], "fov": 60, "aspectRatio": 1.0},
         "objects": [], "lights": []}
    scene, _ = rt.scene_from_dict(d)
    o, dirn = cam_mod.lookat_rays(scene.camera,
                                  jnp.asarray([0.5], jnp.float32),
                                  jnp.asarray([0.5], jnp.float32))
    dn = np.array(dirn[0])
    dn = dn / np.linalg.norm(dn)
    np.testing.assert_allclose(dn, [0, 0, -1], atol=1e-6)

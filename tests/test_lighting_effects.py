"""Light types, shading models, GI helpers, spectacular emitters."""

import numpy as np
import jax.numpy as jnp
import pytest

import raytrace_tpu as rt
from raytrace_tpu import effects_spectacular as spec
from raytrace_tpu import lighting


@pytest.fixture(scope="module")
def pts():
    return jnp.asarray(
        np.random.default_rng(0).normal(size=(32, 3)), jnp.float32)


def test_point_light_attenuation():
    pl = lighting.PointLight([0, 0, 0], intensity=1.0)
    near = pl.sample(jnp.asarray([[1.0, 0, 0]]))
    far = pl.sample(jnp.asarray([[10.0, 0, 0]]))
    assert float(near.radiance.sum()) > float(far.radiance.sum())
    # constant/linear/quadratic 1.0/0.09/0.032 at d=1 (lighting.go:17-71)
    expect = 1.0 / (1.0 + 0.09 + 0.032)
    np.testing.assert_allclose(float(near.radiance[0, 0]), expect,
                               rtol=1e-5)


def test_directional_light_is_uniform(pts):
    dl = lighting.DirectionalLight([0, -1, 0], intensity=2.0)
    s = dl.sample(pts)
    np.testing.assert_allclose(np.asarray(s.direction),
                               [[0.0, 1.0, 0.0]] * 32, atol=1e-6)
    assert np.ptp(np.asarray(s.radiance)) == 0.0  # no falloff


def test_spotlight_cone(pts):
    sl = lighting.SpotLight([0, 5, 0], [0, -1, 0])
    inside = sl.sample(jnp.asarray([[0.0, 0.0, 0.0]]))
    outside = sl.sample(jnp.asarray([[10.0, 0.0, 0.0]]))
    assert float(inside.radiance.sum()) > 0
    np.testing.assert_allclose(np.asarray(outside.radiance), 0.0,
                               atol=1e-6)


def test_area_light_jitter_varies():
    al = lighting.AreaLight([0, 5, 0], [2, 0, 0], [0, 0, 2])
    p = jnp.zeros((8, 3))
    pix = jnp.arange(8, dtype=jnp.uint32)
    samp = jnp.zeros(8, jnp.uint32)
    s = al.sample(p, pix, samp)
    # different lanes draw different points on the emitter
    assert np.ptp(np.asarray(s.direction)[:, 0]) > 0.01


def test_phong_vs_blinn_phong(pts):
    n = jnp.asarray([[0.0, 1.0, 0.0]] * 32)
    albedo = jnp.asarray([[0.5, 0.5, 0.5]] * 32)
    light = lighting.PointLight([0, 5, 0]).sample(pts)
    a = np.asarray(lighting.phong(n, -pts, light, albedo))
    b = np.asarray(lighting.blinn_phong(n, -pts, light, albedo))
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert (a >= 0).all() and (b >= 0).all()
    # both include the ambient floor
    assert (a >= 0.5 * 0.1 - 1e-6).all()


def test_ambient_occlusion(simple_scene_dict):
    scene, _ = rt.scene_from_dict(simple_scene_dict)
    # point just above the sphere's north pole: half-occluded below
    p = jnp.asarray([[0.0, 1.05, 0.0], [0.0, 50.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]] * 2)
    pix = jnp.arange(2, dtype=jnp.uint32)
    samp = jnp.zeros(2, jnp.uint32)
    ao = np.asarray(lighting.ambient_occlusion(
        scene.geometry, p, n, pix, samp, samples=8))
    assert ao[1] == pytest.approx(1.0)       # far away: unoccluded
    assert ao[0] <= ao[1]


def test_one_bounce_indirect_nonblack(simple_scene_dict):
    scene, _ = rt.scene_from_dict(simple_scene_dict)
    # Point beside the sphere, facing it: hemisphere rays hit the lit
    # sphere (rays toward the sky return black - miss semantics).
    p = jnp.asarray([[1.5, 0.0, 0.0]])
    n = jnp.asarray([[-1.0, 0.0, 0.0]])
    pix = jnp.zeros(1, jnp.uint32)
    samp = jnp.zeros(1, jnp.uint32)
    out = np.asarray(lighting.one_bounce_indirect(
        scene, p, n, pix, samp, samples=2))
    assert np.isfinite(out).all()
    assert out.sum() > 0  # the reference stub returned black


def test_spectacular_emitters(pts):
    for name, fn in spec.ALL_EFFECTS.items():
        c0 = np.asarray(fn(pts, t=0.0))
        c1 = np.asarray(fn(pts, t=0.5))
        assert c0.shape == (32, 3), name
        assert np.isfinite(c0).all() and np.isfinite(c1).all(), name
        assert not np.array_equal(c0, c1), f"{name} should animate"

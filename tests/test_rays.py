"""Ray utility surface vs hand-computed Go formulas (ray.go:36-187)."""

import math

import numpy as np
import jax.numpy as jnp

from raytrace_tpu import rays


O = jnp.asarray([[1.0, 2.0, 3.0]])
D = jnp.asarray([[0.0, 0.0, -2.0]])


def test_at_and_point_at_distance():
    np.testing.assert_allclose(np.asarray(rays.at(O, D, jnp.asarray([1.5]))),
                               [[1, 2, 0]], atol=1e-6)
    # distance walks the NORMALIZED direction
    np.testing.assert_allclose(
        np.asarray(rays.point_at_distance(O, D, jnp.asarray([4.0]))),
        [[1, 2, -1]], atol=1e-6)


def test_distance_to_point_is_projection_quirk():
    """ray.go:60-64 'distance' is really the signed projection."""
    p = jnp.asarray([[1.0, 2.0, -7.0]])  # 10 units along -z from origin
    np.testing.assert_allclose(
        np.asarray(rays.distance_to_point(O, D, p)), [10.0], atol=1e-6)
    behind = jnp.asarray([[1.0, 2.0, 8.0]])
    np.testing.assert_allclose(
        np.asarray(rays.distance_to_point(O, D, behind)), [-5.0],
        atol=1e-6)


def test_closest_point_and_squared_distance():
    p = jnp.asarray([[4.0, 2.0, -1.0]])  # off-axis
    cp = np.asarray(rays.closest_point_on_ray(O, D, p))
    np.testing.assert_allclose(cp, [[1, 2, -1]], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(rays.distance_to_point_squared(O, D, p)), [9.0],
        atol=1e-5)
    assert bool(rays.is_point_on_ray(O, D, jnp.asarray([[1, 2, -5.0]]),
                                     1e-3)[0])
    assert not bool(rays.is_point_on_ray(O, D, p, 1e-3)[0])


def test_rodrigues_rotation():
    o, d = rays.rotate(jnp.asarray([[1.0, 0, 0]]),
                       jnp.asarray([[0.0, 1, 0]]),
                       jnp.asarray([0.0, 0.0, 1.0]), math.pi / 2)
    np.testing.assert_allclose(np.asarray(o), [[0, 1, 0]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(d), [[-1, 0, 0]], atol=1e-6)


def test_translate_scale_quirk():
    o, d = rays.translate(O, D, (1.0, 1.0, 1.0))
    np.testing.assert_allclose(np.asarray(o), [[2, 3, 4]])
    o, d = rays.scale(O, D, 2.0)
    np.testing.assert_allclose(np.asarray(o), [[2, 4, 6]])
    # Scale NORMALIZES the direction instead of scaling it (ray.go:104-109)
    np.testing.assert_allclose(np.asarray(d), [[0, 0, -1]], atol=1e-6)


def test_bbox_length_validity():
    lo, hi = rays.bounding_box(O, D)
    np.testing.assert_allclose(np.asarray(lo), [[1, 2, 1]])
    np.testing.assert_allclose(np.asarray(hi), [[1, 2, 3]])
    np.testing.assert_allclose(np.asarray(rays.length(D)), [2.0])
    assert bool(rays.is_valid(O, D)[0])
    # a ray at the world origin is 'invalid' (ray.go:151-153 quirk)
    assert not bool(rays.is_valid(jnp.zeros((1, 3)), D)[0])


def test_parallel_perpendicular_angle():
    d2 = jnp.asarray([[0.0, 0.0, 5.0]])
    assert bool(rays.is_parallel(D, d2)[0])
    d3 = jnp.asarray([[3.0, 0.0, 0.0]])
    assert bool(rays.is_perpendicular(D, d3)[0])
    np.testing.assert_allclose(np.asarray(rays.angle(D, d3)),
                               [math.pi / 2], atol=1e-6)


def test_distance_between_rays():
    # skew lines: x-axis and a y-parallel line offset by z=5
    o1 = jnp.zeros((1, 3))
    d1 = jnp.asarray([[1.0, 0, 0]])
    o2 = jnp.asarray([[0.0, 0.0, 5.0]])
    d2 = jnp.asarray([[0.0, 1.0, 0.0]])
    np.testing.assert_allclose(
        np.asarray(rays.distance_to_ray(o1, d1, o2, d2)), [5.0],
        atol=1e-5)
    # parallel rays: falls back to the projection quirk (ray.go:172-174)
    o3 = jnp.asarray([[0.0, 3.0, 0.0]])
    np.testing.assert_allclose(
        np.asarray(rays.distance_to_ray(o1, d1, o3, d1)), [0.0],
        atol=1e-6)

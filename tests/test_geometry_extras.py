"""Batched parity for the reference's dead-code geometry queries
(sphere.go:80-130, triangle.go:102-196), quirks reproduced as written.
"""
import numpy as np
import jax.numpy as jnp

from raytrace_tpu.models import geometry_extras as gx


def test_sphere_area_volume():
    r = jnp.asarray([1.0, 2.0, 0.5])
    np.testing.assert_allclose(gx.sphere_surface_area(r),
                               4 * np.pi * np.array([1, 4, 0.25]),
                               rtol=1e-6)
    np.testing.assert_allclose(gx.sphere_volume(r),
                               (4 / 3) * np.pi * np.array([1, 8, 0.125]),
                               rtol=1e-6)


def test_sphere_point_queries():
    c = jnp.asarray([[0.0, 0, 0], [5.0, 0, 0]])
    r = jnp.asarray([1.0, 2.0])
    p = jnp.asarray([[0.5, 0, 0], [5.0, 4.0, 0]])
    np.testing.assert_array_equal(gx.sphere_contains_point(c, r, p),
                                  [True, False])
    # boundary is inclusive (<=, sphere.go:90)
    assert bool(gx.sphere_contains_point([0., 0, 0], 1.0, [1.0, 0, 0]))
    np.testing.assert_allclose(
        gx.sphere_closest_point(c, r, p),
        [[1, 0, 0], [5, 2, 0]], atol=1e-6)
    # p == center: zero-normalize quirk returns the center itself
    np.testing.assert_allclose(
        gx.sphere_closest_point([0., 0, 0], 1.0, [0., 0, 0]),
        [0, 0, 0])
    np.testing.assert_allclose(gx.sphere_distance_to_point(c, r, p),
                               [0.0, 2.0], atol=1e-6)
    np.testing.assert_allclose(
        gx.sphere_normal_at_point([0., 0, 0], [0., 3, 0]), [0, 1, 0],
        atol=1e-7)


def test_spheres_intersect_and_volume():
    assert bool(gx.spheres_intersect([0., 0, 0], 1.0, [1.5, 0, 0], 1.0))
    assert not bool(gx.spheres_intersect([0., 0, 0], 1.0, [3., 0, 0], 1.0))
    # disjoint -> 0
    assert float(gx.sphere_intersection_volume(
        [0., 0, 0], 1.0, [5., 0, 0], 1.0)) == 0.0
    # containment -> smaller sphere's volume (sphere.go:120-123)
    np.testing.assert_allclose(
        gx.sphere_intersection_volume([0., 0, 0], 3.0, [0.5, 0, 0], 1.0),
        (4 / 3) * np.pi, rtol=1e-6)
    # partial overlap pins the reference's expression AS WRITTEN:
    # h = (r1+r2-d)/2 in pi*h^2*(3*(r1+r2) - h)/3. That is NOT the true
    # lens volume even for equal radii (r=1, d=1: true 5pi/12 ~ 1.309,
    # Go formula 11pi/24 ~ 1.440) - parity with dead code, not physics.
    for r1, r2, d in ((1.0, 1.0, 1.0), (2.0, 1.0, 2.5)):
        h = (r1 + r2 - d) / 2.0
        np.testing.assert_allclose(
            gx.sphere_intersection_volume([0., 0, 0], r1, [d, 0, 0], r2),
            np.pi * h * h * (3 * (r1 + r2) - h) / 3.0, rtol=1e-6)


V0, V1, V2 = (np.array([0., 0, 0]), np.array([2., 0, 0]),
              np.array([0., 2, 0]))


def test_triangle_bbox_area_centroid():
    lo, hi = gx.triangle_bounding_box(V0, V1, V2)
    np.testing.assert_allclose(lo, [0, 0, 0])
    np.testing.assert_allclose(hi, [2, 2, 0])
    np.testing.assert_allclose(gx.triangle_area(V0, V1, V2), 2.0)
    np.testing.assert_allclose(gx.triangle_centroid(V0, V1, V2),
                               [2 / 3, 2 / 3, 0], rtol=1e-6)
    # batched over a leading axis
    v0 = jnp.stack([jnp.asarray(V0)] * 4)
    v1 = jnp.stack([jnp.asarray(V1)] * 4)
    v2 = jnp.stack([jnp.asarray(V2)] * 4)
    assert gx.triangle_area(v0, v1, v2).shape == (4,)


def test_triangle_contains_is_the_reference_quirk():
    """triangle.go:141-162 uses w = v0 - point where the standard
    algorithm uses point - v0 and dot00 = w.w where it uses e2.e2: the
    result is NOT real containment. Pin the quirk by direct transcription
    of the Go expressions."""
    def go_contains(p):
        w = V0 - p
        d00 = w @ w
        d01 = w @ (V1 - V0)
        d02 = w @ (V2 - V0)
        d11 = (V1 - V0) @ (V1 - V0)
        d12 = (V1 - V0) @ (V2 - V0)
        denom = d00 * d11 - d01 * d01
        if denom == 0:
            return False
        u = (d11 * d02 - d01 * d12) / denom
        v = (d00 * d12 - d01 * d02) / denom
        return u >= 0 and v >= 0 and u + v <= 1

    pts = [np.array(p) for p in
           [[0.5, 0.5, 0], [2 / 3, 2 / 3, 0], [5.0, 5.0, 0],
            [-1.0, -1.0, 0], [0.1, 0.1, 0], [1.0, 0.9, 0]]]
    got = [bool(gx.triangle_contains_point(V0, V1, V2, p)) for p in pts]
    want = [go_contains(p) for p in pts]
    assert got == want, (got, want)


def test_triangle_closest_point_vertex_fallback():
    """When the plane projection fails the contains test the reference
    returns the nearest VERTEX, never an edge point (triangle.go:183-195).
    """
    # far beyond vertex v1 -> the projection is outside, nearest vertex v1
    p = np.array([10.0, -1.0, 3.0])
    cp = np.asarray(gx.triangle_closest_point(V0, V1, V2, p))
    np.testing.assert_allclose(cp, V1)
    d = float(gx.triangle_distance_to_point(V0, V1, V2, p))
    np.testing.assert_allclose(d, np.linalg.norm(p - V1), rtol=1e-6)
    # and the projection branch where the quirk test accepts
    p2 = np.array([0.2, 0.2, 1.0])
    if bool(gx.triangle_contains_point(V0, V1, V2, [0.2, 0.2, 0.0])):
        np.testing.assert_allclose(
            np.asarray(gx.triangle_closest_point(V0, V1, V2, p2)),
            [0.2, 0.2, 0.0], atol=1e-6)

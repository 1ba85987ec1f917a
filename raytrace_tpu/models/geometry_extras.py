"""Convenience geometry queries: batched parity with the reference's
dead-code API surface (sphere.go:80-130, triangle.go:102-196 - methods
no caller in the reference ever reaches, kept for API completeness).

All functions are batched over a leading shape B and broadcast over the
primitive axis where one exists; quirks are reproduced as written:

* ``triangle_contains_point`` uses the reference's SCRAMBLED
  barycentric setup (triangle.go:141-162): v0 = Vertices[0] - point
  (not point - v0), then the standard two-basis solve applied to that
  vector. The result is NOT a correct point-in-triangle test - it is
  what the Go code computes, and ``triangle_closest_point`` inherits it.
* ``triangle_closest_point`` (triangle.go:165-196) falls back to the
  nearest VERTEX when the plane projection fails the contains test -
  never an edge point.
* ``sphere_intersection_volume`` (sphere.go:111-130) uses one
  spherical-cap term with h = (r1 + r2 - d) / 2 and 3*(r1+r2) - h,
  which is NOT the true lens volume for any radii (equal radii r=1 at
  d=1: true 5pi/12, this formula 11pi/24); reproduced as written.
* normalization follows vector.go's zero-vector quirk (returns the
  zero vector), so ``sphere_closest_point(center) == center``.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..fastmath import vec3_normalize

__all__ = [
    "sphere_surface_area", "sphere_volume", "sphere_contains_point",
    "sphere_closest_point", "sphere_distance_to_point",
    "sphere_normal_at_point", "spheres_intersect",
    "sphere_intersection_volume",
    "triangle_bounding_box", "triangle_area", "triangle_centroid",
    "triangle_contains_point", "triangle_closest_point",
    "triangle_distance_to_point",
]

_PI = np.float32(np.pi)


# -- spheres (sphere.go:80-130) --------------------------------------------

def sphere_surface_area(radius):
    """4*pi*r^2 (sphere.go:80-82)."""
    radius = jnp.asarray(radius)
    return 4.0 * _PI * radius * radius


def sphere_volume(radius):
    """(4/3)*pi*r^3 (sphere.go:84-86)."""
    radius = jnp.asarray(radius)
    return (4.0 / 3.0) * _PI * radius * radius * radius


def sphere_contains_point(center, radius, point):
    """|p - c|^2 <= r^2, boundary inclusive (sphere.go:88-91)."""
    d = jnp.asarray(point) - jnp.asarray(center)
    return jnp.sum(d * d, axis=-1) <= jnp.asarray(radius) ** 2


def sphere_closest_point(center, radius, point):
    """c + normalize(p - c) * r (sphere.go:93-96); p == c returns c by
    the zero-normalize quirk."""
    center = jnp.asarray(center)
    d = vec3_normalize(jnp.asarray(point) - center)
    return center + d * jnp.asarray(radius)[..., None]


def sphere_distance_to_point(center, radius, point):
    """max(0, |p - c| - r) (sphere.go:98-101): 0 inside."""
    d = jnp.asarray(point) - jnp.asarray(center)
    return jnp.maximum(0.0, jnp.sqrt(jnp.sum(d * d, axis=-1))
                       - jnp.asarray(radius))


def sphere_normal_at_point(center, point):
    """normalize(p - c) (sphere.go:103-105)."""
    return vec3_normalize(jnp.asarray(point) - jnp.asarray(center))


def spheres_intersect(c1, r1, c2, r2):
    """|c1 - c2| <= r1 + r2 (sphere.go:107-110)."""
    d = jnp.asarray(c1) - jnp.asarray(c2)
    return jnp.sqrt(jnp.sum(d * d, axis=-1)) <= (jnp.asarray(r1)
                                                 + jnp.asarray(r2))


def sphere_intersection_volume(c1, r1, c2, r2):
    """Overlap volume (sphere.go:111-130), quirks included: containment
    returns the SMALLER sphere's volume whenever d <= |r1 - r2|, and
    the partial-overlap branch uses one symmetric cap height
    h = (r1 + r2 - d)/2 in pi*h^2*(3*(r1+r2) - h)/3 (exact only for
    r1 == r2)."""
    c1, c2 = jnp.asarray(c1), jnp.asarray(c2)
    r1, r2 = jnp.asarray(r1), jnp.asarray(r2)
    d = jnp.sqrt(jnp.sum((c1 - c2) ** 2, axis=-1))
    rmin = jnp.minimum(r1, r2)
    contained = (4.0 / 3.0) * _PI * rmin * rmin * rmin
    h = (r1 + r2 - d) / 2.0
    partial = _PI * h * h * (3.0 * (r1 + r2) - h) / 3.0
    vol = jnp.where(d <= jnp.abs(r1 - r2), contained, partial)
    return jnp.where(d > r1 + r2, 0.0, vol)


# -- triangles (triangle.go:102-196) ----------------------------------------

def triangle_bounding_box(v0, v1, v2):
    """(min, max) over the three vertices (triangle.go:102-128)."""
    v = jnp.stack([jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2)],
                  axis=-2)
    return jnp.min(v, axis=-2), jnp.max(v, axis=-2)


def triangle_area(v0, v1, v2):
    """|e1 x e2| / 2 (triangle.go:130-135)."""
    v0 = jnp.asarray(v0)
    c = jnp.cross(jnp.asarray(v1) - v0, jnp.asarray(v2) - v0)
    return jnp.sqrt(jnp.sum(c * c, axis=-1)) / 2.0


def triangle_centroid(v0, v1, v2):
    """(v0 + v1 + v2) / 3 (triangle.go:137-139)."""
    return (jnp.asarray(v0) + jnp.asarray(v1) + jnp.asarray(v2)) / 3.0


def triangle_contains_point(v0, v1, v2, point):
    """triangle.go:141-162 AS WRITTEN: the test vector is
    w = Vertices[0] - point (sign-flipped and used where the standard
    algorithm uses P - A), then dot00 = w.w etc. feed the usual 2x2
    solve. This is NOT a correct containment test; it is bit-parity
    with the reference's dead code (the doc above explains)."""
    v0 = jnp.asarray(v0)
    e1 = jnp.asarray(v1) - v0
    e2 = jnp.asarray(v2) - v0
    w = v0 - jnp.asarray(point)
    dot00 = jnp.sum(w * w, axis=-1)
    dot01 = jnp.sum(w * e1, axis=-1)
    dot02 = jnp.sum(w * e2, axis=-1)
    dot11 = jnp.sum(e1 * e1, axis=-1)
    dot12 = jnp.sum(e1 * e2, axis=-1)
    denom = dot00 * dot11 - dot01 * dot01
    inv = 1.0 / jnp.where(denom == 0.0, 1.0, denom)
    u = (dot11 * dot02 - dot01 * dot12) * inv
    v = (dot00 * dot12 - dot01 * dot02) * inv
    return (denom != 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)


def triangle_closest_point(v0, v1, v2, point):
    """triangle.go:165-196: project onto the triangle plane; if the
    (quirky) contains test accepts the projection return it, else the
    nearest VERTEX (never an edge interior)."""
    v0 = jnp.asarray(v0)
    v1 = jnp.asarray(v1)
    v2 = jnp.asarray(v2)
    point = jnp.asarray(point)
    n = vec3_normalize(jnp.cross(v1 - v0, v2 - v0))
    dist = jnp.sum((point - v0) * n, axis=-1)
    on_plane = point - n * dist[..., None]
    inside = triangle_contains_point(v0, v1, v2, on_plane)

    d0 = jnp.sum((point - v0) ** 2, axis=-1)
    d1 = jnp.sum((point - v1) ** 2, axis=-1)
    d2 = jnp.sum((point - v2) ** 2, axis=-1)
    # strict < keeps the earliest vertex on ties, like the Go loop
    best = jnp.where((d1 < d0)[..., None], v1, v0)
    bestd = jnp.minimum(d0, d1)
    best = jnp.where((d2 < bestd)[..., None], v2, best)
    return jnp.where(inside[..., None], on_plane, best)


def triangle_distance_to_point(v0, v1, v2, point):
    """|p - closest| (triangle.go:193-196)."""
    cp = triangle_closest_point(v0, v1, v2, point)
    d = jnp.asarray(point) - cp
    return jnp.sqrt(jnp.sum(d * d, axis=-1))

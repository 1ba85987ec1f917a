"""Ray utility surface: vectorized forms of geometry/ray.go's methods.

The reference's Ray type carries ~20 convenience methods beyond the hit
interface (ray.go:36-187) - parameterization, point/ray distances,
Rodrigues rotation, bounding box, parallel/perpendicular/angle tests.
Here a "ray" is the pair (origin, direction) of (...,3) arrays; every
function is batched and reproduces the Go formula (including its quirks -
e.g. GetDistanceToPoint returns the PROJECTION length, not a distance,
ray.go:60-64, and Scale() scales the origin while normalizing the
direction, ray.go:104-109).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

NEAR_ZERO = 1e-8  # Vec3.NearZero threshold (vector.go:124-126 uses 1e-8)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _norm(v):
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return jnp.where(n > 0, v / jnp.where(n > 0, n, 1.0), 0.0)


def at(origin, direction, t):
    """Ray.At / PointAtParameter (ray.go:36-42)."""
    t = jnp.asarray(t)
    return origin + direction * t[..., None]


def point_at_distance(origin, direction, distance):
    """GetPointAtDistance (ray.go:56-58): along the NORMALIZED direction."""
    d = jnp.asarray(distance)
    return origin + _norm(direction) * d[..., None]


def distance_to_point(origin, direction, point):
    """GetDistanceToPoint (ray.go:60-64).

    Quirk preserved: despite the name, this is the SIGNED PROJECTION of
    (point - origin) onto the unit direction, not a distance.
    """
    return _dot(point - origin, _norm(direction))


def closest_point_on_ray(origin, direction, point):
    """GetClosestPointOnRay (ray.go:66-70) - unclamped line projection."""
    u = _norm(direction)
    proj = _dot(point - origin, u)
    return origin + u * proj[..., None]


def distance_to_point_squared(origin, direction, point):
    """GetDistanceToPointSquared (ray.go:72-75)."""
    cp = closest_point_on_ray(origin, direction, point)
    d = point - cp
    return _dot(d, d)


def is_point_on_ray(origin, direction, point, tolerance=1e-6):
    """IsPointOnRay (ray.go:77-80). Quirk preserved: compares the SQUARED
    distance against tolerance^2 exactly as written."""
    return distance_to_point_squared(origin, direction,
                                     point) <= tolerance * tolerance


def rotate(origin, direction, axis, angle):
    """Ray.Rotate (ray.go:111-124): Rodrigues rotation matrix applied to
    both origin and direction (via Transform, ray.go:90-95)."""
    axis = jnp.asarray(axis, jnp.float32)
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    ax, ay, az = axis[..., 0], axis[..., 1], axis[..., 2]
    one_c = 1.0 - c
    m = jnp.stack([
        jnp.stack([c + ax * ax * one_c, ax * ay * one_c - az * s,
                   ax * az * one_c + ay * s], -1),
        jnp.stack([ay * ax * one_c + az * s, c + ay * ay * one_c,
                   ay * az * one_c - ax * s], -1),
        jnp.stack([az * ax * one_c - ay * s, az * ay * one_c + ax * s,
                   c + az * az * one_c], -1),
    ], -2)
    rot = lambda v: jnp.einsum("...ij,...j->...i", m, v)
    return rot(origin), rot(direction)


def translate(origin, direction, offset):
    """Ray.Translate (ray.go:97-102)."""
    return origin + jnp.asarray(offset), direction


def scale(origin, direction, factor):
    """Ray.Scale (ray.go:104-109). Quirk preserved: scales the origin and
    NORMALIZES the direction (it does not scale it)."""
    return origin * factor, _norm(direction)


def bounding_box(origin, direction):
    """GetBoundingBox (ray.go:126-141): AABB of origin and origin+dir."""
    end = origin + direction
    return jnp.minimum(origin, end), jnp.maximum(origin, end)


def length(direction):
    """GetLength (ray.go:143-145)."""
    return jnp.linalg.norm(direction, axis=-1)


def is_valid(origin, direction):
    """IsValid (ray.go:151-153): neither origin nor direction near zero.

    Quirk preserved: a ray AT the world origin is 'invalid'."""
    o_near = jnp.all(jnp.abs(origin) < NEAR_ZERO, axis=-1)
    d_near = jnp.all(jnp.abs(direction) < NEAR_ZERO, axis=-1)
    return ~o_near & ~d_near


def is_parallel(d1, d2):
    """IsParallel (ray.go:155-158): cross product near zero."""
    return jnp.all(jnp.abs(jnp.cross(d1, d2)) < NEAR_ZERO, axis=-1)


def is_perpendicular(d1, d2):
    """IsPerpendicular (ray.go:160-163): |d1.d2| < 1e-6 (raw, unnormalized)."""
    return jnp.abs(_dot(d1, d2)) < 1e-6


def angle(d1, d2):
    """GetAngle (ray.go:165-169)."""
    c = jnp.clip(_dot(_norm(d1), _norm(d2)), -1.0, 1.0)
    return jnp.arccos(c)


def distance_to_ray(o1, d1, o2, d2):
    """GetDistanceToRay (ray.go:171-187): closest distance between two
    lines; falls back to the projection quirk for parallel rays."""
    cross = jnp.cross(d1, d2)
    parallel = jnp.all(jnp.abs(cross) < NEAR_ZERO, axis=-1)
    denom = jnp.where(parallel, 1.0, _dot(cross, cross))
    to_other = o2 - o1
    t1 = _dot(jnp.cross(to_other, d2), cross) / denom
    t2 = _dot(jnp.cross(to_other, d1), cross) / denom
    p1 = o1 + d1 * t1[..., None]
    p2 = o2 + d2 * t2[..., None]
    skew = jnp.linalg.norm(p1 - p2, axis=-1)
    return jnp.where(parallel, distance_to_point(o1, d1, o2), skew)

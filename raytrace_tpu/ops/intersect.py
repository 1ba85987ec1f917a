"""Closest-hit and any-hit intersection ops (pure-jnp reference path).

Replaces the reference's per-object interface dispatch and linear scan
(renderer.go:333-346 hitWorld; sphere.go:22-59; triangle.go:36-82;
scene.go:196-209 Mesh.Hit) with batched lane x primitive intersection and an
argmin reduction - the SPMD form of "loop over hittables, keep closest".

Conventions carried over from the reference:
  * ray directions are NOT normalized (camera rays are raw viewport vectors,
    renderer.go:377-390); the sphere quadratic uses a = |d|^2 so t stays in
    ray-parameter units.
  * acceptance test is (tMin <= t <= tMax) with *strict* failure tests
    (root < tMin || tMax < root, sphere.go:35-39).
  * triangle epsilon 1e-6 on the determinant (triangle.go:42).
  * tMin = 1e-3 everywhere (primary, bounce, and shadow rays).

All functions are shape-polymorphic over a leading batch shape B.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np  # noqa: E402  (BIG must not touch the backend at import)
BIG = np.float32(3.0e38)  # sentinel "no hit" distance (< f32 inf to keep math finite)


class Hit(NamedTuple):
    """SoA hit record, the vectorized HitRecord (geometry/ray.go:7-13)."""

    t: jax.Array           # (B,) hit distance; BIG when no hit
    hit: jax.Array         # (B,) bool
    point: jax.Array       # (B,3)
    normal: jax.Array      # (B,3) front-face flipped shading normal
    front_face: jax.Array  # (B,) bool
    mat_id: jax.Array      # (B,) int32


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def sphere_t(origin, direction, center, radius, t_min, t_max):
    """Hit distances for all (lane, sphere) pairs.

    origin/direction: (B,3); center: (Ns,3); radius: (Ns,).
    Returns t: (B,Ns) with BIG where there is no valid hit.

    Parity with sphere.go:22-59: half-b quadratic, near root preferred,
    far root fallback, both tested against [t_min, t_max].
    """
    oc = origin[..., None, :] - center  # (B,Ns,3)
    a = _dot(direction, direction)[..., None]  # (B,1)
    half_b = jnp.sum(oc * direction[..., None, :], axis=-1)  # (B,Ns)
    c = _dot(oc, oc) - radius * radius  # (B,Ns)
    disc = half_b * half_b - a * c
    ok = disc >= 0.0
    # Double-where: sqrt's gradient at 0 is inf, and a plain
    # sqrt(max(disc,0)) poisons reverse-mode AD with inf*0=NaN on every
    # missing lane. Clamp the *input* on masked lanes instead. EXACT
    # tangent rays (disc == 0, accepted by the >= parity test) would
    # still see sqrt's infinite derivative: keep their forward value and
    # zero their gradient (round 5 - a 1000-sphere grid at low res hits
    # this measure-zero set in practice).
    pos = jax.lax.stop_gradient(disc) > 0.0
    sqrtd = jnp.where(
        pos, jnp.sqrt(jnp.where(pos, disc, 1.0)),
        jax.lax.stop_gradient(jnp.sqrt(jnp.where(ok, disc, 1.0))))
    inv_a = 1.0 / a
    root0 = (-half_b - sqrtd) * inv_a
    root1 = (-half_b + sqrtd) * inv_a
    in0 = ok & (root0 >= t_min) & (root0 <= t_max)
    in1 = ok & (root1 >= t_min) & (root1 <= t_max)
    t = jnp.where(in0, root0, jnp.where(in1, root1, BIG))
    return t


def triangle_t(origin, direction, v0, edge1, edge2, t_min, t_max):
    """Moller-Trumbore hit distances for all (lane, triangle) pairs.

    origin/direction: (B,3); v0/edge1/edge2: (Nt,3) with edges precomputed
    (edge1 = v1-v0, edge2 = v2-v0, triangle.go:37-38).
    Returns t: (B,Nt) with BIG where there is no valid hit.
    """
    d = direction[..., None, :]  # (B,1,3)
    h = jnp.cross(d, edge2[None, ...] if edge2.ndim == 2 else edge2)  # (B,Nt,3)
    a = jnp.sum(edge1 * h, axis=-1)  # (B,Nt)
    degenerate = jnp.abs(a) < 1e-6  # strict ( > -1e-6 && < 1e-6 ), triangle.go:42
    f = 1.0 / jnp.where(degenerate, 1.0, a)
    s = origin[..., None, :] - v0  # (B,Nt,3)
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, edge1[None, ...] if edge1.ndim == 2 else edge1)
    v = f * jnp.sum(d * q, axis=-1)
    t = f * jnp.sum(edge2 * q, axis=-1)
    valid = (~degenerate) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
    valid &= (t >= t_min) & (t <= t_max)
    return jnp.where(valid, t, BIG)


def triangle_blocked(origin, direction, v0, edge1, edge2, t_min, t_max):
    """Division-free Moller-Trumbore ANY-HIT: does the ray hit the
    triangle with t in [t_min, t_max]? Returns bool (B,Nt).

    Same acceptance set as triangle_t < BIG, reformulated for shadow
    rays (the 16-sample soft loop is the hot path of hit-heavy scenes):
    the triple-product identities det = e1.(d x e2) = -d.(e1 x e2) and
    s.(d x e2) = d.(e2 x s) move every cross product off the
    per-direction path - all three numerators become dot products
    against per-(lane,triangle) constants - and the division disappears
    by comparing sign-corrected numerators against |det| (u >= 0 etc.
    are sign-exact; the in-range tests multiply through by |det|). The
    u <= 1 check is dropped: v >= 0 and u + v <= 1 imply it. Verdicts
    match the classic form except at float-rounding boundaries (1-2 ulp
    of an edge/t-limit - measure-zero geometry; same class as the
    documented engine-divergence gates). The Pallas megakernel mirrors
    this exact expression order (megakernel _tri_any/_tri_all/
    any_hit_pre) so engines agree.
    """
    d = direction[..., None, :]                      # (B,1,3)
    s = origin[..., None, :] - v0                    # (B,Nt,3)
    n2 = jnp.cross(edge1, edge2)                     # (Nt,3)
    c1 = jnp.cross(edge2, s)                         # (B,Nt,3)
    q = jnp.cross(s, edge1)                          # (B,Nt,3)
    det = -jnp.sum(d * n2, axis=-1)                  # (B,Nt)
    sg = jnp.where(det >= 0.0, 1.0, -1.0)
    ad = det * sg
    au = jnp.sum(d * c1, axis=-1) * sg
    av = jnp.sum(d * q, axis=-1) * sg
    at = jnp.sum(edge2 * q, axis=-1) * sg
    t_max = jnp.asarray(t_max)
    tm = t_max[..., None] if t_max.ndim else t_max
    return ((ad >= 1e-6) & (au >= 0.0) & (av >= 0.0) & (au + av <= ad)
            & (at >= t_min * ad) & (at <= tm * ad))


def box_t(origin, direction, box_min, box_max, t_min, t_max):
    """CLOSEST-hit distances for all (lane, box) pairs: (B,Nb), BIG on
    miss. The slab interval's endpoints are the box's two surface
    crossings; near root preferred, far root fallback, both tested
    against [t_min, t_max] - exactly the sphere's two-root rule
    (sphere_t) applied to the cube the 12 face triangles tile. The hit
    record's outward normal is reconstructed point-based in
    _hit_from_tidx (dominant axis of (p - center)/half)."""
    inv = 1.0 / jnp.where(direction == 0.0, 1e-30, direction)
    o = origin[..., None, :]
    iv = inv[..., None, :]
    t0 = (box_min - o) * iv
    t1 = (box_max - o) * iv
    near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    ok = near <= far
    in0 = ok & (near >= t_min) & (near <= t_max)
    in1 = ok & (far >= t_min) & (far <= t_max)
    return jnp.where(in0, near, jnp.where(in1, far, BIG))


def box_blocked(origin, direction, box_min, box_max, t_min, t_max):
    """Axis-aligned box ANY-HIT: (B, Nb) bool.

    A closed box's surface crossings along the ray are the slab
    interval's endpoints [near, far]; like the sphere's two roots, the
    ray hits the surface with t in [t_min, t_max] iff near or far lands
    in the range (a segment strictly inside the box crosses no face).
    This is the occlusion form of the 12 cube triangles the loader
    keeps for closest-hit (scene.Geometry.box_min doc; verdicts agree
    except at float rounding boundaries on edges/grazing rays).
    near/far are NOT clamped to the range first - that would turn
    "segment inside the box" into a false positive.
    """
    inv = 1.0 / jnp.where(direction == 0.0, 1e-30, direction)  # (B,3)
    o = origin[..., None, :]
    iv = inv[..., None, :]
    t0 = (box_min - o) * iv  # (B,Nb,3)
    t1 = (box_max - o) * iv
    near = jnp.max(jnp.minimum(t0, t1), axis=-1)  # (B,Nb)
    far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_max = jnp.asarray(t_max)
    tm = t_max[..., None] if t_max.ndim else t_max
    in_rng = lambda t: (t >= t_min) & (t <= tm)
    return (near <= far) & (in_rng(near) | in_rng(far))


def plane_t(origin, direction, point, normal, t_min, t_max):
    """Infinite-plane hit distances for all (lane, plane) pairs.

    origin/direction: (B,3); point/normal: (Np,3) with normal unit.
    Parity with plane.go:21-46: exact denominator==0 miss test, then
    t = (point - origin).normal / denom in [t_min, t_max].
    Returns t: (B,Np) with BIG where there is no valid hit.
    """
    denom = jnp.sum(direction[..., None, :] * normal, axis=-1)  # (B,Np)
    para = denom == 0.0
    t = (jnp.sum((point - origin[..., None, :]) * normal, axis=-1)
         / jnp.where(para, 1.0, denom))
    valid = (~para) & (t >= t_min) & (t <= t_max)
    return jnp.where(valid, t, BIG)


def use_accel(accel) -> bool:
    """Should the jnp engine walk this BVH? Only where gathers are cheap.

    The gather-walk traversal (bvh.traverse_*) pays off on CPU. On TPU it
    is a catastrophe: each lock-step while-loop iteration performs ~6
    gathers over the whole wavefront, and TPU gathers are slow - measured
    ~3 s for ONE 640K-lane any-hit walk on v5e (vs ~30 ms for a
    250-primitive brute-force scan of the same wavefront). Worse, soft
    shadows run 17 walks per bounce, pushing single-program wall time past
    the tunneled TPU worker's execution watchdog (~60-90 s), which KILLS
    the worker process ("TPU worker crashed"). Large scenes on TPU belong
    to the Pallas packet-BVH megakernel (ops/megakernel.py kernel mode
    "bvh"); the jnp engine stays brute-force there.
    """
    return accel is not None and jax.default_backend() == "cpu"


# Brute-force (lanes x primitives) temporaries are chunked along the
# primitive axis past this count: a 1000-primitive scene over a 2M-lane
# wavefront would otherwise materialize multi-GB (B,N,3) intermediates
# (sphere oc, triangle h/s/q) and OOM the chip. lax.scan over
# <=CHUNK-wide slabs bounds them at B*CHUNK*3 (~1.5 GB at the default
# band budget) while keeping ONE jit call - band splitting instead would
# pay the ~30 ms tunnel RPC per band, hundreds of times per frame.
PRIM_CHUNK = 64


def _chunked_min_t(t_fn, n, origin):
    """Scan t_fn over PRIM_CHUNK-wide primitive slabs; first-min winner.

    t_fn(start) -> (B, PRIM_CHUNK) hit distances for primitives
    [start, start+PRIM_CHUNK) with out-of-range columns already BIG.
    Returns (t (B,), idx (B,)) with idx global over [0, n) - identical to
    argmin over the full (B, n) array (strict < keeps the earliest slab,
    argmin keeps the earliest column within a slab).
    """
    B = origin.shape[:-1]
    n_chunks = -(-n // PRIM_CHUNK)

    def body(carry, k):
        t_best, i_best = carry
        start = k * PRIM_CHUNK
        t = t_fn(start)  # (B, PRIM_CHUNK)
        j = jnp.argmin(t, axis=-1)
        tj = jnp.take_along_axis(t, j[..., None], axis=-1)[..., 0]
        win = tj < t_best
        return (jnp.where(win, tj, t_best),
                jnp.where(win, start + j.astype(jnp.int32), i_best)), None

    init = (jnp.full(B, BIG, origin.dtype), jnp.zeros(B, jnp.int32))
    (t, idx), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return t, idx


def _pad_prims(n, *arrays):
    """Pad primitive arrays up to a PRIM_CHUNK multiple (slice-safe)."""
    pad = (-n) % PRIM_CHUNK
    return [jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
            for a in arrays]


def _slab(a, start):
    return jax.lax.dynamic_slice_in_dim(a, start, PRIM_CHUNK, axis=0)


def _mask_cols(t, start, n):
    col = start + jnp.arange(PRIM_CHUNK)
    return jnp.where(col < n, t, BIG)


def closest_hit(geom, origin, direction, t_min=1e-3, t_max=BIG,
                accel=None) -> Hit:
    """hitWorld (renderer.go:333-346): closest hit across all primitives.

    With ``accel`` (a bvh.FlatBVH over the scene's spheres+triangles,
    see scene.Scene.accel) the lanes x primitives brute-force scan is
    replaced by a stackless BVH walk - the working form of the traversal
    spatial_acceleration.go:45-69 was meant to give hitWorld. Results are
    identical (same per-primitive math, closest-t winner). The walk is
    CPU-only (see use_accel); on TPU the brute-force scan wins and large
    scenes belong to the Pallas packet-BVH megakernel.
    """
    if use_accel(accel):
        return _closest_hit_accel(geom, accel, origin, direction, t_min,
                                  t_max)
    B = origin.shape[:-1]
    ns = geom.sph_center.shape[0]
    nt = geom.tri_v0.shape[0]
    npl = getattr(geom, "pl_point", jnp.zeros((0, 3))).shape[0]
    nb = getattr(geom, "box_min", jnp.zeros((0, 3))).shape[0]
    # Cube faces [occl_tris, nt) are hit as boxes (box_t); their rows
    # keep the full-nt index space so winner ids stay stable.
    occl = getattr(geom, "occl_tris", -1)
    nt_t = nt if occl < 0 else occl

    if ns + nt_t + npl + nb > PRIM_CHUNK:
        return _closest_hit_chunked(geom, origin, direction, t_min, t_max,
                                    ns, nt, npl)

    ts = []
    if ns:
        ts.append(sphere_t(origin, direction, geom.sph_center,
                           geom.sph_radius, t_min, t_max))
    if nt:
        if nt_t:
            edge1 = geom.tri_v1[:nt_t] - geom.tri_v0[:nt_t]
            edge2 = geom.tri_v2[:nt_t] - geom.tri_v0[:nt_t]
            tt = triangle_t(origin, direction, geom.tri_v0[:nt_t],
                            edge1, edge2, t_min, t_max)
        else:
            tt = jnp.zeros(B + (0,), origin.dtype)
        # pad the cube-face columns with BIG so plane/box ids line up
        ts.append(jnp.pad(tt, ((0, 0),) * len(B) + ((0, nt - nt_t),),
                          constant_values=BIG))
    if npl:
        ts.append(plane_t(origin, direction, geom.pl_point,
                          geom.pl_normal, t_min, t_max))
    if nb:
        ts.append(box_t(origin, direction, geom.box_min, geom.box_max,
                        t_min, t_max))
    if not ts:
        zeros3 = jnp.zeros(B + (3,), origin.dtype)
        return Hit(t=jnp.full(B, BIG, origin.dtype),
                   hit=jnp.zeros(B, bool), point=zeros3, normal=zeros3,
                   front_face=jnp.zeros(B, bool),
                   mat_id=jnp.zeros(B, jnp.int32))

    all_t = jnp.concatenate(ts, axis=-1)  # (B, Ns+Nt)
    idx = jnp.argmin(all_t, axis=-1)  # first minimum wins
    t = jnp.take_along_axis(all_t, idx[..., None], axis=-1)[..., 0]
    return _hit_from_tidx(geom, origin, direction, t, idx)


def _closest_hit_chunked(geom, origin, direction, t_min, t_max,
                         ns, nt, npl) -> Hit:
    """Memory-bounded brute force for large scenes: per-type first-min
    over PRIM_CHUNK slabs, merged with the same tie precedence as the
    concat+argmin small-scene path ([spheres, triangles, planes, boxes],
    strict < between types, earliest column within a type)."""
    B = origin.shape[:-1]
    occl = getattr(geom, "occl_tris", -1)
    nt_t = nt if occl < 0 else occl  # cube faces hit as boxes below
    t = jnp.full(B, BIG, origin.dtype)
    idx = jnp.zeros(B, jnp.int32)

    if ns:
        if ns > PRIM_CHUNK:
            c, r = _pad_prims(ns, geom.sph_center, geom.sph_radius)
            t_fn = lambda s: _mask_cols(
                sphere_t(origin, direction, _slab(c, s), _slab(r, s),
                         t_min, t_max), s, ns)
            t, idx = _chunked_min_t(t_fn, ns, origin)
        else:
            ts = sphere_t(origin, direction, geom.sph_center,
                          geom.sph_radius, t_min, t_max)
            idx = jnp.argmin(ts, axis=-1).astype(jnp.int32)
            t = jnp.take_along_axis(ts, idx[..., None], axis=-1)[..., 0]
    if nt_t:
        edge1 = geom.tri_v1[:nt_t] - geom.tri_v0[:nt_t]
        edge2 = geom.tri_v2[:nt_t] - geom.tri_v0[:nt_t]
        if nt_t > PRIM_CHUNK:
            v0, e1, e2 = _pad_prims(nt_t, geom.tri_v0[:nt_t], edge1, edge2)
            t_fn = lambda s: _mask_cols(
                triangle_t(origin, direction, _slab(v0, s), _slab(e1, s),
                           _slab(e2, s), t_min, t_max), s, nt_t)
            t_t, i_t = _chunked_min_t(t_fn, nt_t, origin)
        else:
            ts = triangle_t(origin, direction, geom.tri_v0[:nt_t],
                            edge1, edge2, t_min, t_max)
            i_t = jnp.argmin(ts, axis=-1).astype(jnp.int32)
            t_t = jnp.take_along_axis(ts, i_t[..., None], axis=-1)[..., 0]
        win = t_t < t
        t = jnp.where(win, t_t, t)
        idx = jnp.where(win, ns + i_t, idx)
    if npl:
        # Planes are unbounded in number only in theory; scenes carry a
        # handful - full eval.
        ts = plane_t(origin, direction, geom.pl_point, geom.pl_normal,
                     t_min, t_max)
        i_p = jnp.argmin(ts, axis=-1).astype(jnp.int32)
        t_p = jnp.take_along_axis(ts, i_p[..., None], axis=-1)[..., 0]
        win = t_p < t
        t = jnp.where(win, t_p, t)
        idx = jnp.where(win, ns + nt + i_p, idx)
    nb = getattr(geom, "box_min", jnp.zeros((0, 3))).shape[0]
    if nb:
        ts = box_t(origin, direction, geom.box_min, geom.box_max,
                   t_min, t_max)
        i_b = jnp.argmin(ts, axis=-1).astype(jnp.int32)
        t_b = jnp.take_along_axis(ts, i_b[..., None], axis=-1)[..., 0]
        win = t_b < t
        t = jnp.where(win, t_b, t)
        idx = jnp.where(win, ns + nt + npl + i_b, idx)
    return _hit_from_tidx(geom, origin, direction, t, idx)


def _interp_tri_normal(geom, tri_idx, origin, direction, n_face):
    """Barycentric vertex-normal interpolation for the winner triangle.

    Parity with triangle.go:84-88 (calculateInterpolatedNormal:
    w*n0 + u*n1 + v*n2, normalized, w = 1-u-v). u, v are re-derived for
    the winner by the SAME Moller-Trumbore expressions the hit test used
    (h = d x e2, f = 1/(e1.h), u = f*(s.h), v = f*(d.q)) so the
    interpolation weights match the accepted intersection - and so the
    Pallas megakernel (which reuses its in-loop u, v directly,
    megakernel._tri_closest_row) computes the identical arithmetic.
    Degenerate determinants fall back to the face normal (such
    triangles never win a hit anyway; this only keeps the math finite).
    """
    v0 = jnp.take(geom.tri_v0, tri_idx, axis=0)
    e1 = jnp.take(geom.tri_v1, tri_idx, axis=0) - v0
    e2 = jnp.take(geom.tri_v2, tri_idx, axis=0) - v0
    h = jnp.cross(direction, e2)
    det = _dot(e1, h)
    good = jnp.abs(det) >= 1e-6
    f = 1.0 / jnp.where(good, det, 1.0)
    s = origin - v0
    u = f * _dot(s, h)
    q = jnp.cross(s, e1)
    v = f * _dot(direction, q)
    vn = jnp.take(geom.tri_vn, tri_idx, axis=0)  # (B, 9)
    w = 1.0 - u - v
    n = (w[..., None] * vn[..., 0:3] + u[..., None] * vn[..., 3:6]
         + v[..., None] * vn[..., 6:9])
    ln = jnp.sqrt(_dot(n, n))
    # reciprocal-MULTIPLY, not divide: megakernel._tri_smooth_normal
    # computes inx * (1/ln), and x*(1/y) rounds differently from x/y -
    # both engines must use the identical expression.
    inv = 1.0 / jnp.where(ln > 0.0, ln, 1.0)
    n = n * inv[..., None]
    return jnp.where(good[..., None], n, n_face)


def _hit_from_tidx(geom, origin, direction, t, idx) -> Hit:
    """Assemble the full Hit record from (t, winner index).

    idx uses the concatenated [spheres, triangles, planes] ordering;
    t == BIG means miss (idx is then ignored).
    """
    B = origin.shape[:-1]
    ns = geom.sph_center.shape[0]
    nt = geom.tri_v0.shape[0]
    npl = getattr(geom, "pl_point", jnp.zeros((0, 3))).shape[0]
    nbx = getattr(geom, "box_min", jnp.zeros((0, 3))).shape[0]
    hit = t < BIG

    # Geometric attributes evaluate at a CLAMPED t on miss lanes: with
    # t = BIG the point overflows f32 to inf, and although every miss
    # lane's shading is masked downstream, reverse-mode AD multiplies
    # the zero cotangent into the inf chain and poisons parameter
    # gradients with NaN (observed: sphere 0's radius, the winner-index
    # placeholder for every miss lane). Hit.t keeps the BIG sentinel.
    t_geo = jnp.where(hit, t, jnp.ones_like(t))
    point = origin + direction * t_geo[..., None]

    is_sphere = idx < ns if ns else jnp.zeros(B, bool)
    is_box = idx >= (ns + nt + npl) if nbx else jnp.zeros(B, bool)
    is_plane = ((idx >= (ns + nt)) & ~is_box if npl
                else jnp.zeros(B, bool))
    sph_idx = jnp.minimum(idx, max(ns - 1, 0))
    tri_idx = jnp.clip(idx - ns, 0, max(nt - 1, 0))
    pl_idx = jnp.clip(idx - ns - nt, 0, max(npl - 1, 0))
    box_idx = jnp.clip(idx - ns - nt - npl, 0, max(nbx - 1, 0))

    if ns:
        c = jnp.take(geom.sph_center, sph_idx, axis=0)
        r = jnp.take(geom.sph_radius, sph_idx, axis=0)
        # outwardNormal = (point - center) / radius (sphere.go:44)
        n_sph = (point - c) / r[..., None]
        m_sph = jnp.take(geom.sph_mat, sph_idx, axis=0)
    else:
        n_sph = jnp.zeros(B + (3,), origin.dtype)
        m_sph = jnp.zeros(B, jnp.int32)
    if nt:
        n_tri = jnp.take(geom.tri_normal, tri_idx, axis=0)
        m_tri = jnp.take(geom.tri_mat, tri_idx, axis=0)
        if getattr(geom, "tri_vn", None) is not None:
            n_tri = _interp_tri_normal(geom, tri_idx, origin, direction,
                                       n_tri)
    else:
        n_tri = jnp.zeros(B + (3,), origin.dtype)
        m_tri = jnp.zeros(B, jnp.int32)
    if npl:
        n_pl = jnp.take(geom.pl_normal, pl_idx, axis=0)
        m_pl = jnp.take(geom.pl_mat, pl_idx, axis=0)
    else:
        n_pl = jnp.zeros(B + (3,), origin.dtype)
        m_pl = jnp.zeros(B, jnp.int32)
    if nbx:
        # Box "winding" normal, point-based: the dominant axis of the
        # normalized center offset (p - c)/h, signed - then NEGATED.
        # The reference's cube expansion winds ALL six faces INWARD
        # (scene.go:150-185: e.g. face [0,1,2,3] on the z- side crosses
        # to +z), so the pre-flip triangle normal points into the cube
        # and exterior hits carry front_face=False. That flag steers
        # the dielectric eta (material.go), so the box form must
        # reproduce it exactly; the front-face flip restores the
        # outward SHADING normal either way. argmax ties
        # (edges/corners) resolve x<y<z.
        lo = jnp.take(geom.box_min, box_idx, axis=0)
        hi = jnp.take(geom.box_max, box_idx, axis=0)
        ctr = (lo + hi) * 0.5
        half = jnp.maximum((hi - lo) * 0.5, 1e-30)
        q = (point - ctr) / half
        ax = jnp.argmax(jnp.abs(q), axis=-1)
        n_box = -(jax.nn.one_hot(ax, 3, dtype=origin.dtype)
                  * jnp.sign(jnp.take_along_axis(q, ax[..., None],
                                                 axis=-1)))
        m_box = jnp.take(geom.box_mat, box_idx, axis=0)
    else:
        n_box = jnp.zeros(B + (3,), origin.dtype)
        m_box = jnp.zeros(B, jnp.int32)

    outward = jnp.where(
        is_sphere[..., None], n_sph,
        jnp.where(is_box[..., None], n_box,
                  jnp.where(is_plane[..., None], n_pl, n_tri)))
    mat_id = jnp.where(is_sphere, m_sph,
                       jnp.where(is_box, m_box,
                                 jnp.where(is_plane, m_pl, m_tri)))
    front_face = _dot(direction, outward) < 0.0
    normal = jnp.where(front_face[..., None], outward, -outward)

    return Hit(t=t, hit=hit, point=point, normal=normal,
               front_face=front_face, mat_id=mat_id.astype(jnp.int32))


def _winner_t_diff(geom, origin, direction, t_walk, pid):
    """Straight-through differentiable hit distance for the walk winner.

    The BVH walk (lax.while_loop) cannot be reverse-differentiated, so
    _closest_hit_accel runs it under stop_gradient and re-derives the
    winner's t from its GATHERED parameters with the smooth closed-form
    expressions; the straight-through combination
        t = t_walk + (t_diff - stop_gradient(t_diff))
    keeps the forward value bit-identical to the walk (the correction
    term is exactly 0.0 at runtime) while t carries the winner's
    pathwise gradient w.r.t. origin/direction/geometry - the same
    gradient the brute-force where-select path yields almost everywhere
    (which primitive wins is piecewise constant in the parameters).
    Sphere lanes pick whichever closed-form root reproduces the walk's t
    (near-else-far, resolved under stop_gradient)."""
    sg = jax.lax.stop_gradient
    pid = sg(pid)
    tw = sg(t_walk)
    ns = geom.sph_center.shape[0]
    nt = geom.tri_v0.shape[0]
    t_s = t_t = None
    if ns:
        sp = jnp.clip(pid, 0, ns - 1)
        c = jnp.take(geom.sph_center, sp, axis=0)
        r = jnp.take(geom.sph_radius, sp, axis=0)
        oc = origin - c
        a = _dot(direction, direction)
        half_b = jnp.sum(oc * direction, axis=-1)
        cc = _dot(oc, oc) - r * r
        disc = half_b * half_b - a * cc
        # winner lanes have disc >= 0; the where guard keeps sqrt's
        # gradient finite on the clamped (non-winner) lanes
        sqrtd = jnp.sqrt(jnp.where(sg(disc) > 0.0, disc, 1.0))
        r0 = (-half_b - sqrtd) / a
        r1 = (-half_b + sqrtd) / a
        t_s = jnp.where(sg(jnp.abs(r0 - tw) <= jnp.abs(r1 - tw)), r0, r1)
    if nt:
        ti = jnp.clip(pid - ns, 0, nt - 1)
        v0 = jnp.take(geom.tri_v0, ti, axis=0)
        e1 = jnp.take(geom.tri_v1, ti, axis=0) - v0
        e2 = jnp.take(geom.tri_v2, ti, axis=0) - v0
        h = jnp.cross(direction, e2)
        det = jnp.sum(e1 * h, axis=-1)
        f = 1.0 / jnp.where(sg(jnp.abs(det)) >= 1e-6, det, 1.0)
        q = jnp.cross(origin - v0, e1)
        t_t = jnp.sum(e2 * q, axis=-1) * f
    if ns and nt:
        t_d = jnp.where(pid < ns, t_s, t_t)
    else:
        t_d = t_s if ns else t_t
    in_tree = (pid >= 0) & (pid < ns + nt)
    t_d = jnp.where(in_tree, t_d, 0.0)
    return t_walk + (t_d - sg(t_d))


def _closest_hit_accel(geom, accel, origin, direction, t_min, t_max) -> Hit:
    """BVH-accelerated closest hit: tree walk over spheres+triangles,
    brute force over the (unbounded) planes and the box occluders,
    merged by nearest t. Boxes are tested FIRST and their winning t is
    the walk's initial clamp, so subtrees behind a cube face are culled
    (the cube's own face triangles are masked inside the walk - the box
    is their closest-hit form, see box_t).

    Differentiable (round 5): the walk itself runs under stop_gradient
    (lax.while_loop has no reverse rule) and the winner's t is re-derived
    straight-through (_winner_t_diff), so reverse-mode AD works through
    this path with the accel's forward cost. Callers optimizing GEOMETRY
    must still drop the accel (diff.split_params does by default): a
    stale tree can cull moved primitives."""
    from .. import bvh as bvh_mod
    sg = jax.lax.stop_gradient
    ns = geom.sph_center.shape[0]
    nt = geom.tri_v0.shape[0]
    npl = getattr(geom, "pl_point", jnp.zeros((0, 3))).shape[0]
    nb = getattr(geom, "box_min", jnp.zeros((0, 3))).shape[0]
    t_box = None
    tm_walk = t_max
    if nb:
        t_b = box_t(origin, direction, geom.box_min, geom.box_max,
                    t_min, t_max)  # (B, Nb)
        b_idx = jnp.argmin(t_b, axis=-1)
        t_box = jnp.take_along_axis(t_b, b_idx[..., None], axis=-1)[..., 0]
        tm_walk = jnp.minimum(jnp.asarray(t_max, origin.dtype),
                              t_box)
    geom_sg = jax.tree.map(sg, geom)
    t, pid = bvh_mod.traverse_closest(accel, geom_sg, sg(origin),
                                      sg(direction), t_min,
                                      sg(jnp.asarray(tm_walk)))
    t = _winner_t_diff(geom, origin, direction, t, pid)
    if nb:
        # The walk reports BIG where nothing beat tm_walk, and its
        # accept test is strict (t < t_best seeded with t_box) - so a
        # tree primitive whose t EXACTLY equals the box hit is rejected
        # in the walk and the box takes the lane. That is the opposite
        # tie order from the brute-force path ([sph, tri, pln, box]
        # argmin order), observable only for exactly-coincident
        # surfaces - degenerate input, same class as the documented
        # engine-divergence gates.
        box_wins = t_box < t
        t = jnp.where(box_wins, t_box, t)
        pid = jnp.where(box_wins, ns + nt + npl + b_idx, pid)
    if npl:
        t_pl = plane_t(origin, direction, geom.pl_point, geom.pl_normal,
                       t_min, t_max)  # (B, Npl)
        pl_idx = jnp.argmin(t_pl, axis=-1)
        t_pl_min = jnp.take_along_axis(t_pl, pl_idx[..., None],
                                       axis=-1)[..., 0]
        pl_wins = t_pl_min < t
        t = jnp.where(pl_wins, t_pl_min, t)
        pid = jnp.where(pl_wins, ns + nt + pl_idx, pid)
    return _hit_from_tidx(geom, origin, direction, t, pid)


def any_hit(geom, origin, direction, t_min, t_max, accel=None,
            exact=False):
    """Occlusion test: does any primitive intersect in (t_min, t_max)?

    Shadow rays only need existence (renderer.go:303-309), not the closest
    record - an any-hit reduce is cheaper than argmin+gathers.
    t_max may be per-lane: shape (B,) or scalar. With ``accel`` the
    sphere/triangle scan becomes an early-exit BVH walk (planes are still
    tested brute-force - they cannot be bounded). CPU-only, see use_accel.

    ``exact=True`` evaluates triangles with the SAME expressions the
    closest-hit uses (triangle_t) instead of the faster division-free
    form: the two acceptance sets agree except within 1-2 ulp of an
    edge or t-limit, where the division-free form can flip in EITHER
    direction. Shadow verdicts tolerate that (measure-zero geometry),
    but the primary-hit MASK must never exclude a lane the trace's
    closest-hit would accept - renderer._pixel_mask's CPU branch passes
    exact=True for that reason (the TPU mask kernels carry their own
    epsilon slack). Sphere/plane/box tests are shared bit-for-bit by
    both forms already.
    """
    nb = getattr(geom, "box_min", jnp.zeros((0, 3))).shape[0]
    if use_accel(accel):
        from .. import bvh as bvh_mod
        # Occlusion verdicts are piecewise constant in every parameter
        # (booleans), so the walk runs under stop_gradient - lax.while_loop
        # has no reverse rule, and no gradient is lost (the brute-force
        # path's verdicts carry zero gradient too).
        sg = jax.lax.stop_gradient
        blocked = bvh_mod.traverse_any(accel, origin=sg(origin),
                                       direction=sg(direction),
                                       geom=jax.tree.map(sg, geom),
                                       t_min=t_min,
                                       t_max=sg(jnp.asarray(t_max)),
                                       exact=exact)
        npl = getattr(geom, "pl_point", jnp.zeros((0, 3))).shape[0]
        t_max = jnp.asarray(t_max)
        tm = t_max[..., None] if t_max.ndim else t_max
        if npl:
            t = plane_t(origin, direction, geom.pl_point, geom.pl_normal,
                        t_min, tm)
            blocked |= jnp.any(t < BIG, axis=-1)
        if nb:
            blocked |= jnp.any(box_blocked(origin, direction,
                                           geom.box_min, geom.box_max,
                                           t_min, t_max), axis=-1)
        return blocked
    t_max = jnp.asarray(t_max)
    tm = t_max[..., None] if t_max.ndim else t_max
    blocked = jnp.zeros(origin.shape[:-1], bool)
    ns = geom.sph_center.shape[0]
    # Cube faces [occl_tris, Nt) are covered by the box tests below.
    nt_all = geom.tri_v0.shape[0]
    occl = getattr(geom, "occl_tris", -1)
    nt = nt_all if occl < 0 else occl
    npl = getattr(geom, "pl_point", jnp.zeros((0, 3))).shape[0]
    chunked = ns + nt + npl > PRIM_CHUNK

    def _scan_any(t_fn, n, blocked):
        def body(b, k):
            t = t_fn(k * PRIM_CHUNK)
            return b | jnp.any(t < BIG, axis=-1), None
        b, _ = jax.lax.scan(body, blocked,
                            jnp.arange(-(-n // PRIM_CHUNK)))
        return b

    if ns:
        if chunked and ns > PRIM_CHUNK:
            c, r = _pad_prims(ns, geom.sph_center, geom.sph_radius)
            blocked = _scan_any(
                lambda s: _mask_cols(
                    sphere_t(origin, direction, _slab(c, s), _slab(r, s),
                             t_min, tm), s, ns), ns, blocked)
        else:
            t = sphere_t(origin, direction, geom.sph_center,
                         geom.sph_radius, t_min, tm)
            blocked |= jnp.any(t < BIG, axis=-1)
    if nt:
        edge1 = geom.tri_v1[:nt] - geom.tri_v0[:nt]
        edge2 = geom.tri_v2[:nt] - geom.tri_v0[:nt]
        if exact:
            tri_hit = lambda v0, e1, e2: triangle_t(
                origin, direction, v0, e1, e2, t_min, tm) < BIG
        else:
            tri_hit = lambda v0, e1, e2: triangle_blocked(
                origin, direction, v0, e1, e2, t_min, t_max)
        if chunked and nt > PRIM_CHUNK:
            v0, e1, e2 = _pad_prims(nt, geom.tri_v0[:nt], edge1, edge2)

            def _scan_tri_blocked(blocked):
                def body(b, k):
                    st = k * PRIM_CHUNK
                    hit = tri_hit(_slab(v0, st), _slab(e1, st),
                                  _slab(e2, st))
                    col = st + jnp.arange(PRIM_CHUNK)
                    return b | jnp.any(hit & (col < nt), axis=-1), None
                b, _ = jax.lax.scan(body, blocked,
                                    jnp.arange(-(-nt // PRIM_CHUNK)))
                return b

            blocked = _scan_tri_blocked(blocked)
        else:
            blocked |= jnp.any(tri_hit(geom.tri_v0[:nt], edge1, edge2),
                               axis=-1)
    if nb:
        blocked |= jnp.any(box_blocked(origin, direction, geom.box_min,
                                       geom.box_max, t_min, t_max),
                           axis=-1)
    if npl:
        t = plane_t(origin, direction, geom.pl_point, geom.pl_normal,
                    t_min, tm)
        blocked |= jnp.any(t < BIG, axis=-1)
    return blocked

"""Intersection kernels vs analytic values and the scalar Go oracle."""

import numpy as np
import jax.numpy as jnp

import raytrace_tpu as rt
from raytrace_tpu.ops import intersect

import go_oracle


def _scene(objs):
    d = {"camera": {}, "lights": [], "objects": objs}
    scene, _ = rt.scene_from_dict(d)
    return scene


SPHERE = [{"type": "sphere", "position": [0, 0, 0], "radius": 1.0,
           "material": {"type": "lambertian", "color": [1, 1, 1]}}]
MIXED = SPHERE + [
    {"type": "sphere", "position": [2.5, 0.3, -1], "radius": 0.7,
     "material": {"type": "metal", "color": [1, 1, 1]}},
    {"type": "cube", "position": [-2, 0, 0], "size": [1.5, 1, 2],
     "material": {"type": "lambertian", "color": [1, 0, 0]}},
]


def test_sphere_analytic():
    g = _scene(SPHERE).geometry
    o = jnp.array([[0.0, 0.0, 3.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    h = intersect.closest_hit(g, o, d)
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]), 2.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 0, 1], atol=1e-6)
    assert bool(h.front_face[0])


def test_sphere_inside_far_root_and_flip():
    g = _scene(SPHERE).geometry
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    h = intersect.closest_hit(g, o, d)
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]), 1.0, rtol=1e-6)
    # outward normal (0,0,-1); ray.dot(outward) > 0 -> flipped to (0,0,1)
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 0, 1], atol=1e-6)
    assert not bool(h.front_face[0])


def test_unnormalized_direction_t_units():
    g = _scene(SPHERE).geometry
    o = jnp.array([[0.0, 0.0, 3.0]])
    d = jnp.array([[0.0, 0.0, -2.0]])  # |d| = 2 -> t halves
    h = intersect.closest_hit(g, o, d)
    np.testing.assert_allclose(float(h.t[0]), 1.0, rtol=1e-6)


def test_tmin_excludes_origin_surface():
    g = _scene(SPHERE).geometry
    # origin exactly on the surface, pointing away: no self-hit
    o = jnp.array([[0.0, 0.0, 1.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    h = intersect.closest_hit(g, o, d)
    assert not bool(h.hit[0])


def test_miss():
    g = _scene(SPHERE).geometry
    h = intersect.closest_hit(g, jnp.array([[0.0, 5.0, 3.0]]),
                              jnp.array([[0.0, 0.0, -1.0]]))
    assert not bool(h.hit[0])
    assert float(h.t[0]) >= float(intersect.BIG)


def test_closest_hit_vs_oracle_random_rays():
    scene = _scene(MIXED)
    oracle = go_oracle.Oracle(
        {"camera": {}, "lights": [], "objects": MIXED})
    rs = np.random.default_rng(42)
    n = 200
    o_np = rs.normal(size=(n, 3)) * 4.0
    # aim at random points inside the scene so most rays hit something
    targets = rs.normal(size=(n, 3)) * np.array([2.0, 0.5, 1.0])
    d_np = targets - o_np
    h = intersect.closest_hit(scene.geometry, jnp.asarray(o_np, jnp.float32),
                              jnp.asarray(d_np, jnp.float32))
    hits = mism = 0
    for i in range(n):
        res, m = oracle.hit_world(o_np[i], d_np[i], 1e-3, np.inf)
        if res is None:
            assert not bool(h.hit[i]), f"ray {i}: false positive"
            continue
        t, p, nrm, ff = res
        if not bool(h.hit[i]):
            mism += 1  # f32 vs f64 boundary-grazing allowance
            continue
        hits += 1
        np.testing.assert_allclose(float(h.t[i]), t, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(h.normal[i]), nrm,
                                   rtol=1e-3, atol=2e-3)
        assert bool(h.front_face[i]) == ff
    assert hits >= 20, "test scene produced too few hits to be meaningful"
    assert mism <= 2


def test_any_hit_consistent_with_closest():
    scene = _scene(MIXED)
    rs = np.random.default_rng(3)
    n = 200
    o = jnp.asarray(rs.normal(size=(n, 3)) * 3.0, jnp.float32)
    d = jnp.asarray(rs.normal(size=(n, 3)), jnp.float32)
    h = intersect.closest_hit(scene.geometry, o, d)
    blocked = intersect.any_hit(scene.geometry, o, d, 1e-3, intersect.BIG)
    np.testing.assert_array_equal(np.asarray(blocked), np.asarray(h.hit))
    # bounded any_hit: a hit beyond t_max doesn't count
    tmax = jnp.maximum(h.t - 0.5, 1e-2)
    blocked2 = intersect.any_hit(scene.geometry, o, d, 1e-3, tmax)
    assert not np.any(np.asarray(blocked2) & ~np.asarray(h.hit))


def test_triangle_analytic():
    g = _scene([{"type": "cube", "position": [0, 0, 0], "size": [2, 2, 2],
                 "material": {"type": "lambertian", "color": [1, 1, 1]}}]
               ).geometry
    o = jnp.array([[0.0, 0.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    h = intersect.closest_hit(g, o, d)
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]), 4.0, rtol=1e-6)  # front face z=1
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 0, 1], atol=1e-6)


def test_exact_any_hit_matches_closest_accept_set_on_boundaries():
    """The primary-hit mask's CPU branch uses any_hit(exact=True), which
    must reproduce the closest-hit acceptance set BIT-FOR-BIT even on
    rays constructed at triangle-edge/t-limit boundaries - the
    division-free shadow form (exact=False) may flip such rays in the
    EXCLUDE direction, which would permanently black out a pixel
    (mask invariant: over-include freely, never exclude)."""
    import raytrace_tpu as rt
    r = np.random.default_rng(3)
    objs = []
    for k in range(6):
        v = r.uniform(-2, 2, (3, 3))
        objs.append({"type": "triangularPrism",
                     "vertices": [v[0].tolist(), v[1].tolist(),
                                  v[2].tolist(),
                                  (v[0] + [0, 0, -0.5]).tolist(),
                                  (v[1] + [0, 0, -0.5]).tolist(),
                                  (v[2] + [0, 0, -0.5]).tolist()],
                     "material": {"type": "lambertian",
                                  "color": [0.5, 0.5, 0.5]}})
    scene, _ = rt.scene_from_dict({
        "camera": {"position": [0, 0, 8]}, "objects": objs,
        "lights": []})
    g = scene.geometry
    v0 = np.asarray(g.tri_v0, np.float64)
    v1 = np.asarray(g.tri_v1, np.float64)
    v2 = np.asarray(g.tri_v2, np.float64)
    # aim EXACTLY at edge points (u or v boundary) and vertices
    pts = []
    for t in (0.0, 0.25, 0.5, 1.0):
        pts += [v0 + t * (v1 - v0), v0 + t * (v2 - v0),
                v1 + t * (v2 - v1)]
    tgt = np.concatenate(pts, axis=0)
    o = np.tile(np.array([[0.3, -0.2, 6.0]]), (tgt.shape[0], 1))
    d = (tgt - o).astype(np.float32)
    o = o.astype(np.float32)
    got = np.asarray(intersect.any_hit(g, jnp.asarray(o), jnp.asarray(d),
                                       1e-3, intersect.BIG, exact=True))
    ref = np.asarray(intersect.closest_hit(g, jnp.asarray(o),
                                           jnp.asarray(d)).hit)
    np.testing.assert_array_equal(got, ref)

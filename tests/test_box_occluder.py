"""Box primitives for cubes: ONE slab test replaces the 12 face
triangles in BOTH the any-hit (intersect.box_blocked) and the closest
hit (intersect.box_t; normal reconstructed point-based and negated to
match the reference's inward face winding - it drives front_face and
the dielectric eta). The 12 triangles stay in the tables and the BVH
only for the conservative masks. All results must equal the triangle
form everywhere but exact float boundaries (scene.Geometry.box_min
doc).
"""
import dataclasses

import numpy as np
import jax.numpy as jnp

import raytrace_tpu as rt
from raytrace_tpu import trace as trace_mod
from raytrace_tpu import renderer as renderer_mod
from raytrace_tpu.ops import intersect


def _cube_scene():
    return rt.scene_from_dict({
        "camera": {"position": [0, 1, 6], "aspectRatio": 1.0},
        "objects": [
            {"type": "cube", "position": [-1.2, 0, 0], "size": [1, 1, 1],
             "material": {"type": "lambertian", "color": [0.8, 0.2, 0.2]}},
            {"type": "cube", "position": [1.2, 0.2, -1],
             "size": [0.8, 1.4, 0.6],
             "material": {"type": "metal", "color": [0.7, 0.7, 0.8],
                          "roughness": 0.1}},
            {"type": "sphere", "position": [0, -1000.5, 0],
             "radius": 1000,
             "material": {"type": "lambertian", "color": [0.5, 0.5, 0.5]}},
        ],
        "lights": [{"type": "point", "position": [0, 8, 2],
                    "color": [1, 1, 1], "intensity": 3.0}]})[0]


def _tri_only(geom):
    """The same geometry with the box fast path disabled."""
    return dataclasses.replace(
        geom, box_min=jnp.zeros((0, 3), jnp.float32),
        box_max=jnp.zeros((0, 3), jnp.float32), occl_tris=-1)


def test_loader_emits_boxes_and_reorders():
    g = _cube_scene().geometry
    assert g.occl_tris == 0           # cubes are the only triangles
    assert g.box_min.shape == (2, 3) and g.tri_v0.shape == (24, 3)
    np.testing.assert_allclose(np.asarray(g.box_min[0]),
                               [-1.7, -0.5, -0.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(g.box_max[1]),
                               [1.6, 0.9, -0.7], atol=1e-6)


def test_mesh_triangles_stay_in_the_occlusion_set(tmp_path):
    p = tmp_path / "t.obj"
    p.write_text("v 0 2 0\nv 1 2 0\nv 0 2 1\nf 1 2 3\n")
    s, _ = rt.scene_from_dict({
        "camera": {"position": [0, 1, 6], "aspectRatio": 1.0},
        "objects": [
            {"type": "mesh", "path": str(p),
             "material": {"type": "lambertian", "color": [0.5, 0.5, 0.5]}},
            {"type": "cube", "position": [0, 0, 0], "size": [1, 1, 1],
             "material": {"type": "lambertian", "color": [0.5, 0.5, 0.5]}},
        ],
        "lights": []})
    g = s.geometry
    # mesh triangle first, 12 cube faces after; 1 box
    assert g.occl_tris == 1 and g.tri_v0.shape == (13, 3)
    assert g.box_min.shape == (1, 3)
    # the mesh triangle still blocks (it is NOT covered by any box)
    o = jnp.array([[0.25, 0.0, 0.25]])
    d = jnp.array([[0.0, 1.0, 0.0]])
    assert bool(intersect.any_hit(g, o, d, 1e-3, 5.0)[0])


def test_box_verdicts_match_triangle_verdicts():
    """Random rays x per-lane t_max: the box fast path and the full
    triangle set agree everywhere except exact rounding boundaries
    (none expected among 4096 random rays)."""
    g = _cube_scene().geometry
    r = np.random.default_rng(7)
    n = 4096
    o = jnp.asarray(r.uniform(-3, 3, (n, 3)), jnp.float32)
    d = jnp.asarray(r.normal(size=(n, 3)), jnp.float32)
    tm = jnp.asarray(r.uniform(0.1, 20.0, (n,)), jnp.float32)
    with_box = np.asarray(intersect.any_hit(g, o, d, 1e-3, tm))
    tri_ref = np.asarray(intersect.any_hit(_tri_only(g), o, d, 1e-3, tm))
    mismatch = float(np.mean(with_box != tri_ref))
    assert mismatch <= 1e-3, mismatch


def test_segment_inside_box_is_not_blocked():
    """A shadow segment strictly inside the cube crosses no face: the
    naive slab-overlap test would return blocked; the two-crossing rule
    must not (matches the triangle form)."""
    g = _cube_scene().geometry
    o = jnp.array([[-1.2, 0.0, 0.0]])      # cube 1 center
    d = jnp.array([[1.0, 0.0, 0.0]])
    # segment [1e-3, 0.3] stays inside the half-size-0.5 cube
    assert not bool(intersect.any_hit(g, o, d, 1e-3, 0.3)[0])
    # extending past the wall crosses the exit face -> blocked
    assert bool(intersect.any_hit(g, o, d, 1e-3, 0.9)[0])


def test_box_closest_hit_matches_triangles_and_winding():
    """Closest-hit also goes through the box (intersect.box_t): t,
    normal, mat AND front_face must match the 12-triangle form. The
    reference winds all cube faces INWARD (scene.go:150-185), so an
    exterior cube hit carries front_face=False and the pre-flip normal
    points into the cube - the box branch must reproduce that quirk
    (it steers the dielectric eta)."""
    g = _cube_scene().geometry
    r = np.random.default_rng(11)
    n = 2048
    o = jnp.asarray(r.uniform(-4, 4, (n, 3)), jnp.float32)
    d = jnp.asarray(r.normal(size=(n, 3)), jnp.float32)
    hb = intersect.closest_hit(g, o, d)
    ht = intersect.closest_hit(_tri_only(g), o, d)
    np.testing.assert_array_equal(np.asarray(hb.hit), np.asarray(ht.hit))
    hit = np.asarray(hb.hit)
    np.testing.assert_allclose(np.asarray(hb.t)[hit],
                               np.asarray(ht.t)[hit], rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(hb.normal)[hit],
                               np.asarray(ht.normal)[hit], atol=1e-3)
    np.testing.assert_array_equal(np.asarray(hb.front_face)[hit],
                                  np.asarray(ht.front_face)[hit])
    np.testing.assert_array_equal(np.asarray(hb.mat_id)[hit],
                                  np.asarray(ht.mat_id)[hit])
    # direct check of the winding quirk: exterior hit -> front_face=False
    o1 = jnp.array([[-1.2, 0.0, 5.0]])
    d1 = jnp.array([[0.0, 0.0, -1.0]])
    h1 = intersect.closest_hit(g, o1, d1)
    assert bool(h1.hit[0]) and not bool(h1.front_face[0])
    # flipped SHADING normal is outward (+z toward the ray)
    np.testing.assert_allclose(np.asarray(h1.normal[0]), [0, 0, 1],
                               atol=1e-6)


def test_sharded_wavefront_matches_on_cube_scene():
    """The mesh-sharded wavefront must carry the box tables through
    shard_map unchanged (same image as the jnp engine)."""
    from raytrace_tpu import parallel
    s = _cube_scene()
    cfg = trace_mod.TraceConfig(max_depth=3, shadow_samples=2)
    img, ov = parallel.render_wavefront_sharded(
        s, width=8, height=8, samples=1, cfg=cfg,
        mesh=parallel.make_mesh(px=8, sp=1), px_capacity=8)
    assert int(ov) == 0
    pix = jnp.arange(64, dtype=jnp.uint32)
    samp = jnp.zeros(64, dtype=jnp.uint32)
    o, d = renderer_mod._lane_rays(s, pix, samp, width=8, height=8,
                                   cfg=cfg, go_camera=True)
    ref = np.asarray(trace_mod.trace(s, o, d, pix, samp, cfg)
                     ).reshape(8, 8, 3)
    np.testing.assert_allclose(np.asarray(img), ref, atol=1e-4)


def test_cube_shadows_render_identically():
    """Full render: box-occluded frame equals the triangle-occluded
    frame (fp-boundary pixels aside) and actually contains shadow."""
    s = _cube_scene()
    cfg = trace_mod.TraceConfig(max_depth=3, shadow_samples=4)
    img_box = np.asarray(renderer_mod.render_wavefront(
        s, width=24, height=18, samples=2, cfg=cfg))
    s_tri = dataclasses.replace(s, geometry=_tri_only(s.geometry))
    img_tri = np.asarray(renderer_mod.render_wavefront(
        s_tri, width=24, height=18, samples=2, cfg=cfg))
    assert img_box.max() > 0
    np.testing.assert_allclose(img_box, img_tri, atol=1e-5)

"""Barycentric vertex-normal smooth shading (triangle.go:22-34
NewTriangleWithNormals + :84-88 calculateInterpolatedNormal).

The Go JSON loader can never construct a normals-bearing triangle
(scene.go:69-83 only emits cubes/spheres), so this is advertised-API
parity anchored to the Go formula, not to a reachable Go render: the
interpolated outward normal is w*n0 + u*n1 + v*n2 (w = 1-u-v from the
Moller-Trumbore barycentrics), normalized, then front-face flipped like
any other normal. Flat scenes (tri_vn=None) must stay bit-identical to
before - the vn table rows exist only for scenes that carry them.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

import raytrace_tpu as rt
from raytrace_tpu import renderer as renderer_mod
from raytrace_tpu import scene as scene_mod
from raytrace_tpu import trace as trace_mod
from raytrace_tpu.models import mesh as mesh_mod
from raytrace_tpu.ops import intersect
from raytrace_tpu.ops import megakernel as mk

OBJ_QUAD = """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vn 0 0 1
vn 0.7071 0 0.7071
vn 0 0.7071 0.7071
f 1//1 2//2 3//3
f 1//1 3//3 4//2
"""


@pytest.fixture()
def quad_obj(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text(OBJ_QUAD)
    return str(p)


def _scene(quad_obj, smooth=True, extra=()):
    objs = [{"type": "mesh", "path": quad_obj, "smooth": smooth,
             "material": {"type": "lambertian", "color": [0.8, 0.3, 0.3]}}]
    objs += list(extra)
    return rt.scene_from_dict({
        "camera": {"position": [0.5, 0.5, 3], "aspectRatio": 1.0},
        "objects": objs,
        "lights": [{"type": "point", "position": [0, 3, 3],
                    "color": [1, 1, 1], "intensity": 1.5}]})[0]


def test_parse_obj_normals():
    v, f, n, fn = mesh_mod.parse_obj(OBJ_QUAD, return_normals=True)
    assert v.shape == (4, 3) and f.shape == (2, 3)
    assert n.shape == (3, 3) and fn.shape == (2, 3)
    np.testing.assert_array_equal(fn, [[0, 1, 2], [0, 2, 1]])
    # historical 2-tuple contract unchanged
    v2, f2 = mesh_mod.parse_obj(OBJ_QUAD)
    np.testing.assert_array_equal(v2, v)
    np.testing.assert_array_equal(f2, f)


def test_parse_obj_partial_normals_fall_back_flat():
    # one corner without //n -> all-or-nothing flat, like the reference's
    # two-constructor split (NewTriangle vs NewTriangleWithNormals)
    txt = "v 0 0 0\nv 1 0 0\nv 0 1 0\nvn 0 0 1\nf 1//1 2 3//1\n"
    v, f, n, fn = mesh_mod.parse_obj(txt, return_normals=True)
    tris = mesh_mod.mesh_triangles(v, f, n, fn)
    assert len(tris) == 1 and len(tris[0]) == 3


def test_loader_builds_tri_vn(quad_obj):
    s = _scene(quad_obj)
    assert s.geometry.tri_vn is not None
    assert s.geometry.tri_vn.shape == (2, 9)
    # corner normals land in the right slots (tri 0 = f 1//1 2//2 3//3)
    row = np.asarray(s.geometry.tri_vn[0])
    np.testing.assert_allclose(row[0:3], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(row[3:6], [0.7071, 0, 0.7071], atol=1e-4)
    assert _scene(quad_obj, smooth=False).geometry.tri_vn is None


def test_interpolated_normal_matches_closed_form(quad_obj):
    s = _scene(quad_obj)
    o = jnp.array([[0.25, 0.25, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    h = intersect.closest_hit(s.geometry, o, d)
    assert bool(h.hit[0])
    # P=(0.25,0.25,0) on tri 0: v0=(0,0,0), e1=(1,0,0), e2=(1,1,0)
    # -> u=0, v=0.25, w=0.75 (MT barycentrics)
    n0 = np.array([0, 0, 1.0])
    n1 = np.array([0.7071, 0, 0.7071])
    n2 = np.array([0, 0.7071, 0.7071])
    nref = 0.75 * n0 + 0.0 * n1 + 0.25 * n2
    nref /= np.linalg.norm(nref)
    np.testing.assert_allclose(np.asarray(h.normal[0]), nref, atol=1e-5)


def test_flat_mesh_unchanged(quad_obj):
    s = _scene(quad_obj, smooth=False)
    o = jnp.array([[0.25, 0.25, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    h = intersect.closest_hit(s.geometry, o, d)
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 0, 1],
                               atol=1e-6)


def test_identity_normals_reproduce_flat_shading(tmp_path):
    """All three vertex normals == face normal -> smooth render equals
    the flat render (up to one normalize rounding)."""
    p = tmp_path / "flatvn.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nvn 0 0 1\nf 1//1 2//1 3//1\n")
    cfg = trace_mod.TraceConfig(max_depth=3, shadow_samples=2)
    imgs = []
    for smooth in (True, False):
        s = _scene(str(p), smooth=smooth)
        assert (s.geometry.tri_vn is not None) == smooth
        imgs.append(renderer_mod.render_wavefront(
            s, width=8, height=6, samples=2, cfg=cfg))
    assert np.asarray(imgs[0]).max() > 0
    np.testing.assert_allclose(imgs[0], imgs[1], atol=1e-5)


def test_place_normals_scale_and_yaw():
    n = np.array([[0, 0, 1.0], [1.0, 0, 0]])
    # uniform scale: unchanged
    np.testing.assert_allclose(mesh_mod.place_normals(n, scale=3.0), n)
    # 90-degree yaw: +Z -> +X, +X -> -Z (matches place_mesh on positions)
    r = mesh_mod.place_normals(n, rotation_y=90.0)
    np.testing.assert_allclose(r, [[1, 0, 0], [0, 0, -1]], atol=1e-6)
    v = mesh_mod.place_mesh(n, rotation_y=90.0)
    np.testing.assert_allclose(r, v / np.linalg.norm(v, axis=1,
                                                     keepdims=True),
                               atol=1e-6)
    # per-axis scale: inverse-transpose, renormalized. A plane through
    # (1,0,0),(0,1,0) with normal (1,1,0)/sqrt2, scaled by (2,1,1),
    # passes through (2,0,0),(0,1,0): normal (1,2,0)/sqrt5.
    nn = mesh_mod.place_normals(np.array([[1, 1, 0.0]]) / np.sqrt(2),
                                scale=[2.0, 1.0, 1.0])
    np.testing.assert_allclose(nn, np.array([[1, 2, 0.0]]) / np.sqrt(5),
                               atol=1e-6)


@pytest.mark.parametrize("kmode", ["unroll", "loop", "bvh"])
def test_engines_agree_on_smooth_mesh(quad_obj, monkeypatch, kmode):
    """jnp oracle == Pallas megakernel on a smooth mesh + sphere scene,
    in every kernel mode (the vn table rows and in-kernel interpolation
    must match intersect._interp_tri_normal exactly)."""
    s = _scene(quad_obj, extra=[
        {"type": "sphere", "position": [0.5, 0.5, -2], "radius": 0.8,
         "material": {"type": "metal", "color": [0.7, 0.7, 0.8],
                      "roughness": 0.05}}])
    cfg = trace_mod.TraceConfig(max_depth=3, shadow_samples=2)
    W, H = 12, 8
    pix = jnp.arange(W * H, dtype=jnp.uint32)
    samp = jnp.zeros(W * H, jnp.uint32)
    o, d = renderer_mod._lane_rays(s, pix, samp, width=W, height=H,
                                   cfg=cfg, go_camera=True)
    ref = np.asarray(trace_mod.trace(s, o, d, pix, samp, cfg))
    assert ref.max() > 0
    if kmode != "unroll":
        monkeypatch.setattr(mk, "UNROLL_PRIM_LIMIT", 1)
        if kmode == "bvh":
            s = scene_mod.with_accel(s)
    assert mk._kernel_mode(s) == kmode
    out = np.asarray(mk.trace_pallas(s, o, d, pix, samp, cfg,
                                     block_rows=8))
    np.testing.assert_allclose(out, ref, atol=1e-4)


@pytest.mark.parametrize("kmode", ["unroll", "loop", "bvh"])
def test_smooth_mesh_plus_glass_cube_engines_agree(tmp_path, monkeypatch,
                                                   kmode):
    """The round-3 features composed: smooth vn mesh + a glass cube
    (box closest-hit, winding-quirk front_face) + giant ground in one
    scene - the vn table spans the REORDERED triangle array (mesh rows
    first, cube faces last with tiled face normals) and every kernel
    mode must match the jnp engine."""
    p = tmp_path / "sm.obj"
    p.write_text("v 0 1.5 0\nv 1 1.5 0\nv 1 2.5 0\nv 0 2.5 0\n"
                 "vn 0 0 1\nvn 0.7071 0 0.7071\nvn 0 0.7071 0.7071\n"
                 "f 1//1 2//2 3//3\nf 1//1 3//3 4//2\n")
    s, _ = rt.scene_from_dict({
        "camera": {"position": [0.5, 1, 5], "aspectRatio": 1.0},
        "objects": [
            {"type": "mesh", "path": str(p),
             "material": {"type": "lambertian", "color": [0.8, 0.3, 0.3]}},
            {"type": "cube", "position": [0.5, 0, 0], "size": [1, 1, 1],
             "material": {"type": "glass", "refractionIndex": 1.5}},
            {"type": "sphere", "position": [0.5, -1000.8, 0],
             "radius": 1000,
             "material": {"type": "lambertian", "color": [0.5, 0.5, 0.5]}},
        ],
        "lights": [{"type": "point", "position": [3, 6, 4],
                    "color": [1, 1, 1], "intensity": 2.5}]})
    g = s.geometry
    assert g.occl_tris == 2 and g.tri_vn.shape == (14, 9)
    assert g.box_min.shape[0] == 1
    cfg = trace_mod.TraceConfig(max_depth=4, shadow_samples=4)
    W, H = 12, 8
    pix = jnp.arange(W * H, dtype=jnp.uint32)
    samp = jnp.zeros(W * H, jnp.uint32)
    o, d = renderer_mod._lane_rays(s, pix, samp, width=W, height=H,
                                   cfg=cfg, go_camera=True)
    ref = np.asarray(trace_mod.trace(s, o, d, pix, samp, cfg))
    assert ref.max() > 0
    if kmode != "unroll":
        monkeypatch.setattr(mk, "UNROLL_PRIM_LIMIT", 1)
        if kmode == "bvh":
            s = scene_mod.with_accel(s)
    assert mk._kernel_mode(s) == kmode
    out = np.asarray(mk.trace_pallas(s, o, d, pix, samp, cfg,
                                     block_rows=8))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_sharded_wavefront_matches_on_smooth_mesh(quad_obj):
    """The mesh-sharded wavefront must carry the vn table through
    shard_map unchanged (bit-equal image vs the jnp engine)."""
    from raytrace_tpu import parallel
    s = _scene(quad_obj)
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


def test_aov_normals_are_smooth(quad_obj):
    from raytrace_tpu import aov as aov_mod
    s = _scene(quad_obj)
    aovs = aov_mod.render_aovs(s, width=8, height=8)
    nrm = np.asarray(aovs["normal"])
    hit = np.asarray(aovs["depth"]) < 1e30
    # smooth quad: normals vary across the surface (flat would be
    # constant (0,0,1) everywhere it hits)
    vals = nrm[hit]
    assert len(vals) >= 4
    assert np.ptp(vals[:, 1]) > 0.05

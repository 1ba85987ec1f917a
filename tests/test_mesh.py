"""OBJ mesh import (models/mesh.py) and its scene-loader integration.

The reference's Mesh (scene.go:192-209) only ever wraps cube triangles;
the OBJ path extends the same triangle SoA with real model import, so
these tests pin the parser's index forms, the placement transform, the
scene JSON schema (incl. --go-parity skipping, scene.go:80-83), and an
end-to-end render through the jnp engine.
"""

import json

import numpy as np
import jax.numpy as jnp
import pytest

import raytrace_tpu as rt
from raytrace_tpu import renderer as renderer_mod
from raytrace_tpu import scene as scene_mod
from raytrace_tpu import trace as trace_mod
from raytrace_tpu.models import mesh as mesh_mod

TETRA = """
# a tetrahedron, mixed face forms
v 0 0 0
v 1 0 0
v 0 1 0
v 0 0 1
f 1 2 3
f 1/5 2/6 4/7
f 1//1 3//1 4//1
f -3 -2 -1
"""


def test_parse_obj_index_forms_and_fan():
    v, f = mesh_mod.parse_obj(TETRA)
    assert v.shape == (4, 3) and f.shape == (4, 3)
    np.testing.assert_array_equal(f[0], [0, 1, 2])   # plain 1-based
    np.testing.assert_array_equal(f[1], [0, 1, 3])   # i/t form
    np.testing.assert_array_equal(f[2], [0, 2, 3])   # i//n form
    np.testing.assert_array_equal(f[3], [1, 2, 3])   # negative indices

    # quads fan-triangulate around the first vertex; degenerate
    # (repeated-index) triangles are dropped
    v2, f2 = mesh_mod.parse_obj(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\nf 1 1 2\n")
    assert f2.shape == (2, 3)
    np.testing.assert_array_equal(f2, [[0, 1, 2], [0, 2, 3]])


def test_parse_obj_errors():
    with pytest.raises(ValueError):
        mesh_mod.parse_obj("v 0 0\n")          # short vertex
    with pytest.raises(ValueError):
        mesh_mod.parse_obj("v 0 0 0\nf 1 2 3\n")  # index out of range


def test_place_mesh_scale_yaw_translate():
    v = np.array([[1.0, 2.0, 3.0]])
    out = mesh_mod.place_mesh(v, position=(10, 0, 0), scale=(2, 3, 4))
    np.testing.assert_allclose(out, [[12.0, 6.0, 12.0]])
    # +90 deg yaw about +Y maps +X to -Z
    out = mesh_mod.place_mesh(np.array([[1.0, 0.0, 0.0]]), rotation_y=90.0)
    np.testing.assert_allclose(out, [[0.0, 0.0, -1.0]], atol=1e-12)


def test_scene_mesh_object_and_parity_skip(tmp_path):
    (tmp_path / "quad.obj").write_text(
        "v -1 -1 0\nv 1 -1 0\nv 1 1 0\nv -1 1 0\nf 1 2 3 4\n")
    d = {"camera": {"position": [0, 0, 8], "aspectRatio": 1.0},
         "objects": [{"type": "mesh", "path": "quad.obj",
                      "position": [0, 0, 0], "scale": 2.0,
                      "material": {"type": "lambertian",
                                   "color": [0.8, 0.2, 0.2]}}],
         "lights": [{"position": [0, 3, 8], "color": [1, 1, 1],
                     "intensity": 30.0}]}
    (tmp_path / "scene.json").write_text(json.dumps(d))

    # relative OBJ path resolves from the scene file's directory
    scene, _ = rt.load_scene(str(tmp_path / "scene.json"))
    assert scene.geometry.tri_v0.shape == (2, 3)
    np.testing.assert_allclose(np.asarray(scene.geometry.tri_v0[0]),
                               [-2, -2, 0])
    # face normal points +Z (counter-clockwise winding seen from +Z)
    np.testing.assert_allclose(np.asarray(scene.geometry.tri_normal[0]),
                               [0, 0, 1], atol=1e-12)

    # --go-parity: unknown object type silently skipped (scene.go:80-83)
    scene_p, _ = scene_mod.from_dict(d, go_parity=True,
                                     base_dir=str(tmp_path))
    assert scene_p.geometry.tri_v0.shape == (0, 3)


def test_parse_obj_roundtrip_fuzz():
    """Random meshes written as OBJ text parse back to identical
    vertices/faces across all face-token forms."""
    rs = np.random.default_rng(7)
    for trial in range(20):
        nv = int(rs.integers(3, 40))
        nf = int(rs.integers(1, 60))
        verts = rs.normal(size=(nv, 3)).round(6)
        faces = np.stack([rs.choice(nv, size=3, replace=False)
                          for _ in range(nf)])
        lines = [f"v {x} {y} {z}" for x, y, z in verts]
        forms = ["{i}", "{i}/{t}", "{i}//{n}", "{i}/{t}/{n}"]
        for a, b, c in faces:
            f = forms[int(rs.integers(4))]
            tok = lambda i: f.format(i=i + 1, t=int(rs.integers(1, 9)),
                                     n=int(rs.integers(1, 9)))
            lines.append(f"f {tok(a)} {tok(b)} {tok(c)}")
        v, fc = mesh_mod.parse_obj("\n".join(lines))
        np.testing.assert_allclose(v, verts)
        np.testing.assert_array_equal(fc, faces)


def test_mesh_vertices_are_differentiable(tmp_path):
    """OBJ meshes ride the same triangle SoA as cubes, so vertex
    gradients flow (diff.split_params re-derives face normals from the
    vertices; see diff.py)."""
    from raytrace_tpu import diff as diff_mod
    (tmp_path / "quad.obj").write_text(
        "v -1 -1 0\nv 1 -1 0\nv 1 1 0\nv -1 1 0\nf 1 2 3 4\n")
    d = {"camera": {"position": [0, 0, 4], "aspectRatio": 1.0},
         "objects": [{"type": "mesh", "path": "quad.obj",
                      "position": [0, 0, 0], "scale": 1.5,
                      "material": {"type": "lambertian",
                                   "color": [0.7, 0.3, 0.2]}}],
         "lights": [{"position": [1, 2, 5], "color": [1, 1, 1],
                     "intensity": 20.0}]}
    scene, _ = scene_mod.from_dict(d, base_dir=str(tmp_path),
                                   build_accel=False)
    cfg = trace_mod.TraceConfig(seed=0, max_depth=2, shadow_samples=1)
    _, g = diff_mod.render_and_grad(scene, 12, 10, samples=2, cfg=cfg)
    gv = np.asarray(g["geometry"]["tri_v0"])
    assert np.isfinite(gv).all()
    assert np.abs(gv).max() > 0.0  # shading responds to vertex motion


def test_mesh_renders_end_to_end(tmp_path):
    (tmp_path / "quad.obj").write_text(
        "v -1 -1 0\nv 1 -1 0\nv 1 1 0\nv -1 1 0\nf 1 2 3 4\n")
    d = {"camera": {"position": [0, 0, 4], "aspectRatio": 1.3333},
         "objects": [{"type": "mesh", "path": "quad.obj",
                      "position": [0, 0, 0], "scale": 1.5,
                      "material": {"type": "lambertian",
                                   "color": [0.8, 0.3, 0.3]}}],
         "lights": [{"position": [0, 2, 6], "color": [1, 1, 1],
                     "intensity": 25.0}]}
    scene, _ = scene_mod.from_dict(d, base_dir=str(tmp_path))
    cfg = trace_mod.TraceConfig(seed=0, max_depth=3, shadow_samples=2)
    img = np.asarray(renderer_mod.render_band(
        scene, jnp.int32(0), width=24, height=18, band_h=18, samples=2,
        cfg=cfg))
    assert np.isfinite(img).all()
    # the quad fills the frame center; the center pixel must be lit red
    c = img[9, 12]
    assert c[0] > 0.0 and c[0] > c[1] and c[0] > c[2]

"""Scene loader parity: triangulation, material dispatch, config blocks."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

import raytrace_tpu as rt
from raytrace_tpu.models import materials as M

import go_oracle


def test_cube_triangulation_matches_reference_layout():
    d = {"camera": {"position": [0, 0, 0], "aspectRatio": 1.0},
         "objects": [{"type": "cube", "position": [1, 2, 3],
                      "size": [2, 4, 6],
                      "material": {"type": "lambertian", "color": [1, 0, 0]}}],
         "lights": []}
    scene, _ = rt.scene_from_dict(d)
    tris = go_oracle._cube_tris([1, 2, 3], [2, 4, 6])
    assert scene.geometry.tri_v0.shape == (12, 3)
    for i, (v0, v1, v2) in enumerate(tris):
        np.testing.assert_allclose(np.asarray(scene.geometry.tri_v0[i]), v0)
        np.testing.assert_allclose(np.asarray(scene.geometry.tri_v1[i]), v1)
        np.testing.assert_allclose(np.asarray(scene.geometry.tri_v2[i]), v2)


def test_prism_support_and_go_parity_skip():
    d = {"camera": {}, "lights": [],
         "objects": [{"type": "triangularPrism",
                      "vertices": [[-1, 0, 0], [1, 0, 0], [0, 1, 0],
                                   [-1, 0, 2], [1, 0, 2], [0, 1, 2]],
                      "material": {"type": "metal", "color": [1, 1, 1]}}]}
    scene, _ = rt.scene_from_dict(d)
    assert scene.geometry.tri_v0.shape == (8, 3)  # 2 caps + 3 quads * 2
    scene_p, _ = rt.scene_from_dict(d, go_parity=True)
    assert scene_p.geometry.tri_v0.shape == (0, 3)  # scene.go:80-83 skip


def test_material_dispatch_defaults():
    rows = {
        "metal_default": {"type": "metal", "color": [0.5, 0.5, 0.5]},
        "shiny_default": {"type": "shiny", "color": [0.5, 0.5, 0.5]},
        "unknown": {"type": "wat", "color": [0.1, 0.2, 0.3]},
        "dielectric": {"type": "dielectric", "refractionIndex": 1.7},
        "light": {"type": "diffuselight", "color": [4, 3, 2]},
    }
    r = {k: M.material_row(v) for k, v in rows.items()}
    # metal defaults metallic=1 specular=1 (scene.go:113-117)
    assert r["metal_default"]["metallic"] == 1.0
    assert r["metal_default"]["specular"] == 1.0
    # shiny defaults metallic=0 (scene.go:119-124)
    assert r["shiny_default"]["metallic"] == 0.0
    # unknown type -> lambertian (scene.go:144-147)
    assert r["unknown"]["kind"] == M.LAMBERTIAN
    # dielectric: GetAlbedo = (1,1,1) (material.go:266-268)
    assert r["dielectric"]["eff_albedo"] == [1.0, 1.0, 1.0]
    assert r["dielectric"]["ior"] == 1.7
    # diffuselight emits its color, zero albedo (material.go:300-306)
    assert r["light"]["emit"] == [4, 3, 2]
    assert r["light"]["eff_albedo"] == [0.0, 0.0, 0.0]


def test_missing_color_defaults_white_instead_of_panicking():
    # Go loader would panic here (scene.go:113 with nil color).
    row = M.material_row({"type": "metal"})
    assert row["albedo"] == [1.0, 1.0, 1.0]


def test_config_blocks_surfaced(tmp_path):
    d = {"camera": {}, "objects": [], "lights": [],
         "renderer": {"samples": 7, "maxDepth": 3},
         "fog": {"enabled": True, "density": 0.1},
         "bloom": {"enabled": False}}
    p = tmp_path / "s.json"
    p.write_text(json.dumps(d))
    scene, cfg = rt.load_scene(str(p))
    assert cfg.renderer["samples"] == 7
    assert cfg.fog["enabled"] is True
    assert cfg.effects["bloom"] == {"enabled": False}


def test_demo_scenes_load():
    s1, _ = rt.load_scene(
        "/root/reference/demo-assets/sphere_reflections_light.json")
    assert s1.geometry.sph_center.shape == (5, 3)
    assert s1.lights.position.shape == (2, 3)
    s2, c2 = rt.load_scene(
        "/root/reference/demo-assets/final_silver_prism_purple_cube_.json")
    # 2 cubes (24 tris) + 2 prisms (16 tris)
    assert s2.geometry.tri_v0.shape == (40, 3)
    assert c2.renderer["samples"] == 200

"""AOV feature buffers (aov.py): geometry, materials and miss handling."""

import numpy as np

from raytrace_tpu import aov
from raytrace_tpu import scene as scene_mod
from raytrace_tpu.ops import intersect as isect

W, H = 20, 16

SCENE = {
    # camera at +Z looking down -Z (the fixed Go viewport); sphere at
    # origin fills the frame center
    "camera": {"position": [0, 0, 5], "aspectRatio": W / H},
    "objects": [
        {"type": "sphere", "position": [0, 0, 0], "radius": 1.0,
         "material": {"type": "lambertian", "color": [0.8, 0.2, 0.1]}},
    ],
    "lights": [],
}


def test_aov_center_hit_geometry():
    scene, _ = scene_mod.from_dict(SCENE)
    a = aov.render_aovs(scene, width=W, height=H)
    cy, cx = H // 2, W // 2
    assert bool(a["hit"][cy, cx])
    # near-center ray hits close to the sphere's near pole: depth ~ 4,
    # position near (0,0,1), normal mostly +Z (pixel centers sit half a
    # pixel off the optical axis, so tolerances cover that offset)
    assert abs(a["depth"][cy, cx] - 4.0) < 0.3
    np.testing.assert_allclose(a["position"][cy, cx], [0, 0, 1], atol=0.35)
    assert a["normal"][cy, cx][2] > 0.85
    np.testing.assert_allclose(a["albedo"][cy, cx], [0.8, 0.2, 0.1],
                               atol=1e-6)
    assert a["mat_id"][cy, cx] == 0
    assert bool(a["front_face"][cy, cx])
    # hit position lies on the sphere and the normal is the unit radial
    # direction at every hit pixel — exact geometry, not just the center
    pos = a["position"][a["hit"]]
    np.testing.assert_allclose(np.linalg.norm(pos, axis=-1), 1.0,
                               atol=1e-5)
    ln = np.linalg.norm(a["normal"][a["hit"]], axis=-1)
    np.testing.assert_allclose(ln, 1.0, atol=1e-5)
    np.testing.assert_allclose(a["normal"][a["hit"]], pos, atol=1e-5)


def test_aov_miss_sentinels():
    scene, _ = scene_mod.from_dict(SCENE)
    a = aov.render_aovs(scene, width=W, height=H)
    miss = ~a["hit"]
    assert miss.any()
    assert (a["depth"][miss] == float(isect.BIG)).all()
    assert (a["mat_id"][miss] == -1).all()
    assert (a["position"][miss] == 0).all()
    assert (a["albedo"][miss] == 0).all()


def test_aov_albedo_semantics():
    """GetAlbedo parity: dielectric reports white, diffuselight black
    (models/materials.py eff_albedo)."""
    d = dict(SCENE)
    d["objects"] = [
        {"type": "sphere", "position": [-1.2, 0, 0], "radius": 1.0,
         "material": {"type": "dielectric", "refractionIndex": 1.5,
                      "color": [0.9, 0.1, 0.1]}},
        {"type": "sphere", "position": [1.2, 0, 0], "radius": 1.0,
         "material": {"type": "diffuselight", "color": [1, 1, 1]}},
    ]
    scene, _ = scene_mod.from_dict(d)
    a = aov.render_aovs(scene, width=W, height=H)
    die, lit = a["mat_id"] == 0, a["mat_id"] == 1
    assert die.any() and lit.any()
    np.testing.assert_allclose(a["albedo"][die], 1.0, atol=1e-6)
    np.testing.assert_allclose(a["albedo"][lit], 0.0, atol=1e-6)

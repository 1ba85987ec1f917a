"""Material scatter + shading tier tables vs the scalar Go oracle."""

import numpy as np
import jax.numpy as jnp

from raytrace_tpu.models import materials as M
from raytrace_tpu.ops import shade

import go_oracle


def _row(mdata):
    table = M.build_table([M.material_row(mdata)])
    return table.row(jnp.zeros(1, jnp.int32))


def _scatter(mdata, d, n, ff=True, ball=(0.0, 0.0, 0.0), pick=0.5):
    mat = _row(mdata)
    out_dir, att, ok = M.scatter(
        mat, jnp.asarray([d], jnp.float32), jnp.asarray([n], jnp.float32),
        jnp.asarray([ff]), jnp.asarray([ball], jnp.float32),
        jnp.asarray([pick], jnp.float32))
    return np.asarray(out_dir[0]), np.asarray(att[0]), bool(ok[0])


def test_metal_rough0_matches_oracle():
    m = {"type": "metal", "color": [0.8, 0.8, 0.9], "roughness": 0.0}
    om = go_oracle._mat(m)
    orc = go_oracle.Oracle({"camera": {}, "objects": [], "lights": []})
    rs = np.random.default_rng(0)
    for _ in range(20):
        d = rs.normal(size=3)
        n = d * 0  # build a normal facing against d
        n = -d / np.linalg.norm(d) + rs.normal(size=3) * 0.3
        n /= np.linalg.norm(n)
        od, oa, _ = orc.scatter(om, None, d, None, n, True)
        md, ma, ok = _scatter(m, d, n)
        assert ok
        np.testing.assert_allclose(md, od, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(ma, oa, rtol=1e-5, atol=1e-5)


def test_metal_fresnel_unnormalized_quirk():
    # |d| = 2 head-on: cosTheta = 2 -> (1-cos)^5 = -1 -> fresnel = f0+(1-f0)*(-1)
    # = 2*f0 - 1 < 0. jnp.power would NaN; parity requires the signed value.
    m = {"type": "metal", "color": [0.5, 0.5, 0.5], "roughness": 0.0,
         "metallic": 0.0}
    d = np.array([0.0, 0.0, -2.0])
    n = np.array([0.0, 0.0, 1.0])
    f0 = ((1.5 - 1) / (1.5 + 1)) ** 2
    fres = f0 + (1 - f0) * (1.0 - 2.0) ** 5
    fs = 0.6
    expected = np.clip(0.5 * (1 - fs) + fres * fs, 0.0, 1.0)
    _, ma, _ = _scatter(m, d, n)
    assert not np.any(np.isnan(ma))
    np.testing.assert_allclose(ma, [expected] * 3, rtol=1e-5, atol=1e-6)


def test_metal_high_metallic_double_blend():
    m = {"type": "metal", "color": [0.2, 0.4, 0.6], "roughness": 0.0,
         "metallic": 0.9}
    om = go_oracle._mat(m)
    orc = go_oracle.Oracle({"camera": {}, "objects": [], "lights": []})
    d = np.array([0.3, -0.7, -0.5])
    n = np.array([0.0, 0.0, 1.0])
    _, oa, _ = orc.scatter(om, None, d, None, n, True)
    _, ma, _ = _scatter(m, d, n)
    np.testing.assert_allclose(ma, oa, rtol=1e-5, atol=1e-6)


def test_shiny_and_perfectmirror_match_oracle():
    orc = go_oracle.Oracle({"camera": {}, "objects": [], "lights": []})
    d = np.array([0.2, -0.9, -0.4])
    n = np.array([0.1, 0.2, 0.97])
    n /= np.linalg.norm(n)
    for m in ({"type": "shiny", "color": [0.9, 0.6, 0.3], "roughness": 0.0,
               "specular": 0.7},
              {"type": "perfectmirror", "color": [0.9, 0.9, 0.9],
               "roughness": 0.0}):
        om = go_oracle._mat(m)
        od, oa, _ = orc.scatter(om, None, d, None, n, True)
        md, ma, ok = _scatter(m, d, n)
        np.testing.assert_allclose(md, od, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(ma, oa, rtol=1e-5, atol=1e-5)


def test_glass_reflect_refract_branches():
    m = {"type": "glass", "color": [0.8, 0.2, 0.2], "refractionIndex": 1.5}
    om = go_oracle._mat(m)

    class R:
        def __init__(self, v):
            self.v = v

        def random(self):
            return self.v

    d = np.array([0.0, -0.6, -0.8])
    n = np.array([0.0, 0.0, 1.0])
    # pick=1.0 -> refract in both (reflectance < 1); front face
    orc = go_oracle.Oracle({"camera": {}, "objects": [], "lights": []},
                           rng=R(0.999999))
    od, oa, _ = orc.scatter(om, None, d, None, n, True)
    md, ma, _ = _scatter(m, d, n, ff=True, pick=0.999999)
    np.testing.assert_allclose(md, od, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ma, oa, rtol=1e-6)
    # pick=0.0 -> reflect
    orc = go_oracle.Oracle({"camera": {}, "objects": [], "lights": []},
                           rng=R(0.0))
    od, _, _ = orc.scatter(om, None, d, None, n, True)
    md, _, _ = _scatter(m, d, n, ff=True, pick=0.0)
    np.testing.assert_allclose(md, od, rtol=1e-5, atol=1e-5)


def test_glass_total_internal_reflection():
    m = {"type": "glass", "color": [1, 1, 1], "refractionIndex": 1.5}
    # back face (inside glass), grazing: ratio=1.5, sin>2/3 -> TIR
    d = np.array([0.95, 0.0, -0.3122])
    d /= np.linalg.norm(d)
    n = np.array([0.0, 0.0, 1.0])
    md, _, _ = _scatter(m, d, n, ff=False, pick=0.999999)
    expected = d - 2 * np.dot(d, n) * n
    np.testing.assert_allclose(md, expected, rtol=1e-5, atol=1e-5)


def test_diffuselight_does_not_scatter():
    _, _, ok = _scatter({"type": "diffuselight", "color": [3, 3, 3]},
                        [0, 0, -1], [0, 0, 1])
    assert not ok


def test_lambertian_near_zero_fallback():
    n = np.array([0.0, 0.0, 1.0])
    md, ma, ok = _scatter({"type": "lambertian", "color": [0.5, 0.5, 0.5]},
                          [0, 0, -1], n, ball=tuple(-n))
    assert ok
    np.testing.assert_allclose(md, n, atol=1e-6)
    np.testing.assert_allclose(ma, [0.5] * 3)


def test_tier_tables_exact():
    # strict > boundaries (renderer.go:191-292)
    met = jnp.asarray([0.0, 0.2, 0.21, 0.5, 0.51, 0.7, 0.71, 0.8, 0.81,
                       0.9, 0.91, 0.95, 0.96, 1.0], jnp.float32)
    wr, wd = shade.combine_weights(met)
    np.testing.assert_allclose(
        np.asarray(wr),
        [1.0, 1.0, 0.4, 0.4, 0.6, 0.6, 0.7, 0.7, 0.75, 0.75, 0.8, 0.8,
         0.85, 0.85], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(wd),
        [1.0, 1.0, 0.6, 0.6, 0.4, 0.4, 0.3, 0.3, 0.25, 0.25, 0.2, 0.2,
         0.15, 0.15], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(shade.ambient_strength(met)),
        [0.1, 0.1, 0.1, 0.1, 0.08, 0.08, 0.07, 0.07, 0.07, 0.07, 0.05,
         0.05, 0.05, 0.05], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(shade.diffuse_strength(met)),
        [0.25, 0.25, 0.25, 0.25, 0.2, 0.2, 0.15, 0.15, 0.12, 0.12, 0.08,
         0.08, 0.05, 0.05], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(shade.specular_power(met)),
        [32, 32, 32, 32, 32, 32, 32, 32, 48, 48, 64, 64, 64, 64], rtol=1e-6)

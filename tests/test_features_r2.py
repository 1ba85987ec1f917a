"""Round-2 feature surface: Mirror material, thin-lens DoF, texture hook,
AreaLight integration, caustic/bump helpers (VERDICT items 5-6)."""

import numpy as np
import jax.numpy as jnp

from raytrace_tpu import effects as fx
from raytrace_tpu import lighting
from raytrace_tpu import renderer as renderer_mod
from raytrace_tpu import scene as scene_mod
from raytrace_tpu import trace as trace_mod
from raytrace_tpu.models import materials as M
from raytrace_tpu.models import textures as T

import go_oracle


def _scatter(mdata, d, n, ff=True, ball=(0.0, 0.0, 0.0), pick=0.5):
    table = M.build_table([M.material_row(mdata)])
    mat = table.row(jnp.zeros(1, jnp.int32))
    out_dir, att, ok = M.scatter(
        mat, jnp.asarray([d], jnp.float32), jnp.asarray([n], jnp.float32),
        jnp.asarray([ff]), jnp.asarray([ball], jnp.float32),
        jnp.asarray([pick], jnp.float32))
    return np.asarray(out_dir[0]), np.asarray(att[0]), bool(ok[0])


# ---------------------------------------------------------------------------
# Mirror (advanced_materials.go:68-109)
# ---------------------------------------------------------------------------

def test_mirror_rough0_matches_oracle():
    m = {"type": "mirror", "color": [0.9, 0.85, 0.8], "roughness": 0.0}
    om = go_oracle._mat(m)
    orc = go_oracle.Oracle({"camera": {}, "objects": [], "lights": []})
    rs = np.random.default_rng(3)
    for _ in range(20):
        d = rs.normal(size=3)
        n = -d / np.linalg.norm(d) + rs.normal(size=3) * 0.3
        n /= np.linalg.norm(n)
        od, oa, odid = orc.scatter(om, None, d, None, n, True)
        md, ma, ok = _scatter(m, d, n)
        assert ok == odid
        np.testing.assert_allclose(md, od, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(ma, oa, rtol=1e-6)


def test_mirror_getters_metallic_specular_one():
    row = M.material_row({"type": "mirror", "color": [1, 1, 1],
                          "roughness": 0.4})
    assert row["kind"] == M.MIRROR
    assert row["metallic"] == 1.0 and row["specular"] == 1.0
    assert abs(row["roughness"] - 0.4) < 1e-12


def test_mirror_below_surface_no_scatter():
    """The distinctive branch (:88): a rough perturbation that drags the
    reflection below the surface must return did_scatter=False, and the
    render combine must then treat the lane as terminal (emitted+direct)."""
    d = np.array([0.0, -1.0, 0.0])
    n = np.array([0.0, 1.0, 0.0])
    # reflection = (0, 1, 0); ball chosen so reflected+1.0*ball dips below
    m = {"type": "mirror", "color": [1.0, 1.0, 1.0], "roughness": 1.0}
    _, _, ok_down = _scatter(m, d, n, ball=(0.0, -1.5, 0.0))
    assert not ok_down
    _, _, ok_up = _scatter(m, d, n, ball=(0.2, 0.3, 0.0))
    assert ok_up
    # perturbation is NOT normalized (unlike Metal)
    md, _, _ = _scatter(m, d, n, ball=(0.2, 0.3, 0.0))
    np.testing.assert_allclose(md, [0.2, 1.3, 0.0], atol=1e-6)


def test_mirror_scene_renders():
    """A mirror-floor scene goes through the full jnp engine (extended
    kind -> has_advanced) and produces a sane image."""
    data = {
        "camera": {"position": [0, 0, 5], "aspectRatio": 1.33},
        "objects": [
            {"type": "sphere", "position": [0, 0, 0], "radius": 1.0,
             "material": {"type": "mirror", "color": [0.95, 0.95, 0.95],
                          "roughness": 0.05}},
            {"type": "sphere", "position": [0, -101.0, 0], "radius": 100.0,
             "material": {"type": "lambertian", "color": [0.6, 0.2, 0.2]}},
        ],
        "lights": [{"position": [3, 5, 3], "color": [1, 1, 1],
                    "intensity": 50.0}],
    }
    scene, _ = scene_mod.from_dict(data)
    assert scene.materials.has_advanced
    cfg = trace_mod.TraceConfig(max_depth=4, shadow_samples=2)
    img = renderer_mod.render_band(scene, jnp.int32(0), width=24, height=18,
                                   band_h=18, samples=2, cfg=cfg)
    img = np.asarray(img)
    assert np.isfinite(img).all() and img.max() > 0.0


# ---------------------------------------------------------------------------
# Thin-lens depth of field (advanced.go:29-44)
# ---------------------------------------------------------------------------

def test_dof_parity_math():
    """Hand-check one ray against applyDepthOfField's formula, including
    the LookAt-point-cross-Up quirk and the output normalization."""
    from raytrace_tpu import camera as cam_mod
    from raytrace_tpu import rng as rng_mod
    cam = scene_mod.Camera(
        position=jnp.asarray([0.0, 0.0, 5.0]),
        look_at=jnp.asarray([1.0, 0.0, 0.0]),
        up=jnp.asarray([0.0, 1.0, 0.0]),
        fov=jnp.asarray(60.0), aspect_ratio=jnp.asarray(1.0))
    o = jnp.asarray([[0.0, 0.0, 5.0]])
    d = jnp.asarray([[0.3, -0.2, -1.0]])
    pix = jnp.asarray([7], jnp.uint32)
    samp = jnp.asarray([3], jnp.uint32)
    no, nd = cam_mod.thin_lens_perturb(cam, o, d, pix, samp, seed=0)
    # reference formula in numpy
    rd = np.asarray(rng_mod.unit_disk(pix, samp, rng_mod.Streams.DOF_DISK,
                                      0))[0] * 0.1
    up = np.array([0.0, 1.0, 0.0])
    cr = np.cross([1.0, 0.0, 0.0], up)
    cr = cr / np.linalg.norm(cr)
    offset = up * rd[0] + cr * rd[1]
    exp_o = np.array([0.0, 0.0, 5.0]) + offset
    exp_d = np.array([0.3, -0.2, -1.0]) * 10.0 - offset
    exp_d = exp_d / np.linalg.norm(exp_d)
    np.testing.assert_allclose(np.asarray(no[0]), exp_o, atol=1e-6)
    np.testing.assert_allclose(np.asarray(nd[0]), exp_d, atol=1e-6)


def test_dof_changes_image(sphere_scene_dict):
    """set_depth_of_field(True) must actually perturb camera rays: the
    render differs from DoF-off (the reference flag changed nothing)."""
    scene, _ = scene_mod.from_dict(sphere_scene_dict)
    kw = dict(width=24, height=18, band_h=18, samples=4)
    cfg_off = trace_mod.TraceConfig(max_depth=3, shadow_samples=2)
    cfg_on = trace_mod.TraceConfig(max_depth=3, shadow_samples=2,
                                   depth_of_field=True)
    img_off = np.asarray(renderer_mod.render_band(
        scene, jnp.int32(0), cfg=cfg_off, **kw))
    img_on = np.asarray(renderer_mod.render_band(
        scene, jnp.int32(0), cfg=cfg_on, **kw))
    assert img_off.max() > 0 and img_on.max() > 0
    assert np.abs(img_on - img_off).max() > 1e-3  # visibly different
    # focussed distance ~ unchanged content: same overall energy ballpark
    assert abs(img_on.mean() - img_off.mean()) < 0.5 * max(img_off.mean(),
                                                           1e-6)


def test_renderer_dof_flag_wires_through():
    r = renderer_mod.Renderer()
    r.set_depth_of_field(True)
    assert r.trace_config().depth_of_field is True
    # Round 4: DoF renders RUN on the Pallas path - the cone mask widens
    # by the lens angle + origin-shift slack (megakernel.pixel_mask_pallas
    # docstring; conservativeness fuzzed in
    # test_megakernel.test_pixel_cone_mask_conservative_dof).
    scene, _ = scene_mod.from_dict({
        "camera": {"position": [0, 0, 5]},
        "objects": [{"type": "sphere", "position": [0, 0, 0], "radius": 1,
                     "material": {"type": "lambertian", "color": [1, 0, 0]}}],
        "lights": []})
    assert r._pallas_ok(scene, r.trace_config())


# ---------------------------------------------------------------------------
# Texture -> albedo hook (advanced_materials.go:416-631 made reachable)
# ---------------------------------------------------------------------------

def test_texture_from_dict_types():
    assert isinstance(T.texture_from_dict({"type": "checkerboard"}),
                      T.CheckerboardTexture)
    assert isinstance(T.texture_from_dict({"type": "marble"}),
                      T.MarbleTexture)
    assert isinstance(T.texture_from_dict({"type": "wood"}),
                      T.WoodTexture)
    assert isinstance(T.texture_from_dict({"type": "voronoi",
                                           "distance": "manhattan"}),
                      T.VoronoiTexture)


def test_textured_material_binding():
    rows = [M.material_row({"type": "lambertian", "color": [1, 1, 1],
                            "texture": {"type": "checkerboard",
                                        "scale": 2.0}}),
            M.material_row({"type": "metal", "color": [0.8, 0.8, 0.8]})]
    table = M.build_table(rows)
    assert len(table.textures) == 1
    mi, tex = table.textures[0]
    assert mi == 0 and isinstance(tex, T.CheckerboardTexture)
    # go-parity loader must NOT bind textures
    row_p = M.material_row({"type": "lambertian",
                            "texture": {"type": "wood"}}, extended=False)
    assert row_p.get("texture") is None


def test_textured_scene_render_differs():
    """A checkerboard-textured floor must render with spatially varying
    albedo (two sample points on the floor differ), and identically to the
    untextured scene where the texture is white."""
    base = {
        "camera": {"position": [0, 1.5, 6], "aspectRatio": 1.33},
        "objects": [
            {"type": "sphere", "position": [0, -100.0, 0], "radius": 100.0,
             "material": {"type": "lambertian", "color": [1.0, 1.0, 1.0],
                          "texture": {"type": "checkerboard", "scale": 1.0,
                                      "color1": [1.0, 0.1, 0.1],
                                      "color2": [0.1, 0.1, 1.0]}}},
        ],
        "lights": [{"position": [0, 8, 6], "color": [1, 1, 1],
                    "intensity": 80.0}],
    }
    scene, _ = scene_mod.from_dict(base)
    assert scene.materials.textures
    cfg = trace_mod.TraceConfig(max_depth=2, shadow_samples=2)
    img = np.asarray(renderer_mod.render_band(
        scene, jnp.int32(0), width=32, height=16, band_h=16, samples=2,
        cfg=cfg))
    assert img.max() > 0
    # v=0 maps to steep DOWN rays under the parity camera (renderer.go:
    # 377-390 + the flipped framing), so the floor occupies the LOW rows.
    floor = img[:8, :, :]
    assert floor.max() > 0
    # the checker pattern must show: red-channel variance across the floor
    assert floor[..., 0].std() > 0.01
    # red and blue cells anticorrelate along a row
    r_row = floor[2, :, 0]
    b_row = floor[2, :, 2]
    assert np.corrcoef(r_row, b_row)[0, 1] < 0.5


# ---------------------------------------------------------------------------
# AreaLight N-sample integration (lighting.go:111-155 Samples field)
# ---------------------------------------------------------------------------

def test_arealight_integrate_averages():
    al = lighting.AreaLight(position=[0, 5, 0], u_edge=[2, 0, 0],
                            v_edge=[0, 0, 2], intensity=10.0, samples=16)
    pts = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 1.0]], jnp.float32)
    pix = jnp.asarray([0, 1], jnp.uint32)
    samp = jnp.asarray([0, 0], jnp.uint32)
    ls = al.integrate(pts, pix, samp, seed=0)
    rad = np.asarray(ls.radiance)
    assert rad.shape == (2, 3) and (rad > 0).all()
    # integrated radiance approximates the mean of the per-sample draws
    singles = [np.asarray(al.sample(pts, pix, samp, 0, stream=s).radiance)
               for s in range(16)]
    np.testing.assert_allclose(rad, np.mean(singles, axis=0), rtol=1e-5)


def test_arealight_integrate_with_occlusion():
    """A blocker between emitter and point zeroes (most of) the light."""
    data = {
        "camera": {"position": [0, 0, 5]},
        "objects": [{"type": "sphere", "position": [0, 2.5, 0],
                     "radius": 1.6,
                     "material": {"type": "lambertian",
                                  "color": [1, 1, 1]}}],
        "lights": [],
    }
    scene, _ = scene_mod.from_dict(data)
    al = lighting.AreaLight(position=[-0.5, 5, -0.5], u_edge=[1, 0, 0],
                            v_edge=[0, 0, 1], intensity=10.0, samples=16)
    pts = jnp.asarray([[0.0, 0.0, 0.0], [10.0, 0.0, 0.0]], jnp.float32)
    pix = jnp.asarray([0, 1], jnp.uint32)
    samp = jnp.asarray([0, 0], jnp.uint32)
    lit = al.integrate(pts, pix, samp, seed=0)
    occ = al.integrate(pts, pix, samp, seed=0, geom=scene.geometry)
    lit_r, occ_r = np.asarray(lit.radiance), np.asarray(occ.radiance)
    # point 0 sits in the sphere's shadow; point 1 is off to the side
    assert occ_r[0].sum() < 0.1 * lit_r[0].sum()
    np.testing.assert_allclose(occ_r[1], lit_r[1], rtol=1e-5)


# ---------------------------------------------------------------------------
# advanced.go per-hit helpers
# ---------------------------------------------------------------------------

def test_caustic_approximation_values():
    lights = scene_mod.Lights(
        position=jnp.asarray([[0.0, 2.0, 0.0]], jnp.float32),
        color=jnp.asarray([[0.5, 1.0, 0.25]], jnp.float32),
        intensity=jnp.asarray([7.0], jnp.float32))  # intensity unused (:85)
    p = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 3.0, 0.0]], jnp.float32)
    n = jnp.asarray([[0.0, 1.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
    out = np.asarray(fx.caustic_approximation(p, n, lights))
    # point 0: light straight up -> cos=1 -> exactly light.Color
    np.testing.assert_allclose(out[0], [0.5, 1.0, 0.25], atol=1e-6)
    # point 1: light straight DOWN relative to normal -> clamped to 0
    np.testing.assert_allclose(out[1], [0.0, 0.0, 0.0], atol=1e-6)


def test_bump_map_normal_values():
    p = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    n = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    out = np.asarray(fx.bump_map_normal(p, n))
    # at origin: bumpU = sin(0)*0.1 = 0, bumpV = cos(0)*0.1 = 0.1
    exp = np.array([0.0, 0.1, 1.0])
    exp = exp / np.linalg.norm(exp)
    np.testing.assert_allclose(out[0], exp, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0,
                               atol=1e-6)


def test_procedural_texture_color_range():
    rs = np.random.default_rng(0)
    p = jnp.asarray(rs.uniform(-3, 3, (64, 3)), jnp.float32)
    c = np.asarray(fx.procedural_texture_color(p))
    assert c.shape == (64, 3)
    assert (c >= 0.0).all() and (c <= 1.0).all()
    assert c.std() > 0.1  # actually varies

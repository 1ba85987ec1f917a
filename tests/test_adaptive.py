"""Adaptive sampling (adaptive.py): estimator exactness and sample savings.

The counter-based RNG makes adaptive batches reproduce exactly the
samples a fixed-spp render would take (samples are keyed by
(pixel, sample id), never by batch membership); these tests pin that
invariant and the actual adaptivity (flat pixels stop at min_spp).
"""

import numpy as np
import jax.numpy as jnp

from raytrace_tpu import adaptive
from raytrace_tpu import renderer as renderer_mod
from raytrace_tpu import scene as scene_mod
from raytrace_tpu import trace as trace_mod

W, H = 16, 12

SCENE = {
    "camera": {"position": [0, 0, 6], "aspectRatio": W / H},
    "objects": [
        {"type": "sphere", "position": [0, 0, 0], "radius": 1.0,
         "material": {"type": "metal", "color": [0.8, 0.7, 0.6],
                      "roughness": 0.3, "metallic": 0.9}},
        {"type": "sphere", "position": [0, -101, 0], "radius": 100.0,
         "material": {"type": "lambertian", "color": [0.5, 0.5, 0.5]}},
    ],
    "lights": [{"position": [3, 5, 5], "color": [1, 1, 1],
                "intensity": 30.0}],
}


def _scene():
    s, _ = scene_mod.from_dict(SCENE)
    return s


def test_adaptive_tol_zero_equals_fixed_spp():
    """With tolerances 0 nothing converges early: every pixel takes
    max_spp samples and the image equals the fixed-spp render (same
    sample ids; only float64-host vs float32-device summation differs)."""
    scene = _scene()
    cfg = trace_mod.TraceConfig(seed=0, max_depth=4, shadow_samples=2)
    img, spp = adaptive.render_adaptive(
        scene, width=W, height=H, cfg=cfg, min_spp=8, max_spp=8, batch=4,
        rel_tol=0.0, abs_tol=0.0, pad_quantum=64)
    ref = np.asarray(renderer_mod.render_band(
        scene, jnp.int32(0), width=W, height=H, band_h=H, samples=8,
        cfg=cfg))
    # mask-proven-empty pixels are never sampled (spp 0, exact black);
    # every pixel that CAN hit takes the full max_spp
    hit = spp > 0
    assert (spp[hit] == 8).all()
    assert (img[~hit] == 0.0).all()
    assert hit.any()
    np.testing.assert_allclose(img, ref, atol=3e-5, rtol=1e-4)


def test_adaptive_batching_is_invisible():
    """Batch size must not change the estimator beyond float summation
    order (the same sample ids are drawn either way; the device f32
    partial sums just associate differently): batch=2 ~= batch=8."""
    scene = _scene()
    cfg = trace_mod.TraceConfig(seed=0, max_depth=3, shadow_samples=1)
    kw = dict(width=W, height=H, cfg=cfg, min_spp=8, max_spp=8,
              rel_tol=0.0, abs_tol=0.0, pad_quantum=64)
    img2, _ = adaptive.render_adaptive(scene, batch=2, **kw)
    img8, _ = adaptive.render_adaptive(scene, batch=8, **kw)
    np.testing.assert_allclose(img2, img8, atol=1e-6, rtol=1e-6)


def test_adaptive_saves_samples_on_flat_pixels():
    scene = _scene()
    cfg = trace_mod.TraceConfig(seed=0, max_depth=4, shadow_samples=2)
    img, spp = adaptive.render_adaptive(
        scene, width=W, height=H, cfg=cfg, min_spp=4, max_spp=32, batch=4,
        rel_tol=0.05, abs_tol=1e-3, pad_quantum=64)
    # miss pixels are exact black: mask-proven-empty ones never sample
    # (spp 0); mask-over-included ones hit zero variance at min_spp
    miss = img.sum(axis=2) == 0.0
    assert miss.any()
    assert np.isin(spp[miss], (0, 4)).all()
    # at least some geometry pixels demand more than min_spp, none
    # exceed the cap, and the frame saves samples overall
    assert (spp > 4).any()
    assert spp.max() <= 32
    assert spp.mean() < 32 / 2


def test_adaptive_sharded_matches_single_device():
    """Pixel-axis sharding over the mesh is invisible: every pixel's
    batch stays on one device and the RNG keys by (pixel, sample), so
    the sharded run is bit-identical (image AND spp decisions)."""
    from raytrace_tpu import parallel
    scene = _scene()
    cfg = trace_mod.TraceConfig(seed=0, max_depth=3, shadow_samples=2)
    kw = dict(width=W, height=H, cfg=cfg, min_spp=4, max_spp=16, batch=4,
              rel_tol=0.05, abs_tol=1e-3, pad_quantum=64)
    img1, spp1 = adaptive.render_adaptive(scene, **kw)
    img8, spp8 = adaptive.render_adaptive(
        scene, mesh=parallel.make_mesh(), **kw)
    np.testing.assert_array_equal(img1, img8)
    np.testing.assert_array_equal(spp1, spp8)


def test_adaptive_device_accum_sharded_matches_host():
    """Round 4: accum='device' composes with a mesh (the restriction the
    round-3 verdict flagged). The sharded device run must make identical
    spp decisions to BOTH the unsharded device run (bit-identical image
    too - same per-row f32 arithmetic) and the host-f64 oracle."""
    from raytrace_tpu import parallel
    scene = _scene()
    cfg = trace_mod.TraceConfig(seed=0, max_depth=3, shadow_samples=2)
    kw = dict(width=W, height=H, cfg=cfg, min_spp=4, max_spp=16, batch=4,
              rel_tol=0.05, abs_tol=1e-3, pad_quantum=64)
    mesh = parallel.make_mesh()
    img_h, spp_h = adaptive.render_adaptive(scene, **kw)           # host, 1dev
    img_d1, spp_d1 = adaptive.render_adaptive(scene, accum="device", **kw)
    img_d8, spp_d8 = adaptive.render_adaptive(scene, mesh=mesh,
                                              accum="device", **kw)
    np.testing.assert_array_equal(spp_d8, spp_d1)
    np.testing.assert_array_equal(spp_d8, spp_h)
    np.testing.assert_array_equal(img_d8, img_d1)
    np.testing.assert_allclose(img_d8, img_h, rtol=2e-6, atol=2e-7)
    # host accumulation over a mesh with the pallas engine also composes
    # (engine fan-out in _batch_sums_sharded); one tiny interpret-mode
    # kernel call keeps it honest on CPU.
    kw_tiny = dict(width=8, height=6, cfg=trace_mod.TraceConfig(
        seed=0, max_depth=2, shadow_samples=1), min_spp=2, max_spp=2,
        batch=2, rel_tol=0.0, abs_tol=0.0, pad_quantum=64)
    img_pj, spp_pj = adaptive.render_adaptive(scene, engine="jnp",
                                              **kw_tiny)
    img_p8, spp_p8 = adaptive.render_adaptive(scene, engine="pallas",
                                              mesh=mesh, accum="device",
                                              **kw_tiny)
    np.testing.assert_array_equal(spp_p8, spp_pj)
    np.testing.assert_allclose(img_p8, img_pj, atol=1e-6, rtol=1e-6)


def test_adaptive_pallas_engine_matches_jnp():
    """The engine='pallas' batch path (the TPU route) produces the same
    image as the jnp path - one tiny interpret-mode kernel call keeps
    the plumbing honest without TPU hardware. The device-accumulation
    driver gets the same one-kernel-call check (min=max=batch: a single
    _device_round, no test round)."""
    scene = _scene()
    cfg = trace_mod.TraceConfig(seed=0, max_depth=2, shadow_samples=1)
    kw = dict(width=8, height=6, cfg=cfg, min_spp=2, max_spp=2, batch=2,
              rel_tol=0.0, abs_tol=0.0, pad_quantum=64)
    img_j, spp_j = adaptive.render_adaptive(scene, engine="jnp", **kw)
    img_p, spp_p = adaptive.render_adaptive(scene, engine="pallas", **kw)
    np.testing.assert_allclose(img_p, img_j, atol=1e-6, rtol=1e-6)
    np.testing.assert_array_equal(spp_j, spp_p)
    img_d, spp_d = adaptive.render_adaptive(scene, engine="pallas",
                                            accum="device", **kw)
    np.testing.assert_allclose(img_d, img_j, atol=1e-6, rtol=1e-6)
    np.testing.assert_array_equal(spp_d, spp_j)


def test_adaptive_device_accum_matches_host():
    """accum='device' (the TPU-resident driver: on-device f32 sums,
    stderr test and compaction) agrees with the host-f64 oracle path to
    float summation order; the convergence decisions match on this scene
    (both are deterministic, so this is a real pin, not a flake)."""
    scene = _scene()
    cfg = trace_mod.TraceConfig(seed=0, max_depth=3, shadow_samples=2)
    kw = dict(width=W, height=H, cfg=cfg, min_spp=4, max_spp=16, batch=4,
              rel_tol=0.05, abs_tol=1e-3, pad_quantum=64)
    img_h, spp_h = adaptive.render_adaptive(scene, accum="host", **kw)
    img_d, spp_d, var_d = adaptive.render_adaptive(
        scene, accum="device", return_variance=True, **kw)
    np.testing.assert_allclose(img_d, img_h, atol=1e-6, rtol=1e-5)
    np.testing.assert_array_equal(spp_d, spp_h)
    assert np.isfinite(var_d).all() and (var_d >= 0).all()
    # tolerance-zero exactness holds for the device driver too
    kw0 = dict(width=W, height=H, cfg=cfg, min_spp=8, max_spp=8, batch=4,
               rel_tol=0.0, abs_tol=0.0, pad_quantum=64)
    img0, spp0 = adaptive.render_adaptive(scene, accum="device", **kw0)
    import jax.numpy as _jnp
    ref = np.asarray(renderer_mod.render_band(
        scene, _jnp.int32(0), width=W, height=H, band_h=H, samples=8,
        cfg=cfg))
    hit = spp0 > 0
    assert (spp0[hit] == 8).all() and (img0[~hit] == 0.0).all()
    np.testing.assert_allclose(img0, ref, atol=3e-5, rtol=1e-4)


def test_adaptive_device_checkpoint_resume_is_exact(tmp_path, monkeypatch):
    """Device-mode resume is bit-identical (f32 state round-trips exactly
    through the f64 npz schema); host-mode checkpoints are rejected by a
    device-mode resume and vice versa (the truncated prefix would not be
    bit-identical to either uninterrupted run)."""
    scene = _scene()
    cfg = trace_mod.TraceConfig(seed=0, max_depth=3, shadow_samples=2)
    kw = dict(width=W, height=H, cfg=cfg, min_spp=4, max_spp=16, batch=4,
              rel_tol=0.05, abs_tol=1e-3, pad_quantum=64, accum="device")
    ref_img, ref_spp = adaptive.render_adaptive(scene, **kw)

    ckpt = str(tmp_path / "adaptive_dev.ckpt.npz")
    real = adaptive._device_round
    calls = {"n": 0}

    def dying(*a, **k):
        calls["n"] += 1
        if calls["n"] > 2:
            raise KeyboardInterrupt
        return real(*a, **k)

    monkeypatch.setattr(adaptive, "_device_round", dying)
    import pytest as _pytest
    with _pytest.raises(KeyboardInterrupt):
        adaptive.render_adaptive(scene, checkpoint_path=ckpt, **kw)
    monkeypatch.setattr(adaptive, "_device_round", real)

    img, spp = adaptive.render_adaptive(scene, checkpoint_path=ckpt, **kw)
    np.testing.assert_array_equal(img, ref_img)
    np.testing.assert_array_equal(spp, ref_spp)
    with _pytest.raises(ValueError):
        adaptive.render_adaptive(scene, checkpoint_path=ckpt,
                                 **dict(kw, accum="host"))


def test_adaptive_checkpoint_resume_is_exact(tmp_path, monkeypatch):
    """Kill the sampler mid-render, resume from the checkpoint: image,
    spp map and convergence decisions are bit-identical to an
    uninterrupted run (full state round-trips; counter RNG replays the
    identical sample ids)."""
    scene = _scene()
    cfg = trace_mod.TraceConfig(seed=0, max_depth=3, shadow_samples=2)
    kw = dict(width=W, height=H, cfg=cfg, min_spp=4, max_spp=16, batch=4,
              rel_tol=0.05, abs_tol=1e-3, pad_quantum=64)
    ref_img, ref_spp = adaptive.render_adaptive(scene, **kw)

    ckpt = str(tmp_path / "adaptive.ckpt.npz")
    real = adaptive._sample_batch
    calls = {"n": 0}

    def dying(*a, **k):
        calls["n"] += 1
        if calls["n"] > 2:
            raise KeyboardInterrupt  # simulated kill mid-render
        return real(*a, **k)

    monkeypatch.setattr(adaptive, "_sample_batch", dying)
    import pytest as _pytest
    with _pytest.raises(KeyboardInterrupt):
        adaptive.render_adaptive(scene, checkpoint_path=ckpt, **kw)
    monkeypatch.setattr(adaptive, "_sample_batch", real)

    img, spp = adaptive.render_adaptive(scene, checkpoint_path=ckpt, **kw)
    np.testing.assert_array_equal(img, ref_img)
    np.testing.assert_array_equal(spp, ref_spp)

    # a repeated run resumes the finished state and returns immediately
    img2, spp2 = adaptive.render_adaptive(scene, checkpoint_path=ckpt,
                                          **kw)
    np.testing.assert_array_equal(img2, ref_img)

    # parameter drift is rejected (would silently change the estimator):
    # tolerances, ANY TraceConfig field, the camera model, and the scene
    bad = dict(kw, rel_tol=0.01)
    with _pytest.raises(ValueError):
        adaptive.render_adaptive(scene, checkpoint_path=ckpt, **bad)
    bad = dict(kw, cfg=trace_mod.TraceConfig(seed=0, max_depth=8,
                                             shadow_samples=16))
    with _pytest.raises(ValueError):
        adaptive.render_adaptive(scene, checkpoint_path=ckpt, **bad)
    with _pytest.raises(ValueError):
        adaptive.render_adaptive(scene, checkpoint_path=ckpt,
                                 go_camera=False, **kw)
    other = scene_mod.from_dict(dict(SCENE, lights=[
        {"position": [0, 9, 0], "color": [1, 1, 1], "intensity": 5.0}]))[0]
    with _pytest.raises(ValueError):
        adaptive.render_adaptive(other, checkpoint_path=ckpt, **kw)


def test_renderer_adaptive_wrapper():
    """Renderer.render_adaptive: uint8 image + spp map, benchmark data
    records the MEAN spp actually taken (not the cap)."""
    scene = _scene()
    r = renderer_mod.Renderer()
    r.set_samples(16)
    r.set_max_depth(3)
    img, spp = r.render_adaptive(scene, W, H, min_spp=4, rel_tol=0.05)
    assert img.dtype == np.uint8 and img.shape == (H, W, 3)
    # spp 0 = mask-proven-empty pixels (never sampled); sampled pixels
    # stay within [min_spp, cap]
    assert spp.shape == (H, W) and spp.max() <= 16
    assert (spp[spp > 0] >= 4).all() and (spp > 0).any()
    assert r.benchmark_data.samples == float(spp.mean())
    # denoise=True routes through the AOV-guided filter (same shapes,
    # still finite uint8)
    img_dn, _ = r.render_adaptive(scene, W, H, min_spp=4, rel_tol=0.05,
                                  denoise=True)
    assert img_dn.dtype == np.uint8 and img_dn.shape == (H, W, 3)
    assert not np.array_equal(img_dn, img)  # the filter did something
    # the FULL renderer block is honored (render() parity), not just
    # samples/maxDepth
    cfg_blk = scene_mod.SceneConfig(renderer={"softShadows": False,
                                              "recursiveReflections": False,
                                              "samples": 8})
    r2 = renderer_mod.Renderer()
    r2.render_adaptive(scene, W, H, scene_config=cfg_blk, min_spp=4)
    assert r2.soft_shadows is False
    assert r2.recursive_reflections is False
    assert r2.samples == 8


def test_adaptive_image_close_to_converged_reference():
    """The adaptive image with modest tolerances stays statistically
    close to a high-spp fixed render."""
    scene = _scene()
    cfg = trace_mod.TraceConfig(seed=0, max_depth=3, shadow_samples=1)
    img, _ = adaptive.render_adaptive(
        scene, width=W, height=H, cfg=cfg, min_spp=8, max_spp=64, batch=8,
        rel_tol=0.03, abs_tol=1e-3, pad_quantum=64)
    ref = np.asarray(renderer_mod.render_band(
        scene, jnp.int32(0), width=W, height=H, band_h=H, samples=64,
        cfg=cfg))
    # MC noise bound, not exactness: mean abs error well under the
    # brightest radiance scale
    assert np.abs(img - ref).mean() < 0.05 * max(ref.max(), 1e-6)


def test_adaptive_composes_with_stream_kernel(monkeypatch):
    """Adaptive sampling drives the STREAM (DMA) kernel mode (round 5,
    VERDICT r4 #3): the >4096-prim tier is exactly where variance-guided
    spp matters most (fixed-100spp frames are tens of seconds). Forced
    onto a tiny scene by patching the mode thresholds (same trick as the
    stream kernel tests): spp decisions must be identical to the jnp
    engine's, host and device accumulation alike."""
    import math
    from raytrace_tpu.ops import megakernel as mk
    objs = [{"type": "plane", "position": [0, -1.0, 0],
             "normal": [0, 1, 0],
             "material": {"type": "lambertian", "color": [0.6, 0.6, 0.6]}}]
    for i in range(12):
        a = 2 * math.pi * i / 12
        objs.append({"type": "sphere",
                     "position": [2.5 * math.cos(a), 0.0,
                                  2.5 * math.sin(a) - 5], "radius": 0.5,
                     "material": {"type": ["lambertian", "metal",
                                           "glass"][i % 3],
                                  "color": [0.7, 0.5, 0.4],
                                  "roughness": 0.2}})
    s, _ = scene_mod.from_dict({
        "camera": {"position": [0, 1, 2], "aspectRatio": 1.33},
        "objects": objs,
        "lights": [{"type": "point", "position": [4, 8, 4],
                    "color": [1, 1, 1], "intensity": 2.0}]})
    s = scene_mod.with_accel(s, leaf_size=4)
    monkeypatch.setattr(mk, "UNROLL_PRIM_LIMIT", 4)
    monkeypatch.setattr(mk, "MAX_BVH_KERNEL_PRIMS", 8)
    assert mk._kernel_mode(s) == "stream"
    cfg = trace_mod.TraceConfig(seed=0, max_depth=2, shadow_samples=1)
    kw = dict(width=8, height=6, cfg=cfg, min_spp=2, max_spp=4, batch=2,
              rel_tol=0.05, abs_tol=1e-3, pad_quantum=64)
    img_j, spp_j = adaptive.render_adaptive(s, engine="jnp", **kw)
    img_p, spp_p = adaptive.render_adaptive(s, engine="pallas", **kw)
    np.testing.assert_array_equal(spp_p, spp_j)
    np.testing.assert_allclose(img_p, img_j, atol=1e-6, rtol=1e-6)
    img_d, spp_d = adaptive.render_adaptive(s, engine="pallas",
                                            accum="device", **kw)
    np.testing.assert_array_equal(spp_d, spp_j)
    np.testing.assert_allclose(img_d, img_j, atol=1e-6, rtol=1e-6)
    # Round 5: glassy stream scenes trace adaptive batches through the
    # full-capacity survivor ladder (overflow statically impossible) —
    # force a split via the env knob and pin decisions/image unchanged
    # beyond the per-level f32 reassociation.
    monkeypatch.setenv("RT_SPLIT", "1")
    try:
        from raytrace_tpu import renderer as renderer_mod
        assert renderer_mod.pick_deep_caps(s) == "const"  # glassy
        img_s, spp_s = adaptive.render_adaptive(s, engine="pallas",
                                                accum="device", **kw)
    finally:
        monkeypatch.delenv("RT_SPLIT")
    np.testing.assert_array_equal(spp_s, spp_j)
    np.testing.assert_allclose(img_s, img_j, atol=1e-6, rtol=1e-6)

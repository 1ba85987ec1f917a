"""spp-chunked dispatch (round 5): render_wavefront_chunked splits a
frame into sample rounds, each its own dispatch, accumulating per-pixel
sums on device. The counter RNG keys every draw off (pixel, sample), so
round r's lanes are exactly the single-dispatch render's lanes for
sample ids [r*chunk, (r+1)*chunk) — the reference renders any scene to
completion in one go (cmd/raytracer/main.go:51); chunking is how the
stream tier does that under a bounded per-dispatch budget."""

import numpy as np

import raytrace_tpu as rt
from raytrace_tpu import renderer as renderer_mod
from raytrace_tpu import trace as trace_mod


def _scene():
    objs = [{"type": "plane", "position": [0, -1.0, 0],
             "normal": [0, 1, 0],
             "material": {"type": "lambertian", "color": [0.6, 0.6, 0.6]}},
            {"type": "sphere", "position": [0, 0, -3], "radius": 1.0,
             "material": {"type": "metal", "color": [0.8, 0.8, 0.9],
                          "roughness": 0.1}},
            {"type": "sphere", "position": [1.6, -0.4, -2.4],
             "radius": 0.5,
             "material": {"type": "glass", "color": [0.9, 0.9, 0.9]}},
            {"type": "sphere", "position": [-1.6, -0.4, -2.4],
             "radius": 0.5,
             "material": {"type": "lambertian",
                          "color": [0.7, 0.3, 0.3]}}]
    return rt.scene_from_dict({
        "camera": {"position": [0, 0.5, 2], "aspectRatio": 1.33},
        "objects": objs,
        "lights": [{"type": "point", "position": [4, 8, 4],
                    "color": [1, 1, 1], "intensity": 2.0}]})[0]


def test_chunked_matches_unchunked():
    """Chunked rounds accumulate to the single-dispatch image (same
    sample set, same per-pixel ascending-sample sum; the only possible
    difference is f32 re-association at round boundaries)."""
    s = _scene()
    cfg = trace_mod.TraceConfig(max_depth=3, shadow_samples=2)
    full = renderer_mod.render_wavefront(s, width=12, height=8, samples=4,
                                         cfg=cfg)
    for chunk in (1, 2, 3):
        part = renderer_mod.render_wavefront_chunked(
            s, width=12, height=8, samples=4, cfg=cfg, chunk=chunk)
        np.testing.assert_allclose(part, full, rtol=2e-6, atol=2e-7,
                                   err_msg=f"chunk={chunk}")
    # chunk >= samples falls through to the single-dispatch path: exact.
    whole = renderer_mod.render_wavefront_chunked(
        s, width=12, height=8, samples=4, cfg=cfg, chunk=4)
    assert np.array_equal(whole, full)


def test_chunked_round_resume_bit_exact():
    """A round's per-pixel sum depends ONLY on its global sample ids
    [s0, s0+c) — recomputing it later (after other rounds ran, or in a
    fresh resumed loop) is BIT-IDENTICAL, the property interrupt/resume
    and the chunked driver rely on. Also: the whole chunked frame is
    bit-deterministic across calls."""
    s = _scene()
    cfg = trace_mod.TraceConfig(max_depth=3, shadow_samples=2)
    import jax.numpy as jnp
    hit_px, pos_px, k_dev = renderer_mod._pixel_mask(
        s, width=12, height=8, samples=4, cfg=cfg, go_camera=True)
    k_px = int(k_dev)
    k_pad = renderer_mod._pad_bucket(k_px, 1)

    def round_sum(s0, c):
        part, _ = renderer_mod._compact_and_trace(
            s, hit_px, pos_px, jnp.int32(k_px), k_pad=k_pad, width=12,
            height=8, samples=c, cfg=cfg, go_camera=True,
            block_rows=8, samp_base=jnp.uint32(s0), sum_image=True)
        return np.asarray(part)

    r1_first = round_sum(2, 2)   # round [2,4) computed "out of order"
    r0 = round_sum(0, 2)
    r1_again = round_sum(2, 2)   # ... and again after round 0 ran
    np.testing.assert_array_equal(r1_first, r1_again)
    assert not np.array_equal(r0, r1_first)  # different ids, different sums
    # full chunked frame: bit-deterministic across calls
    a = renderer_mod.render_wavefront_chunked(
        s, width=12, height=8, samples=4, cfg=cfg, chunk=2)
    b = renderer_mod.render_wavefront_chunked(
        s, width=12, height=8, samples=4, cfg=cfg, chunk=2)
    np.testing.assert_array_equal(a, b)


def test_stream_split_and_chunked_compose(monkeypatch):
    """Round 5: mid-trace survivor re-compaction defaults ON for deep
    STREAM traces (grid-5833 full d50: 13.2 -> 8.05 s on TPU) and
    composes with the chunked driver. Forced onto a tiny stream scene:
    split and unsplit renders agree (radA + radB reassociation only),
    chunked+split likewise."""
    from raytrace_tpu import scene as scene_mod
    from raytrace_tpu.ops import megakernel as mk
    import math
    objs = [{"type": "plane", "position": [0, -1.0, 0],
             "normal": [0, 1, 0],
             "material": {"type": "lambertian", "color": [0.6, 0.6, 0.6]}}]
    for i in range(14):
        a = 2 * math.pi * i / 14
        objs.append({"type": "sphere",
                     "position": [2.2 * math.cos(a), 0.0,
                                  2.2 * math.sin(a) - 4], "radius": 0.5,
                     "material": {"type": ["glass", "metal"][i % 2],
                                  "color": [0.8, 0.8, 0.9],
                                  "roughness": 0.1}})
    s, _ = rt.scene_from_dict({
        "camera": {"position": [0, 0.6, 1.5], "aspectRatio": 1.33},
        "objects": objs,
        "lights": [{"type": "point", "position": [4, 8, 4],
                    "color": [1, 1, 1], "intensity": 2.0}]})
    s = scene_mod.with_accel(s, leaf_size=4)
    monkeypatch.setattr(mk, "UNROLL_PRIM_LIMIT", 4)
    monkeypatch.setattr(mk, "MAX_BVH_KERNEL_PRIMS", 8)
    assert mk._kernel_mode(s) == "stream"
    cfg = trace_mod.TraceConfig(max_depth=4, shadow_samples=1)
    # default policy: deep stream traces get the multi-level ladder
    # (this scene is glassy -> 'const' deep caps, ladder from bounce 4)
    deep = trace_mod.TraceConfig(max_depth=16)
    assert renderer_mod.pick_deep_caps(s) == "const"
    assert renderer_mod.pick_split(s, deep) == (4, 7, 10, 14)
    assert renderer_mod.pick_split(s, cfg) == 0  # shallow: unsplit
    monkeypatch.setenv("RT_SPLIT", "2")
    assert renderer_mod.pick_split(s, cfg) == 2
    img_split = renderer_mod.render_wavefront(
        s, width=10, height=8, samples=2, cfg=cfg)
    chunk_split = renderer_mod.render_wavefront_chunked(
        s, width=10, height=8, samples=2, cfg=cfg, chunk=1)
    monkeypatch.setenv("RT_NO_SPLIT", "1")
    assert renderer_mod.pick_split(s, cfg) == 0
    img_plain = renderer_mod.render_wavefront(
        s, width=10, height=8, samples=2, cfg=cfg)
    assert img_plain.max() > 0.0
    np.testing.assert_allclose(img_split, img_plain, atol=1e-5)
    np.testing.assert_allclose(chunk_split, img_plain, atol=1e-5)


def test_chunked_split_overflow_falls_back(monkeypatch):
    """The chunked driver's survivor-overflow path: with a pinned tiny
    capacity every chunk overflows, the config is blacklisted, and the
    frame is redone unsplit — same image, never silent radiance loss."""
    from raytrace_tpu import scene as scene_mod
    from raytrace_tpu.ops import megakernel as mk
    import math
    objs = [{"type": "plane", "position": [0, -1.0, 0],
             "normal": [0, 1, 0],
             "material": {"type": "lambertian", "color": [0.6, 0.6, 0.6]}}]
    for i in range(14):
        a = 2 * math.pi * i / 14
        objs.append({"type": "sphere",
                     "position": [2.2 * math.cos(a), 0.0,
                                  2.2 * math.sin(a) - 4], "radius": 0.5,
                     "material": {"type": "glass",
                                  "color": [0.9, 0.9, 0.95]}})
    s, _ = rt.scene_from_dict({
        "camera": {"position": [0, 0.6, 1.5], "aspectRatio": 1.33},
        "objects": objs,
        "lights": [{"type": "point", "position": [4, 8, 4],
                    "color": [1, 1, 1], "intensity": 2.0}]})
    s = scene_mod.with_accel(s, leaf_size=4)
    monkeypatch.setattr(mk, "UNROLL_PRIM_LIMIT", 4)
    monkeypatch.setattr(mk, "MAX_BVH_KERNEL_PRIMS", 8)
    assert mk._kernel_mode(s) == "stream"
    cfg = trace_mod.TraceConfig(max_depth=4, shadow_samples=1)
    monkeypatch.setenv("RT_SPLIT", "2")
    # reference: unsplit frame
    monkeypatch.setenv("RT_NO_SPLIT", "1")
    ref = renderer_mod.render_wavefront_chunked(
        s, width=10, height=8, samples=2, cfg=cfg, chunk=1)
    monkeypatch.delenv("RT_NO_SPLIT")
    # 4-lane capacity: glass keeps far more alive past bounce 2
    monkeypatch.setattr(renderer_mod, "_auto_surv_cap",
                        lambda n, b, frac=None: 4)
    before = len(renderer_mod._SPLIT_BLACKLIST)
    img = renderer_mod.render_wavefront_chunked(
        s, width=10, height=8, samples=2, cfg=cfg, chunk=1)
    assert len(renderer_mod._SPLIT_BLACKLIST) == before + 1
    assert img.max() > 0.0
    np.testing.assert_allclose(img, ref, atol=1e-6)

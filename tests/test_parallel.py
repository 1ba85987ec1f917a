"""Sharding, checkpoint/resume, and distributed-orchestration tests.

Multi-chip behavior is tested on the virtual 8-device CPU mesh (conftest
sets xla_force_host_platform_device_count=8) - the standard way to test
pjit/shard_map semantics without a pod.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import raytrace_tpu as rt
from raytrace_tpu import trace as trace_mod
from raytrace_tpu import parallel


CFG = trace_mod.TraceConfig(max_depth=5, shadow_samples=4)


@pytest.fixture(scope="session")
def small_scene(simple_scene_dict):
    s, _ = rt.scene_from_dict(simple_scene_dict)
    return s


def test_mesh_shapes():
    m = parallel.make_mesh(px=4, sp=2)
    assert dict(m.shape) == {"px": 4, "sp": 2}
    m = parallel.make_mesh()
    assert m.shape["px"] == jax.device_count()
    with pytest.raises(ValueError):
        parallel.make_mesh(px=3, sp=2)


def test_sharded_matches_single_device(small_scene):
    """Same image bits regardless of mesh shape (determinism invariant)."""
    kw = dict(samples=8, cfg=CFG)
    ref = parallel.render_linear_sharded(
        small_scene, 32, 24, mesh=parallel.single_device_mesh(), **kw)
    for px, sp in [(8, 1), (4, 2), (2, 4)]:
        img = parallel.render_linear_sharded(
            small_scene, 32, 24, mesh=parallel.make_mesh(px=px, sp=sp), **kw)
        np.testing.assert_allclose(img, ref, atol=1e-5, rtol=1e-5,
                                   err_msg=f"mesh ({px},{sp})")


def test_sharded_matches_band_renderer(small_scene):
    """The SPMD path agrees with the plain band driver bit-for-bit."""
    r = rt.Renderer()
    r.samples, r.max_depth = 8, 5
    ref = r.render_linear(small_scene, 32, 24)
    img = parallel.render_linear_sharded(
        small_scene, 32, 24, samples=8, cfg=r.trace_config(),
        mesh=parallel.make_mesh())
    np.testing.assert_allclose(img, ref, atol=1e-5, rtol=1e-5)


def test_uneven_pixels_padding(small_scene):
    """Width*band_h not divisible by the shard count still renders right."""
    ref = parallel.render_linear_sharded(
        small_scene, 31, 9, samples=4, cfg=CFG,
        mesh=parallel.single_device_mesh())
    img = parallel.render_linear_sharded(
        small_scene, 31, 9, samples=4, cfg=CFG,
        mesh=parallel.make_mesh(px=8, sp=1))
    np.testing.assert_allclose(img, ref, atol=1e-5, rtol=1e-5)


def test_odd_samples_padding(small_scene):
    """spp not divisible by the sp axis is padded and masked, not dropped."""
    ref = parallel.render_linear_sharded(
        small_scene, 16, 8, samples=5, cfg=CFG,
        mesh=parallel.single_device_mesh())
    img = parallel.render_linear_sharded(
        small_scene, 16, 8, samples=5, cfg=CFG,
        mesh=parallel.make_mesh(px=2, sp=4))
    np.testing.assert_allclose(img, ref, atol=1e-5, rtol=1e-5)


# --- checkpoint / resume ----------------------------------------------------

def test_accumulator_roundtrip(tmp_path):
    acc = parallel.Accumulator.zeros(8, 4, seed=7)
    acc.add(np.full((4, 8, 3), 0.5, np.float32), 10)
    p = str(tmp_path / "ck.npz")
    acc.save(p)
    back = parallel.Accumulator.load(p)
    assert back.samples_done == 10 and back.seed == 7
    np.testing.assert_allclose(back.mean(), 0.5)


def test_checkpointed_render_resumes(small_scene, tmp_path):
    """Interrupted accumulation + resume == uninterrupted accumulation."""
    ckpt = str(tmp_path / "render.npz")

    def fresh():
        r = rt.Renderer()
        r.max_depth = 5
        return r

    full = parallel.render_with_checkpoints(
        fresh(), small_scene, 16, 8, total_samples=8, samples_per_round=4,
        checkpoint_path=None)

    # Round 1 only.
    parallel.render_with_checkpoints(
        fresh(), small_scene, 16, 8, total_samples=4, samples_per_round=4,
        checkpoint_path=ckpt)
    # Resume to 8.
    resumed = parallel.render_with_checkpoints(
        fresh(), small_scene, 16, 8, total_samples=8, samples_per_round=4,
        checkpoint_path=ckpt, resume=True)
    np.testing.assert_allclose(resumed, full, atol=1e-6)


def test_graceful_shutdown_runs_cleanups():
    import signal

    ran = []
    gs = parallel.GracefulShutdown()
    gs.register("first", lambda: ran.append("first"))
    gs.register("second", lambda: ran.append("second"))
    gs.install()
    try:
        with pytest.raises(KeyboardInterrupt):
            os.kill(os.getpid(), signal.SIGINT)
    finally:
        gs.uninstall()
    assert ran == ["second", "first"]  # newest-first, graceful.go ordering


# --- distributed orchestration ---------------------------------------------

def test_node_status_and_heartbeat():
    st = parallel.NodeStatus.collect()
    assert st.process_count == 1 and st.available
    hb = parallel.heartbeat()
    assert hb[0] == 1.0


def test_distributed_renderer_stats(small_scene):
    d = parallel.DistributedRenderer()
    img = d.render_linear(small_scene, 16, 8, samples=4, cfg=CFG)
    assert img.shape == (8, 16, 3)
    s = d.get_stats()
    assert s["completed_jobs"] == 1 and s["success_rate"] == 1.0


def test_resource_manager_close_all_order_and_errors():
    ran = []
    rm = parallel.ResourceManager()
    rm.register("a", lambda: ran.append("a"))
    rm.register("b", lambda: (_ for _ in ()).throw(RuntimeError("boom")))
    rm.register("c", lambda: ran.append("c"))
    errs = rm.close_all()
    assert ran == ["c", "a"]  # newest first
    assert len(errs) == 1 and errs[0][0] == "b"
    assert rm.close_all() == []  # idempotent


def test_context_shutdown_collects_timeouts_and_errors():
    import time as _t
    cs = parallel.ContextShutdown(timeout=0.2)
    cs.register("ok", lambda: None)
    cs.register("err", lambda: (_ for _ in ()).throw(ValueError("x")))
    cs.register("slow", lambda: _t.sleep(5.0))
    errs = dict(cs.shutdown())
    assert "ok" not in errs
    assert isinstance(errs["err"], ValueError)
    assert isinstance(errs["slow"], TimeoutError)


def test_signal_handler_map():
    import signal

    hits = []
    sh = parallel.SignalHandler()
    sh.register(signal.SIGUSR1, lambda: hits.append(1))
    try:
        os.kill(os.getpid(), signal.SIGUSR1)
    finally:
        sh.uninstall()
    assert hits == [1]


def test_sharded_wavefront_matches_jnp():
    """Pixel-sharded compaction + megakernel under shard_map == jnp path."""
    scene, _ = rt.scene_from_dict({
        "camera": {"position": [0, 0, 8], "aspectRatio": 1.33},
        "objects": [
            {"type": "sphere", "position": [0, 0, 0], "radius": 1.0,
             "material": {"type": "metal", "color": [0.8, 0.8, 0.9],
                          "roughness": 0.1}},
            {"type": "sphere", "position": [-2, 0, 0], "radius": 0.7,
             "material": {"type": "glass", "color": [0.8, 0.2, 0.2]}},
        ],
        "lights": [{"type": "point", "position": [5, 5, 5],
                    "color": [1, 1, 1], "intensity": 1.0}],
    })
    cfg = trace_mod.TraceConfig(max_depth=3, shadow_samples=1)
    img, ov = parallel.render_wavefront_sharded(
        scene, width=16, height=16, samples=1, cfg=cfg,
        mesh=parallel.make_mesh(px=8, sp=1))
    assert int(ov) == 0
    r = rt.Renderer()
    r.engine, r.samples, r.max_depth = "jnp", 1, 3
    ref = r.render_linear(scene, 16, 16)
    np.testing.assert_allclose(np.asarray(img), ref, atol=1e-4)


def test_sharded_wavefront_bvh_mode_matches_jnp(monkeypatch):
    """bvh-mode megakernel (wide stack walk + scratch + bounce-2
    survivor split) under shard_map matches the jnp oracle - guards the
    shard_map x scratch_shapes x trace_with_split interaction that the
    small-scene sharded tests never reach."""
    import math
    from raytrace_tpu import scene as scene_mod
    from raytrace_tpu.ops import megakernel as mk
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
    scene, _ = rt.scene_from_dict({
        "camera": {"position": [0, 2, 9], "aspectRatio": 1.0},
        "objects": objs,
        "lights": [{"type": "point", "position": [4, 8, 3],
                    "color": [1, 1, 1], "intensity": 2.0}]})
    scene = scene_mod.with_accel(scene)
    cfg = trace_mod.TraceConfig(max_depth=6, shadow_samples=2)
    monkeypatch.setattr(mk, "UNROLL_PRIM_LIMIT", 8)
    assert mk._kernel_mode(scene) == "bvh"
    from raytrace_tpu import renderer as renderer_mod
    monkeypatch.setenv("RT_SPLIT", "2")
    assert renderer_mod.pick_split(scene, cfg) == 2
    img, ov = parallel.render_wavefront_sharded(
        scene, width=8, height=8, samples=1, cfg=cfg,
        mesh=parallel.make_mesh(px=8, sp=1), px_capacity=8)
    assert int(ov) == 0
    pix = jnp.arange(64, dtype=jnp.uint32)
    samp = jnp.zeros(64, dtype=jnp.uint32)
    o, d = renderer_mod._lane_rays(scene, pix, samp, width=8, height=8,
                                   cfg=cfg, go_camera=True)
    ref = np.asarray(trace_mod.trace(scene, o, d, pix, samp, cfg)
                     ).reshape(8, 8, 3)
    assert ref.max() > 0.0
    np.testing.assert_allclose(np.asarray(img), ref, atol=1e-4)


def test_sharded_wavefront_overflow_detected():
    scene, _ = rt.scene_from_dict({
        "camera": {"position": [0, 0, 3], "aspectRatio": 1.0},
        "objects": [{"type": "sphere", "position": [0, 0, 0],
                     "radius": 1.0,
                     "material": {"type": "lambertian",
                                  "color": [0.5, 0.5, 0.5]}}],
        "lights": [{"type": "point", "position": [0, 5, 5],
                    "color": [1, 1, 1], "intensity": 2.0}],
    })
    cfg = trace_mod.TraceConfig(max_depth=2, shadow_samples=1)
    # capacity 1 pixel/device but the sphere covers many: must overflow
    _, ov = parallel.render_wavefront_sharded(
        scene, width=16, height=16, samples=1, cfg=cfg,
        mesh=parallel.make_mesh(px=8, sp=1), px_capacity=1)
    assert int(ov) > 0


def test_elastic_rerender_missing_rows(small_scene):
    """A 'failed worker' loses rows; re-rendering just those rows on a
    survivor reproduces the full image exactly (counter-RNG determinism)."""
    r = rt.Renderer()
    r.samples, r.max_depth = 4, 5
    full = r.render_linear(small_scene, 16, 12)

    damaged = full.copy()
    damaged[3:7] = -1.0  # rows 3..6 lost
    fixed = parallel.rerender_missing_rows(
        r, small_scene, damaged, [3, 4, 5, 6], 16, 12)
    np.testing.assert_array_equal(fixed, full)

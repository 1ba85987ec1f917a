"""Staged pipeline: stage contracts + equivalence with the fused trace."""

import numpy as np
import jax.numpy as jnp
import pytest

import raytrace_tpu as rt
from raytrace_tpu import pipeline, trace as trace_mod


@pytest.fixture(scope="module")
def scene(simple_scene_dict):
    s, _ = rt.scene_from_dict(simple_scene_dict)
    return s


CFG = trace_mod.TraceConfig(max_depth=3, shadow_samples=2)
W, H, SPP = 12, 8, 2


def test_stages_compose(scene):
    n_px = W * H
    pix = jnp.repeat(jnp.arange(n_px, dtype=jnp.uint32), SPP)
    samp = jnp.tile(jnp.arange(SPP, dtype=jnp.uint32), n_px)
    rays = pipeline.generate_rays(scene, pix, samp, width=W, height=H,
                                  cfg=CFG)
    assert rays.origin.shape == (n_px * SPP, 3)
    hit = pipeline.intersect_rays(scene, rays)
    assert bool(hit.hit.any())
    sh = pipeline.shade_hits(scene, rays, hit, bounce=0, cfg=CFG)
    assert np.isfinite(np.asarray(sh.radiance)).all()
    # shaded radiance is nonzero where something was hit and lit
    assert float(jnp.sum(sh.radiance)) > 0


def test_pipeline_matches_fused_trace(scene):
    # run_pipeline drives generate -> (intersect -> shade)*depth as real
    # stages (pipeline.py run_pipeline); equality with the fused engine
    # fails if any stage is broken.
    img = np.asarray(pipeline.run_pipeline(
        scene, width=W, height=H, samples=SPP, cfg=CFG))
    r = rt.Renderer()
    r.engine, r.samples, r.max_depth = "jnp", SPP, 3
    ref = r.render_linear(scene, W, H)
    np.testing.assert_allclose(img, ref, atol=1e-5)


def test_staged_multibounce_carry_matches_trace(scene):
    """Hand-driven stage composition: intersect/shade per bounce with
    carried throughput/radiance/alive equals trace.trace at that depth."""
    n_px = W * H
    pix = jnp.repeat(jnp.arange(n_px, dtype=jnp.uint32), SPP)
    samp = jnp.tile(jnp.arange(SPP, dtype=jnp.uint32), n_px)
    rays = pipeline.generate_rays(scene, pix, samp, width=W, height=H,
                                  cfg=CFG)
    thr = rad = alive = None
    cur = rays
    for b in range(CFG.max_depth):
        hit = pipeline.intersect_rays(scene, cur)
        sh = pipeline.shade_hits(scene, cur, hit, bounce=b, cfg=CFG,
                                 throughput=thr, radiance=rad, alive=alive)
        thr, rad, alive = sh.throughput, sh.radiance, sh.alive
        cur = sh.next_rays
    ref = trace_mod.trace(scene, rays.origin, rays.direction, pix, samp,
                          CFG)
    np.testing.assert_allclose(np.asarray(rad), np.asarray(ref), atol=1e-6)
    # and the shade stage really consumed the intersect stage's output: a
    # corrupted hit changes the image.
    hit0 = pipeline.intersect_rays(scene, rays)
    broken = hit0._replace(hit=jnp.zeros_like(hit0.hit))
    sh0 = pipeline.shade_hits(scene, rays, broken, bounce=0, cfg=CFG)
    assert float(jnp.abs(sh0.radiance).sum()) == 0.0


def test_adaptive_pipeline_accumulates(scene):
    r = rt.Renderer()
    r.max_depth = 3
    # Pin the controller to fixed 2-sample batches so the round
    # boundaries (and thus the per-round seed offsets) are deterministic.
    ap = pipeline.AdaptivePipeline(target_seconds=0.05, batch=2,
                                   min_batch=2, max_batch=2)
    img = ap.render(r, scene, W, H, total_samples=6)
    assert img.shape == (H, W, 3)
    # Same seed-offset-per-round convention as the checkpointing renderer
    # (parallel/checkpoint.py render_with_checkpoints): with matching
    # round boundaries the accumulations are identical.
    from raytrace_tpu.parallel import render_with_checkpoints
    r2 = rt.Renderer()
    r2.max_depth = 3
    ref = render_with_checkpoints(r2, scene, W, H, total_samples=6,
                                  samples_per_round=2)
    assert np.isfinite(img).all() and img.max() > 0
    np.testing.assert_allclose(img, ref, rtol=1e-6, atol=1e-7)
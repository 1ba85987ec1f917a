"""Staged render pipeline: the working form of internal/pipeline.

The reference's 3-stage channel pipeline (render_pipeline.go:33-97,
raygen -> intersect -> shade with 4/8/4 workers and 1000-deep channels)
was a stub: every stage emitted constants after a sleep (:109-180). On a
TPU the stages are ARRAY TRANSFORMS, not queue consumers - the "channel"
between stages is an array handed from one jitted stage to the next, and
stage-level parallelism is the SPMD width of each op. This module exposes
that decomposition explicitly for users who want stage-by-stage access
(debugging, custom shading experiments, visualizing intermediates); the
production path (trace.py / ops/megakernel.py) fuses all stages into one
bounded loop because handing rays through HBM between stages is exactly
the bandwidth pattern the megakernel exists to avoid.

Stage contracts (all shape-polymorphic over a flat lane batch B):
  generate_rays  (scene, pix, samp)            -> RayBatch
  intersect_rays (scene, RayBatch)             -> intersect.Hit
  shade_hits     (scene, RayBatch, Hit, bounce)-> ShadeResult
  assemble_image (radiance, n_px, samples)     -> (H, W, 3)

``AdaptivePipeline`` (render_pipeline.go:264-296 had an empty adjustment
body) is realized as real feedback: it tunes the sample batch size to hit
a target per-stage wall time.
"""

from __future__ import annotations

import dataclasses
import time
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from . import renderer as renderer_mod
from . import rng
from . import trace as trace_mod
from .models import materials as mat_mod
from .ops import intersect, shade


class RayBatch(NamedTuple):
    origin: jax.Array     # (B,3)
    direction: jax.Array  # (B,3)
    pix_id: jax.Array     # (B,) uint32
    samp_id: jax.Array    # (B,) uint32


class ShadeResult(NamedTuple):
    radiance: jax.Array     # (B,3) emitted + weighted direct light
    throughput: jax.Array   # (B,3) attenuation * reflection weight
    next_rays: RayBatch     # scattered continuation rays
    alive: jax.Array        # (B,) lanes that scattered


def generate_rays(scene, pix_id, samp_id, *, width: int, height: int,
                  cfg: Optional[trace_mod.TraceConfig] = None,
                  go_camera: bool = True) -> RayBatch:
    """Stage 1: camera rays with sub-pixel jitter (raygen stage,
    render_pipeline.go:109-122)."""
    cfg = cfg or trace_mod.TraceConfig()
    o, d = renderer_mod._lane_rays(scene, pix_id, samp_id, width=width,
                                   height=height, cfg=cfg,
                                   go_camera=go_camera)
    return RayBatch(o, d, pix_id, samp_id)


def intersect_rays(scene, rays: RayBatch, t_min: float = 1e-3):
    """Stage 2: closest-hit over the whole scene (intersect stage,
    render_pipeline.go:137-152)."""
    return intersect.closest_hit(scene.geometry, rays.origin,
                                 rays.direction, t_min=t_min)


def shade_hits(scene, rays: RayBatch, hit, bounce: int = 0, *,
               cfg: Optional[trace_mod.TraceConfig] = None,
               throughput=None, radiance=None,
               alive=None) -> ShadeResult:
    """Stage 3: one shading evaluation (shade stage,
    render_pipeline.go:167-180) - emitted + tier-weighted direct light,
    plus the scattered continuation rays for the next pipeline round.

    throughput/radiance/alive carry the wavefront state between bounce
    rounds (defaults = a fresh bounce-0 wavefront). `hit` is the intersect
    stage's output for `rays` and is NOT recomputed here - breaking the
    intersect stage breaks shading, as a real pipeline requires.
    """
    cfg = cfg or trace_mod.TraceConfig()
    st = trace_mod._State(
        origin=rays.origin, direction=rays.direction,
        throughput=(jnp.ones_like(rays.origin)
                    if throughput is None else throughput),
        radiance=(jnp.zeros_like(rays.origin)
                  if radiance is None else radiance),
        alive=(jnp.ones(rays.origin.shape[:-1], bool)
               if alive is None else alive))
    out = trace_mod._bounce_body(scene, rays.pix_id, rays.samp_id, cfg,
                                 jnp.int32(bounce), st, hit=hit)
    return ShadeResult(
        radiance=out.radiance,
        throughput=out.throughput,
        next_rays=RayBatch(out.origin, out.direction, rays.pix_id,
                           rays.samp_id),
        alive=out.alive)


def assemble_image(radiance, *, width: int, height: int, samples: int):
    """Stage 4: per-pixel mean over samples (assembler,
    render_pipeline.go:185-221 batched 1000 pixels; here one reshape)."""
    n_px = width * height
    return (jnp.asarray(radiance).reshape(n_px, samples, 3)
            .mean(axis=1).reshape(height, width, 3))


def run_pipeline(scene, *, width: int, height: int, samples: int,
                 cfg: Optional[trace_mod.TraceConfig] = None,
                 go_camera: bool = True):
    """Drive the staged pipeline to a full image.

    A REAL per-bounce stage loop - generate once, then up to
    cfg.max_depth rounds of intersect_rays -> shade_hits with
    throughput/radiance/alive carried through ShadeResult, then
    assemble. Equivalent to trace.trace (same bounce math, the intersect
    stage feeding the shade stage explicitly); each stage crosses HBM,
    so it is slower than the fused engines by design - its value is
    inspectability (every stage's output is a plain array) and being the
    working form of the reference's stub pipeline
    (render_pipeline.go:33-97).
    """
    cfg = cfg or trace_mod.TraceConfig()
    n_px = width * height
    pix = jnp.repeat(jnp.arange(n_px, dtype=jnp.uint32), samples)
    samp = jnp.tile(jnp.arange(samples, dtype=jnp.uint32), n_px)
    rays = generate_rays(scene, pix, samp, width=width, height=height,
                         cfg=cfg, go_camera=go_camera)
    throughput = radiance = alive = None
    cur = rays
    for bounce in range(cfg.max_depth):
        hit = intersect_rays(scene, cur)
        sh = shade_hits(scene, cur, hit, bounce=bounce, cfg=cfg,
                        throughput=throughput, radiance=radiance,
                        alive=alive)
        throughput, radiance, alive = sh.throughput, sh.radiance, sh.alive
        cur = sh.next_rays
        # Host-visible early exit: fine for an inspectable driver (the
        # fused engines keep this test on device).
        if not bool(jnp.any(alive)):
            break
    return assemble_image(radiance, width=width, height=height,
                          samples=samples)


@dataclasses.dataclass
class AdaptivePipeline:
    """Feedback-tuned batching (the real form of render_pipeline.go:264-296,
    whose 5s-ticker adjustment body was empty).

    Renders in sample-batches, measuring each batch and resizing the next
    toward `target_seconds` per batch - useful for progressive preview
    loops where a UI wants steady frame pacing.
    """

    target_seconds: float = 0.5
    min_batch: int = 1
    max_batch: int = 64
    batch: int = 4

    def render(self, renderer, scene, width: int, height: int,
               total_samples: int):
        from .parallel import Accumulator
        acc = Accumulator.zeros(width, height, renderer.seed)
        saved = renderer.samples, renderer.seed
        try:
            while acc.samples_done < total_samples:
                n = min(self.batch, total_samples - acc.samples_done)
                renderer.samples = n
                renderer.seed = saved[1] + acc.samples_done
                t0 = time.perf_counter()
                band = renderer.render_linear(scene, width, height)
                dt = max(time.perf_counter() - t0, 1e-6)
                acc.add(band, n)
                # proportional controller toward the target batch time
                scale = self.target_seconds / dt
                self.batch = int(np.clip(round(self.batch * scale),
                                         self.min_batch, self.max_batch))
        finally:
            renderer.samples, renderer.seed = saved
        return acc.mean()

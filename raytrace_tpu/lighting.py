"""Light types + local illumination models: working internal/lighting.

The reference module compiled but was imported by nothing and defined its
own duplicate Ray/HitRecord/Scene types disconnected from the renderer
(lighting.go:340-357); its GlobalIllumination.traceRay stub returned black
(:359-361). This module implements the same surface against the REAL scene
types, vectorized:

  * PointLight with constant/linear/quadratic attenuation 1.0/0.09/0.032
    (lighting.go:17-71);
  * DirectionalLight (:73-109), AreaLight with N jittered samples
    (:111-155), SpotLight with inner/outer cutoff smoothing (:157-214);
  * Phong (:220-251) and Blinn-Phong (:253-284) shading models;
  * GlobalIllumination: N-sample ambient occlusion (:302-320) and
    one-bounce indirect that ACTUALLY traces (the reference stub returned
    black, :322-338).

All quantities are jnp arrays batched over a leading lane shape.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax.numpy as jnp

from . import rng
from .ops import intersect


def _norm(v):
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return jnp.where(n > 0, v / jnp.where(n > 0, n, 1), 0.0)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


@dataclasses.dataclass(frozen=True)
class LightSample:
    """Per-lane light sample: direction TO the light, distance,
    incident radiance (color * attenuated intensity)."""

    direction: jnp.ndarray  # (B,3) unit
    distance: jnp.ndarray   # (B,)
    radiance: jnp.ndarray   # (B,3)


class PointLight:
    """lighting.go:17-71: 1/(c + l d + q d^2) attenuation."""

    def __init__(self, position, color=(1, 1, 1), intensity=1.0,
                 constant=1.0, linear=0.09, quadratic=0.032):
        self.position = jnp.asarray(position, jnp.float32)
        self.color = jnp.asarray(color, jnp.float32)
        self.intensity = float(intensity)
        self.constant, self.linear, self.quadratic = (
            float(constant), float(linear), float(quadratic))

    def sample(self, point, pix_id=None, samp_id=None, seed=0):
        to_l = self.position - point
        dist = jnp.linalg.norm(to_l, axis=-1)
        att = 1.0 / (self.constant + self.linear * dist
                     + self.quadratic * dist * dist)
        rad = self.color * (self.intensity * att)[..., None]
        return LightSample(_norm(to_l), dist, rad)


class DirectionalLight:
    """lighting.go:73-109: constant direction, no falloff."""

    def __init__(self, direction, color=(1, 1, 1), intensity=1.0):
        self.direction = jnp.asarray(direction, jnp.float32)
        self.color = jnp.asarray(color, jnp.float32)
        self.intensity = float(intensity)

    def sample(self, point, pix_id=None, samp_id=None, seed=0):
        d = -_norm(self.direction)  # toward the light
        B = point.shape[:-1]
        return LightSample(
            jnp.broadcast_to(d, point.shape),
            jnp.full(B, 1e8, jnp.float32),
            jnp.broadcast_to(self.color * self.intensity, point.shape))


class AreaLight:
    """lighting.go:111-155: rectangular emitter, N jittered samples.

    sample() returns ONE stochastic sample (use the counter RNG streams to
    draw several and average - the associative-MC form of the reference's
    internal 16-sample loop)."""

    def __init__(self, position, u_edge, v_edge, color=(1, 1, 1),
                 intensity=1.0, samples=16):
        self.position = jnp.asarray(position, jnp.float32)
        self.u_edge = jnp.asarray(u_edge, jnp.float32)
        self.v_edge = jnp.asarray(v_edge, jnp.float32)
        self.color = jnp.asarray(color, jnp.float32)
        self.intensity = float(intensity)
        self.samples = int(samples)

    def sample(self, point, pix_id=None, samp_id=None, seed=0, stream=0):
        if pix_id is None:
            u = v = 0.5
            pos = self.position + 0.5 * self.u_edge + 0.5 * self.v_edge
            pos = jnp.broadcast_to(pos, point.shape)
        else:
            u, v, _, _ = rng.uniform4(pix_id, samp_id, stream, seed)
            pos = (self.position + u[..., None] * self.u_edge
                   + v[..., None] * self.v_edge)
        to_l = pos - point
        dist = jnp.linalg.norm(to_l, axis=-1)
        att = 1.0 / jnp.maximum(dist * dist, 1e-6)
        rad = self.color * (self.intensity * att)[..., None]
        return LightSample(_norm(to_l), dist, rad)

    def integrate(self, point, pix_id=None, samp_id=None, seed=0,
                  stream_base=0, geom=None, accel=None):
        """N-sample area-light integration (the use the reference's
        ``Samples: 16`` field advertised but never got, lighting.go:111-126).

        Averages ``self.samples`` jittered emitter samples; with ``geom``
        each sample is also visibility-tested (a real soft shadow from an
        area emitter). Returns a LightSample whose radiance is the
        integrated incident radiance and whose direction/distance point at
        the emitter center (for the caller's cosine/specular terms).
        """
        total = jnp.zeros(point.shape, jnp.float32)
        for s in range(self.samples):
            ls = self.sample(point, pix_id, samp_id, seed,
                             stream=stream_base + s)
            contrib = ls.radiance
            if geom is not None:
                blocked = intersect.any_hit(geom, point, ls.direction,
                                            1e-3, ls.distance, accel=accel)
                contrib = jnp.where(blocked[..., None], 0.0, contrib)
            total = total + contrib
        center = self.sample(point)  # deterministic center sample
        return LightSample(center.direction, center.distance,
                           total / float(self.samples))


class SpotLight:
    """lighting.go:157-214: cone with smooth inner/outer cutoff."""

    def __init__(self, position, direction, color=(1, 1, 1),
                 intensity=1.0, inner_cutoff_deg=12.5,
                 outer_cutoff_deg=17.5):
        self.position = jnp.asarray(position, jnp.float32)
        self.direction = _norm(jnp.asarray(direction, jnp.float32))
        self.color = jnp.asarray(color, jnp.float32)
        self.intensity = float(intensity)
        self.cos_inner = float(np.cos(np.radians(inner_cutoff_deg)))
        self.cos_outer = float(np.cos(np.radians(outer_cutoff_deg)))

    def sample(self, point, pix_id=None, samp_id=None, seed=0):
        to_l = self.position - point
        dist = jnp.linalg.norm(to_l, axis=-1)
        ldir = _norm(to_l)
        cos_theta = _dot(-ldir, self.direction)
        t = jnp.clip((cos_theta - self.cos_outer)
                     / max(self.cos_inner - self.cos_outer, 1e-6),
                     0.0, 1.0)
        att = t * t * (3.0 - 2.0 * t) / jnp.maximum(dist * dist, 1e-6)
        rad = self.color * (self.intensity * att)[..., None]
        return LightSample(ldir, dist, rad)


# ---------------------------------------------------------------------------
# Shading models (lighting.go:220-284)
# ---------------------------------------------------------------------------

def phong(normal, view_dir, light: LightSample, albedo,
          ambient=0.1, diffuse_k=1.0, specular_k=0.5, shininess=32.0):
    """Phong: ambient + diffuse + specular around the REFLECTED ray."""
    n = _norm(normal)
    v = _norm(view_dir)
    l = light.direction
    ndotl = jnp.maximum(0.0, _dot(n, l))
    refl = _norm(2.0 * ndotl[..., None] * n - l)
    spec = jnp.power(jnp.maximum(0.0, _dot(refl, v)), shininess)
    return (albedo * ambient
            + albedo * light.radiance * (diffuse_k * ndotl)[..., None]
            + light.radiance * (specular_k * spec)[..., None])


def blinn_phong(normal, view_dir, light: LightSample, albedo,
                ambient=0.1, diffuse_k=1.0, specular_k=0.5,
                shininess=32.0):
    """Blinn-Phong: specular around the HALF vector (lighting.go:253-284;
    this is the model the live renderer's specular term uses,
    renderer.go:278-292)."""
    n = _norm(normal)
    v = _norm(view_dir)
    l = light.direction
    h = _norm(l + v)
    ndotl = jnp.maximum(0.0, _dot(n, l))
    spec = jnp.power(jnp.maximum(0.0, _dot(n, h)), shininess)
    return (albedo * ambient
            + albedo * light.radiance * (diffuse_k * ndotl)[..., None]
            + light.radiance * (specular_k * spec)[..., None])


# ---------------------------------------------------------------------------
# Global illumination helpers (lighting.go:302-338, now actually tracing)
# ---------------------------------------------------------------------------

def ambient_occlusion(geom, point, normal, pix_id, samp_id, *,
                      samples: int = 16, radius: float = 1.0,
                      seed: int = 0, stream_base: int = 100):
    """Fraction of the hemisphere NOT blocked within `radius`
    (lighting.go:302-320, with real occlusion tests)."""
    unblocked = jnp.zeros(point.shape[:-1], jnp.float32)
    for s in range(samples):
        ball = rng.unit_ball(pix_id, samp_id, stream_base + s, seed)
        d = _norm(normal + ball)  # cosine-ish hemisphere
        blocked = intersect.any_hit(geom, point, d, 1e-3, radius)
        unblocked += jnp.where(blocked, 0.0, 1.0)
    return unblocked / samples


def one_bounce_indirect(scene, point, normal, pix_id, samp_id, *,
                        samples: int = 8, seed: int = 0,
                        stream_base: int = 200, cfg=None):
    """One-bounce indirect lighting by ACTUALLY tracing (the reference's
    traceRay stub returned black, lighting.go:359-361)."""
    from . import trace as trace_mod
    cfg = cfg or trace_mod.TraceConfig(max_depth=2, shadow_samples=4)
    total = jnp.zeros(point.shape, jnp.float32)
    for s in range(samples):
        ball = rng.unit_ball(pix_id, samp_id, stream_base + s, seed)
        d = _norm(normal + ball)
        rad = trace_mod.trace(scene, point, d, pix_id, samp_id, cfg)
        total = total + rad
    return total / samples

"""Sky / atmosphere: the working form of internal/atmosphere (dead code).

The reference module never compiled (it calls FastVec3Normalize/Lerp/Dot/
MulScalar which do not exist - SURVEY.md §2.3); its intent (atmosphere.go:
100-135) was: vertical sky gradient + scattering-color lerp by
exp(-y*depth) + a sun disk with pow-1.5 edge falloff + time-of-day
darkening + fog lerp + clamp to [0.1, 0.98]. This module implements that
recipe as vectorized jnp ops, plus physically-based Rayleigh/Mie phase
functions (atmospheric_effects.go:40-69) used by the volumetric raymarch
in effects.py.

All functions are shape-polymorphic over a leading batch shape; colors
are (...,3) linear float arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AtmosphereSettings:
    """Preset parameters (atmosphere.go:18-26 struct fields)."""

    horizon_color: tuple = (0.8, 0.85, 0.95)
    zenith_color: tuple = (0.35, 0.55, 0.95)
    scattering_color: tuple = (0.7, 0.8, 1.0)
    sun_direction: tuple = (0.3, 0.8, 0.5)
    sun_color: tuple = (1.0, 0.95, 0.8)
    sun_intensity: float = 1.0
    sun_size: float = 0.04
    atmosphere_depth: float = 1.2
    time_of_day: float = 1.0   # 1 = noon, 0 = night
    fog_color: tuple = (0.75, 0.78, 0.82)
    fog_amount: float = 0.0


def presets() -> Dict[str, AtmosphereSettings]:
    """Default/White/Sunset/Night (atmosphere.go:28-98)."""
    return {
        "default": AtmosphereSettings(),
        "white": AtmosphereSettings(
            horizon_color=(0.95, 0.95, 0.95),
            zenith_color=(0.85, 0.85, 0.9),
            scattering_color=(0.9, 0.9, 0.95),
            sun_intensity=0.8),
        "sunset": AtmosphereSettings(
            horizon_color=(0.98, 0.55, 0.3),
            zenith_color=(0.3, 0.25, 0.5),
            scattering_color=(0.95, 0.6, 0.4),
            sun_direction=(0.7, 0.12, 0.3),
            sun_color=(1.0, 0.6, 0.3),
            sun_size=0.08, time_of_day=0.35),
        "night": AtmosphereSettings(
            horizon_color=(0.08, 0.1, 0.18),
            zenith_color=(0.01, 0.015, 0.05),
            scattering_color=(0.1, 0.12, 0.25),
            sun_color=(0.8, 0.85, 1.0),
            sun_intensity=0.15, sun_size=0.015, time_of_day=0.05),
    }


def _norm(v):
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return jnp.where(n > 0, v / jnp.where(n > 0, n, 1), 0.0)


def get_sky_color(direction, settings: AtmosphereSettings):
    """GetSkyColor (atmosphere.go:100-135), vectorized.

    direction: (...,3) ray directions (not necessarily normalized).
    Returns (...,3) colors clamped to [0.1, 0.98] (the reference's odd
    final clamp, atmosphere.go:133-134).
    """
    d = _norm(jnp.asarray(direction, jnp.float32))
    y = jnp.clip(d[..., 1], -1.0, 1.0)

    horizon = jnp.asarray(settings.horizon_color, jnp.float32)
    zenith = jnp.asarray(settings.zenith_color, jnp.float32)
    scat = jnp.asarray(settings.scattering_color, jnp.float32)
    sun_c = jnp.asarray(settings.sun_color, jnp.float32)
    sun_d = _norm(jnp.asarray(settings.sun_direction, jnp.float32))

    # vertical gradient: horizon at y=0, zenith at y=1
    t = jnp.clip(y, 0.0, 1.0)[..., None]
    sky = horizon + (zenith - horizon) * t

    # scattering lerp by exp(-y * depth)
    s = jnp.exp(-jnp.abs(y) * settings.atmosphere_depth)[..., None]
    sky = sky + (scat - sky) * s * 0.5

    # sun disk with pow-1.5 edge falloff
    cos_sun = jnp.sum(d * sun_d, axis=-1)
    edge = jnp.clip((cos_sun - (1.0 - settings.sun_size))
                    / settings.sun_size, 0.0, 1.0)
    sun_term = jnp.power(edge, 1.5)[..., None] * settings.sun_intensity
    sky = sky + sun_c * sun_term

    # time-of-day darkening
    sky = sky * (0.15 + 0.85 * settings.time_of_day)

    # fog lerp
    if settings.fog_amount > 0.0:
        fog = jnp.asarray(settings.fog_color, jnp.float32)
        sky = sky + (fog - sky) * settings.fog_amount

    return jnp.clip(sky, 0.1, 0.98)


def atmospheric_attenuation(distance):
    """GetAtmosphericAttenuation (atmosphere.go:137-143):
    exp(-0.1 d) * exp(-0.05 d)."""
    d = jnp.asarray(distance, jnp.float32)
    return jnp.exp(-0.1 * d) * jnp.exp(-0.05 * d)


# ---------------------------------------------------------------------------
# Physically-based scattering (atmospheric_effects.go:40-73)
# ---------------------------------------------------------------------------

# Rayleigh scattering coefficients at sea level, 1e-6 m^-1 per channel
# (atmospheric_effects.go:44: 5.802, 13.558, 33.1).
RAYLEIGH_BETA = np.array([5.802e-6, 13.558e-6, 33.1e-6], np.float32)
MIE_BETA = np.float32(3.996e-6)


def rayleigh_phase(cos_theta):
    """3/(16 pi) (1 + cos^2) (atmospheric_effects.go:49-55)."""
    c = jnp.asarray(cos_theta, jnp.float32)
    return np.float32(3.0 / (16.0 * np.pi)) * (1.0 + c * c)


def henyey_greenstein_phase(cos_theta, g: float = 0.9):
    """Mie phase via Henyey-Greenstein (atmospheric_effects.go:57-69)."""
    c = jnp.asarray(cos_theta, jnp.float32)
    g = np.float32(g)
    g2 = g * g
    denom = jnp.power(1.0 + g2 - 2.0 * g * c, 1.5)
    return np.float32(1.0 / (4.0 * np.pi)) * (1.0 - g2) / jnp.maximum(
        denom, 1e-8)


def height_density(h, scale_height: float = 8000.0):
    """Exponential density falloff with altitude
    (atmospheric_effects.go:71-73)."""
    return jnp.exp(-jnp.asarray(h, jnp.float32) / scale_height)


def apply_sky_to_image(scene, linear_img, width: int, height: int,
                       settings: AtmosphereSettings, go_camera=True,
                       cfg=None):
    """Composite sky color into miss pixels of a rendered linear image.

    The reference renderer returns black on miss (renderer.go:170-173;
    its skyColor helper is never called, :369-371). When an atmosphere
    block is active the sky replaces those black miss pixels. A pixel is
    a miss iff its primary any-hit fails for the CENTER ray.
    """
    import jax
    from . import camera as cam_mod
    from .ops import intersect

    n_px = width * height
    xs = (jnp.arange(n_px, dtype=jnp.float32) % width + 0.5) / width
    ys = (jnp.arange(n_px, dtype=jnp.float32) // width + 0.5) / height
    rays = cam_mod.go_rays if go_camera else cam_mod.lookat_rays
    o, d = rays(scene.camera, xs, ys)
    hit = intersect.any_hit(scene.geometry, o, d, 1e-3, intersect.BIG)
    sky = get_sky_color(d, settings).reshape(height, width, 3)
    img = jnp.asarray(linear_img)
    return jnp.where(hit.reshape(height, width, 1), img, sky)


def settings_from_config(block: Dict) -> AtmosphereSettings:
    """Build settings from a scene-JSON 'atmospheric' block (the schema
    the Go loader silently drops, scene.go:12-16)."""
    base = presets().get(str(block.get("preset", "default")).lower(),
                         AtmosphereSettings())
    fields = {}
    for key, attr in [("horizonColor", "horizon_color"),
                      ("zenithColor", "zenith_color"),
                      ("scatteringColor", "scattering_color"),
                      ("sunDirection", "sun_direction"),
                      ("sunColor", "sun_color")]:
        if key in block:
            fields[attr] = tuple(float(x) for x in block[key])
    for key, attr in [("sunIntensity", "sun_intensity"),
                      ("sunSize", "sun_size"),
                      ("atmosphereDepth", "atmosphere_depth"),
                      ("timeOfDay", "time_of_day"),
                      ("fogAmount", "fog_amount")]:
        if key in block:
            fields[attr] = float(block[key])
    if "fogColor" in block:
        fields["fog_color"] = tuple(float(x) for x in block["fogColor"])
    return dataclasses.replace(base, **fields)

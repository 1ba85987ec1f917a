"""Procedural animated emitters: working internal/effects/spectacular.

The reference defined ten sine/cos-noise emitters (spectacular_effects.go,
imported by nothing): Fire (:8-66), Explosion (:68-109), Lightning
(:111-139), Aurora (:141-179), Hologram (:181-228), Portal (:230-275),
EnergyField (:277-320), Plasma (:322-366), Crystal (:368-406), Nebula
(:408-448). Each returns an emissive color for a (position, time) pair;
here they are vectorized over (...,3) position arrays and use the real
value-noise from fastmath (the reference's 'noise' was bare sines).

Use: attach as an emission field - e.g. evaluate at hit points of a
DiffuseLight-material object and add to `emit`.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import fastmath as fm


def _p3(p):
    p = jnp.asarray(p, jnp.float32)
    return p[..., 0], p[..., 1], p[..., 2]


def _mix(a, b, t):
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    return a + (b - a) * t[..., None]


def fire(p, t=0.0, intensity: float = 1.0):
    """Rising turbulent flame: hot core -> orange -> dark red."""
    x, y, z = _p3(p)
    n = fm.fbm_3d(x * 2.0, y * 2.0 - 2.0 * t, z * 2.0, octaves=3)
    heat = jnp.clip(n + 0.6 - 0.5 * jnp.clip(y, 0.0, 2.0), 0.0, 1.0)
    c = _mix(_mix((0.1, 0.0, 0.0), (1.0, 0.35, 0.05), heat),
             (1.0, 0.9, 0.4), jnp.clip(heat - 0.6, 0.0, 0.4) * 2.5)
    return c * (intensity * heat)[..., None]


def explosion(p, t=0.25, intensity: float = 2.0):
    """Expanding shock shell around the origin at time t."""
    x, y, z = _p3(p)
    r = jnp.sqrt(x * x + y * y + z * z)
    shell_r = 2.0 * t
    shell = jnp.exp(-12.0 * (r - shell_r) ** 2)
    core = jnp.exp(-3.0 * r * r) * jnp.maximum(0.0, 1.0 - 2.0 * t)
    n = fm.fast_noise_3d(x * 4.0, y * 4.0, z * 4.0)
    glow = (shell * (0.7 + 0.3 * n) + core)
    c = _mix((1.0, 0.4, 0.05), (1.0, 0.95, 0.7), jnp.clip(glow, 0, 1))
    return c * (intensity * glow)[..., None]


def lightning(p, t=0.0, intensity: float = 3.0):
    """Jittering bolt along the y axis."""
    x, y, z = _p3(p)
    wob = (fm.fast_noise_2d(y * 3.0, jnp.full_like(y, t * 7.0)) - 0.5)
    dist = jnp.sqrt((x - 0.4 * wob) ** 2 + z * z)
    bolt = jnp.exp(-60.0 * dist * dist)
    flicker = 0.7 + 0.3 * jnp.sin(t * 60.0)
    c = jnp.asarray([0.75, 0.85, 1.0], jnp.float32)
    return c * (intensity * flicker * bolt)[..., None]


def aurora(p, t=0.0, intensity: float = 0.8):
    """Curtains: green -> violet bands drifting with time."""
    x, y, z = _p3(p)
    band = jnp.sin(x * 1.5 + fm.fast_noise_2d(x, jnp.full_like(x, t))
                   * 4.0 + z)
    strength = jnp.clip(band, 0.0, 1.0) * jnp.exp(
        -0.3 * jnp.abs(y - 3.0))
    c = _mix((0.05, 0.8, 0.35), (0.5, 0.2, 0.8),
             jnp.clip(y * 0.2, 0.0, 1.0))
    return c * (intensity * strength)[..., None]


def hologram(p, t=0.0, intensity: float = 1.0):
    """Cyan scanlines + glitch flicker."""
    x, y, z = _p3(p)
    scan = 0.5 + 0.5 * jnp.sin(y * 40.0 - t * 10.0)
    glitch = jnp.where(
        fm.fast_noise_1d(jnp.full_like(y, t * 13.0)) > 0.9,
        0.2, 1.0)
    c = jnp.asarray([0.2, 0.9, 1.0], jnp.float32)
    return c * (intensity * scan * glitch)[..., None]


def portal(p, t=0.0, intensity: float = 1.5):
    """Swirling ring in the x-y plane."""
    x, y, z = _p3(p)
    r = jnp.sqrt(x * x + y * y)
    ang = jnp.arctan2(y, x)
    swirl = 0.5 + 0.5 * jnp.sin(ang * 5.0 + r * 8.0 - t * 4.0)
    ring = jnp.exp(-20.0 * (r - 1.0) ** 2) * jnp.exp(-4.0 * z * z)
    c = _mix((0.4, 0.1, 0.9), (0.1, 0.7, 1.0), swirl)
    return c * (intensity * ring * swirl)[..., None]


def energy_field(p, t=0.0, intensity: float = 0.9):
    """Pulsing shell on the unit sphere."""
    x, y, z = _p3(p)
    r = jnp.sqrt(x * x + y * y + z * z)
    pulse = 0.6 + 0.4 * jnp.sin(t * 6.0 + r * 10.0)
    shell = jnp.exp(-30.0 * (r - 1.0) ** 2)
    hex_n = fm.fast_noise_3d(x * 6.0, y * 6.0, z * 6.0)
    c = jnp.asarray([0.2, 0.6, 1.0], jnp.float32)
    return c * (intensity * shell * pulse * (0.6 + 0.4 * hex_n))[..., None]


def plasma(p, t=0.0, intensity: float = 1.0):
    """Classic three-band interference plasma."""
    x, y, z = _p3(p)
    v = (jnp.sin(x * 3.0 + t) + jnp.sin((y + z) * 2.0 - t)
         + jnp.sin(jnp.sqrt(x * x + y * y + 1.0) * 4.0))
    v = v / 3.0
    r = 0.5 + 0.5 * jnp.sin(np.pi * v)
    g = 0.5 + 0.5 * jnp.sin(np.pi * v + 2.0 * np.pi / 3.0)
    b = 0.5 + 0.5 * jnp.sin(np.pi * v + 4.0 * np.pi / 3.0)
    return jnp.stack([r, g, b], axis=-1) * intensity


def crystal(p, t=0.0, intensity: float = 0.8):
    """Faceted refraction sparkle from quantized normals."""
    x, y, z = _p3(p)
    fx = jnp.floor(x * 4.0) / 4.0
    fy = jnp.floor(y * 4.0) / 4.0
    fz = jnp.floor(z * 4.0) / 4.0
    facet = fm.fast_noise_3d(fx * 50.0, fy * 50.0, fz * 50.0)
    sparkle = jnp.power(facet, 8.0) * (2.0 + jnp.sin(t * 3.0 + facet
                                                     * 20.0))
    c = _mix((0.6, 0.8, 1.0), (1.0, 1.0, 1.0), jnp.clip(sparkle, 0, 1))
    return c * (intensity * (0.2 + sparkle))[..., None]


def nebula(p, t=0.0, intensity: float = 0.6):
    """Multi-color fbm gas clouds."""
    x, y, z = _p3(p)
    d1 = fm.fbm_3d(x, y, z + 0.1 * t, octaves=4)
    d2 = fm.fbm_3d(x * 1.7 + 5.0, y * 1.7, z * 1.7, octaves=4)
    c = _mix(_mix((0.05, 0.02, 0.1), (0.6, 0.2, 0.5), d1),
             (0.2, 0.4, 0.9), d2 * 0.6)
    return c * (intensity * (d1 * 0.7 + d2 * 0.3))[..., None]


ALL_EFFECTS = {
    "fire": fire, "explosion": explosion, "lightning": lightning,
    "aurora": aurora, "hologram": hologram, "portal": portal,
    "energyField": energy_field, "plasma": plasma, "crystal": crystal,
    "nebula": nebula,
}

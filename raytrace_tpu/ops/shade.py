"""Direct lighting + shadows, vectorized (renderer.go:229-331).

All the reference's quirks are intentional parity items:
  * metallic-tiered ambient strength (renderer.go:236-246);
  * per-light diffuse uses the surface albedo only (NOT the light color) and
    a metallic-tiered diffuse strength (renderer.go:262-276);
  * Blinn-Phong specular only when metallic > 0.5, with tiered power
    32/48/64, scaled by intensity * shadow * metallic * 3.0 and the LIGHT
    color (renderer.go:278-292);
  * the "view" direction points from the hit point toward the WORLD ORIGIN,
    not the camera (renderer.go:279) - a bug preserved for parity;
  * shadow factor: one hard shadow ray; if blocked -> 0, else the mean of 16
    soft rays whose directions are lightDir + 0.1 * (unit-ball sample),
    renormalized, tested against the same tMax = light distance
    (renderer.go:299-331);
  * lights closer than 1e-3 are skipped (renderer.go:252-254);
  * 1/d^2 falloff with cosine term (renderer.go:259-260).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import intersect
from .. import rng


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _normalize(v):
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return jnp.where(n > 0.0, v / jnp.where(n > 0.0, n, 1.0), 0.0)


def ambient_strength(metallic):
    """Tiered ambient (renderer.go:236-246)."""
    return jnp.where(metallic > 0.9, 0.05,
           jnp.where(metallic > 0.7, 0.07,
           jnp.where(metallic > 0.5, 0.08, 0.1)))


def diffuse_strength(metallic):
    """Tiered diffuse (renderer.go:262-276)."""
    return jnp.where(metallic > 0.95, 0.05,
           jnp.where(metallic > 0.9, 0.08,
           jnp.where(metallic > 0.8, 0.12,
           jnp.where(metallic > 0.7, 0.15,
           jnp.where(metallic > 0.5, 0.2, 0.25)))))


def specular_power(metallic):
    """Tiered Blinn-Phong exponent (renderer.go:283-288)."""
    return jnp.where(metallic > 0.9, 64.0,
           jnp.where(metallic > 0.8, 48.0, 32.0))


def combine_weights(metallic):
    """Tiered (reflection, direct) combine weights (renderer.go:191-226).

    metallic <= 0.2 falls through to the unweighted combine, i.e. (1, 1).
    """
    refl = jnp.where(metallic > 0.95, 0.85,
           jnp.where(metallic > 0.9, 0.8,
           jnp.where(metallic > 0.8, 0.75,
           jnp.where(metallic > 0.7, 0.7,
           jnp.where(metallic > 0.5, 0.6,
           jnp.where(metallic > 0.2, 0.4, 1.0))))))
    direct = jnp.where(metallic > 0.2, 1.0 - refl, 1.0)
    return refl, direct


def shadow_factor(geom, point, light_pos, light_dist, light_dir,
                  pix_id, samp_id, bounce, light_index, *,
                  soft_shadows=True, shadow_samples=16, seed=0,
                  accel=None):
    """calculateSmartShadow (renderer.go:299-331). Returns (B,) in [0,1]."""
    hard_blocked = intersect.any_hit(geom, point, light_dir, 1e-3,
                                     light_dist, accel=accel)
    if not soft_shadows:
        return jnp.where(hard_blocked, 0.0, 1.0)

    unblocked = jnp.zeros(point.shape[:-1], point.dtype)
    for i in range(shadow_samples):
        stream = rng.bounce_stream(
            bounce, rng.shadow_stream(light_index, i, shadow_samples))
        ball = rng.unit_ball(pix_id, samp_id, stream, seed)
        soft_dir = _normalize(light_dir + 0.1 * ball)
        blocked = intersect.any_hit(geom, point, soft_dir, 1e-3,
                                    light_dist, accel=accel)
        unblocked += jnp.where(blocked, 0.0, 1.0)
    soft = unblocked / float(shadow_samples)
    return jnp.where(hard_blocked, 0.0, soft)


def direct_lighting(geom, lights, mat, point, normal,
                    pix_id, samp_id, bounce, *,
                    soft_shadows=True, shadow_samples=16, seed=0,
                    accel=None):
    """calculateDirectLighting (renderer.go:229-297). Returns (B,3)."""
    metallic = mat["metallic"]
    albedo = mat["eff_albedo"]

    amb = ambient_strength(metallic)
    total = jnp.broadcast_to(amb[..., None], point.shape).astype(point.dtype)

    n_lights = lights.position.shape[0]
    for li in range(n_lights):
        lpos = lights.position[li]
        lcol = lights.color[li]
        lint = lights.intensity[li]

        to_light = lpos - point
        light_dist = jnp.linalg.norm(to_light, axis=-1)
        light_dir = _normalize(to_light)
        live = light_dist >= 1e-3  # renderer.go:252-254

        sf = shadow_factor(geom, point, lpos, light_dist, light_dir,
                           pix_id, samp_id, bounce, li,
                           soft_shadows=soft_shadows,
                           shadow_samples=shadow_samples, seed=seed,
                           accel=accel)

        cos_theta = jnp.maximum(0.0, _dot(normal, light_dir))
        intensity = cos_theta * lint / (light_dist * light_dist)

        dstr = diffuse_strength(metallic)
        diffuse = albedo * (dstr * intensity * sf)[..., None]

        view_dir = _normalize(-point)  # toward world origin (renderer.go:279)
        half_dir = _normalize(light_dir + view_dir)
        spow = specular_power(metallic)
        spec_i = jnp.power(jnp.maximum(0.0, _dot(normal, half_dir)), spow)
        spec_scale = jnp.where(metallic > 0.5,
                               spec_i * intensity * sf * metallic * 3.0, 0.0)
        specular = lcol[None, :] * spec_scale[..., None]

        total = total + jnp.where(live[..., None], diffuse + specular, 0.0)

    return total

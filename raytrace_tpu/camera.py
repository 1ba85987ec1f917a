"""Camera ray generation.

Two models:
  * ``go_rays``: exact parity with the reference camera (renderer.go:377-390),
    which IGNORES lookAt/up/fov entirely: a fixed viewport of height 2.0,
    width 2*aspectRatio, focal length 1.0 along -Z from camera.Position,
    with u,v in [0,1] mapping left->right / bottom->top while image rows are
    written top-down (renderer.go:96) - i.e. the image comes out vertically
    flipped relative to conventional v-up framing. The demo PNGs bake this in.
  * ``lookat_rays``: a correct look-at pinhole camera honoring
    lookAt/up/fov (the behavior the JSON schema advertises), offered behind
    a flag.

Directions are intentionally NOT normalized (parity; the Metal Fresnel term
depends on the raw length, material.go:85).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def go_rays(camera, u, v):
    """Rays for u,v in [0,1]^2 (renderer.go:377-390). u,v: (B,) arrays."""
    vp_h = 2.0
    vp_w = vp_h * camera.aspect_ratio
    focal = 1.0
    origin = camera.position  # (3,)
    horizontal = jnp.stack([vp_w, jnp.zeros_like(vp_w), jnp.zeros_like(vp_w)])
    vertical = jnp.asarray([0.0, vp_h, 0.0], origin.dtype)
    lower_left = (origin - horizontal / 2.0 - vertical / 2.0
                  - jnp.asarray([0.0, 0.0, focal], origin.dtype))
    direction = (lower_left[None, :]
                 + u[..., None] * horizontal[None, :]
                 + v[..., None] * vertical[None, :]
                 - origin[None, :])
    o = jnp.broadcast_to(origin, direction.shape)
    return o, direction


def thin_lens_perturb(camera, origin, direction, pix_id, samp_id, seed,
                      lens_radius=0.1, focus_distance=10.0):
    """Thin-lens depth-of-field ray perturbation (advanced.go:29-44).

    Parity quirks preserved from applyDepthOfField:
      * the offset basis is ``Up * rd.x + normalize(LookAt x Up) * rd.y``
        - LookAt is the look-at POINT, not a view direction (:38);
      * the output direction IS normalized (:41), unlike primary rays;
      * defaults lensRadius=0.1, focusDistance=10.0 (:34-35).
    The disk sample is counter-based (rng.unit_disk) instead of the
    reference's global-RNG rejection loop.
    """
    from . import rng
    rd = rng.unit_disk(pix_id, samp_id, rng.Streams.DOF_DISK, seed)
    rd = rd * lens_radius
    up = camera.up
    cr = jnp.cross(camera.look_at, up)  # LookAt x Up, parity bug kept
    n = jnp.linalg.norm(cr)
    cr = jnp.where(n > 0, cr / jnp.where(n > 0, n, 1.0), cr)
    offset = rd[..., 0:1] * up[None, :] + rd[..., 1:2] * cr[None, :]
    new_origin = origin + offset
    new_dir = direction * focus_distance - offset
    nd = jnp.linalg.norm(new_dir, axis=-1, keepdims=True)
    new_dir = jnp.where(nd > 0, new_dir / jnp.where(nd > 0, nd, 1.0),
                        new_dir)
    return new_origin, new_dir


def lookat_rays(camera, u, v):
    """Conventional right-handed look-at pinhole camera using fov/lookAt/up."""
    pos = camera.position
    fwd = camera.look_at - pos
    fwd = fwd / jnp.linalg.norm(fwd)
    right = jnp.cross(fwd, camera.up)
    right = right / jnp.linalg.norm(right)
    up = jnp.cross(right, fwd)
    theta = camera.fov * (np.pi / 180.0)
    half_h = jnp.tan(theta / 2.0)
    half_w = camera.aspect_ratio * half_h
    direction = (fwd[None, :]
                 + (2.0 * u[..., None] - 1.0) * half_w * right[None, :]
                 + (2.0 * v[..., None] - 1.0) * half_h * up[None, :])
    o = jnp.broadcast_to(pos, direction.shape)
    return o, direction

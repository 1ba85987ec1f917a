"""AOV (arbitrary output variable) feature buffers for compositing and
denoising.

Production path tracers ship auxiliary per-pixel buffers alongside the
beauty pass; the reference has nothing comparable (its HitRecord,
geometry/ray.go:7-13, is consumed inside traceRay and discarded). Here
one deterministic center ray per pixel through `intersect.closest_hit`
yields the standard feature set — depth, world position, shading normal,
material albedo/id, hit mask — the exact inputs joint-bilateral and
learned denoisers (e.g. OIDN-style) expect next to a noisy radiance
pass such as an adaptive render's.

Center rays (pixel centers, no jitter) keep every buffer noise-free and
bit-deterministic; they reuse the same camera models as the beauty pass
(PARITY.md #2's fixed-viewport Go camera or the look-at camera).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from . import camera as cam_mod
from . import trace as trace_mod
from .ops import intersect as isect

__all__ = ["render_aovs"]


@partial(jax.jit, static_argnames=("width", "height", "go_camera"))
def _aovs_device(scene, *, width: int, height: int, go_camera: bool):
    n_px = width * height
    xs = (jnp.arange(n_px, dtype=jnp.float32) % width + 0.5) / width
    ys = (jnp.arange(n_px, dtype=jnp.float32) // width + 0.5) / height
    rays = cam_mod.go_rays if go_camera else cam_mod.lookat_rays
    o, d = rays(scene.camera, xs, ys)
    hit = isect.closest_hit(scene.geometry, o, d, t_min=1e-3,
                            accel=getattr(scene, "accel", None))
    # world-unit depth: t scales with |d| (camera directions are
    # unnormalized, renderer.go:385)
    dist = jnp.where(hit.hit, hit.t * jnp.linalg.norm(d, axis=-1),
                     isect.BIG)
    mat = scene.materials.row(hit.mat_id)
    zero3 = jnp.zeros_like(hit.point)
    img = lambda a: a.reshape(height, width, *a.shape[1:])
    return {
        "depth": img(dist),
        "hit": img(hit.hit),
        "position": img(jnp.where(hit.hit[:, None], hit.point, zero3)),
        "normal": img(jnp.where(hit.hit[:, None], hit.normal, zero3)),
        "albedo": img(jnp.where(hit.hit[:, None], mat["eff_albedo"], zero3)),
        "mat_id": img(jnp.where(hit.hit, hit.mat_id, -1)),
        "front_face": img(hit.front_face & hit.hit),
    }


def render_aovs(scene, *, width: int, height: int,
                cfg: Optional[trace_mod.TraceConfig] = None,
                go_camera: bool = True,
                as_numpy: bool = True) -> Dict[str, np.ndarray]:
    """Feature buffers from one center ray per pixel.

    Returns {"depth" (H,W) world units (BIG on miss), "hit" (H,W) bool,
    "position"/"normal"/"albedo" (H,W,3) (zeros on miss; albedo is the
    material's GetAlbedo() — dielectrics white, lights black),
    "mat_id" (H,W) int32 (-1 on miss), "front_face" (H,W) bool}.

    cfg is accepted for API symmetry with the render entry points; AOVs
    are deterministic and ignore sampling settings.
    """
    del cfg
    out = _aovs_device(scene, width=width, height=height,
                       go_camera=go_camera)
    if as_numpy:
        out = {k: np.asarray(v) for k, v in out.items()}
    return out

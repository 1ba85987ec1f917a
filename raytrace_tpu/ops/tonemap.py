"""Tone mapping and 8-bit quantization (renderer.go:348-367, vector.go:106-109).

Pipeline parity: exposure (1.0) -> exponential map 1-exp(-c) -> gamma 1/2.2
-> clamp [0,1] -> *255 truncated (Go uint8() truncates, not rounds).

Also provides the Reinhard and exposure variants the dead PPM module offers
(internal/output/ppm.go:158-236) as working ops.
"""

from __future__ import annotations

import jax.numpy as jnp


def tonemap(color, exposure=1.0, gamma=2.2):
    """Exponential tone map + gamma + clamp. color: (...,3) linear."""
    c = color * exposure
    c = 1.0 - jnp.exp(-c)
    c = jnp.power(jnp.maximum(c, 0.0), 1.0 / gamma)
    return jnp.clip(c, 0.0, 1.0)


def reinhard(color):
    """Reinhard c/(1+c) (ppm.go:199-236)."""
    return color / (1.0 + color)


def to_rgb8(mapped):
    """Clamp + truncate to uint8, matching Go's uint8(x*255) (vector.go:106-109)."""
    c = jnp.clip(mapped, 0.0, 1.0)
    return jnp.floor(c * 255.0).astype(jnp.uint8)


def tonemap_rgb8(linear):
    """Full display transform in one traceable op: tonemap + quantize.

    Module-level (hashable, stable identity) so it can ride as the static
    ``post`` stage of renderer._render_fused - the whole
    render->tonemap->uint8 frame then compiles to a single dispatch,
    which matters on the tunneled dev TPU where per-dispatch latency can
    rival short frames' compute (see BENCHMARKS.md variance note)."""
    return to_rgb8(tonemap(linear))

"""Counter-based, sharding-invariant RNG for Monte Carlo rendering.

The reference uses a single process-global ``math/rand`` PRNG shared (and
serialized) across all goroutines (reference: internal/math/random.go:8-30),
which is neither deterministic nor parallel-friendly. The TPU-native design
replaces it with a stateless counter-based hash: every random draw is a pure
function of (pixel_id, sample_id, stream) so results are bit-identical no
matter how lanes are sharded across chips or chunked over time.

The hash is pcg4d (Jarzynski & Olano, "Hash Functions for GPU Rendering",
JCGT 2020) - 4x uint32 in, 4x uint32 out, ~20 integer VPU ops, high quality
for rendering workloads.

Stream layout (one stream id per logical draw site, see ``Streams``):
    stream = bounce * STREAMS_PER_BOUNCE + site
so every (pixel, sample, bounce, site) tuple gets an independent draw.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# Max distinct draw sites per bounce. Shadow sampling uses
# SHADOW_BASE + light_index * (SHADOW_SAMPLES + 1) + sample_index, so with
# default 16 shadow samples this supports up to ~20 lights per bounce.
STREAMS_PER_BOUNCE = 512


class Streams:
    """Per-bounce draw-site ids (see STREAMS_PER_BOUNCE)."""

    CAMERA_JITTER = 0   # 2 uniforms: sub-pixel AA jitter (renderer.go:155-156)
    SCATTER_BALL = 1    # 3 uniforms: unit-ball sample for scatter perturbation
    DIELECTRIC = 2      # 1 uniform: reflect/refract branch (material.go:252)
    RUSSIAN_ROULETTE = 3
    DOF_DISK = 4        # 2 uniforms: thin-lens aperture sample (advanced.go:37)
    SHADOW_BASE = 8     # 3 uniforms per soft-shadow sample (renderer.go:315-327)


_M = np.uint32(1664525)
_A = np.uint32(1013904223)


def pcg4d(a, b, c, d):
    """pcg4d hash: 4x uint32 -> 4x uint32, vectorized over array inputs."""
    x = a.astype(jnp.uint32) * _M + _A
    y = b.astype(jnp.uint32) * _M + _A
    z = c.astype(jnp.uint32) * _M + _A
    w = d.astype(jnp.uint32) * _M + _A
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    w = w ^ (w >> 16)
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    return x, y, z, w


_INV24 = np.float32(1.0 / (1 << 24))


def _to_unit_float(u):
    """uint32 -> float32 uniform in [0, 1) using the top 24 bits."""
    return (u >> 8).astype(jnp.float32) * _INV24


def uniform4(pix_id, samp_id, stream, seed):
    """Four independent U[0,1) floats per lane.

    pix_id/samp_id: uint32 arrays (lane identity); stream: int (python or
    traced scalar); seed: uint32 scalar.
    """
    s = jnp.asarray(stream, jnp.uint32)
    x, y, z, w = pcg4d(pix_id, samp_id, jnp.broadcast_to(s, pix_id.shape),
                       jnp.broadcast_to(jnp.asarray(seed, jnp.uint32), pix_id.shape))
    return _to_unit_float(x), _to_unit_float(y), _to_unit_float(z), _to_unit_float(w)


def sincos_2pi(u):
    """(sin(2*pi*u), cos(2*pi*u)) for u in [0,1) via quadrant-reduced
    Taylor polynomials (~1e-7 max error).

    The unit-ball sampler runs 33x per bounce per lane in the Pallas
    megakernel; library sin/cos lower to long polynomial chains on the
    TPU VPU, so a shared short-polynomial version is used by BOTH the jnp
    and Pallas paths (keeping them bit-identical).
    """
    u = jnp.asarray(u, jnp.float32)
    t = 4.0 * u                      # quarter turns, [0, 4)
    q = jnp.floor(t + 0.5)           # nearest quadrant 0..4
    r = (t - q) * np.float32(np.pi / 2.0)  # [-pi/4, pi/4]
    r2 = r * r
    s = r * (1.0 + r2 * (np.float32(-1.0 / 6.0)
                         + r2 * (np.float32(1.0 / 120.0)
                                 + r2 * np.float32(-1.0 / 5040.0))))
    c = 1.0 + r2 * (np.float32(-0.5)
                    + r2 * (np.float32(1.0 / 24.0)
                            + r2 * np.float32(-1.0 / 720.0)))
    qm = q.astype(jnp.int32) & 3
    sin = jnp.where(qm == 0, s, jnp.where(qm == 1, c,
                    jnp.where(qm == 2, -s, -c)))
    cos = jnp.where(qm == 0, c, jnp.where(qm == 1, -s,
                    jnp.where(qm == 2, -c, s)))
    return sin, cos


def cbrt01(u):
    """x**(1/3) for x in [0,1) via a bit-level seed + 2 Newton steps
    (~1e-7 relative error); much cheaper than exp2(log2(x)/3) on the VPU
    and available inside Pallas (Mosaic has no cbrt primitive)."""
    u = jnp.asarray(u, jnp.float32)
    zero = u <= 0.0
    x = jnp.where(zero, 1.0, u)
    i = jax.lax.bitcast_convert_type(x, jnp.int32)
    g = jax.lax.bitcast_convert_type(i // 3 + np.int32(0x2A514067),
                                     jnp.float32)
    for _ in range(2):
        g = (2.0 * g + x / (g * g)) * np.float32(1.0 / 3.0)
    return jnp.where(zero, 0.0, g)


def unit_ball(pix_id, samp_id, stream, seed):
    """Uniform sample inside the unit ball, shape (..., 3).

    Matches the distribution of the reference's rejection sampler
    (internal/math/vector.go:132-139) without rejection: direction from
    (z, phi) area-preserving map, radius as cbrt of a uniform.
    """
    u1, u2, u3, _ = uniform4(pix_id, samp_id, stream, seed)
    z = 2.0 * u1 - 1.0
    sin_p, cos_p = sincos_2pi(u2)
    rho = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    r = cbrt01(u3)
    return jnp.stack([r * rho * cos_p, r * rho * sin_p, r * z], axis=-1)


def unit_disk(pix_id, samp_id, stream, seed):
    """Uniform sample inside the unit disk, shape (..., 2).

    Matches the distribution of the reference's rejection sampler
    (vector.go:141-152 RandomVec3InUnitDisk) without rejection:
    r = sqrt(u), theta = 2*pi*v.
    """
    u1, u2, _, _ = uniform4(pix_id, samp_id, stream, seed)
    r = jnp.sqrt(u1)
    sin_t, cos_t = sincos_2pi(u2)
    return jnp.stack([r * cos_t, r * sin_t], axis=-1)


def shadow_stream(light_index, sample_index, shadow_samples):
    """Draw-site id for soft-shadow sample `sample_index` of light `light_index`."""
    return Streams.SHADOW_BASE + light_index * (shadow_samples + 1) + sample_index


def bounce_stream(bounce, site):
    """Combine a bounce index with a per-bounce draw-site id."""
    return bounce * STREAMS_PER_BOUNCE + site

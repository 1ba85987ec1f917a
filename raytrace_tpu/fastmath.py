"""Fast-math parity layer: working jnp forms of internal/math.

Covers three reference surfaces:
  * ``FastRandom`` - the xorshift64* PRNG (advanced_math.go:7-32: shifts
    12/25/27, multiplier 2685821657736338717), reproduced bit-exactly so
    sequences can be compared against the Go implementation;
  * the ``Fast*`` scalar wrappers (advanced_math.go:34-344) - here they are
    vectorized jnp ops (the TPU VPU is the "fast" path, no wrapper needed;
    each alias is kept for API parity and works on arrays);
  * the API promised by the reference's broken benchmark test
    (math_benchmarks_test.go references FastNoise1D/2D/3D and FastVec3*
    which do not exist anywhere - SURVEY.md §2.3) - realized here as real,
    working ops: value-noise via the pcg hash, and batched Vec3 algebra.

Also the number-theory predicates (advanced_math.go:346-587), vectorized.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# FastRandom: xorshift64* (advanced_math.go:7-32), bit-exact
# ---------------------------------------------------------------------------

_XS_MULT = np.uint64(2685821657736338717)
_F64_SCALE = np.float64(1.0 / (1 << 53))


class FastRandom:
    """xorshift64* PRNG, bit-compatible with the Go FastRandom.

    Stateful like the Go struct; `split` to arrays for vectorized use.
    advanced_math.go:15-20: x ^= x>>12; x ^= x<<25; x ^= x>>27; return
    x * 2685821657736338717. Float64 takes the top 53 bits (:22-24).
    """

    def __init__(self, seed: int):
        # Go: NewFastRandom(seed int64) stores seed as state (must be != 0).
        self.state = np.uint64(seed if seed != 0 else 1)

    def next_uint64(self) -> int:
        x = self.state
        x ^= x >> np.uint64(12)
        x ^= (x << np.uint64(25)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        x ^= x >> np.uint64(27)
        self.state = x
        # Go uint64 multiply wraps mod 2^64; numpy flags the wrap as
        # overflow, so do the (exact) multiply in Python ints instead.
        return (int(x) * int(_XS_MULT)) & 0xFFFFFFFFFFFFFFFF

    def float64(self) -> float:
        """advanced_math.go:22-24: top 53 bits / 2^53."""
        return float((self.next_uint64() >> 11) * _F64_SCALE)

    def float64_range(self, lo: float, hi: float) -> float:
        return lo + (hi - lo) * self.float64()

    def int_range(self, lo: int, hi: int) -> int:
        """advanced_math.go:30-32: lo + uint64 % (hi - lo)."""
        return lo + self.next_uint64() % (hi - lo)


def xorshift64star(state):
    """Vectorized one-step xorshift64*: (new_state, output) for uint64
    arrays. The TPU-native form: each lane carries its own state.

    Requires genuine uint64 input: with jax_enable_x64 off, JAX silently
    truncates 64-bit integers to 32, which would break the Go
    bit-compatibility claim - so wrap calls in jax.experimental.enable_x64
    (as FastRandom.split and the KAT tests do).
    """
    x = jnp.asarray(state)
    if x.dtype != jnp.uint64:
        raise TypeError(
            "xorshift64star needs uint64 state (got %s); enable x64 via "
            "jax.experimental.enable_x64() - without it JAX truncates to "
            "uint32 and the sequence diverges from Go's FastRandom"
            % x.dtype)
    x = x ^ (x >> np.uint64(12))
    x = x ^ (x << np.uint64(25))
    x = x ^ (x >> np.uint64(27))
    return x, x * _XS_MULT


# ---------------------------------------------------------------------------
# Fast* scalar wrappers (advanced_math.go:34-344) - vectorized aliases
# ---------------------------------------------------------------------------

fast_sqrt = jnp.sqrt
fast_cbrt = jnp.cbrt
fast_pow = jnp.power
fast_exp = jnp.exp
fast_log = jnp.log
fast_log2 = jnp.log2
fast_log10 = jnp.log10
fast_sin = jnp.sin
fast_cos = jnp.cos
fast_tan = jnp.tan
fast_asin = jnp.arcsin
fast_acos = jnp.arccos
fast_atan = jnp.arctan
fast_atan2 = jnp.arctan2
fast_sinh = jnp.sinh
fast_cosh = jnp.cosh
fast_tanh = jnp.tanh
fast_floor = jnp.floor
fast_ceil = jnp.ceil
fast_round = jnp.round
fast_abs = jnp.abs
fast_mod = jnp.mod
fast_min = jnp.minimum
fast_max = jnp.maximum
fast_hypot = jnp.hypot


def fast_inv_sqrt(x):
    """FastInvSqrt (advanced_math.go:46-48) - rsqrt, the op the Quake trick
    approximates; on TPU the VPU has it natively."""
    return jax.lax.rsqrt(x)


def fast_clamp(x, lo, hi):
    """FastClamp (advanced_math.go:74-82)."""
    return jnp.clip(x, lo, hi)


def fast_lerp(a, b, t):
    """FastLerp (advanced_math.go:84-86)."""
    return a + (b - a) * t


def fast_smooth_step(edge0, edge1, x):
    """FastSmoothStep (advanced_math.go:88-96): 3t^2 - 2t^3."""
    t = jnp.clip((x - edge0) / (edge1 - edge0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def fast_smoother_step(edge0, edge1, x):
    """FastSmootherStep: 6t^5 - 15t^4 + 10t^3 (quintic)."""
    t = jnp.clip((x - edge0) / (edge1 - edge0), 0.0, 1.0)
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def fast_sign(x):
    return jnp.sign(x)


def fast_step(edge, x):
    return jnp.where(x < edge, 0.0, 1.0)


def fast_fract(x):
    return x - jnp.floor(x)


def fast_radians(deg):
    return deg * (np.pi / 180.0)


def fast_degrees(rad):
    return rad * (180.0 / np.pi)


# ---------------------------------------------------------------------------
# Vectorized Vec3 algebra (the FastVec3* API promised by
# math_benchmarks_test.go:68-77 but never implemented)
# ---------------------------------------------------------------------------

def vec3_add(a, b):
    return a + b


def vec3_sub(a, b):
    return a - b


def vec3_mul(a, s):
    return a * (s[..., None] if jnp.ndim(s) == jnp.ndim(a) - 1 else s)


def vec3_div(a, s):
    return a / (s[..., None] if jnp.ndim(s) == jnp.ndim(a) - 1 else s)


def vec3_dot(a, b):
    return jnp.sum(a * b, axis=-1)


def vec3_cross(a, b):
    return jnp.cross(a, b)


def vec3_length(a):
    return jnp.linalg.norm(a, axis=-1)


def vec3_length_squared(a):
    return jnp.sum(a * a, axis=-1)


def vec3_normalize(a):
    """Go Vec3.Normalize semantics: zero vector stays zero (vector.go:61-67)."""
    n = jnp.linalg.norm(a, axis=-1, keepdims=True)
    return jnp.where(n > 0.0, a / jnp.where(n > 0.0, n, 1.0), 0.0)


def vec3_reflect(v, n):
    """vector.go:77-79."""
    return v - 2.0 * vec3_dot(v, n)[..., None] * n


def vec3_refract(v, n, eta):
    """vector.go:81-96 incl. internal flip + TIR fallback."""
    cos = vec3_dot(v, n)[..., None]
    flip = cos > 0.0
    n2 = jnp.where(flip, -n, n)
    eta2 = jnp.where(flip, 1.0 / eta, eta)
    cos2 = jnp.where(flip, -cos, cos)
    sin_t2 = eta2 * eta2 * (1.0 - cos2 * cos2)
    tir = sin_t2 > 1.0
    cos_t2 = jnp.sqrt(jnp.where(tir, 1.0, jnp.maximum(1.0 - sin_t2, 0.0)))
    refracted = v * eta2 - n2 * (eta2 * cos2 + cos_t2)
    return jnp.where(tir, vec3_reflect(v, n2), refracted)


def vec3_distance(a, b):
    """FastVec3Distance - the ONE vec op that does exist
    (vector.go:171-174)."""
    return vec3_length(a - b)


def vec3_lerp(a, b, t):
    """vector.go:116-122."""
    t = jnp.asarray(t)
    return a + (b - a) * (t[..., None] if t.ndim == a.ndim - 1 else t)


# ---------------------------------------------------------------------------
# Noise (FastNoise1D/2D/3D promised by math_benchmarks_test.go:55-57)
# ---------------------------------------------------------------------------

def _hash_to_unit(ix, iy, iz, seed):
    """Lattice hash -> U[0,1) via the same pcg4d as the render RNG."""
    from . import rng as rng_mod
    a, _, _, _ = rng_mod.pcg4d(
        ix.astype(jnp.uint32), iy.astype(jnp.uint32),
        iz.astype(jnp.uint32),
        jnp.full(ix.shape, seed, jnp.uint32))
    # Route the cast through int32: (u >> 8) < 2^24 fits exactly, the
    # result is bit-identical, and Mosaic (Pallas TPU) has no direct
    # uint32->f32 cast - this keeps the noise stack usable inside the
    # megakernel's texture evaluation.
    return (a >> np.uint32(8)).astype(jnp.int32).astype(
        jnp.float32) * np.float32(1.0 / (1 << 24))


def _smooth(t):
    return t * t * (3.0 - 2.0 * t)


def fast_noise_1d(x, seed: int = 0):
    """Smoothed value noise on the integer lattice, output in [0, 1)."""
    x = jnp.asarray(x, jnp.float32)
    i = jnp.floor(x)
    f = x - i
    ii = i.astype(jnp.int32)
    z = jnp.zeros_like(ii)
    a = _hash_to_unit(ii, z, z, seed)
    b = _hash_to_unit(ii + 1, z, z, seed)
    return a + (b - a) * _smooth(f)


def fast_noise_2d(x, y, seed: int = 0):
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    ix, iy = jnp.floor(x), jnp.floor(y)
    fx, fy = x - ix, y - iy
    ix = ix.astype(jnp.int32)
    iy = iy.astype(jnp.int32)
    z = jnp.zeros_like(ix)
    v00 = _hash_to_unit(ix, iy, z, seed)
    v10 = _hash_to_unit(ix + 1, iy, z, seed)
    v01 = _hash_to_unit(ix, iy + 1, z, seed)
    v11 = _hash_to_unit(ix + 1, iy + 1, z, seed)
    sx, sy = _smooth(fx), _smooth(fy)
    return ((v00 + (v10 - v00) * sx)
            + ((v01 + (v11 - v01) * sx) - (v00 + (v10 - v00) * sx)) * sy)


def fast_noise_3d(x, y, z, seed: int = 0):
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    z = jnp.asarray(z, jnp.float32)
    ix, iy, iz = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    fx, fy, fz = x - ix, y - iy, z - iz
    ix = ix.astype(jnp.int32)
    iy = iy.astype(jnp.int32)
    iz = iz.astype(jnp.int32)

    def corner(dx, dy, dz):
        return _hash_to_unit(ix + dx, iy + dy, iz + dz, seed)

    sx, sy, sz = _smooth(fx), _smooth(fy), _smooth(fz)

    def lerp(a, b, t):
        return a + (b - a) * t

    c00 = lerp(corner(0, 0, 0), corner(1, 0, 0), sx)
    c10 = lerp(corner(0, 1, 0), corner(1, 1, 0), sx)
    c01 = lerp(corner(0, 0, 1), corner(1, 0, 1), sx)
    c11 = lerp(corner(0, 1, 1), corner(1, 1, 1), sx)
    return lerp(lerp(c00, c10, sy), lerp(c01, c11, sy), sz)


def fbm_3d(x, y, z, octaves: int = 4, lacunarity: float = 2.0,
           gain: float = 0.5, seed: int = 0):
    """Fractal Brownian motion over fast_noise_3d (the real form of the
    reference's fake 'simplex'/'perlin' textures that just call
    RandomFloat(), advanced_materials.go:197-209, 552-575)."""
    total = jnp.zeros(jnp.broadcast_shapes(jnp.shape(x), jnp.shape(y),
                                           jnp.shape(z)), jnp.float32)
    amp, freq, norm = 1.0, 1.0, 0.0
    for o in range(octaves):
        total = total + amp * fast_noise_3d(x * freq, y * freq, z * freq,
                                            seed=seed + o)
        norm += amp
        amp *= gain
        freq *= lacunarity
    return total / norm


# ---------------------------------------------------------------------------
# Number theory (advanced_math.go:346-587), vectorized
# ---------------------------------------------------------------------------

def is_prime(n):
    """Vectorized trial division (parity with FastIsPrime semantics)."""
    n = jnp.asarray(n, jnp.int32)

    def cond(c):
        i, comp = c
        return jnp.any(i * i <= n)

    def body(c):
        i, comp = c
        comp = comp | ((i * i <= n) & (n % i == 0) & (i < n))
        return i + 1, comp

    _, comp = jax.lax.while_loop(
        cond, body, (jnp.int32(2), jnp.zeros_like(n, bool)))
    return (n >= 2) & ~comp


def fibonacci(k: int):
    """First k Fibonacci numbers (FastFibonacci parity)."""
    def body(carry, _):
        a, b = carry
        return (b, a + b), a

    _, seq = jax.lax.scan(body, (jnp.int64(0), jnp.int64(1)), None,
                          length=k)
    return seq


def is_palindrome_number(n):
    """Digit-palindrome test, vectorized."""
    # int64 only exists under jax_enable_x64; default mode truncates the
    # dtype (with a warning), so ask for what the mode can deliver.
    dt = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
    n = jnp.asarray(n, dt)

    def cond(c):
        orig, rev, rem = c
        return jnp.any(rem > 0)

    def body(c):
        orig, rev, rem = c
        rev = jnp.where(rem > 0, rev * 10 + rem % 10, rev)
        return orig, rev, rem // 10

    _, rev, _ = jax.lax.while_loop(cond, body,
                                   (n, jnp.zeros_like(n), n))
    return rev == n

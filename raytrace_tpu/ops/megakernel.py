"""Pallas TPU wavefront megakernel: the whole depth-50 trace loop on-chip.

The pure-jnp path (trace.py) materializes every bounce's intermediates to
HBM; at 2M-lane wavefronts the render is bandwidth-bound and the
while-loop early exit only fires when an ENTIRE band dies. This kernel is
the TPU-native wavefront megakernel the design calls for (SURVEY.md §7,
BASELINE.json north star):

  * each grid program owns a block of (R, 128) lanes whose full state
    (origin, direction, throughput, radiance, alive) lives in
    registers/VMEM for the whole bounce loop - HBM sees one read of the
    camera rays and one write of the radiance;
  * the bounce loop is a lax.while_loop whose cond includes
    ``any(alive)``: blocks of coherent lanes (consecutive pixels) exit as
    soon as ALL their lanes die - sky-heavy blocks cost 1 bounce, not 50;
  * scene tables (spheres, triangles, lights, materials) are tiny packed
    f32 arrays in SMEM, read as scalars inside python-unrolled primitive
    loops (scene sizes are compile-time constants);
  * the RNG is the same counter-based pcg4d as rng.py, computed on
    (R, 128) uint32 tiles - bit-identical to the jnp path, so the oracle
    tests compare exactly;
  * material dispatch is the masked-select form of the Go interface
    dispatch (material.go:9-16), identical in semantics to
    models/materials.scatter.

Semantics mirror trace._bounce_body exactly (same Go-parity quirks: tier
tables renderer.go:191-292, unnormalized camera-ray Fresnel material.go:85,
shadow sampling renderer.go:299-331, tMin=1e-3 everywhere).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import rng
from ..models import materials as mat_mod

BIG = np.float32(3.0e38)

# Lane-block geometry: each grid program traces R x 128 lanes.
DEFAULT_BLOCK_ROWS = 16
LANE = 128

# Primitive loops are fully unrolled up to this count; a fori_loop
# variant with dynamic SMEM row reads exists past it (validated against
# the oracle) but was MEASURED to compile ~1.8x SLOWER in Mosaic than the
# unrolled form on the 40-triangle prism scene (786s vs 443s) with no
# runtime win, so it is disabled by default - set it below
# MAX_KERNEL_PRIMS to experiment.
UNROLL_PRIM_LIMIT = 96
UNROLL_PRIM_LIMIT_VN = 48  # see _kernel_mode: vn scenes spill VMEM sooner
# Above this the kernel's unrolled code size stops being sensible;
# bigger scenes use the in-kernel BVH walk (requires scene.accel), up to
# the SMEM capacity cap below.
MAX_KERNEL_PRIMS = 96
# BVH-walk kernel: scene tables + node table live in SMEM; this cap keeps
# them comfortably inside scalar memory (~4096 prims ~= 80-250 KB).
MAX_BVH_KERNEL_PRIMS = 4096
# DMA-streamed BVH kernel (round 4): only the NODE table lives in SMEM;
# leaf primitive rows stream from an HBM table into an SMEM scratch via
# async_copy at each leaf visit (~300 ns per serial DMA, measured by
# tools/measure_dma_stream.py). The cap bounds the node table: at
# leaf_size 32 a 262144-prim tree is ~22K nodes = (9, 22K) f32 ~= 790 KB
# of the ~1 MB SMEM. This is the uncapped intent of the reference's BVH
# (spatial_acceleration.go:16-69 + renderer.go:333-346).
MAX_STREAM_KERNEL_PRIMS = 1 << 18
# Floats per unified stream row: [tag, v0/center.xyz, e1.xyz (x=radius
# for spheres), e2.xyz, n.xyz, mat] = 14, +9 vertex-normal floats for
# smooth-shaded scenes. Rows pad to STREAM_ROW (one 128-lane HBM tile)
# so per-leaf DMA slices stay tile-aligned.
STREAM_COLS = 14
STREAM_COLS_VN = 23
STREAM_ROW = 128


def _env_no_fused_soft() -> bool:
    """Debug knob: RT_NO_FUSED_SOFT=1 forces the per-sample soft-shadow
    walks in bvh mode (vs. the fused all-samples walk). Set it before the
    first render of the process - callers jit around trace_pallas and
    won't re-trace on a later env change."""
    import os
    return os.environ.get("RT_NO_FUSED_SOFT", "") == "1"


def _env_stream_fused_soft() -> bool:
    """A/B knob: RT_STREAM_FUSED_SOFT=0 reverts STREAM-mode soft shadows
    to the per-sample walks. Default ON since round 5: with the
    DISTANCE-PROPORTIONAL cone inflation (see soft_fused_fn) the fused
    walk beats per-sample on the compact scenes that used to regress
    (ico-10241 7.70 -> 6.33 s at 800x600/20spp/d50, grid-5833
    20.2 -> 16.3 s at 5 spp, TPU 2026-08-20; the round-4 constant
    0.102*dist inflation had made it 2.2-2.5x SLOWER there). Ring
    scenes keep their round-2 fused win (the tight bound only shrinks
    visited sets)."""
    import os
    return os.environ.get("RT_STREAM_FUSED_SOFT", "1") != "0"


def _env_soft_prim() -> bool:
    """RT_SOFT_PRIM=0 reverts unroll mode to the ungated sample-outer
    soft-shadow loop (A/B knob vs. the guarded primitive-outer loop;
    read at trace time - set before the first render of the process)."""
    import os
    return os.environ.get("RT_SOFT_PRIM", "1") != "0"


def scene_fits_kernel(scene) -> bool:
    ns = scene.geometry.sph_center.shape[0]
    nt = scene.geometry.tri_v0.shape[0]
    npl = scene.geometry.pl_point.shape[0]
    n = ns + nt + npl
    if n <= MAX_KERNEL_PRIMS:
        return True
    # Large scenes: the packet-BVH kernel walks scene.accel (scene.py
    # attaches it automatically past bvh.BVH_THRESHOLD); past the SMEM
    # prim-table cap the stream kernel DMAs leaf rows from HBM.
    return (getattr(scene, "accel", None) is not None
            and n <= MAX_STREAM_KERNEL_PRIMS)


def _kernel_mode(scene) -> str:
    """'unroll' | 'loop' | 'bvh' | 'stream' for a given scene shape.

    Smooth-shaded scenes (vertex-normal table present) unroll only to
    UNROLL_PRIM_LIMIT_VN: the interpolation keeps ~9 extra live values
    per unrolled triangle and an 80-triangle vn scene measured a scoped
    VMEM stack of 20.2 MB against the 16 MB limit (compile-time OOM).
    scene.from_dict auto-attaches a BVH to such scenes so they land in
    bvh mode, not the slow loop fallback. Past MAX_BVH_KERNEL_PRIMS the
    prim tables no longer fit SMEM and the walk streams leaf rows from
    HBM ('stream')."""
    n = (scene.geometry.sph_center.shape[0]
         + scene.geometry.tri_v0.shape[0]
         + scene.geometry.pl_point.shape[0])
    limit = UNROLL_PRIM_LIMIT
    if getattr(scene.geometry, "tri_vn", None) is not None:
        limit = min(limit, UNROLL_PRIM_LIMIT_VN)
    if n <= limit:
        return "unroll"
    if getattr(scene, "accel", None) is not None:
        return "bvh" if n <= MAX_BVH_KERNEL_PRIMS else "stream"
    return "loop"


# ---------------------------------------------------------------------------
# In-kernel helpers (component SoA: x,y,z as separate (R,128) tiles)
# ---------------------------------------------------------------------------

def _norm3(x, y, z):
    """Go Vec3.Normalize: zero vector stays zero (vector.go:61-67)."""
    n2 = x * x + y * y + z * z
    pos = n2 > 0.0
    inv = jnp.where(pos, jax.lax.rsqrt(jnp.where(pos, n2, 1.0)), 0.0)
    return x * inv, y * inv, z * inv


def _pow5(x):
    x2 = x * x
    return x2 * x2 * x


def _uniform4(pix, samp, stream, seed):
    """pcg4d -> 4 U[0,1) floats; bit-identical to rng.uniform4."""
    s = jnp.broadcast_to(jnp.asarray(stream, jnp.uint32), pix.shape)
    sd = jnp.broadcast_to(jnp.asarray(seed, jnp.uint32), pix.shape)
    a, b, c, d = rng.pcg4d(pix, samp, s, sd)
    # Mosaic has no uint32->f32 cast; (u >> 8) < 2^24 fits int32 exactly.
    f = lambda u: ((u >> 8).astype(jnp.int32).astype(jnp.float32)
                   * np.float32(1.0 / (1 << 24)))
    return f(a), f(b), f(c), f(d)


def _unit_ball(pix, samp, stream, seed):
    """Component form of rng.unit_ball - calls the SAME short-polynomial
    sincos/cbrt as the jnp path, so both paths stay bit-identical."""
    u1, u2, u3, _ = _uniform4(pix, samp, stream, seed)
    z = 2.0 * u1 - 1.0
    sin_p, cos_p = rng.sincos_2pi(u2)
    rho = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    r = rng.cbrt01(u3)
    return r * rho * cos_p, r * rho * sin_p, r * z


def _tex_value_comp(tex, px, py, pz):
    """Component-form, Mosaic-safe texture evaluation.

    Mirrors models/textures.py value() formulas exactly (same lattice
    noise, same feature points); returns either an (r, g, b) triple
    (color textures) or a single scalar field (noise/voronoi - the
    caller scales the base albedo by it, textures.textured_albedo).
    """
    from ..models import textures as tex_mod
    from .. import fastmath as fm
    if isinstance(tex, tex_mod.CheckerboardTexture):
        s = np.float32(tex.scale)
        checker = (jnp.floor(px * s) + jnp.floor(py * s)
                   + jnp.floor(pz * s))
        # parity of an integer-valued f32 without jnp.mod (Mosaic):
        half = checker * 0.5
        even = (half - jnp.floor(half)) == 0.0
        c1 = np.asarray(tex.color1, np.float32)
        c2 = np.asarray(tex.color2, np.float32)
        return tuple(jnp.where(even, c1[i], c2[i]) for i in range(3))
    if isinstance(tex, tex_mod.MarbleTexture):
        s = np.float32(tex.scale)
        v = jnp.sin(px * s + py * (s * np.float32(0.5))
                    + pz * (s * np.float32(0.25)))
        v = (v + 1.0) * 0.5
        if tex.sharpness != 1.0:
            # v**sharpness via exp2/log2 (Mosaic has no vector pow);
            # v == 0 -> 0 (sharpness > 0).
            z = v <= 0.0
            v = jnp.where(z, 0.0, jnp.exp2(
                np.float32(tex.sharpness)
                * jnp.log2(jnp.where(z, 1.0, v))))
        b = np.asarray(tex.base_color, np.float32)
        c = np.asarray(tex.vein_color, np.float32)
        return tuple(b[i] * (1.0 - v) + c[i] * v for i in range(3))
    if isinstance(tex, tex_mod.WoodTexture):
        s = np.float32(tex.scale)
        ring = jnp.abs(jnp.sin(px * s + py * (s * np.float32(0.5))))
        t = jnp.where(ring < np.float32(tex.ring_width), 1.0, 0.0)
        b = np.asarray(tex.base_color, np.float32)
        c = np.asarray(tex.ring_color, np.float32)
        return tuple(b[i] * (1.0 - t) + c[i] * t for i in range(3))
    if isinstance(tex, tex_mod.GradientTexture):
        d = np.asarray(tex.direction, np.float32)
        d = d / (np.linalg.norm(d) or 1.0)
        t = (px * d[0] + py * d[1] + pz * d[2] + 1.0) * 0.5
        c1 = np.asarray(tex.color1, np.float32)
        c2 = np.asarray(tex.color2, np.float32)
        return tuple(c1[i] * (1.0 - t) + c2[i] * t for i in range(3))
    if isinstance(tex, tex_mod.NoiseTexture):
        s = np.float32(tex.scale)
        return fm.fbm_3d(px * s, py * s, pz * s, octaves=tex.octaves,
                         gain=tex.persistence,
                         lacunarity=tex.lacunarity,
                         seed=tex.seed) * np.float32(tex.amplitude)
    if isinstance(tex, tex_mod.PerlinNoiseTexture):
        s = np.float32(tex.scale)
        return fm.fbm_3d(px * s, py * s, pz * s, octaves=tex.octaves,
                         gain=tex.persistence,
                         lacunarity=tex.lacunarity, seed=tex.seed)
    if isinstance(tex, tex_mod.VoronoiTexture):
        s = np.float32(tex.scale)
        # Feature points are a deterministic function of (seed, index);
        # evaluate them eagerly even when tracing (the kernel unrolls
        # over them as constants).
        with jax.ensure_compile_time_eval():
            feats = np.asarray(tex._feature_points(), np.float32)  # (P,3)
        best = None
        for j in range(feats.shape[0]):
            ddx = px * s - feats[j, 0]
            ddy = py * s - feats[j, 1]
            ddz = pz * s - feats[j, 2]
            if tex.distance_type == tex_mod.MANHATTAN:
                dj = jnp.abs(ddx) + jnp.abs(ddy) + jnp.abs(ddz)
            elif tex.distance_type == tex_mod.CHEBYSHEV:
                dj = jnp.maximum(jnp.abs(ddx),
                                 jnp.maximum(jnp.abs(ddy), jnp.abs(ddz)))
            else:
                dj = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
            best = dj if best is None else jnp.minimum(best, dj)
        return best
    raise TypeError(f"unsupported texture for the kernel: {tex!r}")


# ---------------------------------------------------------------------------
# Kernel factory
# ---------------------------------------------------------------------------

def _make_kernel(ns: int, nt: int, nl: int, nm: int, npl: int, cfg,
                 start_bounce: int = 0, end_bounce=None,
                 return_state: bool = False, mode: str = "unroll",
                 n_nodes: int = 0, advanced: bool = False,
                 textures: tuple = (), wide: bool = False,
                 max_stack: int = 0, nb: int = 0, nt_occl=None,
                 stream_cols: int = 0, leaf_max: int = 0):
    """Build the kernel body for a scene shape (all sizes static).

    nb / nt_occl: box-occluder split (scene.Geometry.box_min doc) -
    any-hit paths test triangles [0, nt_occl) plus nb axis-aligned
    boxes (one slab test replaces a cube's 12 triangle tests in the
    soft-shadow loop); closest-hit paths still test every triangle.

    start_bounce/end_bounce bound the loop (RNG streams key off the
    absolute bounce index, so a [0,B) + resume [B,D) split is bit-identical
    to a single [0,D) run); return_state additionally emits the live ray
    state so the driver can re-compact survivors mid-trace.

    mode:
      * 'unroll' - primitive loops fully unrolled (best pipelining;
        compile time scales with scene size);
      * 'loop'   - fori_loop over SMEM rows (any size, brute force);
      * 'bvh'    - packet BVH walk (the TPU form of spatial acceleration,
        spatial_acceleration.go:45-69): one scalar cursor per lane BLOCK
        walks the skip-pointer tree; node AABBs are tested by all lanes
        on the VPU and the block descends when ANY lane's slab test
        passes; leaves run a traced-bound fori over their primitives.
        Shadow rays run the same packet walk per test (any-hit variant):
        lanes whose shading terms are provably zero start pre-marked
        blocked, so a block whose every relevant lane has resolved exits
        the walk early. Needs n_nodes and the extra bvh/pidx refs.

    wide: in bvh mode, ALL THREE walks (closest-hit, the hard-shadow
    any-hit, and the fused soft-shadow walk) use a 4-ary STACK walk over
    the WideBVH4 table (extra refs[2] + an SMEM scratch stack of
    max_stack ints): each popped node slab-tests 4 slots whose
    cross-lane reduces are mutually independent (they pipeline, where
    the binary skip walk serializes one reduce per node step) and
    offline step counts are 0.22-0.26x the binary walk's
    (tools/sim_bvh4.py). The shadow walks' early exit maps to clearing
    the stack (sp=0) when every lane has resolved. The binary table is
    still passed (refs[0]) for n_nodes bookkeeping and the non-wide
    fallback.
    """
    max_depth = cfg.max_depth if end_bounce is None else end_bounce
    shadow_samples = cfg.shadow_samples
    soft = cfg.soft_shadows
    seed = cfg.seed
    t_min = np.float32(1e-3)
    if nt_occl is None:
        nt_occl = nt

    def _slab_near_far(lx, ly, lz, hx_, hy_, hz_, ivx, ivy, ivz):
        """Slab-interval envelope for a box: inputs are the SIX
        (corner - origin) differences and the inverse direction;
        returns (near, far), the box's two surface crossings. Shared by
        every box test in the kernel (closest, any-hit, walk pre-tests,
        fused soft loop) so the expression can never desynchronize -
        semantics doc: intersect.box_blocked/box_t."""
        t0x, t1x = lx * ivx, hx_ * ivx
        t0y, t1y = ly * ivy, hy_ * ivy
        t0z, t1z = lz * ivz, hz_ * ivz
        near = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                       jnp.minimum(t0y, t1y)),
                           jnp.minimum(t0z, t1z))
        far = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                      jnp.maximum(t0y, t1y)),
                          jnp.maximum(t0z, t1z))
        return near, far

    def _tri_smooth_normal_g(get, has_vn, u, v, fnx, fny, fnz):
        """Barycentric vertex-normal interpolation (triangle.go:84-88:
        w*n0 + u*n1 + v*n2, normalized, w = 1-u-v) from tri-layout cols
        13-21 via the accessor, reusing the Moller-Trumbore u, v the hit
        test already computed. Flat scenes (has_vn False, a compile-time
        flag) pass the face normal through untouched and pay nothing."""
        if not has_vn:
            return fnx, fny, fnz
        w = 1.0 - u - v
        inx = w * get(13) + u * get(16) + v * get(19)
        iny = w * get(14) + u * get(17) + v * get(20)
        inz = w * get(15) + u * get(18) + v * get(21)
        ln = jnp.sqrt(inx * inx + iny * iny + inz * inz)
        inv_l = 1.0 / jnp.where(ln > 0.0, ln, 1.0)
        return inx * inv_l, iny * inv_l, inz * inv_l

    def _tri_smooth_normal(tri, j, u, v, fnx, fny, fnz):
        return _tri_smooth_normal_g(lambda c: tri[c, j],
                                    tri.shape[0] >= 22, u, v,
                                    fnx, fny, fnz)

    def closest_hit(sph, tri, pln, box, ox, oy, oz, dx, dy, dz):
        """Returns (t, outward nx,ny,nz, mat_id_f). t==BIG on miss."""
        shape = ox.shape
        t_best = jnp.full(shape, BIG)
        nx = jnp.zeros(shape)
        ny = jnp.zeros(shape)
        nz = jnp.zeros(shape)
        mat = jnp.zeros(shape)
        a = dx * dx + dy * dy + dz * dz  # |d|^2, shared by all spheres
        inv_a = 1.0 / a
        for j in range(ns):
            cx, cy, cz, r, m = (sph[0, j], sph[1, j], sph[2, j],
                                sph[3, j], sph[4, j])
            ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
            half_b = ocx * dx + ocy * dy + ocz * dz
            c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
            disc = half_b * half_b - a * c
            ok = disc >= 0.0
            sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
            r0 = (-half_b - sq) * inv_a
            r1 = (-half_b + sq) * inv_a
            in0 = ok & (r0 >= t_min) & (r0 <= t_best)
            in1 = ok & (r1 >= t_min) & (r1 <= t_best)
            tj = jnp.where(in0, r0, jnp.where(in1, r1, BIG))
            win = tj < t_best
            inv_r = 1.0 / r
            pxj = ox + dx * tj
            pyj = oy + dy * tj
            pzj = oz + dz * tj
            t_best = jnp.where(win, tj, t_best)
            nx = jnp.where(win, (pxj - cx) * inv_r, nx)
            ny = jnp.where(win, (pyj - cy) * inv_r, ny)
            nz = jnp.where(win, (pzj - cz) * inv_r, nz)
            mat = jnp.where(win, m, mat)
        for j in range(nt_occl):  # cube faces [nt_occl, nt): boxes below
            v0x, v0y, v0z = tri[0, j], tri[1, j], tri[2, j]
            e1x, e1y, e1z = tri[3, j], tri[4, j], tri[5, j]
            e2x, e2y, e2z = tri[6, j], tri[7, j], tri[8, j]
            fnx, fny, fnz = tri[9, j], tri[10, j], tri[11, j]
            m = tri[12, j]
            # h = d x e2 (Moller-Trumbore, triangle.go:36-82)
            hx = dy * e2z - dz * e2y
            hy = dz * e2x - dx * e2z
            hz = dx * e2y - dy * e2x
            det = e1x * hx + e1y * hy + e1z * hz
            good = jnp.abs(det) >= 1e-6
            f = 1.0 / jnp.where(good, det, 1.0)
            sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
            u = f * (sx * hx + sy * hy + sz * hz)
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            v = f * (dx * qx + dy * qy + dz * qz)
            tj = f * (e2x * qx + e2y * qy + e2z * qz)
            valid = (good & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
                     & (u + v <= 1.0) & (tj >= t_min) & (tj <= t_best))
            win = valid & (tj < t_best)
            snx, sny, snz = _tri_smooth_normal(tri, j, u, v,
                                               fnx, fny, fnz)
            t_best = jnp.where(win, tj, t_best)
            nx = jnp.where(win, snx, nx)
            ny = jnp.where(win, sny, ny)
            nz = jnp.where(win, snz, nz)
            mat = jnp.where(win, m, mat)
        for j in range(npl):
            ppx, ppy, ppz = pln[0, j], pln[1, j], pln[2, j]
            pnx, pny, pnz = pln[3, j], pln[4, j], pln[5, j]
            m = pln[6, j]
            # plane.go:21-46: exact denom==0 miss, t = (p-o).n / denom
            denom = dx * pnx + dy * pny + dz * pnz
            para = denom == 0.0
            tj = ((ppx - ox) * pnx + (ppy - oy) * pny
                  + (ppz - oz) * pnz) / jnp.where(para, 1.0, denom)
            win = (~para) & (tj >= t_min) & (tj < t_best)
            t_best = jnp.where(win, tj, t_best)
            nx = jnp.where(win, pnx, nx)
            ny = jnp.where(win, pny, ny)
            nz = jnp.where(win, pnz, nz)
            mat = jnp.where(win, m, mat)
        if nb:
            t_best, nx, ny, nz, mat = _box_closest(
                box, (t_best, nx, ny, nz, mat), ox, oy, oz, dx, dy, dz)
        return t_best, nx, ny, nz, mat

    def _box_closest(box, cy, ox, oy, oz, dx, dy, dz):
        """Closest-hit over the cube boxes (intersect.box_t semantics:
        slab near root preferred, far fallback - the sphere two-root
        rule; outward normal point-based like _hit_from_tidx: dominant
        axis of (p - center)/half, x<y<z on ties)."""
        t_best, nx, ny, nz, mat = cy
        bivx = 1.0 / jnp.where(dx == 0.0, 1e-30, dx)
        bivy = 1.0 / jnp.where(dy == 0.0, 1e-30, dy)
        bivz = 1.0 / jnp.where(dz == 0.0, 1e-30, dz)
        for j in range(nb):
            lxs, lys, lzs = box[0, j], box[1, j], box[2, j]
            hxs, hys, hzs = box[3, j], box[4, j], box[5, j]
            near, far = _slab_near_far(lxs - ox, lys - oy, lzs - oz,
                                       hxs - ox, hys - oy, hzs - oz,
                                       bivx, bivy, bivz)
            ok = near <= far
            in0 = ok & (near >= t_min) & (near <= t_best)
            in1 = ok & (far >= t_min) & (far <= t_best)
            tj = jnp.where(in0, near, jnp.where(in1, far, BIG))
            win = tj < t_best
            cxs = (lxs + hxs) * 0.5
            cys = (lys + hys) * 0.5
            czs = (lzs + hzs) * 0.5
            exs = jnp.maximum((hxs - lxs) * 0.5, 1e-30)
            eys = jnp.maximum((hys - lys) * 0.5, 1e-30)
            ezs = jnp.maximum((hzs - lzs) * 0.5, 1e-30)
            qx = (ox + dx * tj - cxs) / exs
            qy = (oy + dy * tj - cys) / eys
            qz = (oz + dz * tj - czs) / ezs
            aqx, aqy, aqz = jnp.abs(qx), jnp.abs(qy), jnp.abs(qz)
            pickx = (aqx >= aqy) & (aqx >= aqz)
            picky = (~pickx) & (aqy >= aqz)
            # NEGATED: the reference winds all cube faces INWARD, and
            # front_face (which steers dielectric eta) must match the
            # triangle form - see intersect._hit_from_tidx's box branch.
            nxj = jnp.where(pickx, -jnp.sign(qx), 0.0)
            nyj = jnp.where(picky, -jnp.sign(qy), 0.0)
            nzj = jnp.where((~pickx) & (~picky), -jnp.sign(qz), 0.0)
            t_best = jnp.where(win, tj, t_best)
            nx = jnp.where(win, nxj, nx)
            ny = jnp.where(win, nyj, ny)
            nz = jnp.where(win, nzj, nz)
            mat = jnp.where(win, box[6, j], mat)
        return t_best, nx, ny, nz, mat

    def occl_precompute(sph, tri, pln, box, ox, oy, oz):
        """Origin-only terms shared by ALL shadow rays from one hit point.

        Every bounce fires 1 + shadow_samples rays per light from the
        SAME origin. The sphere oc / c terms depend only on the origin;
        for triangles the triple-product identities det = e1.(d x e2) =
        -d.n2 (n2 = e1 x e2, per-triangle SCALARS) and s.(d x e2) =
        d.c1 (c1 = e2 x s) turn ALL per-direction numerators into dot
        products against hoisted constants - the per-sample test keeps
        no cross product and (see any_hit_pre) no division. Mirrors
        intersect.triangle_blocked. Also returns the hit point (the
        soft guard's bounding-sphere centroids need it)."""
        sph_pre = []
        for j in range(ns):
            cx, cy, cz, r = sph[0, j], sph[1, j], sph[2, j], sph[3, j]
            ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
            cc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
            sph_pre.append((ocx, ocy, ocz, cc))
        tri_pre = []
        for j in range(nt_occl):
            v0x, v0y, v0z = tri[0, j], tri[1, j], tri[2, j]
            e1x, e1y, e1z = tri[3, j], tri[4, j], tri[5, j]
            e2x, e2y, e2z = tri[6, j], tri[7, j], tri[8, j]
            sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
            c1x = e2y * sz - e2z * sy
            c1y = e2z * sx - e2x * sz
            c1z = e2x * sy - e2y * sx
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            e2q = e2x * qx + e2y * qy + e2z * qz
            n2x = e1y * e2z - e1z * e2y   # scalar face normal (unnorm.)
            n2y = e1z * e2x - e1x * e2z
            n2z = e1x * e2y - e1y * e2x
            tri_pre.append((c1x, c1y, c1z, qx, qy, qz, e2q,
                            n2x, n2y, n2z))
        pl_pre = []
        for j in range(npl):
            num = ((pln[0, j] - ox) * pln[3, j]
                   + (pln[1, j] - oy) * pln[4, j]
                   + (pln[2, j] - oz) * pln[5, j])
            pl_pre.append(num)
        box_pre = []
        for j in range(nb):
            # slab numerators (box corner - origin); the per-direction
            # test multiplies by 1/d and takes the near/far envelope
            box_pre.append((box[0, j] - ox, box[1, j] - oy,
                            box[2, j] - oz, box[3, j] - ox,
                            box[4, j] - oy, box[5, j] - oz))
        return sph_pre, tri_pre, pl_pre, box_pre, (ox, oy, oz)

    def any_hit_pre(sph_pre, tri_pre, pl_pre, box_pre, pln, tri,
                    dx, dy, dz, t_max):
        """Occlusion in (t_min, t_max) from precomputed origin terms.

        Triangles: division-free sign-corrected form (u >= 0 etc. are
        sign-exact; range tests multiply through by |det|; u <= 1 is
        implied by v >= 0 & u+v <= 1) - see intersect.triangle_blocked
        for the derivation and the rounding-boundary caveat."""
        blocked = jnp.zeros(dx.shape, bool)
        a = dx * dx + dy * dy + dz * dz
        inv_a = 1.0 / a
        for (ocx, ocy, ocz, cc) in sph_pre:
            half_b = ocx * dx + ocy * dy + ocz * dz
            disc = half_b * half_b - a * cc
            ok = disc >= 0.0
            sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
            r0 = (-half_b - sq) * inv_a
            r1 = (-half_b + sq) * inv_a
            blocked |= ok & (((r0 >= t_min) & (r0 <= t_max))
                             | ((r1 >= t_min) & (r1 <= t_max)))
        for (c1x, c1y, c1z, qx, qy, qz, e2q,
             n2x, n2y, n2z) in tri_pre:
            det = -(dx * n2x + dy * n2y + dz * n2z)
            sg = jnp.where(det >= 0.0, 1.0, -1.0)
            ad = det * sg
            au = (dx * c1x + dy * c1y + dz * c1z) * sg
            av = (dx * qx + dy * qy + dz * qz) * sg
            at = e2q * sg
            blocked |= ((ad >= 1e-6) & (au >= 0.0) & (av >= 0.0)
                        & (au + av <= ad) & (at >= t_min * ad)
                        & (at <= t_max * ad))
        for j, num in enumerate(pl_pre):
            denom = (dx * pln[3, j] + dy * pln[4, j] + dz * pln[5, j])
            para = denom == 0.0
            tj = num / jnp.where(para, 1.0, denom)
            blocked |= (~para) & (tj >= t_min) & (tj <= t_max)
        if box_pre:
            # Box occluders (intersect.box_blocked semantics): the slab
            # interval's endpoints are the two surface crossings; hit in
            # range iff near or far lands in [t_min, t_max].
            ivx = 1.0 / jnp.where(dx == 0.0, 1e-30, dx)
            ivy = 1.0 / jnp.where(dy == 0.0, 1e-30, dy)
            ivz = 1.0 / jnp.where(dz == 0.0, 1e-30, dz)
            for (lx, ly, lz, hx_, hy_, hz_) in box_pre:
                near, far = _slab_near_far(lx, ly, lz, hx_, hy_, hz_,
                                           ivx, ivy, ivz)
                blocked |= ((near <= far)
                            & (((near >= t_min) & (near <= t_max))
                               | ((far >= t_min) & (far <= t_max))))
        return blocked

    # -- fori-loop variants: same math, dynamic SMEM row reads -------------
    # Unrolled loops give Mosaic the best pipelining but compile time and
    # code size scale with the scene; past UNROLL_PRIM_LIMIT primitives the
    # kernels below iterate with lax.fori_loop instead (carry vectors are
    # f32 - i1 vector carries fail to legalize).
    loop_mode = mode in ("loop", "bvh", "stream")

    def closest_hit_loop(sph, tri, pln, box, ox, oy, oz, dx, dy, dz):
        shape = ox.shape
        zeros = jnp.zeros(shape)
        a = dx * dx + dy * dy + dz * dz
        inv_a = 1.0 / a

        def sph_body(j, carry):
            t_best, nx, ny, nz, mat = carry
            cx, cy, cz, r, m = (sph[0, j], sph[1, j], sph[2, j],
                                sph[3, j], sph[4, j])
            ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
            half_b = ocx * dx + ocy * dy + ocz * dz
            c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
            disc = half_b * half_b - a * c
            ok = disc >= 0.0
            sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
            r0 = (-half_b - sq) * inv_a
            r1 = (-half_b + sq) * inv_a
            in0 = ok & (r0 >= t_min) & (r0 <= t_best)
            in1 = ok & (r1 >= t_min) & (r1 <= t_best)
            tj = jnp.where(in0, r0, jnp.where(in1, r1, BIG))
            win = tj < t_best
            inv_r = 1.0 / r
            return (jnp.where(win, tj, t_best),
                    jnp.where(win, (ox + dx * tj - cx) * inv_r, nx),
                    jnp.where(win, (oy + dy * tj - cy) * inv_r, ny),
                    jnp.where(win, (oz + dz * tj - cz) * inv_r, nz),
                    jnp.where(win, m, mat))

        def tri_body(j, carry):
            t_best, nx, ny, nz, mat = carry
            e1x, e1y, e1z = tri[3, j], tri[4, j], tri[5, j]
            e2x, e2y, e2z = tri[6, j], tri[7, j], tri[8, j]
            hx = dy * e2z - dz * e2y
            hy = dz * e2x - dx * e2z
            hz = dx * e2y - dy * e2x
            det = e1x * hx + e1y * hy + e1z * hz
            good = jnp.abs(det) >= 1e-6
            f = 1.0 / jnp.where(good, det, 1.0)
            sx, sy, sz = ox - tri[0, j], oy - tri[1, j], oz - tri[2, j]
            u = f * (sx * hx + sy * hy + sz * hz)
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            v = f * (dx * qx + dy * qy + dz * qz)
            tj = f * (e2x * qx + e2y * qy + e2z * qz)
            win = (good & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
                   & (u + v <= 1.0) & (tj >= t_min) & (tj < t_best))
            snx, sny, snz = _tri_smooth_normal(tri, j, u, v,
                                               tri[9, j], tri[10, j],
                                               tri[11, j])
            return (jnp.where(win, tj, t_best),
                    jnp.where(win, snx, nx),
                    jnp.where(win, sny, ny),
                    jnp.where(win, snz, nz),
                    jnp.where(win, tri[12, j], mat))

        def pln_body(j, carry):
            t_best, nx, ny, nz, mat = carry
            pnx, pny, pnz = pln[3, j], pln[4, j], pln[5, j]
            denom = dx * pnx + dy * pny + dz * pnz
            para = denom == 0.0
            tj = ((pln[0, j] - ox) * pnx + (pln[1, j] - oy) * pny
                  + (pln[2, j] - oz) * pnz) / jnp.where(para, 1.0, denom)
            win = (~para) & (tj >= t_min) & (tj < t_best)
            return (jnp.where(win, tj, t_best),
                    jnp.where(win, pnx, nx),
                    jnp.where(win, pny, ny),
                    jnp.where(win, pnz, nz),
                    jnp.where(win, pln[6, j], mat))

        carry = (jnp.full(shape, BIG), zeros, zeros, zeros, zeros)
        if ns:
            carry = jax.lax.fori_loop(0, ns, sph_body, carry)
        if nt:
            carry = jax.lax.fori_loop(0, nt_occl, tri_body, carry)
        if npl:
            carry = jax.lax.fori_loop(0, npl, pln_body, carry)
        if nb:
            carry = _box_closest(box, carry, ox, oy, oz, dx, dy, dz)
        return carry

    def any_hit_loop(sph, tri, pln, box, ox, oy, oz, dx, dy, dz, t_max):
        a = dx * dx + dy * dy + dz * dz
        inv_a = 1.0 / a

        def sph_body(j, blocked_f):
            cx, cy, cz, r = sph[0, j], sph[1, j], sph[2, j], sph[3, j]
            ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
            half_b = ocx * dx + ocy * dy + ocz * dz
            c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
            disc = half_b * half_b - a * c
            ok = disc >= 0.0
            sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
            r0 = (-half_b - sq) * inv_a
            r1 = (-half_b + sq) * inv_a
            hit = ok & (((r0 >= t_min) & (r0 <= t_max))
                        | ((r1 >= t_min) & (r1 <= t_max)))
            return jnp.maximum(blocked_f, jnp.where(hit, 1.0, 0.0))

        def tri_body(j, blocked_f):
            # Division-free any-hit (see intersect.triangle_blocked /
            # any_hit_pre) with the same expression order.
            e1x, e1y, e1z = tri[3, j], tri[4, j], tri[5, j]
            e2x, e2y, e2z = tri[6, j], tri[7, j], tri[8, j]
            sx, sy, sz = ox - tri[0, j], oy - tri[1, j], oz - tri[2, j]
            n2x = e1y * e2z - e1z * e2y
            n2y = e1z * e2x - e1x * e2z
            n2z = e1x * e2y - e1y * e2x
            c1x = e2y * sz - e2z * sy
            c1y = e2z * sx - e2x * sz
            c1z = e2x * sy - e2y * sx
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            det = -(dx * n2x + dy * n2y + dz * n2z)
            sg = jnp.where(det >= 0.0, 1.0, -1.0)
            ad = det * sg
            au = (dx * c1x + dy * c1y + dz * c1z) * sg
            av = (dx * qx + dy * qy + dz * qz) * sg
            at = (e2x * qx + e2y * qy + e2z * qz) * sg
            hit = ((ad >= 1e-6) & (au >= 0.0) & (av >= 0.0)
                   & (au + av <= ad) & (at >= t_min * ad)
                   & (at <= t_max * ad))
            return jnp.maximum(blocked_f, jnp.where(hit, 1.0, 0.0))

        def pln_body(j, blocked_f):
            denom = dx * pln[3, j] + dy * pln[4, j] + dz * pln[5, j]
            para = denom == 0.0
            tj = ((pln[0, j] - ox) * pln[3, j]
                  + (pln[1, j] - oy) * pln[4, j]
                  + (pln[2, j] - oz) * pln[5, j]) \
                / jnp.where(para, 1.0, denom)
            hit = (~para) & (tj >= t_min) & (tj <= t_max)
            return jnp.maximum(blocked_f, jnp.where(hit, 1.0, 0.0))

        def box_body(j, blocked_f):
            # intersect.box_blocked semantics (near/far two-crossing
            # test); cube faces [nt_occl, nt) are excluded above.
            ivx = 1.0 / jnp.where(dx == 0.0, 1e-30, dx)
            ivy = 1.0 / jnp.where(dy == 0.0, 1e-30, dy)
            ivz = 1.0 / jnp.where(dz == 0.0, 1e-30, dz)
            near, far = _slab_near_far(
                box[0, j] - ox, box[1, j] - oy, box[2, j] - oz,
                box[3, j] - ox, box[4, j] - oy, box[5, j] - oz,
                ivx, ivy, ivz)
            hit = ((near <= far)
                   & (((near >= t_min) & (near <= t_max))
                      | ((far >= t_min) & (far <= t_max))))
            return jnp.maximum(blocked_f, jnp.where(hit, 1.0, 0.0))

        blocked_f = jnp.zeros(ox.shape)
        if ns:
            blocked_f = jax.lax.fori_loop(0, ns, sph_body, blocked_f)
        if nt_occl:
            blocked_f = jax.lax.fori_loop(0, nt_occl, tri_body, blocked_f)
        if nb:
            blocked_f = jax.lax.fori_loop(0, nb, box_body, blocked_f)
        if npl:
            blocked_f = jax.lax.fori_loop(0, npl, pln_body, blocked_f)
        return blocked_f > 0.0

    stream_mode = mode == "stream"

    def kernel(*refs):
        i0 = 0
        if mode == "bvh":
            bvh, pidx = refs[0], refs[1]
            i0 = 2
            if wide:
                bvh4 = refs[2]
                stack_ref = refs[-1]  # SMEM scratch (after the outputs)
                i0 = 3
        elif stream_mode:
            # nodes in SMEM; leaf prim rows DMA'd from the HBM table
            # into the SMEM scratch (after the outputs) per leaf visit.
            bvh, stream_hbm = refs[0], refs[1]
            stream_scr, dma_sem = refs[-2], refs[-1]
            i0 = 2
            if wide:
                bvh4 = refs[2]
                stack_ref = refs[-3]
                i0 = 3
        sph, tri, pln, box, lit, mtab = refs[i0:i0 + 6]
        pix_ref, samp_ref = refs[i0 + 6], refs[i0 + 7]
        (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
         tx_ref, ty_ref, tz_ref, al_ref) = refs[i0 + 8:i0 + 18]
        rx_ref, ry_ref, rz_ref = refs[i0 + 18:i0 + 21]
        state_refs = refs[i0 + 21:i0 + 31] if return_state else ()
        pix = pix_ref[:]
        samp = samp_ref[:]

        if mode in ("bvh", "stream"):
            soft_guard_fn = None  # the fused cone walk subsumes the guard
            soft_prim_sets_fn = None
            # ---- packet BVH walk over the scene tree in SMEM ----------
            # Row tests read primitive attributes through a `get`
            # accessor: bvh mode binds it to the SMEM sph/tri tables at a
            # prim id; stream mode binds it to the DMA'd leaf scratch at
            # a local row (unified row layout, pack_stream_table).
            iv = lambda d: 1.0 / jnp.where(d == 0.0, 1e-30, d)
            has_vn = ((stream_cols >= STREAM_COLS_VN) if stream_mode
                      else tri.shape[0] >= 22)

            if stream_mode:
                def _dma_leaf(first):
                    cp = pltpu.make_async_copy(
                        stream_hbm.at[pl.ds(first, leaf_max), :],
                        stream_scr, dma_sem)
                    cp.start()
                    cp.wait()

                def _sget(j):
                    # unified row: center in the v0 slot, radius in e1.x,
                    # mat in col 13 (see pack_stream_table)
                    cols = (1, 2, 3, 4, 13)
                    return lambda c: stream_scr[j, cols[c]]

                def _tget(j):
                    # tri-layout col c -> unified col c+1
                    return lambda c: stream_scr[j, c + 1]
            else:
                def _sget(pid):
                    return lambda c: sph[c, pid]

                def _tget(tj_i):
                    return lambda c: tri[c, tj_i]

            def _sph_closest_row(get, cy, ox, oy, oz, dx, dy, dz, a,
                                 inv_a):
                t_best, nx, ny, nz, mat = cy
                cx, cyy, cz = get(0), get(1), get(2)
                r, m = get(3), get(4)
                ocx, ocy, ocz = ox - cx, oy - cyy, oz - cz
                half_b = ocx * dx + ocy * dy + ocz * dz
                c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
                disc = half_b * half_b - a * c
                ok = disc >= 0.0
                sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
                r0 = (-half_b - sq) * inv_a
                r1 = (-half_b + sq) * inv_a
                in0 = ok & (r0 >= t_min) & (r0 <= t_best)
                in1 = ok & (r1 >= t_min) & (r1 <= t_best)
                tj = jnp.where(in0, r0, jnp.where(in1, r1, BIG))
                win = tj < t_best
                inv_r = 1.0 / r
                return (jnp.where(win, tj, t_best),
                        jnp.where(win, (ox + dx * tj - cx) * inv_r, nx),
                        jnp.where(win, (oy + dy * tj - cyy) * inv_r, ny),
                        jnp.where(win, (oz + dz * tj - cz) * inv_r, nz),
                        jnp.where(win, m, mat))

            def _tri_closest_row(get, occl_ok, cy, ox, oy, oz, dx, dy, dz):
                t_best, nx, ny, nz, mat = cy
                e1x, e1y, e1z = get(3), get(4), get(5)
                e2x, e2y, e2z = get(6), get(7), get(8)
                hx = dy * e2z - dz * e2y
                hy = dz * e2x - dx * e2z
                hz = dx * e2y - dy * e2x
                det = e1x * hx + e1y * hy + e1z * hz
                good = jnp.abs(det) >= 1e-6
                f = 1.0 / jnp.where(good, det, 1.0)
                sx = ox - get(0)
                sy = oy - get(1)
                sz = oz - get(2)
                u = f * (sx * hx + sy * hy + sz * hz)
                qx = sy * e1z - sz * e1y
                qy = sz * e1x - sx * e1z
                qz = sx * e1y - sy * e1x
                v = f * (dx * qx + dy * qy + dz * qz)
                tj = f * (e2x * qx + e2y * qy + e2z * qz)
                win = (good & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
                       & (u + v <= 1.0) & (tj >= t_min) & (tj < t_best))
                # cube faces [nt_occl, nt) are hit as boxes (carry
                # seeded before the walk); scalar mask (stream mode
                # resolves it via the row tag at the dispatch site)
                win = win & occl_ok
                snx, sny, snz = _tri_smooth_normal_g(get, has_vn, u, v,
                                                     get(9), get(10),
                                                     get(11))
                return (jnp.where(win, tj, t_best),
                        jnp.where(win, snx, nx),
                        jnp.where(win, sny, ny),
                        jnp.where(win, snz, nz),
                        jnp.where(win, get(12), mat))

            def _pln_closest_row(j, cy, ox, oy, oz, dx, dy, dz):
                t_best, nx, ny, nz, mat = cy
                pnx, pny, pnz = pln[3, j], pln[4, j], pln[5, j]
                denom = dx * pnx + dy * pny + dz * pnz
                para = denom == 0.0
                tj = ((pln[0, j] - ox) * pnx + (pln[1, j] - oy) * pny
                      + (pln[2, j] - oz) * pnz) \
                    / jnp.where(para, 1.0, denom)
                win = (~para) & (tj >= t_min) & (tj < t_best)
                return (jnp.where(win, tj, t_best),
                        jnp.where(win, pnx, nx),
                        jnp.where(win, pny, ny),
                        jnp.where(win, pnz, nz),
                        jnp.where(win, pln[6, j], mat))

            def _leaf_closest(first, cnt, carry, ox, oy, oz, dx, dy, dz,
                              a, inv_a):
                """Run a leaf's primitive tests on the closest-hit carry
                (traced first/cnt; sphere-vs-triangle dispatch on pid in
                bvh mode, on the row tag in stream mode)."""
                if stream_mode:
                    _dma_leaf(first)

                    def lb(j, cy2):
                        tag = stream_scr[j, 0].astype(jnp.int32)
                        sphf = lambda c2: _sph_closest_row(
                            _sget(j), c2, ox, oy, oz, dx, dy, dz,
                            a, inv_a)
                        # tag 2 = cube-face row (boxes own closest-hit;
                        # kept in the tree for the conservative masks)
                        trif = lambda c2: _tri_closest_row(
                            _tget(j), tag == 1, c2, ox, oy, oz,
                            dx, dy, dz)
                        if ns and nt:
                            return jax.lax.cond(tag == 0, sphf, trif, cy2)
                        if ns:
                            return sphf(cy2)
                        return trif(cy2)
                    return jax.lax.fori_loop(0, cnt, lb, carry)

                def lb(j, cy2):
                    pid = pidx[0, first + j].astype(jnp.int32)
                    if ns and nt:
                        return jax.lax.cond(
                            pid < ns,
                            lambda c2: _sph_closest_row(
                                _sget(pid), c2, ox, oy, oz, dx, dy, dz,
                                a, inv_a),
                            lambda c2: _tri_closest_row(
                                _tget(pid - ns), pid - ns < nt_occl, c2,
                                ox, oy, oz, dx, dy, dz),
                            cy2)
                    if ns:
                        return _sph_closest_row(
                            _sget(pid), cy2, ox, oy, oz, dx, dy, dz,
                            a, inv_a)
                    return _tri_closest_row(_tget(pid), pid < nt_occl,
                                            cy2, ox, oy, oz, dx, dy, dz)
                return jax.lax.fori_loop(0, cnt, lb, carry)

            def closest_fn_binary(ox, oy, oz, dx, dy, dz, alive_f,
                                  carry0):
                a = dx * dx + dy * dy + dz * dz
                inv_a = 1.0 / a
                ivx, ivy, ivz = iv(dx), iv(dy), iv(dz)

                def cond(c):
                    return c[0] < n_nodes

                def body(c):
                    cur = c[0]
                    carry = c[1:]
                    t_best = carry[0]
                    t0x = (bvh[0, cur] - ox) * ivx
                    t1x = (bvh[3, cur] - ox) * ivx
                    t0y = (bvh[1, cur] - oy) * ivy
                    t1y = (bvh[4, cur] - oy) * ivy
                    t0z = (bvh[2, cur] - oz) * ivz
                    t1z = (bvh[5, cur] - oz) * ivz
                    near = jnp.maximum(
                        jnp.maximum(jnp.minimum(t0x, t1x),
                                    jnp.minimum(t0y, t1y)),
                        jnp.maximum(jnp.minimum(t0z, t1z), t_min))
                    far = jnp.minimum(
                        jnp.minimum(jnp.maximum(t0x, t1x),
                                    jnp.maximum(t0y, t1y)),
                        jnp.minimum(jnp.maximum(t0z, t1z), t_best))
                    boxed = jnp.max(
                        jnp.where(near <= far, alive_f, 0.0)) > 0.0
                    skip = bvh[6, cur].astype(jnp.int32)
                    first = bvh[7, cur].astype(jnp.int32)
                    cnt = bvh[8, cur].astype(jnp.int32)
                    is_leaf = cnt > 0

                    carry = jax.lax.cond(
                        boxed & is_leaf,
                        lambda cy: _leaf_closest(first, cnt, cy, ox, oy,
                                                 oz, dx, dy, dz, a, inv_a),
                        lambda cy: cy, carry)
                    nxt = jnp.where(boxed & (~is_leaf), cur + 1, skip)
                    return (nxt,) + carry

                init = (jnp.int32(0),) + carry0
                out = jax.lax.while_loop(cond, body, init)
                return out[1:]

            def closest_fn_wide(ox, oy, oz, dx, dy, dz, alive_f,
                                carry0):
                """4-ary stack walk over the WideBVH4 table: pop a node,
                slab-test its 4 slots (independent reduces -> they
                pipeline), run boxed leaf slots, push boxed inner slots.
                ~4x fewer latency-bound steps than the binary skip walk
                on ring scenes (tools/sim_bvh4.py)."""
                a = dx * dx + dy * dy + dz * dz
                inv_a = 1.0 / a
                ivx, ivy, ivz = iv(dx), iv(dy), iv(dz)

                def cond(c):
                    return c[0] > 0

                def body(c):
                    sp0 = c[0]
                    carry = c[1:]
                    t_best = carry[0]
                    cur = stack_ref[sp0 - 1]
                    boxed = []
                    meta = []
                    for s in range(4):
                        b = 9 * s
                        t0x = (bvh4[b + 0, cur] - ox) * ivx
                        t1x = (bvh4[b + 3, cur] - ox) * ivx
                        t0y = (bvh4[b + 1, cur] - oy) * ivy
                        t1y = (bvh4[b + 4, cur] - oy) * ivy
                        t0z = (bvh4[b + 2, cur] - oz) * ivz
                        t1z = (bvh4[b + 5, cur] - oz) * ivz
                        near = jnp.maximum(
                            jnp.maximum(jnp.minimum(t0x, t1x),
                                        jnp.minimum(t0y, t1y)),
                            jnp.maximum(jnp.minimum(t0z, t1z), t_min))
                        far = jnp.minimum(
                            jnp.minimum(jnp.maximum(t0x, t1x),
                                        jnp.maximum(t0y, t1y)),
                            jnp.minimum(jnp.maximum(t0z, t1z), t_best))
                        boxed.append(jnp.max(
                            jnp.where(near <= far, alive_f, 0.0)) > 0.0)
                        meta.append(
                            (bvh4[b + 6, cur].astype(jnp.int32),
                             bvh4[b + 7, cur].astype(jnp.int32),
                             bvh4[b + 8, cur].astype(jnp.int32)))
                    sp = sp0 - 1
                    for s in range(4):
                        child, first, cnt = meta[s]
                        carry = jax.lax.cond(
                            boxed[s] & (cnt > 0),
                            lambda cy, f=first, n_=cnt: _leaf_closest(
                                f, n_, cy, ox, oy, oz, dx, dy, dz,
                                a, inv_a),
                            lambda cy: cy, carry)
                        push = boxed[s] & (child >= 0)
                        # Unconditional store: sp only advances on push,
                        # so a non-pushed slot's value is overwritten by
                        # the next push or never read.
                        stack_ref[sp] = child
                        sp = sp + jnp.where(push, jnp.int32(1),
                                            jnp.int32(0))
                    return (sp,) + carry

                stack_ref[0] = jnp.int32(0)
                init = (jnp.int32(1),) + carry0
                out = jax.lax.while_loop(cond, body, init)
                return out[1:]

            def closest_fn(ox, oy, oz, dx, dy, dz, alive_f):
                shape = ox.shape
                zeros = jnp.zeros(shape)
                carry0 = (jnp.full(shape, BIG), zeros, zeros, zeros,
                          zeros)
                if nb:
                    # Box occluders resolve BEFORE the walk: their t
                    # seeds t_best, so subtrees behind a cube face are
                    # culled (the cube's own face triangles - still in
                    # the tree for the conservative masks - are skipped
                    # in _tri_closest_row).
                    carry0 = _box_closest(box, carry0, ox, oy, oz,
                                          dx, dy, dz)
                walk = closest_fn_wide if wide else closest_fn_binary
                carry = walk(ox, oy, oz, dx, dy, dz, alive_f, carry0)
                if npl:
                    carry = jax.lax.fori_loop(
                        0, npl,
                        lambda j, cy: _pln_closest_row(j, cy, ox, oy, oz,
                                                       dx, dy, dz),
                        carry)
                return carry

            def occl_pre_fn(px_, py_, pz_):
                return (px_, py_, pz_)

            def occl_light_fn(pre, mask_f, lx, ly, lz, dist):
                """Carry the shadow-relevance mask into the walk: lanes
                whose lighting terms are provably zero start the any-hit
                walk pre-marked blocked, so the packet descends only for
                nodes some RELEVANT lane's segment touches and exits as
                soon as every relevant lane has resolved. (A candidate-
                list variant - one hull walk per (block, light) into SMEM
                scratch - was tried first and loses badly on wide blocks:
                the hull covers most of the scene and overflow falls back
                to the full primitive loop.)"""
                return (pre, mask_f)

            def occl_test_fn(lctx, ddx, ddy, ddz, tmax):
                """Packet any-hit BVH walk (early-exit shadow test).

                Returns blocked>0 per lane; pre-masked lanes report
                'blocked', which every caller ignores (their terms carry
                a zero cos/alive factor)."""
                (px_, py_, pz_), mask_f = lctx
                a = ddx * ddx + ddy * ddy + ddz * ddz
                inv_a = 1.0 / a

                def _sph_any(get, bf):
                    ocx = px_ - get(0)
                    ocy = py_ - get(1)
                    ocz = pz_ - get(2)
                    r = get(3)
                    half_b = ocx * ddx + ocy * ddy + ocz * ddz
                    c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
                    disc = half_b * half_b - a * c
                    ok = disc >= 0.0
                    sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
                    r0 = (-half_b - sq) * inv_a
                    r1 = (-half_b + sq) * inv_a
                    hit = ok & (((r0 >= t_min) & (r0 <= tmax))
                                | ((r1 >= t_min) & (r1 <= tmax)))
                    return jnp.maximum(bf, jnp.where(hit, 1.0, 0.0))

                def _tri_any(get, occl_ok, bf):
                    # Division-free any-hit (intersect.triangle_blocked
                    # expression order).
                    e1x, e1y, e1z = get(3), get(4), get(5)
                    e2x, e2y, e2z = get(6), get(7), get(8)
                    sx = px_ - get(0)
                    sy = py_ - get(1)
                    sz = pz_ - get(2)
                    n2x = e1y * e2z - e1z * e2y
                    n2y = e1z * e2x - e1x * e2z
                    n2z = e1x * e2y - e1y * e2x
                    c1x = e2y * sz - e2z * sy
                    c1y = e2z * sx - e2x * sz
                    c1z = e2x * sy - e2y * sx
                    qx = sy * e1z - sz * e1y
                    qy = sz * e1x - sx * e1z
                    qz = sx * e1y - sy * e1x
                    det = -(ddx * n2x + ddy * n2y + ddz * n2z)
                    sg = jnp.where(det >= 0.0, 1.0, -1.0)
                    ad = det * sg
                    au = (ddx * c1x + ddy * c1y + ddz * c1z) * sg
                    av = (ddx * qx + ddy * qy + ddz * qz) * sg
                    at = (e2x * qx + e2y * qy + e2z * qz) * sg
                    hit = ((ad >= 1e-6) & (au >= 0.0) & (av >= 0.0)
                           & (au + av <= ad) & (at >= t_min * ad)
                           & (at <= tmax * ad))
                    # cube faces [nt_occl, nt) are handled by the box
                    # pre-tests; mask them here (scalar compare)
                    hit = hit & occl_ok
                    return jnp.maximum(bf, jnp.where(hit, 1.0, 0.0))

                ivx, ivy, ivz = iv(ddx), iv(ddy), iv(ddz)

                # Planes and box occluders are not in the tree; test
                # them first so their blocks feed the walk's early exit.
                bf = 1.0 - mask_f
                if npl:
                    def pb(j, b):
                        denom = (ddx * pln[3, j] + ddy * pln[4, j]
                                 + ddz * pln[5, j])
                        para = denom == 0.0
                        tj = ((pln[0, j] - px_) * pln[3, j]
                              + (pln[1, j] - py_) * pln[4, j]
                              + (pln[2, j] - pz_) * pln[5, j]) \
                            / jnp.where(para, 1.0, denom)
                        hit = (~para) & (tj >= t_min) & (tj <= tmax)
                        return jnp.maximum(b, jnp.where(hit, 1.0, 0.0))
                    bf = jax.lax.fori_loop(0, npl, pb, bf)
                for j in range(nb):
                    # intersect.box_blocked semantics
                    bnear, bfar = _slab_near_far(
                        box[0, j] - px_, box[1, j] - py_,
                        box[2, j] - pz_, box[3, j] - px_,
                        box[4, j] - py_, box[5, j] - pz_,
                        ivx, ivy, ivz)
                    bhit = ((bnear <= bfar)
                            & (((bnear >= t_min) & (bnear <= tmax))
                               | ((bfar >= t_min) & (bfar <= tmax))))
                    bf = jnp.maximum(bf, jnp.where(bhit, 1.0, 0.0))

                def _leaf_any(first, cnt, b2):
                    if stream_mode:
                        _dma_leaf(first)

                        def lb(j, b3):
                            tag = stream_scr[j, 0].astype(jnp.int32)
                            sphf = lambda b: _sph_any(_sget(j), b)
                            trif = lambda b: _tri_any(_tget(j),
                                                      tag == 1, b)
                            if ns and nt:
                                return jax.lax.cond(tag == 0, sphf,
                                                    trif, b3)
                            if ns:
                                return sphf(b3)
                            return trif(b3)
                        return jax.lax.fori_loop(0, cnt, lb, b2)

                    def lb(j, b3):
                        pid = pidx[0, first + j].astype(jnp.int32)
                        if ns and nt:
                            return jax.lax.cond(
                                pid < ns,
                                lambda b: _sph_any(_sget(pid), b),
                                lambda b: _tri_any(_tget(pid - ns),
                                                   pid - ns < nt_occl,
                                                   b), b3)
                        if ns:
                            return _sph_any(_sget(pid), b3)
                        return _tri_any(_tget(pid), pid < nt_occl, b3)
                    return jax.lax.fori_loop(0, cnt, lb, b2)

                def wcond(c):
                    return c[0] < n_nodes

                def wbody(c):
                    cur, bf2 = c
                    t0x = (bvh[0, cur] - px_) * ivx
                    t1x = (bvh[3, cur] - px_) * ivx
                    t0y = (bvh[1, cur] - py_) * ivy
                    t1y = (bvh[4, cur] - py_) * ivy
                    t0z = (bvh[2, cur] - pz_) * ivz
                    t1z = (bvh[5, cur] - pz_) * ivz
                    near = jnp.maximum(
                        jnp.maximum(jnp.minimum(t0x, t1x),
                                    jnp.minimum(t0y, t1y)),
                        jnp.maximum(jnp.minimum(t0z, t1z), t_min))
                    far = jnp.minimum(
                        jnp.minimum(jnp.maximum(t0x, t1x),
                                    jnp.maximum(t0y, t1y)),
                        jnp.minimum(jnp.maximum(t0z, t1z), tmax))
                    want = jnp.where((near <= far) & (bf2 < 1.0),
                                     1.0, 0.0)
                    boxed = jnp.max(want) > 0.0
                    skip = bvh[6, cur].astype(jnp.int32)
                    first = bvh[7, cur].astype(jnp.int32)
                    cnt = bvh[8, cur].astype(jnp.int32)
                    is_leaf = cnt > 0

                    bf2 = jax.lax.cond(
                        boxed & is_leaf,
                        lambda b: _leaf_any(first, cnt, b),
                        lambda b: b, bf2)
                    done = jnp.min(bf2) >= 1.0
                    nxt = jnp.where(done, n_nodes,
                                    jnp.where(boxed & (~is_leaf),
                                              cur + 1, skip))
                    return nxt, bf2

                def wbody_wide(c):
                    sp0, bf2 = c[0], c[1]
                    cur = stack_ref[sp0 - 1]
                    boxed = []
                    meta = []
                    for s in range(4):
                        b = 9 * s
                        t0x = (bvh4[b + 0, cur] - px_) * ivx
                        t1x = (bvh4[b + 3, cur] - px_) * ivx
                        t0y = (bvh4[b + 1, cur] - py_) * ivy
                        t1y = (bvh4[b + 4, cur] - py_) * ivy
                        t0z = (bvh4[b + 2, cur] - pz_) * ivz
                        t1z = (bvh4[b + 5, cur] - pz_) * ivz
                        near = jnp.maximum(
                            jnp.maximum(jnp.minimum(t0x, t1x),
                                        jnp.minimum(t0y, t1y)),
                            jnp.maximum(jnp.minimum(t0z, t1z), t_min))
                        far = jnp.minimum(
                            jnp.minimum(jnp.maximum(t0x, t1x),
                                        jnp.maximum(t0y, t1y)),
                            jnp.minimum(jnp.maximum(t0z, t1z), tmax))
                        boxed.append(jnp.max(jnp.where(
                            (near <= far) & (bf2 < 1.0), 1.0, 0.0)) > 0.0)
                        meta.append(
                            (bvh4[b + 6, cur].astype(jnp.int32),
                             bvh4[b + 7, cur].astype(jnp.int32),
                             bvh4[b + 8, cur].astype(jnp.int32)))
                    sp = sp0 - 1
                    for s in range(4):
                        child, first, cnt = meta[s]
                        bf2 = jax.lax.cond(
                            boxed[s] & (cnt > 0),
                            lambda b, f=first, n_=cnt: _leaf_any(f, n_, b),
                            lambda b: b, bf2)
                        push = boxed[s] & (child >= 0)
                        stack_ref[sp] = child
                        sp = sp + jnp.where(push, jnp.int32(1),
                                            jnp.int32(0))
                    done = jnp.min(bf2) >= 1.0
                    return jnp.where(done, jnp.int32(0), sp), bf2

                if wide:
                    stack_ref[0] = jnp.int32(0)
                    _, bf = jax.lax.while_loop(
                        lambda c: c[0] > 0, wbody_wide, (jnp.int32(1), bf))
                else:
                    _, bf = jax.lax.while_loop(wcond, wbody,
                                               (jnp.int32(0), bf))
                return bf > 0.0

            def soft_fused_fn(pre, need, ldx, ldy, ldz, dist, bounce_u,
                              li):
                """All soft-shadow samples in ONE conservative packet walk.

                Walk steps are latency-bound (slab test + cross-lane
                reduce + scalar branch per node), and the plain soft loop
                pays that 16x per (block, light, bounce). Here node slabs
                are tested ONCE with the central light direction against
                boxes inflated by 0.102*dist: the 0.1-jitter direction
                cone deviates from the central unit direction by at most
                ~0.1002 (chord of the asin(0.1) cone), so a perturbed hit
                at parameter t <= dist lies within 0.102*dist of the
                central ray, and its nearest central parameter is
                >= cos(asin(0.1))*t = 0.99499*t (hence the 0.9949*t_min near clamp). The
                visited leaves are therefore a strict superset of every
                per-sample walk's; leaf primitives are tested per sample
                with EXACTLY the per-sample arithmetic, so all verdicts
                are bit-identical to 16 separate walks. Blocked bits
                live in one int32 lane mask (bit s = sample s blocked /
                lane irrelevant); the walk exits when every lane's mask
                is full.
                """
                px_, py_, pz_ = pre
                ss = shadow_samples
                FULL = jnp.int32((1 << ss) - 1)
                sd = []
                for s in range(ss):
                    stream = (bounce_u
                              * np.uint32(rng.STREAMS_PER_BOUNCE)
                              + np.uint32(rng.shadow_stream(li, s, ss)))
                    bx, by, bz = _unit_ball(pix, samp, stream, seed)
                    sdx, sdy, sdz = _norm3(ldx + 0.1 * bx,
                                           ldy + 0.1 * by,
                                           ldz + 0.1 * bz)
                    a_s = sdx * sdx + sdy * sdy + sdz * sdz
                    sd.append((sdx, sdy, sdz, a_s, 1.0 / a_s))

                bm = jnp.where(need, jnp.int32(0), FULL)
                # Planes and box occluders live outside the tree: test
                # every sample first so blocked lanes feed the walk's
                # early exit.
                for j in range(npl):
                    pnx, pny, pnz = pln[3, j], pln[4, j], pln[5, j]
                    num = ((pln[0, j] - px_) * pnx
                           + (pln[1, j] - py_) * pny
                           + (pln[2, j] - pz_) * pnz)
                    for s, (sdx, sdy, sdz, _, _) in enumerate(sd):
                        denom = sdx * pnx + sdy * pny + sdz * pnz
                        para = denom == 0.0
                        tj = num / jnp.where(para, 1.0, denom)
                        hit = (~para) & (tj >= t_min) & (tj <= dist)
                        bm = bm | jnp.where(hit, jnp.int32(1 << s),
                                            jnp.int32(0))
                if nb:
                    box_lo = [(box[0, j] - px_, box[1, j] - py_,
                               box[2, j] - pz_) for j in range(nb)]
                    box_hi = [(box[3, j] - px_, box[4, j] - py_,
                               box[5, j] - pz_) for j in range(nb)]
                for s, (sdx, sdy, sdz, _, _) in (enumerate(sd) if nb
                                                 else ()):
                    sivx = iv(sdx)
                    sivy = iv(sdy)
                    sivz = iv(sdz)
                    for j in range(nb):
                        lx, ly, lz = box_lo[j]
                        hx_, hy_, hz_ = box_hi[j]
                        bnear, bfar = _slab_near_far(
                            lx, ly, lz, hx_, hy_, hz_,
                            sivx, sivy, sivz)
                        hit = ((bnear <= bfar)
                               & (((bnear >= t_min) & (bnear <= dist))
                                  | ((bfar >= t_min) & (bfar <= dist))))
                        bm = bm | jnp.where(hit, jnp.int32(1 << s),
                                            jnp.int32(0))

                # Cone inflation is DISTANCE-PROPORTIONAL (round 5): a
                # jittered hit at parameter t lies within 0.1002*t of the
                # central ray, and every point p of a node's box satisfies
                # |p - origin| <= d_far(box), so inflating that node by
                # 0.102*min(d_far, dist) still visits a strict superset
                # of every per-sample walk's leaves. The old constant
                # 0.102*dist bound made the fused walk degenerate on
                # compact multi-K-prim scenes (every walk visited nearly
                # all leaves - the round-4 stream regression); nearby
                # nodes now get near-zero slack. Same per-node
                # farthest-corner recipe as pixel_mask_pallas.
                cone = np.float32(0.102)
                ivx, ivy, ivz = iv(ldx), iv(ldy), iv(ldz)
                tminc = np.float32(0.9949) * t_min
                # A/B knob: RT_CONE_CONST=1 reverts to the round-2
                # constant 0.102*dist inflation (read at trace time).
                _cone_const = os.environ.get("RT_CONE_CONST", "") == "1"

                def _node_delta(lox, loy, loz, hix, hiy, hiz):
                    if _cone_const:
                        return cone * dist
                    fx = jnp.maximum((lox - px_) * (lox - px_),
                                     (hix - px_) * (hix - px_))
                    fy = jnp.maximum((loy - py_) * (loy - py_),
                                     (hiy - py_) * (hiy - py_))
                    fz = jnp.maximum((loz - pz_) * (loz - pz_),
                                     (hiz - pz_) * (hiz - pz_))
                    return cone * jnp.minimum(jnp.sqrt(fx + fy + fz),
                                              dist)

                def _sph_all(get, b3):
                    ocx = px_ - get(0)
                    ocy = py_ - get(1)
                    ocz = pz_ - get(2)
                    r = get(3)
                    cc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
                    for s, (sdx, sdy, sdz, a_s, inv_a) in enumerate(sd):
                        half_b = ocx * sdx + ocy * sdy + ocz * sdz
                        disc = half_b * half_b - a_s * cc
                        ok = disc >= 0.0
                        sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
                        r0 = (-half_b - sq) * inv_a
                        r1 = (-half_b + sq) * inv_a
                        hit = ok & (((r0 >= t_min) & (r0 <= dist))
                                    | ((r1 >= t_min) & (r1 <= dist)))
                        b3 = b3 | jnp.where(hit, jnp.int32(1 << s),
                                            jnp.int32(0))
                    return b3

                def _tri_all(get, occl_ok, b3):
                    # Division-free any-hit with ALL per-direction cross
                    # products hoisted: c1/q/e2q/n2 are shared by the 16
                    # samples, each sample pays three dot products and
                    # the range compares (intersect.triangle_blocked
                    # expression order).
                    e1x, e1y, e1z = get(3), get(4), get(5)
                    e2x, e2y, e2z = get(6), get(7), get(8)
                    sx = px_ - get(0)
                    sy = py_ - get(1)
                    sz = pz_ - get(2)
                    n2x = e1y * e2z - e1z * e2y
                    n2y = e1z * e2x - e1x * e2z
                    n2z = e1x * e2y - e1y * e2x
                    c1x = e2y * sz - e2z * sy
                    c1y = e2z * sx - e2x * sz
                    c1z = e2x * sy - e2y * sx
                    qx = sy * e1z - sz * e1y
                    qy = sz * e1x - sx * e1z
                    qz = sx * e1y - sy * e1x
                    e2q = e2x * qx + e2y * qy + e2z * qz
                    is_occl = occl_ok  # cube faces -> box tests
                    for s, (sdx, sdy, sdz, _, _) in enumerate(sd):
                        det = -(sdx * n2x + sdy * n2y + sdz * n2z)
                        sg = jnp.where(det >= 0.0, 1.0, -1.0)
                        ad = det * sg
                        au = (sdx * c1x + sdy * c1y + sdz * c1z) * sg
                        av = (sdx * qx + sdy * qy + sdz * qz) * sg
                        at = e2q * sg
                        hit = ((ad >= 1e-6) & (au >= 0.0) & (av >= 0.0)
                               & (au + av <= ad) & (at >= t_min * ad)
                               & (at <= dist * ad)) & is_occl
                        b3 = b3 | jnp.where(hit, jnp.int32(1 << s),
                                            jnp.int32(0))
                    return b3

                # Per-ROW conservative cone guard (round 5, stream mode):
                # before paying the 16-sample tests for a row, one cheap
                # central-ray test against the row's bounding sphere
                # decides whether ANY sample could hit it (64-70% of the
                # fused soft cost is per-sample row tests). Skipping is
                # BIT-EXACT (hash-equal frames measured on TPU): if
                # sample s hits the row at t in [t_min, dist], the hit
                # point lies in the row's bounding sphere (m, br), within
                # 0.1002*min(t, dist) of the central LINE, and projects
                # to g in [0.9949*t_min - br, dist + br]; the guard tests
                # exactly those conditions with fp slack. Default OFF —
                # measured a NEGATIVE on TPU (grid-5833 14.7 vs 13.2 s
                # @5spp, 2026-08-20): the per-row cross-lane reduce +
                # scalar branch costs more than the skipped vector work,
                # the same latency-vs-vector verdict as the round-3
                # mid-trace split. RT_SOFT_ROW_GUARD=1 re-enables.
                row_guard = stream_mode and os.environ.get(
                    "RT_SOFT_ROW_GUARD", "0") == "1"
                eps_g = np.float32(1e-3)

                def _row_can(mx, my, mz, br, b3):
                    ocx, ocy, ocz = mx - px_, my - py_, mz - pz_
                    oc2 = ocx * ocx + ocy * ocy + ocz * ocz
                    g = ocx * ldx + ocy * ldy + ocz * ldz
                    dper2 = oc2 - g * g
                    ocn = jnp.sqrt(oc2)
                    slack = (eps_g + np.float32(1e-3) * br
                             + np.float32(1e-4) * ocn)
                    rhs = (br + cone * jnp.minimum(ocn + br, dist)
                           + slack)
                    can = ((dper2 <= rhs * rhs)
                           & (g >= -(br + slack))
                           & (g <= dist + br + slack)
                           & (b3 < FULL))
                    return jnp.max(jnp.where(can, 1.0, 0.0)) > 0.0

                def _leaf_all(first, cnt, b2):
                    if stream_mode:
                        _dma_leaf(first)

                        def lb(j, b3):
                            tag = stream_scr[j, 0].astype(jnp.int32)
                            sphf = lambda b: _sph_all(_sget(j), b)
                            trif = lambda b: _tri_all(_tget(j),
                                                      tag == 1, b)
                            if ns and nt:
                                test = lambda b: jax.lax.cond(
                                    tag == 0, sphf, trif, b)
                            elif ns:
                                test = sphf
                            else:
                                test = trif
                            if not row_guard:
                                return test(b3)
                            # Row bounding sphere (scalar math): sphere
                            # rows keep center in the v0 slot, radius in
                            # e1.x; triangle rows use the centroid +
                            # max-vertex-distance sphere (the same
                            # construction as soft_prim_sets_fn).
                            v0x, v0y, v0z = (stream_scr[j, 1],
                                             stream_scr[j, 2],
                                             stream_scr[j, 3])
                            e1x, e1y, e1z = (stream_scr[j, 4],
                                             stream_scr[j, 5],
                                             stream_scr[j, 6])
                            e2x, e2y, e2z = (stream_scr[j, 7],
                                             stream_scr[j, 8],
                                             stream_scr[j, 9])
                            third = np.float32(1.0 / 3.0)
                            cx3 = (e1x + e2x) * third
                            cy3 = (e1y + e2y) * third
                            cz3 = (e1z + e2z) * third
                            d0 = cx3 * cx3 + cy3 * cy3 + cz3 * cz3
                            d1 = ((e1x - cx3) ** 2 + (e1y - cy3) ** 2
                                  + (e1z - cz3) ** 2)
                            d2 = ((e2x - cx3) ** 2 + (e2y - cy3) ** 2
                                  + (e2z - cz3) ** 2)
                            br_t = jnp.sqrt(
                                jnp.maximum(d0, jnp.maximum(d1, d2)))
                            if ns and nt:
                                is_s = tag == 0
                                z32 = jnp.float32(0.0)
                                mx = v0x + jnp.where(is_s, z32, cx3)
                                my = v0y + jnp.where(is_s, z32, cy3)
                                mz = v0z + jnp.where(is_s, z32, cz3)
                                br = jnp.where(is_s, e1x, br_t)
                            elif ns:
                                mx, my, mz, br = v0x, v0y, v0z, e1x
                            else:
                                mx = v0x + cx3
                                my = v0y + cy3
                                mz = v0z + cz3
                                br = br_t
                            return jax.lax.cond(
                                _row_can(mx, my, mz, br, b3), test,
                                lambda b: b, b3)
                        return jax.lax.fori_loop(0, cnt, lb, b2)

                    def lb(j, b3):
                        pid = pidx[0, first + j].astype(jnp.int32)
                        if ns and nt:
                            return jax.lax.cond(
                                pid < ns,
                                lambda b: _sph_all(_sget(pid), b),
                                lambda b: _tri_all(_tget(pid - ns),
                                                   pid - ns < nt_occl,
                                                   b), b3)
                        if ns:
                            return _sph_all(_sget(pid), b3)
                        return _tri_all(_tget(pid), pid < nt_occl, b3)
                    return jax.lax.fori_loop(0, cnt, lb, b2)

                def wcond(c):
                    return c[0] < n_nodes

                def wbody(c):
                    cur, bm2 = c
                    delta = _node_delta(bvh[0, cur], bvh[1, cur],
                                        bvh[2, cur], bvh[3, cur],
                                        bvh[4, cur], bvh[5, cur])
                    t0x = (bvh[0, cur] - delta - px_) * ivx
                    t1x = (bvh[3, cur] + delta - px_) * ivx
                    t0y = (bvh[1, cur] - delta - py_) * ivy
                    t1y = (bvh[4, cur] + delta - py_) * ivy
                    t0z = (bvh[2, cur] - delta - pz_) * ivz
                    t1z = (bvh[5, cur] + delta - pz_) * ivz
                    near = jnp.maximum(
                        jnp.maximum(jnp.minimum(t0x, t1x),
                                    jnp.minimum(t0y, t1y)),
                        jnp.maximum(jnp.minimum(t0z, t1z), tminc))
                    far = jnp.minimum(
                        jnp.minimum(jnp.maximum(t0x, t1x),
                                    jnp.maximum(t0y, t1y)),
                        jnp.minimum(jnp.maximum(t0z, t1z), dist))
                    unresolved = jnp.where(bm2 < FULL, 1.0, 0.0)
                    boxed = jnp.max(
                        jnp.where(near <= far, unresolved, 0.0)) > 0.0
                    skip = bvh[6, cur].astype(jnp.int32)
                    first = bvh[7, cur].astype(jnp.int32)
                    cnt = bvh[8, cur].astype(jnp.int32)
                    is_leaf = cnt > 0

                    bm2 = jax.lax.cond(
                        boxed & is_leaf,
                        lambda b: _leaf_all(first, cnt, b),
                        lambda b: b, bm2)
                    done = jnp.max(
                        jnp.where(bm2 < FULL, 1.0, 0.0)) <= 0.0
                    nxt = jnp.where(done, n_nodes,
                                    jnp.where(boxed & (~is_leaf),
                                              cur + 1, skip))
                    return nxt, bm2

                def wbody_wide(c):
                    sp0, bm2 = c[0], c[1]
                    cur = stack_ref[sp0 - 1]
                    unresolved = jnp.where(bm2 < FULL, 1.0, 0.0)
                    boxed = []
                    meta = []
                    for s in range(4):
                        b = 9 * s
                        delta = _node_delta(bvh4[b + 0, cur],
                                            bvh4[b + 1, cur],
                                            bvh4[b + 2, cur],
                                            bvh4[b + 3, cur],
                                            bvh4[b + 4, cur],
                                            bvh4[b + 5, cur])
                        t0x = (bvh4[b + 0, cur] - delta - px_) * ivx
                        t1x = (bvh4[b + 3, cur] + delta - px_) * ivx
                        t0y = (bvh4[b + 1, cur] - delta - py_) * ivy
                        t1y = (bvh4[b + 4, cur] + delta - py_) * ivy
                        t0z = (bvh4[b + 2, cur] - delta - pz_) * ivz
                        t1z = (bvh4[b + 5, cur] + delta - pz_) * ivz
                        near = jnp.maximum(
                            jnp.maximum(jnp.minimum(t0x, t1x),
                                        jnp.minimum(t0y, t1y)),
                            jnp.maximum(jnp.minimum(t0z, t1z), tminc))
                        far = jnp.minimum(
                            jnp.minimum(jnp.maximum(t0x, t1x),
                                        jnp.maximum(t0y, t1y)),
                            jnp.minimum(jnp.maximum(t0z, t1z), dist))
                        boxed.append(jnp.max(jnp.where(
                            near <= far, unresolved, 0.0)) > 0.0)
                        meta.append(
                            (bvh4[b + 6, cur].astype(jnp.int32),
                             bvh4[b + 7, cur].astype(jnp.int32),
                             bvh4[b + 8, cur].astype(jnp.int32)))
                    sp = sp0 - 1
                    for s in range(4):
                        child, first, cnt = meta[s]
                        bm2 = jax.lax.cond(
                            boxed[s] & (cnt > 0),
                            lambda b, f=first, n_=cnt: _leaf_all(f, n_, b),
                            lambda b: b, bm2)
                        push = boxed[s] & (child >= 0)
                        stack_ref[sp] = child
                        sp = sp + jnp.where(push, jnp.int32(1),
                                            jnp.int32(0))
                    done = jnp.max(
                        jnp.where(bm2 < FULL, 1.0, 0.0)) <= 0.0
                    return jnp.where(done, jnp.int32(0), sp), bm2

                if wide:
                    stack_ref[0] = jnp.int32(0)
                    _, bm = jax.lax.while_loop(
                        lambda c: c[0] > 0, wbody_wide, (jnp.int32(1), bm))
                else:
                    _, bm = jax.lax.while_loop(wcond, wbody,
                                               (jnp.int32(0), bm))
                unb = jnp.zeros(px_.shape)
                for s in range(ss):
                    bit = (bm >> jnp.int32(s)) & jnp.int32(1)
                    unb = unb + (jnp.int32(1) - bit).astype(jnp.float32)
                return unb * np.float32(1.0 / ss)
        elif loop_mode:
            soft_fused_fn = None
            soft_guard_fn = None
            soft_prim_sets_fn = None

            def closest_fn(ox, oy, oz, dx, dy, dz, alive_f):
                return closest_hit_loop(sph, tri, pln, box, ox, oy, oz,
                                        dx, dy, dz)

            def occl_pre_fn(px_, py_, pz_):
                return (px_, py_, pz_)

            def occl_light_fn(pre, mask_f, lx, ly, lz, dist):
                return pre

            def occl_test_fn(pre, ddx, ddy, ddz, tmax):
                return any_hit_loop(sph, tri, pln, box,
                                    pre[0], pre[1], pre[2],
                                    ddx, ddy, ddz, tmax)
        else:
            soft_fused_fn = None

            def closest_fn(ox, oy, oz, dx, dy, dz, alive_f):
                return closest_hit(sph, tri, pln, box, ox, oy, oz,
                                   dx, dy, dz)

            def occl_pre_fn(px_, py_, pz_):
                return occl_precompute(sph, tri, pln, box, px_, py_, pz_)

            def occl_light_fn(pre, mask_f, lx, ly, lz, dist):
                return pre

            def occl_test_fn(pre, ddx, ddy, ddz, tmax):
                return any_hit_pre(pre[0], pre[1], pre[2], pre[3],
                                   pln, tri, ddx, ddy, ddz, tmax)

            def soft_prim_sets_fn(pre, need_f, ldx, ldy, ldz, dist):
                """Per-occluder (can, test) pairs for the guarded
                primitive-outer soft loop.

                `can` is the per-lane conservative interval guard for ONE
                occluder - interval arithmetic on the sphere quadratic:
                every jittered unit direction sd satisfies
                |sd.oc - ld.oc| <= 0.10013*|oc| (chord of the asin(0.1)
                cone; 0.102 used for margin), so u = sd.oc lies in
                [u_lo, u_hi]. A sample reports 'blocked' only if the
                quadratic t^2 + 2ut + cc = 0 has a root in [t_min, dist];
                the largest positive root over the interval is
                -u_lo + sqrt(u_lo^2 - cc), so the guard can prove every
                verdict is 'unblocked' BIT-EXACT (cc here IS the cc the
                sample tests use, from the same sph_pre). Triangles are
                covered by bounding spheres, planes by point-to-plane
                distance <= dist.

                `test(sdx, sdy, sdz, aux)` replicates any_hit_pre's
                per-primitive blocked expression bit-for-bit; aux is the
                hoisted per-sample direction terms (a, inv_a, ivx, ivy,
                ivz). Skipping an occluder whose can is all-zero leaves
                every NEEDING lane's per-sample verdict unchanged."""
                sph_pre, tri_pre, pl_pre, box_pre, (hpx, hpy, hpz) = pre
                eps_t = np.float32(1e-4)
                eps_cc = np.float32(1e-4)
                cone = np.float32(0.102)

                def sphere_guard(ocx, ocy, ocz, cc, r):
                    oc2 = cc + r * r
                    g = ocx * ldx + ocy * ldy + ocz * ldz
                    u_lo = g - cone * jnp.sqrt(oc2)
                    slack = eps_cc + np.float32(1e-6) * oc2
                    disc_lo = u_lo * u_lo - cc
                    root_max = -u_lo + jnp.sqrt(jnp.maximum(disc_lo, 0.0))
                    has = ((cc <= slack)
                           | ((u_lo <= 0.0) & (disc_lo >= -slack)))
                    # far bound: the center's projection on the central
                    # line must fall within the (inflated) segment for
                    # any hit at t <= dist.
                    R = r + cone * dist + eps_cc
                    hit = has & (root_max >= t_min - eps_t) & (-g <= dist + R)
                    return jnp.where(need_f * jnp.where(hit, 1.0, 0.0)
                                     > 0.0, 1.0, 0.0)

                sets = []
                for j, (ocx, ocy, ocz, cc) in enumerate(sph_pre):
                    def sph_test(sdx, sdy, sdz, aux,
                                 ocx=ocx, ocy=ocy, ocz=ocz, cc=cc):
                        half_b = ocx * sdx + ocy * sdy + ocz * sdz
                        disc = half_b * half_b - aux[0] * cc
                        ok = disc >= 0.0
                        sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
                        r0 = (-half_b - sq) * aux[1]
                        r1 = (-half_b + sq) * aux[1]
                        return ok & (((r0 >= t_min) & (r0 <= dist))
                                     | ((r1 >= t_min) & (r1 <= dist)))
                    sets.append((sphere_guard(ocx, ocy, ocz, cc,
                                              sph[3, j]), sph_test))
                for j, row in enumerate(tri_pre):
                    (c1x, c1y, c1z, qx, qy, qz, e2q,
                     n2x, n2y, n2z) = row
                    # triangle bounding sphere: scalar centroid m =
                    # v0 + (e1+e2)/3 and max-vertex radius; the per-lane
                    # oc shifts s = p - v0 by (m - v0). (s is no longer
                    # in tri_pre - recomputed here from the hit point,
                    # once per light per bounce.)
                    sx = hpx - tri[0, j]
                    sy = hpy - tri[1, j]
                    sz = hpz - tri[2, j]
                    e1x, e1y, e1z = tri[3, j], tri[4, j], tri[5, j]
                    e2x, e2y, e2z = tri[6, j], tri[7, j], tri[8, j]
                    mx = (e1x + e2x) * np.float32(1.0 / 3.0)
                    my = (e1y + e2y) * np.float32(1.0 / 3.0)
                    mz = (e1z + e2z) * np.float32(1.0 / 3.0)
                    d0 = mx * mx + my * my + mz * mz
                    d1 = ((e1x - mx) ** 2 + (e1y - my) ** 2
                          + (e1z - mz) ** 2)
                    d2 = ((e2x - mx) ** 2 + (e2y - my) ** 2
                          + (e2z - mz) ** 2)
                    br = jnp.sqrt(jnp.maximum(d0, jnp.maximum(d1, d2)))
                    ocx, ocy, ocz = sx - mx, sy - my, sz - mz
                    oc2 = ocx * ocx + ocy * ocy + ocz * ocz

                    def tri_test(sdx, sdy, sdz, aux,
                                 c1x=c1x, c1y=c1y, c1z=c1z,
                                 qx=qx, qy=qy, qz=qz, e2q=e2q,
                                 n2x=n2x, n2y=n2y, n2z=n2z):
                        det = -(sdx * n2x + sdy * n2y + sdz * n2z)
                        sg = jnp.where(det >= 0.0, 1.0, -1.0)
                        ad = det * sg
                        au = (sdx * c1x + sdy * c1y + sdz * c1z) * sg
                        av = (sdx * qx + sdy * qy + sdz * qz) * sg
                        at = e2q * sg
                        return ((ad >= 1e-6) & (au >= 0.0) & (av >= 0.0)
                                & (au + av <= ad) & (at >= t_min * ad)
                                & (at <= dist * ad))
                    sets.append((sphere_guard(ocx, ocy, ocz,
                                              oc2 - br * br, br),
                                 tri_test))
                for j in range(nb):
                    # box occluder -> bounding sphere (scalar center +
                    # half-diagonal radius from the table)
                    bcx = (box[0, j] + box[3, j]) * 0.5
                    bcy = (box[1, j] + box[4, j]) * 0.5
                    bcz = (box[2, j] + box[5, j]) * 0.5
                    ex = (box[3, j] - box[0, j]) * 0.5
                    ey = (box[4, j] - box[1, j]) * 0.5
                    ez = (box[5, j] - box[2, j]) * 0.5
                    br = jnp.sqrt(ex * ex + ey * ey + ez * ez)
                    ocx, ocy, ocz = hpx - bcx, hpy - bcy, hpz - bcz
                    oc2 = ocx * ocx + ocy * ocy + ocz * ocz
                    blx, bly, blz, bhx, bhy, bhz = box_pre[j]

                    def box_test(sdx, sdy, sdz, aux,
                                 blx=blx, bly=bly, blz=blz,
                                 bhx=bhx, bhy=bhy, bhz=bhz):
                        near, far = _slab_near_far(blx, bly, blz,
                                                   bhx, bhy, bhz,
                                                   aux[2], aux[3], aux[4])
                        return ((near <= far)
                                & (((near >= t_min) & (near <= dist))
                                   | ((far >= t_min) & (far <= dist))))
                    sets.append((sphere_guard(ocx, ocy, ocz,
                                              oc2 - br * br, br),
                                 box_test))
                for j, num in enumerate(pl_pre):
                    hitp = jnp.abs(num) <= dist + eps_cc
                    canp = jnp.where(need_f * jnp.where(hitp, 1.0, 0.0)
                                     > 0.0, 1.0, 0.0)

                    def pln_test(sdx, sdy, sdz, aux, j=j, num=num):
                        denom = (sdx * pln[3, j] + sdy * pln[4, j]
                                 + sdz * pln[5, j])
                        para = denom == 0.0
                        tj = num / jnp.where(para, 1.0, denom)
                        return (~para) & (tj >= t_min) & (tj <= dist)
                    sets.append((canp, pln_test))
                return sets

            def soft_guard_fn(pre, need_f, ldx, ldy, ldz, dist):
                """Scalar per-block guard: can ANY primitive block ANY of
                the jittered soft-shadow rays of any needing lane? One
                test per primitive vs the 16-sample loop's 16; the win is
                every block fully in the open. (The per-primitive guard
                terms live in soft_prim_sets_fn - this is their OR.)"""
                can = jnp.zeros(need_f.shape)
                for c, _ in soft_prim_sets_fn(pre, need_f,
                                              ldx, ldy, ldz, dist):
                    can = jnp.maximum(can, c)
                return jnp.max(can) > 0.0

        def cond(c):
            bounce, alive_f = c[0], c[13]
            # alive carried as f32 0/1: Mosaic cannot legalize i1 vectors
            # in while-loop carries (scf.yield legalization failure).
            return (bounce < max_depth) & (jnp.max(alive_f) > 0.0)

        def body(c):
            (bounce, ox, oy, oz, dx, dy, dz,
             tpx, tpy, tpz, rdx, rdy, rdz, alive_f) = c
            alive = alive_f > 0.0

            t, onx, ony, onz, mid = closest_fn(ox, oy, oz, dx, dy, dz,
                                               alive_f)
            hit = t < BIG
            alive2 = alive & hit

            def _shade(_):
                # Only entered when ANY lane in the block is alive and
                # hit something: fully-missed (sky) blocks skip all
                # shading/shadow work - the dominant cost for the ~98%
                # of blocks that never touch geometry.
                px = jnp.where(alive2, ox + dx * t, 0.0)
                py = jnp.where(alive2, oy + dy * t, 0.0)
                pz = jnp.where(alive2, oz + dz * t, 0.0)
                # front-face flip (ray.go:7-13 convention via sphere.go:46-50)
                front = (dx * onx + dy * ony + dz * onz) < 0.0
                sgn = jnp.where(front, 1.0, -1.0)
                nx = jnp.where(alive2, onx * sgn, 0.0)
                ny = jnp.where(alive2, ony * sgn, 0.0)
                nz = jnp.where(alive2, onz * sgn, 0.0)

                occl_pre = occl_pre_fn(px, py, pz)

                # -- material row gather: masked select over the table ---------
                kind = jnp.zeros(px.shape)
                alb_r = jnp.zeros(px.shape)
                alb_g = jnp.zeros(px.shape)
                alb_b = jnp.zeros(px.shape)
                rough = jnp.zeros(px.shape)
                metal = jnp.zeros(px.shape)
                spec = jnp.zeros(px.shape)
                ior = jnp.ones(px.shape)
                em_r = jnp.zeros(px.shape)
                em_g = jnp.zeros(px.shape)
                em_b = jnp.zeros(px.shape)
                ef_r = jnp.zeros(px.shape)
                ef_g = jnp.zeros(px.shape)
                ef_b = jnp.zeros(px.shape)
                mat_carry = (kind, alb_r, alb_g, alb_b, rough, metal,
                             spec, ior, em_r, em_g, em_b, ef_r, ef_g,
                             ef_b)
                if advanced:
                    # Extended-kind aux columns (pack_tables rows 14-18):
                    # aux_vec.xyz, aux_a, aux_b (models/materials.py:84-94).
                    mat_carry = mat_carry + (jnp.zeros(px.shape),
                                             jnp.zeros(px.shape),
                                             jnp.zeros(px.shape),
                                             jnp.zeros(px.shape),
                                             jnp.zeros(px.shape))

                def _mat_row(m, carry):
                    mf = jnp.asarray(m, jnp.int32).astype(jnp.float32)
                    sel = mid == mf
                    return tuple(
                        jnp.where(sel, mtab[k, m], old_v)
                        for k, old_v in enumerate(carry))

                if loop_mode:
                    mat_carry = jax.lax.fori_loop(
                        0, nm,
                        lambda m, c: _mat_row(m, c),
                        mat_carry)
                else:
                    for m in range(nm):
                        mat_carry = _mat_row(m, mat_carry)
                if advanced:
                    (kind, alb_r, alb_g, alb_b, rough, metal, spec, ior,
                     em_r, em_g, em_b, ef_r, ef_g, ef_b,
                     avx, avy, avz, aa, ab) = mat_carry
                    # Directional emission mode modulates emitted light by
                    # max(n.y, 0) (advanced_materials.go:394-414; mirrors
                    # trace._bounce_body's is_dir_emit branch).
                    dir_emit = ((kind == np.float32(mat_mod.EMISSION))
                                & (aa == np.float32(
                                    mat_mod.EMISSION_DIRECTIONAL)))
                    em_sc = jnp.where(dir_emit, jnp.maximum(ny, 0.0), 1.0)
                    em_r = em_r * em_sc
                    em_g = em_g * em_sc
                    em_b = em_b * em_sc
                else:
                    (kind, alb_r, alb_g, alb_b, rough, metal, spec, ior,
                     em_r, em_g, em_b, ef_r, ef_g, ef_b) = mat_carry

                # -- procedural texture -> albedo at the hit point -------------
                # (trace.py's textured_albedo integration, in-kernel; the
                # texture list is static so each binding unrolls to pure
                # VPU arithmetic over the lane block.)
                for t_mi, t_tex in textures:
                    t_sel = mid == np.float32(t_mi)
                    tv = _tex_value_comp(t_tex, px, py, pz)
                    if isinstance(tv, tuple):
                        t_r, t_g, t_b = tv
                    else:  # scalar field scales the base albedo
                        t_r, t_g, t_b = alb_r * tv, alb_g * tv, alb_b * tv
                    alb_r = jnp.where(t_sel, t_r, alb_r)
                    alb_g = jnp.where(t_sel, t_g, alb_g)
                    alb_b = jnp.where(t_sel, t_b, alb_b)
                    ef_r = jnp.where(t_sel, t_r, ef_r)
                    ef_g = jnp.where(t_sel, t_g, ef_g)
                    ef_b = jnp.where(t_sel, t_b, ef_b)

                # -- direct lighting (renderer.go:229-297) ---------------------
                amb = jnp.where(metal > 0.9, 0.05,
                      jnp.where(metal > 0.7, 0.07,
                      jnp.where(metal > 0.5, 0.08, 0.1)))
                dstr = jnp.where(metal > 0.95, 0.05,
                       jnp.where(metal > 0.9, 0.08,
                       jnp.where(metal > 0.8, 0.12,
                       jnp.where(metal > 0.7, 0.15,
                       jnp.where(metal > 0.5, 0.2, 0.25)))))
                spow = jnp.where(metal > 0.9, 64.0,
                       jnp.where(metal > 0.8, 48.0, 32.0))

                dir_r = amb + jnp.zeros(px.shape)
                dir_g = amb + jnp.zeros(px.shape)
                dir_b = amb + jnp.zeros(px.shape)
                # view dir: toward WORLD ORIGIN (renderer.go:279 parity bug)
                vx, vy, vz = _norm3(-px, -py, -pz)
                for li in range(nl):
                    lx, ly, lz = lit[0, li], lit[1, li], lit[2, li]
                    lr, lg, lb = lit[3, li], lit[4, li], lit[5, li]
                    lint = lit[6, li]
                    tlx, tly, tlz = lx - px, ly - py, lz - pz
                    dist = jnp.sqrt(tlx * tlx + tly * tly + tlz * tlz)
                    ldx, ldy, ldz = _norm3(tlx, tly, tlz)
                    live = dist >= 1e-3  # renderer.go:252-254

                    cos_t = jnp.maximum(0.0, nx * ldx + ny * ldy + nz * ldz)
                    # Occlusion only matters where the diffuse/specular
                    # terms are nonzero (both carry a cos_t factor).
                    shadow_mask = jnp.where(alive2 & live & (cos_t > 0.0),
                                            1.0, 0.0)
                    lctx = occl_light_fn(occl_pre, shadow_mask,
                                         lx, ly, lz, dist)
                    hard = occl_test_fn(lctx, ldx, ldy, ldz, dist)
                    if soft:
                        # The 16-sample loop is ~70% of a bounce; sf only
                        # multiplies terms that carry a cos factor, so any
                        # block whose live lanes are all hard-blocked or
                        # back-facing can skip it with exact parity.
                        need = alive2 & ~hard & (cos_t > 0.0)
                        need_f = jnp.where(need, 1.0, 0.0)
                        # Hard-blocked lanes' soft results are discarded
                        # (sf = where(hard, 0, soft_sf)), so the soft
                        # walks run with the tighter `need` mask.
                        lctx_s = occl_light_fn(occl_pre, need_f,
                                               lx, ly, lz, dist)

                        prim_sets = None
                        if (soft_fused_fn is not None
                                and shadow_samples <= 24
                                and not _env_no_fused_soft()
                                and (not stream_mode
                                     or _env_stream_fused_soft())):
                            # One conservative walk for ALL samples (bvh
                            # mode; bit-identical verdicts, ~1/16th the
                            # walk-step latency).
                            _soft = lambda _: soft_fused_fn(
                                occl_pre, need, ldx, ldy, ldz, dist,
                                bounce.astype(jnp.uint32), li)
                        elif (soft_prim_sets_fn is not None
                                and _env_soft_prim()):
                            prim_sets = soft_prim_sets_fn(
                                occl_pre, need_f, ldx, ldy, ldz, dist)

                            def _soft(_):
                                # Guarded primitive-outer loop: hoist the
                                # jittered directions (and their
                                # direction-only terms) once, then OR
                                # per-sample verdicts only for occluders
                                # whose interval guard says they might
                                # block SOME needing lane (~90% of
                                # (block, prim, light) pairs skip on
                                # mesh scenes). Verdict equality on
                                # needing lanes <- guard conservativeness
                                # (soft_prim_sets_fn docstring); the sum
                                # runs in the same s-ascending order as
                                # the sample-outer loop, so sf is
                                # bit-identical.
                                dirs = []
                                for s in range(shadow_samples):
                                    stream = (bounce.astype(jnp.uint32)
                                              * np.uint32(
                                                  rng.STREAMS_PER_BOUNCE)
                                              + np.uint32(
                                                  rng.shadow_stream(
                                                      li, s,
                                                      shadow_samples)))
                                    bx, by, bz = _unit_ball(
                                        pix, samp, stream, seed)
                                    sdx, sdy, sdz = _norm3(
                                        ldx + 0.1 * bx, ldy + 0.1 * by,
                                        ldz + 0.1 * bz)
                                    a_s = (sdx * sdx + sdy * sdy
                                           + sdz * sdz)
                                    aux = [a_s, 1.0 / a_s,
                                           None, None, None]
                                    if nb:
                                        aux[2] = 1.0 / jnp.where(
                                            sdx == 0.0, 1e-30, sdx)
                                        aux[3] = 1.0 / jnp.where(
                                            sdy == 0.0, 1e-30, sdy)
                                        aux[4] = 1.0 / jnp.where(
                                            sdz == 0.0, 1e-30, sdz)
                                    dirs.append((sdx, sdy, sdz,
                                                 tuple(aux)))
                                accs = tuple(
                                    jnp.zeros(px.shape)
                                    for _ in range(shadow_samples))
                                for can, test in prim_sets:
                                    def hit_all(acc_t, test=test):
                                        return tuple(
                                            jnp.maximum(
                                                acc_t[s],
                                                jnp.where(
                                                    test(*dirs[s]),
                                                    1.0, 0.0))
                                            for s in range(
                                                shadow_samples))
                                    accs = jax.lax.cond(
                                        jnp.max(can) > 0.0, hit_all,
                                        lambda a_: a_, accs)
                                unblocked = jnp.zeros(px.shape)
                                for s in range(shadow_samples):
                                    unblocked += 1.0 - accs[s]
                                return unblocked * np.float32(
                                    1.0 / shadow_samples)
                        else:
                            def _soft(_):
                                unblocked = jnp.zeros(px.shape)
                                for s in range(shadow_samples):
                                    stream = (bounce.astype(jnp.uint32)
                                              * np.uint32(
                                                  rng.STREAMS_PER_BOUNCE)
                                              + np.uint32(
                                                  rng.shadow_stream(
                                                      li, s,
                                                      shadow_samples)))
                                    bx, by, bz = _unit_ball(
                                        pix, samp, stream, seed)
                                    sdx, sdy, sdz = _norm3(
                                        ldx + 0.1 * bx, ldy + 0.1 * by,
                                        ldz + 0.1 * bz)
                                    b = occl_test_fn(lctx_s,
                                                     sdx, sdy, sdz, dist)
                                    unblocked += jnp.where(b, 0.0, 1.0)
                                return unblocked * np.float32(
                                    1.0 / shadow_samples)

                        if prim_sets is not None:
                            # Block guard = OR of the per-prim guards
                            # (identical math to soft_guard_fn, computed
                            # once on the shared sets).
                            canm = jnp.zeros(need_f.shape)
                            for c, _ in prim_sets:
                                canm = jnp.maximum(canm, c)
                            run = jnp.max(canm) > 0.0
                        elif soft_guard_fn is not None:
                            # Conservative interval guard: when no
                            # primitive can put a root in any needing
                            # lane's [t_min, dist] for ANY cone
                            # direction, every sample verdict is
                            # 'unblocked' and sf = 1 is bit-exact - the
                            # 16-sample loop is skipped. (run is also
                            # false when no lane needs; need_f is then
                            # all-zero, matching the old skip.)
                            run = soft_guard_fn(occl_pre, need_f,
                                                ldx, ldy, ldz, dist)
                        else:
                            run = jnp.any(need)
                        soft_sf = jax.lax.cond(
                            run, _soft, lambda _: need_f, 0)
                        sf = jnp.where(hard, 0.0, soft_sf)
                    else:
                        sf = jnp.where(hard, 0.0, 1.0)

                    inten = cos_t * lint / (dist * dist)
                    dscale = dstr * inten * sf
                    hx, hy, hz = _norm3(ldx + vx, ldy + vy, ldz + vz)
                    sdot = jnp.maximum(0.0, nx * hx + ny * hy + nz * hz)
                    # pow(x, p) with per-lane p in {32,48,64}: exp2(p*log2(x))
                    # with the x==0 guard (0^p = 0).
                    zdot = sdot <= 0.0
                    spec_i = jnp.where(
                        zdot, 0.0,
                        jnp.exp2(spow * (jnp.log2(jnp.where(zdot, 1.0, sdot)))))
                    sscale = jnp.where(metal > 0.5,
                                       spec_i * inten * sf * metal * 3.0, 0.0)
                    ok = live
                    dir_r += jnp.where(ok, ef_r * dscale + lr * sscale, 0.0)
                    dir_g += jnp.where(ok, ef_g * dscale + lg * sscale, 0.0)
                    dir_b += jnp.where(ok, ef_b * dscale + lb * sscale, 0.0)

                # -- scatter (models/materials.scatter, component form) --------
                bounce_u = bounce.astype(jnp.uint32)
                ball_stream = (bounce_u * np.uint32(rng.STREAMS_PER_BOUNCE)
                               + np.uint32(rng.Streams.SCATTER_BALL))
                pick_stream = (bounce_u * np.uint32(rng.STREAMS_PER_BOUNCE)
                               + np.uint32(rng.Streams.DIELECTRIC))
                bx, by, bz = _unit_ball(pix, samp, ball_stream, seed)
                pick = _uniform4(pix, samp, pick_stream, seed)[0]

                d_dot_n = dx * nx + dy * ny + dz * nz
                refx = dx - 2.0 * d_dot_n * nx
                refy = dy - 2.0 * d_dot_n * ny
                refz = dz - 2.0 * d_dot_n * nz
                cos_raw = jnp.abs(d_dot_n)
                f0 = ((ior - 1.0) / (ior + 1.0)) ** 2
                fres = f0 + (1.0 - f0) * _pow5(1.0 - cos_raw)

                # Lambertian
                lamx, lamy, lamz = nx + bx, ny + by, nz + bz
                near0 = ((jnp.abs(lamx) < 1e-8) & (jnp.abs(lamy) < 1e-8)
                         & (jnp.abs(lamz) < 1e-8))
                lamx = jnp.where(near0, nx, lamx)
                lamy = jnp.where(near0, ny, lamy)
                lamz = jnp.where(near0, nz, lamz)
                lamx, lamy, lamz = _norm3(lamx, lamy, lamz)

                # Metal / Shiny / PerfectMirror share the perturbed reflection
                perx, pery, perz = _norm3(refx + bx * rough,
                                          refy + by * rough,
                                          refz + bz * rough)
                rough_gate = rough > 0.001
                metx = jnp.where(rough_gate, perx, refx)
                mety = jnp.where(rough_gate, pery, refy)
                metz = jnp.where(rough_gate, perz, refz)
                fs = 0.6 + metal * 0.4
                m_r = jnp.clip(alb_r * (1.0 - fs) + fres * fs, 0.0, 1.0)
                m_g = jnp.clip(alb_g * (1.0 - fs) + fres * fs, 0.0, 1.0)
                m_b = jnp.clip(alb_b * (1.0 - fs) + fres * fs, 0.0, 1.0)
                mfs = 0.4 + metal * 0.5
                hi = metal > 0.8
                m_r = jnp.where(hi, m_r * (1.0 - mfs) + fres * mfs, m_r)
                m_g = jnp.where(hi, m_g * (1.0 - mfs) + fres * mfs, m_g)
                m_b = jnp.where(hi, m_b * (1.0 - mfs) + fres * mfs, m_b)

                shiny_gate = rough > 0.0
                shx = jnp.where(shiny_gate, perx, refx)
                shy = jnp.where(shiny_gate, pery, refy)
                shz = jnp.where(shiny_gate, perz, refz)
                ss = 0.4 + spec * 0.4
                s_r = jnp.minimum(1.0, alb_r * (1.0 - ss) + fres * ss)
                s_g = jnp.minimum(1.0, alb_g * (1.0 - ss) + fres * ss)
                s_b = jnp.minimum(1.0, alb_b * (1.0 - ss) + fres * ss)

                p_r = alb_r * 0.1 + fres * 0.9
                p_g = alb_g * 0.1 + fres * 0.9
                p_b = alb_b * 0.1 + fres * 0.9

                # Glass / Dielectric
                ux, uy, uz = _norm3(dx, dy, dz)
                ratio = jnp.where(front, 1.0 / ior, ior)
                u_dot_n = ux * nx + uy * ny + uz * nz
                cos_t2 = jnp.minimum(-u_dot_n, 1.0)
                sin_t2 = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t2 * cos_t2))
                cannot = ratio * sin_t2 > 1.0
                rr0 = (1.0 - ratio) / (1.0 + ratio)
                rr0 = rr0 * rr0
                refl_p = rr0 + (1.0 - rr0) * _pow5(1.0 - cos_t2)
                use_refl = cannot | (refl_p > pick)
                # refract (vector.go:81-96 incl. flip + TIR fallback)
                cosv = u_dot_n
                flip = cosv > 0.0
                n2x = jnp.where(flip, -nx, nx)
                n2y = jnp.where(flip, -ny, ny)
                n2z = jnp.where(flip, -nz, nz)
                eta2 = jnp.where(flip, 1.0 / ratio, ratio)
                cos2 = jnp.where(flip, -cosv, cosv)
                st2 = eta2 * eta2 * (1.0 - cos2 * cos2)
                tir = st2 > 1.0
                ct2 = jnp.sqrt(jnp.where(tir, 1.0,
                                         jnp.maximum(1.0 - st2, 0.0)))
                k = eta2 * cos2 + ct2
                fax = ux * eta2 - n2x * k
                fay = uy * eta2 - n2y * k
                faz = uz * eta2 - n2z * k
                u_dot_n2 = ux * n2x + uy * n2y + uz * n2z
                tirx = ux - 2.0 * u_dot_n2 * n2x
                tiry = uy - 2.0 * u_dot_n2 * n2y
                tirz = uz - 2.0 * u_dot_n2 * n2z
                refrx = jnp.where(tir, tirx, fax)
                refry = jnp.where(tir, tiry, fay)
                refrz = jnp.where(tir, tirz, faz)
                u_refx = ux - 2.0 * u_dot_n * nx
                u_refy = uy - 2.0 * u_dot_n * ny
                u_refz = uz - 2.0 * u_dot_n * nz
                glx = jnp.where(use_refl, u_refx, refrx)
                gly = jnp.where(use_refl, u_refy, refry)
                glz = jnp.where(use_refl, u_refz, refrz)

                is_lam = kind == np.float32(mat_mod.LAMBERTIAN)
                is_met = kind == np.float32(mat_mod.METAL)
                is_shy = kind == np.float32(mat_mod.SHINY)
                is_pm = kind == np.float32(mat_mod.PERFECT_MIRROR)
                sc_x = jnp.where(is_lam, lamx, jnp.where(is_met, metx,
                        jnp.where(is_shy, shx, jnp.where(is_pm, metx, glx))))
                sc_y = jnp.where(is_lam, lamy, jnp.where(is_met, mety,
                        jnp.where(is_shy, shy, jnp.where(is_pm, mety, gly))))
                sc_z = jnp.where(is_lam, lamz, jnp.where(is_met, metz,
                        jnp.where(is_shy, shz, jnp.where(is_pm, metz, glz))))
                at_r = jnp.where(is_lam, alb_r, jnp.where(is_met, m_r,
                        jnp.where(is_shy, s_r, jnp.where(is_pm, p_r, alb_r))))
                at_g = jnp.where(is_lam, alb_g, jnp.where(is_met, m_g,
                        jnp.where(is_shy, s_g, jnp.where(is_pm, p_g, alb_g))))
                at_b = jnp.where(is_lam, alb_b, jnp.where(is_met, m_b,
                        jnp.where(is_shy, s_b, jnp.where(is_pm, p_b, alb_b))))
                did_scatter = kind != np.float32(mat_mod.DIFFUSE_LIGHT)

                if advanced:
                    # Extended kinds (advanced_materials.go, unreachable in
                    # Go) - component form of materials.scatter's extended
                    # section; both engines must stay bit-consistent.
                    # Subsurface (:212-244): dir = ball*phase, att =
                    # base * (absorption * radius).
                    sssx, sssy, sssz = bx * ab, by * ab, bz * ab
                    ss_r = alb_r * (avx * aa)
                    ss_g = alb_g * (avy * aa)
                    ss_b = alb_b * (avz * aa)
                    # Anisotropic (:246-278): roughness modulated by
                    # direction . normal.
                    arough = rough * (1.0 + aa * (avx * nx + avy * ny
                                                  + avz * nz))
                    apx, apy, apz = _norm3(refx + bx * arough,
                                           refy + by * arough,
                                           refz + bz * arough)
                    agate = arough > 0.0
                    anx = jnp.where(agate, apx, refx)
                    any_ = jnp.where(agate, apy, refy)
                    anz = jnp.where(agate, apz, refz)
                    # Clearcoat (:280-330): lambertian base dir; Schlick
                    # blend of attenuations with the row's own IOR fresnel.
                    cc_r = alb_r * (1.0 - aa) + fres * aa
                    cc_g = alb_g * (1.0 - aa) + fres * aa
                    cc_b = alb_b * (1.0 - aa) + fres * aa
                    # Sheen (:332-368): tinted sheen color, reflection
                    # perturbed by sheenRoughness.
                    spx, spy, spz = _norm3(refx + bx * aa,
                                           refy + by * aa,
                                           refz + bz * aa)
                    sgate = aa > 0.0
                    snx = jnp.where(sgate, spx, refx)
                    sny = jnp.where(sgate, spy, refy)
                    snz = jnp.where(sgate, spz, refz)
                    sh_r = avx * (1.0 - ab) + alb_r * ab
                    sh_g = avy * (1.0 - ab) + alb_g * ab
                    sh_b = avz * (1.0 - ab) + alb_b * ab
                    # Mirror (:68-109): UNnormalized perturbed reflection;
                    # scatter returns false when it dips below the surface
                    # (:88, strict > 0).
                    mgate = rough > 0.0
                    mx = jnp.where(mgate, refx + bx * rough, refx)
                    my = jnp.where(mgate, refy + by * rough, refy)
                    mz = jnp.where(mgate, refz + bz * rough, refz)
                    mir_up = (mx * nx + my * ny + mz * nz) > 0.0

                    is_sss = kind == np.float32(mat_mod.SUBSURFACE)
                    is_ani = kind == np.float32(mat_mod.ANISOTROPIC)
                    is_cc = kind == np.float32(mat_mod.CLEARCOAT)
                    is_sh = kind == np.float32(mat_mod.SHEEN)
                    is_mir = kind == np.float32(mat_mod.MIRROR)
                    sc_x = jnp.where(is_sss, sssx, jnp.where(is_ani, anx,
                            jnp.where(is_cc, lamx, jnp.where(is_sh, snx,
                            jnp.where(is_mir, mx, sc_x)))))
                    sc_y = jnp.where(is_sss, sssy, jnp.where(is_ani, any_,
                            jnp.where(is_cc, lamy, jnp.where(is_sh, sny,
                            jnp.where(is_mir, my, sc_y)))))
                    sc_z = jnp.where(is_sss, sssz, jnp.where(is_ani, anz,
                            jnp.where(is_cc, lamz, jnp.where(is_sh, snz,
                            jnp.where(is_mir, mz, sc_z)))))
                    at_r = jnp.where(is_sss, ss_r, jnp.where(is_ani, alb_r,
                            jnp.where(is_cc, cc_r, jnp.where(is_sh, sh_r,
                            jnp.where(is_mir, alb_r, at_r)))))
                    at_g = jnp.where(is_sss, ss_g, jnp.where(is_ani, alb_g,
                            jnp.where(is_cc, cc_g, jnp.where(is_sh, sh_g,
                            jnp.where(is_mir, alb_g, at_g)))))
                    at_b = jnp.where(is_sss, ss_b, jnp.where(is_ani, alb_b,
                            jnp.where(is_cc, cc_b, jnp.where(is_sh, sh_b,
                            jnp.where(is_mir, alb_b, at_b)))))
                    did_scatter = (did_scatter
                                   & (kind != np.float32(mat_mod.EMISSION))
                                   & (~is_mir | mir_up))

                # -- combine (trace._bounce_body semantics) --------------------
                w_r = jnp.where(metal > 0.95, 0.85,
                      jnp.where(metal > 0.9, 0.8,
                      jnp.where(metal > 0.8, 0.75,
                      jnp.where(metal > 0.7, 0.7,
                      jnp.where(metal > 0.5, 0.6,
                      jnp.where(metal > 0.2, 0.4, 1.0))))))
                w_d = jnp.where(metal > 0.2, 1.0 - w_r, 1.0)

                no_scat = alive2 & ~did_scatter
                scat = alive2 & did_scatter

                n_rdx = rdx + jnp.where(alive2, tpx * em_r, 0.0)
                n_rdy = rdy + jnp.where(alive2, tpy * em_g, 0.0)
                n_rdz = rdz + jnp.where(alive2, tpz * em_b, 0.0)
                n_rdx = n_rdx + jnp.where(no_scat, tpx * dir_r, 0.0)
                n_rdy = n_rdy + jnp.where(no_scat, tpy * dir_g, 0.0)
                n_rdz = n_rdz + jnp.where(no_scat, tpz * dir_b, 0.0)
                n_rdx = n_rdx + jnp.where(scat, tpx * dir_r * w_d, 0.0)
                n_rdy = n_rdy + jnp.where(scat, tpy * dir_g * w_d, 0.0)
                n_rdz = n_rdz + jnp.where(scat, tpz * dir_b * w_d, 0.0)

                n_tpx = jnp.where(scat, tpx * at_r * w_r, tpx)
                n_tpy = jnp.where(scat, tpy * at_g * w_r, tpy)
                n_tpz = jnp.where(scat, tpz * at_b * w_r, tpz)

                next_alive = scat
                if not cfg.recursive_reflections:
                    next_alive = jnp.zeros_like(next_alive)
                if cfg.throughput_epsilon > 0.0:
                    tmax = jnp.maximum(n_tpx, jnp.maximum(n_tpy, n_tpz))
                    next_alive &= tmax >= np.float32(cfg.throughput_epsilon)
                if cfg.russian_roulette_start is not None:
                    # Mirror trace._bounce_body exactly (same stream, same
                    # clamp) so fast_mc renders agree across engines.
                    q = jnp.clip(jnp.maximum(n_tpx,
                                             jnp.maximum(n_tpy, n_tpz)),
                                 0.05, 1.0)
                    rr_stream = (bounce.astype(jnp.uint32)
                                 * np.uint32(rng.STREAMS_PER_BOUNCE)
                                 + np.uint32(rng.Streams.RUSSIAN_ROULETTE))
                    u_rr = _uniform4(pix, samp, rr_stream, seed)[0]
                    do_rr = bounce >= cfg.russian_roulette_start
                    kill = do_rr & (u_rr >= q)
                    next_alive &= ~kill
                    boost = do_rr & next_alive
                    inv_q = 1.0 / q
                    n_tpx = jnp.where(boost, n_tpx * inv_q, n_tpx)
                    n_tpy = jnp.where(boost, n_tpy * inv_q, n_tpy)
                    n_tpz = jnp.where(boost, n_tpz * inv_q, n_tpz)

                n_ox = jnp.where(scat, px, ox)
                n_oy = jnp.where(scat, py, oy)
                n_oz = jnp.where(scat, pz, oz)
                n_dx = jnp.where(scat, sc_x, dx)
                n_dy = jnp.where(scat, sc_y, dy)
                n_dz = jnp.where(scat, sc_z, dz)

                return (n_ox, n_oy, n_oz, n_dx, n_dy, n_dz,
                        n_tpx, n_tpy, n_tpz, n_rdx, n_rdy, n_rdz,
                        jnp.where(next_alive, 1.0, 0.0))

            def _pass(_):
                return (ox, oy, oz, dx, dy, dz,
                        tpx, tpy, tpz, rdx, rdy, rdz,
                        jnp.zeros(ox.shape))

            (ox2, oy2, oz2, dx2, dy2, dz2, tpx2, tpy2, tpz2,
             rdx2, rdy2, rdz2, alive_next) = jax.lax.cond(
                jnp.any(alive2), _shade, _pass, 0)
            return (bounce + 1, ox2, oy2, oz2, dx2, dy2, dz2,
                    tpx2, tpy2, tpz2, rdx2, rdy2, rdz2, alive_next)

        shape = ox_ref.shape
        zeros = jnp.zeros(shape)
        init = (jnp.int32(start_bounce),
                ox_ref[:], oy_ref[:], oz_ref[:],
                dx_ref[:], dy_ref[:], dz_ref[:],
                tx_ref[:], ty_ref[:], tz_ref[:],
                zeros, zeros, zeros,
                al_ref[:])
        out = jax.lax.while_loop(cond, body, init)
        rx_ref[:] = out[10]
        ry_ref[:] = out[11]
        rz_ref[:] = out[12]
        if return_state:
            (sox, soy, soz, sdx, sdy, sdz, stx, sty, stz, sal) = state_refs
            sox[:] = out[1]
            soy[:] = out[2]
            soz[:] = out[3]
            sdx[:] = out[4]
            sdy[:] = out[5]
            sdz[:] = out[6]
            stx[:] = out[7]
            sty[:] = out[8]
            stz[:] = out[9]
            sal[:] = out[13]

    return kernel


# ---------------------------------------------------------------------------
# Host-side wrapper
# ---------------------------------------------------------------------------

def _affine_camera(scene, go_camera: bool):
    """Camera as direction = A + u*B + v*C from `origin` - both the Go
    fixed-viewport camera (renderer.go:377-390) and the look-at camera are
    affine in (u, v), so one (4,3) SMEM table serves the mask kernel."""
    cam = scene.camera
    f32 = jnp.float32
    if go_camera:
        vp_w = 2.0 * cam.aspect_ratio
        origin = cam.position.astype(f32)
        B = jnp.stack([vp_w, jnp.zeros_like(vp_w),
                       jnp.zeros_like(vp_w)]).astype(f32)
        C = jnp.asarray([0.0, 2.0, 0.0], f32)
        A = -B / 2.0 - C / 2.0 - jnp.asarray([0.0, 0.0, 1.0], f32)
    else:
        origin = cam.position.astype(f32)
        fwd = cam.look_at - cam.position
        fwd = fwd / jnp.linalg.norm(fwd)
        right = jnp.cross(fwd, cam.up)
        right = right / jnp.linalg.norm(right)
        up = jnp.cross(right, fwd)
        theta = cam.fov * (np.pi / 180.0)
        half_h = jnp.tan(theta / 2.0)
        half_w = cam.aspect_ratio * half_h
        A = (fwd - half_w * right - half_h * up).astype(f32)
        B = (2.0 * half_w * right).astype(f32)
        C = (2.0 * half_h * up).astype(f32)
    return jnp.stack([origin, A, B, C])  # (4,3)


def _bsphere_table(scene):
    """(4, ns+nt) bounding-sphere SMEM table for the cone mask.

    Real spheres first, then per-triangle bounding spheres (centroid +
    max vertex distance), in the SAME pid order as the unified BVH - the
    cone mask's conservative test is identical for both, so the kernel
    needs no sphere/triangle branch at all."""
    g = scene.geometry
    f32 = jnp.float32
    m = (g.tri_v0 + g.tri_v1 + g.tri_v2) * (1.0 / 3.0)
    rt = jnp.sqrt(jnp.maximum(jnp.maximum(
        jnp.sum((g.tri_v0 - m) ** 2, axis=-1),
        jnp.sum((g.tri_v1 - m) ** 2, axis=-1)),
        jnp.sum((g.tri_v2 - m) ** 2, axis=-1)))
    c = jnp.concatenate([g.sph_center.astype(f32), m.astype(f32)], axis=0)
    r = jnp.concatenate([g.sph_radius.astype(f32), rt.astype(f32)],
                        axis=0)
    return jnp.concatenate([c, r[:, None]], axis=1).T  # (4, ns+nt)


def _cone_half_sin(scene, go_camera: bool, width: int, height: int):
    """Upper bound on sin(angle) between any jittered pixel ray and the
    pixel-center ray, as a traced scalar.

    Both cameras are affine d(u,v) = A + u*B + v*C with unit forward
    component (go camera: d.z = -1 exactly, renderer.go:385; look-at:
    A.fwd = 1, B,C perpendicular to fwd), so |d| >= 1 for every ray and
    sin(angle(d_c, d_j)) = |d_c x delta| / (|d_c||d_j|) <= |delta| with
    delta = alpha*B + beta*C, |alpha| <= 0.5/W, |beta| <= 0.5/H."""
    cam = _affine_camera(scene, go_camera)  # rows: origin, A, B, C
    nb = jnp.sqrt(jnp.sum(cam[2] * cam[2]))
    nc = jnp.sqrt(jnp.sum(cam[3] * cam[3]))
    return 0.5 * (nb / width + nc / height)


def pixel_mask_pallas(scene, px, py, *, width: int, height: int, cfg,
                      go_camera: bool = True, block_rows: int = 64,
                      interpret: bool | None = None):
    """Per-PIXEL conservative primary mask: one central ray per pixel.

    The round-2 per-lane mask (primary_mask_pallas, deleted round 5 once
    every caller moved here) tested all W*H*spp jittered rays - at
    100 spp that pass cost ~22 ms of the headline scene's ~25 ms frame.
    This kernel tests ONE ray per pixel (the pixel center)
    against primitives inflated by the pixel's ray cone, giving a
    spp-independent mask that costs 1/spp as much:

      * every jittered ray deviates from the central ray by at most
        sin(theta) <= k (see _cone_half_sin), so a jittered hit point h
        with |h - c| <= r lies within (|c - o| + r) * k of the central
        LINE; the central-line test therefore uses the inflated radius
        R = r + (|c - o| + r) * k + eps and can never exclude a pixel
        whose any sample would hit (over-included pixels trace to exact
        black, same contract as the per-lane mask);
      * triangles are covered by their bounding spheres (_bsphere_table)
        - conservative, cheap, and branch-free in-kernel;
      * infinite planes use interval arithmetic on the denominator:
        n.d_j lies within +-k of n.d_c (|n| = 1, scene loader
        normalizes), so a pixel is included when the sign could flip,
        when the plane passes near the origin, or when num/denom is
        positive for some denominator in the interval;
      * bvh mode walks node slabs inflated per node by
        k * dist(origin, farthest corner) (computed here, camera in
        hand) plus the usual fp slack, and runs the same bounding-sphere
        test at the leaves;
      * forward culling keeps spheres behind the camera excluded:
        a forward hit implies oc . d_c >= -(R + L') * |d_c|;
      * thin-lens DoF (round 5, tightened): a DoF sample is the line
        through o + e (|e| <= Le = sqrt(2)*lens radius - the offset
        basis Up/normalize(LookAt x Up) is NOT orthonormal, parity bug
        kept) and the focal point o + F*d_j (thin_lens_perturb:
        new_dir ~ F*d_j - e). A point at fraction lam of that segment
        deviates from the JITTERED pixel ray by (1-lam)*|e|, so the
        lateral DoF slack for a primitive at geometric distance s is
        Le * |1 - s/(F*|d_j|)| - ZERO at the focal surface, Le at the
        camera, growing linearly beyond focus. Per lane, |d_j| is
        within (1 +- k) of |d_c|, so the in-kernel bound is
        dofl = Le * max(|1 - x_lo|, |1 - x_hi|) with
        x = (dist -+ r) / (F * |d_c| * (1 +- k)), and
        R = r + (dist + r)*k + dofl + eps. (Round 4 used the global
        k' = k + L/F widening instead - depth-independent, ~5x frame
        cost on the DoF headline; the distance-proportional form is the
        same tightening the fused soft cone got.) Planes keep the
        direction-cone form kp = k + Le/(F - Le) on the denominator and
        the origin-shift slack L' = Le*(1+kp) on the numerator; BVH node
        slabs inflate by the scalar bound over |d_j| in [1, dmax].
        With L = 0 all terms reduce to the round-3 math."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    ns = scene.geometry.sph_center.shape[0]
    nt = scene.geometry.tri_v0.shape[0]
    npl = scene.geometry.pl_point.shape[0]
    nbs = ns + nt
    mode = _kernel_mode(scene)
    use_bvh = mode in ("bvh", "stream")
    # stream scenes: the per-prim bounding-sphere table is exactly what
    # does not fit SMEM, so the mask stops at the inflated node slabs -
    # a slab-boxed LEAF marks its lanes hit (strictly more conservative
    # than the bsphere leaf test; over-included pixels trace to black).
    node_only = mode == "stream"
    loop_mode = mode == "loop"
    n_nodes = scene.accel.node_min.shape[0] if use_bvh else 0
    inv_w = np.float32(1.0 / width)
    inv_h = np.float32(1.0 / height)
    eps = np.float32(1e-3)

    def kernel(*refs):
        if node_only:
            bvh = refs[0]
            refs = refs[1:]
        elif use_bvh:
            bvh, pidx = refs[0], refs[1]
            refs = refs[2:]
        (bs_ref, pln_ref, cam_ref, px_ref, py_ref, out_ref) = refs
        u = (px_ref[:] + 0.5) * inv_w
        v = (py_ref[:] + 0.5) * inv_h
        ox = cam_ref[0, 0] + jnp.zeros_like(u)
        oy = cam_ref[0, 1] + jnp.zeros_like(u)
        oz = cam_ref[0, 2] + jnp.zeros_like(u)
        dx = cam_ref[1, 0] + u * cam_ref[2, 0] + v * cam_ref[3, 0]
        dy = cam_ref[1, 1] + u * cam_ref[2, 1] + v * cam_ref[3, 1]
        dz = cam_ref[1, 2] + u * cam_ref[2, 2] + v * cam_ref[3, 2]
        kp = cam_ref[4, 0]  # direction-cone bound incl. lens (planes)
        ll = cam_ref[4, 1]  # DoF origin-shift slack L' (0 without DoF)
        le = cam_ref[4, 2]  # lens offset bound Le (0 without DoF)
        k = cam_ref[5, 0]   # pure jitter cone half-sin
        c_lo = cam_ref[5, 1]  # 1/(F*(1+k)) and 1/(F*(1-k)): the DoF
        c_hi = cam_ref[5, 2]  # focus-fraction bounds (0 without DoF)
        a = dx * dx + dy * dy + dz * dz
        inv_a = 1.0 / a
        sqa = jnp.sqrt(a)
        inv_sq = 1.0 / sqa

        def bs_hit(j, bf):
            ocx = bs_ref[0, j] - ox
            ocy = bs_ref[1, j] - oy
            ocz = bs_ref[2, j] - oz
            oc2 = ocx * ocx + ocy * ocy + ocz * ocz
            g = ocx * dx + ocy * dy + ocz * dz
            r = bs_ref[3, j]
            dist = jnp.sqrt(oc2)
            # distance-proportional DoF slack: zero at the focal
            # surface, Le at the camera (docstring; 0 without DoF)
            x_lo = (dist - r) * inv_sq * c_lo
            x_hi = (dist + r) * inv_sq * c_hi
            dofl = le * jnp.maximum(jnp.abs(1.0 - x_lo),
                                    jnp.abs(1.0 - x_hi))
            R = r + (dist + r) * k + dofl + eps
            hit = (oc2 - g * g * inv_a <= R * R) & (g >= -(R + ll) * sqa)
            return jnp.maximum(bf, jnp.where(hit, 1.0, 0.0))

        def pln_hit(j, bf):
            denom = (dx * pln_ref[3, j] + dy * pln_ref[4, j]
                     + dz * pln_ref[5, j])
            num = ((pln_ref[0, j] - ox) * pln_ref[3, j]
                   + (pln_ref[1, j] - oy) * pln_ref[4, j]
                   + (pln_ref[2, j] - oz) * pln_ref[5, j])
            hit = ((jnp.abs(denom) <= kp + eps)
                   | (num * denom > 0.0)
                   | (jnp.abs(num) <= ll + eps))
            return jnp.maximum(bf, jnp.where(hit, 1.0, 0.0))

        bf = jnp.zeros(u.shape)
        if use_bvh:
            ivx = 1.0 / jnp.where(dx == 0.0, 1e-30, dx)
            ivy = 1.0 / jnp.where(dy == 0.0, 1e-30, dy)
            ivz = 1.0 / jnp.where(dz == 0.0, 1e-30, dz)

            def wcond(c):
                return c[0] < n_nodes

            def wbody(c):
                cur, bf2 = c
                t0x = (bvh[0, cur] - ox) * ivx
                t1x = (bvh[3, cur] - ox) * ivx
                t0y = (bvh[1, cur] - oy) * ivy
                t1y = (bvh[4, cur] - oy) * ivy
                t0z = (bvh[2, cur] - oz) * ivz
                t1z = (bvh[5, cur] - oz) * ivz
                near = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x),
                                jnp.minimum(t0y, t1y)),
                    jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
                far = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                              jnp.maximum(t0y, t1y)),
                                  jnp.maximum(t0z, t1z))
                want = jnp.where((near <= far) & (bf2 < 1.0), 1.0, 0.0)
                boxed = jnp.max(want) > 0.0
                skip = bvh[6, cur].astype(jnp.int32)
                first = bvh[7, cur].astype(jnp.int32)
                cnt = bvh[8, cur].astype(jnp.int32)
                is_leaf = cnt > 0

                if node_only:
                    # leaf slab passed -> conservatively mark its lanes
                    bf2 = jnp.where(is_leaf, jnp.maximum(bf2, want), bf2)
                else:
                    def leafer(b2):
                        def lb(j, b3):
                            pid = pidx[0, first + j].astype(jnp.int32)
                            return bs_hit(pid, b3)
                        return jax.lax.fori_loop(0, cnt, lb, b2)

                    bf2 = jax.lax.cond(boxed & is_leaf, leafer,
                                       lambda b: b, bf2)
                done = jnp.min(bf2) >= 1.0
                nxt = jnp.where(done, n_nodes,
                                jnp.where(boxed & (~is_leaf), cur + 1,
                                          skip))
                return nxt, bf2

            _, bf = jax.lax.while_loop(wcond, wbody, (jnp.int32(0), bf))
        elif loop_mode:
            if nbs:
                bf = jax.lax.fori_loop(0, nbs, bs_hit, bf)
        else:
            for j in range(nbs):
                bf = bs_hit(j, bf)
        if npl:
            if loop_mode or use_bvh:
                bf = jax.lax.fori_loop(0, npl, pln_hit, bf)
            else:
                for j in range(npl):
                    bf = pln_hit(j, bf)
        out_ref[:] = bf

    B = px.shape[0]
    blk = block_rows * LANE
    n_blocks = -(-B // blk)
    pad = n_blocks * blk - B
    prep = lambda x: jnp.pad(x, (0, pad)).reshape(-1, LANE)

    pad1 = lambda a: a if a.shape[-1] else jnp.zeros(a.shape[:-1] + (1,),
                                                     a.dtype)
    bs = (jnp.zeros((4, 1), jnp.float32) if node_only
          else pad1(_bsphere_table(scene)))
    g = scene.geometry
    pln = pad1(jnp.concatenate([
        g.pl_point.astype(jnp.float32), g.pl_normal.astype(jnp.float32),
        g.pl_mat[:, None].astype(jnp.float32)], axis=1).T)
    cam4 = _affine_camera(scene, go_camera)
    k = _cone_half_sin(scene, go_camera, width, height)
    if cfg.depth_of_field:
        # Thin-lens widening (round 5, see the docstring): per-primitive
        # distance-proportional slack instead of the global k' = k + L/F.
        L = np.float32(cfg.dof_lens_radius)
        F = np.float32(max(cfg.dof_focus_distance, 1e-6))
        Le = np.float32(np.sqrt(2.0)) * L  # non-orthonormal lens basis
        kp = k + Le / jnp.maximum(F - Le, 1e-6)  # direction-cone bound
        ll = Le * (1.0 + kp)
        inv_f = 1.0 / F
        c_lo = inv_f / (1.0 + k)  # x bounds absorb |d_j| in (1 +- k)|d_c|
        c_hi = inv_f / jnp.maximum(1.0 - k, 1e-3)
    else:
        Le = k * 0.0
        kp = k
        ll = k * 0.0
        c_lo = k * 0.0
        c_hi = k * 0.0
    cam = jnp.concatenate(
        [cam4, jnp.stack([kp, ll, Le])[None, :],
         jnp.stack([k, c_lo, c_hi])[None, :]], axis=0)

    bvh_inputs = []
    if use_bvh:
        origin = cam4[0]
        nmin = jnp.asarray(scene.accel.node_min, jnp.float32)
        nmax = jnp.asarray(scene.accel.node_max, jnp.float32)
        far = jnp.maximum(jnp.abs(nmin - origin), jnp.abs(nmax - origin))
        d_far = jnp.sqrt(jnp.sum(far * far, axis=-1))
        if cfg.depth_of_field:
            # Scalar per-node DoF slack over |d_j| in [1, dmax]
            # (docstring): zero-at-focus per node instead of the old
            # global + ll.
            near_ax = jnp.maximum(jnp.maximum(nmin - origin,
                                              origin - nmax), 0.0)
            d_near = jnp.sqrt(jnp.sum(near_ax * near_ax, axis=-1))
            dmax = (jnp.sqrt(jnp.sum(cam4[1] * cam4[1]))
                    + jnp.sqrt(jnp.sum(cam4[2] * cam4[2]))
                    + jnp.sqrt(jnp.sum(cam4[3] * cam4[3])))
            F = np.float32(max(cfg.dof_focus_distance, 1e-6))
            s_lo = jnp.maximum(d_near - Le, 0.0)
            s_hi = d_far + Le
            maxfac = jnp.maximum(
                jnp.abs(1.0 - s_lo / (F * dmax + Le)),
                jnp.abs(1.0 - s_hi / jnp.maximum(F - Le, 1e-6)))
            padn = (k * s_hi + Le * maxfac + eps)[:, None]
        else:
            padn = (k * d_far + eps)[:, None]
        fp = 1e-3 * (nmax - nmin) + 1e-3  # fp slack (pack_bvh_tables)
        nodes = jnp.concatenate([
            nmin - padn - fp, nmax + padn + fp,
            scene.accel.node_skip[:, None].astype(jnp.float32),
            scene.accel.node_first[:, None].astype(jnp.float32),
            scene.accel.node_count[:, None].astype(jnp.float32)],
            axis=1).T
        if node_only:
            bvh_inputs = [nodes]
        else:
            pidx_t = scene.accel.prim_index[None, :].astype(jnp.float32)
            bvh_inputs = [nodes, pad1(pidx_t)]

    rows = n_blocks * block_rows
    table_spec = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    lane_spec = lambda: pl.BlockSpec((block_rows, LANE), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[table_spec() for _ in range(len(bvh_inputs) + 3)]
        + [lane_spec() for _ in range(2)],
        out_specs=lane_spec(),
        out_shape=jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
        interpret=interpret,
    )(*bvh_inputs, bs, pln, cam,
      prep(px.astype(jnp.float32)), prep(py.astype(jnp.float32)))
    return out.reshape(-1)[:B]


def pack_tables(scene):
    """Scene pytree -> packed f32 tables (spheres, tris, lights, mats).

    Tables are TRANSPOSED - (columns, rows), read as tab[col, idx] - not
    (rows, columns): Mosaic pads every SMEM window row to 512 bytes, so a
    row-major (N,5) table costs 512*N bytes while the (5,N) layout costs
    ~4*N per column row. That padding is what capped the kernel at ~96
    primitives in round 1; transposed, 4096-primitive tables fit easily
    in the 1 MB SMEM.
    """
    g, m, l = scene.geometry, scene.materials, scene.lights
    f32 = jnp.float32
    sph = jnp.concatenate([
        g.sph_center.astype(f32),
        g.sph_radius[:, None].astype(f32),
        g.sph_mat[:, None].astype(f32)], axis=1).T  # (5,Ns)
    e1 = g.tri_v1 - g.tri_v0
    e2 = g.tri_v2 - g.tri_v0
    tri_cols = [
        g.tri_v0.astype(f32), e1.astype(f32), e2.astype(f32),
        g.tri_normal.astype(f32),
        g.tri_mat[:, None].astype(f32)]
    if getattr(g, "tri_vn", None) is not None:
        # Smooth-shading vertex normals: rows 13-21 = n0.xyz n1.xyz
        # n2.xyz (scene.Geometry.tri_vn). Appended ONLY for scenes that
        # carry them, so flat scenes keep the (13,Nt) table shape and
        # their compilation-cache entries; the kernels detect the mode
        # by tri.shape[0] >= 22.
        tri_cols.append(g.tri_vn.astype(f32))
    tri = jnp.concatenate(tri_cols, axis=1).T  # (13,Nt) or (22,Nt)
    pln = jnp.concatenate([
        g.pl_point.astype(f32), g.pl_normal.astype(f32),
        g.pl_mat[:, None].astype(f32)], axis=1).T  # (7,Np)
    lit = jnp.concatenate([
        l.position.astype(f32), l.color.astype(f32),
        l.intensity[:, None].astype(f32)], axis=1).T  # (7,L)
    mat_cols = [
        m.kind[:, None].astype(f32), m.albedo.astype(f32),
        m.roughness[:, None].astype(f32), m.metallic[:, None].astype(f32),
        m.specular[:, None].astype(f32), m.ior[:, None].astype(f32),
        m.emit.astype(f32), m.eff_albedo.astype(f32)]
    if getattr(m, "has_advanced", False):
        # Extended-kind aux columns (subsurface/anisotropic/clearcoat/
        # sheen/emission/mirror params). Appended ONLY for advanced tables
        # so seven-kind scenes keep their (14,M) shape (and their
        # compilation-cache entries).
        mat_cols += [m.aux_vec.astype(f32), m.aux_a[:, None].astype(f32),
                     m.aux_b[:, None].astype(f32)]
    mat = jnp.concatenate(mat_cols, axis=1).T  # (14,M) or (19,M)
    return sph, tri, pln, lit, mat


def pack_bvh_tables(accel, inflate: float = 0.0):
    """FlatBVH -> (nodes (N,9) f32, prim_idx (P,1) f32) SMEM tables.

    Node row: [min.xyz, max.xyz, skip, first, count] - the int fields are
    exact in f32 up to 2^24 nodes. ``inflate`` grows each AABB by
    (inflate * extent + inflate) per side; the conservative primary-hit
    mask uses this so float rounding in the slab test can never exclude a
    lane the trace kernel would hit.
    """
    nmin = jnp.asarray(accel.node_min, jnp.float32)
    nmax = jnp.asarray(accel.node_max, jnp.float32)
    if inflate > 0.0:
        pad = inflate * (nmax - nmin) + inflate
        nmin = nmin - pad
        nmax = nmax + pad
    nodes = jnp.concatenate([
        nmin, nmax,
        accel.node_skip[:, None].astype(jnp.float32),
        accel.node_first[:, None].astype(jnp.float32),
        accel.node_count[:, None].astype(jnp.float32)], axis=1).T  # (9,N)
    pidx = accel.prim_index[None, :].astype(jnp.float32)  # (1,P)
    return nodes, pidx


def pack_stream_table(scene):
    """Scene -> (P_pad, C) f32 HBM table of unified prim rows in BVH
    leaf order (the stream kernel's DMA source).

    Unified row (STREAM_COLS / STREAM_COLS_VN floats):
      col 0      tag: 0 = sphere, 1 = triangle, 2 = cube-face triangle
                 (mask-only: boxes own its closest-hit AND occlusion;
                 see scene.Geometry.occl_tris), -1 = padding
      cols 1-13  the tri-table layout (v0.xyz, e1.xyz, e2.xyz, n.xyz,
                 mat); spheres store center in the v0 slot, radius in
                 e1.x, mat in col 13
      cols 14-22 vertex normals n0/n1/n2 (vn scenes only)

    Rows are PERMUTED by accel.prim_index so a leaf's prims are the
    contiguous rows [node_first, node_first+node_count) - one sliced
    async_copy per leaf visit. The table is padded by accel.leaf_size
    tag=-1 rows so the fixed-size DMA window never reads out of bounds.
    """
    g = scene.geometry
    accel = scene.accel
    f32 = jnp.float32
    ns = g.sph_center.shape[0]
    nt = g.tri_v0.shape[0]
    occl = getattr(g, "occl_tris", -1)
    nt_occl = nt if occl < 0 else int(occl)
    has_vn = getattr(g, "tri_vn", None) is not None
    cols = STREAM_COLS_VN if has_vn else STREAM_COLS

    # Traceable build (runs under jit): assemble per-type row blocks
    # with jnp and permute with a gather.
    z = lambda n, c: jnp.zeros((n, c), f32)
    parts = []
    if ns:
        sph_rows = jnp.concatenate([
            z(ns, 1),                                   # tag 0
            g.sph_center.astype(f32),                   # cols 1-3
            g.sph_radius[:, None].astype(f32),          # col 4
            z(ns, 8),                                   # cols 5-12
            g.sph_mat[:, None].astype(f32),             # col 13
        ] + ([z(ns, 9)] if has_vn else []), axis=1)
        parts.append(sph_rows)
    if nt:
        v0 = g.tri_v0.astype(f32)
        tags = jnp.where(jnp.arange(nt) < nt_occl, 1.0, 2.0)[:, None]
        tri_parts = [
            tags,
            v0,
            (g.tri_v1.astype(f32) - v0),
            (g.tri_v2.astype(f32) - v0),
            g.tri_normal.astype(f32),
            g.tri_mat[:, None].astype(f32),
        ]
        if has_vn:
            tri_parts.append(g.tri_vn.astype(f32).reshape(nt, 9))
        parts.append(jnp.concatenate(tri_parts, axis=1))
    rows = jnp.concatenate(parts, axis=0)
    rows = jnp.take(rows, accel.prim_index, axis=0)
    pad = jnp.concatenate(
        [jnp.full((int(accel.leaf_size), 1), -1.0, f32),
         z(int(accel.leaf_size), cols - 1)], axis=1)
    rows = jnp.concatenate([rows, pad], axis=0)
    # Mosaic models HBM refs as tiled (1D: 1024 elements; 2D: 128-lane
    # minor) and rejects DMA slices not aligned to the tile, so the row
    # width pads to STREAM_ROW (one 128-lane tile): arbitrary-ROW slices
    # of a (P_pad, 128) table are legal, and each leaf visit is one
    # (leaf_size, 128) chunk.
    return jnp.pad(rows, ((0, 0), (0, STREAM_ROW - cols)))


def pack_bvh4_tables(wide4):
    """WideBVH4 -> (36, W) f32 SMEM table for the 4-ary stack walk.

    Rows 9s..9s+8 for slot s: [min.xyz, max.xyz, child, first, count]
    (int fields exact in f32 up to 2^24). Empty slots carry inverted
    AABBs (+BIG/-BIG) so their slab test can never pass."""
    rows = []
    for s in range(4):
        rows += [wide4.slot_min[:, s, 0], wide4.slot_min[:, s, 1],
                 wide4.slot_min[:, s, 2],
                 wide4.slot_max[:, s, 0], wide4.slot_max[:, s, 1],
                 wide4.slot_max[:, s, 2],
                 wide4.slot_child[:, s].astype(jnp.float32),
                 wide4.slot_first[:, s].astype(jnp.float32),
                 wide4.slot_count[:, s].astype(jnp.float32)]
    return jnp.stack(rows, axis=0).astype(jnp.float32)  # (36, W)


def _env_wide_bvh() -> bool:
    """4-ary walk gate: RT_WIDE_BVH=0 forces the binary skip walk (A/B
    knob; read at trace time, so set it before the first render)."""
    import os
    return os.environ.get("RT_WIDE_BVH", "1") != "0"


def trace_pallas(scene, origin, direction, pix_id, samp_id, cfg,
                 block_rows: int = DEFAULT_BLOCK_ROWS,
                 interpret: bool | None = None,
                 start_bounce: int = 0, end_bounce: int | None = None,
                 init_throughput=None, init_alive=None,
                 return_state: bool = False):
    """Pallas megakernel trace: same contract as trace.trace.

    origin/direction: (B,3); pix_id/samp_id: (B,) uint32. Returns (B,3),
    or (radiance, state) when return_state=True, where state is a dict of
    (origin, direction, throughput, alive) usable to resume: running
    [0,B) with return_state then [B,D) from that state sums (radiance
    parts add) to exactly the [0,D) result - RNG streams key off the
    absolute bounce index.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    ns = scene.geometry.sph_center.shape[0]
    nt = scene.geometry.tri_v0.shape[0]
    npl = scene.geometry.pl_point.shape[0]
    nl = scene.lights.position.shape[0]
    nm = scene.materials.kind.shape[0]

    B = origin.shape[0]
    blk = block_rows * LANE
    n_blocks = -(-B // blk)
    pad = n_blocks * blk - B

    def prep(x):
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        return x

    o = prep(origin.astype(jnp.float32))
    d = prep(direction.astype(jnp.float32))
    pix = prep(pix_id.astype(jnp.uint32)).reshape(-1, LANE)
    samp = prep(samp_id.astype(jnp.uint32)).reshape(-1, LANE)

    if init_throughput is None:
        tp = jnp.ones_like(o)
    else:
        tp = prep(init_throughput.astype(jnp.float32))
    if init_alive is None:
        al = jnp.ones((o.shape[0],), jnp.float32)
    else:
        # padding lanes must be dead, so pad with zeros (prep pads 0)
        al = prep(init_alive.astype(jnp.float32))

    comps = ([o[:, i].reshape(-1, LANE) for i in range(3)]
             + [d[:, i].reshape(-1, LANE) for i in range(3)]
             + [tp[:, i].reshape(-1, LANE) for i in range(3)]
             + [al.reshape(-1, LANE)])

    sph, tri, pln, lit, mat = pack_tables(scene)
    g = scene.geometry
    nb = getattr(g, "box_min", jnp.zeros((0, 3))).shape[0]
    occl = getattr(g, "occl_tris", -1)
    nt_occl = nt if occl < 0 else occl
    boxt = jnp.concatenate(
        [g.box_min.astype(jnp.float32), g.box_max.astype(jnp.float32),
         g.box_mat[:, None].astype(jnp.float32)],
        axis=1).T if nb else jnp.zeros((7, 0), jnp.float32)
    # Mosaic rejects 0-length operands; pad empty tables to one
    # (never-read) column - primitive loops run over the *static* counts.
    pad1 = lambda a: a if a.shape[-1] else jnp.zeros(a.shape[:-1] + (1,),
                                                     a.dtype)
    sph, tri, pln, lit, mat, boxt = (pad1(sph), pad1(tri), pad1(pln),
                                     pad1(lit), pad1(mat), pad1(boxt))

    mode = _kernel_mode(scene)
    bvh_inputs = []
    bvh_specs = []
    n_nodes = 0
    wide = False
    max_stack = 0
    scratch = []
    stream_cols = 0
    leaf_max = 0
    table_spec = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    if mode == "bvh":
        nodes, pidx = pack_bvh_tables(scene.accel)
        n_nodes = nodes.shape[1]  # (9, N) transposed layout
        bvh_inputs = [nodes, pidx]
        bvh_specs = [table_spec(), table_spec()]
        wide4 = getattr(scene.accel, "wide4", None)
        wide = wide4 is not None and _env_wide_bvh()
        if wide:
            bvh_inputs.append(pack_bvh4_tables(wide4))
            bvh_specs.append(table_spec())
            # +4: slot stores go through stack[sp..sp+3] before the
            # push-count settles (see closest_fn_wide).
            max_stack = wide4.max_stack + 4
            scratch = [pltpu.SMEM((max_stack,), jnp.int32)]
    elif mode == "stream":
        # Nodes in SMEM; unified prim rows stay in HBM and stream into
        # the SMEM scratch per leaf visit. The sph/tri SMEM tables are
        # exactly what does NOT fit at this scale - replace them with
        # never-read dummies (the walks read only the streamed rows).
        sph = jnp.zeros((5, 1), jnp.float32)
        tri = jnp.zeros((13, 1), jnp.float32)
        nodes, _ = pack_bvh_tables(scene.accel)
        n_nodes = nodes.shape[1]
        # Prefer the build-time packed table (scene._attach_stream_table);
        # the in-graph rebuild is kept for hand-built scenes that attach
        # an accel without going through with_accel/from_dict.
        stream_tab = getattr(scene.accel, "stream_tab", None)
        if stream_tab is None:
            stream_tab = pack_stream_table(scene)
        has_vn = getattr(scene.geometry, "tri_vn", None) is not None
        stream_cols = STREAM_COLS_VN if has_vn else STREAM_COLS
        # node_count <= leaf_size is the builder's contract (build_bvh
        # recurses until a node fits the leaf size).
        leaf_max = int(scene.accel.leaf_size)
        bvh_inputs = [nodes, stream_tab]
        # Explicit HBM (not pl.ANY): the compiler would otherwise place
        # the table in VMEM, whose tiled layout rejects DMA slices not
        # 128-aligned on the minor dim; HBM is linear, so the (leaf, C)
        # row slice is one contiguous chunk.
        bvh_specs = [table_spec(),
                     pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
        # 4-wide stack walk (round 5): the closest-hit walks are >half a
        # dense glass-grid frame, and the 4-ary walk cuts the
        # latency-bound node steps ~4x. Joint SMEM budget gate: binary
        # nodes + the 36-row slot table + the DMA leaf scratch must fit
        # scalar memory (near the 262144-prim cap only the binary walk
        # fits; RT_WIDE_BVH=0 forces binary for A/B).
        wide4 = getattr(scene.accel, "wide4", None)
        if wide4 is not None and _env_wide_bvh():
            n_wide = wide4.slot_min.shape[0]
            smem_bytes = 4 * (nodes.size + 36 * n_wide
                              + leaf_max * STREAM_ROW)
            wide = smem_bytes <= 700_000
        if wide:
            bvh_inputs.append(pack_bvh4_tables(wide4))
            bvh_specs.append(table_spec())
            max_stack = wide4.max_stack + 4
        scratch = (([pltpu.SMEM((max_stack,), jnp.int32)] if wide else [])
                   + [pltpu.SMEM((leaf_max, STREAM_ROW), jnp.float32),
                      pltpu.SemaphoreType.DMA])

    kernel = _make_kernel(ns, nt, nl, nm, npl, cfg,
                          start_bounce=start_bounce,
                          end_bounce=end_bounce,
                          return_state=return_state,
                          mode=mode, n_nodes=n_nodes,
                          advanced=getattr(scene.materials, "has_advanced",
                                           False),
                          textures=tuple(getattr(scene.materials,
                                                 "textures", ()) or ()),
                          wide=wide, max_stack=max_stack,
                          nb=nb, nt_occl=nt_occl,
                          stream_cols=stream_cols, leaf_max=leaf_max)

    rows = n_blocks * block_rows
    n_out = 13 if return_state else 3
    lane_spec = lambda: pl.BlockSpec((block_rows, LANE),
                                     lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=bvh_specs + [table_spec() for _ in range(6)]
        + [lane_spec() for _ in range(12)],
        out_specs=[lane_spec() for _ in range(n_out)],
        out_shape=[jax.ShapeDtypeStruct((rows, LANE), jnp.float32)
                   for _ in range(n_out)],
        scratch_shapes=scratch,
        interpret=interpret,
    )(*bvh_inputs, sph, tri, pln, boxt, lit, mat, pix, samp, *comps)

    rad = jnp.stack([c.reshape(-1) for c in out[:3]], axis=-1)[:B]
    if not return_state:
        return rad
    flat = [c.reshape(-1)[:B] for c in out[3:]]
    state = {
        "origin": jnp.stack(flat[0:3], axis=-1),
        "direction": jnp.stack(flat[3:6], axis=-1),
        "throughput": jnp.stack(flat[6:9], axis=-1),
        "alive": flat[9],
    }
    return rad, state

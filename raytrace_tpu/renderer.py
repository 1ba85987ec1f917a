"""Render driver: tiles -> sharded/banded SPMD wavefronts.

The reference's 32x32-tile goroutine pool (renderer.go:76-99, 398-436)
dissolves into array programs: a band of image rows x all samples becomes one
wavefront batch; bands are a host-side loop over one compiled XLA program.
Banding (instead of whole-image launch) keeps per-launch memory bounded AND
lets the while-loop early-exit fire per band - sky-heavy bands finish in one
bounce instead of being held hostage by the deepest lane in the image.

Per-pixel Monte Carlo accumulation is associative, so bands/samples can be
re-ordered, sharded, checkpointed and resumed freely (see parallel/).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from . import camera as cam_mod
from . import rng
from . import trace as trace_mod
from .ops import intersect, megakernel, tonemap
from .utils import image as image_util


@dataclasses.dataclass
class BenchmarkData:
    """Parity with renderer.go:31-42 (JSON keys identical)."""

    scene_name: str = ""
    resolution: str = ""
    render_time_seconds: float = 0.0
    samples: int = 0
    max_depth: int = 0
    num_workers: int = 0
    objects: int = 0
    lights: int = 0
    timestamp: str = ""
    features: tuple = (
        "Improved metallic reflections with Fresnel effect",
        "Shiny materials with configurable roughness and specular",
        "Enhanced light source reflections",
        "Better specular highlights for metallic surfaces",
    )

    def to_json(self) -> str:
        d = {
            "scene_name": self.scene_name,
            "resolution": self.resolution,
            "render_time_seconds": self.render_time_seconds,
            "samples": self.samples,
            "max_depth": self.max_depth,
            "num_workers": self.num_workers,
            "objects": self.objects,
            "lights": self.lights,
            "timestamp": self.timestamp,
            "features": list(self.features),
        }
        return json.dumps(d, indent=2)


def lane_radiance(scene, pix_id, samp_id, *, width: int, height: int,
                  cfg: trace_mod.TraceConfig, go_camera: bool = True):
    """Radiance for a flat wavefront of (pixel, sample) lanes, (B,3).

    The shared lane pipeline: sub-pixel jitter (renderer.go:154-157; the
    antiAliasing flag is never read by the reference - jitter is
    unconditional) -> camera rays -> wavefront trace. Used by both the
    single-chip band driver and the sharded SPMD driver (parallel/shard.py);
    because the RNG is a pure function of (pix_id, samp_id), results are
    bit-identical under any sharding of the lanes.
    """
    dtype = scene.geometry.sph_center.dtype
    ju, jv, _, _ = rng.uniform4(pix_id, samp_id, rng.Streams.CAMERA_JITTER,
                                cfg.seed)
    x = (pix_id % np.uint32(width)).astype(dtype)
    y = (pix_id // np.uint32(width)).astype(dtype)
    u = (x + ju) / width
    v = (y + jv) / height

    rays = cam_mod.go_rays if go_camera else cam_mod.lookat_rays
    origin, direction = rays(scene.camera, u, v)
    if cfg.depth_of_field:
        origin, direction = cam_mod.thin_lens_perturb(
            scene.camera, origin, direction, pix_id, samp_id, cfg.seed,
            cfg.dof_lens_radius, cfg.dof_focus_distance)
    return trace_mod.trace(scene, origin, direction, pix_id, samp_id, cfg)


@partial(jax.jit, static_argnames=("width", "height", "band_h", "samples",
                                   "cfg", "go_camera"))
def render_band(scene, band_y0, *, width: int, height: int, band_h: int,
                samples: int, cfg: trace_mod.TraceConfig,
                go_camera: bool = True):
    """Render `band_h` rows starting at row band_y0 (traced scalar).

    Returns mean linear radiance per pixel, shape (band_h, width, 3).
    Lane layout: (band_h * width * samples,), pixel-major.
    """
    n_px = band_h * width
    ys = band_y0 + jax.lax.broadcasted_iota(jnp.int32, (band_h, width), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (band_h, width), 1)
    pix_flat = (ys * width + xs).reshape(-1).astype(jnp.uint32)  # (n_px,)

    pix_id = jnp.repeat(pix_flat, samples)  # (n_px * samples,)
    samp_id = jnp.tile(jnp.arange(samples, dtype=jnp.uint32), n_px)

    radiance = lane_radiance(scene, pix_id, samp_id, width=width,
                             height=height, cfg=cfg, go_camera=go_camera)
    mean = radiance.reshape(n_px, samples, 3).mean(axis=1)
    return mean.reshape(band_h, width, 3)


def pick_band_height(width: int, height: int, samples: int,
                     lane_budget: int = 1 << 21,
                     n_prims: int = 1) -> int:
    """Largest row band whose wavefront stays under the lane budget.

    For primitive-heavy scenes the budget additionally caps the
    (lanes x primitives) work product at ~2^28 per band: a depth-50
    brute-force band over 2M lanes x 1000 primitives is a multi-minute
    single XLA program, which the tunneled TPU worker's execution
    watchdog kills (see intersect.use_accel). Scenes up to ~128
    primitives keep the plain lane budget (bit-identical bands to the
    historical ones - the committed compilation cache stays valid).
    """
    if n_prims > 128:
        lane_budget = min(lane_budget, max(1 << 15, (1 << 28) // n_prims))
    rows = max(1, lane_budget // max(1, width * samples))
    return int(min(rows, height))


def scene_prim_count(scene) -> int:
    g = scene.geometry
    return int(g.sph_center.shape[0] + g.tri_v0.shape[0]
               + g.pl_point.shape[0])


# ---------------------------------------------------------------------------
# Compacted wavefront driver (Pallas megakernel path)
# ---------------------------------------------------------------------------

def _lane_rays(scene, pix_id, samp_id, *, width: int, height: int,
               cfg: trace_mod.TraceConfig, go_camera: bool):
    """Camera rays for (pixel, sample) lane ids - pure arithmetic, so the
    compacted path regenerates rays instead of gathering stored ones."""
    dtype = scene.geometry.sph_center.dtype
    ju, jv, _, _ = rng.uniform4(pix_id, samp_id, rng.Streams.CAMERA_JITTER,
                                cfg.seed)
    x = (pix_id % np.uint32(width)).astype(dtype)
    y = (pix_id // np.uint32(width)).astype(dtype)
    u = (x + ju) / width
    v = (y + jv) / height
    rays = cam_mod.go_rays if go_camera else cam_mod.lookat_rays
    origin, direction = rays(scene.camera, u, v)
    if cfg.depth_of_field:
        origin, direction = cam_mod.thin_lens_perturb(
            scene.camera, origin, direction, pix_id, samp_id, cfg.seed,
            cfg.dof_lens_radius, cfg.dof_focus_distance)
    return origin, direction


@partial(jax.jit, static_argnames=("width", "height", "samples", "cfg",
                                   "go_camera"))
def _pixel_mask(scene, *, width: int, height: int, samples: int,
                cfg: trace_mod.TraceConfig, go_camera: bool):
    """Stage 1: per-PIXEL primary-hit mask + compaction metadata.

    A lane that misses all geometry contributes exactly black
    (renderer.go:170-173), so only pixels whose samples hit anything enter
    the bounce kernel (~2-5% for the demo scenes). Compaction happens at
    pixel granularity: the scatter that builds the compacted list is over
    n_px elements, not n_px*spp - TPU scatters are slow enough that
    lane-granular compaction would dominate the whole render. Only the
    scalar hit count crosses to the host.
    """
    n_px = width * height
    pix = jnp.arange(n_px, dtype=jnp.uint32)
    if jax.default_backend() == "tpu":
        # Per-PIXEL cone mask: ONE central ray per pixel against
        # cone-inflated primitives covers every jittered sample - a
        # spp-independent pass costing 1/spp of the per-lane mask (which
        # was ~22 of the headline frame's ~25 ms at 100 spp). Thin-lens
        # DoF widens the cone by the lens angle and adds the origin-shift
        # slack (round 4, megakernel.pixel_mask_pallas docstring), so DoF
        # renders stay on this path too.
        px = (pix % np.uint32(width)).astype(jnp.float32)
        py = (pix // np.uint32(width)).astype(jnp.float32)
        hit_px = megakernel.pixel_mask_pallas(
            scene, px, py, width=width, height=height, cfg=cfg,
            go_camera=go_camera) > 0.0
    else:
        pix_id = jnp.repeat(pix, samples)
        samp_id = jnp.tile(jnp.arange(samples, dtype=jnp.uint32), n_px)
        origin, direction = _lane_rays(scene, pix_id, samp_id, width=width,
                                       height=height, cfg=cfg,
                                       go_camera=go_camera)
        # exact=True: the mask must use the SAME triangle expressions as
        # the trace's closest-hit - the division-free shadow form can
        # flip a 1-2 ulp boundary ray in the EXCLUDE direction, and an
        # excluded pixel is permanently black (the mask invariant:
        # over-include freely, never exclude). The TPU mask kernels
        # above carry their own epsilon slack instead.
        hit = intersect.any_hit(scene.geometry, origin, direction, 1e-3,
                                intersect.BIG,
                                accel=getattr(scene, "accel", None),
                                exact=True)
        hit_px = jnp.any(hit.reshape(n_px, samples), axis=1)
    pos_px = jnp.cumsum(hit_px.astype(jnp.int32)) - 1
    return hit_px, pos_px, pos_px[-1] + 1


@partial(jax.jit, static_argnames=("k_pad",))
def _compact_pixels(hit_px, pos_px, *, k_pad: int):
    """Scatter hit pixel ids into their compacted slots (on device)."""
    n = hit_px.shape[0]
    target = jnp.where(hit_px, pos_px, k_pad)  # out-of-range -> dropped
    return jnp.zeros((k_pad,), jnp.int32).at[target].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")


@partial(jax.jit, static_argnames=("k_pad", "width", "height", "samples",
                                   "cfg", "go_camera", "block_rows",
                                   "split", "surv_cap", "sum_image",
                                   "deep_caps"))
def _compact_and_trace(scene, hit_px, pos_px, k_px, *, k_pad: int,
                       width: int, height: int, samples: int,
                       cfg: trace_mod.TraceConfig, go_camera: bool,
                       block_rows: int, split: int = 0, surv_cap: int = 0,
                       samp_base=None, sum_image: bool = False,
                       deep_caps: str = "const"):
    """Fused stage 2: pixel compaction + trace in one dispatch (one RPC
    round-trip matters when the TPU is reached through a tunnel)."""
    px_cidx = _compact_pixels.__wrapped__(hit_px, pos_px, k_pad=k_pad)
    return _trace_compacted_pixels.__wrapped__(
        scene, px_cidx, k_px, width=width, height=height, samples=samples,
        cfg=cfg, go_camera=go_camera, block_rows=block_rows, split=split,
        surv_cap=surv_cap, samp_base=samp_base, sum_image=sum_image,
        deep_caps=deep_caps)


def _split_levels(split) -> tuple:
    """Normalize a split spec (0 | int | tuple of ascending bounces)."""
    if not split:
        return ()
    if isinstance(split, int):
        return (split,)
    return tuple(split)


def trace_with_split(scene, origin, direction, pix, samp, cfg, *,
                     block_rows: int, split=0, surv_cap: int = 0,
                     deep_caps: str = "const"):
    """trace_pallas with optional mid-trace survivor re-compaction.

    `split` is 0 (plain trace), a bounce index, or an ascending TUPLE of
    bounce indices (round 5: multi-level — glass scenes keep shedding
    lanes deep into the trace, so the wavefront re-compacts at EACH
    level; the bounce-16..50 tail still cost 2.6 s of the grid's 8.0 s
    frame after a single bounce-6 split). Each level runs its bounce
    segment, compacts the lanes still alive (one cumsum + one scatter
    of lane ids + cheap gathers), and recurses on the compacted
    wavefront. Levels below the first reuse the FIRST level's capacity:
    alive lanes never resurrect, so k_surv at any deeper level is
    bounded by the lanes that fit level 1 — deep overflow is
    structurally impossible, and only level 1 can trip the self-heal.
    (Geometrically shrinking deep caps — half of current per level —
    overflowed on "hot" sample rounds whose survivors decay slower
    than 2x per level: a deterministic grid chunk measured 17.8% alive
    at bounce 4 vs the 11.7% typical, observed round 5.) Returns
    (radiance (B,3), overflow): overflow > 0 means some level's cap was
    too small and tail radiance was dropped - callers must re-render
    unsplit (bit-comparable either way: RNG streams key off absolute
    bounce indices; the only difference is the per-level radiance-sum
    float reassociation, ~1e-7 relative).
    """
    levels = tuple(b for b in _split_levels(split)
                   if 0 < b < cfg.max_depth)

    def go(o, d, px_, sp_, tp, al, b0, rest, cap0):
        kw = {}
        if b0 > 0:
            kw = dict(init_throughput=tp, init_alive=al)
        if not rest:
            rad = megakernel.trace_pallas(
                scene, o, d, px_, sp_, cfg, block_rows=block_rows,
                start_bounce=b0, **kw)
            return rad, jnp.int32(0)
        b1 = rest[0]
        n = o.shape[0]
        if cap0 > 0:
            cap = min(n, cap0)
        elif deep_caps == "const":
            # glassy scene, deep level: REUSE the previous level's cap
            # (== this wavefront's size) — alive lanes never resurrect,
            # so k_surv <= n == cap and deep overflow is impossible.
            # "Hot" sample rounds decay slower than 2x per level there
            # (a deterministic grid chunk measured 17.8% alive at
            # bounce 4 vs 11.7% typical) and blacklisted shrinking caps.
            cap = n
        else:
            # fast-decay scene, deep level: halve — mesh-class survivor
            # counts drop ~4x per level, and constant caps cost 6 extra
            # near-dead relaunch wavefronts (mesh 6.3 vs 4.3 s measured)
            cap = _auto_surv_cap(n, block_rows, frac=2)
        radA, st = megakernel.trace_pallas(
            scene, o, d, px_, sp_, cfg, block_rows=block_rows,
            start_bounce=b0, end_bounce=b1, return_state=True, **kw)
        alive = st["alive"] > 0.0
        pos = jnp.cumsum(alive.astype(jnp.int32)) - 1
        k_surv = pos[-1] + 1
        overflow = jnp.maximum(0, k_surv - cap)
        target = jnp.where(alive, jnp.minimum(pos, cap - 1), cap)
        sidx = jnp.zeros((cap,), jnp.int32).at[target].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")
        valid_s = jnp.arange(cap) < jnp.minimum(k_surv, cap)
        take = lambda a: jnp.take(a, sidx, axis=0)
        radB, ov_deep = go(
            take(st["origin"]), take(st["direction"]), take(px_),
            take(sp_), take(st["throughput"]),
            jnp.where(valid_s, take(st["alive"]), 0.0),
            b1, rest[1:], 0)
        radB = jnp.where(valid_s[:, None], radB, 0.0)
        return radA.at[sidx].add(radB, mode="drop"), overflow + ov_deep

    return go(origin, direction, pix, samp, None, None, 0, levels,
              surv_cap)


@partial(jax.jit, static_argnames=("width", "height", "samples", "cfg",
                                   "go_camera", "block_rows", "split",
                                   "surv_cap", "sum_image",
                                   "deep_caps"))
def _trace_compacted_pixels(scene, px_cidx, k_px, *, width: int,
                            height: int, samples: int,
                            cfg: trace_mod.TraceConfig, go_camera: bool,
                            block_rows: int, split: int = 0,
                            surv_cap: int = 0, samp_base=None,
                            sum_image: bool = False,
                            deep_caps: str = "const"):
    """Stage 2: regenerate rays for compacted pixels, trace, segment-add
    per-pixel sums back into the image.

    With split > 0 the trace runs in two segments with a survivor
    re-compaction in between: segment A covers bounces [0, split) over all
    lanes; the few lanes still alive (glass TIR tails - measured ~0.3%
    after 4 bounces on the headline scene) are compacted into `surv_cap`
    slots and segment B finishes [split, max_depth). Without the split,
    one never-dying lane holds its whole block for all 50 bounces.
    Returns (image, overflow): overflow > 0 means surv_cap was too small
    (caller re-runs unsplit; bit-identical either way since RNG streams
    key off absolute bounce indices).
    """
    k_pad = px_cidx.shape[0]
    n_px = width * height
    # (Sorting compacted pixels by primary-hit material was tried and
    # measured SLOWER: ascending-pixel order is already spatially
    # coherent, and the sort/gather overhead exceeds the early-exit gain.)
    pix_c = jnp.repeat(px_cidx.astype(jnp.uint32), samples)
    samp_c = jnp.tile(jnp.arange(samples, dtype=jnp.uint32), k_pad)
    if samp_base is not None:
        # spp-chunked dispatch (render_wavefront_chunked): this call
        # covers global sample ids [samp_base, samp_base + samples) -
        # traced, so every full-size chunk reuses one compiled program.
        samp_c = samp_c + jnp.asarray(samp_base, jnp.uint32)
    origin, direction = _lane_rays(scene, pix_c, samp_c, width=width,
                                   height=height, cfg=cfg,
                                   go_camera=go_camera)

    rad, overflow = trace_with_split(
        scene, origin, direction, pix_c, samp_c, cfg,
        block_rows=block_rows, split=split, surv_cap=surv_cap,
        deep_caps=deep_caps)

    px_sum = rad.reshape(k_pad, samples, 3).sum(axis=1)
    # Padding slots repeat pixel 0; drop them instead of double-adding.
    valid = jnp.arange(k_pad) < k_px
    target = jnp.where(valid, px_cidx, n_px)
    img = jnp.zeros((n_px, 3), rad.dtype).at[target].add(px_sum,
                                                         mode="drop")
    if sum_image:  # chunked accumulation: caller divides by total spp
        return img.reshape(height, width, 3), overflow
    return (img / samples).reshape(height, width, 3), overflow


@partial(jax.jit, static_argnames=("k_pad", "width", "height", "samples",
                                   "cfg", "go_camera", "block_rows",
                                   "post", "split", "surv_cap",
                                   "deep_caps"))
def _render_fused(scene, *, k_pad: int, width: int, height: int,
                  samples: int, cfg: trace_mod.TraceConfig,
                  go_camera: bool, block_rows: int, post=None,
                  split: int = 0, surv_cap: int = 0,
                  deep_caps: str = "const"):
    """Whole wavefront render in ONE dispatch, given a capacity k_pad.

    Returns (img, k_px, overflow): the caller must check k_px <= k_pad -
    if the hit-pixel count exceeded the speculative capacity, pixels were
    dropped and the render must be redone with a larger k_pad - and
    overflow == 0 (survivor re-compaction capacity held; see
    _trace_compacted_pixels). Used for steady-state renders (same
    scene/resolution) where the capacity from the previous frame is
    almost always still right, collapsing the mask -> count -> trace
    sequence into a single RPC round-trip.
    """
    hit_px, pos_px, k_px = _pixel_mask.__wrapped__(
        scene, width=width, height=height, samples=samples, cfg=cfg,
        go_camera=go_camera)
    img, overflow = _compact_and_trace.__wrapped__(
        scene, hit_px, pos_px, k_px, k_pad=k_pad, width=width,
        height=height, samples=samples, cfg=cfg, go_camera=go_camera,
        block_rows=block_rows, split=split, surv_cap=surv_cap,
        deep_caps=deep_caps)
    if post is not None:
        img = post(img)
    return img, k_px, overflow


# Speculative capacity cache for the fused path: config -> last k_pad.
# Bounded FIFO: the key includes cfg (and thus the seed), so progressive/
# checkpointed rendering would otherwise grow it without limit.
_KPAD_CACHE: dict = {}
_KPAD_CACHE_MAX = 64


def _kpad_cache_put(key, value):
    if key not in _KPAD_CACHE and len(_KPAD_CACHE) >= _KPAD_CACHE_MAX:
        _KPAD_CACHE.pop(next(iter(_KPAD_CACHE)))
    _KPAD_CACHE[key] = value


def _pad_bucket(k: int, quantum: int) -> int:
    """Round k up to a power-of-two number of quanta (few recompiles)."""
    blocks = max(1, -(-k // quantum))
    return quantum * (1 << (blocks - 1).bit_length())


# Deferred capacity flags from assume_capacity frames:
# (key, k_dev, k_pad, overflow_dev).
_PENDING_CHECKS: list = []

# Configs whose survivor re-compaction capacity overflowed: render
# unsplit from then on (pick_split policy misfits the scene).
_SPLIT_BLACKLIST: set = set()


def flush_capacity_checks() -> int:
    """Sync the deferred per-frame capacity flags from assume_capacity
    renders and raise if any frame overflowed its speculative capacity
    (i.e. silently dropped pixels because the scene changed) or its
    survivor re-compaction capacity (split trace dropped live lanes).

    Callers batching device-resident frames (bench.py) call this once per
    batch: ONE host transfer for the whole batch - the flags are stacked
    on device first (a per-flag ``int()`` loop costs a ~30 ms tunnel RPC
    each and once measured as a +30 ms/frame tax on the headline bench).
    Returns the number of frames validated."""
    global _PENDING_CHECKS
    pending, _PENDING_CHECKS = _PENDING_CHECKS, []
    if not pending:
        return 0
    ks = np.asarray(jnp.stack(
        [jnp.stack([jnp.asarray(k_dev, jnp.int32),
                    jnp.asarray(ov, jnp.int32)])
         for _, k_dev, _, ov in pending]))
    for (key, _, k_pad, _), (k, ov) in zip(pending, ks):
        if int(ov) > 0:
            _SPLIT_BLACKLIST.add(key)
            raise RuntimeError(
                f"assume_capacity render overflowed the survivor "
                f"re-compaction capacity by {int(ov)} lanes; re-render "
                f"without assume_capacity (the config now renders "
                f"unsplit)")
        if int(k) > k_pad:
            _KPAD_CACHE.pop(key, None)  # force revalidation next frame
            raise RuntimeError(
                f"assume_capacity render dropped pixels: hit-pixel count "
                f"{int(k)} exceeded cached capacity {k_pad}; the scene "
                f"changed - re-render without assume_capacity")
    return len(pending)


def _auto_surv_cap(n_lanes: int, block_rows: int,
                   frac: Optional[int] = None) -> int:
    """Survivor re-compaction capacity: 1/4 of the wavefront
    (block-rounded). The round-3 ring profile showed ~1% alive past
    bounce 1 and used 1/8, but the glass-grid stream scenes that make
    the split a 1.6x win keep 12-15% alive at bounces 4-6 — right AT a
    1/8 cap, so individual sample rounds overflowed and blacklisted the
    split nondeterministically across resolutions/rounds (observed
    round 5). 1/4 clears that class with margin at a mild tail cost
    (grid frac sweep: 8.05 s at 1/8 vs 8.72 s at 1/3, still >>
    the 13.2 s unsplit). Overflow is reported, never silent.
    RT_SURV_FRAC=<k> overrides with 1/k. Multi-level schedules size
    only their FIRST level here; deeper levels reuse that capacity
    (see trace_with_split - deep overflow is then impossible)."""
    import os
    if frac is None:
        frac = max(1, int(os.environ.get("RT_SURV_FRAC", "4") or 4))
    blk = block_rows * megakernel.LANE
    return min(-(-n_lanes // blk) * blk,
               -(-max(1, n_lanes // frac) // blk) * blk)


def pick_split(scene, cfg) -> int:
    """Mid-trace survivor re-compaction bounce for deep traces.

    Default OFF: measured a clear TPU REGRESSION (tools/measure_split.py,
    2026-08-19, d50/soft16 800x600/20spp): ring-250 431 vs 224 ms/frame
    (1.93x slower), ring-1000 689 vs 582 ms (1.18x slower). The offline
    walk-step simulation that motivated it (survivors re-packed into ~1%
    of blocks for bounces 2..50) ignored what actually dominates: the
    split re-runs kernel SETUP (SMEM table loads, mask/feature gathers)
    twice and the full-wavefront cumsum/scatter compaction is itself
    ~1 frame-tail of work, while block early-exit already makes
    near-empty blocks cheap. RT_SPLIT=<b> forces a split at bounce b for
    future A/B (the code path stays tested); RT_NO_SPLIT=1 still forces
    it off.
    """
    import os
    if os.environ.get("RT_NO_SPLIT", "") == "1":
        return 0
    forced = os.environ.get("RT_SPLIT", "")
    if forced:
        # "6" or a multi-level "6,16" (ascending bounce indices)
        bs = tuple(int(x) for x in forced.split(",") if x)
        bs = tuple(b for b in bs if 0 < b < cfg.max_depth)
        # stream mode allowed for A/B since round 5: glass-grid scenes
        # keep far more lanes alive deep than the rings the round-3
        # negative was measured on.
        if bs and megakernel._kernel_mode(scene) in ("bvh", "stream"):
            return bs if len(bs) > 1 else bs[0]
        # RT_SPLIT set but unusable (e.g. "0", or levels >= max_depth):
        # an explicit request for NO split, not a fall-through to the
        # default ladder.
        return 0
    # Round 5: STREAM scenes default to a MULTI-LEVEL split ladder on
    # deep traces. The deep tail dominates there (grid-5833 hard frame:
    # bounces 8..50 are 70% — the block early-exit only skips FULLY
    # dead blocks, and glass keeps a lane alive in most of them), and
    # glass sheds lanes all the way down, so the wavefront re-compacts
    # repeatedly: grid full-d50 13.2 s unsplit -> 7.9 s single split ->
    # 4.83 s at the 4,8,13,19,27,38 ladder (@5spp); mesh 5.72 -> 4.1 s.
    # First level at 4 (the glass grid keeps ~15% of lanes alive there,
    # under the 1/4 first-level cap; a glassier scene self-heals via
    # blacklist + unsplit redo). Growth ~1.4x per level: survivors
    # decay slower than 4x between nearby levels, which is also why
    # deeper levels cap at 1/2 of their (already compacted) wavefront
    # (_auto_surv_cap frac=2 — a blanket 1/4-per-level overflowed the
    # dense schedules). RT_SPLIT="a,b,c" overrides; RT_SURV_FRAC tunes
    # the first-level capacity. bvh-mode ring scenes keep the round-3
    # unsplit default (1.18-1.93x the other way: their tails are tiny
    # and the re-launch overhead wins).
    if megakernel._kernel_mode(scene) == "stream" and cfg.max_depth >= 12:
        # Fast-decay (non-glassy) scenes start the ladder at bounce 2 -
        # few lanes survive even that early, and the dense-from-2
        # schedule measured mesh 4.14 s vs 5.28 s from-4. Glassy scenes
        # must start at 4 (alive@2 can exceed the 1/4 first-level cap).
        b = 2 if pick_deep_caps(scene) == "shrink" else 4
        levels = []
        while b <= cfg.max_depth - 2 and len(levels) < 8:
            levels.append(b)
            b = b + max(3, int(0.45 * b))
        return tuple(levels) if len(levels) > 1 else (levels[0]
                                                     if levels else 0)
    return 0


def pick_deep_caps(scene) -> str:
    """Deep-level capacity policy for multi-level splits (round 5).

    'const' for scenes with a meaningful dielectric primitive fraction:
    glass TIR chains sustain slow survivor decay, and "hot" sample
    rounds (17.8% alive at bounce 4 vs 11.7% typical on the grid scene,
    deterministic) overflow geometrically shrinking caps — constant
    caps make deep overflow impossible. 'shrink' otherwise: fast-decay
    scenes pay the extra near-dead relaunch wavefronts under constant
    caps (mesh 6.3 s const vs 4.3 s shrink, measured). Host-side only
    (reads concrete material tables - a tiny pull, and callers only ask
    on split-enabled frames, which are multi-second stream renders)."""
    from .models import materials as mat_mod
    g = scene.geometry
    mats = np.concatenate([np.asarray(g.sph_mat).reshape(-1),
                           np.asarray(g.tri_mat).reshape(-1)])
    if mats.size == 0:
        return "shrink"
    kinds = np.asarray(scene.materials.kind)
    refractive = ((kinds[mats] == mat_mod.GLASS)
                  | (kinds[mats] == mat_mod.DIELECTRIC))
    return "const" if float(np.mean(refractive)) >= 0.05 else "shrink"


def pick_block_rows(scene) -> int:
    """Kernel-mode-tuned Pallas block height.

    The chip has ONE TensorCore, so grid blocks run sequentially and the
    latency-bound BVH packet walk wants fewer, wider blocks (union node
    visits grow sublinearly with packet width): ring-1000 d50/soft16
    measures 799/703/738/1034 ms/frame at block_rows 8/16/32/64
    (tools/sweep_block_rows.py). Unroll/loop modes keep the historical 8
    (>8 measured within noise there, and the committed compilation cache
    for the headline scenes is keyed on it)."""
    return 16 if megakernel._kernel_mode(scene) in ("bvh", "stream") else 8


def render_wavefront(scene, *, width: int, height: int, samples: int,
                     cfg: trace_mod.TraceConfig, go_camera: bool = True,
                     block_rows: Optional[int] = None, as_numpy: bool = True,
                     assume_capacity: bool = False, post=None):
    """Compacted-wavefront render: (H, W, 3) mean linear radiance.

    Pipeline (all on device): primary any-hit over every lane (XLA) ->
    per-pixel cumsum compaction -> Pallas bounce megakernel over the
    surviving pixels' lanes -> per-pixel segment-add back into the image
    (missed pixels are exactly black). Monte Carlo results are identical
    to the dense path because every lane's RNG is keyed by
    (pixel, sample), not by its position in the compacted array. The host
    sees one scalar (the hit-pixel count, which sizes the kernel launch)
    and the final image.
    """
    if block_rows is None:
        block_rows = pick_block_rows(scene)
    # Quantum: pixels per pallas block (block lanes / spp), >= 1.
    quantum = max(1, (block_rows * megakernel.LANE) // max(1, samples))
    cache_key = (width, height, samples, cfg, go_camera, block_rows, post)
    split = 0 if cache_key in _SPLIT_BLACKLIST else pick_split(scene, cfg)
    deep_caps = pick_deep_caps(scene) if split else "const"

    k_pad = _KPAD_CACHE.get(cache_key)
    if k_pad is not None:
        # Speculative single-dispatch path with last frame's capacity.
        img, k_dev, ov_dev = _render_fused(
            scene, k_pad=k_pad, width=width, height=height,
            samples=samples, cfg=cfg, go_camera=go_camera,
            block_rows=block_rows, post=post, split=split,
            surv_cap=_auto_surv_cap(k_pad * samples, block_rows),
            deep_caps=deep_caps)
        if assume_capacity:
            # Caller asserts the scene is unchanged since a validated
            # render: skip the capacity-check sync so back-to-back frames
            # pipeline with no host round-trip (per-call RPC latency
            # dominates on a tunneled TPU). The device-side flags are
            # still RECORDED - callers validate a whole batch with one
            # sync via flush_capacity_checks(), so a stale capacity (or a
            # survivor-compaction overflow) can no longer drop pixels
            # silently.
            _PENDING_CHECKS.append((cache_key, k_dev, k_pad, ov_dev))
            if len(_PENDING_CHECKS) > 1024:  # backstop: force validation
                flush_capacity_checks()
            return np.asarray(img) if as_numpy else img
        # One transfer syncs both scalars; the image stays on device.
        k_px, ov = (int(v) for v in
                    np.asarray(jnp.stack([jnp.asarray(k_dev, jnp.int32),
                                          jnp.asarray(ov_dev, jnp.int32)])))
        if ov > 0:
            # Survivor capacity overflowed (scene keeps >1/8 of lanes
            # alive past the split - e.g. an enclosed box). Redo unsplit
            # below and stop splitting this config.
            _SPLIT_BLACKLIST.add(cache_key)
            split = 0
        else:
            want = min(_pad_bucket(max(k_px, 1), quantum), width * height)
            if k_px <= k_pad and k_pad <= max(2 * want, quantum):
                _kpad_cache_put(cache_key, want if k_px > 0 else k_pad)
                return np.asarray(img) if as_numpy else img
        # capacity stale (scene changed) or overflow: fall through, redo.

    hit_px, pos_px, k_dev = _pixel_mask(
        scene, width=width, height=height, samples=samples, cfg=cfg,
        go_camera=go_camera)
    k_px = int(k_dev)  # host sync sizes the launch
    if k_px <= 0:
        z = jnp.zeros((height, width, 3), jnp.float32)
        if post is not None:
            z = post(z)
        return np.asarray(z) if as_numpy else z

    k_pad = min(_pad_bucket(k_px, quantum), width * height)
    _kpad_cache_put(cache_key, k_pad)
    img, ov_dev = _compact_and_trace(
        scene, hit_px, pos_px, jnp.int32(k_px), k_pad=k_pad, width=width,
        height=height, samples=samples, cfg=cfg, go_camera=go_camera,
        block_rows=block_rows, split=split,
        surv_cap=_auto_surv_cap(k_pad * samples, block_rows),
        deep_caps=deep_caps)
    if split and int(ov_dev) > 0:  # first frame for this config
        _SPLIT_BLACKLIST.add(cache_key)
        img, ov_dev = _compact_and_trace(
            scene, hit_px, pos_px, jnp.int32(k_px), k_pad=k_pad,
            width=width, height=height, samples=samples, cfg=cfg,
            go_camera=go_camera, block_rows=block_rows, split=0)
    if post is not None:
        img = post(img)  # first frame only; steady state fuses it
    return np.asarray(img) if as_numpy else img


def pick_chunk_spp(scene, samples: int, cfg) -> int:
    """Samples per dispatch for render_wavefront_chunked.

    Stream-tier scenes (> MAX_BVH_KERNEL_PRIMS) at production spp can
    exceed a single dispatch's practical budget (this environment's
    tunneled worker kills executions past ~60-90 s; any runtime benefits
    from bounded dispatches). Per-frame cost is linear in spp, so the
    policy is a fixed per-dispatch sample budget; RT_CHUNK_SPP overrides.
    Other kernel modes render whole frames in one dispatch (headline
    frames are milliseconds)."""
    import os
    forced = os.environ.get("RT_CHUNK_SPP", "")
    if forced:
        return max(1, int(forced))
    if megakernel._kernel_mode(scene) == "stream":
        return min(samples, 10)
    return samples


def render_wavefront_chunked(scene, *, width: int, height: int,
                             samples: int, cfg: trace_mod.TraceConfig,
                             chunk: Optional[int] = None,
                             go_camera: bool = True,
                             block_rows: Optional[int] = None,
                             as_numpy: bool = True,
                             assume_capacity: bool = False, post=None):
    """render_wavefront split into sample rounds of <= `chunk` dispatches.

    Round r covers global sample ids [r*chunk, r*chunk + c): the counter
    RNG keys every draw off (pixel, sample, ...), so each round's lanes
    are exactly the lanes the single-dispatch render would trace, and
    per-pixel round sums accumulate on device in the same ascending
    sample order (one f32 add per round boundary). The full-frame image
    is pulled once at the end. This is how stream-tier scenes complete
    production-spp frames under a bounded per-dispatch budget (the Go
    reference renders any scene to completion, cmd/raytracer/main.go:51;
    a 100-spp stream dispatch here would exceed the tunneled worker's
    execution watchdog).

    The per-pixel cone mask is spp-independent, so it runs ONCE and all
    rounds share its compaction (and one capacity k_pad).
    """
    if block_rows is None:
        block_rows = pick_block_rows(scene)
    if chunk is None:
        chunk = pick_chunk_spp(scene, samples, cfg)
    chunk = max(1, min(chunk, samples))
    if chunk >= samples:
        return render_wavefront(
            scene, width=width, height=height, samples=samples, cfg=cfg,
            go_camera=go_camera, block_rows=block_rows, as_numpy=as_numpy,
            assume_capacity=assume_capacity, post=post)

    quantum = max(1, (block_rows * megakernel.LANE) // max(1, chunk))
    cache_key = (width, height, samples, cfg, go_camera, block_rows,
                 post, "chunked", chunk)
    split = 0 if cache_key in _SPLIT_BLACKLIST else pick_split(scene, cfg)
    deep_caps = pick_deep_caps(scene) if split else "const"
    k_pad = _KPAD_CACHE.get(cache_key)
    # NOTE: the mask sees the FULL sample count: the TPU cone mask is
    # spp-independent anyway, and the CPU exact mask enumerates sample
    # ids, which must cover every round's jitter (ids 0..samples-1).
    if k_pad is None or not assume_capacity:
        hit_px, pos_px, k_dev = _pixel_mask(
            scene, width=width, height=height, samples=samples, cfg=cfg,
            go_camera=go_camera)
        k_px = int(k_dev)  # host sync sizes the launch
        if k_px <= 0:
            z = jnp.zeros((height, width, 3), jnp.float32)
            if post is not None:
                z = post(z)
            return np.asarray(z) if as_numpy else z
        k_pad = min(_pad_bucket(k_px, quantum), width * height)
        _kpad_cache_put(cache_key, k_pad)
        k_dev = jnp.int32(k_px)
    else:
        # Steady state: skip the k_px sync; the device-side count is
        # validated with the batch via flush_capacity_checks().
        hit_px, pos_px, k_dev = _pixel_mask(
            scene, width=width, height=height, samples=samples, cfg=cfg,
            go_camera=go_camera)

    img_sum = None
    ov_sum = jnp.int32(0)
    s0 = 0
    while s0 < samples:
        c = min(chunk, samples - s0)
        part, ov = _compact_and_trace(
            scene, hit_px, pos_px, k_dev, k_pad=k_pad, width=width,
            height=height, samples=c, cfg=cfg, go_camera=go_camera,
            block_rows=block_rows, split=split,
            surv_cap=_auto_surv_cap(k_pad * c, block_rows),
            samp_base=jnp.uint32(s0), sum_image=True,
            deep_caps=deep_caps)
        img_sum = part if img_sum is None else img_sum + part
        ov_sum = ov_sum + jnp.asarray(ov, jnp.int32)
        s0 += c
    if assume_capacity:
        # one deferred flag for the whole frame; flush raises +
        # blacklists on either a stale capacity or a survivor overflow
        _PENDING_CHECKS.append((cache_key, k_dev, k_pad, ov_sum))
        if len(_PENDING_CHECKS) > 1024:
            flush_capacity_checks()
    elif split and int(ov_sum) > 0:
        # survivor capacity overflowed (radiance tails were dropped):
        # redo the frame unsplit and stop splitting this config
        _SPLIT_BLACKLIST.add(cache_key)
        return render_wavefront_chunked(
            scene, width=width, height=height, samples=samples, cfg=cfg,
            chunk=chunk, go_camera=go_camera, block_rows=block_rows,
            as_numpy=as_numpy, assume_capacity=False, post=post)
    img = img_sum / samples
    if post is not None:
        img = post(img)
    return np.asarray(img) if as_numpy else img


class Renderer:
    """Drop-in equivalent of ParallelRenderer (renderer.go:20-126).

    `num_workers` is accepted for CLI parity; on TPU the worker count is the
    device mesh (reported in benchmark data as the local device count).
    """

    def __init__(self, num_workers: Optional[int] = None):
        self.num_workers = num_workers or jax.local_device_count()
        self.max_depth = 50
        self.samples = 100
        self.anti_aliasing = True            # stored, never read (parity:
        self.recursive_reflections = True    # settings.go:3-25, renderer.go:154)
        self.soft_shadows = True
        self.depth_of_field = False
        self.seed = 0
        self.go_camera = True
        self.fast_mc = False  # enable expectation-preserving accelerators
        # "auto": compacted Pallas wavefront on TPU, banded jnp elsewhere
        # (interpret-mode Pallas is too slow for full frames on CPU).
        self.engine = "auto"  # "auto" | "pallas" | "jnp"
        self.benchmark_data = BenchmarkData()
        self.progress_callback = None  # fn(done_rows, total_rows)
        self.metrics = None  # optional obs.MetricsCollector

    # -- settings parity (settings.go:3-25) --------------------------------
    def set_samples(self, n):
        self.samples = int(n)

    def set_max_depth(self, n):
        self.max_depth = int(n)

    def set_anti_aliasing(self, b):
        self.anti_aliasing = bool(b)

    def set_recursive_reflections(self, b):
        self.recursive_reflections = bool(b)

    def set_soft_shadows(self, b):
        self.soft_shadows = bool(b)

    def set_depth_of_field(self, b):
        self.depth_of_field = bool(b)

    def get_stats(self):
        """settings.go:27-37."""
        return {
            "samples": self.samples,
            "max_depth": self.max_depth,
            "anti_aliasing": self.anti_aliasing,
            "recursive_reflections": self.recursive_reflections,
            "soft_shadows": self.soft_shadows,
            "depth_of_field": self.depth_of_field,
            "workers": self.num_workers,
        }

    def trace_config(self) -> trace_mod.TraceConfig:
        return trace_mod.TraceConfig(
            max_depth=self.max_depth,
            soft_shadows=self.soft_shadows,
            recursive_reflections=self.recursive_reflections,
            seed=self.seed,
            depth_of_field=self.depth_of_field,
            russian_roulette_start=8 if self.fast_mc else None,
            throughput_epsilon=1e-4 if self.fast_mc else 0.0,
        )

    def _pallas_ok(self, scene, cfg) -> bool:
        """Whether the compacted Pallas wavefront can serve this render.

        Round 4: thin-lens DoF renders run on this path too - the cone
        mask widens by the lens angle + origin-shift slack
        (megakernel.pixel_mask_pallas), and the bounce kernel is
        ray-agnostic (the lens perturbation happens in _lane_rays before
        the kernel)."""
        return megakernel.scene_fits_kernel(scene)

    def render_linear_device(self, scene, width: int, height: int):
        """Full-image mean linear radiance as a DEVICE array (H,W,3).

        Skips the device->host image copy (which dominates wall time on a
        tunneled TPU and costs a PCIe hop even locally); use for
        benchmarking, on-device post-processing, or chained pipelines.
        Falls back to the numpy path off-TPU.
        """
        cfg = self.trace_config()
        if (jax.default_backend() == "tpu"
                and self.engine in ("auto", "pallas")
                and self._pallas_ok(scene, cfg)):
            return render_wavefront(scene, width=width, height=height,
                                    samples=self.samples, cfg=cfg,
                                    go_camera=self.go_camera,
                                    as_numpy=False)
        return jnp.asarray(self.render_linear(scene, width, height))

    def render_linear(self, scene, width: int, height: int,
                      band_h: Optional[int] = None) -> np.ndarray:
        """Full-image mean linear radiance, (H,W,3) float32 numpy."""
        cfg = self.trace_config()
        engine = self.engine
        if engine == "auto":
            engine = ("pallas" if jax.default_backend() == "tpu"
                      else "jnp")
        if engine == "pallas" and not self._pallas_ok(scene, cfg):
            # The megakernel unrolls primitive loops over compile-time
            # scene sizes; very large scenes would explode code size and
            # compile time, so they take the jnp path (which scales as
            # batched (lanes x primitives) array ops).
            engine = "jnp"
        if self.metrics is not None:
            self.metrics.start(total_pixels=width * height)
        if engine == "pallas":
            out = render_wavefront(scene, width=width, height=height,
                                   samples=self.samples, cfg=cfg,
                                   go_camera=self.go_camera)
            if self.metrics is not None:
                self.metrics.record_pixels(width * height)
                self.metrics.record_rays(width * height * self.samples)
                self.metrics.record_job_complete()
            return out
        bh = band_h or pick_band_height(width, height, self.samples,
                                        n_prims=scene_prim_count(scene))
        out = np.zeros((height, width, 3), np.float32)
        futures = []
        for y0 in range(0, height, bh):
            rows = min(bh, height - y0)
            if rows != bh:
                # Ragged last band: render at full band height, crop. Same
                # compiled program; rows below the image are wasted lanes.
                band = render_band(scene, jnp.int32(min(y0, height - bh)),
                                   width=width, height=height, band_h=bh,
                                   samples=self.samples, cfg=cfg,
                                   go_camera=self.go_camera)
                futures.append((height - bh, band))
            else:
                band = render_band(scene, jnp.int32(y0), width=width,
                                   height=height, band_h=bh,
                                   samples=self.samples, cfg=cfg,
                                   go_camera=self.go_camera)
                futures.append((y0, band))
            if self.progress_callback:
                self.progress_callback(min(y0 + bh, height), height)
            if self.metrics is not None:
                rows = min(bh, height - y0)
                self.metrics.record_pixels(rows * width)
                self.metrics.record_rays(rows * width * self.samples)
        for y0, band in futures:
            out[y0:y0 + bh] = np.asarray(band)
        if self.metrics is not None:
            self.metrics.record_job_complete()
        return out

    def render(self, scene, width: int, height: int,
               scene_config=None, denoise: bool = False) -> np.ndarray:
        """Render to an (H,W,3) uint8 image, updating benchmark data.

        Scene-config renderer blocks (samples/maxDepth/...) are honored when
        provided - the Go loader drops them (scene.go:12-16); we don't.
        denoise=True applies the AOV-guided cross-bilateral filter
        (denoising.py) to the linear image before tonemapping.
        """
        self._apply_renderer_block(scene_config)

        t0 = time.perf_counter()
        if (scene_config is None and not denoise
                and jax.default_backend() == "tpu"
                and self.engine in ("auto", "pallas")
                and self._pallas_ok(scene, self.trace_config())):
            # Tonemap + quantize on device and pull uint8: 4x less
            # device->host traffic (matters greatly on a tunneled TPU).
            linear_dev = self.render_linear_device(scene, width, height)
            img = np.asarray(tonemap.to_rgb8(tonemap.tonemap(linear_dev)))
        else:
            linear = self.render_linear(scene, width, height)
            if denoise:
                linear = self._denoise_linear(scene, linear, width, height)
            if scene_config is not None:
                linear = self._apply_scene_effects(scene, linear, width,
                                                   height, scene_config)
            img = np.asarray(
                tonemap.to_rgb8(tonemap.tonemap(jnp.asarray(linear))))
        self._fill_benchmark(scene, width, height,
                             time.perf_counter() - t0, self.samples)
        return img

    def _apply_renderer_block(self, scene_config) -> None:
        """Honor the scene JSON's renderer block - the Go loader drops it
        (scene.go:12-16); we don't."""
        if scene_config is None or not scene_config.renderer:
            return
        rb = scene_config.renderer
        if "samples" in rb:
            self.set_samples(rb["samples"])
        if "maxDepth" in rb:
            self.set_max_depth(rb["maxDepth"])
        if "antiAliasing" in rb:
            self.set_anti_aliasing(rb["antiAliasing"])
        if "recursiveReflections" in rb:
            self.set_recursive_reflections(rb["recursiveReflections"])
        if "softShadows" in rb:
            self.set_soft_shadows(rb["softShadows"])

    def _fill_benchmark(self, scene, width: int, height: int, dt: float,
                        samples) -> None:
        bd = self.benchmark_data
        bd.scene_name = "demo_scene"  # GetSceneName() parity (scene.go:100-102)
        bd.resolution = f"{width}x{height}"
        bd.render_time_seconds = dt
        bd.samples = samples
        bd.max_depth = self.max_depth
        bd.num_workers = self.num_workers
        bd.objects = scene.num_objects
        bd.lights = int(scene.lights.position.shape[0])
        bd.timestamp = time.strftime("%Y-%m-%dT%H:%M:%S%z")

    def render_adaptive(self, scene, width: int, height: int,
                        scene_config=None, min_spp: int = 8,
                        rel_tol: float = 0.02, abs_tol: float = 1e-4,
                        batch: Optional[int] = None,
                        denoise: bool = False):
        """Adaptive-spp render to ((H,W,3) uint8, (H,W) spp map).

        `self.samples` is the per-pixel cap (max_spp); pixels stop as
        soon as their luminance standard error clears the tolerance
        (adaptive.py). Scene-config renderer/effects blocks are honored
        like render(). denoise=True runs the AOV-guided filter with the
        sampler's own variance map feeding the radiance term.
        """
        from . import adaptive as adaptive_mod
        self._apply_renderer_block(scene_config)
        cfg = self.trace_config()
        engine = ("pallas" if (jax.default_backend() == "tpu"
                               and self.engine in ("auto", "pallas")
                               and self._pallas_ok(scene, cfg))
                  else "jnp")
        t0 = time.perf_counter()
        # as_numpy=False keeps the whole pipeline (sampler -> denoise ->
        # effects -> tonemap) device-resident; only the uint8 image and
        # the spp map cross to the host (a linear (H,W,3) f32 pull costs
        # 150-350 ms through the tunneled TPU).
        linear, spp, var = adaptive_mod.render_adaptive(
            scene, width=width, height=height, cfg=cfg,
            min_spp=min(min_spp, self.samples), max_spp=self.samples,
            batch=batch or max(1, min(8, min_spp)), rel_tol=rel_tol,
            abs_tol=abs_tol, go_camera=self.go_camera, engine=engine,
            return_variance=True, as_numpy=False)
        if denoise:
            linear = self._denoise_linear(scene, linear, width, height,
                                          variance=var)
        if scene_config is not None:
            linear = self._apply_scene_effects(scene, linear, width,
                                               height, scene_config)
        img = np.asarray(
            tonemap.to_rgb8(tonemap.tonemap(jnp.asarray(linear))))
        spp = np.asarray(spp).astype(np.int32)
        # samples records the MEAN spp actually taken, not the cap
        self._fill_benchmark(scene, width, height,
                             time.perf_counter() - t0, float(spp.mean()))
        return img, spp

    def _denoise_linear(self, scene, linear, width: int, height: int,
                        variance=None):
        """AOV-guided cross-bilateral filter on a linear image. Returns a
        device array (the callers tonemap on device; pulling the filtered
        f32 frame just to re-upload it would be two wasted transfers)."""
        from . import aov as aov_mod
        from . import denoising
        aovs = aov_mod.render_aovs(scene, width=width, height=height,
                                   go_camera=self.go_camera,
                                   as_numpy=False)
        return denoising.denoise(linear, aovs, variance=variance,
                                 as_numpy=False)

    def _primary_depth(self, scene, width: int, height: int):
        """Per-pixel center-ray hit distance (BIG on miss) for fog/DoF."""
        from .ops import intersect as isect
        n_px = width * height
        xs = (jnp.arange(n_px, dtype=jnp.float32) % width + 0.5) / width
        ys = (jnp.arange(n_px, dtype=jnp.float32) // width + 0.5) / height
        rays = cam_mod.go_rays if self.go_camera else cam_mod.lookat_rays
        o, d = rays(scene.camera, xs, ys)
        hit = isect.closest_hit(scene.geometry, o, d, t_min=1e-3,
                                accel=getattr(scene, "accel", None))
        # distance in world units: t * |d| (directions are unnormalized)
        dist = hit.t * jnp.linalg.norm(d, axis=-1)
        return jnp.where(hit.hit, dist, isect.BIG).reshape(height, width)

    def _apply_scene_effects(self, scene, linear, width: int, height: int,
                             scene_config) -> np.ndarray:
        """Honor the atmospheric/volumetric/fog/post-FX config blocks the
        Go loader silently drops (scene.go:12-16; the extended schema in
        demo-assets/final_silver_prism_purple_cube_.json:76-118)."""
        from . import atmosphere as atmo_mod
        from . import effects as fx

        blocks = {
            **(scene_config.effects or {}),
        }
        atmo_blk = scene_config.atmospheric or {}
        fog_blk = scene_config.fog or {}
        vol_blk = scene_config.volumetric or {}
        need_depth = (fog_blk.get("enabled")
                      or (blocks.get("depthOfField") or {}).get("enabled"))
        img = jnp.asarray(linear)
        depth = (self._primary_depth(scene, width, height)
                 if need_depth else None)

        if atmo_blk.get("enabled"):
            settings = atmo_mod.settings_from_config(atmo_blk)
            img = atmo_mod.apply_sky_to_image(
                scene, img, width, height, settings,
                go_camera=self.go_camera)
        if fog_blk.get("enabled"):
            img = fx.apply_fog(
                img, jnp.minimum(depth, 1e4),
                fog_color=tuple(fog_blk.get("color", (0.75, 0.78, 0.82))),
                mode=str(fog_blk.get("mode", "exp")),
                density=float(fog_blk.get("density", 0.02)),
                start=float(fog_blk.get("start", 0.0)),
                end=float(fog_blk.get("end", 100.0)))
        if vol_blk.get("enabled"):
            n_px = width * height
            xs = (jnp.arange(n_px, dtype=jnp.float32) % width + 0.5) / width
            ys = (jnp.arange(n_px, dtype=jnp.float32) // width
                  + 0.5) / height
            rays = cam_mod.go_rays if self.go_camera else cam_mod.lookat_rays
            o, d = rays(scene.camera, xs, ys)
            vol = fx.volumetric_light(
                o, d, jnp.full((n_px,), float(vol_blk.get("maxDist", 20.0))),
                scene.lights,
                steps=int(vol_blk.get("steps", 64)),
                density=float(vol_blk.get("density", 0.02)),
                scattering=float(vol_blk.get("scattering", 0.5)))
            img = img + vol.reshape(height, width, 3)
        img = fx.apply_config_effects(img, blocks, depth=depth)
        return np.asarray(img)

    # -- IO parity ----------------------------------------------------------
    def save_image(self, img: np.ndarray, filename: str):
        """SaveImage (renderer.go:438-451)."""
        os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
        image_util.write_png(filename, img)

    def save_benchmark_data(self, path: str):
        """SaveBenchmarkData (renderer.go:473-485)."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            f.write(self.benchmark_data.to_json())

    def print_ascii_preview(self, img: np.ndarray):
        """PrintASCIIPreview (renderer.go:453-471)."""
        chars = " .:-=+*#%@"
        h, w = img.shape[:2]
        lines = []
        for y in range(0, h, 2):
            row = []
            for x in range(w):
                # Go reads 16-bit RGBA and averages (renderer.go:461-462).
                r, g, b = (int(v) * 257 for v in img[y, x][:3])
                brightness = (r + g + b) / 3.0
                ci = min(int(brightness * (len(chars) - 1) / 65535.0),
                         len(chars) - 1)
                row.append(chars[ci])
            lines.append("".join(row))
        print("\n".join(lines))

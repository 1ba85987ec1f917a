"""Adaptive sampling: variance-guided per-pixel sample allocation.

The reference renders a fixed spp everywhere (renderer.go:150-163). This
module reinvests the counter-based RNG design in a capability the Go
architecture could not express: because every sample's radiance is a
pure function of (pixel, sample, seed) — never of which batch computed
it — sampling can stop per pixel at any point and the partial mean IS
the fixed-spp estimator truncated to that count. Batches of samples are
drawn for the still-unconverged pixel set only (the wavefront is built
from explicit pixel ids, the same trick as the renderer's pixel
compaction), so flat regions (sky, miss-black, unlit ground) stop at
``min_spp`` while penumbras and glass keep sampling up to ``max_spp``.

Convergence test: the standard-error of the per-pixel luminance,
``stderr = sqrt(var / n) <= abs_tol + rel_tol * mean_luma``
(a relative 95%-CI style criterion with an absolute floor for black
pixels). Tolerances are in linear-radiance units.

Engine note: batches run through the jnp wavefront (`lane_radiance`) or
the Pallas megakernel. Two accumulation modes:

- ``accum="host"``: the original path — per-batch sums are pulled to the
  host and accumulated in float64; the convergence decision runs on host
  between batches. Three K-sized device->host transfers plus host math
  per batch (~30 ms tunnel RPC each through this environment's TPU).
- ``accum="device"``: the TPU-resident path — the per-pixel accumulators,
  the stderr test AND the active-set compaction all live on device; the
  host pulls ONE scalar (the surviving-pixel count) per test round, only
  to pick the next pad bucket. Sums are float32 (per-pixel sums of
  <= max_spp O(1) radiances — ~1e-7 relative error), so images match the
  host path to float-summation order rather than bit-exactly; resume is
  still bit-identical WITHIN the mode (f32 values round-trip exactly
  through the f64 checkpoint schema).

Default is host off-TPU (the f64 oracle semantics) and device on TPU,
where the host path's per-batch transfers dominate wall time.

Both modes and both engines compose with a device mesh (round 4): the
trace stage fans the active set over the mesh (_batch_sums_sharded, a
shard_map whose shards each run the jnp wavefront or the Pallas
megakernel on their slice of the compacted active set), while
accumulation, the convergence test and the compaction stay global.
Because every active row's sums are computed whole on one device, the
spp DECISIONS are bit-identical to the unsharded run in either mode.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import trace as trace_mod
from . import renderer as renderer_mod

__all__ = ["render_adaptive"]

# Rec.709 luma weights: variance is tested on a single scalar per pixel.
_LUMA = np.array([0.2126, 0.7152, 0.0722], np.float32)


def _round_up_multiple(x: int, m: int) -> int:
    return -(-x // m) * m


def _batch_sums(scene, pix_pad, s0, *, width: int, height: int,
                batch: int, cfg: trace_mod.TraceConfig, go_camera: bool,
                engine: str, block_rows: int, split=0):
    """Radiance sums for `batch` samples [s0, s0+batch) of each pixel id:
    (rgb_sum (K,3), luma_sum (K,), luma_sq_sum (K,)). Shared trace body of
    the host- and device-accumulation paths."""
    k = pix_pad.shape[0]
    pix = jnp.repeat(pix_pad, batch)
    samp = jnp.tile(jnp.arange(batch, dtype=jnp.uint32), k) + s0
    if engine == "pallas":
        from .ops import megakernel
        origin, direction = renderer_mod._lane_rays(
            scene, pix, samp, width=width, height=height, cfg=cfg,
            go_camera=go_camera)
        if split:
            # Survivor re-compaction ladder at FULL capacity (round
            # 5): cap == lane count at every level, so overflow is
            # statically impossible and the discarded ov is always 0
            # — no overflow plumbing through the accumulators.
            # render_adaptive enables this only for glassy stream
            # scenes (pick_deep_caps == "const"), where full caps
            # measured within ~8% of the tuned frame-level ladder;
            # fast-decay scenes pay relaunch overhead and stay
            # unsplit here.
            n = origin.shape[0]
            blk = block_rows * megakernel.LANE
            cap = -(-n // blk) * blk
            rad, _ = renderer_mod.trace_with_split(
                scene, origin, direction, pix, samp, cfg,
                block_rows=block_rows, split=split, surv_cap=cap,
                deep_caps="const")
        else:
            rad = megakernel.trace_pallas(
                scene, origin, direction, pix, samp, cfg,
                block_rows=block_rows)
    else:
        rad = renderer_mod.lane_radiance(scene, pix, samp, width=width,
                                         height=height, cfg=cfg,
                                         go_camera=go_camera)
    rad = rad.reshape(k, batch, 3)
    luma = rad @ jnp.asarray(_LUMA, rad.dtype)
    return rad.sum(axis=1), luma.sum(axis=1), (luma * luma).sum(axis=1)


@partial(jax.jit, static_argnames=("width", "height", "batch", "cfg",
                                   "go_camera", "engine", "block_rows",
                                   "split"))
def _sample_batch(scene, pix_pad, s0, *, width: int, height: int,
                  batch: int, cfg: trace_mod.TraceConfig, go_camera: bool,
                  engine: str, block_rows: int, split=0):
    """Host-accumulation entry: one jitted trace per (K, batch) shape;
    s0 is a traced scalar so every batch reuses the compiled program."""
    return _batch_sums(scene, pix_pad, s0, width=width, height=height,
                       batch=batch, cfg=cfg, go_camera=go_camera,
                       engine=engine, block_rows=block_rows, split=split)


def _batch_sums_sharded(scene, pix_pad, s0, *, width: int, height: int,
                        batch: int, cfg: trace_mod.TraceConfig,
                        go_camera: bool, engine: str, block_rows: int,
                        mesh, split=0):
    """_batch_sums with the pixel axis sharded over every mesh device.

    Each pixel's whole sample batch stays on one device, so the per-pixel
    sums are bit-identical to the unsharded path (the RNG keys by
    (pixel, sample), never by placement). engine="pallas" runs the
    megakernel per device (the adaptive driver already hands it a
    pixel-compacted active set, so each shard is a compacted wavefront).
    """
    from jax.sharding import PartitionSpec as P

    axes = tuple(mesh.axis_names)

    def local(scene, pix_l, s0_l):
        return _batch_sums(scene, pix_l, s0_l, width=width, height=height,
                           batch=batch, cfg=cfg, go_camera=go_camera,
                           engine=engine, block_rows=block_rows,
                           split=split)

    # check_vma=False: the Pallas engine's out_shapes carry no
    # varying-axes metadata (same reason as shard.render_wavefront_sharded).
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axes), P()),
        out_specs=(P(axes), P(axes), P(axes)),
        check_vma=False,
    )(scene, pix_pad, s0)


@partial(jax.jit, static_argnames=("width", "height", "batch", "cfg",
                                   "go_camera", "mesh", "engine",
                                   "block_rows", "split"))
def _sample_batch_sharded(scene, pix_pad, s0, *, width: int, height: int,
                          batch: int, cfg: trace_mod.TraceConfig,
                          go_camera: bool, mesh, engine: str = "jnp",
                          block_rows: int = 8, split=0):
    """Host-accumulation sharded entry (one jitted trace per shape)."""
    return _batch_sums_sharded(scene, pix_pad, s0, width=width,
                               height=height, batch=batch, cfg=cfg,
                               go_camera=go_camera, engine=engine,
                               block_rows=block_rows, mesh=mesh,
                               split=split)


# ---------------------------------------------------------------------------
# Device-resident accumulation (accum="device"): state never leaves HBM.
#
# Active-set state is ACTIVE-aligned, not pixel-aligned: `act_ids` (K,)
# pixel ids and `act_sums` (K, 5) [rgb, luma, luma^2] running sums, padded
# to the bucket size with `k` live entries in front. When a pixel
# converges, its row is flushed into the full-resolution `full_sums`
# (n_px, 5) buffer by a dropped-rows-only scatter (pixel granularity — the
# repo's scatter rule) and the survivors are stably re-compacted to the
# front with a cumsum permutation. All actives hold exactly s0 samples
# (lock-step batches), so the spp map needs one scalar per drop, not a
# per-entry counter. The host sees ONE scalar per test round: the
# survivor count, used only to shrink the pad bucket.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("width", "height", "batch", "cfg",
                                   "go_camera", "engine", "block_rows",
                                   "do_test", "rel_tol", "abs_tol",
                                   "k_use", "mesh", "split"))
def _device_round(scene, act_ids, act_sums, full_sums, spp_map, k, s0, *,
                  width: int, height: int, batch: int,
                  cfg: trace_mod.TraceConfig, go_camera: bool, engine: str,
                  block_rows: int, do_test: bool, rel_tol: float,
                  abs_tol: float, k_use: int = 0, mesh=None, split=0):
    """One batch: trace, accumulate, and (on test rounds) converge+compact.

    `k` and `s0` are traced scalars; `do_test` is static (the host knows
    s0, so the min_spp <= s0+batch < max_spp window is a compile-time
    branch). `k_use` (static, 0 = full) shrinks the working bucket INSIDE
    the program: a host-side `act_ids[:nb]` slice would be its own device
    execution — one more ~30 ms tunnel RPC per shrink round — while the
    in-program slice is free. Returns the updated (k_use-sized) state
    plus the surviving count.
    """
    n_px = full_sums.shape[0]
    if k_use:
        act_ids = act_ids[:k_use]
        act_sums = act_sums[:k_use]
    k_pad = act_ids.shape[0]
    valid = jnp.arange(k_pad, dtype=jnp.int32) < k

    if mesh is not None:
        # Mesh-sharded fast path (round 4): the trace fans out over the
        # devices; accumulation/convergence/compaction below stay global
        # (XLA partitions the K-row elementwise ops and the cumsum).
        # Per-row sums are computed whole on one device, so the
        # convergence DECISIONS are bit-identical to the unsharded path.
        rgb, y, y2 = _batch_sums_sharded(
            scene, act_ids, s0, width=width, height=height, batch=batch,
            cfg=cfg, go_camera=go_camera, engine=engine,
            block_rows=block_rows, mesh=mesh, split=split)
    else:
        rgb, y, y2 = _batch_sums(scene, act_ids, s0, width=width,
                                 height=height, batch=batch, cfg=cfg,
                                 go_camera=go_camera, engine=engine,
                                 block_rows=block_rows, split=split)
    add = jnp.concatenate([rgb, y[:, None], y2[:, None]], axis=1)
    act_sums = act_sums + jnp.where(valid[:, None], add, 0.0)

    if not do_test:
        return act_ids, act_sums, full_sums, spp_map, k

    nf = (s0 + jnp.uint32(batch)).astype(jnp.float32)
    mean = act_sums[:, 3] / nf
    var = jnp.maximum(0.0, (act_sums[:, 4] / nf - mean * mean)
                      * (nf / jnp.maximum(nf - 1.0, 1.0)))
    stderr = jnp.sqrt(var / nf)
    keep = valid & (stderr > (abs_tol + rel_tol * jnp.maximum(mean, 0.0)))
    drop = valid & ~keep

    # Flush converged rows to the pixel-aligned buffers (index n_px is
    # out of bounds -> mode="drop" discards the non-dropped rows).
    idx = jnp.where(drop, act_ids, jnp.uint32(n_px))
    full_sums = full_sums.at[idx].add(
        jnp.where(drop[:, None], act_sums, 0.0), mode="drop")
    spp_map = spp_map.at[idx].set(
        (s0 + jnp.uint32(batch)).astype(jnp.int32), mode="drop")

    # Stable keep-first partition: survivors to the front, same relative
    # order (active ids stay ascending -> pixel-major lane coherence).
    keep_i = keep.astype(jnp.int32)
    n_keep = keep_i.sum()
    pos = jnp.where(keep, jnp.cumsum(keep_i) - 1,
                    n_keep + jnp.cumsum(1 - keep_i) - 1)
    act_ids = jnp.zeros_like(act_ids).at[pos].set(act_ids)
    act_sums = jnp.zeros_like(act_sums).at[pos].set(act_sums)
    return act_ids, act_sums, full_sums, spp_map, n_keep


@jax.jit
def _device_finish(act_ids, act_sums, full_sums, spp_map, k, s0):
    """Flush the still-active rows (they ran to s0 = the cap) and turn the
    sums into (img (n_px,3), spp (n_px,), var-of-mean (n_px,))."""
    n_px = full_sums.shape[0]
    valid = jnp.arange(act_ids.shape[0], dtype=jnp.int32) < k
    idx = jnp.where(valid, act_ids, jnp.uint32(n_px))
    full = full_sums.at[idx].add(
        jnp.where(valid[:, None], act_sums, 0.0), mode="drop")
    spp = spp_map.at[idx].set(s0.astype(jnp.int32), mode="drop")
    n = jnp.maximum(spp, 1).astype(jnp.float32)
    img = full[:, :3] / n[:, None]
    mean = full[:, 3] / n
    var = jnp.maximum(0.0, (full[:, 4] / n - mean * mean)
                      * (n / jnp.maximum(n - 1.0, 1.0)))
    return img, spp, var / n


_CKPT_VERSION = 1


def _save_ckpt(path: str, header: dict, state: dict) -> None:
    """Atomic npz write (tmp + rename), parallel/checkpoint.py style."""
    import os
    import tempfile
    d = os.path.dirname(path) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".ckpt.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, version=_CKPT_VERSION, **header, **state)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _load_ckpt(path: str, header: dict) -> dict:
    with np.load(path) as z:
        if int(z["version"]) != _CKPT_VERSION:
            raise ValueError(f"adaptive checkpoint schema "
                             f"{int(z['version'])} != {_CKPT_VERSION}")
        for k, v in header.items():
            got = z[k]
            same = (str(got) == str(v) if isinstance(v, str)
                    else np.allclose(np.asarray(got), np.asarray(v)))
            if not same:
                raise ValueError(
                    f"adaptive checkpoint mismatch on {k}: "
                    f"{got} != {v} - resuming would change the sample "
                    f"sequence or the convergence decisions")
        return {k: z[k] for k in
                ("sum_rgb", "sum_y", "sum_y2", "n_taken", "active", "s0")}


def _scene_fingerprint(scene) -> str:
    """Content hash over every scene array (geometry, materials, lights,
    camera, accel tables): a resumed accumulation must be fed by the
    identical scene or the blended estimator is silently wrong."""
    import hashlib
    import jax
    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(scene):
        a = np.asarray(leaf)
        h.update(str(a.dtype).encode())
        h.update(str(a.shape).encode())
        h.update(a.tobytes())
    return h.hexdigest()[:16]


def render_adaptive(scene, *, width: int, height: int,
                    cfg: Optional[trace_mod.TraceConfig] = None,
                    min_spp: int = 8, max_spp: int = 64, batch: int = 8,
                    rel_tol: float = 0.02, abs_tol: float = 1e-4,
                    go_camera: bool = True, engine: str = "jnp",
                    pad_quantum: int = 1024,
                    return_variance: bool = False, mesh=None,
                    checkpoint_path: Optional[str] = None,
                    checkpoint_every: int = 1, resume: bool = True,
                    accum: Optional[str] = None, as_numpy: bool = True):
    """Render with per-pixel adaptive sample counts.

    Returns (linear image (H, W, 3) float32, spp map (H, W) int32);
    with return_variance=True a third element carries the (H, W)
    variance-of-the-mean of per-pixel luminance — the noise estimate
    SVGF-style denoisers want next to the beauty pass (denoising.py's
    `variance=` input). Every pixel receives samples 0..n-1 of the
    deterministic sample sequence, so with rel_tol=abs_tol=0 (never
    converge early) the image equals a fixed max_spp render up to float
    summation order. Pixels the conservative primary mask proves empty
    are never sampled: they are exact black and report spp 0 in the
    map (they used to burn min_spp samples tracing to black).
    """
    if cfg is None:
        cfg = trace_mod.TraceConfig()
    if not 0 < min_spp <= max_spp:
        raise ValueError("need 0 < min_spp <= max_spp")
    if accum is None:
        accum = "device" if jax.default_backend() == "tpu" else "host"
    if accum not in ("host", "device"):
        raise ValueError(f"accum must be 'host' or 'device', got {accum!r}")
    block_rows = (renderer_mod.pick_block_rows(scene)
                  if engine == "pallas" else 8)
    # Round 5: glassy STREAM scenes trace their batches through the
    # survivor re-compaction ladder at FULL capacity (overflow
    # statically impossible; see _batch_sums). Fast-decay scenes stay
    # unsplit here — full caps cost near-dead relaunch wavefronts.
    # Applied identically to the sharded path so mesh-sharding stays
    # bit-invisible.
    split_spec = 0
    if engine == "pallas":
        sp = renderer_mod.pick_split(scene, cfg)
        if sp and renderer_mod.pick_deep_caps(scene) == "const":
            split_spec = sp
    if mesh is not None:
        # Round 4: both accumulation modes and both engines compose with
        # a mesh — the trace fans out per device (_batch_sums_sharded),
        # sums stay per-row, decisions stay bit-identical to unsharded.
        n_dev = int(np.prod(list(mesh.shape.values())))
        pad_quantum = _round_up_multiple(pad_quantum, n_dev)

    n_px = width * height
    sum_rgb = np.zeros((n_px, 3), np.float64)
    sum_y = np.zeros(n_px, np.float64)
    sum_y2 = np.zeros(n_px, np.float64)
    n_taken = np.zeros(n_px, np.int64)
    active = None  # resolved lazily below (resume overrides it)
    s0 = 0

    # Elastic resume: the full sampler state (accumulators + active set +
    # sample cursor) round-trips through an atomic npz, and every input
    # that steers the deterministic sample sequence or the convergence
    # decisions is validated - the whole TraceConfig (repr is exhaustive
    # for a frozen dataclass), the camera model, and a content hash of
    # every scene array - so a resumed render is bit-identical to an
    # uninterrupted one. `engine` is deliberately NOT pinned: jnp and
    # Pallas are bit-identical by the repo's core invariant, and
    # resuming a TPU render on CPU (or back) is a legitimate elastic-
    # recovery path.
    header = {"width": width, "height": height,
              "min_spp": min_spp, "max_spp": max_spp, "batch": batch,
              "rel_tol": rel_tol, "abs_tol": abs_tol,
              "cfg_repr": repr(cfg), "go_camera": go_camera,
              # accum mode is pinned: a host-f64 prefix truncated to the
              # device path's f32 (or vice versa) would not be
              # bit-identical to an uninterrupted run of either mode
              "accum": accum}
    if checkpoint_path:
        header["scene_sha"] = _scene_fingerprint(scene)
    import os as _os
    if checkpoint_path and resume and _os.path.exists(checkpoint_path):
        st = _load_ckpt(checkpoint_path, header)
        sum_rgb, sum_y, sum_y2 = st["sum_rgb"], st["sum_y"], st["sum_y2"]
        n_taken, active, s0 = (st["n_taken"], st["active"].astype(np.int64),
                               int(st["s0"]))
    if active is None:
        # Conservative primary mask: a pixel none of whose samples can
        # hit geometry is EXACT black (renderer.go:170-173), so it never
        # enters the sampler - it reports spp 0 and zero variance. The
        # mask may over-include (those pixels behave exactly as without
        # it) but can never exclude a hittable pixel: on TPU it is the
        # spp-independent cone mask; on CPU/DoF it tests exactly the
        # max_spp jittered rays the sampler would trace with the
        # closest-hit expressions (intersect.any_hit exact=True).
        # Computed AFTER the resume branch (a resumed render carries its
        # active set) and gated on CPU, where the per-lane fallback
        # materializes n_px*max_spp rays in one shot - past ~4M lanes
        # the (N,3) temporaries are a memory spike the batched sampler
        # itself never pays, so the mask is skipped there (every pixel
        # starts active, the pre-round-3 behavior).
        n_mask_lanes = n_px * max_spp
        if (jax.default_backend() == "tpu"
                or n_mask_lanes <= 4_000_000):
            hit_px, _, _ = renderer_mod._pixel_mask(
                scene, width=width, height=height, samples=max_spp,
                cfg=cfg, go_camera=go_camera)
            active = np.nonzero(np.asarray(hit_px))[0].astype(np.int64)
        else:
            active = np.arange(n_px, dtype=np.int64)

    if accum == "device":
        return _render_adaptive_device(
            scene, sum_rgb=sum_rgb, sum_y=sum_y, sum_y2=sum_y2,
            n_taken=n_taken, active=active, s0=s0, width=width,
            height=height, cfg=cfg, min_spp=min_spp, max_spp=max_spp,
            batch=batch, rel_tol=rel_tol, abs_tol=abs_tol,
            go_camera=go_camera, engine=engine, block_rows=block_rows,
            pad_quantum=pad_quantum, return_variance=return_variance,
            checkpoint_path=checkpoint_path,
            checkpoint_every=checkpoint_every, header=header,
            as_numpy=as_numpy, mesh=mesh, split_spec=split_spec)

    def _flush():
        if checkpoint_path:
            _save_ckpt(checkpoint_path, header,
                       {"sum_rgb": sum_rgb, "sum_y": sum_y,
                        "sum_y2": sum_y2, "n_taken": n_taken,
                        "active": active, "s0": s0})

    batches_done = 0
    while active.size and s0 < max_spp:
        b = int(min(batch, max_spp - s0))
        k_pad = renderer_mod._pad_bucket(active.size, pad_quantum)
        pad = np.zeros(k_pad, np.uint32)
        pad[:active.size] = active
        if mesh is not None:
            rgb, y, y2 = _sample_batch_sharded(
                scene, jnp.asarray(pad), jnp.uint32(s0), width=width,
                height=height, batch=b, cfg=cfg, go_camera=go_camera,
                mesh=mesh, engine=engine, block_rows=block_rows,
                split=split_spec)
        else:
            rgb, y, y2 = _sample_batch(
                scene, jnp.asarray(pad), jnp.uint32(s0), width=width,
                height=height, batch=b, cfg=cfg, go_camera=go_camera,
                engine=engine, block_rows=block_rows, split=split_spec)
        k = active.size
        sum_rgb[active] += np.asarray(rgb, np.float64)[:k]
        sum_y[active] += np.asarray(y, np.float64)[:k]
        sum_y2[active] += np.asarray(y2, np.float64)[:k]
        n_taken[active] += b
        s0 += b

        if s0 >= min_spp and s0 < max_spp:
            n = float(s0)
            mean = sum_y[active] / n
            # unbiased per-sample variance; clamp the catastrophic-
            # cancellation negatives that exact convergence produces
            var = np.maximum(0.0, (sum_y2[active] / n - mean * mean)
                             * (n / max(n - 1.0, 1.0)))
            stderr = np.sqrt(var / n)
            keep = stderr > (abs_tol + rel_tol * np.maximum(mean, 0.0))
            active = active[keep]

        batches_done += 1
        if checkpoint_path and batches_done % max(1, checkpoint_every) == 0:
            _flush()

    if checkpoint_path:
        _flush()  # final state: a re-run resumes and returns immediately
    img = (sum_rgb / np.maximum(n_taken, 1)[:, None]).astype(np.float32)
    out = (img.reshape(height, width, 3),
           n_taken.astype(np.int32).reshape(height, width))
    if return_variance:
        n = np.maximum(n_taken, 1).astype(np.float64)
        mean = sum_y / n
        var = np.maximum(0.0, (sum_y2 / n - mean * mean)
                         * (n / np.maximum(n - 1.0, 1.0)))
        out = out + ((var / n).astype(np.float32)
                     .reshape(height, width),)
    if not as_numpy:  # host-mode state is host-side; upload for API parity
        out = tuple(jnp.asarray(a) for a in out)
    return out


def _render_adaptive_device(scene, *, sum_rgb, sum_y, sum_y2, n_taken,
                            active, s0, width, height, cfg, min_spp,
                            max_spp, batch, rel_tol, abs_tol, go_camera,
                            engine, block_rows, pad_quantum,
                            return_variance, checkpoint_path,
                            checkpoint_every, header, as_numpy=True,
                            mesh=None, split_spec=0):
    """The accum="device" driver loop (state as resolved/resumed by
    render_adaptive, host-f64 schema). Per round: one async dispatch; one
    scalar pull on test rounds to shrink the pad bucket. Checkpoints pull
    the state and write the SAME npz schema as the host path (f32 values
    round-trip exactly through f64, so resume is bit-identical)."""
    n_px = width * height
    k_host = int(active.size)
    # Under a mesh the bucket must stay divisible by the device count
    # (pad_quantum already is; the n_px clamp must not break it).
    n_dev = (int(np.prod(list(mesh.shape.values())))
             if mesh is not None else 1)
    cap = _round_up_multiple(n_px, n_dev)
    k_pad = min(renderer_mod._pad_bucket(max(k_host, 1), pad_quantum), cap)

    ids_h = np.zeros(k_pad, np.uint32)
    ids_h[:k_host] = active
    sums_h = np.zeros((k_pad, 5), np.float32)
    sums_h[:k_host, :3] = sum_rgb[active]
    sums_h[:k_host, 3] = sum_y[active]
    sums_h[:k_host, 4] = sum_y2[active]
    full_h = np.concatenate(
        [sum_rgb, sum_y[:, None], sum_y2[:, None]], axis=1
    ).astype(np.float32)
    full_h[active] = 0.0  # active rows live in act_sums until they drop
    spp_h = n_taken.astype(np.int32)
    spp_h[active] = 0

    act_ids = jnp.asarray(ids_h)
    act_sums = jnp.asarray(sums_h)
    full_sums = jnp.asarray(full_h)
    spp_map = jnp.asarray(spp_h)
    k = jnp.int32(k_host)
    s0 = int(s0)

    def _flush():
        if not checkpoint_path:
            return
        a_ids = np.asarray(act_ids)[:k_host].astype(np.int64)
        a_sums = np.asarray(act_sums, np.float64)[:k_host]
        f = np.asarray(full_sums, np.float64)
        rgb = f[:, :3].copy()
        y = f[:, 3].copy()
        y2 = f[:, 4].copy()
        rgb[a_ids] = a_sums[:, :3]
        y[a_ids] = a_sums[:, 3]
        y2[a_ids] = a_sums[:, 4]
        nt = np.asarray(spp_map).astype(np.int64)
        nt[a_ids] = s0
        _save_ckpt(checkpoint_path, header,
                   {"sum_rgb": rgb, "sum_y": y, "sum_y2": y2,
                    "n_taken": nt, "active": a_ids, "s0": s0})

    batches_done = 0
    k_use = 0  # pending bucket shrink, applied INSIDE the next round's jit
    while k_host and s0 < max_spp:
        b = int(min(batch, max_spp - s0))
        do_test = (min_spp <= s0 + b < max_spp)
        act_ids, act_sums, full_sums, spp_map, k = _device_round(
            scene, act_ids, act_sums, full_sums, spp_map, k,
            jnp.uint32(s0), width=width, height=height, batch=b, cfg=cfg,
            go_camera=go_camera, engine=engine, block_rows=block_rows,
            do_test=do_test, rel_tol=float(rel_tol),
            abs_tol=float(abs_tol), k_use=k_use, mesh=mesh,
            split=split_spec)
        if k_use:
            k_pad = k_use
            k_use = 0
        s0 += b
        batches_done += 1
        if do_test:
            k_host = int(k)  # the one host sync per test round
            nb = min(renderer_mod._pad_bucket(max(k_host, 1), pad_quantum),
                     k_pad)
            if nb < k_pad:
                k_use = nb
        if checkpoint_path and batches_done % max(1, checkpoint_every) == 0:
            _flush()

    img_d, spp_d, var_d = _device_finish(act_ids, act_sums, full_sums,
                                         spp_map, k, jnp.uint32(s0))
    if checkpoint_path:
        _flush()  # final state: a re-run resumes and returns immediately
    if not as_numpy:
        # Device-resident outputs for pipelines whose next stage (denoise,
        # tonemap) runs on device: the (H,W,3) pull costs 150-350 ms
        # through the tunnel and is pure waste mid-pipeline.
        out = (img_d.reshape(height, width, 3),
               spp_d.reshape(height, width))
        if return_variance:
            out = out + (var_d.reshape(height, width),)
        return out
    img = np.asarray(img_d).reshape(height, width, 3)
    spp = np.asarray(spp_d).astype(np.int32).reshape(height, width)
    out = (img, spp)
    if return_variance:
        out = out + (np.asarray(var_d).reshape(height, width),)
    return out

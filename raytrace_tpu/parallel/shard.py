"""SPMD sharded rendering over a (px, sp) device mesh.

The TPU-native replacement for BOTH of the reference's scale-out layers:
  * the intra-process tile pool (renderer.go:76-99,398-436): the pixel axis
    is sharded over the ``px`` mesh axis - each device renders its block of
    pixels, no queue, no channel, no WaitGroup;
  * the HTTP distributed renderer (distributed_renderer.go:76-106,153-196):
    cross-device assembly is an XLA collective (the implicit all-gather of
    the ``out_specs`` sharding), and sample partial sums are reduced with
    ``psum`` over the ``sp`` axis - replacing RenderChunk JSON POSTs with
    ICI/DCN traffic.

Determinism: the counter-based RNG (rng.py) keys off (pixel, sample), never
off device ids, so any mesh shape produces bit-identical images (the
multi-host determinism requirement of SURVEY.md §7).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .. import renderer as renderer_mod
from .. import trace as trace_mod


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@partial(jax.jit, static_argnames=("width", "height", "band_h", "samples",
                                   "cfg", "go_camera", "mesh"))
def render_band_sharded(scene, band_y0, *, width: int, height: int,
                        band_h: int, samples: int,
                        cfg: trace_mod.TraceConfig, mesh,
                        go_camera: bool = True):
    """Render `band_h` rows starting at `band_y0`, sharded over `mesh`.

    Pixels are sharded over the ``px`` axis, samples over the ``sp`` axis;
    per-pixel sample sums are psum'ed across ``sp``. Returns the mean linear
    radiance, (band_h, width, 3), sharded over rows.
    """
    n_px = band_h * width
    n_shards = mesh.shape["px"]
    n_sp = mesh.shape["sp"]
    n_px_pad = _round_up(n_px, n_shards)
    n_samp_pad = _round_up(samples, n_sp)

    pix = (band_y0 * width
           + jnp.arange(n_px_pad, dtype=jnp.uint32))  # (n_px_pad,)
    samp = jnp.arange(n_samp_pad, dtype=jnp.uint32)

    def local(scene, pix_l, samp_l):
        np_l, ns_l = pix_l.shape[0], samp_l.shape[0]
        pid = jnp.repeat(pix_l, ns_l)
        sid = jnp.tile(samp_l, np_l)
        rad = renderer_mod.lane_radiance(scene, pid, sid, width=width,
                                         height=height, cfg=cfg,
                                         go_camera=go_camera)
        # Sample-padding lanes contribute zero to the accumulation (pixel
        # padding needs no mask: padded pixels land past n_px and are
        # sliced off the gathered output).
        valid = sid < np.uint32(samples)
        rad = jnp.where(valid[:, None], rad, 0.0)
        part = rad.reshape(np_l, ns_l, 3).sum(axis=1)
        return jax.lax.psum(part, "sp")

    out = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("px"), P("sp")),
        out_specs=P("px"),
    )(scene, pix, samp)
    return (out[:n_px] / samples).reshape(band_h, width, 3)


@partial(jax.jit, static_argnames=("width", "height", "samples", "cfg",
                                   "go_camera", "mesh", "px_capacity",
                                   "block_rows", "split"))
def render_wavefront_sharded(scene, *, width: int, height: int,
                             samples: int, cfg: trace_mod.TraceConfig,
                             mesh, go_camera: bool = True,
                             px_capacity: int = 0,
                             block_rows: Optional[int] = None,
                             split: Optional[int] = None):
    """Compacted Pallas wavefront, sharded over the ``px`` mesh axis.

    Each device owns a contiguous band of rows and runs the full
    single-chip pipeline locally: primary any-hit mask -> pixel-granular
    cumsum compaction into a STATIC per-device capacity -> bounce
    megakernel -> per-pixel scatter-add into its image shard. No
    collective traffic during the frame (pixels are disjoint); the only
    cross-device output is the row-sharded image plus a psum'ed overflow
    count that the caller must check. overflow > 0 means one of two
    capacity misses (both compile-time; a dynamic count cannot size a
    kernel launch inside SPMD):
      * a device had more hit pixels than ``px_capacity`` -> re-render
        with a larger px_capacity;
      * the bounce-2 survivor re-compaction cap overflowed (a scene
        keeping >1/8 of its lanes alive past the split, e.g. an enclosed
        box) -> re-render with ``split=0``. Unlike the single-chip
        driver there is no automatic unsplit fallback here: the split
        choice is a static arg, so the caller owns the retry.

    ``split=None`` uses renderer.pick_split's policy (default unsplit -
    the split measured as a TPU regression, see pick_split; RT_SPLIT=<b>
    forces a bounce-b split for A/B).

    Returns (image (H,W,3) row-sharded, overflow scalar).
    """
    from ..ops import megakernel
    from .. import renderer as renderer_mod

    if block_rows is None:
        block_rows = renderer_mod.pick_block_rows(scene)
    if split is None:
        split = renderer_mod.pick_split(scene, cfg)
    n_shards = mesh.shape["px"]
    if mesh.shape.get("sp", 1) != 1:
        raise ValueError("render_wavefront_sharded shards pixels only; "
                         "build the mesh with sp=1")
    if height % n_shards:
        raise ValueError(f"height {height} must divide the px axis "
                         f"({n_shards}) for the sharded wavefront")
    rows_local = height // n_shards
    n_px_local = rows_local * width
    if px_capacity <= 0:
        px_capacity = max(1, n_px_local // 2)

    row0 = jnp.arange(n_shards, dtype=jnp.int32) * rows_local  # (S,)

    def local(scene, row0_l):
        base = row0_l[0] * width
        pix = (base + jnp.arange(n_px_local)).astype(jnp.uint32)
        # Same per-pixel cone mask as the single-chip driver
        # (renderer._pixel_mask): one central ray per pixel, spp
        # independent, conservative by construction; round 4 widens it
        # for thin-lens DoF, so that path shares it too.
        pxc = (pix % np.uint32(width)).astype(jnp.float32)
        pyc = (pix // np.uint32(width)).astype(jnp.float32)
        hit_px = megakernel.pixel_mask_pallas(
            scene, pxc, pyc, width=width, height=height, cfg=cfg,
            go_camera=go_camera) > 0.0
        pos = jnp.cumsum(hit_px.astype(jnp.int32)) - 1
        k_px = pos[-1] + 1
        overflow = jnp.maximum(0, k_px - px_capacity)

        target = jnp.where(hit_px, jnp.minimum(pos, px_capacity - 1),
                           px_capacity)
        cidx = jnp.zeros((px_capacity,), jnp.int32).at[target].set(
            jnp.arange(n_px_local, dtype=jnp.int32), mode="drop")

        pix_c = (base + cidx).astype(jnp.uint32)
        pix_lanes = jnp.repeat(pix_c, samples)
        samp_lanes = jnp.tile(jnp.arange(samples, dtype=jnp.uint32),
                              px_capacity)
        o_c, d_c = renderer_mod._lane_rays(
            scene, pix_lanes, samp_lanes, width=width, height=height,
            cfg=cfg, go_camera=go_camera)
        # Same survivor re-compaction policy as the single-chip driver;
        # each device re-packs its own band's survivors locally - no
        # cross-device traffic. A survivor-cap overflow joins the
        # psum'ed overflow (see the overflow contract above).
        rad, s_ov = renderer_mod.trace_with_split(
            scene, o_c, d_c, pix_lanes, samp_lanes, cfg,
            block_rows=block_rows, split=split)
        px_sum = rad.reshape(px_capacity, samples, 3).sum(axis=1)
        valid = jnp.arange(px_capacity) < jnp.minimum(k_px, px_capacity)
        tgt = jnp.where(valid, cidx, n_px_local)
        img = jnp.zeros((n_px_local, 3), rad.dtype).at[tgt].add(
            px_sum, mode="drop") / samples
        return (img.reshape(rows_local, width, 3),
                jax.lax.psum(overflow + s_ov, "px"))

    # check_vma=False: pallas_call out_shapes don't carry varying-axes
    # metadata, which the vma type checker would otherwise demand.
    img, overflow = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("px")),
        out_specs=(P("px"), P()),
        check_vma=False,
    )(scene, row0)
    return img.reshape(height, width, 3), overflow


def render_linear_sharded(scene, width: int, height: int, *, samples: int,
                          cfg: trace_mod.TraceConfig, mesh,
                          go_camera: bool = True, band_h=None) -> np.ndarray:
    """Full-image sharded render: host loop over row bands.

    Equivalent to Renderer.render_linear but SPMD over `mesh`; the band
    height is scaled so the *per-device* wavefront stays under the lane
    budget (more devices -> larger bands -> fewer dispatches).
    """
    n_dev = mesh.shape["px"] * mesh.shape["sp"]
    bh = band_h or renderer_mod.pick_band_height(
        width, height, max(1, samples // n_dev),
        n_prims=renderer_mod.scene_prim_count(scene))
    out = np.zeros((height, width, 3), np.float32)
    bands = []
    for y0 in range(0, height, bh):
        y0 = min(y0, height - bh) if y0 + bh > height else y0
        band = render_band_sharded(scene, jnp.int32(y0), width=width,
                                   height=height, band_h=bh, samples=samples,
                                   cfg=cfg, mesh=mesh, go_camera=go_camera)
        bands.append((y0, band))
    multi_host = jax.process_count() > 1
    for y0, band in bands:
        if multi_host:
            # The band is row-sharded across PROCESSES: this host cannot
            # address remote shards, so gather the full band explicitly
            # (the working form of the reference's result-channel
            # assembly, distributed_renderer.go:180-195 — here one
            # all-gather over the cluster fabric).
            from jax.experimental import multihost_utils
            band = multihost_utils.process_allgather(band, tiled=True)
        out[y0:y0 + bh] = np.asarray(band)
    return out

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
        width, height, max(1, samples // n_dev))
    out = np.zeros((height, width, 3), np.float32)
    bands = []
    for y0 in range(0, height, bh):
        y0 = min(y0, height - bh) if y0 + bh > height else y0
        band = render_band_sharded(scene, jnp.int32(y0), width=width,
                                   height=height, band_h=bh, samples=samples,
                                   cfg=cfg, mesh=mesh, go_camera=go_camera)
        bands.append((y0, band))
    for y0, band in bands:
        out[y0:y0 + bh] = np.asarray(band)
    return out

"""Offline A/B: does sorting re-compacted survivors shrink the packet
walk?

The bvh-mode bounce tail walks 2048-lane packets over the UNION of the
lanes' subtrees; after the bounce-2 survivor re-compaction
(renderer.trace_with_split) the surviving rays sit in pixel-major order,
which is incoherent in WORLD space. The RNG is counter-based (keyed on
pixel/sample/bounce, never lane position), so any lane permutation is
semantically free -- this tool counts walk node-steps for candidate
orderings of the same ray set to decide whether a sort pays before
touching the TPU.

Orderings compared (on the sim_walk_steps bounced population, subsampled
to the ~1%-survivor density):
  * pixel  : as-is (what trace_with_split produces today)
  * morton : 30-bit Morton code of the ray origin (10 bits/axis)
  * o+d    : Morton of origin, tie-broken by direction octant
  * octant : direction octant major, origin Morton minor

Usage: python tools/sim_sorted_survivors.py [n_spheres ...]
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # host-only analysis tool

from raytrace_tpu import bvh as bvh_mod  # noqa: E402
from tools.sim_walk_steps import (  # noqa: E402
    packet_walk_steps, ray_populations)


def morton30(p: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """30-bit Morton code of points p (N,3) within box [lo, hi]."""
    q = np.clip((p - lo) / np.maximum(hi - lo, 1e-9), 0.0, 1.0)
    cells = np.minimum((q * 1024.0).astype(np.uint32), 1023)

    def spread(x):
        x = x.astype(np.uint64)
        x = (x | (x << np.uint64(16))) & np.uint64(0x030000FF)
        x = (x | (x << np.uint64(8))) & np.uint64(0x0300F00F)
        x = (x | (x << np.uint64(4))) & np.uint64(0x030C30C3)
        x = (x | (x << np.uint64(2))) & np.uint64(0x09249249)
        return x

    return (spread(cells[:, 0]) | (spread(cells[:, 1]) << np.uint64(1))
            | (spread(cells[:, 2]) << np.uint64(2)))


def main():
    ns = [int(a) for a in sys.argv[1:]] or [250, 1000]
    rng = np.random.default_rng(1)
    for n in ns:
        sph_c, sph_r, _, (bo, bd) = ray_populations(n)
        lo = sph_c - sph_r[:, None]
        hi = sph_c + sph_r[:, None]
        tree = bvh_mod.build_bvh(lo, hi, leaf_size=16)
        blo, bhi = bo.min(axis=0), bo.max(axis=0)

        for density, tag in [(1.0, "all-bounced"), (0.02, "2%-survivors")]:
            if density < 1.0:
                keep = rng.random(bo.shape[0]) < density
                o, d = bo[keep], bd[keep]
            else:
                o, d = bo, bd
            mo = morton30(o, blo, bhi)
            oct_ = ((d[:, 0] > 0).astype(np.uint64)
                    | ((d[:, 1] > 0).astype(np.uint64) << np.uint64(1))
                    | ((d[:, 2] > 0).astype(np.uint64) << np.uint64(2)))
            orders = {
                "pixel": np.arange(o.shape[0]),
                "morton": np.argsort(mo, kind="stable"),
                "o+d": np.argsort(mo * np.uint64(8) + oct_, kind="stable"),
                "octant": np.argsort(oct_ * np.uint64(1 << 31)
                                     + mo, kind="stable"),
            }
            base = None
            for label, idx in orders.items():
                steps, leafprim = packet_walk_steps(
                    tree, sph_c, sph_r, o[idx], d[idx])
                if base is None:
                    base = steps
                print(f"ring-{n} {tag:13s} {label:7s} "
                      f"steps={steps:7d} ({steps / base:5.2f}x) "
                      f"leafprim={leafprim:8d}", flush=True)


if __name__ == "__main__":
    main()

"""Offline A/B: spatial-median vs object-median BVH splits for packet
walks.

Packets walk the UNION of their lanes' subtrees (BENCHMARKS.md), so the
question is which split discipline makes sibling subtrees overlap less:
object-median (equal-count split on center order — the committed
builder) or spatial-median (split plane at the node box's center along
its longest axis, unequal counts). Counts binary skip-walk node steps
on the sim_walk_steps ray populations.

Result (leaf 16, recorded so nobody re-runs the experiment blind):
primary packets improve slightly or tie (0.85x/1.02x) but BOUNCED
packets — the population that dominates ring frames — get 1.48-1.58x
WORSE: unequal splits produce ~1.5x more nodes (31→49, 127→193) and
every extra level inflates the per-packet union walk, exactly the SAH
failure mode (BENCHMARKS.md (d)). Object-median stays.

Usage: python tools/sim_spatial_split.py [n_spheres ...]
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # host-only analysis tool

import jax.numpy as jnp  # noqa: E402

from raytrace_tpu import bvh as bvh_mod  # noqa: E402
from tools.sim_walk_steps import (  # noqa: E402
    packet_walk_steps, ray_populations)


def build_spatial(lo, hi, leaf_size):
    """Spatial-median build with the same flat DFS+skip layout."""
    n = lo.shape[0]
    nodes = []
    perm = []
    ends = {}

    def rec(idx):
        my = len(nodes)
        bmin = lo[idx].min(axis=0)
        bmax = hi[idx].max(axis=0)
        nodes.append([bmin, bmax, -1, 0, -1])
        parts = None
        if idx.size > leaf_size:
            centers = (lo[idx] + hi[idx]) * 0.5
            axis = int(np.argmax(bmax - bmin))
            mid = 0.5 * (bmin[axis] + bmax[axis])
            left = centers[:, axis] < mid
            if 0 < left.sum() < idx.size:
                parts = (idx[left], idx[~left])
            else:  # all centers on one side: fall back to object median
                med = np.argsort(centers[:, axis], kind="stable")
                half = idx.size // 2
                parts = (idx[med[:half]], idx[med[half:]])
        if parts is None:
            nodes[my][2] = len(perm)
            nodes[my][3] = idx.size
            perm.extend(idx.tolist())
        else:
            rec(parts[0])
            rec(parts[1])
        ends[my] = len(nodes)
        return my

    rec(np.arange(n))

    def assign_skip(i, skip):
        nodes[i][4] = skip
        if nodes[i][3] == 0:
            left = i + 1
            left_end = ends[left]
            assign_skip(left, left_end)
            assign_skip(left_end, skip)

    assign_skip(0, len(nodes))
    as_np = lambda i, dt=np.float32: np.asarray([nd[i] for nd in nodes], dt)
    return bvh_mod.FlatBVH(
        node_min=jnp.asarray(as_np(0)),
        node_max=jnp.asarray(as_np(1)),
        node_skip=jnp.asarray(np.asarray([nd[4] for nd in nodes], np.int32)),
        node_first=jnp.asarray(np.asarray([nd[2] for nd in nodes], np.int32)),
        node_count=jnp.asarray(np.asarray([nd[3] for nd in nodes], np.int32)),
        prim_index=jnp.asarray(np.asarray(perm, np.int32)),
        leaf_size=leaf_size,
    )


def main():
    ns = [int(a) for a in sys.argv[1:]] or [250, 1000]
    for n in ns:
        sph_c, sph_r, prim, bounce = ray_populations(n)
        lo = sph_c - sph_r[:, None]
        hi = sph_c + sph_r[:, None]
        med = bvh_mod.build_bvh(lo, hi, leaf_size=16)
        spa = build_spatial(lo, hi, 16)
        for tag, rays in (("primary", prim), ("bounced", bounce)):
            sm, lm = packet_walk_steps(med, sph_c, sph_r, *rays)
            ss, ls = packet_walk_steps(spa, sph_c, sph_r, *rays)
            print(f"ring-{n} {tag}: median {sm:6d} steps/{lm:7d} prim  "
                  f"spatial {ss:6d} ({ss / max(sm, 1):4.2f}x)/{ls:7d} prim "
                  f"nodes {med.node_count.shape[0]}/{spa.node_count.shape[0]}",
                  flush=True)


if __name__ == "__main__":
    main()

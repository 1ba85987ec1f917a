"""Offline A/B: 8-wide vs 4-wide BVH packet-walk node steps.

tools/sim_bvh4.py showed a 4-ary collapse cuts the latency-bound walk
steps to 0.22-0.26x of the binary skip walk. This asks whether one more
collapse level (children = great-grandchildren of the binary tree) is
worth a kernel experiment: per-step vector work doubles vs 4-wide (8
slab tests + wider reduce), so 8-wide needs a step ratio comfortably
below 0.5x of the 4-wide count to be interesting.

Result (leaf 16, recorded so nobody re-runs the experiment blind):
ring-250 primary/bounced 1.17x/1.30x MORE steps than 4-wide (the 31-node
tree is too shallow - collapsing past its depth just re-tests leaves);
ring-1000 0.60x/0.50x - break-even at best once the ~2x per-step cost is
paid. Not worth a kernel experiment; 4-wide is the sweet spot.

Usage: python tools/sim_bvh8.py [n_spheres ...]
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # host-only analysis tool

from raytrace_tpu import bvh as bvh_mod  # noqa: E402
from tools.sim_bvh4 import binary_children, walk4_steps  # noqa: E402
from tools.sim_walk_steps import (  # noqa: E402
    BLOCK_LANES, ray_populations)


def collapse_k(tree, levels: int):
    """K-ary view: each inner node's children are its depth-`levels`
    binary descendants (leaves promoted where a branch bottoms out)."""
    ncount = np.asarray(tree.node_count)
    kids = binary_children(tree)

    def children(i):
        out = [i]
        for _ in range(levels):
            nxt = []
            for c in out:
                if c in kids and not (ncount[c] > 0):
                    nxt.extend(kids[c])
                else:
                    nxt.append(c)
            out = nxt
        return [c for c in out if c != i]

    def children_k(i):
        got = children(i)
        return got

    return children_k


def walk_k_steps(tree, sph_c, sph_r, o, d, levels: int):
    """Stack-based 2^levels-ary packet walk; returns (steps, leaf tests,
    max stack). Same cost model as sim_bvh4.walk4_steps."""
    nmin = np.asarray(tree.node_min)
    nmax = np.asarray(tree.node_max)
    nfirst = np.asarray(tree.node_first)
    ncount = np.asarray(tree.node_count)
    perm = np.asarray(tree.prim_index)
    children_k = collapse_k(tree, levels)

    total = 0
    leaf_tests = 0
    max_stack = 0
    n = o.shape[0]
    root_is_leaf = ncount[0] > 0
    for s0 in range(0, n, BLOCK_LANES):
        oo = o[s0:s0 + BLOCK_LANES]
        dd = d[s0:s0 + BLOCK_LANES]
        ivd = 1.0 / np.where(dd == 0.0, 1e-30, dd)
        t_best = np.full(oo.shape[0], 3.0e38, np.float32)

        def leaf(i):
            nonlocal leaf_tests, t_best
            cnt = int(ncount[i])
            leaf_tests += cnt
            for j in range(cnt):
                pid = int(perm[nfirst[i] + j])
                oc = oo - sph_c[pid]
                half_b = (oc * dd).sum(axis=1)
                c = (oc * oc).sum(axis=1) - sph_r[pid] ** 2
                disc = half_b * half_b - c
                ok = disc >= 0.0
                sq = np.sqrt(np.where(ok, disc, 0.0))
                r0 = -half_b - sq
                r1 = -half_b + sq
                tj = np.where(ok & (r0 >= 1e-3), r0,
                              np.where(ok & (r1 >= 1e-3), r1, 3.0e38))
                t_best = np.minimum(t_best, tj)

        if root_is_leaf:
            leaf(0)
            continue
        stack = [0]
        while stack:
            max_stack = max(max_stack, len(stack))
            cur = stack.pop()
            total += 1
            for c in children_k(cur):
                t0 = (nmin[c] - oo) * ivd
                t1 = (nmax[c] - oo) * ivd
                near = np.maximum(np.minimum(t0, t1).max(axis=1), 1e-3)
                far = np.minimum(np.maximum(t0, t1).min(axis=1), t_best)
                if bool((near <= far).any()):
                    if ncount[c] > 0:
                        leaf(c)
                    else:
                        stack.append(c)
    return total, leaf_tests, max_stack


def main():
    ns = [int(a) for a in sys.argv[1:]] or [250, 1000]
    for n in ns:
        sph_c, sph_r, prim, bounce = ray_populations(n)
        lo = sph_c - sph_r[:, None]
        hi = sph_c + sph_r[:, None]
        tree = bvh_mod.build_bvh(lo, hi, leaf_size=16)
        for tag, rays in (("primary", prim), ("bounced", bounce)):
            s4, l4, k4 = walk4_steps(tree, sph_c, sph_r, *rays)
            s8, l8, k8 = walk_k_steps(tree, sph_c, sph_r, *rays, levels=3)
            print(f"ring-{n} {tag}: 4ary {s4:6d} steps/{l4:7d} prim "
                  f"stack<={k4}  8ary {s8:6d} steps "
                  f"({s8 / max(s4, 1):4.2f}x)/{l8:7d} prim stack<={k8}",
                  flush=True)


if __name__ == "__main__":
    main()
